package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SEMANTIC deduplication over an embedding column — the SemDeDup shape
  * (Abbas et al., 2023, arXiv:2303.09540): a k-means coarse quantizer
  * partitions the corpus into cells, and within each cell a vector is
  * dropped when it is within cosine `tau` of a lower-id vector. Pairwise
  * work is confined to cells — O(Σ cᵢ²), never O(n²) — which is the
  * whole trick: k grows with the corpus so per-cell cost stays bounded.
  *
  * Input is the SOFT assignment ([[Ivf.assignTopM]]): each vector in
  * its m nearest cells. Hard assignment misses τ-pairs that straddle a
  * cell boundary (measured 0.27 co-cluster recall on the test corpus at
  * m=1 vs 0.97 at m=3); overlap is the standard fix (spill trees, and
  * the cluster-overlap variant in the SemDeDup line). Work scales as
  * Σcᵢ² ≈ m²n²/k — still a 2m²/k fraction of brute force, so at
  * k = 10⁵ cells and m = 3 the overlap costs < 0.02% of O(n²).
  *
  * 100 TB posture: centroids are broadcast (k×dim doubles); soft
  * assignment is map-side zero-shuffle; the only data shuffle is the
  * self-join keyed by cluster_id. A skewed cell (pathological
  * quantizer: one mega-cell) would put that cell's full c² pair work on
  * ONE reducer — the classic scale-killer — so the self-join salts hot
  * cells adaptively (the [[Skew]] pattern, applied since round 4): a
  * cheap per-cell census finds cells over `hotCellThreshold` rows, the
  * probe side of those cells gets a deterministic salt in [0, salt),
  * and the build side replicates `salt` ways for those cells ONLY. Per
  * matched pair still meets exactly once (the build copy carrying the
  * probe row's salt), so the output is provably unchanged while the
  * hot cell's pair work spreads over `salt` reducers (c²/salt each).
  * Cold cells pay nothing — one extra broadcast-hash probe per row.
  *
  * The keep rule is order-deterministic, one join + one aggregate (no
  * iteration): v is kept iff NO lower-id vector within τ shares any
  * cell with it. The kept set is therefore τ-separated within every
  * cell (kept i < kept j sharing a cell with sim ≥ τ would have
  * dropped j), which [[keptViolations]] audits exactly with the same
  * join. Cross-cell τ-pairs the overlap still misses are the
  * quantizer's miss budget — report it against an exact baseline,
  * don't hide it (q78 carries the figure).
  */
object SemanticDedup {

  /** One row per distinct input vector: (idCol, cells, kept, rep_id).
    * `cells` is the vector's sorted cell set; `rep_id` is the smallest
    * τ-close shared-cell id for dropped rows, the vector's own id for
    * kept rows. `assigned` carries (idCol, vecCol, cluster_id) with one
    * row per (vector, cell) — the [[Ivf.assignTopM]] output. Callers
    * should PERSIST `assigned` first (q78 does): the hot-cell census,
    * the probe side, and the build side each read it, so an unpersisted
    * soft-assignment plan would re-run its k cosine scorings per
    * vector three times.
    */
  def assignReps(
      assigned: DataFrame,
      tau: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      hotCellThreshold: Long = 1L << 16,
      salt: Int = 16
  ): DataFrame = {
    // shared-cell lower-id neighbors above tau; one shuffle on the
    // (cluster_id, salt) key — salt is 0 everywhere except hot cells;
    // a pair sharing several cells dedupes in the min aggregate
    val reps = sharedCellPairs(assigned, idCol, vecCol, hotCellThreshold, salt)
      .filter(col("nb_id") < col(idCol))
      .withColumn("sim", Similarity.cosine(col(vecCol), col("nb_vec")))
      .filter(col("sim") >= tau)
      .groupBy(col(idCol))
      .agg(min(col("nb_id")).as("rep_id"))
    assigned
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("cluster_id"))).as("cells"))
      .join(reps, Seq(idCol), "left")
      .select(
        col(idCol),
        col("cells"),
        col("rep_id").isNull.as("kept"),
        coalesce(col("rep_id"), col(idCol)).as("rep_id")
      )
  }

  /** Exact count of kept-pair violations: pairs of KEPT vectors sharing
    * a cell with cosine ≥ tau. Must be 0 by the keep-rule proof — this
    * is the implementation audit, same (salted) join shape as
    * assignReps.
    */
  def keptViolations(
      assigned: DataFrame,
      deduped: DataFrame,
      tau: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      hotCellThreshold: Long = 1L << 16,
      salt: Int = 16
  ): DataFrame = {
    val kept = assigned
      .join(deduped.filter(col("kept")).select(col(idCol)), Seq(idCol))
      .select(col("cluster_id"), col(idCol), col(vecCol))
    sharedCellPairs(kept, idCol, vecCol, hotCellThreshold, salt)
      .filter(col("nb_id") < col(idCol))
      .filter(Similarity.cosine(col(vecCol), col("nb_vec")) >= tau)
      // the same kept pair can share several cells — count pairs, not rows
      .select(col(idCol), col("nb_id"))
      .distinct()
      .agg(count(lit(1)).as("violations"))
  }

  /** The cluster_id self-join with adaptive hot-cell salting (see the
    * object doc). Emits one row per shared-cell ordered-or-not pair
    * occurrence: (cluster_id, idCol, vecCol, nb_id, nb_vec). Every
    * (probe, build) row pair within a cell meets EXACTLY once — cold
    * cells join on salt 0 = 0; in a hot cell the probe row carries one
    * deterministic salt and exactly the build replica with that salt
    * matches. Equality with the unsalted join is therefore structural,
    * and SemanticDedupSpec pins it with a degenerate one-cell
    * quantizer.
    */
  private def sharedCellPairs(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      hotCellThreshold: Long,
      salt: Int
  ): DataFrame = {
    val hot = assigned
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("__csz"))
      .filter(col("__csz") > hotCellThreshold)
      .select(col("cluster_id"), lit(true).as("__hot"))
    // ≤ n/threshold rows by construction — broadcast is always safe
    val probe = assigned
      .select(col("cluster_id"), col(idCol), col(vecCol))
      .join(broadcast(hot), Seq("cluster_id"), "left")
      .withColumn(
        "__salt",
        when(col("__hot").isNotNull, pmod(xxhash64(col(idCol)), lit(salt)).cast("int"))
          .otherwise(lit(0))
      )
      .drop("__hot")
    val build = assigned
      .select(col("cluster_id"), col(idCol).as("nb_id"), col(vecCol).as("nb_vec"))
      .join(broadcast(hot), Seq("cluster_id"), "left")
      .withColumn(
        "__salt",
        explode(
          when(col("__hot").isNotNull, sequence(lit(0), lit(salt - 1)))
            .otherwise(array(lit(0)))
        )
      )
      .drop("__hot")
    probe.join(build, Seq("cluster_id", "__salt")).drop("__salt")
  }
}
