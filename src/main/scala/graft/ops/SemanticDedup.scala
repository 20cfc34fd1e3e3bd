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
  * quantizer) surfaces as a hot key — the [[Skew]] salting pattern
  * applies unchanged since the join key is opaque.
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
    * row per (vector, cell) — the [[Ivf.assignTopM]] output.
    */
  def assignReps(
      assigned: DataFrame,
      tau: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val left = assigned.select(col("cluster_id"), col(idCol), col(vecCol))
    val right = assigned.select(
      col("cluster_id"),
      col(idCol).as("nb_id"),
      col(vecCol).as("nb_vec")
    )
    // shared-cell lower-id neighbors above tau; one shuffle on cluster_id;
    // a pair sharing several cells dedupes in the min aggregate
    val reps = left
      .join(right, Seq("cluster_id"))
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
    * is the implementation audit, same join shape as assignReps.
    */
  def keptViolations(
      assigned: DataFrame,
      deduped: DataFrame,
      tau: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val kept = assigned
      .join(deduped.filter(col("kept")).select(col(idCol)), Seq(idCol))
      .select(col("cluster_id"), col(idCol), col(vecCol))
    val other = kept.select(
      col("cluster_id"),
      col(idCol).as("nb_id"),
      col(vecCol).as("nb_vec")
    )
    kept
      .join(other, Seq("cluster_id"))
      .filter(col("nb_id") < col(idCol))
      .filter(Similarity.cosine(col(vecCol), col("nb_vec")) >= tau)
      // the same kept pair can share several cells — count pairs, not rows
      .select(col(idCol), col("nb_id"))
      .distinct()
      .agg(count(lit(1)).as("violations"))
  }
}
