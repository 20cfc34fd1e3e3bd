package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search: a k-means
  * coarse quantizer partitions the corpus into `k` cells; a query probes
  * only its `nprobe` nearest cells.
  *
  * Everything is DataFrame algebra:
  *  - training: Lloyd iterations where assignment is a broadcast join
  *    against the (tiny) centroid set and the update step is
  *    posexplode → per-(cluster, dim) mean → re-assemble;
  *  - indexing: one corpus pass to tag each vector with its cell;
  *  - search: query × nprobe cells, candidates only from those cells.
  *
  * 100 TB posture: centroids are always broadcast-sized (k ≤ thousands);
  * training on the full corpus is one broadcast join per iteration —
  * or fit on a sample and only the final assignment pass touches
  * everything. The search shuffle is keyed by cell id, so a probe reads
  * ~nprobe/k of the corpus.
  */
object Ivf {

  /** Deterministic Lloyd's k-means over an array<float> column.
    * Returns (cluster_id, centroid array<double>). Init = first k rows
    * by id (deterministic; k-means++ on a sample is the production note).
    */
  def fitCentroids(
      corpus: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val spark = corpus.sparkSession
    // Init rows land on the driver as a k×dim constant — the same
    // broadcast-scale class as centroidArrays (which collects every
    // iteration's centroids anyway), NOT a data collect. This replaces a
    // row_number over an empty-partition Window, whose WindowExec warning
    // ("moving all data to a single partition") invited misdiagnosis even
    // though it only ever ranked the k limited rows.
    val init = corpus
      .orderBy(col(idCol))
      .limit(k)
      .select(transform(col(vecCol), _.cast("double")).as("centroid"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => org.apache.spark.sql.Row(i, r.getSeq[Double](0)) }
    val initSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "cluster_id", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "centroid",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
        nullable = true)
    ))
    var centroids =
      spark.createDataFrame(java.util.Arrays.asList(init: _*), initSchema)
    for (_ <- 1 to iters) {
      val assigned = assign(corpus, centroids, idCol, vecCol)
      // Update shape note (round-5 measurement): a one-shuffle variant —
      // dim per-position decimal sums as a single wide aggregate — was
      // tried and measured SLOWER (1.9 vs 1.3 s warm for q78's fit):
      // 65 decimal aggregate buffers per group cost more than the
      // second k×dim-row micro-shuffle they eliminate. The exploded
      // two-stage form is the kept design.
      centroids = assigned
        .select(col("cluster_id"), posexplode(col(vecCol)))
        .groupBy(col("cluster_id"), col("pos"))
        // decimal-accumulated mean, not avg(): double partial-state
        // merges are fetch-order-dependent, and a last-ulp centroid
        // difference can flip a near-tie assignment and drift the
        // audit figures run to run (the Pq.fit recipe)
        .agg((sum(col("col").cast("decimal(38,12)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cluster_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
        .select(col("cluster_id"), transform(col("pairs"), p => p.getField("m")).as("centroid"))
    }
    centroids
  }

  /** Materialize the centroid table as plan constants. Centroids are
    * broadcast-scale by construction (k×dim doubles — the same class of
    * constant as LSH hyperplanes), so this is not a data collect.
    */
  private def centroidArrays(centroids: DataFrame): Array[(Int, Array[Float])] =
    centroids
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).map(_.toFloat).toArray)
      .sortBy(_._1)

  /** Tag each vector with its nearest centroid (cosine) — ZERO-SHUFFLE:
    * all k similarities are computed in one map-side projection and the
    * argmax folds over a struct array. (The window-ranking formulation
    * would shuffle n×k rows just to pick a max — wrong shape at scale.)
    */
  def assign(
      corpus: DataFrame,
      centroids: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val cents = centroidArrays(centroids)
    val scored = array(cents.map { case (cid, c) =>
      val cCol = array(c.map(v => lit(v)).toIndexedSeq: _*)
      struct(
        Similarity.cosine(col(vecCol), cCol).as("sim"),
        lit(-cid).as("neg_cid") // ties: smaller cluster_id wins under max
      )
    }.toIndexedSeq: _*)
    corpus.select(
      col(idCol),
      col(vecCol),
      (-array_max(scored).getField("neg_cid")).cast("int").as("cluster_id")
    )
  }

  /** SOFT assignment: each vector lands in its `m` nearest cells (the
    * spill-tree / cluster-overlap trick). Same zero-shuffle map-side
    * shape as [[assign]] — the argmax generalizes to a sort + slice of
    * the same scored struct array, then one generator row per cell.
    * Ties break toward the smaller cluster_id (desc (sim, -cid) order).
    * Output: one row per (vector, cell) — m rows per vector.
    */
  def assignTopM(
      corpus: DataFrame,
      centroids: DataFrame,
      m: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val cents = centroidArrays(centroids)
    val scored = array(cents.map { case (cid, c) =>
      val cCol = array(c.map(v => lit(v)).toIndexedSeq: _*)
      struct(
        Similarity.cosine(col(vecCol), cCol).as("sim"),
        lit(-cid).as("neg_cid") // ties: smaller cluster_id ranks first desc
      )
    }.toIndexedSeq: _*)
    corpus
      .select(
        col(idCol),
        col(vecCol),
        explode(slice(reverse(array_sort(scored)), 1, m)).as("cell")
      )
      .select(
        col(idCol),
        col(vecCol),
        (-col("cell").getField("neg_cid")).cast("int").as("cluster_id")
      )
  }

  /** IVF top-k: probe the query's `nprobe` nearest cells only. */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val indexed = assign(corpus, centroids, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"), col("cluster_id"))
    val qScored = queries
      .crossJoin(broadcast(centroids))
      .withColumn(
        "sim",
        Similarity.cosine(col(vecCol), transform(col("centroid"), _.cast("float")))
      )
    val wq = Window.partitionBy(col(idCol)).orderBy(col("sim").desc, col("cluster_id"))
    val probes = qScored
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"), col("cluster_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    indexed
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(Similarity.cosine(col("cvec"), col("qvec")), 4).as("sim")
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
