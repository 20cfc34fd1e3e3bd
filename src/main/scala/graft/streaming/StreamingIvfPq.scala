package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Ivf, Pq, Similarity}
import graft.expr.TopKTwoStage

/** Streaming IVF-PQ serving (the q109 stack with queries arriving as a
  * stream): a FROZEN serving index — trained coarse centroids, PQ
  * codebooks, and the cell-assigned coded corpus — is built once; each
  * arriving query is cell-probed MAP-SIDE against the centroid
  * constants (Ivf.assignTopM — no shuffle), candidates come from a
  * stream-static equi join on cluster_id, ADC scores against the
  * codebook constants map-side, and per-query two-stage state is the
  * bounded [[graft.expr.TopKTwoStage]] buffer (top-`short` by ADC,
  * exact-reranked to k at emit). Output mode: complete.
  *
  * Scale shape: the streamed work per query is nprobe cell probes + an
  * equi join that touches only the probed cells' 8-byte codes; state is
  * `short` triples per query regardless of stream length; the raw float
  * corpus is touched only to attach `cvec` at index-build time (on a
  * cluster the rerank would instead fetch floats for the emitted
  * shortlist — here the fixture-scale index carries them).
  */
object StreamingIvfPq {

  /** The frozen serving index (build once, reuse across every
    * micro-batch and every started query).
    */
  final case class ServingIndex(
      centroids: DataFrame,
      codebooks: Array[Array[(Int, Array[Double])]],
      index: DataFrame // (neighbor_id, cluster_id, codes, cvec)
  )

  def buildIndex(
      corpus: DataFrame,
      kCells: Int,
      ivfIters: Int,
      m: Int,
      ksub: Int,
      pqIters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): ServingIndex = {
    val e = corpus.select(col(idCol), col(vecCol), Pq.normalize(col(vecCol)).as("__nv"))
    val cents = Ivf.fitCentroids(e, kCells, ivfIters, idCol, vecCol)
    val codebooks = Pq.fit(e, m, ksub, pqIters, idCol, "__nv")
    val assigned = Ivf.assign(e, cents, idCol, vecCol).select(col(idCol), col("cluster_id"))
    val idx = Pq
      .encode(e, codebooks, idCol, "__nv")
      .join(assigned, idCol)
      .join(corpus.select(col(idCol), col(vecCol).as("cvec")), idCol)
      .select(col(idCol).as("neighbor_id"), col("cluster_id"), col("codes"), col("cvec"))
    ServingIndex(cents, codebooks, idx)
  }

  /** Per-candidate scored frame — streaming-agnostic (every op is
    * map-side or stream-static), so the SAME function feeds both the
    * streaming aggregator and the batch window law the parity spec
    * compares against. Columns: (query_id, neighbor_id, adc, rscore).
    */
  def scoredCandidates(
      queries: DataFrame,
      ix: ServingIndex,
      nprobe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    Ivf
      .assignTopM(queries, ix.centroids, nprobe, idCol, vecCol)
      .select(
        col(idCol).as("query_id"),
        col(vecCol).as("qemb"),
        Pq.normalize(col(vecCol)).as("qnv"),
        col("cluster_id")
      )
      .join(ix.index, Seq("cluster_id")) // stream-static: no state
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        Pq.adcScore(col("qnv"), col("codes"), ix.codebooks).as("adc"),
        Similarity.cosine(col("qemb"), col("cvec")).as("rscore")
      )

  /** `queries` is a STREAMING DataFrame with (idCol, vecCol). Returns a
    * streaming (query_id, rank, neighbor_id, sim) frame for
    * complete-mode sinks; `sim` is the exact rerank cosine rounded to 4.
    */
  def topK(
      queries: DataFrame,
      ix: ServingIndex,
      k: Int,
      short: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val scored = scoredCandidates(queries, ix, nprobe, idCol, vecCol)
      .select(col("query_id").cast("string"), col("neighbor_id"), col("adc"), col("rscore"))
      .as[(String, Long, Double, Double)]
    val idType = queries.schema(idCol).dataType
    scored
      .groupByKey(_._1)
      .agg(new TopKTwoStage(short).toColumn.name("cands"))
      .flatMap { case (qid, cands) =>
        cands
          .sortWith((a, b) => a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
          .take(k)
          .zipWithIndex
          .map { case ((_, nid, r), i) =>
            // HALF_UP on the BigDecimal form — the same rounding
            // org.apache.spark.sql.functions.round applies to doubles,
            // so the parity spec can compare against round(col, 4)
            val sim = BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            (qid, i + 1, nid, sim)
          }
      }
      .toDF("query_id", "rank", "neighbor_id", "sim")
      .withColumn("query_id", col("query_id").cast(idType))
  }
}
