package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.expr.TopKByScore

/** Streaming ANN: a stream of query vectors against a STATIC corpus.
  *
  * Shape: the corpus is bucketed ONCE (Similarity.bucketIndex — the same
  * hyperplane-LSH index the batch path uses) and reused by every
  * micro-batch; arriving queries are bucketed map-side, candidates come
  * from a stream-static equi join on (tbl, bucket), and per-query top-k
  * is the bounded-buffer TopKByScore aggregator — O(k) state per query
  * key in the state store, incrementally merged across micro-batches,
  * idempotent to candidates re-surfaced by later tables/batches.
  *
  * This is the streaming niche where the typed aggregator beats the
  * window form: rank-over-window is not available on an unbounded
  * stream, but an associative bounded top-k merge is exactly what
  * incremental state wants. Output mode: complete (the per-query top-k
  * table is revised as batches arrive).
  *
  * Scale: corpus index rows are narrow (id, tbl, bucket) — at 10⁹
  * vectors × 12 tables they bucket-partition across executors; each
  * micro-batch shuffles only its candidate pairs, and per-query state is
  * k (sim, id) pairs regardless of stream length.
  */
object StreamingAnn {

  /** `queries` is a STREAMING DataFrame with (idCol, vecCol); `corpus`
    * is static. Returns a streaming Dataset of (query_id, rank,
    * neighbor_id, sim) for `complete`-mode sinks.
    */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nbits: Int = 6,
      tables: Int = 8,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // static side: bucket index + vectors, built once per query START
    val idx = Similarity
      .bucketIndex(corpus, idCol, vecCol, nbits, tables, dim)
      .join(corpus.select(col(idCol), col(vecCol).as("cvec")), idCol)
      .select(col(idCol).as("neighbor_id"), col("tbl"), col("bucket"), col("cvec"))
    // stream side: map-side bucketing of each arriving query vector; the
    // vector rides through the explode (re-attaching it by id would be a
    // stream-stream self-join, which complete mode forbids)
    val qb = queries
      .select(
        col(idCol).as("query_id"),
        col(vecCol).as("qvec"),
        explode(Similarity.bucketStructs(col(vecCol), nbits, tables, dim)).as("bk")
      )
      .select(col("query_id"), col("qvec"), col("bk.tbl").as("tbl"), col("bk.bucket").as("bucket"))
    val scored: Dataset[(String, Long, Double)] = qb
      .join(idx, Seq("tbl", "bucket")) // stream-static join: no state
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id").cast("string"),
        col("neighbor_id"),
        round(Similarity.cosine(col("cvec"), col("qvec")), 4).as("sim")
      )
      .as[(String, Long, Double)]
    val idType = queries.schema(idCol).dataType
    scored
      .groupByKey(_._1)
      .agg(new TopKByScore(k).toColumn.name("topk"))
      .flatMap { case (qid, topk) =>
        topk.zipWithIndex.map { case ((sim, nid), i) => (qid, i + 1, nid, sim) }
      }
      .toDF("query_id", "rank", "neighbor_id", "sim")
      // restore the caller's id type (the key travelled as a string only
      // to satisfy the aggregator's input shape — don't constrain the
      // public API to numeric ids)
      .withColumn("query_id", col("query_id").cast(idType))
  }
}
