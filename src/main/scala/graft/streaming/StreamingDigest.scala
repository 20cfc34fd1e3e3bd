package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.ExportPlan
import graft.ops.TextStats

/** STREAMING corpus integrity digest: the q116/shardDigests law run on
  * an ingest stream — per source, a running (n_docs, digest_sum,
  * digest_xor) over every document seen so far. Because both digests
  * are ASSOCIATIVE aggregates of the per-doc 60-bit content digest
  * (sum mod 2^61-1, bit_xor — the ExportPlan.shardDigests law), Spark's
  * stateful streaming aggregation IS the implementation: state per
  * source is one decimal accumulator + one long + one count, constant
  * regardless of stream length, and each micro-batch contributes
  * map-side partials only.
  *
  * Use: an incremental ingestion pipeline emits this next to its sink;
  * any re-run (batch, different cluster, different engine) recomputing
  * the same three numbers per source certifies the landed corpus —
  * the streaming end of the same contract q116 certifies per shard at
  * export time. Parity law (StreamingDigestSpec): streamed complete-
  * mode output after N micro-batches equals the batch aggregate over
  * the union of those batches, bit-for-bit.
  */
object StreamingDigest {

  /** Works identically on a batch or streaming (groupCol, textCol)
    * frame — the parity spec runs THIS function on both sides.
    */
  def perGroupDigest(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs
      .select(col(groupCol), TextStats.contentDigest60(col(textCol)).as("digest"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("digest").cast("decimal(38,0)")) % lit(ExportPlan.DigestModulus))
          .cast("long").as("digest_sum"),
        expr("bit_xor(digest)").as("digest_xor")
      )
}
