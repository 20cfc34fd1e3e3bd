package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import graft.ops.TextStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming Misra–Gries parity: in the EXACT regime (k ≥ distinct
  * items per group) the stateful streaming aggregation over
  * micro-batches must equal the batch aggregate over the union —
  * bit-for-bit, because MG with enough counters is exact and therefore
  * merge-order-free. Items arrive split across two micro-batches with
  * one group's items deliberately straddling the boundary.
  */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("streamed per-source token hitters equal the batch aggregate (exact regime)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val rows = Tables
      .documents(spark, dir)
      .select(col("source"), explode(TextStats.tokens(col("text"))).as("tok"))
      .as[(String, String)]
      .collect()
      .toIndexedSeq

    val input = MemoryStream[(String, String)]
    val out = StreamingHeavyHitters.topItems(
      input.toDF().toDF("source", "tok"), "source", "tok", k = 64)
    val q = out.writeStream
      .format("memory")
      .queryName("hh_stream")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("hh_ckpt").toString)
      .start()
    try {
      // split mid-corpus so most groups straddle the batch boundary
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark
      .table("hh_stream")
      .select(col("source"), explode(col("hitters")).as(Seq("tok", "cnt")))
      .as[(String, String, Long)]
      .collect()
      .sortBy(r => (r._1, r._2))

    val want = StreamingHeavyHitters
      .topItems(rows.toDF("source", "tok"), "source", "tok", k = 64)
      .select(col("source"), explode(col("hitters")).as(Seq("tok", "cnt")))
      .as[(String, String, Long)]
      .collect()
      .sortBy(r => (r._1, r._2))

    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq, s"stream/batch divergence: ${got.length} vs ${want.length} rows")
  }
}
