package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import graft.ops.TextStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming Count-Min parity: because CM merge is elementwise sum
  * (exactly mergeable), the streamed matrix must equal the batch
  * matrix over the union of all micro-batches BIT-FOR-BIT in every
  * regime — including the heavy-collision one (width 8), where
  * Misra–Gries' content could legitimately differ with merge order.
  * Items arrive split across two micro-batches with groups straddling
  * the boundary.
  */
class StreamingCountMinSpec extends SparkSpec {
  import spark.implicits._

  test("streamed per-source CM matrix equals the batch aggregate, lossy regime included") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val rows = Tables
      .documents(spark, dir)
      .select(col("source"), explode(TextStats.tokens(col("text"))).as("tok"))
      .as[(String, String)]
      .collect()
      .toIndexedSeq

    val input = MemoryStream[(String, String)]
    val out = StreamingCountMin.sketch(
      input.toDF().toDF("source", "tok"), "source", "tok", depth = 4, width = 8)
    val q = out.writeStream
      .format("memory")
      .queryName("cm_stream")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("cm_ckpt").toString)
      .start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark
      .table("cm_stream")
      .select(col("source"), col("cm"))
      .as[(String, Seq[Seq[Long]])]
      .collect()
      .sortBy(_._1)
      .toSeq

    val want = StreamingCountMin
      .sketch(rows.toDF("source", "tok"), "source", "tok", depth = 4, width = 8)
      .select(col("source"), col("cm"))
      .as[(String, Seq[Seq[Long]])]
      .collect()
      .sortBy(_._1)
      .toSeq

    assert(got == want)
    assert(got.nonEmpty)
    // width 8 against a 31-term vocabulary: every row of every group's
    // matrix must be genuinely lossy (more distinct tokens than cells)
    val vocabPerSource = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(vocabPerSource.values.exists(_ > 8), "collision regime not reached")
  }
}
