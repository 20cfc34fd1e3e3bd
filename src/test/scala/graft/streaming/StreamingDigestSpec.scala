package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class IngestDoc(source: String, text: String)

/** Streaming corpus digest ≡ batch digest law: the per-source running
  * (n_docs, digest_sum, digest_xor) after two micro-batches equals the
  * batch aggregate over the union — bit-for-bit (both digests are
  * associative, so merge order cannot matter; this spec pins that the
  * streaming plumbing preserves it).
  */
class StreamingDigestSpec extends SparkSpec {
  import spark.implicits._

  test("per-source digests over two micro-batches equal the batch law") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select("source", "text")
      .as[IngestDoc]
      .collect()
      .sortBy(_.text)

    val input = MemoryStream[IngestDoc]
    val out = StreamingDigest.perGroupDigest(input.toDF(), "source", "text")
    val q = out.writeStream
      .format("memory")
      .queryName("digest_stream")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("digest_ckpt").toString)
      .start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 3)
      input.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()

      val streamed = spark
        .table("digest_stream")
        .orderBy("source")
        .collect()
        .map(_.toSeq)
        .toSeq
      val batch = StreamingDigest
        .perGroupDigest(
          Tables.documents(spark, "/root/testdata/sf0.001").select("source", "text"),
          "source",
          "text"
        )
        .orderBy("source")
        .collect()
        .map(_.toSeq)
        .toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
