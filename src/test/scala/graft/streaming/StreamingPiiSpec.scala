package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming PII counters ≡ batch law: the per-source running pattern
  * counts after two micro-batches equal the batch aggregate over the
  * union (every counter is an associative sum of map-side per-row
  * regex counts). Decoys are injected into the test stream so the
  * parity can't pass vacuously on an all-zero corpus.
  */
class StreamingPiiSpec extends SparkSpec {
  import spark.implicits._

  test("per-source PII counters over two micro-batches equal the batch law") {
    implicit val sqlCtx = spark.sqlContext
    val base = Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select("source", "text")
      .as[IngestDoc]
      .collect()
      .sortBy(_.text)
    val decoys = Seq(
      IngestDoc("s_decoy", "mail bob@example.com and 10.1.2.3 plus https://x.org/a"),
      IngestDoc("s_decoy", "ssn 123-45-6789 phone 415-555-0123"),
      IngestDoc("s_decoy", "two mails a@b.io c@d.co and 192.168.0.1")
    )
    val docs = base ++ decoys

    val input = MemoryStream[IngestDoc]
    val out = StreamingPii.perGroupCounts(input.toDF(), "source", "text")
    val q = out.writeStream
      .format("memory")
      .queryName("pii_stream")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("pii_ckpt").toString)
      .start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 3)
      input.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()

      val streamed = spark
        .table("pii_stream")
        .orderBy("source")
        .collect()
        .map(_.toSeq)
        .toSeq
      val batch = StreamingPii
        .perGroupCounts(docs.toSeq.toDF(), "source", "text")
        .orderBy("source")
        .collect()
        .map(_.toSeq)
        .toSeq
      assert(streamed == batch)
      // non-vacuity: the decoy source counted every planted class
      val decoyRow = spark.table("pii_stream").filter($"source" === "s_decoy").collect()(0)
      assert(decoyRow.getLong(1) === 3L) // n_docs
      assert(decoyRow.getLong(2) === 3L) // emails
      assert(decoyRow.getLong(3) === 1L) // phones: 415-555-0123 (123-45-6789 is not phone-shaped)
      assert(decoyRow.getLong(4) === 2L) // ips
      assert(decoyRow.getLong(5) === 1L) // ssns
      assert(decoyRow.getLong(6) === 1L) // urls
    } finally q.stop()
  }
}
