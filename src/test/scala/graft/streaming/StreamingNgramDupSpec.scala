package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class ArrivingDoc(doc_id: Long, text: String)

/** Streaming repeated-span gate ≡ batch law: profiling arrivals against
  * the frozen corpus shingle index over two micro-batches equals
  * [[StreamingNgramDup.profileAgainst]] on the same rows as a static
  * frame — integer counts, exact equality.
  */
class StreamingNgramDupSpec extends SparkSpec {
  import spark.implicits._

  test("streamed profile over two micro-batches equals the batch profile") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001").filter(col("doc_id") < 30)
    val idx = StreamingNgramDup.index(corpus, "text", 5).persist()
    idx.count()

    val arrivals = Tables
      .documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= 30)
      .select("doc_id", "text")
      .as[ArrivingDoc]
      .collect()
      .sortBy(_.doc_id)

    val input = MemoryStream[ArrivingDoc]
    val out = StreamingNgramDup.profileAgainst(input.toDF(), idx, 5, "doc_id", "text")
    val q = out.writeStream
      .format("memory")
      .queryName("ngram_gate_stream")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("ngram_ckpt").toString)
      .start()
    try {
      val (b1, b2) = arrivals.splitAt(arrivals.length / 2)
      input.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()

      val streamed = spark
        .table("ngram_gate_stream")
        .select("doc_id", "n_spans", "known_spans")
        .as[(Long, Long, Long)]
        .collect()
        .sortBy(_._1)
        .toSeq
      val batch = StreamingNgramDup
        .profileAgainst(
          arrivals.toSeq.toDF("doc_id", "text"),
          idx,
          5,
          "doc_id",
          "text"
        )
        .select("doc_id", "n_spans", "known_spans")
        .as[(Long, Long, Long)]
        .collect()
        .sortBy(_._1)
        .toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty && streamed.exists(_._3 > 0L),
        "fixture must exercise the hit path")
    } finally q.stop()
  }
}
