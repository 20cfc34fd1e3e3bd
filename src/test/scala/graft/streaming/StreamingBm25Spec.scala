package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class GateDoc(doc_id: Long, text: String)

/** Streaming BM25 gate ≡ batch law, two ways:
  *  1. the stateless gate over two micro-batches equals the gate run
  *     as a batch projection on the union — bit-for-bit scores;
  *  2. the gate's scores equal ops.Bm25.search's scores for the same
  *     (qid, doc) pairs — the fold-with-zeros trick is bit-exact
  *     against the matched-terms-only fold.
  */
class StreamingBm25Spec extends SparkSpec {
  import spark.implicits._

  private val queries = Seq(1 -> Seq("hash", "join"), 2 -> Seq("vector", "scan"))

  test("streamed gate over two micro-batches equals the batch gate, bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val terms = queries.flatMap(_._2).distinct
    val st = Bm25.fitStats(corpus, "doc_id", "text", terms,
      Bm25.postings(corpus, "doc_id", "text", terms))

    val docs = corpus.select($"doc_id", $"text").as[GateDoc].collect().sortBy(_.doc_id)
    // threshold below the observed score range at this SF (common terms
    // → small idf), so the gate genuinely passes AND rejects rows
    val input = MemoryStream[GateDoc]
    val out = StreamingBm25.gate(input.toDF(), "doc_id", "text", queries, st, minScore = 0.5)
    val q = out.writeStream
      .format("memory")
      .queryName("bm25_gate")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("bm25_ckpt").toString)
      .start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      input.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("bm25_gate").collect().map(_.toSeq).toSet
      val batch = StreamingBm25
        .gate(corpus, "doc_id", "text", queries, st, minScore = 0.5)
        .collect()
        .map(_.toSeq)
        .toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      // the gate must also REJECT: some (doc, query) pairs score below
      val all = StreamingBm25
        .gate(corpus, "doc_id", "text", queries, st, minScore = Double.NegativeInfinity)
        .count()
      assert(all > batch.size, "threshold rejected nothing — gate untested")
    } finally q.stop()
  }

  test("gate scores equal the batch scorer's scores on the same (qid, doc) pairs") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val terms = queries.flatMap(_._2).distinct
    val st = Bm25.fitStats(corpus, "doc_id", "text", terms,
      Bm25.postings(corpus, "doc_id", "text", terms))
    // k large enough to keep every matching doc → search IS the full
    // scored frame
    val full = Bm25
      .search(spark, corpus, "doc_id", "text", queries, k = Int.MaxValue)
      .select($"qid", $"doc_id", $"score")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val gated = StreamingBm25
      .gate(corpus, "doc_id", "text", queries, st, minScore = 0.5)
      .collect()
    assert(gated.nonEmpty)
    gated.foreach { r =>
      val key = (r.getAs[Int]("qid"), r.getAs[Long]("doc_id"))
      val want = full.getOrElse(key, fail(s"gate emitted $key absent from batch scorer"))
      // BIT equality, not tolerance — the fold orders are constructed equal
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("score")) ===
        java.lang.Double.doubleToLongBits(want), s"$key: ${r.getAs[Double]("score")} vs $want")
    }
  }
}
