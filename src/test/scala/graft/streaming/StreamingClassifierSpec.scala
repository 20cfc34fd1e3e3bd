package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import graft.ops.Classifier
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class ClsDoc(doc_id: Long, text: String)

/** Streaming classifier gate ≡ batch law: train once on the batch
  * corpus, then the stateless gate over two micro-batches must equal
  * the same gate run as a batch projection — bit-for-bit scores — and
  * the threshold must genuinely reject rows.
  */
class StreamingClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("streamed gate over two micro-batches equals the batch gate, bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val feats = Classifier.features(corpus, "text", "lang").cache()
    feats.count()
    val w = Classifier.fit(feats, iters = 6)

    // median-ish threshold so the gate genuinely passes AND rejects
    val scores = Classifier
      .withFeatures(corpus, "text")
      .select(Classifier.probExpr(Classifier.zExpr(w)).as("p"))
      .as[Double].collect().sorted
    val thr = scores(scores.length / 2)

    val docs = corpus.select($"doc_id", $"text").as[ClsDoc].collect().sortBy(_.doc_id)
    val input = MemoryStream[ClsDoc]
    val out = StreamingClassifier.gate(input.toDF(), "text", w, minScore = thr)
    val q = out.writeStream
      .format("memory")
      .queryName("cls_gate")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("cls_ckpt").toString)
      .start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      input.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("cls_gate").collect().map(_.toSeq).toSet
      val batch = StreamingClassifier
        .gate(corpus.select($"doc_id", $"text"), "text", w, minScore = thr)
        .collect()
        .map(_.toSeq)
        .toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty, "gate passed nothing")
      assert(batch.size < docs.length, "threshold rejected nothing — gate untested")
    } finally q.stop()
  }
}
