package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming IVF-PQ serving: queries arriving across micro-batches
  * against the frozen serving index converge to EXACTLY the batch
  * two-stage law (ADC shortlist → exact rerank, same tie rules) —
  * the scoredCandidates frame is shared verbatim between the streaming
  * aggregator path and the batch window path, so any divergence is the
  * state machinery's fault.
  */
class StreamingIvfPqSpec extends SparkSpec {
  import spark.implicits._

  test("streamed two-stage top-k over two micro-batches equals the batch window law") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val corpus = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val (k, short, nprobe) = (5, 20, 2)
    val ix = StreamingIvfPq.buildIndex(
      corpus, kCells = 8, ivfIters = 2, m = 16, ksub = 16, pqIters = 1)

    val queryVecs = corpus
      .filter(col("vec_id") < 8)
      .as[QVec] // (vec_id, embedding) — shared with StreamingAnnSpec
      .collect()
      .sortBy(_.vec_id)

    val input = MemoryStream[QVec]
    val out = StreamingIvfPq.topK(input.toDF(), ix, k = k, short = short, nprobe = nprobe)
    val q = out.writeStream
      .format("memory")
      .queryName("ivfpq_stream")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("ivfpq_ckpt").toString)
      .start()
    try {
      input.addData(queryVecs.take(3).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(queryVecs.drop(3).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ivfpq_stream")
      .select("query_id", "rank", "neighbor_id", "sim")
      .as[(Long, Int, Long, Double)]
      .collect()
      .sortBy(r => (r._1, r._2))

    // batch law over the SAME scored-candidate frame: window shortlist
    // by (adc desc, id), window rerank by (rscore desc, id)
    val scored = StreamingIvfPq.scoredCandidates(
      corpus.filter(col("vec_id") < 8), ix, nprobe = nprobe)
    val ws = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("neighbor_id"))
    val wr = Window.partitionBy(col("query_id")).orderBy(col("rscore").desc, col("neighbor_id"))
    val want = scored
      .withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= short)
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("rscore"), 4).as("sim"))
      .as[(Long, Int, Long, Double)]
      .collect()
      .sortBy(r => (r._1, r._2))

    assert(got.length == want.length, s"${got.length} vs ${want.length}")
    assert(got.toSeq == want.toSeq,
      s"stream/batch divergence:\n${got.toSeq}\nvs\n${want.toSeq}")
  }
}
