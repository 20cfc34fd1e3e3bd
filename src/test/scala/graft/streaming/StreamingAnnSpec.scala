package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class QVec(vec_id: Long, embedding: Array[Float])

/** Stream-static ANN: queries arriving across micro-batches converge to
  * exactly the batch annTopK answer (same buckets, same tie rules).
  */
class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  test("streaming top-k over two micro-batches equals batch annTopK") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val corpus = Tables.embeddings(spark, dir)
    val queryVecs = corpus
      .filter(col("vec_id") < 10)
      .select("vec_id", "embedding")
      .as[QVec]
      .collect()
      .sortBy(_.vec_id)

    val input = MemoryStream[QVec]
    val out = StreamingAnn.topK(input.toDF(), corpus, k = 5, nbits = 4, tables = 12)
    val q = out.writeStream
      .format("memory")
      .queryName("ann_stream")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("ann_ckpt").toString)
      .start()
    try {
      input.addData(queryVecs.take(4).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(queryVecs.drop(4).toIndexedSeq: _*)
      q.processAllAvailable()

      val streamed = spark
        .table("ann_stream")
        .select("query_id", "rank", "neighbor_id", "sim")
        .as[(Long, Int, Long, Double)]
        .collect()
        .sortBy(r => (r._1, r._2))
        .toSeq
      val batch = Similarity
        .annTopK(corpus, corpus.filter(col("vec_id") < 10), k = 5, nbits = 4, tables = 12)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
        .as[(Long, Int, Long, Double)]
        .collect()
        .sortBy(r => (r._1, r._2))
        .toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch, s"stream/batch divergence:\nstream=${streamed.take(8)}\nbatch=${batch.take(8)}")
    } finally q.stop()
  }
}
