package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import graft.ops.SparseSim
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class ProbeDoc(doc_id: Long, text: String)

/** Streaming decontamination gate ≡ batch coverage law: probes arriving
  * across micro-batches converge to exactly the q114 batch answer
  * against the same frozen eval-set index.
  */
class StreamingSparseSimSpec extends SparkSpec {
  import spark.implicits._

  test("coverage flags over two micro-batches equal the batch law") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val idx = SparseSim
      .coverageIndex(
        docs.filter(col("doc_id") % 10 === 7), "doc_id", "text", n = 3,
        dfCap = lit(64.0) // q114's constant cap (round 7)
      )
      .persist()
    // threshold 0 so the parity check covers BELOW-flag pairs too
    val probeDocs = docs
      .filter(col("doc_id") % 10 =!= 7)
      .filter(col("doc_id") < 120) // enough to include flagged pairs fast
      .select("doc_id", "text")
      .as[ProbeDoc]
      .collect()
      .sortBy(_.doc_id)

    val input = MemoryStream[ProbeDoc]
    val out = StreamingSparseSim.flagged(input.toDF(), idx, n = 3, threshold = 0.0)
    val q = out.writeStream
      .format("memory")
      .queryName("sparse_stream")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("sparse_ckpt").toString)
      .start()
    try {
      val (b1, b2) = probeDocs.splitAt(probeDocs.length / 2)
      input.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()

      val streamed = spark
        .table("sparse_stream")
        .as[(Long, Long, Long, Double)]
        .collect()
        .sortBy(r => (r._1, r._2))
        .toSeq
      val batchProbes = SparseSim
        .distinctFeatures(
          docs.filter(col("doc_id") % 10 =!= 7).filter(col("doc_id") < 120),
          "doc_id", "text", n = 3
        )
        .withColumnRenamed("doc_id", "probe_id")
      val batch = SparseSim
        .coverageScores(batchProbes, idx, threshold = 0.0)
        .as[(Long, Long, Long, Double)]
        .collect()
        .sortBy(r => (r._1, r._2))
        .toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch, s"stream/batch divergence:\nstream=${streamed.take(8)}\nbatch=${batch.take(8)}")
    } finally {
      q.stop()
      idx.unpersist()
    }
  }
}
