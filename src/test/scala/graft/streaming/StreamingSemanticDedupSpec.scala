package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import graft.ops.Ivf
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental semantic dedup: arrivals across micro-batches classify
  * against the frozen rep snapshot exactly as the batch run of the same
  * operator does, and the drop rule matches a pure-Scala brute force on
  * the shared-cell structure.
  */
class StreamingSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val tau = 0.35

  test("streaming classify over two micro-batches equals the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val all = Tables.embeddings(spark, dir)
    val reps = all.filter(col("vec_id") < 100)
    val cents = Ivf.fitCentroids(reps, k = 4, iters = 2)
    val arrivals = all
      .filter(col("vec_id") >= 100 && col("vec_id") < 160)
      .select("vec_id", "embedding")
      .as[QVec]
      .collect()
      .sortBy(_.vec_id)

    val input = MemoryStream[QVec]
    val out = StreamingSemanticDedup.classify(input.toDF(), reps, cents, m = 2, tau = tau)
    val q = out.writeStream
      .format("memory")
      .queryName("semdedup_stream")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("sd_ckpt").toString)
      .start()
    try {
      input.addData(arrivals.take(25).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(arrivals.drop(25).toIndexedSeq: _*)
      q.processAllAvailable()

      val streamed = spark
        .table("semdedup_stream")
        .select("vec_id", "kept", "rep_id")
        .as[(Long, Boolean, Long)]
        .collect()
        .sortBy(_._1)
        .toSeq
      // batch parity: the same operator over the arrivals as one batch
      val batch = StreamingSemanticDedup
        .classify(
          all.filter(col("vec_id") >= 100 && col("vec_id") < 160),
          reps, cents, m = 2, tau = tau)
        .select("vec_id", "kept", "rep_id")
        .as[(Long, Boolean, Long)]
        .collect()
        .sortBy(_._1)
        .toSeq
      assert(streamed.size == 60)
      assert(streamed == batch, s"stream/batch divergence:\nstream=${streamed.take(6)}\nbatch=${batch.take(6)}")
    } finally q.stop()
  }

  test("classifyEach (stateless foreachBatch form) matches the batch run per batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val all = Tables.embeddings(spark, dir)
    val reps = all.filter(col("vec_id") < 100)
    val cents = Ivf.fitCentroids(reps, k = 4, iters = 2)
    val arrivals = all
      .filter(col("vec_id") >= 100 && col("vec_id") < 140)
      .select("vec_id", "embedding")
      .as[QVec].collect().sortBy(_.vec_id)

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean, Long)]
    val input = MemoryStream[QVec]
    val q = StreamingSemanticDedup
      .classifyEach(input.toDF(), reps, cents, m = 2, tau = tau) { (batch, _) =>
        val rows = batch.select("vec_id", "kept", "rep_id").as[(Long, Boolean, Long)].collect()
        seen.synchronized { seen ++= rows }
      }
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("sde_ckpt").toString)
      .start()
    try {
      input.addData(arrivals.take(20).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(arrivals.drop(20).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val batch = StreamingSemanticDedup
      .classify(
        all.filter(col("vec_id") >= 100 && col("vec_id") < 140),
        reps, cents, m = 2, tau = tau)
      .select("vec_id", "kept", "rep_id")
      .as[(Long, Boolean, Long)].collect().sortBy(_._1).toSeq
    assert(seen.sortBy(_._1).toSeq == batch, "foreachBatch/batch divergence")
  }

  test("drop rule matches a pure-Scala brute force on the shared-cell structure") {
    val dir = "/root/testdata/sf0.001"
    val all = Tables.embeddings(spark, dir)
    val reps = all.filter(col("vec_id") < 100)
    val cents = Ivf.fitCentroids(reps, k = 4, iters = 2)
    val arrivalsDf = all.filter(col("vec_id") >= 100 && col("vec_id") < 160)

    val got = StreamingSemanticDedup
      .classify(arrivalsDf, reps, cents, m = 2, tau = tau)
      .select("vec_id", "kept", "rep_id")
      .as[(Long, Boolean, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap

    // reference: cells from the same quantizer, cosine in plain Scala
    def cells(df: org.apache.spark.sql.DataFrame) = Ivf
      .assignTopM(df, cents, m = 2)
      .select("vec_id", "cluster_id")
      .as[(Long, Int)]
      .collect()
      .groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val repCells = cells(reps)
    val arrCells = cells(arrivalsDf)
    val vecs = all
      .filter(col("vec_id") < 160)
      .select("vec_id", "embedding")
      .as[QVec].collect().map(v => v.vec_id -> v.embedding).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    arrCells.foreach { case (aid, ac) =>
      val hits = repCells.collect {
        case (rid, rc) if (ac & rc).nonEmpty && cos(vecs(aid), vecs(rid)) >= tau => rid
      }
      val expected = if (hits.isEmpty) (true, aid) else (false, hits.min)
      assert(got(aid) == expected, s"arrival $aid: got ${got(aid)}, expected $expected")
    }
  }
}
