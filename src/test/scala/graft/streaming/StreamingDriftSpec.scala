package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.ops.Drift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class FeatRow(id: Long, value: Double)

/** Streaming PSI: per-micro-batch observations equal the batch Drift
  * computation on the same rows, and a planted shift is flagged.
  */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private val bins = 10
  private def binExpr = floor(col("value") * bins)

  test("per-batch PSI equals the batch operator; planted shift drifts") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(3)
    // reference: uniform [0,1); batch 1: same distribution (stable);
    // batch 2: squeezed into the top bins (drifted)
    val refRows = (1 to 2000).map(i => FeatRow(i.toLong, rnd.nextDouble()))
    val b1 = (1 to 500).map(i => FeatRow(10000L + i, rnd.nextDouble()))
    val b2 = (1 to 500).map(i => FeatRow(20000L + i, 0.8 + 0.2 * rnd.nextDouble()))
    val ref = Drift.histogram(refRows.toDF(), binExpr, bins)

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val input = MemoryStream[FeatRow]
    val q = StreamingDrift
      .psiMonitor(input.toDF(), binExpr, ref, bins,
        (id, n, psi) => seen.synchronized { seen += ((id, n, psi)) })
      .option("checkpointLocation", Files.createTempDirectory("psi_ckpt").toString)
      .start()
    try {
      input.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val obs = seen.sortBy(_._1).toSeq
    assert(obs.map(_._2) == Seq(500L, 500L))
    // parity: each observation equals the batch operator on those rows
    val psi1 = Drift.psi(Drift.histogram(b1.toDF(), binExpr, bins), ref, bins)
    val psi2 = Drift.psi(Drift.histogram(b2.toDF(), binExpr, bins), ref, bins)
    assert(obs(0)._3 == psi1 && obs(1)._3 == psi2,
      s"stream/batch divergence: $obs vs ($psi1, $psi2)")
    // the metric itself behaves: same-distribution batch stable, shifted batch loud
    assert(psi1 < 0.1, s"stable batch psi $psi1")
    assert(psi2 > 0.25, s"shifted batch psi $psi2")
  }
}
