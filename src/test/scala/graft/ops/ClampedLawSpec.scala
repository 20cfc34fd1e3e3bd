package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The clamped-running-sum window identity
  * `level = cum − min(0, running-min(cum))` must equal the sequential
  * fold `level_i = max(0, level_{i−1} + w_i)` — on random streams,
  * all-negative streams (pinned at 0), and oscillating dip/recover
  * patterns (repeated clamping).
  */
class ClampedLawSpec extends SparkSpec {
  import spark.implicits._

  private def sequential(ws: Seq[Long]): Seq[Long] =
    ws.scanLeft(0L)((lvl, w) => math.max(0L, lvl + w)).tail

  private def check(rows: Seq[(String, Long, Long)]): Unit = {
    val df = rows.toDF("k", "i", "w")
    val got = Sweep
      .clampedRunningSum(df, Seq("k"), $"i", $"i", $"w", "lvl")
      .select($"k", $"i", $"lvl")
      .as[(String, Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (k, xs) => k -> xs.sortBy(_._2).map(_._3).toSeq }
    val want = rows
      .groupBy(_._1)
      .map { case (k, xs) => k -> sequential(xs.sortBy(_._2).map(_._3)) }
    assert(got === want)
  }

  test("identity equals the sequential fold on random signed streams") {
    val rnd = new scala.util.Random(9)
    check(for {
      k <- Seq("a", "b", "c")
      i <- 1L to 500L
    } yield (k, i, rnd.nextInt(21) - 10L))
  }

  test("all-negative stream stays pinned at zero; dip-recover clamps repeatedly") {
    check((1L to 50L).map(i => ("neg", i, -3L)))
    check((1L to 60L).map(i => ("osc", i, if (i % 3 == 0) 5L else -4L)))
  }
}
