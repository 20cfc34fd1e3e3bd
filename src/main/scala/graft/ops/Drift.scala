package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift primitives backing the STREAMING monitor
  * (graft.streaming.StreamingDrift): a fixed-width bin histogram (the
  * one distributed aggregate — the part that scales with data) and the
  * Laplace-smoothed PSI fold over it (a scalar pass over `bins`
  * numbers — constants, not data). Same METRIC as the batch q102, but
  * q102 keeps its own in-plan DataFrame fold — its decimal-staged PSI
  * is part of an oracle contract that a driver-side fold can't express;
  * a formula change must be applied to both (StreamingDriftSpec pins
  * this side, the q102 oracle pins that one).
  *
  * PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref), with +1 smoothing
  * over the full [0, bins) domain so empty bins can't blow up the log
  * and both sides sum over the SAME bin set. Conventional read: < 0.1
  * stable, > 0.25 drifted.
  */
object Drift {

  /** Bin-count histogram of an integer bin expression, clamped to
    * [0, bins). Rows whose bin is NULL or NaN are DROPPED, not folded
    * into bin 0 — silently counting a broken feature as bin-0 mass
    * would mask exactly the data-quality failure a drift monitor
    * exists to surface (compare the dropped count against the batch
    * size if missingness itself should alarm). One distributed
    * groupBy; the result is bins-sized — a broadcast-scale constant,
    * so collecting it is not a data collect.
    */
  def histogram(df: DataFrame, binExpr: Column, bins: Int): Map[Int, Long] = {
    val b = binExpr.cast("double")
    df.select(b.as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
      .select(least(greatest(col("v").cast("int"), lit(0)), lit(bins - 1)).as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
  }

  /** Laplace-smoothed PSI between two bin-count maps over the fixed
    * [0, bins) domain (missing bins count 0). Scalar fold — both
    * histograms are bins-sized constants by the time this runs. */
  def psi(cur: Map[Int, Long], ref: Map[Int, Long], bins: Int): Double = {
    val nCur = cur.values.sum
    val nRef = ref.values.sum
    (0 until bins).map { b =>
      val pc = (cur.getOrElse(b, 0L) + 1).toDouble / (nCur + bins)
      val pr = (ref.getOrElse(b, 0L) + 1).toDouble / (nRef + bins)
      (pc - pr) * math.log(pc / pr)
    }.sum
  }
}
