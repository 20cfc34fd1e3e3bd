package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-portable DISCRETE order statistics: the value at rank
  * floor(q·(n−1))+1 of each group's sorted values — never an
  * interpolated average. This is the repo's cross-engine percentile
  * recipe (see docs/BENCH_NOTES.md): interpolating
  * implementations (Spark `percentile`, DuckDB `quantile_cont`)
  * disagree in the last ulp because their lerp formulas differ, while
  * a rank-SELECTED value is bit-identical everywhere. One copy here so
  * q92/q97-style consumers can't drift apart on the formula.
  *
  * Shape: one rank window + one count window per call, then a partial-
  * aggregated groupBy — distributes across however many groups exist
  * (callers wanting more parallelism pre-split groups, as q92 does
  * with per-day gap windows before profiling per type).
  */
object Stats {

  /** The 1-based select rank for quantile `q` over `n` rows. Both
    * engines compute floor on the same double product, so a boundary
    * value is consistent even when 0.95·(n−1) is off the exact integer
    * by an ulp. */
  def selectRank(q: Double, n: Column): Column =
    floor(lit(q) * (n - 1)) + 1

  /** Append one column per (quantile, name): the group's rank-selected
    * value of `valCol`, plus any `extra` (pre-aliased) aggregates in
    * the same pass. Groups = `keys`; ties in `valCol` are irrelevant
    * (equal values at a rank select the same value). */
  def rankSelect(
      df: DataFrame,
      keys: Seq[String],
      valCol: String,
      qs: Seq[(Double, String)],
      extra: Seq[Column] = Nil
  ): DataFrame = {
    val wv = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(col(valCol))
    val wt = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
    val sel = qs.map { case (q, name) =>
      max(when(col("__rn") === selectRank(q, col("__n")), col(valCol))).as(name)
    }
    val aggs = sel ++ extra
    df.withColumn("__rn", row_number().over(wv))
      .withColumn("__n", count(lit(1)).over(wt))
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
