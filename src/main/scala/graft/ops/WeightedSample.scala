package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DETERMINISTIC weighted sampling without replacement per group —
  * Efraimidis–Spirakis A-Res ("Weighted random sampling with a
  * reservoir", IPL 2006): draw u ∈ (0,1) per item, rank by u^(1/w),
  * keep the top k. The top-k under that key IS a weight-proportional
  * sample without replacement — the primitive behind quality- or
  * token-budget-proportional subcorpus draws in training-data mixing
  * (complementing the UNweighted stratified sampler, q52, and the
  * corpus-level mixture weights, q62/q71).
  *
  * Two engineering choices make it reproducible at 100 TB:
  *
  *  - u comes from the engine-portable multiplicative hash
  *    ([[TextStats.portableHash]]), not rand(): same sample on every
  *    rerun, engine, partitioning, and cluster size.
  *  - the rank key is ln(u)/w — the monotone log form of u^(1/w)
  *    (one libm call instead of pow's two-argument rounding), ROUNDED
  *    to 6 decimals BEFORE ranking with an id tiebreak, the q66
  *    discipline: both engines rank identical keys, so a last-ulp
  *    libm divergence cannot flip adjacent ranks.
  *
  * Execution shape: key computation is map-side; the per-group top-k
  * window compiles to a WindowGroupLimit partial (each task keeps k
  * rows per group before the single group-keyed shuffle) — the same
  * bounded-shuffle story as q40/q66.
  */
object WeightedSample {

  /** Top-`k` per `groupCol`, weight-proportional without replacement.
    *
    * @param weightCol strictly positive weight (w ≤ 0 would invert the
    *                  key's monotonicity silently — filtered out, the
    *                  zero-weight convention of the q62 mixture laws)
    * @return input columns + (es_key, rn), rn ∈ [1, k]
    */
  def topKByWeight(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: Column,
      k: Int
  ): DataFrame = {
    val u = (TextStats.portableHash(col(idCol)).cast("double") + lit(0.5)) / lit(1000003.0)
    val keyed = df
      .withColumn("__wt", weightCol.cast("double"))
      .filter(col("__wt") > 0)
      .withColumn("es_key", round(log(u) / col("__wt"), 6))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("es_key").desc, col(idCol))
    keyed
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .drop("__wt")
  }
}
