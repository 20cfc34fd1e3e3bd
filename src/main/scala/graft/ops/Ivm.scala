package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INCREMENTAL VIEW MAINTENANCE for distributive aggregates — the
  * Materialize/Flink-style law that a grouped (count, sum) view can be
  * maintained from a CHANGELOG (weighted rows: +1 insert, −1 retract)
  * without rescanning the base:
  *
  *   new_agg(key) = old_agg(key) ⊕ Σ_changes (w, w·v)
  *
  * Groups whose maintained count reaches 0 are deleted (a group the
  * base no longer has must disappear from the view, not linger as a
  * zero row); groups born in the delta appear with old = (0, 0). The
  * law "maintained ≡ recomputed from the changed base" is what q180
  * certifies differentially — on both engines, because the trap is
  * subtle enough to get wrong anywhere (zero-row retention, null
  * old-groups, retractions of never-seen keys).
  *
  * Scale: the delta aggregate touches only the changelog; the merge is
  * one outer join on the group key — view maintenance cost is
  * O(|delta|), independent of |base|, which is the entire point at
  * 100 TB.
  */
object Ivm {

  /** @param oldAgg  (key..., cnt, sm) — the materialized view
    * @param changes (key..., w, v) — weighted changelog rows, w ∈ {+1, −1}
    * @return maintained (key..., cnt, sm), zero-count groups dropped
    */
  def maintain(oldAgg: DataFrame, changes: DataFrame, keyCols: Seq[String]): DataFrame = {
    val delta = changes
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("w")).as("d_cnt"),
        sum(col("w") * col("v")).as("d_sm"))
      .withColumnsRenamed(keyCols.map(c => c -> s"__d_$c").toMap)
    val cond = keyCols.map(c => col(c) <=> col(s"__d_$c")).reduce(_ && _)
    oldAgg
      .join(delta, cond, "full_outer")
      .select(
        (keyCols.map(c => coalesce(col(c), col(s"__d_$c")).as(c)) ++ Seq(
          (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"),
          (coalesce(col("sm"), lit(0L)) + coalesce(col("d_sm"), lit(0L))).as("sm"))): _*)
      .where(col("cnt") > 0)
  }
}
