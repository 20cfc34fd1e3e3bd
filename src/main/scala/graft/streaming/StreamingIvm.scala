package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING incremental view maintenance — the [[graft.ops.Ivm]]
  * changelog contract run as a live stream: a weighted changelog
  * (key..., w ∈ {+1,−1}, v) maintains the grouped (count, sum) view as
  * a stateful streaming aggregation. cnt = Σw and sm = Σw·v are plain
  * associative sums, so Spark's streaming state IS the maintained
  * view: per-key state is two longs, each micro-batch contributes
  * map-side partials, and no base rescan ever happens — the O(|delta|)
  * property, now per micro-batch.
  *
  * Dead groups: in complete-mode aggregation the state row for a
  * fully-retracted key still exists (state deletion needs arbitrary
  * stateful processing); the VIEW contract instead filters cnt > 0 on
  * the way out — same observable result as [[graft.ops.Ivm.maintain]]
  * dropping the group. StreamingIvmSpec pins both laws: streamed
  * after N micro-batches ≡ batch view over the union, and batch view ≡
  * Ivm.maintain(prefix view, suffix changelog).
  */
object StreamingIvm {

  /** Works identically on a batch or streaming changelog frame — the
    * parity spec runs THIS function on both sides.
    */
  def viewOf(changes: DataFrame, keyCols: Seq[String]): DataFrame =
    changes
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("w")).as("cnt"),
        sum(col("w") * col("v")).as("sm"))
      .where(col("cnt") > 0)
}
