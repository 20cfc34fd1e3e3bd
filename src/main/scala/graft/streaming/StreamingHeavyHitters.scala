package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim
import graft.expr.MisraGries

/** Streaming heavy hitters: [[graft.expr.MisraGries]] is
  * streaming-NATIVE — Spark's stateful streaming aggregation keeps the
  * MG buffer (≤ k counters) per group as its state-store row and
  * absorbs each micro-batch's partial summaries into it, so an
  * unbounded stream gets per-group frequent items at O(k) state and
  * constant per-batch shuffle bytes with no extra machinery. This
  * wrapper only assembles the aggregate Column; the bounded-state and
  * merge-error contracts live with the sketch itself (FreqSketchSpec:
  * lossy-regime n/(k+1) undercount bound, retention, merge).
  *
  * Parity law (StreamingHeavyHittersSpec): in the EXACT regime
  * (k ≥ distinct items per group) Misra–Gries retains every item with
  * exact counts regardless of merge order, so the streamed result
  * equals the batch aggregate over the union of all micro-batches —
  * bit-for-bit, not approximately. In the lossy regime stream and
  * batch may retain different (both bound-respecting) summaries; that
  * error contract is FreqSketchSpec's, not a parity claim.
  *
  * Scale shape: state per group is ≤ k (item, count) pairs; a
  * complete-mode sink emits |groups| rows per trigger. At 100 TB the
  * same aggregate runs per-window instead of complete-mode global —
  * the sketch state size is what makes per-window token/domain/URL
  * tracking affordable where exact GROUP BY item would shuffle the
  * full item universe every trigger.
  */
object StreamingHeavyHitters {

  /** The `heavy_hitters(item, k)` aggregate as a Column (Column-API
    * form of the SQL function GraftExtensions registers). */
  def heavyHitters(item: Column, k: Int): Column =
    GraftShim.column(
      MisraGries(GraftShim.expression(item), GraftShim.expression(lit(k)))
        .toAggregateExpression()
    )

  /** `stream` is a STREAMING DataFrame. Returns the per-group hitters
    * map for complete-mode sinks: (groupCol, hitters map<string,bigint>). */
  def topItems(stream: DataFrame, groupCol: String, itemCol: String, k: Int): DataFrame =
    stream
      .groupBy(col(groupCol))
      .agg(heavyHitters(col(itemCol), k).as("hitters"))
}
