package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim
import graft.expr.CountMinSketch

/** Streaming Count-Min: [[graft.expr.CountMinSketch]] is
  * streaming-native the same way MisraGries is — the stateful
  * streaming aggregation keeps the depth×width counter matrix per
  * group as its state-store row and sums each micro-batch's partial
  * matrices into it. Because CM merge is ELEMENTWISE SUM (exactly
  * mergeable), the parity law is stronger than heavy hitters': the
  * streamed matrix equals the batch matrix over the union of all
  * micro-batches BIT-FOR-BIT in every regime, lossy or not — there is
  * no merge-order-dependent summary content to caveat
  * (StreamingCountMinSpec pins this).
  *
  * Scale shape: state per group is a constant d·w longs however many
  * rows stream through; per-trigger shuffle is the same constant. The
  * 100 TB use is per-window frequency tracking (tokens/domains/URLs)
  * where an exact GROUP BY item would shuffle the item universe every
  * trigger.
  */
object StreamingCountMin {

  /** The `count_min(item, depth, width)` aggregate as a Column. */
  def countMin(item: Column, depth: Int, width: Int): Column =
    GraftShim.column(
      CountMinSketch(
        GraftShim.expression(item),
        GraftShim.expression(lit(depth)),
        GraftShim.expression(lit(width))
      ).toAggregateExpression()
    )

  /** `stream` is a STREAMING DataFrame. Returns the per-group counter
    * matrix for complete-mode sinks: (groupCol, cm array<array<bigint>>). */
  def sketch(stream: DataFrame, groupCol: String, itemCol: String, depth: Int, width: Int): DataFrame =
    stream
      .groupBy(col(groupCol))
      .agg(countMin(col(itemCol), depth, width).as("cm"))
}
