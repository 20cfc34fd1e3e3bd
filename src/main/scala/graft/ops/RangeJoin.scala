package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows with a point timestamp match right
  * rows with a [start, end] validity window on the same key.
  *
  * Naively this is a theta join — Spark plans BroadcastNestedLoop and
  * dies at scale. The bucketized form turns it into an EQUI join:
  * choose a bucket width, explode each right interval to the buckets it
  * covers (an interval of length L covers ≤ L/w + 1 buckets), put each
  * left point in its single bucket, join on (key, bucket), then apply
  * the exact BETWEEN as a cheap post-filter. Shuffle is keyed on
  * (key, bucket) — co-partitioned, skew bounded by bucket population.
  * Pick `bucketMs` near the typical interval length so replication
  * stays ~2×.
  */
object RangeJoin {

  /** Inner bucketized range join. Left must carry `leftTs` (timestamp),
    * right `startCol`/`endCol` (timestamps, inclusive bounds).
    */
  def bucketed(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      startCol: String,
      endCol: String,
      bucketMs: Long
  ): DataFrame = {
    val lb = left.withColumn(
      "__bucket",
      (unix_millis(col(leftTs).cast("timestamp")) / bucketMs).cast("long")
    )
    val rb = right
      .withColumn(
        "__bucket",
        explode(
          sequence(
            (unix_millis(col(startCol).cast("timestamp")) / bucketMs).cast("long"),
            (unix_millis(col(endCol).cast("timestamp")) / bucketMs).cast("long")
          )
        )
      )
    lb.join(rb, Seq(key, "__bucket"))
      .filter(col(leftTs) >= col(startCol) && col(leftTs) <= col(endCol))
      .drop("__bucket")
  }
}
