package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** BANDED RANGE SELF-JOIN — the scale-correct shape for "pairs within
    * distance d of each other" on the same key. The inequality-only
    * declarative form plans a nested loop (O(n²) per key regardless of
    * band selectivity); here the range axis is bucketed BY the band
    * width, the ORIENTED left element is emitted to its own bucket AND
    * the next one, the join is equi on (key, bucket), and the exact
    * band predicate is re-checked. A pair (a, b) oriented a ≤ b with
    * b − a ≤ d satisfies bucket(b) ∈ {bucket(a), bucket(a)+1} — since
    * (v + d) div d = v div d + 1 exactly — and exactly ONE of the two
    * emissions matches, so every qualifying pair is produced exactly
    * once and no dedup pass exists. Work is proportional to pairs
    * within ~2d, shuffle keyed on (key, bucket).
    *
    * Returns all oriented pairs (left, right) with
    * `0 <= right.v − left.v <= d`, orientation `(v, tie)` lexicographic
    * strictly increasing (a row never pairs with itself; each unordered
    * pair appears once).
    *
    * @param vCol   integer range axis (days, seconds, …); must be
    *               non-negative — `div` truncates toward zero, which is
    *               floor (what bucketing needs) only for v ≥ 0
    * @param tieCol unique-per-group tiebreaker for equal `v`
    * @param d      band width, > 0
    * @return key, l_tie, r_tie, l_v, r_v, gap (= r_v − l_v ∈ [0, d])
    */
  def bandedSelfJoin(
      df: DataFrame,
      keyCol: String,
      vCol: Column,
      tieCol: Column,
      d: Long
  ): DataFrame = {
    val base = df.select(col(keyCol).as("key"), vCol.cast("long").as("v"), tieCol.as("tie"))
    val left = base
      .withColumn("__b0", expr("v div " + d))
      .withColumn("__bucket", explode(array(col("__b0"), col("__b0") + 1)))
      .select(col("key"), col("__bucket"), col("v").as("l_v"), col("tie").as("l_tie"))
    val right = base.select(
      col("key"),
      expr("v div " + d).as("__bucket"),
      col("v").as("r_v"),
      col("tie").as("r_tie")
    )
    left
      .join(right, Seq("key", "__bucket"))
      .filter(
        (col("r_v") - col("l_v")).between(0, d) &&
          (col("l_v") < col("r_v") || (col("l_v") === col("r_v") && col("l_tie") < col("r_tie")))
      )
      .select(
        col("key"),
        col("l_tie"),
        col("r_tie"),
        col("l_v"),
        col("r_v"),
        (col("r_v") - col("l_v")).as("gap")
      )
  }
}
