package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the most recent right
  * row of the same key with right.ts <= left.ts.
  *
  * Implementation is the union + carry-forward pattern — the shape that
  * scales: tag both sides, union them, ONE shuffle/sort per key by
  * (ts, side), and carry the last non-null right payload forward with a
  * running `last(_, ignoreNulls)` window. Cost is a single exchange over
  * |L|+|R| rows; the naive formulation (per-left-row range subquery or
  * theta join) is O(|L|·|R|) and unusable at scale. Right rows sort
  * before left rows at equal timestamps, giving inclusive (<=) as-of
  * semantics.
  */
object AsOf {

  /** Left as-of join. `rightCols` are the right payload columns to carry
    * (they appear in the output, null when no right row precedes).
    * `leftTs`/`rightTs` must be mutually comparable types.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    // the right payload travels as ONE struct so all carried fields come
    // from the SAME right row (per-column carry could mix rows when a
    // payload field is legitimately null)
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)).toIndexedSeq
    )
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(
        (Seq(col(key).as("__k"), col("__ts"), col("__side")) ++
          leftCols.map(col) :+
          lit(null).cast(rStructType).as("__r")): _*
      )
    val r = right
      // SQL join semantics: null keys never match — a null-key right row
      // must not carry into null-key left rows sharing the partition
      .filter(col(key).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(
        (Seq(col(key).as("__k"), col("__ts"), col("__side")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(rightCols.map(col): _*).as("__r")): _*
      )
    val u = l.unionByName(r)
    // __r as the final sort key: when several right rows share (key, ts),
    // last(ignoreNulls) would otherwise pick whichever the (unstable)
    // sort happened to place last — nondeterministic across runs. Struct
    // ordering is field-by-field, so ties resolve to the max payload
    // deterministically. (Requires orderable payload types — no maps.)
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ rightCols.map(c => col(s"__c.$c").as(c))): _*)
  }
}
