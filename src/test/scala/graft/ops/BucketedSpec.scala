package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed tables: the write-once-shuffle-never layout. Asserts the
  * co-bucketed join plans ZERO exchanges and matches the plain join.
  */
class BucketedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Shuffle-exchange count in the (pre-execution) physical plan — the
    * plan string is inspected before collect so AQE hasn't folded the
    * exchanges into opaque query stages yet.
    */
  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString.linesIterator
      .count(_.contains("Exchange hashpartitioning"))

  test("co-bucketed fact/fact join runs with zero exchanges and matches the plain join") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    Bucketed.write(li, "li_bkt", "l_orderkey", 8)
    Bucketed.write(ord, "ord_bkt", "o_orderkey", 8)

    // force the shuffle-join regime (both inputs are tiny at sf0.001, so
    // without the hint Spark would broadcast and trivially skip exchanges)
    val l = Bucketed.read(spark, "li_bkt").hint("merge")
    val r = Bucketed.read(spark, "ord_bkt")
    val joined = l.join(r, l("l_orderkey") === r("o_orderkey"))
    assert(shuffleCount(joined) == 0, "co-bucketed join must plan no exchange")

    val plain = li.hint("merge").join(ord, li("l_orderkey") === ord("o_orderkey"))
    assert(shuffleCount(plain) > 0, "unbucketed shuffle join is the baseline")
    assert(joined.count() == plain.count())

    // decimal accumulation: double sums are reduction-order-dependent
    val a = joined
      .agg(sum(col("l_quantity").cast("decimal(38,6)")), sum(col("o_totalprice").cast("decimal(38,6)")))
      .head()
    val b = plain
      .agg(sum(col("l_quantity").cast("decimal(38,6)")), sum(col("o_totalprice").cast("decimal(38,6)")))
      .head()
    assert(a == b)
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    // self-sufficient: don't depend on the join test having run first
    Bucketed.write(
      Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity")),
      "li_bkt_agg",
      "l_orderkey",
      8
    )
    val agg = Bucketed
      .read(spark, "li_bkt_agg")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q"))
    assert(shuffleCount(agg) == 0, "bucketed groupBy on the bucket key must not shuffle")
    val plain = Tables
      .lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q"))
    assert(agg.count() == plain.count())
  }
}
