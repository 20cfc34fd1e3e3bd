package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Scale techniques: salted skew join correctness, bucketed co-located
  * join (no shuffle in the plan), HLL sketch accuracy.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed fact") {
    // 90% of fact rows hit one hot key
    val fact = (1 to 2000).map { i =>
      val k = if (i % 10 == 0) (i % 7).toLong else 1L
      (i.toLong, k, i * 1.5)
    }.toDF("row_id", "key", "v")
    val dim = (0L to 7L).map(k => (k, s"dim_$k")).toDF("key", "label")

    val plain = fact.join(dim, "key").select("row_id", "key", "v", "label")
    val salted = Skew.saltedJoin(fact, dim, "key").select("row_id", "key", "v", "label")
    val a = plain.collect().map(_.toSeq).sortBy(_.toString)
    val b = salted.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
    assert(salted.count() == 2000)
  }

  test("bucketed tables join without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables
        .orders(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_b")
      Tables
        .customer(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_b")
      val joined = spark
        .table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // both sides are pre-bucketed on the key: the sort-merge join reads
      // them co-located, no Exchange anywhere in the plan
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the final plan)") {
    // one key carries ~95% of the fact — the runtime complement to the
    // static Skew.saltedJoin: AQE detects the oversized shuffle
    // partition and splits it across tasks with no query rewrite
    val conf = spark.conf
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val fact = (1 to 200000)
        .map(i => (if (i % 20 == 0) (i % 7).toLong + 2L else 1L, s"payload_$i"))
        .toDF("key", "payload")
      val dim = (0L to 9L).map(k => (k, s"dim_$k")).toDF("key", "label")
      val joined = fact.join(dim.hint("merge"), "key")
      // execute THIS frame (count() would plan a different query and
      // leave joined's adaptive plan unfinalized)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), s"AQE did not mark the skew join:\n${finalPlan.take(800)}")
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("approx_count_distinct (HLL) within 5% of exact") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val (approx, exact) = li
      .agg(
        approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e")
      )
      .as[(Long, Long)]
      .head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.05, s"approx=$approx exact=$exact relErr=$relErr")
  }
}
