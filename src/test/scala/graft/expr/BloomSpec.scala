package graft.expr

import graft.{SparkSpec, Tables}
import graft.ops.BloomJoin
import org.apache.spark.sql.functions._

/** Bloom filter build/probe: no false negatives, bounded false-positive
  * rate at the documented sizing, SQL registration, join row-identity,
  * map-side prefilter effectiveness.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; fpr under 3% at m≈13n sizing") {
    val n = 10000
    val present = (0 until n).map(i => i.toLong * 2) // evens inserted
    val bfRow = present.toDF("k").agg(BloomJoin.bloomAgg(col("k"), log2bits = 17).as("bf"))
    // probe evens (must all hit) and odds (absent; hits are false positives)
    val probes = (0 until 2 * n).map(_.toLong).toDF("k")
    val out = probes
      .crossJoin(broadcast(bfRow))
      .select(col("k"), BloomJoin.mightContain(col("bf"), col("k")).as("hit"))
      .as[(Long, Boolean)]
      .collect()
    val (evens, odds) = out.partition(_._1 % 2 == 0)
    assert(evens.forall(_._2), "false negative: an inserted key probed absent")
    val fpr = odds.count(_._2).toDouble / odds.length
    assert(fpr < 0.03, s"false-positive rate $fpr out of bound")
  }

  test("bloom_agg / might_contain are registered for SQL via GraftExtensions") {
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("bloom_keys")
    val r = spark
      .sql("""WITH bf AS (SELECT bloom_agg(k) AS b FROM bloom_keys)
             |SELECT might_contain(b, 2L) AS yes, might_contain(b, 99L) AS no FROM bf""".stripMargin)
      .as[(Boolean, Boolean)]
      .collect()
      .head
    assert(r._1)
    assert(!r._2) // 1 absent key in a 2^20-bit filter: fp essentially impossible
  }

  test("BloomJoin.join is row-identical to the plain join on real tables") {
    val dir = "/root/testdata/sf0.001"
    val facts = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey", "l_quantity")
    val dims = Tables.part(spark, dir).filter(col("p_size") === 1)
      .select("p_partkey", "p_brand")
    val viaBloom = BloomJoin
      .join(facts, dims, "l_partkey", "p_partkey", log2bits = 16)
      .select("l_orderkey", "l_partkey", "p_brand")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val plain = facts
      .join(dims, facts("l_partkey") === dims("p_partkey"))
      .select("l_orderkey", "l_partkey", "p_brand")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(viaBloom == plain)
    assert(plain.nonEmpty)
  }

  test("prefilter drops ~(1 - selectivity) of probe rows before the exact join") {
    val dir = "/root/testdata/sf0.001"
    val facts = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    val dims = Tables.part(spark, dir).filter(col("p_size") === 1).select("p_partkey")
    val total = facts.count().toDouble
    val kept = BloomJoin.prefilter(facts, dims, "l_partkey", "p_partkey", log2bits = 16).count().toDouble
    val matchRows = facts.join(dims, facts("l_partkey") === dims("p_partkey")).count().toDouble
    // kept must cover every matching row and be close to the true match
    // count (false positives only inflate it by the fp rate)
    assert(kept >= matchRows)
    assert(kept <= matchRows + 0.03 * total, s"prefilter too leaky: kept=$kept match=$matchRows total=$total")
    assert(kept < total * 0.5, "prefilter dropped nothing — filter is not selective")
  }

  test("BloomJoin.antiJoin is row-identical to the plain anti join; bypass skips most rows") {
    val left = (0L until 2000L).toDF("k")
    val right = (0L until 2000L).filter(_ % 50 == 0).toDF("rk") // 2% match rate
    val got = BloomJoin
      .antiJoin(left, right, "k", "rk", log2bits = 16)
      .as[Long]
      .collect()
      .sorted
      .toSeq
    val want = left
      .join(right, left("k") === right("rk"), "left_anti")
      .as[Long]
      .collect()
      .sorted
      .toSeq
    assert(got == want)
    // the bypass really fires: definitely-absent keys never reach the
    // exact anti join (fpr at m≈13n keeps "maybe" near the match rate)
    val bf = right.agg(BloomJoin.bloomAgg(col("rk"), 16).as("bf")).collect()(0).getAs[Array[Byte]](0)
    val maybe = left.filter(BloomJoin.mightContain(lit(bf), col("k"))).count()
    assert(maybe < 200, s"expected ~2% + fpr of 2000 rows in the maybe set, got $maybe")
  }

  test("antiJoin keeps null-key left rows, exactly like a plain anti join") {
    // null never equals anything, so left_anti KEEPS null-key rows; the
    // bloom probe returns NULL for them and a naive NOT-filter would
    // silently drop them (regression for the null-propagation bug)
    val left = Seq(Some(1L), Some(2L), None, None).toDF("k")
    val right = Seq(1L).toDF("rk")
    val got = BloomJoin.antiJoin(left, right, "k", "rk", log2bits = 10)
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq
    val want = left.join(right, left("k") === right("rk"), "left_anti")
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq
    assert(got == want && got == Seq(-1L, -1L, 2L))
  }

  test("two might_contain probes in one projection compile under CODEGEN_ONLY") {
    val conf = spark.conf
    val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val bf = Seq(5L).toDF("k").agg(BloomJoin.bloomAgg(col("k")).as("bf"))
      val r = Seq((5L, 6L)).toDF("a", "b")
        .crossJoin(broadcast(bf))
        .select(
          BloomJoin.mightContain(col("bf"), col("a")).as("h1"),
          BloomJoin.mightContain(col("bf"), col("b")).as("h2")
        )
        .as[(Boolean, Boolean)]
        .collect()
        .head
      assert(r._1 && !r._2)
    } finally {
      conf.set("spark.sql.codegen.fallback", prevFallback)
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }
}
