package graft.expr

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** HLL sketch: accuracy vs exact distinct, merge across partitions,
  * grouped usage through the SQL registration.
  */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("hll_distinct within 3% of exact on 60k rows (merges across 4 partitions)") {
    Tables.lineitem(spark, "/root/testdata/sf0.01").createOrReplaceTempView("li")
    val (approx, exact) = spark
      .sql("SELECT hll_distinct(l_partkey), COUNT(DISTINCT l_partkey) FROM li")
      .as[(Long, Long)]
      .head()
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.03, s"approx=$approx exact=$exact err=$err")
  }

  test("grouped hll_distinct tracks per-group exact counts") {
    Tables.lineitem(spark, "/root/testdata/sf0.01").createOrReplaceTempView("li2")
    val rows = spark
      .sql("""SELECT l_returnflag, hll_distinct(l_partkey) AS a,
             |       COUNT(DISTINCT l_partkey) AS e
             |FROM li2 GROUP BY l_returnflag""".stripMargin)
      .as[(String, Long, Long)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, a, e) =>
      val err = math.abs(a - e).toDouble / e
      assert(err < 0.05, s"group $flag: approx=$a exact=$e err=$err")
    }
  }

  test("hll_registers: union registers = element-wise max (merge law, q263)") {
    Tables.events(spark, "/root/testdata/sf0.001").createOrReplaceTempView("ev")
    val row = spark
      .sql("""WITH a AS (SELECT hll_registers(user_id) r FROM ev WHERE event_type = 'click'),
             |     b AS (SELECT hll_registers(user_id) r FROM ev WHERE event_type = 'view'),
             |     u AS (SELECT hll_registers(user_id) r FROM ev
             |           WHERE event_type IN ('click', 'view'))
             |SELECT size(a.r) AS m,
             |       zip_with(a.r, b.r, (x, y) -> greatest(x, y)) = u.r AS law_ok
             |FROM a, b, u""".stripMargin)
      .as[(Int, Boolean)]
      .head()
    assert(row._1 == 4096, s"register array size ${row._1}, expected 2^12")
    assert(row._2, "union registers != element-wise max of per-set registers")
  }

  test("hll_registers is consistent with hll_distinct's sketch state") {
    // Same hash + update: with ~2k distinct partkeys over 4096 buckets
    // the expected touched-register count is 4096·(1−e^(−2000/4096)) ≈
    // 1580; an all-zero (empty) or near-empty array would betray a
    // buffer-sharing bug between HllRegisters and HllSketch.
    Tables.lineitem(spark, "/root/testdata/sf0.01").createOrReplaceTempView("li3")
    val (nonzero, mx) = spark
      .sql("""SELECT size(filter(r, x -> x > 0)), array_max(r)
             |FROM (SELECT hll_registers(l_partkey) r FROM li3)""".stripMargin)
      .as[(Int, Int)]
      .head()
    assert(nonzero > 1200 && nonzero < 2200,
      s"$nonzero of 4096 registers touched, outside the ~1580 Poisson band")
    assert(mx > 0 && mx < 64, s"register max $mx out of sane rho range")
  }

  test("small cardinalities are near-exact (linear counting range)") {
    val (a, e) = Seq.tabulate(500)(i => i % 37)
      .toDF("x")
      .repartition(4)
      .createOrReplaceTempView("small") match {
      case _ =>
        spark.sql("SELECT hll_distinct(x), COUNT(DISTINCT x) FROM small").as[(Long, Long)].head()
    }
    assert(a == e, s"approx=$a exact=$e") // 37 distinct at p=12 → exact
  }
}
