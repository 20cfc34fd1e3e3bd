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
