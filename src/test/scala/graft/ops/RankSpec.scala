package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankSpec extends SparkSpec {
  import spark.implicits._

  // three groups with different sizes, duplicate values, and one
  // all-equal group (zero value span)
  private def data = (
    (1L to 400L).map(i => ("a", i, (i * 37 % 19).toDouble)) ++
      (1L to 157L).map(i => ("b", i, (i % 5).toDouble)) ++
      (1L to 23L).map(i => ("c", i, 7.0))
  ).toDF("grp", "id", "v")

  private def want = data.withColumn(
    "rank",
    row_number().over(Window.partitionBy($"grp").orderBy($"v".asc, $"id".asc)).cast("long")
  )

  test("two-pass rank equals the single-window definition (dups, zero-span group)") {
    val got = Rank.rankWithin(data, Seq("grp"), $"v", $"id", "rank", bins = 16)
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }

  test("rank is invariant to the bin knob and to input partitioning") {
    val base = Rank.rankWithin(data, Seq("grp"), $"v", $"id", "rank", bins = 64)
      .collect().map(_.toSeq).toSet
    val b1 = Rank.rankWithin(data, Seq("grp"), $"v", $"id", "rank", bins = 1)
      .collect().map(_.toSeq).toSet
    val p7 = Rank.rankWithin(data.repartition(7), Seq("grp"), $"v", $"id", "rank", bins = 5)
      .collect().map(_.toSeq).toSet
    assert(b1 === base)
    assert(p7 === base)
  }
}
