package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adversarial rungs for the two-pass distributed rank.
  *
  * The operator's scaladoc makes a skew claim — "many identical values
  * degrade at worst to the ties sharing one bin, which is where the
  * plain window puts them anyway" — that round 7 shipped as prose.
  * This spec turns it into a measurement (the SparseCandidateSpec
  * discipline): the degenerate all-equal group must (a) still equal
  * the single-window definition and (b) land its ties in exactly one
  * bin while a same-size spread group splits near-evenly, so the worst
  * task the two-pass ever schedules is the task the plain window
  * schedules for EVERY group. Plus the null corners fixed in round 8:
  * null order values rank first (the plain asc window's default) and
  * null group keys form a ranked group instead of vanishing through an
  * equality join.
  */
class RankSkewSpec extends SparkSpec {
  import spark.implicits._

  private val bins = 64

  test("all-equal group: equality holds AND ties share one bin while a spread group splits") {
    val n = 20000L
    val df = ((1L to n).map(i => ("skew", i, 42.0)) ++
      (1L to n).map(i => ("spread", i, i.toDouble))).toDF("grp", "id", "v")
    val got = Rank.rankWithin(df, Seq("grp"), $"v", $"id", "rank", bins)
    val want = df.withColumn(
      "rank",
      row_number().over(Window.partitionBy($"grp").orderBy($"v".asc, $"id".asc)).cast("long")
    )
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)

    // task-shape curve, measured on the operator's own binning rule
    // (deterministic: bin = min(bins-1, floor((v-lo)/(hi-lo+1e-12)*bins))):
    // per-(group, bin) load is what the local window stage partitions by
    val spans = df.groupBy($"grp").agg(min($"v").as("lo"), max($"v").as("hi"))
    val load = df
      .join(broadcast(spans), "grp")
      .withColumn(
        "bin",
        when($"v".isNull, lit(-1L))
          .otherwise(
            least(
              lit(bins - 1),
              floor(($"v" - $"lo") / (($"hi" - $"lo") + lit(1e-12)) * bins)
            ).cast("long")
          )
      )
      .groupBy($"grp", $"bin")
      .count()
      .collect()
      .groupBy(_.getAs[String]("grp"))
    // skew: one bin carries all n ties — exactly the plain window's task
    val skewLoads = load("skew").map(_.getAs[Long]("count"))
    assert(skewLoads.length === 1 && skewLoads.head === n,
      s"skew group split unexpectedly: ${skewLoads.toSeq}")
    // spread: largest bin ≤ 2× the even share — the window task shrinks
    // by ~bins, which is the whole point of the two-pass
    val spreadMax = load("spread").map(_.getAs[Long]("count")).max
    assert(spreadMax <= 2 * n / bins,
      s"spread group's largest bin $spreadMax exceeds 2x even share ${2 * n / bins}")
  }

  test("null order values rank FIRST, matching the plain asc window") {
    val df = (1L to 200L)
      .map(i => ("g", i, if (i % 7 == 0) null.asInstanceOf[java.lang.Double] else java.lang.Double.valueOf(i.toDouble)))
      .toDF("grp", "id", "v")
    val got = Rank.rankWithin(df, Seq("grp"), $"v", $"id", "rank", bins)
    val want = df.withColumn(
      "rank",
      row_number().over(Window.partitionBy($"grp").orderBy($"v".asc, $"id".asc)).cast("long")
    )
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }

  test("rows with null group keys form their own ranked group instead of vanishing") {
    val df = Seq(
      (Option("a"), 1L, 3.0),
      (Option("a"), 2L, 1.0),
      (Option.empty[String], 3L, 5.0),
      (Option.empty[String], 4L, 2.0)
    ).toDF("grp", "id", "v")
    val got = Rank.rankWithin(df, Seq("grp"), $"v", $"id", "rank", bins)
    assert(got.count() === 4L, "null-group rows were dropped")
    val want = df.withColumn(
      "rank",
      row_number().over(Window.partitionBy($"grp").orderBy($"v".asc, $"id".asc)).cast("long")
    )
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }

  test("all-null order group: every row lands in the null bin and ranks by tiebreaker") {
    val df = (1L to 50L)
      .map(i => ("g", i, null.asInstanceOf[java.lang.Double]))
      .toDF("grp", "id", "v")
    val got = Rank.rankWithin(df, Seq("grp"), $"v", $"id", "rank", bins)
      .select($"id", $"rank")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    (1L to 50L).foreach(i => assert(got(i) === i, s"id $i ranked ${got(i)}"))
  }
}
