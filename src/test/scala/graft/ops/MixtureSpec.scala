package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ops/Mixture: the waterfill closed form against its defining
  * properties (exact budget use, cap respect, max-uniformity), and the
  * temperature plan's determinism + membership law.
  */
class MixtureSpec extends SparkSpec {

  private val capSets: Seq[Seq[(String, Long)]] = Seq(
    Seq("a" -> 100L, "b" -> 100L, "c" -> 100L),
    Seq("a" -> 10L, "b" -> 1000L, "c" -> 1000L),
    Seq("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 1000L),
    Seq("solo" -> 50L),
    Seq("a" -> 7L, "b" -> 7L, "c" -> 7L, "d" -> 7L, "e" -> 7L)
  )

  test("waterfill: exact budget use, caps respected, max-uniform remainder") {
    for (caps <- capSets; num <- Seq(1L, 3L, 9L); den <- Seq(10L)) {
      val budget = caps.map(_._2).sum * num / den
      val out = Mixture.waterfill(caps, budget)
      val byName = out.map(r => r._1 -> r).toMap
      assert(out.map(_._3).sum == budget, s"budget exactly spent for $caps @ $budget")
      for ((src, cap) <- caps) {
        val (_, c, alloc, sat) = byName(src)
        assert(c == cap && alloc <= cap, s"$src alloc $alloc <= cap $cap")
        assert(sat == (alloc == cap) || !sat, "saturated rows sit at their cap")
        if (sat) assert(alloc == cap)
      }
      // uniformity: all unsaturated allocations within 1 of each other,
      // and every saturated cap is <= every unsaturated allocation
      val unsat = out.filter(!_._4).map(_._3)
      if (unsat.nonEmpty) {
        assert(unsat.max - unsat.min <= 1, s"unsaturated spread <=1 for $caps @ $budget")
        val satCaps = out.filter(_._4).map(_._2)
        if (satCaps.nonEmpty) assert(satCaps.max <= unsat.max)
      }
    }
  }

  test("waterfill: budget == sum(caps) saturates everyone") {
    val caps = Seq("a" -> 5L, "b" -> 9L)
    val out = Mixture.waterfill(caps, 14L)
    assert(out.forall(r => r._3 == r._2 && r._4))
  }

  test("temperaturePlan: targets from sqrt weights; membership is the smallest hashes") {
    import spark.implicits._
    val docs = (1L to 300L)
      .map(i => (i, s"s${(i % 3) + 1}"))
      .toDF("doc_id", "source")
    val (plan, sampled) = Mixture.temperaturePlan(docs, "doc_id", "source")
    val planRows = plan.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(planRows.map(_._2).sum == 300L)
    // equal sources => equal probabilities and targets
    assert(planRows.map(_._3).distinct.size == 1 && planRows.map(_._4).distinct.size == 1)
    // each p_ppm ~ 1/3
    assert(planRows.forall(r => math.abs(r._3 - 333333L) <= 1))
    val got = sampled.select("source", "doc_id").as[(String, Long)].collect().toSet
    // brute-force membership: per source, target_n smallest (hash, id)
    val targets = planRows.map(r => r._1 -> r._4).toMap
    val expected = (1L to 300L)
      .map(i => (s"s${(i % 3) + 1}", i))
      .groupBy(_._1)
      .toSeq // Map.flatMap over pairs would re-key and collapse per source
      .flatMap { case (src, rows) =>
        rows
          .sortBy { case (_, id) => (((id * 2654435761L) % 1000003L + 1000003L) % 1000003L, id) }
          .take(targets(src).toInt)
      }
      .toSet
    assert(got == expected)
    // deterministic across invocations
    val (_, sampled2) = Mixture.temperaturePlan(docs, "doc_id", "source")
    assert(sampled2.select("source", "doc_id").as[(String, Long)].collect().toSet == got)
  }

  test("tokenBudgetPlan: allocations sum to the 90% budget and never exceed a source's own size") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w w w w w", "a"),
      (2L, "w w w", "a"),
      (3L, "w w w w w w w w w w w w", "b"),
      (4L, "w", "c")
    ).toDF("doc_id", "text", "source")
    val out = Mixture.tokenBudgetPlan(docs, "text", "source").collect()
    val total = Seq(8L, 12L, 1L).sum
    val budget = total * 9L / 10L
    assert(out.map(_.getLong(3)).sum == budget)
    assert(out.forall(r => r.getLong(3) <= r.getLong(1)))
    val byName = out.map(r => r.getString(0) -> r).toMap
    // source c (1 token) saturates under a budget of 18 across caps 8/12/1
    assert(byName("c").getBoolean(4) && byName("c").getLong(3) == 1L)
    assert(byName("c").getLong(5) == 1000000L) // exactly one epoch
  }
}
