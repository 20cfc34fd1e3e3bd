package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // adversarial gaps around the band edge: 0 (ties), exactly d, d+1,
  // bucket-boundary straddles, multiple keys
  private def rows = Seq(
    ("a", 0L, 1L), ("a", 0L, 2L), ("a", 30L, 3L), ("a", 31L, 4L),
    ("a", 29L, 5L), ("a", 59L, 6L), ("a", 60L, 7L), ("a", 90L, 8L),
    ("b", 10L, 9L), ("b", 40L, 10L), ("b", 41L, 11L), ("c", 5L, 12L)
  ).toDF("key", "v", "tie")

  private def naive(d: Long) = {
    val l = rows.select($"key", $"v".as("l_v"), $"tie".as("l_tie"))
    val r = rows.select($"key".as("k2"), $"v".as("r_v"), $"tie".as("r_tie"))
    l.join(r, $"key" === $"k2" &&
        ($"r_v" - $"l_v").between(0, d) &&
        ($"l_v" < $"r_v" || ($"l_v" === $"r_v" && $"l_tie" < $"r_tie")))
      .select($"key", $"l_tie", $"r_tie", $"l_v", $"r_v", ($"r_v" - $"l_v").as("gap"))
  }

  test("banded form equals the naive theta join, each pair exactly once") {
    val got = RangeJoin.bandedSelfJoin(rows, "key", $"v", $"tie", 30L).collect()
    val want = naive(30L).collect()
    assert(got.toSet === want.toSet)
    assert(got.length === got.toSet.size) // exactly-once: no duplicate emissions
    assert(got.length === want.length)
    // edge semantics: gap 0 and gap d are in, d+1 is out
    val gaps = got.map(_.getAs[Long]("gap"))
    assert(gaps.contains(0L) && gaps.contains(30L) && !gaps.exists(_ > 30L))
  }

  test("plan is an equi-join — no nested-loop or cartesian operator") {
    val plan = RangeJoin
      .bandedSelfJoin(rows, "key", $"v", $"tie", 30L)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("partitioning-invariant") {
    val base = RangeJoin.bandedSelfJoin(rows, "key", $"v", $"tie", 30L).collect().toSet
    val rep = RangeJoin.bandedSelfJoin(rows.repartition(7), "key", $"v", $"tie", 30L).collect().toSet
    assert(base === rep)
  }
}
