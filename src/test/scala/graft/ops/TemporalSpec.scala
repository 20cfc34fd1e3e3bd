package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Earliest-arrival temporal reachability on hand-checkable graphs:
  * the strictly-increasing-time constraint prunes statically-reachable
  * nodes, earliest (not any) arrival is kept, and seeds stay at −1.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def arrivals(
      edges: Seq[(Long, Long, Long)],
      sources: Seq[Long],
      rounds: Int = 8): Map[Long, Long] =
    Temporal
      .earliestArrival(
        edges.toDF("src", "dst", "t"),
        sources.toDF("node"),
        rounds)
      .as[(Long, Long)]
      .collect()
      .toMap

  test("time-decreasing path is NOT reachable; increasing one is") {
    // 1 -(5)-> 2 -(3)-> 3 : blocked at 2 (3 < 5); 1 -(5)-> 2 -(7)-> 4 : ok
    val a = arrivals(Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 4L, 7L)), Seq(1L))
    assert(a === Map(1L -> -1L, 2L -> 5L, 4L -> 7L), s"got $a")
  }

  test("earliest arrival wins and unlocks more edges") {
    // two routes to 2: t=9 direct, t=1 via 5; only the early one can take
    // the t=4 edge onward
    val a = arrivals(
      Seq((1L, 2L, 9L), (1L, 5L, 1L), (5L, 2L, 2L), (2L, 3L, 4L)),
      Seq(1L))
    assert(a(2L) === 2L && a(3L) === 4L, s"got $a")
  }

  test("equal times do not chain (strict increase)") {
    val a = arrivals(Seq((1L, 2L, 5L), (2L, 3L, 5L)), Seq(1L))
    assert(a === Map(1L -> -1L, 2L -> 5L), s"got $a")
  }

  test("multiple sources fold by min; seed arrival stays -1") {
    val a = arrivals(Seq((1L, 3L, 6L), (2L, 3L, 4L)), Seq(1L, 2L))
    assert(a === Map(1L -> -1L, 2L -> -1L, 3L -> 4L), s"got $a")
  }
}
