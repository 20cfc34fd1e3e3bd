package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MatchingSpec extends SparkSpec {
  import spark.implicits._

  private def weighted(edges: Seq[(Long, Long)]) =
    edges.toDF("u", "v").withColumn("w", lit(1L) + ($"u" + $"v") % 7)

  private def props(edges: Seq[(Long, Long)], rounds: Int = 6): Unit = {
    val (m, rem) = Matching.greedyRounds(weighted(edges), rounds)
    val pairs = m.as[(Long, Long)].collect().toSeq
    // validity: no endpoint appears twice
    val ends = pairs.flatMap(p => Seq(p._1, p._2))
    assert(ends.distinct.size === ends.size, s"shared endpoint in $pairs")
    // maximality: remainder empty ⇒ every remaining edge touches a match
    assert(rem.count() === 0, "not maximal within round budget")
    val matchedNodes = ends.toSet
    edges.foreach { case (u, v) =>
      assert(matchedNodes.contains(u) || matchedNodes.contains(v),
        s"edge ($u,$v) has both endpoints unmatched")
    }
  }

  test("path, star, triangle, and two components are validly and maximally matched") {
    props(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))) // path
    props(Seq((10L, 11L), (10L, 12L), (10L, 13L))) // star: one edge max
    props(Seq((1L, 2L), (2L, 3L), (1L, 3L))) // triangle
    props(Seq((1L, 2L), (5L, 6L), (6L, 7L))) // two components
  }

  test("deterministic under input partitioning") {
    val edges = (1L to 40L).flatMap(i => Seq((i, i + 1), (i, i + 3))).filter(_._2 <= 40L)
    val (m1, _) = Matching.greedyRounds(weighted(edges), 8)
    val (m2, _) = Matching.greedyRounds(weighted(edges).repartition(13), 8)
    assert(m1.as[(Long, Long)].collect().toSet === m2.as[(Long, Long)].collect().toSet)
  }

  test("local-minima rounds never pick adjacent edges in one round") {
    // star with distinct weights: only the minimum edge can be double-
    // nominated; one round picks exactly one edge
    val star = Seq((100L, 101L), (100L, 102L), (100L, 103L), (100L, 104L))
    val (m, _) = Matching.greedyRounds(weighted(star), 1)
    assert(m.count() === 1)
  }
}
