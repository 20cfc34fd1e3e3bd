package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Borůvka MSF on hand-checkable weighted graphs: a triangle (max edge
  * excluded), two components (forest, not tree), a path (everything
  * kept), duplicate weights resolved by the (w, src, dst) total order,
  * and the |E| = |V| − |components| law.
  */
class BoruvkaSpec extends SparkSpec {
  import spark.implicits._

  private def msf(edges: Seq[(Long, Long, Long)], rounds: Int = 4): Set[(Long, Long, Long)] =
    Boruvka
      .forest(edges.toDF("src", "dst", "w"), rounds)
      .as[(Long, Long, Long)]
      .collect()
      .toSet

  test("triangle drops exactly the heaviest edge") {
    val f = msf(Seq((1L, 2L, 10L), (2L, 3L, 20L), (1L, 3L, 30L)))
    assert(f === Set((1L, 2L, 10L), (2L, 3L, 20L)), s"got $f")
  }

  test("two components yield a forest: |E| = |V| - |components|") {
    val f = msf(
      Seq(
        (1L, 2L, 5L), (2L, 3L, 7L), (1L, 3L, 9L), // comp {1,2,3}
        (10L, 11L, 1L), (11L, 12L, 2L), (10L, 12L, 3L))) // comp {10,11,12}
    assert(f.size === 4, s"got $f")
    assert(f === Set((1L, 2L, 5L), (2L, 3L, 7L), (10L, 11L, 1L), (11L, 12L, 2L)))
  }

  test("a path keeps every edge") {
    val edges = Seq((1L, 2L, 9L), (2L, 3L, 1L), (3L, 4L, 5L))
    assert(msf(edges) === edges.toSet)
  }

  test("duplicate weights: the (w, src, dst) total order picks deterministically") {
    // square 1-2-4-3-1, all weights equal: lexicographic Kruskal keeps
    // (1,2), (1,3), (2,4) and drops (3,4)
    val f = msf(Seq((1L, 2L, 7L), (1L, 3L, 7L), (2L, 4L, 7L), (3L, 4L, 7L)))
    assert(f === Set((1L, 2L, 7L), (1L, 3L, 7L), (2L, 4L, 7L)), s"got $f")
  }

  test("extra rounds after convergence are no-ops") {
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 4L))
    assert(msf(edges, rounds = 6) === edges.toSet)
  }

  test("forestWithLabels: labels are the min-id connected components of the input") {
    // two components incl. a 5-chain (hook chains exercise the pointer
    // jumping past one round) and a mutual pair
    val edges = Seq(
      (5L, 4L, 1L), (4L, 3L, 2L), (3L, 2L, 3L), (2L, 1L, 4L), // chain 1..5
      (20L, 21L, 9L)
    ).toDF("src", "dst", "w")
    val (_, lab) = Boruvka.forestWithLabels(edges, rounds = 4)
    val got = lab.as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      20L -> 20L, 21L -> 20L), s"got $got")
  }
}
