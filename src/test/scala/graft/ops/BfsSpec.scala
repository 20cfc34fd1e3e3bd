package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BfsSpec extends SparkSpec {
  import spark.implicits._

  // path 1-2-3-4-5 plus a 2-cycle 10<->11, directed edges as listed
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (11L, 10L)
  ).toDF("src", "dst")

  private def run(seedIds: Seq[Long], depth: Int) =
    Bfs
      .layers(edges, seedIds.toDF("node"), depth)
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap

  test("single-source distances on a directed path, unreachable absent") {
    val d = run(Seq(1L), 10)
    assert(d === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    // 10/11 unreachable from 1 — absent, not dist -1 (caller's join)
  }

  test("multi-source: first reach wins; depth cutoff truncates") {
    val d = run(Seq(1L, 4L), 10)
    // node 5 is 1 hop from seed 4, not 4 hops from seed 1
    assert(d(5L) === 1 && d(4L) === 0 && d(3L) === 2)
    val shallow = run(Seq(1L), 2)
    assert(shallow === Map(1L -> 0, 2L -> 1, 3L -> 2)) // 4,5 beyond depth
  }

  test("layersBySeed keeps per-seed distances the merged wave collapses") {
    val bySeed = Bfs
      .layersBySeed(edges, Seq(1L, 3L).toDF("seed"), 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    // seed 1 reaches 5 at dist 4; seed 3 reaches it at dist 2 — both
    // distances survive (layers() would report only min(4, 2))
    assert(bySeed((1L, 5L)) === 4 && bySeed((3L, 5L)) === 2)
    assert(bySeed((1L, 3L)) === 2 && bySeed((3L, 3L)) === 0)
    // per-seed eccentricity/reach fold
    val byS = bySeed.toSeq.groupBy(_._1._1)
    assert(byS(1L).map(_._2).max === 4 && byS(1L).size === 5)
    assert(byS(3L).map(_._2).max === 2 && byS(3L).size === 3)
    // merged wave agrees with the per-seed MINIMUM
    val merged = Bfs.layers(edges, Seq(1L, 3L).toDF("node"), 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    merged.foreach { case (n, d) =>
      assert(d === byS.values.flatten.collect { case ((_, nn), dd) if nn == n => dd }.min)
    }
  }

  test("cycle terminates via the visited anti-join; partitioning-invariant") {
    val d = run(Seq(10L), 10)
    assert(d === Map(10L -> 0, 11L -> 1))
    val rep = Bfs
      .layers(edges.repartition(7), Seq(1L, 10L).toDF("node"), 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rep === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 10L -> 0, 11L -> 1))
  }
}
