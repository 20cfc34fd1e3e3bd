package graft.ops

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** Reference peeling on in-memory sets. */
  private def brute(edges: Set[(Long, Long)], k: Int): Set[(Long, Long)] = {
    var e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.filter(p => p._1 != p._2)
    var changed = true
    while (changed) {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val ne = e.filter(p => keep(p._1) && keep(p._2))
      changed = ne.size != e.size
      e = ne
    }
    e
  }

  test("matches brute-force peeling on a seeded random graph for k=2 and k=3") {
    val rnd = new scala.util.Random(5)
    val raw = (1 to 250).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).toSet
    val df = raw.toSeq.toDF("u", "v")
    for (k <- Seq(2, 3)) {
      val got = KCore.coreEdges(df, k).as[(Long, Long)].collect().toSet
      assert(got === brute(raw, k), s"k=$k")
    }
  }

  test("cascade: a path hanging off a triangle peels hop by hop, leaving the triangle as the 2-core") {
    // 1-2-3 triangle, then path 3-4-5-6: each peel round removes one
    // path node (6, then 5, then 4) — the cascade needs multiple rounds
    val df = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v")
    val got = KCore.coreEdges(df, 2).as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }

  test("K5 survives k=4 whole; k=5 empties it") {
    val df = (for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)).toDF("u", "v")
    assert(KCore.coreEdges(df, 4).count() === 10)
    assert(KCore.coreEdges(df, 5).count() === 0)
  }

  test("a cascade deeper than maxIter REFUSES instead of returning a partial peel") {
    // 12-node path, k=2: ends peel one hop per round (~5 rounds to
    // empty) — maxIter=2 cuts the cascade mid-flight. The contract
    // (Components discipline) is to throw, never to return edges whose
    // endpoints may still be under-degree.
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("u", "v")
    val ex = intercept[IllegalStateException] {
      KCore.coreEdges(path, 2, maxIter = 2)
    }
    assert(ex.getMessage.contains("fixpoint"))
    // and with enough rounds the same graph resolves cleanly (to empty)
    assert(KCore.coreEdges(path, 2).count() === 0)
  }
}
