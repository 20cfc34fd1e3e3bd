package graft.ops

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("symmetric two-node graph is a fixed point at 0.5/0.5") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = PageRank.run(edges, iters = 5, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r("a") - 0.5) < 1e-12)
    assert(math.abs(r("b") - 0.5) < 1e-12)
  }

  test("rank mass is conserved on a dangling-free graph") {
    val edges = PageRank.symmetrize(
      Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"))
        .toDF("src", "dst"))
    val total = PageRank.run(edges, iters = 4, damping = 0.85)
      .as[(String, Double)].collect().map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-9, s"total $total")
  }

  test("hub out-ranks leaves on an undirected star") {
    val leaves = (1 to 6).map(i => ("hub", s"leaf$i"))
    val edges = PageRank.symmetrize(leaves.toDF("src", "dst"))
    val r = PageRank.run(edges, iters = 6, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert((1 to 6).forall(i => r("hub") > r(s"leaf$i") * 2))
  }

  test("rank mass is conserved on a DIRECTED graph with sinks") {
    // b and d are pure sinks (dangling); a has no in-edges
    val edges = Seq(("a", "b"), ("a", "c"), ("c", "d")).toDF("src", "dst")
    val r = PageRank.run(edges, iters = 5, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(r.size == 4, s"all of src ∪ dst must hold rank: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"total ${r.values.sum}")
    // the in-degree-0 node keeps at least its teleport + dangling share
    assert(r("a") > 0.0)
  }

  test("matches a scalar reference on a directed graph with dangling nodes") {
    val rnd = new scala.util.Random(11)
    val raw = (1 to 30)
      .map(_ => (s"n${rnd.nextInt(8)}", s"n${8 + rnd.nextInt(4)}"))
      .distinct // dsts n8..n11 never appear as src → dangling
    val got = PageRank.run(raw.toDF("src", "dst"), iters = 3, damping = 0.85)
      .as[(String, Double)].collect().toMap
    val nodes = (raw.map(_._1) ++ raw.map(_._2)).distinct.sorted
    val n = nodes.size
    val out = raw.groupBy(_._1).view.mapValues(_.size).toMap
    val in = raw.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val dm = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { v =>
        v -> ((1.0 - 0.85) / n +
          0.85 * (in.getOrElse(v, Nil).map(u => r(u) / out(u)).sum + dm / n))
      }.toMap
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    nodes.foreach { v =>
      assert(math.abs(got(v) - r(v)) < 1e-9, s"node $v: ${got(v)} vs ${r(v)}")
    }
  }

  test("matches a scalar reference implementation on a random graph") {
    val rnd = new scala.util.Random(5)
    val raw = (1 to 40)
      .map(_ => (s"n${rnd.nextInt(10)}", s"n${rnd.nextInt(10)}"))
      .filter { case (a, b) => a != b }
      .distinct
    val both = (raw ++ raw.map(_.swap)).distinct
    val got = PageRank.run(both.toDF("src", "dst"), iters = 3, damping = 0.85)
      .as[(String, Double)].collect().toMap
    // scalar power iteration with the same recurrence
    val nodes = both.map(_._1).distinct.sorted
    val n = nodes.size
    val out = both.groupBy(_._1).view.mapValues(_.size).toMap
    val in = both.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      r = nodes.map { v =>
        v -> ((1.0 - 0.85) / n + 0.85 * in(v).map(u => r(u) / out(u)).sum)
      }.toMap
    }
    nodes.foreach { v =>
      assert(math.abs(got(v) - r(v)) < 1e-9, s"node $v: ${got(v)} vs ${r(v)}")
    }
  }
}
