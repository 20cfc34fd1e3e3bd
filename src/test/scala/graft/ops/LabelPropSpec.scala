package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  // two triangles joined by one bridge edge: LPA should keep the two
  // triangles as separate communities (the bridge is outvoted)
  private def twoTriangles = PageRank.symmetrize(
    Seq(("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x"))
      .toDF("src", "dst")
  )

  test("two bridged triangles resolve to two communities (bridge outvoted)") {
    val labels = LabelProp.run(twoTriangles, iters = 3).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels.keySet === Set("a", "b", "c", "x", "y", "z"))
    assert(Set(labels("a"), labels("b"), labels("c")).size === 1)
    assert(Set(labels("x"), labels("y"), labels("z")).size === 1)
    assert(labels("a") !== labels("x"))
  }

  test("one synchronous round equals the hand-computed min-tie argmax") {
    // star: center c with leaves l1 l2 l3. Round 1: c's neighbors are
    // l1,l2,l3 (all count 1, tie -> min label l1); each leaf sees only c.
    val star = PageRank.symmetrize(
      Seq(("c", "l1"), ("c", "l2"), ("c", "l3")).toDF("src", "dst"))
    val labels = LabelProp.run(star, iters = 1).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels("c") === "l1")
    assert(labels("l1") === "c" && labels("l2") === "c" && labels("l3") === "c")
  }

  test("inCoverTotal fast path is byte-identical to the join-back path on symmetrized input") {
    // the q155 contract: on symmetrized edges every node appears as a
    // dst, so the dst-keyed update covers the node universe and the
    // join-back's coalesce branch never fires
    val general = LabelProp.run(twoTriangles, iters = 3).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val fast = LabelProp.run(twoTriangles, iters = 3, inCoverTotal = true).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(fast === general)
  }

  test("directed input: source-only nodes keep their labels, none dropped") {
    // s -> a -> b, plus a 2-cycle c <-> d. Node s has NO in-edges: the
    // dst-keyed update has no row for it, so a dst-keyed output would
    // silently drop it — the contract is it keeps its own label.
    val directed = Seq(("s", "a"), ("a", "b"), ("c", "d"), ("d", "c")).toDF("src", "dst")
    val labels = LabelProp.run(directed, iters = 3).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels.keySet === Set("s", "a", "b", "c", "d"), "no node loss on directed input")
    assert(labels("s") === "s") // no in-neighbor votes ever arrive
    // c<->d: round 1 swaps votes, min-tie resolution keeps both in {c,d}
    assert(Set("c", "d").contains(labels("c")) && Set("c", "d").contains(labels("d")))
  }

  test("labels never leave a connected component; output is partitioning-invariant") {
    val got = LabelProp.run(twoTriangles, 2).collect().toSet
    val rep = LabelProp.run(twoTriangles.repartition(7), 2).collect().toSet
    assert(got === rep)
    val left = Set("a", "b", "c", "x", "y", "z") // one component incl. bridge
    got.foreach { r => assert(left.contains(r.getString(1))) }
    // a graph with two true components never mixes labels across them
    val twoComp = PageRank.symmetrize(Seq(("a", "b"), ("x", "y")).toDF("src", "dst"))
    val l2 = LabelProp.run(twoComp, 3).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Set("a", "b").contains(l2("a")) && Set("a", "b").contains(l2("b")))
    assert(Set("x", "y").contains(l2("x")) && Set("x", "y").contains(l2("y")))
  }
}
