package graft.ops

import graft.SparkSpec

/** Connected components: multi-hop closure, component separation,
  * clique + chain topologies.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chain needs multi-hop propagation; separate components stay separate") {
    // chain 1-2-3-4-5 (diameter 4) + triangle 10-11-12 + pair 20-21
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val got = Components
      .connectedComponents(edges)
      .as[(Long, Long)]
      .collect()
      .toMap
    assert((1L to 5L).forall(got(_) == 1L), s"chain not closed: $got")
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
    assert(Seq(20L, 21L).forall(got(_) == 20L))
    assert(got.size == 10)
  }

  test("refuses to return split components when maxIter is too small for the diameter") {
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b") // diameter 9
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(chain, maxIter = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("largeStarSmallStar keeps self-loop-only nodes as singletons (parity with min-label)") {
    val edges = Seq((5L, 5L), (1L, 2L)).toDF("id_a", "id_b")
    val simple = Components.connectedComponents(edges).as[(Long, Long)].collect().toMap
    val lsss = Components.largeStarSmallStar(edges).as[(Long, Long)].collect().toMap
    assert(simple == Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
    assert(lsss == simple, s"self-loop node lost: $lsss")
  }

  test("largeStarSmallStar agrees with min-label CC on random graphs (5 seeds)") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter { case (a, b) => a != b }
        .toDF("id_a", "id_b")
      val simple = Components.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      val lsss = Components.largeStarSmallStar(edges)
        .as[(Long, Long)].collect().toMap
      assert(lsss == simple, s"seed $seed: ${lsss.size} vs ${simple.size} labels")
    }
  }

  test("largeStarSmallStar closes a 120-hop chain in O(log n) rounds (min-label cannot)") {
    val chain = (1L until 120L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Components.connectedComponents(chain, maxIter = 15).collect() // diameter 119 >> 15
    }
    val comps = Components.largeStarSmallStar(chain, maxIter = 15)
      .as[(Long, Long)].collect().toMap
    assert(comps.size == 120 && comps.values.forall(_ == 1L), "chain not fully contracted")
  }

  test("one-hop dedupAssignments under-merges a chain; connectedComponents closes it") {
    // two docs that are both near-dups of a middle doc but not of each
    // other can land in different one-hop reps; the closure must not.
    val edges = Seq((100L, 200L), (200L, 300L)).toDF("id_a", "id_b")
    val comps = Components.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(comps.values.toSet.size == 1, s"chain split into ${comps.values.toSet}")
  }

  test("incrementalUpdate equals full recompute: merge of two old components via a new bridge") {
    // old: {1,2,3} (label 1) and {10,11} (label 10); new edge 3-10
    // bridges them, plus a brand-new node 20 attaching to 11, plus an
    // untouched component {30,31} that must pass through verbatim
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (30L, 31L)).toDF("id_a", "id_b")
    val newEdges = Seq((3L, 10L), (11L, 20L)).toDF("id_a", "id_b")
    val oldLabels = Components.connectedComponents(oldEdges)
    val inc = Components
      .incrementalUpdate(oldLabels, newEdges)
      .as[(Long, Long)].collect().sorted.toSeq
    val full = Components
      .connectedComponents(oldEdges.unionByName(newEdges))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(inc == full, s"incremental $inc != full $full")
    assert(inc.contains((20L, 1L)), "new node must join the merged component")
    assert(inc.contains((31L, 30L)), "untouched component relabeled")
  }

  test("incrementalUpdate equals full recompute on random graphs (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val oldEdges = (0 until 60)
        .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
        .toDF("id_a", "id_b")
      val newEdges = (0 until 20)
        .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(e => e._1 != e._2)
        .toDF("id_a", "id_b")
      val inc = Components
        .incrementalUpdate(Components.connectedComponents(oldEdges), newEdges)
        .as[(Long, Long)].collect().sorted.toSeq
      val full = Components
        .connectedComponents(oldEdges.unionByName(newEdges))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(inc == full, s"seed $seed: incremental != full")
    }
  }
}
