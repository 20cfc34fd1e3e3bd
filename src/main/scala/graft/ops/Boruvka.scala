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
    // materialized ONCE: every round's cross join re-reads the edge set,
    // and an uncut input replays its whole upstream plan (parquet scan +
    // weight derivation in the q283 case) per round
    val e0 = Checkpoints.cut(edges.select(col("src"), col("dst"), col("w")))
    val nodes = e0
      .select(col("src").as("node"))
      .unionByName(e0.select(col("dst").as("node")))
      .distinct()

    var labels = Checkpoints.cut(nodes.withColumn("comp", col("node")))
    var forest = e0.limit(0)
    // each round's sel stays PERSISTED until the forest union is cut
    // once after the loop — the r10 form checkpointed the growing
    // forest per round (an eager job each time for a frame nothing
    // reads until the end); deferring pays ONE materialization total,
    // while the persisted sels keep the deferred union from replaying
    // any round's join+aggregate
    val sels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val cross = e0
        .join(labels.select(col("node").as("src"), col("comp").as("ca")), Seq("src"))
        .join(labels.select(col("node").as("dst"), col("comp").as("cb")), Seq("dst"))
        .where(col("ca") =!= col("cb"))
      // ONE pass over the cross join: explode emits the edge under both
      // endpoint components (the r10 union form evaluated the uncached
      // three-way join twice — once per branch). min carries (ca, cb)
      // along: they are a function of (src, dst), so the
      // (w, src, dst)-prefixed struct order picks the same edge.
      val sel = cross
        .select(
          struct(col("w"), col("src"), col("dst"), col("ca"), col("cb")).as("e"),
          explode(array(col("ca"), col("cb"))).as("comp"))
        .groupBy(col("comp"))
        .agg(min(col("e")).as("e"))
      sel.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // materialize the cache NOW (one scalar job): hookLabels reads
      // sel from two subtrees of one join — on an unmaterialized cache
      // both sides recompute the cross join + aggregate (measured 2.5×
      // on q283/q292 when the r10 forest checkpoint, which used to do
      // this materialization as a side effect, was deferred). The count
      // doubles as the EARLY EXIT: no cross edge left ⇒ the forest is
      // complete and the remaining rounds would be no-ops.
      val nCross = sel.count()
      if (nCross == 0) {
        sel.unpersist(blocking = false)
        exhausted = true
      } else {
        sels += sel
        // a cross edge chosen in round r merges its endpoints' components,
        // so it can never be cross again — the union needs no re-distinct
        forest = forest.unionByName(
          sel
            .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
            .distinct())
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
      }
      r += 1
    }
    forest = Checkpoints.cut(forest)
    sels.foreach(_.unpersist(blocking = false))
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
    * p = p∘p everywhere. Every frame is ≤ |components| rows; the loop
    * BATCHES TWO jumps per iteration (p ← (p∘p)∘(p∘p), two self-joins)
    * before paying the checkpoint + emptiness probe, so convergence
    * costs ⌈log₄ depth⌉ probe round-trips instead of ⌈log₂ depth⌉ —
    * on the shallow per-round hook forests (depth ≤ component count
    * halvings) that halves the fixed driver-side overhead, which is
    * the dominant cost at harness scale. Extra jumps past the root are
    * no-ops (the root self-loops), so over-jumping is always safe.
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
      // first jump (lazy — bounded lineage on the checkpointed ptr)
      val t1 = ptr.select(col("c").as("p"), col("p").as("pp"))
      val j1 = ptr.join(t1, Seq("p")).select(col("c"), col("pp").as("p"))
      // second jump, then one checkpoint + one probe for the pair
      val t2 = j1.select(col("c").as("p"), col("p").as("pp"))
      val j2 = Checkpoints.cut(
        j1.join(t2, Seq("p")).select(col("c"), col("p"), col("pp")))
      done = j2.where(col("p") =!= col("pp")).isEmpty
      ptr = j2.select(col("c"), col("pp").as("p"))
    }
    ptr
  }
}
