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
  * min-struct aggregate (both shuffle on bounded keys), then an exact
  * label recompute via [[Components]] large-star/small-star on the
  * forest-so-far (itself O(log n) rounds, lineage-checkpointed). No
  * driver collects; forest size ≤ nodes−1 by construction.
  */
object Boruvka {

  /** Forest edges (src, dst, w) after `rounds` Borůvka rounds.
    * `rounds` must be ≥ log2(max component diameter of the final
    * forest); extra rounds are no-ops (no cross-component edge left).
    */
  def forest(edges: DataFrame, rounds: Int): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"), col("w"))
    val nodes = e0
      .select(col("src").as("node"))
      .unionByName(e0.select(col("dst").as("node")))
      .distinct()

    var labels = nodes.withColumn("comp", col("node"))
    var forest = e0.limit(0)

    for (_ <- 1 to rounds) {
      val cross = e0
        .join(labels.select(col("node").as("src"), col("comp").as("ca")), Seq("src"))
        .join(labels.select(col("node").as("dst"), col("comp").as("cb")), Seq("dst"))
        .where(col("ca") =!= col("cb"))
      val sel = cross
        .select(col("ca").as("comp"), struct(col("w"), col("src"), col("dst")).as("e"))
        .unionByName(
          cross.select(col("cb").as("comp"), struct(col("w"), col("src"), col("dst")).as("e")))
        .groupBy(col("comp"))
        .agg(min(col("e")).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
        .distinct()
      forest = Checkpoints.cut(forest.unionByName(sel).distinct())
      val lab = Components
        .connectedComponents(forest, "src", "dst")
        .select(col("id").as("node"), col("component").as("c2"))
      labels = Checkpoints.cut(
        nodes
          .join(lab, Seq("node"), "left")
          .select(col("node"), coalesce(col("c2"), col("node")).as("comp")))
    }
    forest
  }
}
