package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Checkpoints.CutOps

/** MULTI-SOURCE BREADTH-FIRST SEARCH by frontier expansion — shortest
  * hop distance from a seed SET to every node reachable within
  * `maxDepth` hops. The remaining basic graph primitive the engine
  * lacked: components answer "connected at all", LPA "densely attached
  * where", PageRank "how central"; BFS answers "HOW FAR" — reachability
  * radii, contamination blast-radius, link-distance features.
  *
  * Round r joins the current frontier into the edge set (one equi join
  * shuffled on src — the edge frame is repartitioned on src ONCE and
  * checkpointed, so per-round plans add no edge-side exchange), then
  * anti-joins the visited set to keep only first-time nodes: each node
  * is assigned the FIRST round that reaches it, which is the BFS
  * distance by induction. Per-round frames cut lineage through
  * [[Checkpoints]] (iterative-DataFrame discipline; reliable backend
  * under a configured checkpoint dir). The only driver-side values are
  * the per-round scalar frontier counts that decide early exit.
  *
  * At 100 TB scale this is |E|-proportional work per round with the
  * frontier broadcast-or-shuffled on the same key every round — the
  * Pregel shape expressed declaratively.
  */
object Bfs {

  /** (node, dist) for every node reachable from `seeds` within
    * `maxDepth` hops over DIRECTED (src, dst) edges — symmetrize for
    * undirected distance. Seeds are dist 0; unreachable (or
    * beyond-depth) nodes are ABSENT, the caller left-joins against its
    * node universe if it needs them.
    *
    * @param seeds one-column frame of seed node ids (column `node`)
    */
  def layers(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges
      .select(col("src"), col("dst"))
      .repartition(col("src"))
      .cutLineage()
    var visited = seeds
      .select(col("node"))
      .distinct()
      .withColumn("dist", lit(0))
      .cutLineage()
    var frontier = visited.select(col("node"))
    var d = 0
    var exhausted = false
    while (d < maxDepth && !exhausted) {
      d += 1
      val next = e
        .join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node"))
        .distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(d))
        .cutLineage()
      if (next.isEmpty) exhausted = true // scalar convergence check
      else {
        visited = visited.unionByName(next).cutLineage()
        frontier = next.select(col("node"))
      }
    }
    visited
  }

  /** PER-SEED BFS: (seed, node, dist) for every seed×node pair within
    * `maxDepth` hops — [[layers]] merges all seeds into one wave (one
    * distance per node); this variant keeps each seed's own distance
    * field, the form eccentricity samples and per-query distance
    * features need. Identical round structure with the visited set
    * keyed on (seed, node); state grows with Σ per-seed reach, so use
    * seed SAMPLES at scale, not the full node set (all-pairs BFS is
    * quadratic state by definition).
    *
    * @param seeds one-column frame of seed node ids (column `seed`)
    */
  def layersBySeed(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges
      .select(col("src"), col("dst"))
      .repartition(col("src"))
      .cutLineage()
    var visited = seeds
      .select(col("seed"))
      .distinct()
      .withColumn("node", col("seed"))
      .withColumn("dist", lit(0))
      .cutLineage()
    var frontier = visited.select(col("seed"), col("node"))
    var d = 0
    var exhausted = false
    while (d < maxDepth && !exhausted) {
      d += 1
      val next = e
        .join(frontier, e("src") === frontier("node"))
        .select(col("seed"), col("dst").as("node"))
        .distinct()
        .join(visited, Seq("seed", "node"), "left_anti")
        .withColumn("dist", lit(d))
        .cutLineage()
      if (next.isEmpty) exhausted = true
      else {
        visited = visited.unionByName(next).cutLineage()
        frontier = next.select(col("seed"), col("node"))
      }
    }
    visited
  }
}
