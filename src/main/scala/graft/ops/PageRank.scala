package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank power iteration as DataFrame algebra — the canonical
  * iterative-graph workload (public algorithm: Brin & Page). Each round
  * is one join (ranks onto edge sources) + one aggregate (contributions
  * by destination):
  *
  *   r'(v) = (1-d)/N + d · Σ_{u→v} r(u) / outdeg(u)
  *
  * Scale shape: the per-round shuffle is keyed by edge source then
  * destination — at 100 TB both edges and ranks pre-partition on the
  * same key (bucketing) so the join is exchange-free and only the
  * contribution aggregate moves data. The working set is
  * localCheckpointed every round (the q51/q60/q95 iterative-plan
  * discipline — without it the lineage doubles per round). Rank sums
  * accumulate in decimal(38,12) (the repo-wide order-independent
  * summation recipe), so results are exact across partitionings and
  * engines.
  *
  * Callers supply DIRECTED edges; use [[symmetrize]] for an undirected
  * graph — with every node having out-edges there is no dangling-mass
  * term (the production note for general graphs: fold dangling mass
  * back uniformly each round).
  */
object PageRank {

  /** Both directions of every edge, deduplicated. */
  def symmetrize(edges: DataFrame): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"))
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
    fwd.union(rev).distinct()
  }

  /** Run `iters` power-iteration rounds at damping `d`. `edges` must
    * have (src, dst) with every node appearing as a source (no dangling
    * nodes — see [[symmetrize]]). Returns (node, r). */
  def run(edges: DataFrame, iters: Int, damping: Double): DataFrame = {
    // pay the src-shuffle ONCE: the checkpointed edge set is physically
    // hash-partitioned on src (LogicalRDD keeps the partitioning
    // metadata), so each round's ranks join plans no edge-side
    // exchange — the local stand-in for bucketing edges by src on a
    // cluster. Degrees fold into the same pre-join (src, dst, deg)
    // shape so rounds do one join, not two.
    val e = edges
      .repartition(col("src"))
      .localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = e
      .join(deg, "src")
      .repartition(col("src"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node")).distinct().localCheckpoint(true)
    val n = nodes.count()
    var ranks = nodes.withColumn("r", lit(1.0 / n))
    for (_ <- 1 to iters) {
      ranks = ed
        .join(ranks, ed("src") === ranks("node"))
        .select(col("dst"), (col("r") / col("deg")).as("c"))
        .groupBy(col("dst").as("node"))
        .agg(
          (lit((1.0 - damping) / n) +
            lit(damping) * sum(col("c").cast("decimal(38,12)")).cast("double")).as("r")
        )
        .localCheckpoint(true)
    }
    ranks
  }
}
