package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Checkpoints.CutOps

/** Synchronous LABEL-PROPAGATION community detection (Raghavan, Albert
  * & Kumara 2007), deterministic variant: every round, every node
  * adopts the MOST FREQUENT label among its in-neighbors, ties broken
  * by the smallest label. The classic formulation updates nodes
  * asynchronously in random order — unreplayable across engines and
  * even across runs; the synchronous min-tie variant is a pure
  * function of (graph, round count), which is what lets a DuckDB
  * oracle replay it round-for-round (the q96 unrolled-recurrence
  * discipline). Complements the component operators: connected
  * components (ops/Components) answer "reachable at all", LPA answers
  * "densely attached where" — communities inside one giant component.
  *
  * Scale shape (the PageRank pattern, PageRank.scala:47): the edge set
  * pays its src-shuffle ONCE (repartition + lineage cut keeps the
  * partitioning metadata), so each round's label join plans no
  * edge-side exchange; a round is then two dst-keyed hash aggregates
  * that share partitioning — count per (dst, label), then the min-tie
  * argmax folded into a single min(struct(-c, label)) (round 9; the
  * earlier cmax-join form paid an extra shuffle + join per round).
  * Labels are checkpointed per round — iterative-lineage hygiene
  * (the Components discipline). Nothing ever collects to the driver.
  */
object LabelProp {

  /** Run `iters` synchronous rounds over DIRECTED (src, dst) edges —
    * pass a symmetrized edge set for the undirected semantics. Label
    * init is the node's own id. Returns (node, label) for EVERY node
    * mentioned in `edges`: a node with no in-edges (possible on
    * arbitrary directed input) has no in-neighbor vote and KEEPS its
    * current label each round — the per-round update left-joins back
    * to the node universe instead of keying the output on dst alone,
    * so directed inputs cannot silently drop source-only nodes.
    *
    * `inCoverTotal = true` is the caller's ASSERTION that every node
    * has at least one in-edge (true by construction for symmetrized
    * input — every node appears as a dst): the per-round update then
    * keys on dst directly and skips the join-back entirely, which is
    * byte-identical on such graphs (the coalesce branch never fires)
    * and saves one join per round. On input violating the assertion
    * the dst-keyed form would DROP source-only nodes — hence opt-in,
    * never inferred.
    */
  def run(edges: DataFrame, iters: Int, inCoverTotal: Boolean = false): DataFrame = {
    val e = edges.repartition(col("src")).cutLineage()
    val nodes = e
      .select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .cutLineage()
    var labels = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      // ONE exchange per round (r11): hash-partitioning the joined
      // votes on dst ALONE satisfies the clustering requirement of
      // both aggregates below (dst ⊆ {dst, label}) AND the join-back
      // key (node = dst), so the count agg, the min-tie argmax, and
      // the label update all run exchange-free on this partitioning —
      // the r10 plan paid three shuffles for the same round
      val cnt = e
        .join(labels, e("src") === labels("node"))
        .select(col("dst"), col("label"))
        .repartition(col("dst"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("c"))
      // min-tie argmax in ONE aggregate: min(struct(-c, label)) orders
      // by count DESC then label ASC — struct comparison keeps the
      // label type generic (ids or strings), where a max_by would tie
      // nondeterministically and a cmax-join (the r8 form) pays a
      // second shuffle + join per round for the same answer
      val upd = cnt
        .groupBy(col("dst"))
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("dst").as("node"), col("m.l").as("new_label"))
      // in-degree-0 nodes are absent from `upd`; coalesce keeps their
      // label (on symmetrized input every node has in-edges and this
      // is byte-identical to the dst-keyed form — q155's contract,
      // which inCoverTotal callers take directly, skipping the join)
      labels =
        (if (inCoverTotal) upd.withColumnRenamed("new_label", "label")
         else
           labels
             .join(upd, Seq("node"), "left")
             .select(col("node"), coalesce(col("new_label"), col("label")).as("label")))
          .cutLineage()
    }
    labels
  }

  /** Community census over a label frame: one row per surviving label
    * with its member count and id range. */
  def census(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("label").as("community"))
      .agg(
        count(lit(1)).as("n_nodes"),
        min(col("node")).as("min_node"),
        max(col("node")).as("max_node")
      )
}
