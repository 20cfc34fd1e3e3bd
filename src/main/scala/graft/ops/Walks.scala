package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DETERMINISTIC RANDOM WALKS — the graph-embedding corpus generator
  * (DeepWalk/node2vec both start from exactly this: fixed-length walks
  * whose visit statistics feed skip-gram training). Randomness is
  * replaced by the repo's md5 discipline: at step s from node u the
  * walker takes the out-neighbor v minimizing
  * md5("u:s:v") — a pseudo-random but REPLAYABLE choice, so the walk
  * corpus is bit-identical on both engines (the q115/q221 seeded-
  * sampling posture) while still decorrelating consecutive steps (the
  * hash mixes step index and neighbor). Dead-end walkers stay put.
  *
  * Scale shape: per step one equi join frontier⋈edges (shuffle on the
  * current node) + one per-walker min-aggregate; the frontier is
  * |walkers| rows regardless of graph size, and the corpus grows
  * linearly as steps·|walkers|. Lineage cut per step ([[Checkpoints]]).
  * No driver collects.
  */
object Walks {

  /** Walk corpus (walker, step, node) for `steps` transitions from
    * each start node (step 0 = the start itself). `edges` exposes
    * (src, dst); `starts` exposes (node). The argmin is encoded as
    * min(md5 ‖ zero-padded dst) — one string total order, identical
    * in SQL replay.
    */
  def deterministicWalks(edges: DataFrame, starts: DataFrame, steps: Int): DataFrame = {
    var cur = starts
      .select(col("node").as("walker"))
      .withColumn("node", col("walker"))
    var corpus = cur.withColumn("step", lit(0))
    for (s <- 1 to steps) {
      val chosen = cur
        .join(edges.withColumnRenamed("src", "node"), Seq("node"))
        .select(
          col("walker"),
          concat(
            md5(concat_ws(":", col("node"), lit(s), col("dst"))),
            lpad(col("dst").cast("string"), 14, "0")).as("key"))
        .groupBy(col("walker"))
        .agg(min(col("key")).as("key"))
        .select(col("walker"), substring(col("key"), 33, 14).cast("long").as("nxt"))
      cur = Checkpoints.cut(
        cur
          .join(chosen, Seq("walker"), "left")
          .select(col("walker"), coalesce(col("nxt"), col("node")).as("node")))
      corpus = corpus.unionByName(cur.withColumn("step", lit(s)))
    }
    corpus
  }
}
