package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Checkpoints.CutOps

/** K-CORE DECOMPOSITION by iterative peeling — the maximal subgraph in
  * which every node has degree ≥ k, computed by repeatedly deleting
  * under-degree nodes until the degree condition is a fixpoint (the
  * deletion cascade: removing a degree-2 node can push its neighbours
  * under k).
  *
  * Each round is one degree aggregate over the surviving edge
  * endpoints plus two semi joins (both endpoints must survive);
  * lineage is truncated per round with localCheckpoint — the same
  * iterative-DataFrame discipline as [[Components]] / [[PageRank]].
  * Round count is the peeling depth of the graph (the longest deletion
  * cascade), not its diameter; bounded-degree graphs converge in a
  * handful of rounds. At cluster scale the refinement is DELTA peeling
  * (re-aggregate only neighbourhoods of just-deleted nodes); the
  * full-reaggregate form here has identical output and one extra scan
  * per round — the fixpoint, not the schedule, is the contract.
  */
object KCore {

  /** Surviving edges of the k-core (canonicalized u < v, deduped).
    * Nodes of the core are the endpoints; by the fixpoint every one
    * has induced degree ≥ k.
    */
  def coreEdges(
      edges: DataFrame,
      k: Int,
      srcCol: String = "u",
      dstCol: String = "v",
      maxIter: Int = 50
  ): DataFrame = {
    var e = edges
      .select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") < col("v"))
      .distinct()
      .cutLineage()
    var before = e.count()
    var iter = 0
    var stable = false
    while (!stable && iter < maxIter) {
      val deg = e
        .select(col("u").as("id"))
        .unionByName(e.select(col("v").as("id")))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= k).select(col("id"))
      val ne = e
        .join(keep.withColumnRenamed("id", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("id", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .cutLineage()
      val after = ne.count()
      stable = after == before
      before = after
      e = ne
      iter += 1
    }
    // a silent partial peel would return edges whose endpoints can
    // still be under-degree (the cascade was cut mid-flight) — refuse
    // instead, the Components convergence discipline: maxIter bounds
    // the peeling depth the caller is prepared to pay for
    if (!stable)
      throw new IllegalStateException(
        s"coreEdges did not reach the peeling fixpoint in $maxIter rounds — " +
          "the deletion cascade is deeper than maxIter; raise maxIter")
    e
  }
}
