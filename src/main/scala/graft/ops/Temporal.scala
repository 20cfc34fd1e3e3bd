package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TEMPORAL (TIME-RESPECTING) REACHABILITY — earliest-arrival paths on
  * a graph whose edges are active at discrete times, where a valid path
  * must traverse edges with STRICTLY INCREASING times (Holme–Saramäki
  * temporal-network semantics). Static reachability over-counts on
  * temporal graphs: an edge that fires BEFORE you can reach its source
  * is useless. The reference's dataflow has an implicit temporal chain
  * (cursor watermarks gate what a cycle may consume,
  * `/root/reference/app/main.py:209-237`); this is that idea promoted
  * to a graph operator — who can influence whom, given edge timing.
  *
  * The DP is the classic earliest-arrival relaxation: arr(v) = min t
  * over edges (u→v, t) with t > arr(u). Greedy-optimal because the
  * usable-edge set at a node only GROWS as arrival gets earlier, so
  * the pointwise-min fixpoint is exact (no negative-cycle analogue:
  * times strictly increase along any path, bounding path length by the
  * time-domain size).
  *
  * Scale shape: per round one equi join edges⋈arrivals (shuffle on
  * src) + one min-aggregate (shuffle on dst), lineage cut per round
  * ([[Checkpoints]], the Scc discipline); rounds bounded by the number
  * of distinct edge times. No driver collects.
  */
object Temporal {

  /** Earliest arrival per reached node. `edges` exposes (src, dst, t)
    * with integral `t`; `sources` exposes (node). Sources start with
    * arrival −1 (every edge time ≥ 0 is usable from a source).
    */
  def earliestArrival(edges: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    var arr = sources.select(col("node")).distinct().withColumn("arrival", lit(-1L))
    for (_ <- 1 to rounds) {
      val relaxed = edges
        .join(arr.select(col("node").as("src"), col("arrival")), Seq("src"))
        .where(col("t") > col("arrival"))
        .select(col("dst").as("node"), col("t").as("arrival"))
      arr = Checkpoints.cut(
        arr
          .unionByName(relaxed)
          .groupBy(col("node"))
          .agg(min(col("arrival")).as("arrival")))
    }
    arr
  }
}
