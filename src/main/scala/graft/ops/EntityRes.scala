package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ENTITY RESOLUTION (record linkage) — the classic four-stage pipeline
  * as composable DataFrame stages:
  *
  *   normalize → multi-pass blocking → pairwise scoring → clustering
  *   (→ survivorship via [[Canonical]])
  *
  * Blocking is what makes ER distributed-feasible: comparing every A
  * record to every B record is O(|A|·|B|); comparing only pairs that
  * share at least one cheap deterministic key is linear in the sum of
  * per-block pair counts. Multiple passes with DIFFERENT keys (name
  * key, phone key, …) cover each other's noise — a record whose name
  * is misspelled still blocks on its phone key and vice versa; records
  * noisy in EVERY key are honest misses (recall < 1), which is why
  * q169 reports measured precision/recall against its planted truth
  * rather than assuming the pipeline is lossless.
  *
  * Scale posture: each pass is one equi shuffle join on an 8-byte-ish
  * key; candidate volume is Σ_blocks |A_block|·|B_block| — governed by
  * the key's selectivity, not the corpus size (the same df-cap
  * reasoning as SparseSim: cap or salt a pathological hot block before
  * joining; [[Skew.saltedJoin]] composes here unchanged). Scoring is
  * map-side on the joined pairs; clustering reuses the O(log n)
  * star-contraction [[Components]].
  */
object EntityRes {

  /** Distinct candidate pairs from multi-pass blocking: for each
    * (keyA, keyB) pass, equi-join `a` and `b` on the pass keys, then
    * union passes and dedup on the id pair — a pair found by two
    * passes scores once. Column names of `a` and `b` must be disjoint;
    * null keys never block (inner equi join drops them — a null name
    * should not create a mega-block).
    */
  def blockedCandidates(
      a: DataFrame,
      b: DataFrame,
      idA: String,
      idB: String,
      passes: Seq[(Column, Column)]
  ): DataFrame =
    passes
      .map { case (ka, kb) => a.join(b, ka === kb) }
      .reduce(_ unionByName _)
      .dropDuplicates(idA, idB)

  /** Match edges → (id, component, cluster_size); min-reachable-id
    * labels from [[Components.connectedComponents]].
    */
  def clusters(matches: DataFrame, idA: String, idB: String): DataFrame = {
    val labels = Components.connectedComponents(matches.select(idA, idB), idA, idB)
    val sizes = labels.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "component")
  }
}
