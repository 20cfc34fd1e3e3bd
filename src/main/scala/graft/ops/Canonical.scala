package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonical-document selection — the step that makes near-dup
  * detection an actual DEDUP: each near-dup cluster keeps exactly one
  * survivor, chosen by QUALITY (highest q21 composite score, doc_id
  * ascending as the total-order tiebreak), not by the arbitrary min-id
  * convention of [[TextDedup.dedupAssignments]]. Published pipelines do
  * exactly this (keep the longest / highest-scoring member); the min-id
  * rep is a label, not a curation decision.
  *
  * Shape: cluster labels come from [[Components]] over the near-dup
  * edge set (docs in no edge are their own singleton component via the
  * left-join coalesce), quality is the map-side q21 algebra, and the
  * survivor is one rank-1 window per component — components are
  * near-dup clusters, bounded by near-dup density, never a whole-corpus
  * partition, so the window task is safe at scale (and a pathological
  * mega-cluster is itself the signal to fix upstream thresholds).
  * Cross-engine determinism: both engines compute bit-identical quality
  * doubles (q21's oracled law), so (score DESC, id ASC) picks the same
  * survivor everywhere.
  */
object Canonical {

  /** Appends `component` (cluster label, singleton = own id), `rank`
    * (1 = survivor) and `is_survivor` to a (idCol, quality `score`)
    * frame given the near-dup `edges` (id_a, id_b).
    */
  def survivors(scored: DataFrame, edges: DataFrame, idCol: String): DataFrame = {
    val labels = Components
      .connectedComponents(edges)
      .withColumnsRenamed(Map("id" -> idCol, "component" -> "__comp"))
    val w = Window
      .partitionBy(col("component"))
      .orderBy(col("score").desc, col(idCol).asc)
    scored
      .join(labels, Seq(idCol), "left")
      .withColumn("component", coalesce(col("__comp"), col(idCol)))
      .drop("__comp")
      .withColumn("rank", row_number().over(w))
      .withColumn("is_survivor", col("rank") === 1)
  }
}
