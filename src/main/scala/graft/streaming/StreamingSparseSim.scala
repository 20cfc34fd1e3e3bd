package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.SparseSim

/** STREAMING decontamination gate: documents arriving on a stream are
  * scored against a FROZEN reference (eval-set) index by the asymmetric
  * coverage law of [[graft.ops.SparseSim.coverageScores]] — "this
  * arriving doc contains ≥ θ of eval doc r's idf²-weighted feature
  * mass" is exactly the live form of the batch decontamination sweeps
  * (q61/q64/q114): run it in the ingest path and contaminated docs are
  * flagged BEFORE they ever land in a training shard.
  *
  * Why this law and not cosine: one streaming query supports one
  * stateful aggregation, and coverage is the similarity that needs
  * exactly one (no probe-side norm; the ref norm rides the index rows
  * — see the SparseSim scaladoc). The whole pipeline is map-side
  * n-gram extraction (array_distinct in-row) → stream-static feature
  * join → one grouped aggregate; state is one row per surviving
  * (probe, ref) candidate — the output itself, nothing more.
  *
  * Output mode: complete (the flagged-pair table revises as batches
  * arrive; a probe doc split across micro-batches is impossible —
  * rows are whole documents).
  */
object StreamingSparseSim {

  /** `probes` is a STREAMING (idCol, textCol) frame; `index` comes from
    * [[SparseSim.coverageIndex]] built once on the static reference.
    * Returns a streaming (probe_id, ref_id, n_shared, coverage) frame
    * for complete-mode sinks.
    */
  def flagged(
      probes: DataFrame,
      index: DataFrame,
      n: Int,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val feats = SparseSim
      .distinctFeatures(probes, idCol, textCol, n)
      .withColumnRenamed(idCol, "probe_id")
    SparseSim.coverageScores(feats, index, threshold)
  }
}
