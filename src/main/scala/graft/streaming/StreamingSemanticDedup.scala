package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.ops.{Ivf, Similarity}

/** Incremental SEMANTIC dedup — the q72 incremental pattern on vectors:
  * a stream of new embeddings is classified against a FROZEN
  * kept-representative snapshot (the output of a prior batch
  * [[graft.ops.SemanticDedup]] run). An arrival is DROPPED when it lies
  * within cosine `tau` of any frozen rep sharing one of its `m` soft
  * cells; otherwise it is kept (a candidate to join the next snapshot
  * rebuild).
  *
  * Shape: the quantizer's centroids are plan constants (broadcast
  * class), so soft assignment of arrivals is pure map-side work on the
  * stream; the rep snapshot is static and cell-keyed, so matching is a
  * stream-static equi join on cluster_id (no stream state for the
  * join); the per-arrival min-rep reduction is the only stateful
  * aggregation. The snapshot is intentionally frozen — arrivals do not
  * dedup against each other — which makes classification idempotent
  * and order-independent across micro-batches (the same contract q72
  * gives text fingerprints); periodic batch rebuilds fold survivors in.
  *
  * 100 TB posture: arrivals never see the corpus, only the (much
  * smaller) kept-rep snapshot, and only the cells they land in — the
  * same Σc² confinement as the batch operator. The PRODUCTION surface
  * is [[classifyEach]] (foreachBatch): classification against a frozen
  * snapshot is a pure per-arrival function, so each micro-batch is
  * classified independently with ZERO streaming state. [[classify]] is
  * the continuous-query form of the same arithmetic — its per-arrival
  * groupBy keeps one state row per arrival ever seen (no watermark can
  * apply to a non-time key), which is fine for tests and bounded
  * streams but NOT a long-running ingest.
  */
object StreamingSemanticDedup {

  /** Classify streaming `newVecs` against the frozen `reps` snapshot.
    * Returns a streaming frame (idCol, kept, rep_id) — rep_id is the
    * smallest τ-close shared-cell rep, or the arrival's own id when
    * kept. Aggregation-mode sinks (update/complete) apply. State grows
    * with distinct arrivals — see the object doc; prefer
    * [[classifyEach]] for unbounded streams.
    */
  def classify(
      newVecs: DataFrame,
      reps: DataFrame,
      centroids: DataFrame,
      m: Int,
      tau: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val repCells = Ivf
      .assignTopM(reps, centroids, m, idCol, vecCol)
      .select(col("cluster_id"), col(idCol).as("__rep"), col(vecCol).as("rep_vec"))
    // map-side soft assignment of each arrival (centroids are constants)
    Ivf
      .assignTopM(newVecs, centroids, m, idCol, vecCol)
      .join(repCells, Seq("cluster_id"), "left")
      .select(
        col(idCol),
        when(
          col("__rep").isNotNull &&
            Similarity.cosine(col(vecCol), col("rep_vec")) >= tau,
          col("__rep")
        ).as("hit")
      )
      .groupBy(col(idCol))
      .agg(min(col("hit")).as("rep"))
      .select(
        col(idCol),
        col("rep").isNull.as("kept"),
        coalesce(col("rep"), col(idCol)).as("rep_id")
      )
  }

  /** Stateless production form: classify each micro-batch independently
    * (the exact [[classify]] arithmetic run as a BATCH plan per batch —
    * valid because the rep snapshot is frozen, so an arrival's verdict
    * never depends on other arrivals). `out` receives each classified
    * batch; the caller starts the returned writer. */
  def classifyEach(
      newVecs: DataFrame,
      reps: DataFrame,
      centroids: DataFrame,
      m: Int,
      tau: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  )(out: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    newVecs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      out(classify(batch.toDF(), reps, centroids, m, tau, idCol, vecCol), batchId)
    }
}
