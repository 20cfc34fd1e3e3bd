package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.Column
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.ops.Drift

/** Streaming PSI drift monitor — the q102 metric run continuously: each
  * micro-batch's feature histogram is compared against a FROZEN
  * reference histogram (the training-time distribution), and one
  * (batch_id, n_rows, psi) observation is emitted per batch.
  *
  * Shape: foreachBatch applies the BATCH drift operator ([[Drift]]) to
  * every micro-batch, so stream and batch agree by construction — the
  * same histogram aggregate (distributed, the only data-scale work) and
  * the same scalar PSI fold. The reference histogram is a bins-sized
  * constant captured once at query start; per-batch state is nothing —
  * drift monitoring is memoryless by design (each batch is scored
  * against training, not against the previous batch).
  *
  * 100 TB posture: the per-batch histogram is one partial-aggregated
  * groupBy over the batch; the PSI fold is O(bins) on the driver. A
  * drifted batch is visible the moment it commits — this is the
  * monitor a feature-ingest pipeline runs in front of a training table.
  */
object StreamingDrift {

  /** Attach the PSI monitor to a streaming frame. `binExpr` maps a row
    * to its feature bin (same expression the reference histogram was
    * built with); `ref` is that frozen histogram; `out` receives one
    * (batchId, nRows, psi) observation per micro-batch. The caller
    * starts the returned writer (choosing trigger/checkpoint).
    *
    * An EMPTY micro-batch (possible under some triggers) is skipped
    * rather than scored: Laplace smoothing would turn its all-zero
    * histogram into a uniform distribution whose PSI against any
    * non-uniform reference reads as drift — a false alarm carrying
    * n_rows=0. No data ⇒ no drift evidence ⇒ no observation.
    */
  def psiMonitor(
      stream: DataFrame,
      binExpr: Column,
      ref: Map[Int, Long],
      bins: Int,
      out: (Long, Long, Double) => Unit
  ): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val h = Drift.histogram(batch.toDF(), binExpr, bins)
      val n = h.values.sum
      if (n > 0) out(batchId, n, Drift.psi(h, ref, bins))
    }
}
