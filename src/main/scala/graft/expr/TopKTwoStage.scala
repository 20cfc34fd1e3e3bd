package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator for TWO-STAGE serving state (streaming IVF-PQ): keep
  * the `short` best candidates per query by FIRST-stage (ADC) score,
  * each carrying its already-computed exact second-stage score — O(short)
  * state per key, merged associatively, idempotent to re-delivered
  * candidates (the [[TopKByScore]] discipline). The emit side re-ranks
  * the surviving shortlist by the exact score and takes k, reproducing
  * the batch two-stage law: shortlist by ADC, rerank by exact — a
  * candidate outside the ADC shortlist never reaches the reranker, no
  * matter how good its exact score (that IS the PQ serving trade).
  *
  * Tuple layout: (adc, neighbor_id, rscore).
  */
class TopKTwoStage(short: Int)
    extends Aggregator[(String, Long, Double, Double), Seq[(Double, Long, Double)], Seq[(Double, Long, Double)]] {

  private def better(a: (Double, Long, Double), b: (Double, Long, Double)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(buf: Seq[(Double, Long, Double)]): Seq[(Double, Long, Double)] =
    buf.distinct.sortWith(better).take(short)

  override def zero: Seq[(Double, Long, Double)] = Seq.empty

  override def reduce(
      buf: Seq[(Double, Long, Double)],
      in: (String, Long, Double, Double)
  ): Seq[(Double, Long, Double)] =
    trim(buf :+ ((in._3, in._2, in._4)))

  override def merge(
      a: Seq[(Double, Long, Double)],
      b: Seq[(Double, Long, Double)]
  ): Seq[(Double, Long, Double)] = trim(a ++ b)

  override def finish(buf: Seq[(Double, Long, Double)]): Seq[(Double, Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long, Double)]] =
    bufferEncoder
}
