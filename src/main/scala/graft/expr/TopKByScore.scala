package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: keep the k highest-scored (score, id) pairs per
  * group with a bounded buffer — O(k) state per key regardless of group
  * size, merged associatively across partitions (the partial+final
  * aggregation shape; a 100 TB group costs the same buffer as a small
  * one). Ties break on the lower id so results are deterministic and
  * comparable to a ROW_NUMBER window oracle.
  *
  * Input: (groupKey, id, score) — the key is handled by groupByKey.
  */
class TopKByScore(k: Int) extends Aggregator[(String, Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  // distinct first: LSH candidate generation can surface the same
  // (score, id) pair through several tables/batches; a duplicate must
  // not occupy two of the k slots (makes the aggregator idempotent to
  // re-delivered candidates — required by the streaming ANN path).
  private def trim(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.distinct.sortWith(better).take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], in: (String, Long, Double)): Seq[(Double, Long)] =
    trim(buf :+ ((in._3, in._2)))

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    bufferEncoder
}
