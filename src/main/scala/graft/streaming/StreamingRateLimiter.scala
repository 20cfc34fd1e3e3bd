package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING TOKEN-BUCKET RATE LIMITER — q242's two-sided clamped
  * recurrence in its natural habitat: a stateful stream where each
  * key's bucket state (tokens, accepted, rejected) lives in the state
  * store and every micro-batch folds its arrivals in event order. The
  * batch form replays history with an ordered array fold; this form
  * IS the deployment shape — per-key state is three longs regardless
  * of stream length, and admission decisions emit as the stream
  * flows, not after it lands.
  *
  * Contract: cap 5, refill 1 per event, identical decision rule to
  * [[graft.Queries.q242TokenBucket]]. Parity law
  * (StreamingRateLimiterSpec): final per-key (tokens, accepted,
  * rejected) after N in-order micro-batches equals the batch fold
  * over the union — the cross-batch state handoff is exactly the
  * fold's associativity cut.
  *
  * Rows WITHIN a micro-batch fold in (ts_ns, event_id) order (sorted
  * here — `flatMapGroupsWithState` does not guarantee iterator
  * order); ACROSS batches order is arrival order, the same contract
  * as PerKeyWatermark. The spec feeds batches that respect event
  * order, matching the batch twin's total (ts_ns, event_id) sort.
  */
object StreamingRateLimiter {

  case class Arrival(key: Long, tsNs: Long, eventId: Long, cost: Long)
  case class Bucket(tokens: Long, accepted: Long, rejected: Long)
  case class Decision(key: Long, eventId: Long, accepted: Boolean, tokensAfter: Long)

  val Cap = 5L
  val Refill = 1L

  /** Admission decisions for a (possibly streaming) frame with columns
    * (key, ts_ns, event_id, cost). One output row per input row.
    */
  def decide(df: DataFrame): Dataset[Decision] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col("key").cast("long").as("key"),
      col("ts_ns").cast("long").as("tsNs"),
      col("event_id").cast("long").as("eventId"),
      col("cost").cast("long").as("cost"))
      .as[Arrival]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[Arrival], state: GroupState[Bucket]) => {
          var b = state.getOption.getOrElse(Bucket(Cap, 0L, 0L))
          val out = rows.toArray.sortBy(r => (r.tsNs, r.eventId)).map { r =>
            val refilled = math.min(Cap, b.tokens + Refill)
            if (r.cost <= refilled) {
              b = Bucket(refilled - r.cost, b.accepted + 1, b.rejected)
              Decision(key, r.eventId, accepted = true, b.tokens)
            } else {
              b = Bucket(refilled, b.accepted, b.rejected + 1)
              Decision(key, r.eventId, accepted = false, b.tokens)
            }
          }
          state.update(b)
          out.iterator
        })
  }
}
