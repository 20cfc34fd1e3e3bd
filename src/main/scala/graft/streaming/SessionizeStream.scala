package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with per-key gap semantics: events of the
  * same key belong to one session while consecutive event times are
  * within `gapMs`; a session CLOSES (and is emitted) when the event-time
  * watermark passes its end + gap — the flatMapGroupsWithState +
  * EventTimeTimeout pattern (the streaming twin of the batch
  * sessionization in Queries.q37/q39).
  *
  * State per key is one (start, last, count) triple — constant size,
  * partitioned by key in the state store, checkpointable; 100 TB of
  * events with 100M active keys is a few GB of cluster-wide state.
  */
object SessionizeStream {

  case class SessionState(startMs: Long, lastMs: Long, count: Long)
  case class SessionOut(key: String, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** `df` must carry a watermark on `tsCol` (withWatermark) — timeouts
    * fire when the watermark passes lastEvent + gap.
    *
    * Output: the original key columns (decoded from the internal JSON
    * key envelope) + session_start / session_end / n_events.
    */
  def sessions(df: DataFrame, keys: Seq[String], tsCol: String, gapMs: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keySchema = org.apache.spark.sql.types.StructType(keys.map(k => df.schema(k)))
    val keyed = df
      .select(
        // JSON-struct key, NOT a joined string: any separator can occur in
        // the data (colliding distinct tuples), and concat_ws skips null
        // parts, merging different logical keys into one watermark.
        // ignoreNullFields=false keeps (null,"x") distinct from ("x",null).
        to_json(struct(keys.map(col).toIndexedSeq: _*), PerKeyWatermark.keyJsonOpts).as("key"),
        col(tsCol).as("ts")
      )
      .as[(String, Timestamp)]

    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[(String, Timestamp)], state: GroupState[SessionState]) => {
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          if (state.hasTimedOut) {
            // watermark passed last + gap: close and emit the session
            val s = state.get
            out += SessionOut(key, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.count)
            state.remove()
          } else {
            var cur = state.getOption
            rows.map(_._2.getTime).toSeq.sorted.foreach { t =>
              cur match {
                case None =>
                  cur = Some(SessionState(t, t, 1))
                case Some(s) if t > s.lastMs =>
                  if (t - s.lastMs <= gapMs)
                    cur = Some(s.copy(lastMs = t, count = s.count + 1))
                  else {
                    // forward gap exceeded: close and start a new session
                    out += SessionOut(key, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.count)
                    cur = Some(SessionState(t, t, 1))
                  }
                case Some(s) if t >= s.startMs =>
                  // late event inside the current span: absorbed
                  cur = Some(s.copy(count = s.count + 1))
                case Some(s) if s.startMs - t <= gapMs =>
                  // late event within gap BEFORE the span: extend backward
                  cur = Some(s.copy(startMs = t, count = s.count + 1))
                case Some(_) =>
                  // far-past late event: its own already-closed session
                  // (must NOT be folded into the current one)
                  out += SessionOut(key, new Timestamp(t), new Timestamp(t), 1)
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
          }
          out.iterator
        }
      )
      // decode the JSON key envelope back to the caller's key columns
      .select(
        (from_json(col("key"), keySchema, PerKeyWatermark.keyJsonOpts).as("__k") +:
          Seq(col("session_start"), col("session_end"), col("n_events"))): _*
      )
      .select(
        (keys.map(k => col(s"__k.`$k`").as(k)) ++
          Seq(col("session_start"), col("session_end"), col("n_events"))): _*
      )
  }
}
