package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming token bucket ≡ batch fold law: admission totals per key
  * after two in-order micro-batches equal the q242 batch replay over
  * the union — the state-store handoff between batches is exactly an
  * associativity cut of the ordered fold.
  */
class StreamingRateLimiterSpec extends SparkSpec {
  import spark.implicits._
  import StreamingRateLimiter.Arrival

  private def arrivals: Seq[Arrival] = {
    Tables.events(spark, "/root/testdata/sf0.001")
      .select(
        col("user_id").as("key"),
        col("ts_ns").as("tsNs"),
        col("event_id").as("eventId"),
        when(col("event_type") === "purchase", 4L)
          .when(col("event_type") === "click", 2L)
          .when(col("event_type") === "view", 1L)
          .otherwise(0L).as("cost"))
      .as[Arrival]
      .collect()
      .sortBy(a => (a.tsNs, a.eventId))
      .toSeq
  }

  test("two in-order micro-batches equal the q242 batch fold") {
    implicit val sqlCtx = spark.sqlContext
    val all = arrivals
    val input = MemoryStream[Arrival]
    val out = StreamingRateLimiter.decide(
      input.toDF().select(
        col("key"), col("tsNs").as("ts_ns"), col("eventId").as("event_id"), col("cost")))
    val q = out.writeStream
      .format("memory")
      .queryName("rl_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("rl_ckpt").toString)
      .start()
    try {
      // split at a TIME boundary so batch order == event order per key
      val cut = all(all.length / 2).tsNs
      val (b1, b2) = all.partition(_.tsNs <= cut)
      input.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()

      val streamed = spark
        .table("rl_stream")
        .groupBy($"key")
        .agg(
          sum(when($"accepted", 1L).otherwise(0L)).as("accepted"),
          sum(when(!$"accepted", 1L).otherwise(0L)).as("rejected"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap

      val batch = graft.Queries
        .q242TokenBucket(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
        .toMap

      assert(streamed === batch)
      assert(streamed.values.map(_._2).sum > 0, "no rejections — vacuous corpus")
    } finally q.stop()
  }
}
