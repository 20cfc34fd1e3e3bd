package graft.streaming

import java.sql.Timestamp
import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming semantics (SURVEY.md §2.9): per-key watermark state across
  * micro-batches, strict `>`, commit-after-emit cursor ordering.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Ev(station_id: String, pollutant: String, ts: Timestamp, value: Double, arrival: Long)

  test("PerKeyWatermark: state survives batches; equal ts dropped; per-key independence") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = PerKeyWatermark.filterNew(input.toDF(), Seq("station_id", "pollutant"), "ts")
    val q = out.writeStream
      .format("memory")
      .queryName("pkw_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("pkw_ckpt").toString)
      .start()
    try {
      // batch 1: st1 advances to 12:00; st2 advances to 10:00
      input.addData(
        Ev("st1", "pm25", ts("2024-01-01 12:00:00"), 1.0, 1),
        Ev("st2", "pm25", ts("2024-01-01 10:00:00"), 2.0, 2)
      )
      q.processAllAvailable()
      // batch 2: equal ts for st1 → drop; newer for st1 → pass;
      // st2 older → drop; st3 unseen ancient → pass (fail-open)
      input.addData(
        Ev("st1", "pm25", ts("2024-01-01 12:00:00"), 3.0, 3),
        Ev("st1", "pm25", ts("2024-01-01 12:30:00"), 4.0, 4),
        Ev("st2", "pm25", ts("2024-01-01 09:00:00"), 5.0, 5),
        Ev("st3", "o3", ts("2000-01-01 00:00:00"), 6.0, 6)
      )
      q.processAllAvailable()
      val vals = spark.table("pkw_out").select("value").as[Double].collect().sorted.toSeq
      assert(vals == Seq(1.0, 2.0, 4.0, 6.0))
    } finally q.stop()
  }

  test("PerKeyWatermark: concatenation-colliding key tuples are independent keys") {
    // ("ab","c") and ("a","bc") concatenate identically; ("x",null) skips
    // the null under concat_ws. The JSON-struct key must keep all three
    // as separate watermarks (regression for the concat_ws key).
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = PerKeyWatermark.filterNew(input.toDF(), Seq("station_id", "pollutant"), "ts")
    val q = out.writeStream
      .format("memory")
      .queryName("pkw_collide")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("pkw_ckpt2").toString)
      .start()
    try {
      input.addData(Ev("ab", "c", ts("2024-01-01 12:00:00"), 1.0, 1))
      q.processAllAvailable()
      // same concat, different tuple, OLDER ts: must still pass
      input.addData(
        Ev("a", "bc", ts("2024-01-01 09:00:00"), 2.0, 2),
        Ev("ab", "c", ts("2024-01-01 11:00:00"), 3.0, 3), // genuinely older same-key → drop
        Ev("a", null, ts("2024-01-01 08:00:00"), 4.0, 4), // null part ≠ ("a","bc")
        Ev("ab", "c", null, 5.0, 5) // null ts: fail-open, no state advance
      )
      q.processAllAvailable()
      val vals = spark.table("pkw_collide").select("value").as[Double].collect().sorted.toSeq
      assert(vals == Seq(1.0, 2.0, 4.0, 5.0))
    } finally q.stop()
  }

  test("ProducerLoop.processBatch: emit-then-commit, watermark enforced across batches") {
    val dir = Files.createTempDirectory("producer").toString
    val sink = s"$dir/sink"
    val cursors = s"$dir/cursors"
    val keys = Seq("station_id", "pollutant")

    val b1 = Seq(
      ("st1", "pm25", ts("2024-01-01 12:00:00"), 1.0, 1L),
      ("st1", "pm25", ts("2024-01-01 12:00:00"), 99.0, 2L), // in-batch dup (same key+ts) → dropped
      ("st2", "o3", ts("2024-01-01 10:00:00"), 2.0, 3L)
    ).toDF("station_id", "pollutant", "ts", "value", "arrival")
    ProducerLoop.processBatch(b1, keys, "ts", "arrival", sink, cursors)

    val emitted1 = spark.read.parquet(sink).count()
    assert(emitted1 == 2) // dup dropped in-batch
    val cur1 = spark.read.parquet(cursors).collect().map(r => (r.getString(0), r.getString(1)) -> r.getTimestamp(2)).toMap
    assert(cur1(("st1", "pm25")) == ts("2024-01-01 12:00:00"))

    // batch 2: replay of batch-1 record (equal ts) → dropped; newer → kept
    val b2 = Seq(
      ("st1", "pm25", ts("2024-01-01 12:00:00"), 1.0, 4L),
      ("st1", "pm25", ts("2024-01-01 13:00:00"), 5.0, 5L)
    ).toDF("station_id", "pollutant", "ts", "value", "arrival")
    ProducerLoop.processBatch(b2, keys, "ts", "arrival", sink, cursors)

    assert(spark.read.parquet(sink).count() == 3)
    val cur2 = spark.read.parquet(cursors).collect().map(r => (r.getString(0), r.getString(1)) -> r.getTimestamp(2)).toMap
    assert(cur2(("st1", "pm25")) == ts("2024-01-01 13:00:00"))
    assert(cur2(("st2", "o3")) == ts("2024-01-01 10:00:00")) // untouched key survives merge
  }

  test("custom sketch aggregates run in streaming aggregations (hll_distinct)") {
    // the TypedImperativeAggregate state (a byte-array register set)
    // must merge incrementally across micro-batches like any built-in
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = input.toDF().groupBy(col("pollutant")).agg(expr("hll_distinct(station_id)").as("n"))
    val q = agg.writeStream
      .format("memory")
      .queryName("hll_stream")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("hll_ckpt").toString)
      .start()
    try {
      input.addData((1 to 40).map(i => Ev(s"st$i", "pm25", ts("2024-01-01 12:00:00"), 1.0, i)): _*)
      q.processAllAvailable()
      input.addData((21 to 60).map(i => Ev(s"st$i", "pm25", ts("2024-01-01 13:00:00"), 1.0, i)): _*)
      q.processAllAvailable()
      val n = spark.table("hll_stream").select("n").as[Long].collect().head
      // 60 distinct stations seen across both batches; HLL err < 3%
      assert(math.abs(n - 60L) <= 2, s"hll_distinct over stream = $n, want ~60")
    } finally q.stop()
  }

  test("T5 streaming: watermarked tumbling-window rollup over MemoryStream") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = input
      .toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("pollutant"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream
      .format("memory")
      .queryName("t5_out")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("t5_ckpt").toString)
      .start()
    try {
      input.addData(
        Ev("s1", "pm25", ts("2024-01-01 12:10:00"), 1.0, 1),
        Ev("s1", "pm25", ts("2024-01-01 12:50:00"), 2.0, 2),
        Ev("s1", "o3", ts("2024-01-01 13:05:00"), 4.0, 3)
      )
      q.processAllAvailable()
      val rows = spark
        .table("t5_out")
        .select(col("window.start").cast("string"), col("pollutant"), col("n"), col("v"))
        .as[(String, String, Long, Double)]
        .collect()
        .sortBy(r => (r._1, r._2))
        .toSeq
      assert(rows == Seq(
        ("2024-01-01 12:00:00", "pm25", 2L, 3.0),
        ("2024-01-01 13:00:00", "o3", 1L, 4.0)
      ))
    } finally q.stop()
  }

  test("SessionizeStream: sessions close when the watermark passes last+gap") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val src = input.toDF().withWatermark("ts", "0 seconds")
    val out = SessionizeStream.sessions(src, Seq("station_id"), "ts", gapMs = 30 * 60 * 1000)
    val q = out.writeStream
      .format("memory")
      .queryName("sess_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sess_ckpt").toString)
      .start()
    try {
      // batch 1: one session for st1 (two events 10 min apart)
      input.addData(
        Ev("st1", "pm25", ts("2024-01-01 12:00:00"), 1.0, 1),
        Ev("st1", "pm25", ts("2024-01-01 12:10:00"), 2.0, 2)
      )
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // watermark hasn't passed yet
      // batch 2: far-future event advances the watermark past 12:40 → session closes
      input.addData(Ev("st9", "o3", ts("2024-01-02 00:00:00"), 3.0, 3))
      q.processAllAvailable()
      // one more empty-ish batch so the timeout fires with the new watermark
      input.addData(Ev("st9", "o3", ts("2024-01-02 00:00:01"), 4.0, 4))
      q.processAllAvailable()
      val rows = spark
        .table("sess_out")
        .select(col("station_id"), col("session_start").cast("string"), col("session_end").cast("string"), col("n_events"))
        .as[(String, String, String, Long)]
        .collect()
        .toSeq
      assert(rows.contains(("st1", "2024-01-01 12:00:00", "2024-01-01 12:10:00", 2L)), s"got $rows")
    } finally q.stop()
  }

  test("ProducerLoop.start: end-to-end over MemoryStream with AvailableNow-style trigger") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("producer2").toString
    val input = MemoryStream[Ev]
    input.addData(
      Ev("st1", "pm25", ts("2024-01-01 12:00:00"), 1.0, 1),
      Ev("st1", "pm25", ts("2024-01-01 12:30:00"), 2.0, 2)
    )
    val q = ProducerLoop.start(
      input.toDF(),
      Seq("station_id", "pollutant"),
      "ts",
      "arrival",
      s"$dir/sink",
      s"$dir/cursors",
      s"$dir/ckpt",
      Trigger.ProcessingTime("1 second")
    )
    try {
      q.processAllAvailable()
      val n = spark.read.parquet(s"$dir/sink").count()
      assert(n == 2)
      // the sink rows carry the Kafka JSON envelope
      val v = spark.read.parquet(s"$dir/sink").columns.toSeq
      assert(v == Seq("value"))
    } finally q.stop()
  }
}
