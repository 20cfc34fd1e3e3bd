package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.ProducerLoop

/** Runnable end-to-end streaming demo: the reference's producer cycle
  * (SURVEY.md §3.1) over the events table as a file streaming source.
  *
  * Usage: runMain graft.StreamDemo [sfDir]
  * Runs one AvailableNow pass (the reference's one-shot module shape,
  * app/de_measurements.py), prints emitted-row and cursor counts, then
  * runs a SECOND pass over the same input and shows it emits nothing —
  * the per-key watermark makes reprocessing idempotent.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(4)
    val dir = Files.createTempDirectory("stream_demo").toString
    // raw file schema probed batch-side; Tables.withEventTime adapts the
    // ts physical shape (int64-ns or timestamp[us]) inside the stream
    // exactly like Tables.events does for batch
    val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the file streaming source wants a directory: expose the single
    // parquet file through a symlink dir
    val srcDir = Files.createDirectory(java.nio.file.Paths.get(dir, "src"))
    Files.createSymbolicLink(
      srcDir.resolve("events.parquet"),
      java.nio.file.Paths.get(sfDir, "events.parquet")
    )

    def runPass(tag: String): Unit = {
      val src = Tables
        .withEventTime(spark.readStream.schema(rawSchema).parquet(srcDir.toString))
        .drop("ts_ns")
        .withColumn("arrival", col("event_id"))
      val q = ProducerLoop.start(
        src,
        keys = Seq("user_id", "event_type"),
        tsCol = "ts",
        arrivalCol = "arrival",
        sinkDir = s"$dir/sink",
        cursorDir = s"$dir/cursors",
        checkpointDir = s"$dir/ckpt_$tag",
        trigger = Trigger.AvailableNow()
      )
      q.awaitTermination()
      val emitted = spark.read.parquet(s"$dir/sink").count()
      val cursors = spark.read.parquet(s"$dir/cursors").count()
      println(s"[$tag] emitted_total=$emitted cursors=$cursors")
    }

    runPass("pass1")
    runPass("pass2") // same input, fresh checkpoint: watermark must drop everything
    val sample = spark.read.parquet(s"$dir/sink").limit(2).collect().map(_.getString(0))
    sample.foreach(s => println(s"sample=$s"))

    // streaming sessionization over the same real events (30-min gap);
    // AvailableNow drains the file, the final watermark closes sessions
    val src2 = Tables
      .withEventTime(spark.readStream.schema(rawSchema).parquet(srcDir.toString))
      .drop("ts_ns")
      .withWatermark("ts", "0 seconds")
    val sessions = graft.streaming.SessionizeStream
      .sessions(src2, Seq("user_id", "event_type"), "ts", gapMs = 30 * 60 * 1000)
    val sq = sessions.writeStream
      .format("memory")
      .queryName("demo_sessions")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/sess_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
    val emitted = spark.table("demo_sessions").count()
    // same-grain batch ground truth: sessions per (user_id, event_type).
    // The stream emits all CLOSED sessions; sessions whose last event is
    // within `gap` of the final watermark stay open awaiting more data.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("ts_ns"))
    val batchSessions = Tables.events(spark, sfDir)
      .withColumn("prev", lag(col("ts_ns"), 1).over(w))
      .withColumn("is_new", when(col("prev").isNull || col("ts_ns") - col("prev") > 1800000000000L, 1L).otherwise(0L))
      .agg(sum(col("is_new"))).collect()(0).getLong(0)
    println(s"stream_sessions_emitted=$emitted batch_total_sessions=$batchSessions (open sessions at final watermark stay pending)")
    spark.stop()
  }
}
