package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.ops.{Dedup, Rollup, Upsert, WatermarkDedup}

/** The reference's producer cycle (§3.1 of SURVEY.md) as a Structured
  * Streaming job with foreachBatch:
  *
  *   per micro-batch: watermark-filter against the persisted cursor
  *   snapshot (J2) → in-batch first-wins dedup (A3/T4) → EMIT to the sink
  *   → only then GREATEST-merge the cursors forward (A4/T3,
  *   commit-after-emit: reference app/main.py:1342-1347).
  *
  * The sink is a parquet directory carrying the Kafka envelope
  * (`value` = to_json(struct(*)), reference app/main.py:1161-1182); with
  * the Kafka connector on the classpath the same frame writes via
  * `.format("kafka")` unchanged. Cursors persist as a parquet snapshot
  * (the Postgres `ingestion_cursors` table) via read-merge-overwrite.
  *
  * Trigger mirrors T1: ProcessingTime for the continuous loop,
  * AvailableNow for the one-shot modules (reference app/de_measurements.py).
  */
object ProducerLoop {

  /** The exact frame `.format("kafka")` consumes: `key` (stable
    * per-record-key partitioning, so per-key ordering survives the
    * topic) + `value` (full-record JSON envelope, micros timestamps).
    * The connector jar is not on this offline classpath, so the sink
    * writes this frame to parquet — KafkaFrameSpec pins the schema
    * contract so the production swap is `.format("kafka")
    * .option("topic", ...)` and nothing else.
    */
  def kafkaFrame(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(
      to_json(struct(keys.map(col).toIndexedSeq: _*), PerKeyWatermark.keyJsonOpts).as("key"),
      to_json(
        struct(df.columns.map(col).toIndexedSeq: _*),
        Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      ).as("value")
    )

  /** Read the cursor snapshot if it exists, else an empty frame. */
  def readCursors(spark: SparkSession, cursorDir: String, keys: Seq[String]): DataFrame =
    if (Files.exists(Paths.get(cursorDir)) && new java.io.File(cursorDir).list().nonEmpty)
      spark.read.parquet(cursorDir)
    else {
      import org.apache.spark.sql.types._
      val fields = keys.map(StructField(_, StringType)) :+ StructField("last_observed_at", TimestampType)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(fields))
    }

  /** One micro-batch of the producer cycle. Visible for tests. */
  def processBatch(
      batch: DataFrame,
      keys: Seq[String],
      tsCol: String,
      arrivalCol: String,
      sinkDir: String,
      cursorDir: String
  ): Unit = {
    val spark = batch.sparkSession
    val cursors0 = readCursors(spark, cursorDir, keys)
    val cursors = cursors0.select(
      (keys.map(k => col(k).cast("string").as(k)) :+ col("last_observed_at")): _*
    )
    val keyed = batch.select(
      (batch.columns.map(col) ++ keys.map(k => col(k).cast("string").as(s"__k_$k"))).toIndexedSeq: _*
    )
    val kcols = keys.map(k => s"__k_$k")
    val fresh = WatermarkDedup.filterNewWithInBatch(
      keyed,
      cursors.toDF((kcols :+ "last_observed_at"): _*),
      kcols,
      tsCol,
      arrivalCol
    )
    val emitted = fresh.drop(kcols: _*).cache()
    try {
      // 1. EMIT first (Kafka envelope shape; micros timestampFormat so
      // the envelope preserves event-time precision) ...
      emitted
        .select(
          to_json(
            struct(emitted.columns.map(col).toIndexedSeq: _*),
            Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
          ).as("value")
        )
        .write
        .mode(SaveMode.Append)
        .parquet(sinkDir)
      // 2. ... THEN advance cursors (commit-after-emit, T3). A crash
      // between 1 and 2 re-emits the batch next run: at-least-once with
      // downstream dedup, exactly the reference's contract.
      val updates = Rollup
        .maxTsPerKey(
          fresh.select((kcols.map(col) :+ col(tsCol)).toIndexedSeq: _*),
          kcols,
          tsCol
        )
        .toDF((keys :+ "last_observed_at"): _*)
      val merged = Upsert.greatestMerge(cursors, updates, keys, "last_observed_at")
      val tmp = cursorDir + "__tmp"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      val spark2 = merged.sparkSession
      spark2.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(cursorDir)
    } finally emitted.unpersist()
  }

  /** Launch the continuous producer over a streaming source. */
  def start(
      source: DataFrame,
      keys: Seq[String],
      tsCol: String,
      arrivalCol: String,
      sinkDir: String,
      cursorDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("300 seconds")
  ): StreamingQuery = {
    val writer: DataStreamWriter[Row] = source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per-source fault isolation (T6) lives at the job level: a batch
        // failure fails this query, not sibling per-country queries.
        processBatch(batch, keys, tsCol, arrivalCol, sinkDir, cursorDir)
      }
    writer.start()
  }
}
