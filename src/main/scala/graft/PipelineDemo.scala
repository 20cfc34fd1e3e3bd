package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.ops.{Enrich, Normalize}
import graft.streaming.ProducerLoop

/** The complete reference pipeline (SURVEY.md §3.1) end-to-end, every
  * stage on this engine's operators:
  *
  *   catalog phase: DSv2 paged source → P2/P4 normalize → A5 upsert
  *     into the stations snapshot;
  *   cycle: raw feed → P1/F7 measurement normalization → J1 broadcast
  *     catalog enrichment → J2 watermark filter → A3 in-batch dedup →
  *     S11 Kafka-envelope emit → A4 cursor GREATEST-merge (after emit).
  *
  * Runs the cycle twice on the same feed: cycle 2 must emit nothing
  * (per-key watermark idempotence — the reference's incremental
  * contract). Usage: runMain graft.PipelineDemo [sfDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cfg = PipelineConfig.fromEnv(sys.env)
    println(s"config=$cfg")
    val spark = Sessions.local(4)
    val work = Files.createTempDirectory("pipeline").toString

    // --- catalog phase (S1-S3 → P2/P4 → A5)
    val pages = Files.createDirectory(Paths.get(work, "pages"))
    Files.writeString(
      pages.resolve("page-0001.jsonl"),
      (0 until 50)
        .map(i => s"""{"station_id":"ST$i","source":"de","city":"c$i","lat":${50 + i * 0.01},"lon":${13 + i * 0.01}}""")
        .mkString("", "\n", "\n")
    )
    Files.writeString(
      pages.resolve("page-0002.jsonl"),
      (50 until 100)
        .map(i => s"""{"station_id":"ST$i","source":"gios","city":null,"lat":${50 + i * 0.01},"lon":${19 + i * 0.01}}""")
        .mkString("", "\n", "\n")
    )
    val rawCatalog = spark.read
      .format("graft.source.PagedJsonSource")
      .schema(graft.source.PagedJsonSource.defaultSchema)
      .option("path", pages.toString)
      .load()
    val catalogDir = s"$work/stations"
    val nStations = jobs.Jobs.catalogRefresh(spark, rawCatalog, catalogDir)
    println(s"catalog_stations=$nStations")

    // --- measurement cycle (P1/F7 → J1 → J2 → A3 → emit → A4)
    def cycle(tag: String): Unit = {
      val raw = Tables
        .events(spark, sfDir)
        .select(
          col("event_id"),
          concat(lit("ST"), (col("user_id") % 100).cast("string")).as("station_id"),
          lit("pm25").as("pollutant"),
          col("value").cast("string").as("value"),
          lit(null).cast("string").as("city"),
          lit(null).cast("string").as("location_name"),
          lit(null).cast("string").as("lat"),
          lit(null).cast("string").as("lon"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_raw")
        )
      val measurements = Normalize.toMeasurements(raw.drop("event_id"), "de", "DE", "UTC")
        .withColumn("arrival", monotonically_increasing_id())
      val catalog = spark.read.parquet(catalogDir)
        .select(col("station_id"), col("city").as("cat_city"), col("lat").as("cat_lat"), col("lon").as("cat_lon"))
      val enriched = Enrich
        .leftEnrich(measurements, catalog, "station_id")
        .withColumn("city", coalesce(col("city"), col("cat_city")))
        .withColumn("lat", coalesce(col("lat"), col("cat_lat")))
        .withColumn("lon", coalesce(col("lon"), col("cat_lon")))
        .drop("cat_city", "cat_lat", "cat_lon")
      ProducerLoop.processBatch(
        enriched,
        keys = Seq("station_id", "pollutant"),
        tsCol = "timestamp",
        arrivalCol = "arrival",
        sinkDir = s"$work/sink",
        cursorDir = s"$work/cursors"
      )
      val emitted = spark.read.parquet(s"$work/sink").count()
      val cursors = spark.read.parquet(s"$work/cursors").count()
      println(s"[$tag] emitted_total=$emitted cursors=$cursors")
    }
    cycle("cycle1")
    cycle("cycle2") // same feed: watermark must drop everything
    val sample = spark.read.parquet(s"$work/sink").limit(1).collect()(0).getString(0)
    println(s"sample=$sample")

    // downstream-consumer leg: parse the Kafka envelope back into the
    // curated table (S11 → measurements_curated) and run the retention
    // job with the configured window, cutoff pinned to the fixture's
    // data era so the demo stays deterministic
    val curatedDir = s"$work/curated"
    val curSchema = graft.schema.Schemas.measurementSchema
    spark.read
      .parquet(s"$work/sink")
      .select(from_json(col("value"), curSchema).as("m"))
      .select(col("m.*"))
      .write
      .parquet(curatedDir)
    val cutoff = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val kept = jobs.Jobs.housekeeping(spark, curatedDir, "timestamp", cutoff)
    println(s"retention_days=${cfg.retentionDays} curated_kept=$kept")
    spark.stop()
  }
}
