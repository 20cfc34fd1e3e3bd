package graft.schema

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Fixed schemas for the reference's four logical datasets (SURVEY.md §1.1).
  *
  * The reference keeps these as implicit dict conventions; here they are
  * explicit StructTypes + case classes. Timestamps are TimestampType with
  * UTC session TZ — replacing the reference's three hand-rolled timezone
  * normalization paths (reference app/main.py:129-134, 166-206).
  */
object Schemas {

  /** The central fact record (reference app/main.py:769-783 and peers). */
  case class Measurement(
      station_id: String,
      pollutant: String,
      value: Option[Double],
      unit: String,
      country: String,
      city: Option[String],
      location_name: Option[String],
      lat: Option[Double],
      lon: Option[Double],
      timestamp: Timestamp,
      source: String
  )

  val measurementSchema: StructType = StructType(
    Seq(
      StructField("station_id", StringType),
      StructField("pollutant", StringType),
      StructField("value", DoubleType),
      StructField("unit", StringType),
      StructField("country", StringType),
      StructField("city", StringType),
      StructField("location_name", StringType),
      StructField("lat", DoubleType),
      StructField("lon", DoubleType),
      StructField("timestamp", TimestampType),
      StructField("source", StringType)
    )
  )

  /** The station catalog dimension (reference app/main.py:65-69, 636-645). */
  case class Station(
      station_id: String,
      source: String,
      country: String,
      city: Option[String],
      location_name: Option[String],
      lat: Option[Double],
      lon: Option[Double],
      station_type: Option[String]
  )

  val stationSchema: StructType = StructType(
    Seq(
      StructField("station_id", StringType),
      StructField("source", StringType),
      StructField("country", StringType),
      StructField("city", StringType),
      StructField("location_name", StringType),
      StructField("lat", DoubleType),
      StructField("lon", DoubleType),
      StructField("station_type", StringType)
    )
  )

  /** Per-key watermark state (reference app/main.py:110-117). */
  case class Cursor(
      source: String,
      station_id: String,
      pollutant: String,
      last_observed_at: Timestamp
  )

  val cursorSchema: StructType = StructType(
    Seq(
      StructField("source", StringType),
      StructField("station_id", StringType),
      StructField("pollutant", StringType),
      StructField("last_observed_at", TimestampType)
    )
  )

  /** The pollutant allowlist (reference app/main.py:1051). */
  val pollutants: Seq[String] = Seq("pm25", "pm10", "no2", "o3", "nox", "no", "co", "so2")
}
