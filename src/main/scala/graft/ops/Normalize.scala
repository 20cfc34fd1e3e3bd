package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.Schemas

/** Record normalization (SURVEY.md §2.2 P1-P8, §2.8 F7/F8/F13).
  *
  * The reference normalizes three unstable upstream schemas into one flat
  * measurement record with fallback chains, null-on-error numeric
  * coercion, lower-cased enum values, an allowlist filter, and three
  * timestamp normalization paths. All of that is column-level expression
  * composition here — fully codegen'd, no UDFs.
  */
object Normalize {

  /** F7: lenient multi-format timestamp parse (reference
    * app/main.py:166-181). Accepts, in priority order:
    *   ISO-8601 with offset or 'Z' (app/main.py:175-176),
    *   ISO-8601 'T'-separated naive,
    *   space-separated 'yyyy-MM-dd HH:mm:ss' (PL format,
    *     app/main.py:1134).
    * Naive inputs are interpreted in `naiveZone` then converted to UTC
    * (the reference's localize-then-convert path, app/main.py:184-206).
    * Unparseable → null (fail-open callers decide what to do).
    *
    * Expression tree of built-in `to_timestamp`/`coalesce` — ANSI off
    * makes each failed format yield null instead of raising.
    *
    * REQUIRES a UTC session timezone (graft.Sessions sets it; Tables
    * hardens foreign sessions): `to_timestamp` parses naive strings in
    * the SESSION zone, so a non-UTC session would double-shift the
    * naive paths.
    */
  def lenientTimestamp(c: Column, naiveZone: String = "UTC"): Column = {
    val iso = to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ssXXX")
    val isoMicros = to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    val naiveT = to_utc_timestamp(to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss"), naiveZone)
    val naiveSpace = to_utc_timestamp(to_timestamp(c, "yyyy-MM-dd HH:mm:ss"), naiveZone)
    coalesce(iso, isoMicros, naiveT, naiveSpace)
  }

  /** P3: numeric coercion with null on error (`float(str(x))` else null,
    * reference app/main.py:395-399). ANSI-off cast gives exactly this.
    */
  def toDoubleOrNull(c: Column): Column = c.cast("string").cast("double")

  /** P1: raw API shape → 11-field measurement record. Expects raw columns
    * (possibly null / string-typed): station_id, pollutant, value, city,
    * location_name, lat, lon, ts_raw, plus constants per source. Applies:
    *  - fallback chains via coalesce (F13),
    *  - pollutant lower-case normalization + pm2.5→pm25 rewrite + allowlist
    *    (P6, reference app/main.py:1045-1052),
    *  - null-value drop (P5), null-island drop is station-side (P4),
    *  - lenient UTC timestamp normalization (F7/F8).
    */
  def toMeasurements(raw: DataFrame, source: String, country: String, naiveZone: String): DataFrame =
    raw
      .select(
        col("station_id").cast("string").as("station_id"),
        regexp_replace(lower(trim(col("pollutant"))), "pm2\\.5", "pm25").as("pollutant"),
        toDoubleOrNull(col("value")).as("value"),
        lit("ug/m3").as("unit"),
        lit(country).as("country"),
        col("city").cast("string").as("city"),
        coalesce(col("location_name"), col("city")).cast("string").as("location_name"),
        toDoubleOrNull(col("lat")).as("lat"),
        toDoubleOrNull(col("lon")).as("lon"),
        lenientTimestamp(col("ts_raw"), naiveZone).as("timestamp"),
        lit(source).as("source")
      )
      .filter(col("value").isNotNull)
      .filter(col("pollutant").isin(Schemas.pollutants: _*))
      .filter(col("timestamp").isNotNull)

  /** P4: drop stations without coordinates (reference app/main.py:400-401). */
  def dropNullIsland(stations: DataFrame): DataFrame =
    stations.filter(col("lat").isNotNull && col("lon").isNotNull)

  /** P7: PL "automatic stations only" predicate (reference
    * app/main.py:592-595).
    */
  def onlyAutomatic(stations: DataFrame): DataFrame =
    stations.filter(lower(col("station_type")).contains("automat"))

  /** S4 payload decode: the DE measures endpoint keys POSITIONAL arrays
    * `[component_id, scope, value, next_ts, valid_flag]` by a local
    * timestamp string (reference app/main.py:747-783). Reference
    * semantics as codegen'd column algebra, one output row per
    * surviving payload:
    *  - arrays shorter than 3 are dropped (the malformed-payload guard,
    *    app/main.py:749-750);
    *  - `value` is null-on-error coerced, null values dropped
    *    (app/main.py:751-753 + the P3 coercion);
    *  - component id → pollutant via the fixed comp_map {1→pm10,
    *    2→pm25, 5→no2, 7→o3}; unknown ids FALL THROUGH as themselves
    *    (comp_map.get default, app/main.py:761-767); unit is the
    *    constant ug/m3;
    *  - the key string is Berlin-naive → UTC via the F7/F8 lenient
    *    chain (app/main.py:754-760);
    *  - `valid_flag` reads position 5 — null when the payload is the
    *    short-but-valid 3/4-element shape (ANSI-off element_at).
    * Non-payload input columns pass through; `payloadCol`/`tsCol` are
    * consumed.
    *
    * Two INTENTIONAL deviations from the reference (both stricter —
    * this is a curation engine, not a re-poller):
    *  - non-numeric `value` strings are DROPPED by the P3 coercion;
    *    the reference keeps any non-None payload[2] verbatim
    *    (app/main.py:751-753), admitting strings into a numeric
    *    column. A caller wanting reference behavior keeps the raw
    *    payload column alongside.
    *  - an unparseable key timestamp yields a null `ts_utc` (and the
    *    row survives with null time); the reference substitutes
    *    fetch-time `now` (app/main.py:756-760), which is
    *    non-reproducible — a rerun would stamp different times.
    */
  def decodeDePayload(
      df: DataFrame,
      payloadCol: String = "payload",
      tsCol: String = "ts_str"
  ): DataFrame = {
    val p = col(payloadCol)
    val comp = element_at(p, 1)
    df.filter(size(p) >= 3)
      .withColumn(
        "pollutant",
        when(comp === "1", lit("pm10"))
          .when(comp === "2", lit("pm25"))
          .when(comp === "5", lit("no2"))
          .when(comp === "7", lit("o3"))
          .otherwise(comp)
      )
      .withColumn("scope", element_at(p, 2))
      .withColumn("value", toDoubleOrNull(element_at(p, 3)))
      .withColumn("unit", lit("ug/m3"))
      .withColumn("ts_utc", lenientTimestamp(col(tsCol), naiveZone = "Europe/Berlin"))
      .withColumn("valid_flag", element_at(p, 5))
      .withColumn("source", lit("de"))
      .filter(col("value").isNotNull)
      .drop(payloadCol, tsCol)
  }
}
