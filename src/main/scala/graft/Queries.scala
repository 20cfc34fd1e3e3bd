package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** The operator-inventory query registry (SURVEY.md §2 → SparkEntry).
  *
  * Conventions:
  *  - every query takes (spark, sfDir) and reads only Tables.* parquet;
  *  - aliases in the Spark plan and the oracle SQL are identical;
  *  - doubles aggregated via decimal(38,6) for order-independence;
  *  - stable trailing ORDER BY on a unique key.
  */
object Queries {

  /** Decimal-accumulated, order-independent sum of a double column,
    * returned as double. Bit-identical between Spark and DuckDB because the
    * accumulation is exact and only the final value is a float operation.
    */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,6)")).cast("double")

  // ---------------------------------------------------------------- q1
  /** A1/A2-family pricing-summary aggregate (TPC-H Q1 shape) on lineitem:
    * grouped hash aggregate with partial+final split (SURVEY §2.4).
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  /** P4/P5/P6: filter battery — null guards + allowlist + range predicate,
    * all pushed to the parquet scan (SURVEY §2.2).
    */
  def q2Filter(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .filter(col("l_quantity").isNotNull && col("l_discount").isNotNull)
      .filter(col("l_returnflag").isin("A", "R"))
      .filter(col("l_quantity") > 45.0)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_returnflag"),
        col("l_quantity")
      )
      // (l_orderkey, l_linenumber) is NOT unique in the generated data —
      // order by every output column so any ties are between identical rows.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))

  val q2Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
      |FROM lineitem
      |WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
      |  AND l_returnflag IN ('A','R') AND l_quantity > 45.0
      |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""".stripMargin

  // ---------------------------------------------------------------- q3
  /** J1: broadcast dimension enrichment — customer⋈nation⋈region with both
    * dims broadcast (the reference's memoized station-meta lookup,
    * app/main.py:651-695, is exactly a broadcast hash join build side).
    */
  def q3Enrich(s: SparkSession, dir: String): DataFrame =
    Enrich
      .customerGeo(Tables.customer(s, dir), Tables.nation(s, dir), Tables.region(s, dir))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("sum_acctbal")
      )
      .orderBy(col("r_name"), col("n_name"))

  val q3Oracle: String =
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q4
  /** J2: batch watermark anti-join. A cursor snapshot (max ts per key over
    * the first half of the stream by event_id) filters the second half:
    * keep iff no cursor for the key OR ts strictly newer (reference
    * app/main.py:209-237; strict `>` at :234, missing-key fail-open).
    */
  def q4Watermark(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val half = ev.filter(col("event_id") < 5000L)
    val cursors = Rollup.maxTsPerKey(half, Seq("user_id", "event_type"), "ts_ns")
    val incoming = ev.filter(col("event_id") >= 5000L)
    WatermarkDedup
      .filterNew(incoming, cursors, Seq("user_id", "event_type"), "ts_ns")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  val q4Oracle: String =
    """SELECT e.event_id, e.user_id, e.event_type, e.value
      |FROM events e
      |LEFT JOIN (
      |  SELECT user_id, event_type, MAX(ts) AS last_observed_at
      |  FROM events WHERE event_id < 5000 GROUP BY user_id, event_type
      |) c ON e.user_id = c.user_id AND e.event_type = c.event_type
      |WHERE e.event_id >= 5000
      |  AND (c.last_observed_at IS NULL OR e.ts > c.last_observed_at)
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q5
  /** A3: deterministic first-wins exact dedup on the natural key
    * (reference app/main.py:1194-1203 keeps first in union order; here the
    * priority is event_id, the ingestion order).
    */
  def q5Dedup(s: SparkSession, dir: String): DataFrame =
    Dedup
      .firstWins(Tables.events(s, dir), Seq("user_id", "event_type", "ts_ns"), Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  val q5Oracle: String =
    """SELECT event_id, user_id, event_type, value FROM (
      |  SELECT event_id, user_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type, ts ORDER BY event_id) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q6
  /** §2.5: latest value per key (ranking window, desc). */
  def q6Latest(s: SparkSession, dir: String): DataFrame =
    Rollup
      .latestPerKey(Tables.events(s, dir), Seq("user_id", "event_type"), "ts_ns", "event_id")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"), col("event_type"))

  val q6Oracle: String =
    """SELECT event_id, user_id, event_type, value FROM (
      |  SELECT event_id, user_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- q7
  /** T5: hourly tumbling rollup on event time. Hour emitted as a formatted
    * string (ns-precision parquet reads at different precisions in Spark vs
    * DuckDB; strings are precision-neutral).
    */
  def q7Hourly(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type")
      )
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value")
      )
      .orderBy(col("hour"), col("event_type"))

  val q7Oracle: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST("value" AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------- q8
  /** U1/U2: schema-reconciling union of three "source" slices; one slice
    * is missing a column (the PL catalog's extra station_type shape,
    * SURVEY §2.7) and gets nulls.
    */
  def q8Union(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val a = c.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), lit("a").as("src"))
    val b = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), lit("b").as("src"))
    val m = c.filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey"), col("c_name"), lit("m").as("src"))
    Unions.unionLoose(Seq(a, b, m)).orderBy(col("c_custkey"), col("src"))
  }

  val q8Oracle: String =
    """SELECT c_custkey, c_name, c_acctbal, 'a' AS src FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |UNION ALL
      |SELECT c_custkey, c_name, c_acctbal, 'b' AS src FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION ALL
      |SELECT c_custkey, c_name, NULL AS c_acctbal, 'm' AS src FROM customer WHERE c_mktsegment = 'MACHINERY'
      |ORDER BY c_custkey, src""".stripMargin

  // ---------------------------------------------------------------- q9
  /** L1: top-k — Spark plans TakeOrderedAndProject (no global sort of the
    * full table; per-partition top-k then merge on the driver side of the
    * exchange — the scalable form at 100 TB).
    */
  def q9Topk(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_quantity"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .limit(100)

  val q9Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_quantity
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q10
  /** A5: COALESCE-upsert — catalog merge where a new non-null value wins
    * and null update columns keep the old value (reference
    * app/main.py:636-645). Simulated with two customer snapshots.
    */
  def q10Upsert(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val base = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    val updates = c.filter(col("c_custkey") % 3 === 0)
      .select(
        col("c_custkey"),
        col("c_name"),
        (col("c_acctbal") + 100.0).as("c_acctbal"),
        lit(null).cast("string").as("c_mktsegment")
      )
    Upsert.coalesceMerge(base, updates, "c_custkey").orderBy(col("c_custkey"))
  }

  val q10Oracle: String =
    """WITH base AS (
      |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 2 = 0
      |), upd AS (
      |  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal,
      |         CAST(NULL AS VARCHAR) AS c_mktsegment
      |  FROM customer WHERE c_custkey % 3 = 0
      |)
      |SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
      |       COALESCE(u.c_name, b.c_name) AS c_name,
      |       COALESCE(u.c_acctbal, b.c_acctbal) AS c_acctbal,
      |       COALESCE(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment
      |FROM upd u FULL OUTER JOIN base b ON u.c_custkey = b.c_custkey
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q11
  /** A4/A6: GREATEST-merge of two cursor snapshots — the watermark only
    * advances (reference app/main.py:257-270). Timestamps emitted at
    * microsecond precision strings (ns table, see Tables.events).
    */
  def q11Greatest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val oldCur = Rollup.maxTsPerKey(ev.filter(col("event_id") < 5000L), Seq("user_id", "event_type"), "ts_ns")
    val newCur = Rollup.maxTsPerKey(ev.filter(col("event_id") >= 5000L), Seq("user_id", "event_type"), "ts_ns")
    Upsert
      .greatestMerge(oldCur, newCur, Seq("user_id", "event_type"), "last_observed_at")
      .select(
        col("user_id"),
        col("event_type"),
        date_format(
          timestamp_micros(expr("last_observed_at div 1000")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).as("last_observed")
      )
      .orderBy(col("user_id"), col("event_type"))
  }

  val q11Oracle: String =
    """WITH oldc AS (
      |  SELECT user_id, event_type, MAX(ts) AS t FROM events WHERE event_id < 5000 GROUP BY 1,2
      |), newc AS (
      |  SELECT user_id, event_type, MAX(ts) AS t FROM events WHERE event_id >= 5000 GROUP BY 1,2
      |)
      |SELECT COALESCE(n.user_id, o.user_id) AS user_id,
      |       COALESCE(n.event_type, o.event_type) AS event_type,
      |       strftime(COALESCE(GREATEST(n.t, o.t), n.t, o.t), '%Y-%m-%d %H:%M:%S.%f') AS last_observed
      |FROM newc n FULL OUTER JOIN oldc o
      |  ON n.user_id = o.user_id AND n.event_type = o.event_type
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- q12
  /** F15/F16: JSON field access on the events.props payload (the
    * reference's nested-JSON path reads, app/main.py:529-531, 812-817).
    */
  def q12Json(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k")
      )
      .filter(col("k").isNotNull)
      .orderBy(col("event_id"))

  val q12Oracle: String =
    """SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events
      |WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q13
  /** S7-analogue: the one nested→flat generator (explode) — word counts
    * over exploded document tokens.
    */
  def q13Explode(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(50)

  val q13Oracle: String =
    """SELECT word, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word
      |ORDER BY n DESC, word
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q14
  /** F7-F10: timestamp battery — calendar truncation, field extraction,
    * epoch seconds (exact, from the ns long), interval arithmetic.
    */
  def q14Timestamps(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .select(
        col("event_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        hour(col("ts")).cast("long").as("hour_of_day"),
        expr("ts_ns div 1000000000").as("epoch_s"),
        date_format(col("ts") + expr("INTERVAL 6 HOURS"), "yyyy-MM-dd HH:mm:ss").as("plus6h")
      )
      .orderBy(col("event_id"))

  val q14Oracle: String =
    """SELECT event_id,
      |  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |  CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
      |  epoch_ns(ts) // 1000000000 AS epoch_s,
      |  strftime(ts + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M:%S') AS plus6h
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q15
  /** F1-F6, F11, F17: scalar string battery (lower/upper/trim/substring/
    * regexp_replace/contains/split/length/concat/round).
    */
  def q15Strings(s: SparkSession, dir: String): DataFrame =
    Tables
      .part(s, dir)
      .select(
        col("p_partkey"),
        col("p_name"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        col("p_type").contains("STANDARD").as("is_standard"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"),
        round(col("p_retailprice") * 1.1, 2).as("inflated")
      )
      .orderBy(col("p_partkey"), col("p_name"))

  val q15Oracle: String =
    """SELECT p_partkey, p_name,
      |  lower(p_name) AS lname,
      |  upper(p_brand) AS ubrand,
      |  substring(p_name, 1, 5) AS prefix5,
      |  regexp_replace(p_name, ' ', '_', 'g') AS snake,
      |  contains(p_type, 'STANDARD') AS is_standard,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  p_brand || ':' || p_type AS brand_type,
      |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
      |  round(p_retailprice * 1.1, 2) AS inflated
      |FROM part
      |ORDER BY p_partkey, p_name""".stripMargin

  // ---------------------------------------------------------------- q16
  /** J1 (fact side): lineitem ⋈ part ⋈ supplier, both dims broadcast;
    * revenue rollup by brand.
    */
  def q16JoinParts(s: SparkSession, dir: String): DataFrame =
    Enrich
      .lineitemParts(Tables.lineitem(s, dir), Tables.part(s, dir), Tables.supplier(s, dir))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue")
      )
      .orderBy(col("p_brand"))

  val q16Oracle: String =
    """SELECT p_brand, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q17
  /** A2: count by source/group (reference app/main.py:1205-1209). */
  def q17CountBy(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("source"), col("lang"))

  val q17Oracle: String =
    """SELECT source, lang, COUNT(*) AS n
      |FROM documents
      |GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin

  // ---------------------------------------------------------------- q18
  /** F7: lenient multi-format timestamp parsing round-trip. Raw strings in
    * three formats (ISO-'Z', ISO-naive, space-separated — the reference's
    * three inbound shapes, app/main.py:166-181, 1134) plus unparseable
    * garbage, pushed through Normalize.lenientTimestamp.
    */
  def q18ParseTs(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables
      .events(s, dir)
      .select(
        col("event_id"),
        when(col("event_id") % 97 === 0, lit("not-a-date"))
          .when(col("event_id") % 3 === 0, concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit("Z")))
          .when(col("event_id") % 3 === 1, date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
          .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
          .as("ts_raw")
      )
    raw
      .select(
        col("event_id"),
        date_format(Normalize.lenientTimestamp(col("ts_raw")), "yyyy-MM-dd HH:mm:ss").as("parsed")
      )
      .orderBy(col("event_id"))
  }

  val q18Oracle: String =
    """WITH raw AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 97 = 0 THEN 'not-a-date'
      |         WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z'
      |         WHEN event_id % 3 = 1 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
      |         ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS ts_raw
      |  FROM events
      |)
      |SELECT event_id,
      |  strftime(COALESCE(
      |    TRY_STRPTIME(ts_raw, '%Y-%m-%dT%H:%M:%SZ'),
      |    TRY_STRPTIME(ts_raw, '%Y-%m-%dT%H:%M:%S'),
      |    TRY_STRPTIME(ts_raw, '%Y-%m-%d %H:%M:%S')), '%Y-%m-%d %H:%M:%S') AS parsed
      |FROM raw
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q19
  /** P1/P3/P5/P6/F13: the full measurement normalization pipeline — raw
    * string-typed rows with fallback chains, invalid numerics, a
    * disallowed pollutant, and mixed-format timestamps, normalized via
    * Normalize.toMeasurements (the reference's record builders,
    * app/main.py:769-783/902-916/1139-1153).
    */
  def q19Normalize(s: SparkSession, dir: String): DataFrame = {
    val pollByMod = when(col("event_id") % 13 === 0, lit(" PM2.5 "))
      .when(col("event_id") % 9 === 0, lit("pm25"))
      .when(col("event_id") % 9 === 1, lit("pm10"))
      .when(col("event_id") % 9 === 2, lit("NO2"))
      .when(col("event_id") % 9 === 3, lit("o3"))
      .when(col("event_id") % 9 === 4, lit("nox"))
      .when(col("event_id") % 9 === 5, lit("no"))
      .when(col("event_id") % 9 === 6, lit("co"))
      .when(col("event_id") % 9 === 7, lit("so2"))
      .otherwise(lit("benzene"))
    val raw = Tables
      .events(s, dir)
      .select(
        col("event_id"),
        concat(lit("ST"), (col("user_id") % 100).cast("string")).as("station_id"),
        pollByMod.as("pollutant"),
        when(col("event_id") % 50 === 0, lit("N/A"))
          .otherwise(col("value").cast("string"))
          .as("value"),
        when(col("user_id") % 10 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("city_"), (col("user_id") % 10).cast("string")))
          .as("city"),
        when(col("user_id") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("loc_"), col("user_id").cast("string")))
          .as("location_name"),
        when(col("event_id") % 41 === 0, lit("bad"))
          .otherwise((lit(50.0) + (col("user_id") % 100).cast("double") * 0.01).cast("string"))
          .as("lat"),
        (lit(19.0) + (col("user_id") % 100).cast("double") * 0.01).cast("string").as("lon"),
        when(col("event_id") % 3 === 0, concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit("Z")))
          .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
          .as("ts_raw")
      )
    Normalize
      .toMeasurements(raw, source = "de", country = "DE", naiveZone = "UTC")
      .select(
        col("station_id"),
        col("pollutant"),
        col("value"),
        col("unit"),
        col("country"),
        col("city"),
        col("location_name"),
        col("lat"),
        col("lon"),
        date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("source")
      )
      .orderBy(col("station_id"), col("pollutant"), col("ts"), col("value"), col("location_name"))
  }

  val q19Oracle: String =
    """WITH raw AS (
      |  SELECT event_id,
      |    'ST' || CAST(user_id % 100 AS VARCHAR) AS station_id,
      |    CASE WHEN event_id % 13 = 0 THEN ' PM2.5 '
      |         WHEN event_id % 9 = 0 THEN 'pm25'
      |         WHEN event_id % 9 = 1 THEN 'pm10'
      |         WHEN event_id % 9 = 2 THEN 'NO2'
      |         WHEN event_id % 9 = 3 THEN 'o3'
      |         WHEN event_id % 9 = 4 THEN 'nox'
      |         WHEN event_id % 9 = 5 THEN 'no'
      |         WHEN event_id % 9 = 6 THEN 'co'
      |         WHEN event_id % 9 = 7 THEN 'so2'
      |         ELSE 'benzene' END AS pollutant,
      |    CASE WHEN event_id % 50 = 0 THEN 'N/A' ELSE CAST("value" AS VARCHAR) END AS val_raw,
      |    CASE WHEN user_id % 10 = 0 THEN NULL ELSE 'city_' || CAST(user_id % 10 AS VARCHAR) END AS city,
      |    CASE WHEN user_id % 5 = 0 THEN NULL ELSE 'loc_' || CAST(user_id AS VARCHAR) END AS location_name,
      |    CASE WHEN event_id % 41 = 0 THEN 'bad'
      |         ELSE CAST(50.0 + CAST(user_id % 100 AS DOUBLE) * 0.01 AS VARCHAR) END AS lat_raw,
      |    CAST(19.0 + CAST(user_id % 100 AS DOUBLE) * 0.01 AS VARCHAR) AS lon_raw,
      |    CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z'
      |         ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS ts_raw
      |  FROM events
      |)
      |SELECT station_id,
      |  regexp_replace(lower(trim(pollutant)), 'pm2\.5', 'pm25') AS pollutant,
      |  TRY_CAST(val_raw AS DOUBLE) AS "value",
      |  'ug/m3' AS unit,
      |  'DE' AS country,
      |  city,
      |  COALESCE(location_name, city) AS location_name,
      |  TRY_CAST(lat_raw AS DOUBLE) AS lat,
      |  TRY_CAST(lon_raw AS DOUBLE) AS lon,
      |  strftime(COALESCE(
      |    TRY_STRPTIME(ts_raw, '%Y-%m-%dT%H:%M:%SZ'),
      |    TRY_STRPTIME(ts_raw, '%Y-%m-%dT%H:%M:%S'),
      |    TRY_STRPTIME(ts_raw, '%Y-%m-%d %H:%M:%S')), '%Y-%m-%d %H:%M:%S') AS ts,
      |  'de' AS source
      |FROM raw
      |WHERE TRY_CAST(val_raw AS DOUBLE) IS NOT NULL
      |  AND regexp_replace(lower(trim(pollutant)), 'pm2\.5', 'pm25') IN
      |      ('pm25','pm10','no2','o3','nox','no','co','so2')
      |ORDER BY station_id, pollutant, ts, "value", location_name""".stripMargin

  // ---------------------------------------------------------------- q20
  /** P2/P4/P7: station-catalog normalization — coordinate null-island drop
    * and the PL automatic-stations-only predicate (reference
    * app/main.py:400-401, 592-595).
    */
  def q20Stations(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables
      .supplier(s, dir)
      .select(
        concat(lit("S"), col("s_suppkey").cast("string")).as("station_id"),
        when(col("s_suppkey") % 7 === 0, lit(null).cast("double"))
          .otherwise(lit(50.0) + (col("s_suppkey") % 90).cast("double"))
          .as("lat"),
        (lit(19.0) + (col("s_suppkey") % 90).cast("double")).as("lon"),
        when(col("s_suppkey") % 3 === 0, lit("Automatyczna"))
          .when(col("s_suppkey") % 3 === 1, lit("automatic"))
          .otherwise(lit("manual"))
          .as("station_type")
      )
    Normalize
      .onlyAutomatic(Normalize.dropNullIsland(raw))
      .orderBy(col("station_id"))
  }

  val q20Oracle: String =
    """WITH raw AS (
      |  SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS station_id,
      |    CASE WHEN s_suppkey % 7 = 0 THEN NULL
      |         ELSE 50.0 + CAST(s_suppkey % 90 AS DOUBLE) END AS lat,
      |    19.0 + CAST(s_suppkey % 90 AS DOUBLE) AS lon,
      |    CASE WHEN s_suppkey % 3 = 0 THEN 'Automatyczna'
      |         WHEN s_suppkey % 3 = 1 THEN 'automatic'
      |         ELSE 'manual' END AS station_type
      |  FROM supplier
      |)
      |SELECT station_id, lat, lon, station_type
      |FROM raw
      |WHERE lat IS NOT NULL AND lon IS NOT NULL
      |  AND contains(lower(station_type), 'automat')
      |ORDER BY station_id""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Text quality scoring: per-doc token/uniqueness/stopword features and
    * the composite score (training-data pipeline extension).
    */
  def q21TextQuality(s: SparkSession, dir: String): DataFrame =
    TextStats
      .withQuality(Tables.documents(s, dir), "text")
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_uniq"),
        col("stop_count"),
        col("uniq_ratio"),
        col("stop_ratio"),
        col("mean_token_len"),
        col("quality_score")
      )
      .orderBy(col("doc_id"))

  val q21Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), f AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
      |    CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS BIGINT) AS stop_count,
      |    CAST(list_aggregate(list_transform(toks, x -> CAST(length(x) AS BIGINT)), 'sum') AS BIGINT) AS sum_len
      |  FROM t
      |)
      |SELECT doc_id, n_tokens, n_uniq, stop_count,
      |  CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS uniq_ratio,
      |  CAST(stop_count AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
      |  CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_token_len,
      |  0.4 * (CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE)) +
      |  0.3 * (1.0 - CAST(stop_count AS DOUBLE) / CAST(n_tokens AS DOUBLE)) +
      |  0.3 * least(CAST(n_tokens AS DOUBLE) / 200.0, 1.0) AS quality_score
      |FROM f
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Language-ID heuristic: marker-token counts with fixed-precedence
    * argmax (training-data pipeline extension).
    */
  def q22LangId(s: SparkSession, dir: String): DataFrame =
    TextStats
      .withLangId(Tables.documents(s, dir), "text")
      .select(col("doc_id"), col("cnt_en"), col("cnt_es"), col("cnt_de"), col("lang_pred"))
      .orderBy(col("doc_id"))

  val q22Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), c AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is'], x))) AS BIGINT) AS cnt_en,
      |    CAST(len(list_filter(toks, x -> list_contains(['el','la','de','que','y'], x))) AS BIGINT) AS cnt_es,
      |    CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))) AS BIGINT) AS cnt_de
      |  FROM t
      |)
      |SELECT doc_id, cnt_en, cnt_es, cnt_de,
      |  CASE WHEN cnt_en >= cnt_es AND cnt_en >= cnt_de AND cnt_en > 0 THEN 'en'
      |       WHEN cnt_es >= cnt_de AND cnt_es > 0 THEN 'es'
      |       WHEN cnt_de > 0 THEN 'de'
      |       ELSE 'unknown' END AS lang_pred
      |FROM c
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Document fingerprinting: whitespace-normalized md5 (engine-portable;
    * the rolling-hash variant is engine-native and spec-tested).
    */
  def q23Fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  val q23Oracle: String =
    """SELECT doc_id, md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Exact text dedup at scale: hash-groupBy on the fingerprint, keep the
    * smallest doc_id per group (one shuffle on the 32-char key, not the
    * full document).
    */
  def q24DedupText(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .groupBy(TextStats.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy(col("keeper"))

  val q24Oracle: String =
    """SELECT md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp,
      |  MIN(doc_id) AS keeper, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1
      |ORDER BY keeper""".stripMargin

  // ---------------------------------------------------------------- q25
  /** Similarity search, exact baseline: cosine top-5 for 10 query vectors
    * over the embedding corpus (broadcast queries, ranked on cosine
    * rounded to 4 decimals for cross-engine determinism).
    */
  def q25KnnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Similarity
      .bruteTopK(e, e.filter(col("vec_id") < 10), k = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val q25Oracle: String =
    """SELECT query_id, rank, neighbor_id, sim FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS sim,
      |    ROW_NUMBER() OVER (
      |      PARTITION BY q.vec_id
      |      ORDER BY round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) DESC,
      |               c.vec_id) AS rank
      |  FROM embeddings c, embeddings q
      |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
      |) WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Token counting: whitespace tokens vs BPE-ish regex pre-tokenization. */
  def q26TokenCounts(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_ws"),
        size(TextStats.bpeishTokens(col("text"))).cast("long").as("n_bpe"),
        col("n_chars")
      )
      .orderBy(col("doc_id"))

  val q26Oracle: String =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe,
      |  n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q27
  /** MinHash+LSH near-dup detection — the TIMED production path over the
    * full corpus. Candidates from 16×16 banding (at threshold 0.9 that
    * keeps ~0.96+ recall while admitting ~10× fewer mid-similarity
    * candidates than 8×8), verified at exact token-set Jaccard ≥ 0.9.
    *
    * ORACLED since round 6 ([[q27OracleFor]], dynamic): the replay
    * embeds ONLY the banded signatures (the murmur3/xxhash64 half with
    * no DuckDB equivalent) as literals; everything downstream — the
    * exact-dup collapse, the candidate self-join, the size-ratio
    * prefilter, the exact-Jaccard verification computed from the raw
    * text, the member expansion and the census arithmetic — is replayed
    * relationally. (Round 5 judged this impossible on the theory the
    * replay would embed the output; it embeds the pre-verification
    * signatures, so the verified stream is genuinely re-derived.)
    * Ground truth for the hashed half stays the oracled chain: q46
    * (exact pairs), q48 (recall vs q46), q33 (assignment core).
    *
    * Round-4 split (the q46 pattern): this corpus's 31-word vocabulary
    * yields ~941k true pairs at sf0.1, so materializing + globally
    * sorting the pair LIST made the benched number measure output
    * volume, not the dedup pipeline. The registry entry now reduces the
    * full-corpus pair stream to its linear-size census — total /
    * exact-dup / near-dup pair counts (jac = 1 ⟺ identical token sets,
    * so the split is exact) and the decimal-staged mean Jaccard.
    * Pair-level ground truth stays driver-certified on the bounded
    * slice: q46 (exact pair list, oracled) and q48 (recall vs that
    * list); q33 is the per-doc assignment form (the 100 TB output
    * shape). The full pair list remains the public
    * TextDedup.nearDupsMinhash surface — unchanged.
    */
  def q27MinhashDedup(s: SparkSession, dir: String): DataFrame =
    TextDedup
      .nearDupsMinhash(Tables.documents(s, dir), "doc_id", "text", threshold = 0.9, bands = 16, rows = 16)
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("jac") === 1.0, 1L).otherwise(0L)).as("n_exact_dup_pairs"),
        sum(when(col("jac") < 1.0, 1L).otherwise(0L)).as("n_near_dup_pairs"),
        // empty-corpus guard: zero candidate pairs must yield a
        // well-defined census row (nulls, not a 0/0), not a silent
        // schema-semantics change
        when(count(lit(1)) > 0,
          round(sum(col("jac").cast("decimal(38,12)")).cast("double") / count(lit(1)), 6))
          .as("mean_jac"),
        when(count(lit(1)) > 0, round(min(col("jac")), 6)).as("min_jac")
      )

  // ---------------------------------------------------------------- q28
  /** SimHash signatures.
    *
    * ORACLED since round 6 ([[q28OracleFor]], dynamic): through round 5
    * this was "no oracle — the signature IS the output". That
    * underclaimed: the only genuinely engine-native input is
    * xxhash64(token), and the corpus vocabulary is tiny (31 distinct
    * tokens at verify scale), so the per-token hash DICTIONARY embeds
    * as literals and DuckDB replays everything downstream —
    * tokenization, distinctness, all 64 bit votes, the sign packing
    * (bit 63 as the −2⁶³ term; DuckDB's `>>` is arithmetic like
    * Spark's shiftright, probed), the pairwise Hamming/Jaccard audit
    * and the Pearson correlation. The trusted-literal split is exactly
    * q94's: the codebook (here: 31 token hashes) is engine-granted,
    * the algorithm is independently recomputed.
    *
    * SELF-AUDITING (the q48/q49 pattern): every row carries
    * `audit_ham_jac_corr`, the Pearson correlation between pairwise
    * simhash Hamming distance and exact token-set Jaccard over the
    * bounded doc_id<500 slice. SimHash's contract is exactly that
    * Hamming distance tracks set overlap, so a sound implementation
    * shows a strong NEGATIVE correlation (measured −0.79 on this
    * corpus); a broken bit-vote would push it toward 0. The driver's
    * rows-only record still pins a readable pass/fail figure.
    */
  def q28Simhash(s: SparkSession, dir: String): DataFrame = {
    val sigs = Tables
      .documents(s, dir)
      .select(col("doc_id"), TextDedup.simhash64(TextDedup.tokenSet(col("text"))).as("simhash"))
    val slice = Tables
      .documents(s, dir)
      .filter(col("doc_id") < 500)
      .select(col("doc_id"), TextDedup.tokenSet(col("text")).as("toks"))
      // second select so simhash reads the materialized toks attribute —
      // one tokenization per row, and both columns provably share it
      .select(col("doc_id"), col("toks"), TextDedup.simhash64(col("toks")).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    slice.count() // eager: both cross-join sides race to fill this cache
    val a = slice.select(col("doc_id").as("id_a"), col("toks").as("toks_a"), col("sh").as("sh_a"))
    val b = slice.select(col("doc_id").as("id_b"), col("toks").as("toks_b"), col("sh").as("sh_b"))
    val audit = a
      .crossJoin(b) // bounded audit baseline: 500×500 slice pairs by construction
      .filter(col("id_a") < col("id_b"))
      .select(
        TextDedup.hamming64(col("sh_a"), col("sh_b")).cast("double").as("ham"),
        TextDedup.jaccard(col("toks_a"), col("toks_b")).as("jac")
      )
      .agg(round(corr(col("ham"), col("jac")), 4).as("audit_ham_jac_corr"))
    sigs.crossJoin(broadcast(audit)).orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q29
  /** Bigram-shingle Jaccard near-dups with source-blocked pairing. */
  def q29NgramJaccard(s: SparkSession, dir: String): DataFrame =
    TextDedup
      .nearDupsNgram(Tables.documents(s, dir), "doc_id", "text", "source", n = 2, threshold = 0.5)
      .select(col("source"), col("id_a"), col("id_b"), col("jac"))
      .orderBy(col("source"), col("id_a"), col("id_b"))

  val q29Oracle: String =
    """WITH t AS (
      |  SELECT source, doc_id,
      |    list_distinct(list_transform(
      |      range(0, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
      |      i -> array_to_string(string_split_regex(trim(text), '\s+')[i+1:i+2], ' '))) AS sh
      |  FROM documents
      |)
      |SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE) /
      |  CAST(len(a.sh) + len(b.sh) - len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE) AS jac
      |FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE) /
      |      CAST(len(a.sh) + len(b.sh) - len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE) >= 0.5
      |ORDER BY 1, id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q30
  /** ANN top-k via random-hyperplane LSH (approximate scale path;
    * recall vs brute force asserted in SimilaritySpec and audited
    * in-registry by q49). (nbits, tables) derived by
    * Similarity.lshParams at this corpus's neighbor-cosine regime
    * (~0.4), with radius-1 multiprobe on the query side — same recall
    * contract from ~4-5× fewer tables than exact-bucket probing, so the
    * corpus-side explode (the cost that scales with n) shrinks by the
    * same factor. ORACLED since round 5 via the DYNAMIC generated-SQL
    * replay ([[q30OracleFor]]): Verify reads the corpus count, derives
    * the same adaptive geometry, and emits the full LshSql replay — the
    * policy stays adaptive AND the output is driver-certified.
    */
  def q30AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    // construction-time count = parquet metadata read (see q31)
    val (nbits, tables) =
      Similarity.lshParams(e.count(), targetCosine = 0.4, probeHamming = 1)
    Similarity
      .annTopK(e, e.filter(col("vec_id") < 10), k = 5, nbits = nbits, tables = tables, probes = 1)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q31
  /** Embedding near-duplicate pairs at cosine ≥ 0.35 via shared LSH
    * buckets (the exact baseline is q45, against which recall is
    * measured in SimilaritySpec; ORACLED since round 5 via the dynamic
    * LshSql replay, [[q31OracleFor]]). (nbits, tables) come from Similarity.lshParams at
    * the query's own threshold — the corpus's near-dups sit at cosine
    * 0.35-0.5 where sign-sketch bits agree only ~61% of the time, so
    * the policy picks shallow buckets and many tables, and keeps doing
    * so correctly as the corpus grows (round-1 used hand-tuned 4×12).
    * Radius-1 multiprobe on one self-join side cuts the table count
    * ~4× at the same recall target.
    */
  def q31EmbedNearDups(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    // the corpus count at construction time is a parquet metadata read
    // (footer row counts), not a data scan — the price of adaptivity
    val (nbits, tables) =
      Similarity.lshParams(e.count(), targetCosine = 0.35, probeHamming = 1)
    Similarity
      .nearDupsEmbedding(e, threshold = 0.35, nbits = nbits, tables = tables, probes = 1)
      .orderBy(col("id_a"), col("id_b"))
  }

  // ---------------------------------------------------------------- q45
  /** Exact embedding near-dup pairs (cosine >= 0.35) — the brute-force
    * correctness baseline for the LSH-approximate q31. O(n²) by design:
    * the audit-scale form (fine for a dimension-sized corpus; q31 is the
    * production path). Oracle: DuckDB list_cosine_similarity cross join.
    */
  def q45EmbedNearDupsExact(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(Similarity.cosine(col("va"), col("vb")), 4).as("sim"))
      .filter(col("sim") >= 0.35)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q45Oracle: String =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
      |FROM embeddings a, embeddings b
      |WHERE a.vec_id < b.vec_id
      |  AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.35
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q46
  /** Exact token-set Jaccard >= 0.9 pairs on a BOUNDED slice (doc_id <
    * 500, i.e. sf0.01-sized regardless of SF) — the text-space exact
    * baseline that grounds the LSH-approximate q27, the way q45 grounds
    * q31. O(n²) on the slice by design (audit scale only). Oracle:
    * DuckDB list_filter-intersect pairwise Jaccard (the q29 pattern).
    */
  def q46TextNearDupsExact(s: SparkSession, dir: String): DataFrame =
    TextDedup
      .nearDupsExact(
        Tables.documents(s, dir).filter(col("doc_id") < 500),
        "doc_id",
        "text",
        threshold = 0.9
      )
      .orderBy(col("id_a"), col("id_b"))

  val q46Oracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct(string_split_regex(trim(text), '\s+')) AS tk
      |  FROM documents WHERE doc_id < 500
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) /
      |  CAST(len(a.tk) + len(b.tk) - len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) AS jac
      |FROM t a JOIN t b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) /
      |      CAST(len(a.tk) + len(b.tk) - len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q48
  /** In-registry recall of the LSH minhash path (q27's 16×16 banding at
    * threshold 0.9) against the exact q46 baseline, on the same bounded
    * slice. One row: (n_exact, n_found, recall). The LSH side verifies
    * candidates with exact Jaccard, so found ⊆ exact — no false
    * positives; recall is the only degree of freedom.
    *
    * ORACLED since round 6 ([[q48OracleFor]], dynamic): the slice's
    * banded signatures are embedded as literals and the found-pair set
    * re-derived relationally (candidates + size-ratio + exact-Jaccard
    * verification from raw text), then scored against the exact pair
    * list — only the hash values themselves are taken as given, so the
    * oracle checks the recall ARITHMETIC and the whole candidate→verify
    * pipeline, not the LSH side against itself.
    */
  def q48MinhashRecall(s: SparkSession, dir: String): DataFrame = {
    val slice = Tables.documents(s, dir).filter(col("doc_id") < 500)
    val exact = TextDedup
      .nearDupsExact(slice, "doc_id", "text", threshold = 0.9)
      .select(col("id_a"), col("id_b"))
    val found = TextDedup
      .nearDupsMinhash(slice, "doc_id", "text", threshold = 0.9, bands = 16, rows = 16)
      .select(col("id_a"), col("id_b"), lit(1).as("hit"))
    exact
      .join(found, Seq("id_a", "id_b"), "left")
      .agg(
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0))).as("n_found")
      )
      .select(
        col("n_exact"),
        col("n_found"),
        round(col("n_found").cast("double") / col("n_exact").cast("double"), 4).as("recall")
      )
  }

  // ---------------------------------------------------------------- q55
  /** SCD2 dimension history: collapse each user's event stream into
    * versioned validity intervals — a new version opens whenever the
    * tracked attribute (event_type) changes; valid_to is the next
    * version's valid_from (null = current). The lag-filter-lead window
    * composition every warehouse uses for slowly-changing dimensions.
    * One shuffle (partitionBy user); change-point filtering happens
    * before the second window pass, so version numbering runs over the
    * (much smaller) change rows only.
    */
  def q55Scd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // micros, not nanos: DuckDB's epoch_ns on this table yields
    // micro-precision values (the q39/q41 parity recipe), so validity
    // bounds and window order run on exact micros on BOTH sides
    val ev = Tables
      .events(s, dir)
      .select(col("user_id"), col("event_type"), expr("ts_ns div 1000").as("ts_us"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val changes = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    changes
      .withColumn("version", row_number().over(w2))
      // open versions use -1, not null: nullable int64 decays to float64
      // in arrow/pandas on one side of the differential compare
      .withColumn("valid_to_us", coalesce(lead(col("ts_us"), 1).over(w2), lit(-1L)))
      .select(
        col("user_id"),
        col("version"),
        col("event_type"),
        col("ts_us").as("valid_from_us"),
        col("valid_to_us")
      )
      .orderBy(col("user_id"), col("version"))
  }

  val q55Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us, event_id FROM events
      |), marked AS (
      |  SELECT user_id, event_type, ts_us, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
      |  FROM ev
      |), changes AS (
      |  SELECT user_id, event_type, ts_us, event_id FROM marked
      |  WHERE prev_type IS NULL OR prev_type <> event_type
      |)
      |SELECT user_id,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS version,
      |  event_type,
      |  ts_us AS valid_from_us,
      |  COALESCE(lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id), -1) AS valid_to_us
      |FROM changes
      |ORDER BY user_id, version""".stripMargin

  // ---------------------------------------------------------------- q58
  /** Gopher-style repetition quality signals per document: duplicated
    * 3-gram fraction + most-frequent-token share
    * (TextStats.withRepetition) — the boilerplate/spam detectors the
    * published LLM corpus-quality rules use alongside length/stopword
    * heuristics (q21). Doubles round to 6 for cross-engine stability.
    */
  def q58Repetition(s: SparkSession, dir: String): DataFrame =
    TextStats
      .withRepetition(Tables.documents(s, dir), "text", n = 3)
      .select(
        col("doc_id"),
        round(col("dup_ngram_ratio"), 6).as("dup_ngram_ratio"),
        round(col("top_token_ratio"), 6).as("top_token_ratio")
      )
      .orderBy(col("doc_id"))

  val q58Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, toks,
      |    list_transform(
      |      range(0, greatest(len(toks) - 3, 0) + 1),
      |      i -> array_to_string(toks[i+1:i+3], ' ')) AS grams
      |  FROM t
      |)
      |SELECT doc_id,
      |  round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE), 6) AS dup_ngram_ratio,
      |  round(CAST(list_max(list_transform(list_distinct(toks),
      |          u -> len(list_filter(toks, x -> x = u)))) AS DOUBLE) /
      |        CAST(len(toks) AS DOUBLE), 6) AS top_token_ratio
      |FROM g
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q57
  /** Training sequence PACKING: lay each source's documents end-to-end
    * (doc_id order) into fixed 512-token windows and report, per doc,
    * its token offset and first/last pack — the bookkeeping an LLM
    * pretraining pipeline runs to turn ragged documents into fixed-
    * length sequences. Running sums are PARTITIONED BY SOURCE (the
    * per-shard packing real pipelines use), so the window parallelizes
    * across sources instead of serializing the corpus through one
    * global ordering.
    */
  def q57SeqPack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val packTokens = 512
    val d = Tables
      .documents(s, dir)
      .select(
        col("source"),
        col("doc_id"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens")
      )
    val w = Window
      .partitionBy(col("source"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("tok_end", sum(col("n_tokens")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .select(
        col("source"),
        col("doc_id"),
        col("n_tokens"),
        col("tok_start"),
        // `div`, not `/`: integer division like the oracle's `//`
        // (long / int in Spark is double true-division)
        expr(s"tok_start div $packTokens").as("pack_first"),
        expr(s"(tok_end - 1) div $packTokens").as("pack_last")
      )
      .orderBy(col("source"), col("doc_id"))
  }

  val q57Oracle: String =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT source, doc_id, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tok_end
      |  FROM d
      |)
      |SELECT source, doc_id, n_tokens,
      |  CAST(tok_end - n_tokens AS BIGINT) AS tok_start,
      |  CAST((tok_end - n_tokens) // 512 AS BIGINT) AS pack_first,
      |  CAST((tok_end - 1) // 512 AS BIGINT) AS pack_last
      |FROM c
      |ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------------------------------- q56
  /** Data-quality expectation battery — the constraint checks a
    * training-data pipeline runs before trusting a snapshot: null
    * counts, duplicate keys, referential orphans, domain violations.
    * One row per check with its violation count (0 = pass), computed in
    * one pass per table (conditional aggregation) plus one anti-join
    * for the FK orphan check.
    */
  def q56DqChecks(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    // coalesce: an empty snapshot must report 0 violations, not null
    val liChecks = li.agg(
      coalesce(sum(when(col("l_orderkey").isNull, 1).otherwise(0)), lit(0)).as("li_null_orderkey"),
      coalesce(sum(when(col("l_quantity") < 0, 1).otherwise(0)), lit(0)).as("li_negative_qty"),
      coalesce(sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1).otherwise(0)), lit(0)).as("li_discount_domain")
    )
    val dupKeys = ord
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("ord_dup_keys"))
    // orphan = NON-NULL key with no parent: null keys are already the
    // li_null_orderkey check, and keeping them out makes the semantics
    // identical to the oracle's NOT IN (which silently drops null-key
    // rows and degenerates entirely if orders ever held a null key)
    val orphans = li
      .filter(col("l_orderkey").isNotNull)
      .join(ord.filter(col("o_orderkey").isNotNull),
        li("l_orderkey") === ord("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("li_orphan_orderkeys"))
    liChecks
      .crossJoin(dupKeys)
      .crossJoin(orphans)
      .select(
        // long/stable one-row layout: one column per expectation
        col("li_null_orderkey").cast("long"),
        col("li_negative_qty").cast("long"),
        col("li_discount_domain").cast("long"),
        col("ord_dup_keys").cast("long"),
        col("li_orphan_orderkeys").cast("long")
      )
  }

  val q56Oracle: String =
    """SELECT
      |  (SELECT CAST(COALESCE(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem) AS li_null_orderkey,
      |  (SELECT CAST(COALESCE(SUM(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem) AS li_negative_qty,
      |  (SELECT CAST(COALESCE(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem) AS li_discount_domain,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)) AS ord_dup_keys,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
      |     WHERE l_orderkey IS NOT NULL
      |       AND l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)) AS li_orphan_orderkeys""".stripMargin

  // ---------------------------------------------------------------- q54
  /** End-to-end MEDIA DEDUP, REAL codec since round 6: binary payloads
    * → [[Multimodal.renderPng]] (real PNG bytes) → typed media rows →
    * [[Multimodal.decodeImage]] fixed-dim feature vectors computed from
    * the ACTUAL decoded pixels (centered grid-mean luminance — a model
    * server slots into the same column contract) → embedding-space
    * near-dup pairs via adaptive LSH → one-row audit vs the exact
    * all-pairs baseline on the same features. This is the multimodal
    * integration path: Multimodal feeds Similarity the way an image
    * pipeline feeds its dedup stage. The corpus plants RE-UPLOADS —
    * byte-identical copies under new ids (the dominant real-world
    * media-dup mode); byte-identical payloads produce byte-identical
    * PNGs, so identical pixel features, cosine exactly 1.0, identical
    * LSH buckets — every planted pair MUST be found (the
    * identical-pair recall column pins 1.0 exactly). Near-identical
    * TEXTS now also land near cosine 1 (real pixel features inherit
    * text similarity through the raster law) — those genuine media
    * near-dups are measured by the overall recall audit.
    *
    * ORACLED since round 6 ([[q54OracleFor]], dynamic) — and with NO
    * literal embedding: the raster law makes the feature vectors
    * themselves a closed form over the raw text (grid-cell mean
    * luminance centered on the image mean; IEEE division and the
    * float cast are exactly rounded on both engines, so the replayed
    * floats are bit-identical), so DuckDB re-derives the embeddings
    * from `documents.text`, replays the LSH geometry (generalized
    * LshSql over the feats CTE), the exact all-pairs side, and the
    * recall/identical-pair arithmetic. Unlike a feature-literal
    * replay, nothing engine-computed is taken as given except the
    * hyperplane constants — the oracle certifies render → decode →
    * feature → LSH → verify end-to-end.
    */
  def q54MediaDedup(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).filter(col("doc_id") < 250).select(col("doc_id"), col("text"))
    val reuploads = base.select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val rendered = Multimodal.renderPng(base.unionByName(reuploads), "doc_id", "text")
    val media = Multimodal.asMedia(rendered, "doc_id", "png", "image")
    val feats = Multimodal
      .decodeImage(media)
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = feats.count() // eager (exact + LSH consumers share this cache) AND the corpus size
    val (nbits, tables) = Similarity.lshParams(n, targetCosine = 0.9, probeHamming = 1)
    val a = feats.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = feats.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exact = a
      .crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(Similarity.cosine(col("va"), col("vb")), 4).as("sim"))
      .filter(col("sim") >= 0.9)
      .select("id_a", "id_b")
    val approx = Similarity
      .nearDupsEmbedding(feats, threshold = 0.9, nbits = nbits, tables = tables, probes = 1)
    // Identical-payload ground truth (the planted re-uploads + any
    // byte-identical texts in the base corpus): identical bytes →
    // identical PNG → identical features → identical buckets in EVERY
    // LSH table → cosine exactly 1.0 — so recall over this set must be
    // EXACTLY 1.0, independent of LSH luck; the spec pins it.
    val u = base.unionByName(reuploads)
    val ident = u
      .select(col("doc_id").as("id_a"), col("text"))
      .join(u.select(col("doc_id").as("id_b"), col("text")), "text")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val identAudit = ident
      .join(
        approx.select(col("id_a"), col("id_b"), lit(1).as("hit")),
        Seq("id_a", "id_b"),
        "left"
      )
      .agg(
        count(lit(1)).as("n_identical"),
        sum(coalesce(col("hit"), lit(0))).as("n_identical_found")
      )
    Similarity
      .recallAudit(exact, approx, Seq("id_a", "id_b"))
      .crossJoin(broadcast(identAudit))
      .select(
        lit(n).as("n_media"),
        lit(nbits).as("nbits"),
        lit(tables).as("tables"),
        col("n_exact"),
        col("n_found"),
        col("recall"),
        col("n_identical"),
        col("n_identical_found"),
        round(col("n_identical_found").cast("double") / col("n_identical"), 4)
          .as("recall_identical")
      )
  }

  /** q54 generated oracle (round 6): the full media-dedup replay with
    * ZERO engine-computed literals — features re-derived closed-form
    * from the raster law (see q54MediaDedup scaladoc), LSH buckets from
    * the seeded hyperplanes, one-side radius-1 multiprobe candidate
    * join, rounded-cosine verification, exact all-pairs baseline, and
    * the identical-pair (text-equality) audit. (nbits, tables) replayed
    * from the corpus size exactly as the query computes them.
    */
  def q54OracleFor(s: SparkSession, dir: String): String = {
    val n = Tables.documents(s, dir).filter(col("doc_id") < 250).count() * 2
    val (nbits, tables) = Similarity.lshParams(n, targetCosine = 0.9, probeHamming = 1)
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 250
       |  UNION ALL
       |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 250
       |), px AS (
       |  SELECT doc_id, i,
       |    ascii(substr(text, (i % len) + 1, 1)) +
       |    ascii(substr(text, ((i * 31 + 7) % len) + 1, 1)) +
       |    ascii(substr(text, ((i * 131 + 13) % len) + 1, 1)) AS s,
       |    (i * 64) // (w * h) AS cell
       |  FROM (
       |    SELECT doc_id, text, length(text) AS len,
       |      8 + length(text) % 9 AS w, 8 + length(text) % 7 AS h
       |    FROM corpus
       |  ), LATERAL unnest(range(w * h)) AS t(i)
       |), cells AS (
       |  SELECT doc_id, cell, SUM(s) AS cs, COUNT(*) AS cc FROM px GROUP BY doc_id, cell
       |), imgs AS (
       |  SELECT doc_id, SUM(s) AS ts, COUNT(*) AS tc FROM px GROUP BY doc_id
       |), feats AS (
       |  SELECT c.doc_id AS vec_id,
       |    list(CAST((cs / (3.0 * cc) - ts / (3.0 * tc)) / 256.0 AS FLOAT) ORDER BY cell) AS embedding
       |  FROM cells c JOIN imgs g ON c.doc_id = g.doc_id
       |  GROUP BY c.doc_id
       |), dbk AS (
       |${LshSql.dbk(nbits, tables, from = "feats")}
       |), pa AS (
       |  SELECT vec_id AS id_a, tbl, unnest([${LshSql.probeList(nbits)}]) AS bucket FROM dbk
       |), cand AS (
       |  SELECT DISTINCT a.id_a, b.vec_id AS id_b
       |  FROM pa a JOIN dbk b ON a.tbl = b.tbl AND a.bucket = b.bucket
       |  WHERE a.id_a < b.vec_id
       |), approx AS (
       |  SELECT cand.id_a, cand.id_b
       |  FROM cand
       |  JOIN feats va ON cand.id_a = va.vec_id
       |  JOIN feats vb ON cand.id_b = vb.vec_id
       |  WHERE round(list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]), 4) >= 0.9
       |), exact AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM feats a JOIN feats b ON a.vec_id < b.vec_id
       |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.9
       |), ident AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM corpus a JOIN corpus b ON a.text = b.text AND a.doc_id < b.doc_id
       |), ia AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_identical,
       |    CAST(SUM(CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_identical_found
       |  FROM ident i LEFT JOIN approx p ON i.id_a = p.id_a AND i.id_b = p.id_b
       |), ra AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
       |    CAST(SUM(CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found
       |  FROM exact e LEFT JOIN approx p ON e.id_a = p.id_a AND e.id_b = p.id_b
       |)
       |SELECT CAST($n AS BIGINT) AS n_media, $nbits AS nbits, $tables AS tables,
       |  n_exact, n_found,
       |  round(CAST(n_found AS DOUBLE) / CAST(n_exact AS DOUBLE), 4) AS recall,
       |  n_identical, n_identical_found,
       |  round(CAST(n_identical_found AS DOUBLE) / CAST(n_identical AS DOUBLE), 4) AS recall_identical
       |FROM ra, ia""".stripMargin
  }

  // ---------------------------------------------------------------- q52
  /** Deterministic stratified sampling: 10 docs per source in a
    * reproducible multiplicative-hash order (TextStats.stratifiedSample)
    * — the quota-sampling shape a training-data pipeline uses for
    * per-language / per-source balancing. The rank filter plans a
    * Partial WindowGroupLimit, so only ~groups×10 rows shuffle.
    */
  def q52StratifiedSample(s: SparkSession, dir: String): DataFrame =
    TextStats
      .stratifiedSample(
        Tables.documents(s, dir).select(col("source"), col("doc_id")),
        "source",
        "doc_id",
        perGroup = 10
      )
      .select(col("source"), col("doc_id"), col("rn"))
      .orderBy(col("source"), col("rn"))

  val q52Oracle: String =
    """SELECT source, doc_id, rn FROM (
      |  SELECT source, doc_id,
      |    ROW_NUMBER() OVER (
      |      PARTITION BY source
      |      ORDER BY (doc_id * 2654435761) % 1000003, doc_id) AS rn
      |  FROM documents
      |) WHERE rn <= 10
      |ORDER BY source, rn""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Text cleaning battery: deterministic dirty text (synthetic email +
    * phone derived from doc_id) pushed through PII redaction and
    * whitespace normalization (TextStats.redactPii / normalizeWs) —
    * pure map-side regexp work, oracled verbatim in DuckDB (shared
    * Java/RE2 regex subset).
    */
  def q53TextClean(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val dirty = concat(
      col("text"),
      lit("  contact user"), col("doc_id").cast("string"), lit("@example.com"),
      lit(" or +1 555 01"), lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit(" 999  ")
    )
    d.select(
      col("doc_id"),
      TextStats.normalizeWs(TextStats.redactPii(dirty)).as("clean")
    ).orderBy(col("doc_id"))
  }

  val q53Oracle: String =
    """SELECT doc_id,
      |  trim(regexp_replace(
      |    regexp_replace(
      |      regexp_replace(
      |        text || '  contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |             || ' or +1 555 01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' 999  ',
      |        '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |      '\+?[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g'),
      |    '\s+', ' ', 'g')) AS clean
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Near-dup CLUSTERS: connected components over the exact-pair graph
    * of the q46 audit slice (ops.Components, iterative min-label
    * propagation — the closure dedupAssignments one-hops). Oracle:
    * DuckDB recursive CTE computing min-reachable-id per node — an
    * exact, independent formulation of the same closure.
    */
  def q51ConnectedComponents(s: SparkSession, dir: String): DataFrame = {
    val pairs = TextDedup.nearDupsExact(
      Tables.documents(s, dir).filter(col("doc_id") < 500),
      "doc_id",
      "text",
      threshold = 0.9
    )
    Components.connectedComponents(pairs).orderBy(col("id"))
  }

  // ---------------------------------------------------------------- q61
  /** Benchmark DECONTAMINATION — the n-gram collision check every LLM
    * pretraining pipeline runs before training (flag training docs that
    * share a long n-gram with an eval/benchmark set, the GPT-3/PaLM
    * decontamination shape). Benchmark = docs 0-49; corpus = the rest;
    * a 5-gram collision marks the doc contaminated. Scale shape: the
    * benchmark shingle set is SMALL by nature (eval sets are thousands
    * of docs, not billions) — it broadcasts, so the corpus side is one
    * map-side explode + hash-probe and one groupBy on doc_id; the
    * corpus never shuffles its text.
    */
  def q61Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val ngrams = TextDedup.shingles(col("text"), 5)
    val bench = docs
      .filter(col("doc_id") < 50)
      .select(explode(ngrams).as("ng"))
      .distinct()
    val corpusNg = docs
      .filter(col("doc_id") >= 50)
      .select(col("doc_id"), explode(ngrams).as("ng"))
    val hits = corpusNg
      .join(broadcast(bench), Seq("ng"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ng")).as("n_contaminated"))
    docs
      .filter(col("doc_id") >= 50)
      .select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)) > 0).as("is_contaminated")
      )
      .orderBy(col("doc_id"))
  }

  val q61Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(0, greatest(len(toks) - 4, 1)),
      |    i -> array_to_string(toks[i+1:i+5], ' '))) AS ngs
      |  FROM d
      |), ex AS (
      |  SELECT doc_id, unnest(ngs) AS ng FROM sh
      |), bench AS (
      |  SELECT DISTINCT ng FROM ex WHERE doc_id < 50
      |), hits AS (
      |  SELECT e.doc_id, CAST(count(DISTINCT e.ng) AS BIGINT) AS n_contaminated
      |  FROM ex e JOIN bench b ON e.ng = b.ng
      |  WHERE e.doc_id >= 50 GROUP BY e.doc_id
      |)
      |SELECT d.doc_id,
      |  COALESCE(h.n_contaminated, 0) AS n_contaminated,
      |  COALESCE(h.n_contaminated, 0) > 0 AS is_contaminated
      |FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id
      |WHERE d.doc_id >= 50
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q64
  /** q61's decontamination with a BLOOM-PREFILTERED probe — the shape
    * for eval suites too big to broadcast raw: the benchmark shingle
    * set compresses to a constant-size Bloom filter (8 KiB at
    * log2bits=16 vs megabytes of strings), the corpus side drops
    * definitely-clean n-grams MAP-SIDE before any join, and the exact
    * join afterwards removes Bloom false positives — output is
    * row-identical to q61 and shares its oracle. Composition of
    * ops.BloomJoin with the decontamination semantics; at 100 TB the
    * probe shuffle carries only probable hits (~selectivity of the
    * contamination rate) instead of every corpus n-gram.
    */
  def q64DecontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val ngrams = TextDedup.shingles(col("text"), 5)
    val bench = docs
      .filter(col("doc_id") < 50)
      .select(explode(ngrams).as("bng"))
      .distinct()
    val corpusNg = docs
      .filter(col("doc_id") >= 50)
      .select(col("doc_id"), explode(ngrams).as("ng"))
    val hits = BloomJoin
      .join(corpusNg, bench, "ng", "bng", log2bits = 16)
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ng")).as("n_contaminated"))
    docs
      .filter(col("doc_id") >= 50)
      .select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)) > 0).as("is_contaminated")
      )
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q62
  /** Data-MIXTURE weights: per-source token counts → temperature-scaled
    * sampling weights w_s ∝ (n_s/N)^α (α=0.7, the multilingual/
    * multi-corpus mixing rule) — the step that decides how often each
    * source is drawn during pretraining. Two tiny aggregates (one per
    * normalization constant) over a 10-row per-source frame; the corpus
    * is scanned once. Double sums accumulate in decimal so the
    * normalizers are order-independent.
    */
  def q62MixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val bySource = Tables
      .documents(s, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextStats.tokens(col("text"))).cast("long")).as("n_tokens")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bySource.count() // eager: both normalizer consumers share this cache
    val total = bySource.agg(sum(col("n_tokens")).as("total_tokens"))
    val powed = bySource
      .crossJoin(broadcast(total))
      .withColumn("share", col("n_tokens").cast("double") / col("total_tokens").cast("double"))
      .withColumn("powed", pow(col("share"), lit(0.7)))
    val z = powed.agg(sum(col("powed").cast("decimal(38,18)")).cast("double").as("z"))
    powed
      .crossJoin(broadcast(z))
      .select(
        col("source"),
        col("n_docs"),
        col("n_tokens"),
        round(col("share"), 6).as("share"),
        round(col("powed") / col("z"), 6).as("weight")
      )
      .orderBy(col("source"))
  }

  val q62Oracle: String =
    """WITH s AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source
      |), t AS (
      |  SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total FROM s
      |), p AS (
      |  SELECT source, n_docs, n_tokens,
      |    CAST(n_tokens AS DOUBLE) / t.total AS share,
      |    pow(CAST(n_tokens AS DOUBLE) / t.total, 0.7) AS powed
      |  FROM s, t
      |), z AS (
      |  SELECT CAST(SUM(CAST(powed AS DECIMAL(38,18))) AS DOUBLE) AS z FROM p
      |)
      |SELECT source, n_docs, n_tokens,
      |  round(share, 6) AS share,
      |  round(powed / z.z, 6) AS weight
      |FROM p, z ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q63
  /** Context-window CHUNKING with overlap (window 16 tokens, stride 12)
    * — the chunker feeding RAG indexing and fixed-window pretraining:
    * per doc, overlapping token spans with offsets plus the
    * materialized chunk text. Generator shape: one map-side explode per
    * doc (the frameSample pattern on tokens instead of bytes), chunk
    * count from the exact integer ceil form so the tail tokens are
    * always covered. No shuffle at all until the output sort.
    */
  def q63Chunk(s: SparkSession, dir: String): DataFrame = {
    val win = 16
    val stride = 12
    val d = Tables
      .documents(s, dir)
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      // integer ceil((n-win)/stride)+1, never a float: engines disagree
      // on float ceil edge cases, ints they agree on
      .withColumn(
        "n_chunks",
        when(col("n_tokens") <= win, lit(1L))
          .otherwise(expr(s"(n_tokens - $win + ${stride - 1}) div $stride + 1"))
      )
    d.select(
      col("doc_id"),
      col("n_tokens"),
      col("toks"),
      explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx")
    ).select(
        col("doc_id"),
        col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        least(col("chunk_idx") * stride + win, col("n_tokens")).as("tok_end"),
        concat_ws(" ", slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"), lit(win)))
          .as("chunk_text")
      )
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val q63Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), c AS (
      |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CASE WHEN len(toks) <= 16 THEN 1
      |         ELSE (len(toks) - 16 + 11) // 12 + 1 END AS n_chunks
      |  FROM d
      |), e AS (
      |  SELECT doc_id, toks, n_tokens, unnest(range(0, n_chunks)) AS i FROM c
      |)
      |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
      |  CAST(i * 12 AS BIGINT) AS tok_start,
      |  CAST(least(i * 12 + 16, n_tokens) AS BIGINT) AS tok_end,
      |  array_to_string(toks[i*12+1 : i*12+16], ' ') AS chunk_text
      |FROM e
      |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- q60
  /** The SAME component closure as q51, computed by the O(log n)
    * large-star/small-star contraction (Components.largeStarSmallStar —
    * the planet-scale path, round count independent of component
    * diameter) instead of O(diameter) min-label propagation. Shares
    * q51's recursive-CTE oracle: both algorithms must land on the
    * identical (id, min-reachable-id) labelling, which gives the
    * log-round path driver-visible correctness evidence.
    */
  def q60ConnectedComponentsLogRounds(s: SparkSession, dir: String): DataFrame = {
    val pairs = TextDedup.nearDupsExact(
      Tables.documents(s, dir).filter(col("doc_id") < 500),
      "doc_id",
      "text",
      threshold = 0.9
    )
    Components.largeStarSmallStar(pairs).orderBy(col("id"))
  }

  val q51Oracle: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS tk
      |  FROM documents WHERE doc_id < 500
      |), edges AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM t a JOIN t b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) /
      |        CAST(len(a.tk) + len(b.tk) - len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) >= 0.9
      |), sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM edges
      |  UNION ALL
      |  SELECT id_b, id_a FROM edges
      |), reach(id, comp) AS (
      |  SELECT DISTINCT src, src FROM sym
      |  UNION
      |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.id
      |)
      |SELECT id, MIN(comp) AS component FROM reach GROUP BY id ORDER BY id""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Bloom-prefiltered fact×dim join (ops.BloomJoin): a 2^16-bit Bloom
    * filter built over the selective dim keys (p_size=1, ~2% of parts)
    * drops non-matching lineitem rows MAP-SIDE before the join; the
    * exact join then removes Bloom false positives, so the result — and
    * the DuckDB oracle — is the plain join. The artifact under test is
    * row-identity with the unfiltered join plus the prefilter plan shape
    * (asserted in BloomSpec).
    */
  def q50BloomJoin(s: SparkSession, dir: String): DataFrame = {
    val facts = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey", "l_quantity")
    val dims = Tables
      .part(s, dir)
      .filter(col("p_size") === 1)
      .select("p_partkey", "p_brand", "p_retailprice")
    BloomJoin
      .join(facts, dims, "l_partkey", "p_partkey", log2bits = 16)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("p_brand"), col("p_retailprice"))
      .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("p_brand"), col("p_retailprice"))
  }

  val q50Oracle: String =
    """SELECT l_orderkey, l_partkey, l_quantity, p_brand, p_retailprice
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size = 1
      |ORDER BY l_orderkey, l_partkey, l_quantity, p_brand, p_retailprice""".stripMargin

  // ---------------------------------------------------------------- q49
  /** ANN with ADAPTIVE LSH parameters: (nbits, tables) derived from the
    * corpus size and cosine regime by Similarity.lshParams instead of
    * fixture-tuned constants — the policy that keeps recall stable from
    * sf0.001 to 1000× without retuning. Output is a one-row audit:
    * corpus size, derived params, and recall vs the exact brute-force
    * top-5 (q25's form). ORACLED since round 5 via the dynamic LshSql
    * replay ([[q49OracleFor]] — the recall arithmetic included, so the
    * audit figure itself is driver-certified).
    */
  def q49AnnAdaptiveRecall(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val n = e.count()
    val (nbits, tables) = Similarity.lshParams(n, targetCosine = 0.4, probeHamming = 1)
    val queries = e.filter(col("vec_id") < 10)
    val exact = Similarity
      .bruteTopK(e, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity
      .annTopK(e, queries, k = 5, nbits = nbits, tables = tables, probes = 1)
    Similarity
      .recallAudit(exact, approx, Seq("query_id", "neighbor_id"))
      .select(
        lit(n).as("n_vectors"),
        lit(nbits).as("nbits"),
        lit(tables).as("tables"),
        col("n_exact"),
        col("n_found"),
        col("recall")
      )
  }

  // ---------------------------------------------------------------- q47
  /** F8 DST path: naive local timestamps interpreted in Europe/Berlin and
    * converted to UTC across BOTH 2024 DST boundaries (spring-forward
    * 2024-03-31, fall-back 2024-10-27; reference app/main.py:184-206 —
    * localize then convert). Sample times avoid the nonexistent
    * (02:00-03:00 on 03-31) and ambiguous (02:00-03:00 on 10-27) local
    * hours, where engines legitimately disagree; everything else must
    * match DuckDB's ICU conversion exactly. Both naive formats ('T' and
    * space separated) exercised.
    */
  def q47Tz(s: SparkSession, dir: String): DataFrame = {
    val date = when(col("event_id") % 4 === 0, lit("2024-01-15"))
      .when(col("event_id") % 4 === 1, lit("2024-03-31"))
      .when(col("event_id") % 4 === 2, lit("2024-07-01"))
      .otherwise(lit("2024-10-27"))
    val hour = when(col("event_id") % 3 === 0, lit("01"))
      .when(col("event_id") % 3 === 1, lit("03"))
      .otherwise(lit("12"))
    val sep = when(col("event_id") % 2 === 0, lit("T")).otherwise(lit(" "))
    val raw = Tables
      .events(s, dir)
      .select(
        col("event_id"),
        concat(
          date, sep, hour,
          lit(":"), lpad((col("event_id") % 60).cast("string"), 2, "0"),
          lit(":"), lpad((col("user_id") % 60).cast("string"), 2, "0")
        ).as("ts_raw")
      )
    raw
      .select(
        col("event_id"),
        col("ts_raw"),
        date_format(
          Normalize.lenientTimestamp(col("ts_raw"), naiveZone = "Europe/Berlin"),
          "yyyy-MM-dd HH:mm:ss"
        ).as("utc")
      )
      .orderBy(col("event_id"))
  }

  val q47Oracle: String =
    """WITH raw AS (
      |  SELECT event_id,
      |    (CASE event_id % 4 WHEN 0 THEN '2024-01-15' WHEN 1 THEN '2024-03-31'
      |                       WHEN 2 THEN '2024-07-01' ELSE '2024-10-27' END)
      |    || (CASE WHEN event_id % 2 = 0 THEN 'T' ELSE ' ' END)
      |    || (CASE event_id % 3 WHEN 0 THEN '01' WHEN 1 THEN '03' ELSE '12' END)
      |    || ':' || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0')
      |    || ':' || lpad(CAST(user_id % 60 AS VARCHAR), 2, '0') AS ts_raw
      |  FROM events
      |)
      |SELECT event_id, ts_raw,
      |  strftime(
      |    timezone('UTC', timezone('Europe/Berlin', COALESCE(
      |      TRY_STRPTIME(ts_raw, '%Y-%m-%dT%H:%M:%S'),
      |      TRY_STRPTIME(ts_raw, '%Y-%m-%d %H:%M:%S')))),
      |    '%Y-%m-%d %H:%M:%S') AS utc
      |FROM raw
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q44
  /** HLL distinct sketch (graft.expr.HllSketch, TypedImperativeAggregate,
    * 4 KB state per group at any scale). Deterministic (xxhash64) but
    * approximate.
    *
    * ORACLED since round 6 ([[q44OracleFor]], dynamic): the round-5
    * "DuckDB has neither the hash nor the register semantics" claim
    * conceded too early — the q28 move applies. The per-value
    * xxhash64 dictionary (distinct l_partkey is bounded: the part
    * table) embeds as literals; DuckDB then replays the ENTIRE sketch
    * semantics relationally: register index = top-p bits
    * ((h >> 52) & 4095 — arithmetic shift + mask ≡ unsigned shift),
    * rank = leading zeros of the remaining 52 bits via the exact
    * integer form 53 − len(bin(h & (2⁵²−1))), per-group register maxima
    * as a group-max over a range(4096) scaffold, the harmonic/zeros
    * census, the estimator branch, and Flajolet linear counting
    * (m·ln(m/zeros) — integer zeros, so the one transcendental agrees
    * bitwise; probed). Regime note: at verify scale the
    * linear-counting branch decides the output with huge margin
    * (est ≈ 2k vs the 10,240 threshold), so harmonic-sum float-order
    * differences between the Java loop and DuckDB's aggregate cannot
    * flip anything; the branch condition itself is ulp-robust for the
    * same reason. Accuracy bounded in HllSketchSpec (<3% overall, <5%
    * per group vs exact). SELF-AUDITING: each group row carries the
    * exact distinct count and `audit_rel_err` = |approx−exact|/exact.
    */
  def q44HllSketch(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("li_hll")
    s.sql(
      """SELECT l_returnflag, approx_parts, exact_parts, n,
        |  round(abs(approx_parts - exact_parts) / exact_parts, 4) AS audit_rel_err
        |FROM (
        |  SELECT l_returnflag,
        |    hll_distinct(l_partkey) AS approx_parts,
        |    CAST(COUNT(DISTINCT l_partkey) AS DOUBLE) AS exact_parts,
        |    COUNT(*) AS n
        |  FROM li_hll GROUP BY l_returnflag
        |) ORDER BY l_returnflag""".stripMargin
    )
  }

  // ---------------------------------------------------------------- q43
  /** Interval join: events vs per-user 3-day activity windows (derived
    * from the events themselves — each day's events open a [day, day+2d]
    * window carrying that day's count). Bucketized to an equi join
    * (ops.RangeJoin) vs the BETWEEN theta join DuckDB runs directly;
    * every event matches 1-3 windows. Aggregated per event.
    */
  def q43RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
    val ranges = Tables
      .events(s, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("start_ts"))
      .agg(count(lit(1)).as("day_n"))
      .withColumn("end_ts", col("start_ts") + expr("INTERVAL 2 DAYS"))
    RangeJoin
      .bucketed(ev, ranges, "user_id", "ts", "start_ts", "end_ts", bucketMs = 24L * 3600 * 1000)
      .groupBy(col("event_id"))
      .agg(
        count(lit(1)).as("n_active_windows"),
        sum(col("day_n")).as("sum_window_events")
      )
      .orderBy(col("event_id"))
  }

  val q43Oracle: String =
    """WITH r AS (
      |  SELECT user_id, date_trunc('day', ts) AS start_ts, COUNT(*) AS day_n
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT e.event_id,
      |  COUNT(*) AS n_active_windows,
      |  CAST(SUM(r.day_n) AS BIGINT) AS sum_window_events
      |FROM events e
      |JOIN r ON e.user_id = r.user_id
      |      AND e.ts >= r.start_ts
      |      AND e.ts <= r.start_ts + INTERVAL 2 DAY
      |GROUP BY e.event_id
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q42
  /** As-of join: each event picks up the most recent order state
    * (right.ts <= event.ts) of the same key — union + carry-forward, one
    * shuffle over |L|+|R| (ops.AsOf). Oracle: DuckDB's native ASOF JOIN.
    * Orders deduped to one row per (custkey, orderdate) for tie
    * determinism in both engines.
    */
  def q42AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables
      .orders(s, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .withColumnRenamed("o_custkey", "user_id")
    val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
    AsOf
      .joinAsOf(ev, ord, key = "user_id", leftTs = "ts", rightTs = "o_orderdate",
        rightCols = Seq("o_orderkey", "o_orderdate"))
      .select(
        col("event_id"),
        col("user_id"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("od")
      )
      .orderBy(col("event_id"))
  }

  val q42Oracle: String =
    """WITH ord AS (
      |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY o_custkey, o_orderdate
      |)
      |SELECT e.event_id, e.user_id, o.o_orderkey,
      |  strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS od
      |FROM events e ASOF LEFT JOIN ord o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q41
  /** Exact percentiles (linear interpolation): Spark `percentile` vs
    * DuckDB `quantile_cont` — same definition, cross-checked bit-level.
    */
  def q41Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("median_price"),
        expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
        count(lit(1)).as("n")
      )
      .orderBy(col("l_returnflag"))

  val q41Oracle: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.5) AS median_price,
      |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q59
  /** t-digest percentile SKETCH (graft.expr.TDigestQuantile,
    * TypedImperativeAggregate, ~2δ centroids ≈ 3 KB state per group at
    * any scale) — the streaming/100 TB complement to the exact q41,
    * whose `percentile` buffers every value per group.
    *
    * ORACLED VIA CONTRACT RESTRUCTURING (round 8). The raw sketch
    * values can never be statically replayed: a merging t-digest's
    * centroid list depends on partial-merge arrival order (shuffle
    * fetch order, nondeterministic run to run) — unlike q44's HLL
    * registers, which are a merge-order-independent MAX. So the
    * checked output carries only what IS replayable: the group key,
    * the exact percentiles (DuckDB `quantile_cont` — same linear
    * interpolation as Spark `percentile`, bit-parity proven by q41 on
    * this very column), the count, and the sketch's ACCURACY CONTRACT
    * as a boolean: `sketch_within_1pct` = worst relative error across
    * p50/p90/p99 < 1%. The oracle pins that literal TRUE, so any
    * sketch drift (centroid rule regression, merge bug, quantile
    * interpolation bug) turns the row red — the t-digest is inside the
    * correctness gate without its merge-order-dependent state ever
    * being compared. Tighter per-value bounds remain in TDigestSpec;
    * merge associativity is property-checked in PropsSpec.
    */
  def q59TdigestPercentiles(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("li_td")
    s.sql(
      """SELECT l_returnflag, exact_p50, exact_p90, exact_p99, n,
        |  greatest(
        |    abs(approx_p50 - exact_p50) / exact_p50,
        |    abs(approx_p90 - exact_p90) / exact_p90,
        |    abs(approx_p99 - exact_p99) / exact_p99) < 0.01
        |    AS sketch_within_1pct
        |FROM (
        |  SELECT l_returnflag,
        |    tdigest_quantile(l_extendedprice, 0.5) AS approx_p50,
        |    tdigest_quantile(l_extendedprice, 0.9) AS approx_p90,
        |    tdigest_quantile(l_extendedprice, 0.99) AS approx_p99,
        |    percentile(l_extendedprice, 0.5) AS exact_p50,
        |    percentile(l_extendedprice, 0.9) AS exact_p90,
        |    percentile(l_extendedprice, 0.99) AS exact_p99,
        |    COUNT(*) AS n
        |  FROM li_td GROUP BY l_returnflag
        |) ORDER BY l_returnflag""".stripMargin
    )
  }

  val q59Oracle: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.5) AS exact_p50,
      |  quantile_cont(l_extendedprice, 0.9) AS exact_p90,
      |  quantile_cont(l_extendedprice, 0.99) AS exact_p99,
      |  COUNT(*) AS n,
      |  TRUE AS sketch_within_1pct
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Native session windows (Spark's session_window generator) — the
    * declarative form of q37's LAG+cumsum sessionization. Both engines
    * compute boundaries on exact microseconds (Spark's ts is ns-truncated
    * micros; the oracle derives micros via epoch_ns//1000).
    */
  def q39SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        col("n_events"),
        col("sum_value")
      )
      .orderBy(col("user_id"), col("session_start"))

  val q39Oracle: String =
    """WITH e AS (
      |  SELECT user_id, "value", epoch_ns(ts) // 1000 AS us FROM events
      |), g AS (
      |  SELECT user_id, "value", us,
      |    CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
      |           OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e
      |), sess AS (
      |  SELECT user_id, "value", us,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
      |                      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g
      |)
      |SELECT user_id,
      |  strftime(make_timestamp(MIN(us)), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST("value" AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------- q40
  /** Custom typed Aggregator: bounded top-k per group (a k-element
    * buffer per key — constant memory per group at any scale, unlike
    * sort-based ranking). Verified against the relational window form.
    */
  def q40TopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables
      .events(s, dir)
      .select(col("event_type"), col("event_id"), col("value"))
      .as[(String, Long, Double)]
    val agg = new graft.expr.TopKByScore(3).toColumn
    ev.groupByKey(_._1)
      .agg(agg.name("topk"))
      .flatMap { case (et, topk) =>
        topk.zipWithIndex.map { case ((v, id), i) => (et, i + 1, id, v) }
      }
      .toDF("event_type", "rank", "event_id", "value")
      .orderBy(col("event_type"), col("rank"))
  }

  val q40Oracle: String =
    """SELECT event_type, rank, event_id, "value" FROM (
      |  SELECT event_type, event_id, "value",
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY "value" DESC, event_id) AS rank
      |  FROM events) t
      |WHERE rank <= 3
      |ORDER BY event_type, rank""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Grouping-set rollup + exact distinct aggregate: subtotal/grand-total
    * rows via ROLLUP (beyond the reference's flat aggregates — an engine
    * capability a downstream analyst expects).
    */
  def q36Rollup(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"),
        countDistinct(col("l_partkey")).as("nd_parts")
      )
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val q36Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n,
      |  COUNT(DISTINCT l_partkey) AS nd_parts
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Sessionization: a new session starts when the gap to the previous
    * event of the same user exceeds 30 minutes (LAG + cumulative sum —
    * the batch form of session windows). Gap math on the exact ns longs.
    */
  def q37Sessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    Tables
      .events(s, dir)
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
      .withColumn(
        "is_new",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > 1800000000000L, 1L).otherwise(0L)
      )
      .groupBy(col("user_id"))
      .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val q37Oracle: String =
    """WITH g AS (
      |  SELECT user_id,
      |    CASE WHEN lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              > 1800000000000 THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |)
      |SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      |FROM g
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Pivot: event counts per user wide by event type (groupBy.pivot with
    * an explicit value list — codegen'd conditional aggregation).
    */
  def q38Pivot(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na
      .fill(0L)
      .orderBy(col("user_id"))

  val q38Oracle: String =
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q35
  /** IVF approximate nearest-neighbor: k-means coarse quantizer (fit as
    * DataFrame algebra), nprobe cell probing. Every row carries
    * `audit_recall_vs_brute`, the recall@5 of the probed search against
    * the exact brute-force top-5 on the same corpus — the honest figure
    * for scanning ~nprobe/k of the corpus per query.
    *
    * ORACLED since round 4 — the generated SQL replays the ENTIRE
    * pipeline including the trained quantizer: deterministic first-k
    * init, two Lloyd iterations (assignment argmax on UNROUNDED
    * cosines, decimal-staged means, natural empty-cell drop), the
    * double→float centroid truncation at assignment, nprobe cell
    * selection, and the rounded-cosine candidate ranking plus the
    * recall-audit arithmetic. The enabling probes: DuckDB list_reduce
    * is an ordered left fold, so the three accumulator streams of the
    * native cosine replay bit-exactly (960/960 pairs probed), and the
    * fit's means were decimal-staged this round — without that the
    * update step's double partial-merge order made centroids
    * irreproducible even run to run.
    */
  def q35Ivf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val cents = Ivf.fitCentroids(e, k = 16, iters = 2)
    val queries = e.filter(col("vec_id") < 10)
    val ivf = Ivf
      .topK(e, queries, cents, k = 5, nprobe = 2)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ivf.count() // eager: result + audit consumers share this cache
    val exact = Similarity
      .bruteTopK(e, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val audit = Similarity
      .recallAudit(exact, ivf, Seq("query_id", "neighbor_id"))
      .select(col("recall").as("audit_recall_vs_brute"))
    ivf.crossJoin(broadcast(audit)).orderBy(col("query_id"), col("rank"))
  }

  /** Generated oracle for q35 — replays Ivf end to end in SQL. The
    * cosine used for assignment/probing is UNROUNDED, so it must match
    * the native expression bit-for-bit: DuckDB `list_reduce` is an
    * ordered left fold, giving the same three accumulator streams
    * (dot, ‖a‖², ‖b‖²) as the expression's loop (probed bit-exact);
    * the centroid side passes through CAST(… AS REAL) to mirror the
    * double→float truncation `Ivf.assign` applies. Decimal-staged
    * means make each Lloyd update order-independent, and empty cells
    * drop naturally from the GROUP BY on both engines.
    */
  /** Shared SQL fragments for replaying graft.ops.Ivf in an oracle
    * (used by q35Oracle and q78Oracle): the bit-exact cosine folds
    * (DuckDB list_reduce is an ordered left fold — probed 960/960
    * against the native expression), the Lloyd assign/update CTE pair,
    * and the deterministic first-k init. Every unrounded comparison in
    * the pipeline (assignment argmax, probe ranking, τ filters) runs
    * on these folds, so a trained quantizer replays exactly.
    */
  private object IvfSql {
    /** cosine(float-array column, double-list column truncated to
      * float) — the arithmetic of Ivf.assign's centroid scoring. */
    def cosFloatDouble(e: String, cd: String): String =
      s"(list_reduce(list_transform(list_zip($e, $cd), p -> CAST(p[1] AS DOUBLE) * CAST(CAST(p[2] AS REAL) AS DOUBLE)), (x,y) -> x+y) / " +
        s"(sqrt(list_reduce(list_transform($e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x+y)) * " +
        s"sqrt(list_reduce(list_transform($cd, x -> CAST(CAST(x AS REAL) AS DOUBLE) * CAST(CAST(x AS REAL) AS DOUBLE)), (x,y) -> x+y))))"

    /** cosine(float-array, float-array) — graft.expr.CosineSimilarity
      * verbatim (three ordered double accumulator folds). */
    def cosFloatFloat(a: String, b: String): String =
      s"(list_reduce(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x,y) -> x+y) / " +
        s"(sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x+y)) * " +
        s"sqrt(list_reduce(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x+y))))"

    /** Hard assignment under centroid CTE `cents`: nearest cell by
      * unrounded cosine, smaller cid on ties (Ivf.assign's argmax). */
    def assignCte(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosFloatDouble("e.embedding", "c.cd")} DESC, c.cid ASC) AS rn
         |    FROM e, $cents c
         |  ) WHERE rn = 1
         |)""".stripMargin

    /** Lloyd update: decimal-staged per-(cid, pos) means over the
      * assigned vectors; empty cells drop from the GROUP BY exactly as
      * they do in Ivf.fitCentroids. */
    def updateCte(name: String, assigned: String): String =
      s"""$name AS (
         |  SELECT cid, list(m ORDER BY pos) AS cd FROM (
         |    SELECT $assigned.cid, idx.i - 1 AS pos,
         |      CAST(SUM(CAST(CAST(e.embedding[idx.i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS m
         |    FROM $assigned JOIN e USING (vec_id)
         |    CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
         |    GROUP BY $assigned.cid, idx.i
         |  ) GROUP BY cid
         |)""".stripMargin

    /** init (first k rows by id) + `iters` assign/update pairs; the
      * final centroid CTE is `c<iters>`. Emits "c0 AS (...), a1 AS
      * (...), c1 AS (...), …" for splicing after `e`. */
    def lloydChain(k: Int, iters: Int): String = {
      val init =
        s"""c0 AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
           |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cd
           |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $k)
           |)""".stripMargin
      init + ", " + (1 to iters)
        .map(i => assignCte(s"a$i", s"c${i - 1}") + ", " + updateCte(s"c$i", s"a$i"))
        .mkString(", ")
    }
  }

  val q35Oracle: String = {
    val (k, iters, nprobe, kTop) = (16, 2, 2, 5)
    s"""WITH e AS (
       |  SELECT vec_id, embedding FROM embeddings
       |), ${IvfSql.lloydChain(k, iters)}, ${IvfSql.assignCte("idx2", s"c$iters")}, qp AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${IvfSql.cosFloatDouble("e.embedding", "c.cd")} DESC, c.cid ASC) AS rn
       |    FROM e, c$iters c WHERE e.vec_id < 10
       |  ) WHERE rn <= $nprobe
       |), cand AS (
       |  SELECT q.query_id, i.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]), 4) AS sim
       |  FROM qp q JOIN idx2 i USING (cid)
       |  JOIN e ce ON ce.vec_id = i.vec_id
       |  JOIN e qe ON qe.vec_id = q.query_id
       |  WHERE i.vec_id <> q.query_id
       |), ivf AS (
       |  SELECT query_id, rank, neighbor_id, sim FROM (
       |    SELECT query_id, neighbor_id, sim,
       |      row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |    FROM cand
       |  ) WHERE rank <= $kTop
       |), ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, cvec.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(list_cosine_similarity(cvec.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) DESC,
       |                 cvec.vec_id) AS rank
       |    FROM e cvec, e q WHERE q.vec_id < 10 AND cvec.vec_id <> q.vec_id
       |  ) WHERE rank <= $kTop
       |), aud AS (
       |  SELECT round(
       |    CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE), 4) AS audit_recall_vs_brute
       |  FROM ex LEFT JOIN (SELECT DISTINCT query_id, neighbor_id FROM ivf) i
       |    USING (query_id, neighbor_id)
       |)
       |SELECT ivf.query_id, ivf.rank, ivf.neighbor_id, ivf.sim, aud.audit_recall_vs_brute
       |FROM ivf, aud
       |ORDER BY ivf.query_id, ivf.rank""".stripMargin
  }

  // ---------------------------------------------------------------- q34
  /** Housekeeping retention predicate (reference app/housekeeping.py:15-17)
    * with a fixed cutoff: keep rows >= cutoff. The job form
    * (filter-and-overwrite) is jobs.Jobs.housekeeping.
    */
  def q34Retention(s: SparkSession, dir: String): DataFrame =
    graft.jobs.Jobs
      .retention(Tables.events(s, dir), "ts", java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  val q34Oracle: String =
    """SELECT event_id, user_id, event_type, value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q33
  /** The linear-output dedup shape for 100 TB: per-doc KEEP/DROP
    * assignment via one-hop min-propagation over LSH buckets (no
    * quadratic pair materialization). ORACLED since round 5 via the
    * generated signature-literal replay ([[q33OracleFor]]).
    * SELF-AUDITING: every row carries the corpus-level violation counts
    * of the two assignment invariants — a representative is never a
    * larger id than its member (min-propagation law), and an
    * identical-token-set class is never split across representatives
    * (the exact-dup-collapse law the 2-3× LSH speedup rests on). Both
    * audit_* columns must be 0.
    */
  def q33DedupAssign(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val assign = TextDedup
      .dedupAssignments(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assign.count() // eager: audit consumers share this cache
    val repOrder = assign.agg(
      coalesce(sum(when(col("rep_id") > col("doc_id"), 1).otherwise(0)), lit(0))
        .as("audit_rep_gt_id")
    )
    val fp = docs.select(
      col("doc_id"),
      xxhash64(concat_ws(" ", sort_array(TextDedup.tokenSet(col("text"))))).as("fp")
    )
    val splitClasses = assign
      .join(fp, "doc_id")
      .groupBy(col("fp"))
      .agg(countDistinct(col("rep_id")).as("nreps"))
      .agg(
        coalesce(sum(when(col("nreps") > 1, 1).otherwise(0)), lit(0))
          .as("audit_split_dup_classes")
      )
    assign
      .crossJoin(broadcast(repOrder))
      .crossJoin(broadcast(splitClasses))
      .orderBy(col("doc_id"))
  }

  /** Generated oracle for q33 (round 5). The banded signature rows are
    * engine-native (murmur3 token hash + xxhash64 band key — no DuckDB
    * equivalent), so they enter the oracle as a generated VALUES table
    * (TextDedup.repBandedSigs, one row per (distinct-set rep, band));
    * the oracle then replays the DETERMINISTIC RELATIONAL CORE in SQL:
    * exact-dup collapse from the raw documents table, bucket-min
    * propagation, rep→member expansion, and both corpus audits. What
    * this certifies: everything downstream of the signatures. What
    * grounds the signatures themselves: the q46/q48 exact-pair recall
    * chain — the same split as q94's trained-codebook replay.
    */
  /** The banded-signature rows of [[TextDedup.repBandedSigs]] (the
    * engine-native murmur3/xxhash64 half of the minhash pipeline) as a
    * SQL VALUES literal block — the shared seam of the q33/q27/q48
    * generated oracles. Driver-side collect by design: this is oracle
    * GENERATION (n_distinct_sets × bands narrow rows at verify scale),
    * not a query path.
    */
  private def bandedSigLiterals(df: DataFrame): String =
    TextDedup
      .repBandedSigs(df, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
      .map { case (id, band, bsig) => s"($id, $band, CAST($bsig AS BIGINT))" }
      .mkString(",\n    ")

  /** q44 generated oracle (round 6): embed the per-value xxhash64
    * dictionary over distinct l_partkey; DuckDB replays the full HLL
    * register/estimator law (see the q44 scaladoc for the bit-exact
    * derivation and the linear-counting regime argument). Driver-side
    * collect by design: oracle GENERATION over the bounded distinct
    * key set (|part| rows at verify scale), not a query path.
    */
  def q44OracleFor(s: SparkSession, dir: String): String = {
    val mask52 = (1L << 52) - 1
    val dictRows = Tables
      .lineitem(s, dir)
      .select(col("l_partkey"))
      .distinct()
      .withColumn("h", xxhash64(col("l_partkey")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .map { case (pk, h) => s"($pk, CAST($h AS BIGINT))" }
      .mkString(",\n    ")
    s"""WITH dict(pk, h) AS (VALUES
       |    $dictRows
       |), rk AS MATERIALIZED (
       |  SELECT pk, CAST((h >> 52) & 4095 AS INT) AS idx,
       |    53 - CASE WHEN (h & $mask52) = 0 THEN 0 ELSE len(bin(h & $mask52)) END AS rank
       |  FROM dict
       |), grp AS (
       |  SELECT DISTINCT l_returnflag AS flag, l_partkey AS pk FROM lineitem
       |), regs AS (
       |  SELECT g.flag, r.idx, MAX(r.rank) AS mr
       |  FROM grp g JOIN rk r USING (pk) GROUP BY g.flag, r.idx
       |), reg_stats AS (
       |  SELECT f.flag,
       |    CAST(SUM(CASE WHEN reg.mr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS zeros,
       |    SUM(CAST(1 AS DOUBLE) / CAST(1::BIGINT << CAST(COALESCE(reg.mr, 0) AS INT) AS DOUBLE)) AS hsum
       |  FROM (SELECT DISTINCT flag FROM grp) f
       |  CROSS JOIN range(4096) t(i)
       |  LEFT JOIN regs reg ON reg.flag = f.flag AND reg.idx = t.i
       |  GROUP BY f.flag
       |), est AS (
       |  SELECT flag,
       |    CASE WHEN (CAST('0.7213' AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST('1.079' AS DOUBLE) / 4096)) * 4096 * 4096 / hsum <= 2.5 * 4096 AND zeros > 0
       |      THEN 4096 * ln(CAST(4096 AS DOUBLE) / zeros)
       |      ELSE (CAST('0.7213' AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST('1.079' AS DOUBLE) / 4096)) * 4096 * 4096 / hsum
       |    END AS e
       |  FROM reg_stats
       |), base AS (
       |  SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS DOUBLE) AS exact_parts, COUNT(*) AS n
       |  FROM lineitem GROUP BY l_returnflag
       |)
       |SELECT b.l_returnflag, CAST(round(e.e) AS BIGINT) AS approx_parts, b.exact_parts, b.n,
       |  round(abs(CAST(round(e.e) AS BIGINT) - b.exact_parts) / b.exact_parts, 4) AS audit_rel_err
       |FROM base b JOIN est e ON e.flag = b.l_returnflag
       |ORDER BY b.l_returnflag""".stripMargin
  }

  /** q28 generated oracle (round 6): embed the engine's per-token
    * xxhash64 dictionary as literals; DuckDB independently replays the
    * whole SimHash algorithm — explode-distinct tokenization, the 64
    * per-bit ±1 votes ((h >> b) & 1 — arithmetic shift on both
    * engines), packing votes into one BIGINT (disjoint bits, so the
    * engine's OR-fold is a SUM here; bit 63 contributes −2⁶³ to stay
    * in signed range), then the bounded-slice audit: pairwise
    * bit_count(xor) Hamming vs exact token-set Jaccard, Pearson corr
    * rounded to 4. Driver-side collect by design: oracle GENERATION
    * over the distinct vocabulary (31 rows at verify scale), not a
    * query path.
    */
  def q28OracleFor(s: SparkSession, dir: String): String = {
    val dictRows = Tables
      .documents(s, dir)
      .select(explode(TextDedup.tokenSet(col("text"))).as("tok"))
      .distinct()
      .withColumn("h", xxhash64(col("tok")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
      .map { case (t, h) => s"('${t.replace("'", "''")}', CAST($h AS BIGINT))" }
      .mkString(",\n    ")
    s"""WITH dict(tok, h) AS (
       |  VALUES
       |    $dictRows
       |), toks AS (
       |  SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS tok
       |  FROM documents
       |), votes AS (
       |  SELECT t.doc_id, r.b,
       |    SUM(CASE WHEN ((d.h >> r.b) & 1) = 1 THEN 1 ELSE -1 END) AS v
       |  FROM toks t JOIN dict d USING (tok) CROSS JOIN range(64) r(b)
       |  GROUP BY t.doc_id, r.b
       |), sig AS (
       |  SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN
       |      CASE WHEN b = 63 THEN (-9223372036854775807 - 1)
       |           ELSE (1::BIGINT << CAST(b AS INT)) END
       |      ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY doc_id
       |), slice AS (
       |  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS tk
       |  FROM documents WHERE doc_id < 500
       |), audit AS (
       |  SELECT round(corr(
       |    CAST(bit_count(xor(sa.simhash, sb.simhash)) AS DOUBLE),
       |    CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) /
       |    CAST(len(a.tk) + len(b.tk) - len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE)
       |  ), 4) AS audit_ham_jac_corr
       |  FROM slice a JOIN slice b ON a.doc_id < b.doc_id
       |  JOIN sig sa ON sa.doc_id = a.doc_id
       |  JOIN sig sb ON sb.doc_id = b.doc_id
       |)
       |SELECT sig.doc_id, sig.simhash, audit.audit_ham_jac_corr
       |FROM sig, audit ORDER BY sig.doc_id""".stripMargin
  }

  def q33OracleFor(s: SparkSession, dir: String): String = {
    val sigRows = bandedSigLiterals(Tables.documents(s, dir))
    s"""WITH bs(doc_id, band, bsig) AS (
       |  VALUES
       |    $sigRows
       |), toks AS (
       |  SELECT doc_id, list_sort(list_distinct(string_split_regex(trim(text), '\\s+'))) AS tk
       |  FROM documents
       |), reps AS (
       |  SELECT tk, MIN(doc_id) AS rep FROM toks GROUP BY tk
       |), members AS (
       |  SELECT r.rep AS grp, t.doc_id FROM toks t JOIN reps r USING (tk)
       |), bucket_min AS (
       |  SELECT band, bsig, MIN(doc_id) AS bucket_min FROM bs GROUP BY band, bsig
       |), rep_assign AS (
       |  SELECT bs.doc_id AS grp, MIN(bm.bucket_min) AS rep_id
       |  FROM bs JOIN bucket_min bm USING (band, bsig)
       |  GROUP BY bs.doc_id
       |), assign AS (
       |  SELECT m.doc_id, ra.rep_id, ra.rep_id = m.doc_id AS is_kept
       |  FROM members m JOIN rep_assign ra USING (grp)
       |), a1 AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN rep_id > doc_id THEN 1 ELSE 0 END), 0) AS BIGINT)
       |    AS audit_rep_gt_id
       |  FROM assign
       |), a2 AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN nreps > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
       |    AS audit_split_dup_classes
       |  FROM (
       |    SELECT t.tk, COUNT(DISTINCT a.rep_id) AS nreps
       |    FROM assign a JOIN toks t USING (doc_id)
       |    GROUP BY t.tk
       |  )
       |)
       |SELECT assign.doc_id, assign.rep_id, assign.is_kept,
       |  a1.audit_rep_gt_id, a2.audit_split_dup_classes
       |FROM assign, a1, a2
       |ORDER BY assign.doc_id""".stripMargin
  }

  /** Shared replay body for the q27/q48 generated oracles: from the
    * embedded banded-signature literals, rebuild EXACTLY the minhash
    * pair stream `TextDedup.nearDupsMinhash(threshold=0.9, 16×16)`
    * emits — exact-dup collapse (sorted distinct-token sets keyed by
    * value), intra-class pairs at jac = 1.0, LSH candidate self-join on
    * (band, bsig) over class representatives, the size-ratio prefilter,
    * exact-Jaccard verification at >= 0.9, and member-pair expansion.
    * `docFilter` bounds the corpus (q48 replays the doc_id<500 slice).
    */
  private def minhashPairsReplay(sigRows: String, docFilter: String): String =
    s"""WITH bs(doc_id, band, bsig) AS (
       |  VALUES
       |    $sigRows
       |), toks AS (
       |  SELECT doc_id, list_sort(list_distinct(string_split_regex(trim(text), '\\s+'))) AS tk
       |  FROM documents $docFilter
       |), reps AS (
       |  SELECT tk, MIN(doc_id) AS rep FROM toks GROUP BY tk
       |), members AS (
       |  SELECT r.rep AS grp, t.doc_id FROM toks t JOIN reps r USING (tk)
       |), repsz AS (
       |  SELECT rep, tk, len(tk) AS sz FROM reps
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS rep_a, b.doc_id AS rep_b
       |  FROM bs a JOIN bs b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
       |), reppairs AS (
       |  SELECT c.rep_a, c.rep_b,
       |    CAST(len(list_filter(ra.tk, x -> list_contains(rb.tk, x))) AS DOUBLE) /
       |    CAST(ra.sz + rb.sz - len(list_filter(ra.tk, x -> list_contains(rb.tk, x))) AS DOUBLE) AS jac
       |  FROM cand c
       |  JOIN repsz ra ON c.rep_a = ra.rep
       |  JOIN repsz rb ON c.rep_b = rb.rep
       |  WHERE CAST(LEAST(ra.sz, rb.sz) AS DOUBLE) >= CAST(GREATEST(ra.sz, rb.sz) AS DOUBLE) * 0.9
       |), pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(1.0 AS DOUBLE) AS jac
       |  FROM members a JOIN members b ON a.grp = b.grp AND a.doc_id < b.doc_id
       |  UNION ALL
       |  SELECT LEAST(ma.doc_id, mb.doc_id) AS id_a,
       |         GREATEST(ma.doc_id, mb.doc_id) AS id_b, rp.jac
       |  FROM reppairs rp
       |  JOIN members ma ON ma.grp = rp.rep_a
       |  JOIN members mb ON mb.grp = rp.rep_b
       |  WHERE rp.jac >= 0.9
       |)""".stripMargin

  /** q27 generated oracle (round 6): the q33 signature-literal move
    * extended to the census form — replay the full minhash pair stream
    * from the embedded banded signatures, then the same linear census
    * aggregate (counts split on jac = 1, decimal-staged mean).
    */
  def q27OracleFor(s: SparkSession, dir: String): String = {
    val sigRows = bandedSigLiterals(Tables.documents(s, dir))
    s"""${minhashPairsReplay(sigRows, "")}
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(CASE WHEN jac = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup_pairs,
       |  CAST(SUM(CASE WHEN jac < 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup_pairs,
       |  CASE WHEN COUNT(*) > 0
       |    THEN round(CAST(SUM(CAST(jac AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) END AS mean_jac,
       |  CASE WHEN COUNT(*) > 0 THEN round(MIN(jac), 6) END AS min_jac
       |FROM pairs""".stripMargin
  }

  /** q48 generated oracle (round 6 stretch): replay the found-pair set
    * from the SLICE's banded signatures and score it against the exact
    * pair list (q46's oracle body) relationally — recall stops being a
    * recorded-only audit figure and becomes a checked one.
    */
  def q48OracleFor(s: SparkSession, dir: String): String = {
    val sigRows =
      bandedSigLiterals(Tables.documents(s, dir).filter(col("doc_id") < 500))
    s"""${minhashPairsReplay(sigRows, "WHERE doc_id < 500")},
       |exact AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
       |  WHERE CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) /
       |        CAST(len(a.tk) + len(b.tk) - len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) >= 0.9
       |)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
       |  CAST(SUM(CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       |  round(CAST(SUM(CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
       |        CAST(COUNT(*) AS DOUBLE), 4) AS recall
       |FROM exact e
       |LEFT JOIN pairs p ON e.id_a = p.id_a AND e.id_b = p.id_b""".stripMargin
  }

  // ---------------------------------------------------------------- q32
  /** Multimodal pipeline, REAL codec since round 6: documents →
    * [[Multimodal.renderPng]] (payload bytes rasterized under the
    * closed-form raster law, PNG-encoded via javax.imageio) →
    * [[Multimodal.decodeImage]] (ImageIO.read back — header dims, pixel
    * (0,0) channels, integer-exact luminance sum, grid-mean pixel
    * features) → frame-sample explode over the PNG bytes → per-media
    * rollup with the frame-law audits.
    *
    * ORACLED since round 6 (static SQL, [[q32Oracle]]): the raster law
    * makes every decoded value a closed form over the raw text bytes —
    * width = 8+len%9, height = 8+len%7, px00_r = byte 0,
    * px00_g = byte 7%len, px00_b = byte 13%len, and lum_sum the sum of
    * all three channel formulas over every pixel index. DuckDB
    * recomputes them from `documents.text` (ASCII at every SF, so
    * ascii(substr()) = byte); a hash match therefore certifies the
    * whole ImageIO encode → PNG → ImageIO decode round trip
    * end-to-end, pixel-exactly — plus the frame-law and feature-law
    * audit zeros. What stays engine-only (PNG byte LENGTH, and so the
    * absolute frame count) is deliberately kept out of the checked
    * output and asserted in MultimodalSpec instead.
    */
  def q32Multimodal(s: SparkSession, dir: String): DataFrame = {
    val rendered = Multimodal.renderPng(Tables.documents(s, dir), "doc_id", "text")
    val media = Multimodal.asMedia(rendered, "doc_id", "png", "image")
    val decoded = Multimodal.decodeImage(media, dim = 8)
    val frames = Multimodal.frameSample(decoded, frameBytes = 64, stride = 48)
    // Audit laws (violation counts must be 0, pinned by the oracle):
    // every frame's length equals min(frameBytes, n_bytes − idx·stride),
    // the frame count matches the generator's closed form, every decode
    // succeeded, and the feature vector is fixed-dim with values in
    // (−1, 1). width/height/px00/lum_sum come from the REAL decoded
    // pixels and are constant per media (max = the value).
    frames
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        max(col("meta.n_bytes")).as("n_bytes"),
        max(col("width")).as("width"),
        max(col("height")).as("height"),
        max(col("px00_r")).as("px00_r"),
        max(col("px00_g")).as("px00_g"),
        max(col("px00_b")).as("px00_b"),
        max(col("lum_sum")).as("lum_sum"),
        max(when(!col("decode_ok"), 1).otherwise(0)).as("audit_undecoded"),
        sum(
          when(
            length(col("frame_bytes")) =!=
              least(lit(64), col("meta.n_bytes") - col("frame_idx") * 48),
            1
          ).otherwise(0)
        ).as("audit_bad_frame_len"),
        max(
          when(
            size(col("features")) =!= 8 ||
              exists(col("features"), v => v <= -1.0f || v >= 1.0f),
            1
          ).otherwise(0)
        ).as("audit_bad_features")
      )
      .withColumn(
        "audit_bad_frame_count",
        when(
          col("n_frames") =!=
            greatest(floor((col("n_bytes") - 64).cast("double") / 48).cast("int") + 1, lit(1)),
          1
        ).otherwise(0)
      )
      // n_frames/n_bytes depend on the PNG encoder's byte output — real
      // codec artifacts with no relational closed form; they feed the
      // frame-count audit above and stay out of the checked columns
      .select(
        col("media_id"),
        col("width"),
        col("height"),
        col("px00_r"),
        col("px00_g"),
        col("px00_b"),
        col("lum_sum"),
        col("audit_undecoded"),
        col("audit_bad_frame_len").cast("long").as("audit_bad_frame_len"),
        col("audit_bad_frame_count"),
        col("audit_bad_features")
      )
      .orderBy(col("media_id"))
  }

  /** q32's static oracle: replay the raster law + audit zeros from the
    * raw text (see q32Multimodal scaladoc; len(text) = byte length —
    * the corpus is ASCII at every SF, probed).
    */
  val q32Oracle: String =
    """SELECT doc_id AS media_id,
      |  CAST(8 + length(text) % 9 AS INT) AS width,
      |  CAST(8 + length(text) % 7 AS INT) AS height,
      |  ascii(substr(text, 1, 1)) AS px00_r,
      |  ascii(substr(text, (7 % length(text)) + 1, 1)) AS px00_g,
      |  ascii(substr(text, (13 % length(text)) + 1, 1)) AS px00_b,
      |  CAST(list_sum(list_transform(range((8 + length(text) % 9) * (8 + length(text) % 7)), i ->
      |    ascii(substr(text, (i % length(text)) + 1, 1)) +
      |    ascii(substr(text, ((i * 31 + 7) % length(text)) + 1, 1)) +
      |    ascii(substr(text, ((i * 131 + 13) % length(text)) + 1, 1)))) AS BIGINT) AS lum_sum,
      |  0 AS audit_undecoded,
      |  CAST(0 AS BIGINT) AS audit_bad_frame_len,
      |  0 AS audit_bad_frame_count,
      |  0 AS audit_bad_features
      |FROM documents
      |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q108
  /** Audio pipeline, REAL codec (round 6): documents →
    * [[Multimodal.renderWav]] (payload synthesized into mono 16-bit PCM
    * under the closed-form audio law, RIFF/WAV-encoded via
    * javax.sound.sampled) → [[Multimodal.decodeAudio]]
    * (AudioSystem.getAudioInputStream back — header rate, frame count,
    * first decoded sample, integer-exact Σ|sample|, envelope bins from
    * the actual PCM) → per-media checked row.
    *
    * ORACLED (static SQL, [[q108Oracle]]): like q32, the audio law
    * makes every decoded value a closed form over the raw text bytes —
    * a hash match certifies the WAV encode → RIFF → decode round trip
    * sample-exactly. The envelope stays engine-side (float bins),
    * pinned by its audit zero + MultimodalSpec.
    */
  def q108AudioDecode(s: SparkSession, dir: String): DataFrame = {
    val rendered = Multimodal.renderWav(Tables.documents(s, dir), "doc_id", "text")
    val media = Multimodal.asMedia(rendered, "doc_id", "wav", "audio")
    Multimodal
      .decodeAudio(media, dim = 8)
      .select(
        col("media_id"),
        col("sample_rate"),
        col("n_samples"),
        col("first_sample"),
        col("amp_sum"),
        when(!col("decode_ok"), 1).otherwise(0).as("audit_undecoded"),
        // −1.0 exactly is legal (an all-silent bin); only out-of-range
        // or wrong-dim vectors are violations
        when(
          size(col("envelope")) =!= 8 ||
            exists(col("envelope"), v => v < -1.0f || v >= 1.0f),
          1
        ).otherwise(0).as("audit_bad_envelope")
      )
      .orderBy(col("media_id"))
  }

  /** q108's static oracle: replay the audio law from the raw text (the
    * signed-16 CASE never fires on this ASCII corpus — hi < 128 — but
    * the replay keeps the general form).
    */
  val q108Oracle: String = {
    def sample(hiIdx: String, loIdx: String): String =
      s"""CASE WHEN ascii(substr(text, ($hiIdx) + 1, 1)) >= 128
         |    THEN ascii(substr(text, ($hiIdx) + 1, 1)) * 256 + ascii(substr(text, ($loIdx) + 1, 1)) - 65536
         |    ELSE ascii(substr(text, ($hiIdx) + 1, 1)) * 256 + ascii(substr(text, ($loIdx) + 1, 1)) END""".stripMargin
    s"""SELECT doc_id AS media_id,
       |  CAST(8000 + (length(text) % 8) * 1000 AS INT) AS sample_rate,
       |  CAST(length(text) * 4 AS BIGINT) AS n_samples,
       |  ${sample("3 % length(text)", "0")} AS first_sample,
       |  CAST(list_sum(list_transform(range(length(text) * 4), i ->
       |    abs(${sample("(i * 17 + 3) % length(text)", "i % length(text)")}))) AS BIGINT) AS amp_sum,
       |  0 AS audit_undecoded,
       |  0 AS audit_bad_envelope
       |FROM documents
       |ORDER BY media_id""".stripMargin
  }

  // ---------------------------------------------------------------- q109
  /** IVF-PQ two-stage ANN serving (round 6) — the PRODUCTION vector
    * search stack composed from the proven pieces: an IVF coarse
    * quantizer (q35's trained k-means) partitions the corpus into
    * cells; every vector is PQ-encoded (q94's 16×4-bit codes, 32×
    * memory); a query probes its `nprobe` nearest cells, ADC-scores
    * ONLY the codes in those cells (≈ nprobe/k of the corpus), takes a
    * shortlist, and exact-reranks the shortlisted raw floats. At
    * 100 TB this is the shape that serves: the float corpus is never
    * scanned — a probe touches nprobe/k of an 8-byte-per-vector code
    * table map-side, and the float fetch is shortlist-sized.
    * Self-auditing: recall@k against the exact brute top-k over the
    * FULL corpus, plus the measured scanned fraction.
    *
    * ORACLED (dynamic, [[q109OracleFor]]): composes the two trained
    * replays end-to-end — IvfSql's Lloyd chain re-trains the coarse
    * quantizer in SQL, the fitted PQ codebooks embed as literals
    * (q94's builders), and probing, candidate confinement, ADC,
    * re-rank, recall and scanned-fraction arithmetic all replay
    * relationally.
    */
  private val q109KCells = 16
  private val q109IvfIters = 2
  private val q109Nprobe = 2
  private val q109NQ = 20
  private val q109K = 10
  private val q109Short = 40

  def q109IvfPq(s: SparkSession, dir: String): DataFrame = {
    val (kc, ivfIters, nprobe) = (q109KCells, q109IvfIters, q109Nprobe)
    val (m, ksub, pqIters) = (q94M, q94Ksub, q94Iters)
    val (nQ, k, short) = (q109NQ, q109K, q109Short)
    val e = Tables
      .embeddings(s, dir)
      .select(
        col("vec_id"),
        col("embedding"), // raw floats: centroid scoring + exact rerank/baseline
        Pq.normalize(col("embedding")).as("vec") // normalized: PQ fit/encode/LUT
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = e.count() // eager: fit + encode + probe + baseline share this cache
    val cents = Ivf.fitCentroids(e, kc, ivfIters)
    val assigned = Ivf.assign(e, cents)
    val codebooks = Pq.fit(e.filter(pmod(col("vec_id"), lit(4)) === 0), m, ksub, pqIters)
    // the serving-side index: 8-byte codes + a cell id per vector —
    // this narrow frame is ALL a probe ever scans
    val encoded = Pq
      .encode(e, codebooks)
      .join(assigned.select(col("vec_id"), col("cluster_id")), "vec_id")
    val queries = e.filter(col("vec_id") < nQ)
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cluster_id"))
    val probes = queries
      .crossJoin(broadcast(cents))
      .withColumn(
        "sim",
        Similarity.cosine(col("embedding"), transform(col("centroid"), _.cast("float")))
      )
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"), col("cluster_id"))
    val cands = encoded
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("qvec"), col("codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cands.count() // eager: scanned-fraction + ADC consumers share this cache
    val scanned = cands
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_cand"))
      .agg(round(sum(col("n_cand")) / lit(nQ.toDouble * (n - 1)), 4).as("scanned_fraction"))
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    val shortlist = cands
      .select(
        col("query_id"),
        col("neighbor_id"),
        Pq.adcScore(col("qvec"), col("codes"), codebooks).as("score")
      )
      .withColumn("rank", row_number().over(wa))
      .filter(col("rank") <= short)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rscore").desc, col("neighbor_id"))
    val reranked = shortlist
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nemb")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("rscore", Similarity.cosine(col("qemb"), col("nemb")))
      .withColumn("rrank", row_number().over(wr))
      .filter(col("rrank") <= k)
    val wx = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("xscore").desc, col("neighbor_id"))
    val exact = e
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        Similarity.cosine(col("qemb"), col("embedding")).as("xscore")
      )
      .withColumn("xrank", row_number().over(wx))
      .filter(col("xrank") <= k)
    val recall = reranked
      .select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id"))
      .agg(round(count(lit(1)) / lit(nQ.toDouble * k), 4).as("recall_at_k"))
    recall
      .crossJoin(broadcast(scanned))
      .select(
        lit(n).as("n_vectors"),
        lit(nQ).as("n_queries"),
        lit(k).as("k"),
        lit(kc).as("cells"),
        lit(nprobe).as("nprobe"),
        lit(short).as("shortlist"),
        col("recall_at_k"),
        col("scanned_fraction"),
        lit((64 * 4) / (q94M / 2)).as("compression_x")
      )
  }

  /** q109 generated oracle — the composed trained replay (mirrors
    * q94OracleFor's codebook/encode/LUT builders verbatim and splices
    * in IvfSql's Lloyd chain; kept self-contained so q94's green
    * generator stays untouched).
    */
  def q109OracleFor(s: SparkSession, dir: String): String = {
    val (kc, ivfIters, nprobe) = (q109KCells, q109IvfIters, q109Nprobe)
    val (m, ksub, pqIters) = (q94M, q94Ksub, q94Iters)
    val (nQ, k, short) = (q109NQ, q109K, q109Short)
    val dim = 64
    val dsub = dim / m
    val eFit = Tables
      .embeddings(s, dir)
      .select(col("vec_id"), Pq.normalize(col("embedding")).as("vec"))
      .filter(pmod(col("vec_id"), lit(4)) === 0)
    val codebooks = Pq.fit(eFit, m, ksub, pqIters)
    val n = Tables.embeddings(s, dir).count()
    val cwRows = (0 until m)
      .flatMap { sIdx =>
        codebooks(sIdx).sortBy(_._1).map { case (code, w) =>
          val ws = w.map(x => s"CAST('$x' AS DOUBLE)").mkString(", ")
          s"($sIdx, $code, $ws)"
        }
      }
      .mkString(",\n    ")
    val normChain = (1 to dim)
      .map(i => s"CAST(embedding[$i] AS DOUBLE)*CAST(embedding[$i] AS DOUBLE)")
      .mkString(" + ")
    def sqDistChain(vec: String): String =
      (1 to dsub)
        .map(j => s"($vec[cw.s*$dsub+$j]-cw.w$j)*($vec[cw.s*$dsub+$j]-cw.w$j)")
        .mkString(" + ")
    def dotChain(vec: String): String =
      (1 to dsub).map(j => s"$vec[cw.s*$dsub+$j]*cw.w$j").mkString(" + ")
    val cosRR = IvfSql.cosFloatFloat("ce.embedding", "qe.embedding")
    val cosEX = IvfSql.cosFloatFloat("c.embedding", "q.embedding")
    s"""WITH cw(s, code, ${(1 to dsub).map("w" + _).mkString(", ")}) AS (
       |  VALUES
       |    $cwRows
       |), e AS (
       |  SELECT vec_id, embedding FROM embeddings
       |), ${IvfSql.lloydChain(kc, ivfIters)}, ${IvfSql.assignCte("idx2", s"c$ivfIters")}, qp AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${IvfSql.cosFloatDouble("e.embedding", "c.cd")} DESC, c.cid ASC) AS rn
       |    FROM e, c$ivfIters c WHERE e.vec_id < $nQ
       |  ) WHERE rn <= $nprobe
       |), nv AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) / sqrt($normChain)) AS v
       |  FROM e
       |), enc AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT nv.vec_id, cw.s, cw.code,
       |      row_number() OVER (PARTITION BY nv.vec_id, cw.s
       |        ORDER BY (${sqDistChain("nv.v")}) ASC, cw.code ASC) AS rn
       |    FROM nv, cw
       |  ) WHERE rn = 1
       |), lut AS (
       |  SELECT q.vec_id AS query_id, cw.s, cw.code, (${dotChain("q.v")}) AS d
       |  FROM nv q, cw WHERE q.vec_id < $nQ
       |), cand AS (
       |  SELECT q.query_id, i.vec_id AS neighbor_id
       |  FROM qp q JOIN idx2 i USING (cid)
       |  WHERE i.vec_id <> q.query_id
       |), sf AS (
       |  SELECT round(count(*) / CAST('${nQ.toDouble * (n - 1)}' AS DOUBLE), 4) AS scanned_fraction
       |  FROM cand
       |), adc AS (
       |  SELECT l.query_id, en.vec_id AS neighbor_id,
       |    list_reduce(list(l.d ORDER BY l.s), (x, y) -> x + y) AS score
       |  FROM enc en
       |  JOIN lut l ON en.s = l.s AND en.code = l.code
       |  JOIN cand c ON c.query_id = l.query_id AND c.neighbor_id = en.vec_id
       |  GROUP BY l.query_id, en.vec_id
       |), short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
       |    FROM adc
       |  ) WHERE rank <= $short
       |), rrk AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT s.query_id, s.neighbor_id,
       |      row_number() OVER (PARTITION BY s.query_id ORDER BY $cosRR DESC, s.neighbor_id) AS rrank
       |    FROM short s
       |    JOIN e ce ON s.neighbor_id = ce.vec_id
       |    JOIN e qe ON s.query_id = qe.vec_id
       |  ) WHERE rrank <= $k
       |), ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY $cosEX DESC, c.vec_id) AS xrank
       |    FROM e c, e q WHERE q.vec_id < $nQ AND c.vec_id <> q.vec_id
       |  ) WHERE xrank <= $k
       |), rc AS (
       |  SELECT round(count(*) / CAST('${nQ.toDouble * k}' AS DOUBLE), 4) AS recall_at_k
       |  FROM rrk JOIN ex USING (query_id, neighbor_id)
       |)
       |SELECT CAST($n AS BIGINT) AS n_vectors, $nQ AS n_queries, $k AS k,
       |  $kc AS cells, $nprobe AS nprobe, $short AS shortlist,
       |  rc.recall_at_k, sf.scanned_fraction,
       |  ${(64 * 4) / (m / 2)} AS compression_x
       |FROM rc, sf""".stripMargin
  }

  // ---------------------------------------------------------------- q110
  /** CCNet-style statistical LM quality scoring (ops/LmScore): a
    * word-bigram add-one LM trained on the doc_id % 10 == 0 reference
    * slice scores every held-out doc's mean per-bigram negative
    * log-likelihood plus its unseen-bigram rate — the
    * perplexity-proxy filter signal real web-corpus pipelines rank
    * and threshold on, complementing q21's rule-based heuristics with
    * a DISTRIBUTION-relative score. Model aggregates shuffle on gram
    * keys with map-side partials; the fitted model broadcasts to the
    * scorers (a model artifact, shipped like CCNet's KenLM binary);
    * candidates are touched once map-side + one doc-keyed aggregate.
    *
    * Oracle: static full replay — gram construction, both count
    * tables, V, the smoothed nll terms (one `ln` of an integer ratio
    * per bigram, bitwise-identical cross-engine) and the
    * decimal(38,12)-staged per-doc sum (order-independent AND immune
    * to sub-1e-12 ulp drift) all recompute in DuckDB from raw text.
    */
  def q110LmScore(s: SparkSession, dir: String): DataFrame =
    LmScore
      .scoreHeldOut(
        Tables.documents(s, dir),
        "doc_id",
        "text",
        refPred = col("doc_id") % 10 === 0
      )
      .orderBy(col("doc_id"))

  /** The q110 scoring law as a reusable CTE chain ending in `scored`
    * (doc_id, n_bigrams, avg_nll, oov_bigram_rate) — q110's final select
    * and q117's bucketing both append to it, so the two oracles share
    * the LM definition by construction (the q96 unrolled-rounds
    * precedent).
    */
  private val lmScoredChainSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
      |), bi AS (
      |  SELECT doc_id, tk[u.i] AS u, tk[u.i + 1] AS w
      |  FROM toks, LATERAL unnest(range(1, len(tk))) AS u(i)
      |), big AS (
      |  SELECT u, w, CAST(COUNT(*) AS BIGINT) AS cuw
      |  FROM bi WHERE doc_id % 10 = 0 GROUP BY u, w
      |), uni AS (
      |  SELECT u, CAST(COUNT(*) AS BIGINT) AS cu
      |  FROM bi WHERE doc_id % 10 = 0 GROUP BY u
      |), vv AS (
      |  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
      |  FROM (SELECT unnest(tk) AS tok FROM toks WHERE doc_id % 10 = 0)
      |), terms AS (
      |  SELECT h.doc_id,
      |    -ln(CAST(COALESCE(big.cuw, 0) + 1 AS DOUBLE) /
      |        CAST(COALESCE(uni.cu, 0) + vv.v AS DOUBLE)) AS nll,
      |    CASE WHEN big.cuw IS NULL THEN 1 ELSE 0 END AS oov
      |  FROM bi h
      |  LEFT JOIN big ON h.u = big.u AND h.w = big.w
      |  LEFT JOIN uni ON h.u = uni.u, vv
      |  WHERE h.doc_id % 10 <> 0
      |), scored AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    round(CAST(SUM(CAST(nll AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS avg_nll,
      |    round(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) AS oov_bigram_rate
      |  FROM terms GROUP BY doc_id
      |)""".stripMargin

  val q110Oracle: String =
    lmScoredChainSql +
      """
        |SELECT doc_id, n_bigrams, avg_nll, oov_bigram_rate
        |FROM scored ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q65
  /** Salted equi-join in-registry (ops.Skew spec-only until now): the
    * static skew remedy for a hot join key — fact rows get a uniform
    * content-hash salt, the dim side is replicated `salt` times, and the
    * join key becomes (key, salt), spreading one hot key over `salt`
    * reducers. The fact side carries a SHUFFLE_MERGE hint so the query
    * exercises the shuffle-join regime salting exists for (a broadcast
    * join has no reducer hotspot to spread). Output provably equals the
    * plain join — the oracle is the unsalted SQL join.
    */
  def q65SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables
      .lineitem(s, dir)
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
      .hint("shuffle_merge")
    val dim = Tables.part(s, dir).select(col("p_partkey").as("l_partkey"), col("p_name"))
    Skew
      .saltedJoin(fact, dim, "l_partkey", salt = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"), col("p_name"))
      .orderBy(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_partkey"),
        col("l_quantity"),
        col("p_name")
      )
  }

  val q65Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, p_name
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity, p_name""".stripMargin

  // ---------------------------------------------------------------- q66
  /** TF-IDF top-3 terms per document — the classic text-weighting shape:
    * one shuffle on (doc_id, term) for term frequency, a tiny term-level
    * aggregate for document frequency (broadcast back), and a windowed
    * top-k that Catalyst executes with a map-side Partial
    * WindowGroupLimit. Scores round to 6 decimals BEFORE ranking so both
    * engines rank identical keys (ties break on term).
    */
  def q66Tfidf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables
      .documents(s, dir)
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
    val tf = d
      .select(col("doc_id"), col("n_tokens"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("n_tokens"), col("term"))
      .agg(count(lit(1)).as("tc"))
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).cast("double").as("n_docs"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn(
        "tfidf",
        round(
          (col("tc").cast("double") / col("n_tokens").cast("double")) *
            log(col("n_docs") / col("df").cast("double")),
          6
        )
      )
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tc"), col("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val q66Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), t AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, unnest(toks) AS term FROM d
      |), tf AS (
      |  SELECT doc_id, n_tokens, term, CAST(count(*) AS BIGINT) AS tc FROM t GROUP BY 1, 2, 3
      |), n AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
      |), df AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
      |), sc AS (
      |  SELECT tf.doc_id, tf.term, tf.tc,
      |    round((CAST(tf.tc AS DOUBLE) / CAST(tf.n_tokens AS DOUBLE)) *
      |          ln(n.n_docs / CAST(df.df AS DOUBLE)), 6) AS tfidf
      |  FROM tf JOIN df USING (term), n
      |), r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank FROM sc
      |)
      |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tc, tfidf
      |FROM r WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  // ---------------------------------------------------------------- q67
  /** End-to-end C4-style CLEANING PIPELINE — the composition the whole
    * text-extension exists for, as ONE declarative plan: language-ID
    * gate → quality-score gate → length gate → exact dedup (first-wins
    * per fingerprint) → PII redaction + whitespace normalization. All
    * map-side except the dedup window's one shuffle on the 32-char
    * fingerprint; Catalyst fuses every gate into the scan's
    * WholeStageCodegen span. At 100 TB the filters run BEFORE the
    * shuffle, so the dedup exchange carries only survivors.
    */
  def q67CleanPipeline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored =
      TextStats.withLangId(TextStats.withQuality(Tables.documents(s, dir), "text"), "text")
    val kept = scored
      .filter(
        col("lang_pred") === "en" && col("quality_score") >= 0.55 && col("n_tokens") >= 20
      )
      .withColumn("fp", TextStats.fingerprint(col("text")))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    kept
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"),
        col("source"),
        col("n_tokens"),
        round(col("quality_score"), 6).as("quality"),
        TextStats.normalizeWs(TextStats.redactPii(col("text"))).as("clean_text")
      )
      .orderBy(col("doc_id"))
  }

  val q67Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, source, text, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), f AS (
      |  SELECT doc_id, source, text,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
      |    CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS BIGINT) AS stop_count,
      |    CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is'], x))) AS BIGINT) AS cnt_en,
      |    CAST(len(list_filter(toks, x -> list_contains(['el','la','de','que','y'], x))) AS BIGINT) AS cnt_es,
      |    CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))) AS BIGINT) AS cnt_de
      |  FROM t
      |), q AS (
      |  SELECT *,
      |    0.4 * (CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE)) +
      |    0.3 * (1.0 - CAST(stop_count AS DOUBLE) / CAST(n_tokens AS DOUBLE)) +
      |    0.3 * least(CAST(n_tokens AS DOUBLE) / 200.0, 1.0) AS quality_score,
      |    CASE WHEN cnt_en >= cnt_es AND cnt_en >= cnt_de AND cnt_en > 0 THEN 'en'
      |         WHEN cnt_es >= cnt_de AND cnt_es > 0 THEN 'es'
      |         WHEN cnt_de > 0 THEN 'de'
      |         ELSE 'unknown' END AS lang_pred
      |  FROM f
      |), kept AS (
      |  SELECT *, md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp
      |  FROM q
      |  WHERE lang_pred = 'en' AND quality_score >= 0.55 AND n_tokens >= 20
      |), dedup AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM kept
      |)
      |SELECT doc_id, source, n_tokens, round(quality_score, 6) AS quality,
      |  trim(regexp_replace(
      |    regexp_replace(
      |      regexp_replace(text,
      |        '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |      '\+?[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g'),
      |    '\s+', ' ', 'g')) AS clean_text
      |FROM dedup WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q68
  /** Per-source DEDUPLICATION STATS — the corpus-curation dashboard
    * numbers: per source, document count, distinct-fingerprint count,
    * within-source duplicate count/rate, and how many of its documents
    * also appear (by fingerprint) in at least one other source
    * (cross-source contamination). Two aggregates over the fingerprint
    * frame plus one fp-keyed join; the text itself never shuffles — only
    * 32-char fingerprints move.
    */
  def q68SourceDedupStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(s, dir)
      .select(col("source"), col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    d.count() // eager: three consumers share this cache
    val perSrc = d
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_distinct"))
    val fpSources = d.groupBy(col("fp")).agg(countDistinct(col("source")).as("n_sources"))
    val crossDocs = d
      .join(fpSources, Seq("fp"))
      .filter(col("n_sources") > 1)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_cross_docs"))
    perSrc
      .join(crossDocs, Seq("source"), "left")
      .select(
        col("source"),
        col("n_docs"),
        col("n_distinct"),
        (col("n_docs") - col("n_distinct")).as("n_dup_docs"),
        round(
          (col("n_docs") - col("n_distinct")).cast("double") / col("n_docs").cast("double"),
          6
        ).as("dup_rate"),
        coalesce(col("n_cross_docs"), lit(0L)).as("n_cross_docs")
      )
      .orderBy(col("source"))
  }

  val q68Oracle: String =
    """WITH d AS (
      |  SELECT source, doc_id, md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp
      |  FROM documents
      |), per_src AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct
      |  FROM d GROUP BY source
      |), fps AS (
      |  SELECT fp, COUNT(DISTINCT source) AS n_sources FROM d GROUP BY fp
      |), cross_docs AS (
      |  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_cross_docs
      |  FROM d JOIN fps USING (fp) WHERE fps.n_sources > 1 GROUP BY d.source
      |)
      |SELECT p.source, p.n_docs, p.n_distinct,
      |  p.n_docs - p.n_distinct AS n_dup_docs,
      |  round(CAST(p.n_docs - p.n_distinct AS DOUBLE) / CAST(p.n_docs AS DOUBLE), 6) AS dup_rate,
      |  COALESCE(c.n_cross_docs, CAST(0 AS BIGINT)) AS n_cross_docs
      |FROM per_src p LEFT JOIN cross_docs c ON p.source = c.source
      |ORDER BY p.source""".stripMargin

  // ---------------------------------------------------------------- q69
  /** CUBE analytics over events: all four grouping sets of (event_type,
    * day) in one pass — Spark expands the grouping sets and aggregates
    * once (no four-scan union). Null group members are disambiguated
    * from real values via grouping() (rolled-up slots render '<all>'),
    * the sum accumulates in decimal for order-independence, and gid
    * orders the sets deterministically in both engines.
    */
  def q69Cube(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(s, dir)
      .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
    e.cube(col("event_type"), col("day"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"),
        (grouping(col("event_type")) * 2 + grouping(col("day"))).cast("long").as("gid")
      )
      .select(
        col("gid"),
        coalesce(col("event_type"), lit("<all>")).as("event_type"),
        coalesce(col("day"), lit("<all>")).as("day"),
        col("n"),
        round(col("sum_value"), 6).as("sum_value")
      )
      .orderBy(col("gid"), col("event_type"), col("day"))
  }

  val q69Oracle: String =
    """SELECT CAST(GROUPING(event_type) * 2 + GROUPING(day_s) AS BIGINT) AS gid,
      |  COALESCE(event_type, '<all>') AS event_type,
      |  COALESCE(day_s, '<all>') AS day,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value
      |FROM (
      |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_s, value
      |  FROM events
      |)
      |GROUP BY CUBE (event_type, day_s)
      |ORDER BY gid, event_type, day""".stripMargin

  // ---------------------------------------------------------------- q70
  /** Corpus token frequencies via the Misra–Gries HEAVY-HITTERS sketch
    * (expr.MisraGries): ≤ k counters of aggregation state per group no
    * matter how many rows stream through — the mergeable-summary shape
    * for tracking dominant tokens/domains/URLs at 100 TB without
    * shuffling the item universe. This corpus' vocabulary (31 terms)
    * fits inside k=64, so no decrement ever fires and every estimate is
    * provably exact — the oracle is a plain GROUP BY count. The lossy
    * regime (k below the distinct count) is property-checked in
    * FreqSketchSpec against the n/(k+1) error bound.
    */
  def q70HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftShim
    val toks = Tables
      .documents(s, dir)
      .select(explode(TextStats.tokens(col("text"))).as("tok"))
    val sketch = toks.agg(
      GraftShim
        .column(
          graft.expr
            .MisraGries(GraftShim.expression(col("tok")), GraftShim.expression(lit(64)))
            .toAggregateExpression()
        )
        .as("hh")
    )
    sketch
      .select(explode(col("hh")).as(Seq("tok", "est_count")))
      .orderBy(col("tok"))
  }

  val q70Oracle: String =
    """SELECT tok, CAST(count(*) AS BIGINT) AS est_count
      |FROM (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
      |)
      |GROUP BY tok
      |ORDER BY tok""".stripMargin

  // ---------------------------------------------------------------- q71
  /** MIXTURE MATERIALIZATION — the step after q62's weights: given a
    * token budget (half the corpus here), convert per-source sampling
    * weights into per-source EPOCH counts (capped at 4, the usual
    * repeat-harm ceiling) and emit the actual epoch-expanded training
    * corpus: each doc repeated floor(epochs) times plus one more with
    * probability frac(epochs), decided by the same engine-portable
    * multiplicative hash as q52 (rand() would be engine-private and
    * unreplayable). Generator shape: per-source scalars broadcast onto
    * the corpus, one map-side explode — the only shuffles are the two
    * tiny per-source aggregates; the corpus scans once.
    */
  def q71MixtureExpand(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_toks")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count() // eager: the per-source agg and the final join share this
    val bySource = docs
      .groupBy(col("source"))
      .agg(sum(col("n_toks")).as("n_tokens"))
    val total = bySource.agg(sum(col("n_tokens")).as("total_tokens"))
    val powed = bySource
      .crossJoin(broadcast(total))
      .withColumn("share", col("n_tokens").cast("double") / col("total_tokens").cast("double"))
      .withColumn("powed", pow(col("share"), lit(0.7)))
    val z = powed.agg(sum(col("powed").cast("decimal(38,18)")).cast("double").as("z"))
    val weights = powed
      .crossJoin(broadcast(z))
      .withColumn(
        "epochs",
        least(
          lit(4.0),
          expr("total_tokens div 2").cast("double") * (col("powed") / col("z")) /
            col("n_tokens").cast("double")
        )
      )
      .select(col("source"), col("epochs"))
    docs
      .join(broadcast(weights), Seq("source"))
      .withColumn(
        "hash_frac",
        TextStats.portableHash(col("doc_id")).cast("double") / lit(1000003.0)
      )
      .withColumn(
        "n_repeats",
        (floor(col("epochs")) +
          when(col("hash_frac") < col("epochs") - floor(col("epochs")), 1).otherwise(0))
          .cast("long")
      )
      .filter(col("n_repeats") > 0)
      .select(
        col("doc_id"),
        col("source"),
        col("n_repeats"),
        explode(sequence(lit(1L), col("n_repeats"))).as("copy_idx")
      )
      .orderBy(col("doc_id"), col("copy_idx"))
  }

  val q71Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_toks
      |  FROM documents
      |), s AS (
      |  SELECT source, CAST(SUM(n_toks) AS BIGINT) AS n_tokens FROM d GROUP BY source
      |), t AS (
      |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM s
      |), p AS (
      |  SELECT source, n_tokens,
      |    pow(CAST(n_tokens AS DOUBLE) / CAST(t.total_tokens AS DOUBLE), 0.7) AS powed,
      |    t.total_tokens
      |  FROM s, t
      |), z AS (
      |  SELECT CAST(SUM(CAST(powed AS DECIMAL(38,18))) AS DOUBLE) AS z FROM p
      |), w AS (
      |  SELECT source,
      |    least(4.0, CAST(total_tokens // 2 AS DOUBLE) * (powed / z.z) / CAST(n_tokens AS DOUBLE)) AS epochs
      |  FROM p, z
      |), r AS (
      |  SELECT d.doc_id, d.source,
      |    CAST(floor(w.epochs) +
      |      CASE WHEN (CAST((d.doc_id * 2654435761) % 1000003 AS DOUBLE) / 1000003.0)
      |                < w.epochs - floor(w.epochs)
      |           THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
      |  FROM d JOIN w USING (source)
      |)
      |SELECT doc_id, source, n_repeats,
      |  CAST(unnest(range(1, n_repeats + 1)) AS BIGINT) AS copy_idx
      |FROM r WHERE n_repeats > 0
      |ORDER BY doc_id, copy_idx""".stripMargin

  // ---------------------------------------------------------------- q72
  /** INCREMENTAL-INGEST dedup: a new batch (docs 0-99) checked against
    * the historical fingerprint store (everything else) — the daily
    * shape of a continuously-growing corpus, where re-fingerprinting or
    * re-shuffling the history per batch would be ruinous. ops.BloomJoin
    * .antiJoin: history compresses to one constant-size Bloom filter
    * (built with one aggregate, planted as a literal); batch rows whose
    * fingerprint is DEFINITELY new bypass the anti-join shuffle
    * entirely, and only probable duplicates (~dup rate + fpr) shuffle
    * into the exact anti join that clears Bloom false positives. Output
    * is row-identical to the plain anti join — which is the oracle.
    */
  def q72IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    // token-SET fingerprint (bag-of-words key): the corpus has no exact
    // text duplicates, but ~20% of docs share an identical token set —
    // the content-defined key is what incremental dedup would really use
    val fp = TextStats.tokenSetFingerprint(col("text"))
    val d = Tables
      .documents(s, dir)
      .select(col("doc_id"), fp.as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    d.count() // eager: the Bloom build, the anti join, and both bypass
    // branches all read the fingerprint frame — one tokenize+md5 pass,
    // not four
    val history = d.filter(col("doc_id") >= 100).select(col("fp").as("hfp"))
    val batch = d.filter(col("doc_id") < 100)
    BloomJoin
      .antiJoin(batch, history, "fp", "hfp", log2bits = 16)
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  val q72Oracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')) AS fp
      |  FROM documents
      |)
      |SELECT n.doc_id, n.fp FROM d n
      |WHERE n.doc_id < 100
      |  AND NOT EXISTS (SELECT 1 FROM d h WHERE h.doc_id >= 100 AND h.fp = n.fp)
      |ORDER BY n.doc_id""".stripMargin

  // ---------------------------------------------------------------- q73
  /** COMPRESSIBILITY quality signal (expr.DeflateRatio): compressed/raw
    * size per document — the corpus-filter signal that catches template
    * spam and boilerplate token-level heuristics miss (highly repetitive
    * text deflates far below prose). Map-side native expression, zero
    * shuffles until the audit aggregate.
    *
    * ORACLED VIA CONTRACT RESTRUCTURING (round 8, the q59 pattern).
    * DuckDB has no DEFLATE function, so the raw byte ratios can never
    * be replayed — but the signal's BEHAVIORAL LAW can be pinned as
    * literals (the q44-style law note): on a corpus with template spam
    * planted on every 5th doc, (1) deflate ratio must correlate
    * strongly negatively (< -0.5) with the independent dup-3-gram
    * repetition signal, (2) the planted class must separate cleanly —
    * the most-compressible clean doc still deflates worse than the
    * least-compressible spam doc, (3) every ratio must lie in (0, 2],
    * and (4) the replayable corpus counts must match. The checked
    * output carries ONLY those verdicts; DuckDB asserts them as
    * literals (TRUE / TRUE / 0) plus the exact counts, so a kernel
    * regression (codec change, ratio definition drift, planting bug)
    * flips a verdict and turns the row red. The per-byte kernel is
    * certified in DeflateRatioSpec; measured corr at sf0.01 is -0.855,
    * so the -0.5 law threshold has 70% headroom.
    */
  def q73CompressQuality(s: SparkSession, dir: String): DataFrame = {
    // plant template boilerplate on every 5th doc (the q53/q54 planted-
    // defect pattern): the corpus itself is near-uniform 31-word text
    // with almost no 3-gram repetition, so without a planted spam class
    // both signals are flat and the correlation audit certifies nothing
    val spam = " " + Seq.fill(40)("click here to subscribe now").mkString(" ")
    val dirty = Tables
      .documents(s, dir)
      .withColumn(
        "text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(spam))).otherwise(col("text"))
      )
    val scored = TextStats
      .withRepetition(dirty, "text")
      .select(
        col("doc_id"),
        expr("deflate_ratio(text)").as("compress_ratio"),
        col("dup_ngram_ratio")
      )
    scored.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("doc_id") % 5 === 0, 1L).otherwise(0L)).as("n_spam"),
      (corr(col("compress_ratio"), col("dup_ngram_ratio")) < -0.5)
        .as("corr_strong_negative"),
      sum(
        when(col("compress_ratio") <= 0.0 || col("compress_ratio") > 2.0, 1L).otherwise(0L)
      ).as("bad_range_count"),
      // the planted class must separate cleanly: the most-compressible
      // clean doc still deflates worse than the least-compressible
      // spam doc
      (max(when(col("doc_id") % 5 === 0, col("compress_ratio"))) <
        min(when(col("doc_id") % 5 =!= 0, col("compress_ratio")))).as("spam_separated")
    )
  }

  val q73Oracle: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_spam,
      |  TRUE AS corr_strong_negative,
      |  CAST(0 AS BIGINT) AS bad_range_count,
      |  TRUE AS spam_separated
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- q74
  /** CDC APPLY (ops.Upsert.applyCdc): fold an I/U/D change batch into a
    * snapshot — the Delta/Iceberg MERGE INTO semantic as plain DataFrame
    * algebra (anti join + union, one shuffle per side, no full-outer
    * wide rows). The change batch is derived deterministically from the
    * snapshot itself (deletes for keys ≡0 mod 10, balance updates for
    * ≡1, fresh-key inserts for ≡4) so the oracle replays it exactly.
    */
  def q74CdcApply(s: SparkSession, dir: String): DataFrame = {
    val snap = Tables
      .customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val changes = snap
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), lit("D").as("op"))
      .unionByName(
        snap
          .filter(col("c_custkey") % 10 === 1)
          .select(
            col("c_custkey"),
            col("c_name"),
            (col("c_acctbal") + 100).as("c_acctbal"),
            lit("U").as("op")
          )
      )
      .unionByName(
        snap
          .filter(col("c_custkey") % 10 === 4)
          .select(
            (col("c_custkey") + 10000000L).as("c_custkey"),
            concat(lit("new_"), col("c_name")).as("c_name"),
            lit(0.0).as("c_acctbal"),
            lit("I").as("op")
          )
      )
    Upsert
      .applyCdc(snap, changes, "c_custkey", "op")
      .orderBy(col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  val q74Oracle: String =
    """WITH snap AS (
      |  SELECT c_custkey, c_name, c_acctbal FROM customer
      |), changes AS (
      |  SELECT c_custkey, c_name, c_acctbal, 'D' AS op FROM snap WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal, 'U' AS op FROM snap WHERE c_custkey % 10 = 1
      |  UNION ALL
      |  SELECT c_custkey + 10000000 AS c_custkey, 'new_' || c_name AS c_name,
      |         0.0 AS c_acctbal, 'I' AS op
      |  FROM snap WHERE c_custkey % 10 = 4
      |)
      |SELECT c_custkey, c_name, c_acctbal FROM (
      |  SELECT s.c_custkey, s.c_name, s.c_acctbal FROM snap s
      |  WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.c_custkey = s.c_custkey)
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_acctbal FROM changes WHERE op IN ('I', 'U')
      |)
      |ORDER BY c_custkey, c_name, c_acctbal""".stripMargin

  // ---------------------------------------------------------------- q75
  /** BPE FIRST-MERGE candidates: corpus-wide adjacent-token-pair counts,
    * top 10 — the inner statistic of byte-pair-encoding vocabulary
    * construction (each BPE round merges the argmax pair and recounts).
    * Map-side pair explode → one groupBy on the pair string →
    * TakeOrderedAndProject top-k (no global sort); ties break on the
    * pair text so both engines rank identically.
    */
  def q75BpePairs(s: SparkSession, dir: String): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    val pairs = TextStats.ngrams(toks, 2)
    Tables
      .documents(s, dir)
      // ngrams' greatest() guard would fabricate a 1-token "pair" from a
      // 1-token doc — exclude them (min doc length here is 10 anyway)
      .filter(size(toks) >= 2)
      .select(explode(pairs).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(10)
  }

  val q75Oracle: String =
    """WITH d AS (
      |  SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents
      |  WHERE len(string_split_regex(trim(text), '\s+')) >= 2
      |), i AS (
      |  SELECT toks, unnest(range(0, len(toks) - 1)) AS i FROM d
      |), p AS (
      |  SELECT toks[i + 1] || ' ' || toks[i + 2] AS pair FROM i
      |)
      |SELECT pair, CAST(count(*) AS BIGINT) AS n
      |FROM p GROUP BY pair
      |ORDER BY n DESC, pair
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q76
  /** WINDOW-FRAME feature engineering over the event stream: per-user
    * 3-row moving average (ROWS frame, decimal-accumulated then divided
    * so the value is reduction-order-exact) and a trailing-1-hour event
    * count (RANGE frame over exact ns — peer-inclusive semantics match
    * DuckDB's). The per-user window is one hash-partition sort — the
    * shape that scales by user cardinality, never by total history.
    */
  def q76MovingFeatures(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRows = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(-2, 0)
    val wRange = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_ns"))
      .rangeBetween(-3600L * 1000 * 1000 * 1000, 0)
    Tables
      .events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"), col("ts_ns"))
      .withColumn("mov_sum", sum(col("value").cast("decimal(38,6)")).over(wRows))
      .withColumn("mov_n", count(lit(1)).over(wRows))
      .withColumn("n_1h", count(lit(1)).over(wRange))
      .select(
        col("event_id"),
        col("user_id"),
        round(col("mov_sum").cast("double") / col("mov_n").cast("double"), 6).as("mov_avg"),
        col("mov_n"),
        col("n_1h")
      )
      .orderBy(col("event_id"))
  }

  val q76Oracle: String =
    """SELECT event_id, user_id,
      |  round(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w_rows AS DOUBLE) /
      |        CAST(COUNT(*) OVER w_rows AS DOUBLE), 6) AS mov_avg,
      |  CAST(COUNT(*) OVER w_rows AS BIGINT) AS mov_n,
      |  CAST(COUNT(*) OVER w_range AS BIGINT) AS n_1h
      |FROM events
      |WINDOW
      |  w_rows AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      |  w_range AS (PARTITION BY user_id ORDER BY ts
      |              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q77
  /** Embedding QUANTIZATION for vector storage at scale: per-vector
    * symmetric int8 (scale = max |x|, q = round(x/scale·127)) with the
    * reconstruction error audited in the same pass. 4× smaller vectors
    * is the difference between an in-memory and a spilling ANN index at
    * 100 TB. Map-side array expressions only; every lambda touches its
    * own argument (scale/ed stay multi-referenced attributes, so
    * CollapseProject cannot inline the aggregates into the lambdas —
    * the q73 lesson). `within_bound` asserts err ≤ scale/254, the exact
    * half-ulp bound of the quantizer.
    */
  def q77Quantize(s: SparkSession, dir: String): DataFrame = {
    Tables
      .embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("ed", transform(col("embedding"), x => x.cast("double")))
      .withColumn("scale", array_max(transform(col("ed"), x => abs(x))))
      .withColumn("qv", transform(col("ed"), x => round(x / col("scale") * 127)))
      .withColumn(
        "max_err",
        array_max(zip_with(col("ed"), col("qv"), (x, q) => abs(x - q * col("scale") / lit(127))))
      )
      .select(
        col("vec_id"),
        round(col("scale"), 6).as("scale"),
        round(col("max_err"), 6).as("max_err"),
        (col("max_err") <= col("scale") / 254 * 1.0000001).as("within_bound")
      )
      .orderBy(col("vec_id"))
  }

  val q77Oracle: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings
      |), s AS (
      |  SELECT vec_id, ed, list_max(list_transform(ed, x -> abs(x))) AS scale FROM e
      |), qt AS (
      |  SELECT vec_id, ed, scale,
      |    list_transform(ed, x -> round(x / scale * 127)) AS qv
      |  FROM s
      |), err AS (
      |  SELECT vec_id, scale,
      |    list_max(list_transform(list_zip(ed, qv),
      |      p -> abs(struct_extract(p, 1) - struct_extract(p, 2) * scale / 127))) AS max_err
      |  FROM qt
      |)
      |SELECT vec_id, round(scale, 6) AS scale, round(max_err, 6) AS max_err,
      |  max_err <= scale / 254 * 1.0000001 AS within_bound
      |FROM err
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q78
  /** SEMANTIC dedup (ops.SemanticDedup — the SemDeDup shape): IVF
    * k-means cells with SOFT top-3 assignment + shared-cell
    * drop-against-lower-id at cosine ≥ τ. Pairwise work is O(Σ cᵢ²)
    * confined to cells, never O(n²) — the production semantic-dedup
    * geometry at 100 TB (k grows with n, cell size stays bounded, the
    * only data shuffle is keyed by cluster_id; overlap costs 2m²/k of
    * brute force). Hard assignment measured 0.27 co-cluster recall on
    * this corpus — its τ-pairs straddle cell boundaries — so the
    * overlap is what makes the cell trick honest here. ORACLED since
    * round 4 (the IvfSql replay — trained quantizer, soft top-m
    * assignment, τ keep rule and all three audits re-derived in SQL);
    * the three exact figures every row carries remain the readable
    * contract: `audit_kept_violations` (kept τ-close pairs sharing a
    * cell — 0 by the keep-rule proof), `audit_rep_violations` (a rep
    * that is not a smaller id — 0 by construction), and
    * `audit_cocluster_recall` (fraction of the exact τ-pair set — since
    * round 5 the lower-id < 500 slice of it, the q46 bounding pattern;
    * full-corpus at the sf0.01 gate — whose endpoints share a cell: the
    * quantizer's honest miss budget, the number SemDeDup trades for the
    * O(n²) escape).
    */
  def q78SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val tau = 0.35
    val e = Tables.embeddings(s, dir)
    // 2 Lloyd rounds (round 5; was 4): the quantizer only has to bound
    // the cell-confined pair work and hold co-cluster recall — both
    // audit figures are recorded either way, and rounds 3-4 bought no
    // recall at twice the fit jobs (q35's k-means uses 2 for the same
    // reason). The generated oracle replays the same 2-round chain.
    val cents = Ivf.fitCentroids(e, k = 8, iters = 2)
    val assigned = Ivf
      .assignTopM(e, cents, m = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count() // eager: dedup + three audit consumers share this cache
    // hotCellThreshold stays at the 1<<16 default: forcing fixture-sized
    // cells hot (threshold 512) was measured SLOWER here (+0.4 s — the
    // ×16 build-side replication costs more than the extra parallelism
    // buys on 8 small cells); the salt is a skew remedy, not a
    // parallelism knob.
    val deduped = SemanticDedup
      .assignReps(assigned, tau)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    deduped.count()
    val keptViol = SemanticDedup
      .keptViolations(assigned, deduped, tau)
      .select(col("violations").as("audit_kept_violations"))
    val repViol = deduped
      .agg(
        sum(when(col("rep_id") > col("vec_id"), 1).otherwise(0))
          .as("audit_rep_violations")
      )
    // exact τ-pairs scored for shared-cell membership: quantizer recall,
    // the figure the cell trick trades. Bounded to the lower-id < 500
    // slice of the exact pair set (the q46 pattern) since round 5: the
    // corpus-wide 2M-pair version dominated q78's bench cost while the
    // recall estimate is statistically identical on the slice. At
    // sf0.01 (the correctness gate) 500 IS the whole corpus, so the
    // oracle certifies full coverage; the corpus-wide exactness
    // contract stays on audit_kept_violations below, which remains
    // slice-free.
    val cells = deduped.select(col("vec_id"), col("cells"))
    val va = e
      .filter(col("vec_id") < 500)
      .join(cells, Seq("vec_id"))
      .select(col("vec_id").as("id_a"), col("embedding").as("va"), col("cells").as("ca"))
    val vb = e
      .join(cells, Seq("vec_id"))
      .select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("cells").as("cb"))
    val cocluster = va
      .crossJoin(vb)
      .filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= tau)
      .agg(
        round(
          avg(when(arrays_overlap(col("ca"), col("cb")), 1.0).otherwise(0.0)),
          4
        ).as("audit_cocluster_recall")
      )
    deduped
      .crossJoin(broadcast(keptViol))
      .crossJoin(broadcast(repViol))
      .crossJoin(broadcast(cocluster))
      .select(
        col("vec_id"),
        concat_ws(",", transform(col("cells"), _.cast("string"))).as("cells"),
        col("kept"),
        col("rep_id"),
        col("audit_kept_violations"),
        col("audit_rep_violations"),
        col("audit_cocluster_recall")
      )
      .orderBy(col("vec_id"))
  }

  /** Generated oracle for q78 — the IvfSql replay extended through the
    * whole SemDeDup pipeline: trained quantizer (k=8, 4 Lloyd rounds),
    * soft top-3 assignment, the τ keep rule (min lower-id τ-close
    * shared-cell neighbor), and all three audit figures. Unrounded τ
    * filters run on the bit-exact cosine folds; the hot-cell salting in
    * the Spark side is output-invariant by construction (spec-pinned),
    * so the unsalted SQL join is the correct reference.
    */
  val q78Oracle: String = {
    val cosFF = IvfSql.cosFloatFloat("ae.embedding", "be.embedding")
    s"""WITH e AS (
       |  SELECT vec_id, embedding FROM embeddings
       |), ${IvfSql.lloydChain(8, 2)}, atm AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${IvfSql.cosFloatDouble("e.embedding", "c.cd")} DESC, c.cid ASC) AS rn
       |    FROM e, c2 c
       |  ) WHERE rn <= 3
       |), reps AS (
       |  SELECT l.vec_id AS vec_id, MIN(r.vec_id) AS rep
       |  FROM atm l JOIN atm r ON l.cid = r.cid AND r.vec_id < l.vec_id
       |  JOIN e ae ON ae.vec_id = l.vec_id
       |  JOIN e be ON be.vec_id = r.vec_id
       |  WHERE $cosFF >= CAST(0.35 AS DOUBLE)
       |  GROUP BY l.vec_id
       |), cellsArr AS (
       |  SELECT vec_id, list_sort(list_distinct(list(cid))) AS ca
       |  FROM atm GROUP BY vec_id
       |), ded AS (
       |  SELECT c.vec_id, c.ca, r.rep IS NULL AS kept, COALESCE(r.rep, c.vec_id) AS rep_id
       |  FROM cellsArr c LEFT JOIN reps r USING (vec_id)
       |), ka AS (
       |  SELECT atm.vec_id, atm.cid FROM atm JOIN ded ON atm.vec_id = ded.vec_id AND ded.kept
       |), kv AS (
       |  SELECT CAST(count(*) AS BIGINT) AS audit_kept_violations FROM (
       |    SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
       |    FROM ka a JOIN ka b ON a.cid = b.cid AND b.vec_id < a.vec_id
       |    JOIN e ae ON ae.vec_id = a.vec_id
       |    JOIN e be ON be.vec_id = b.vec_id
       |    WHERE $cosFF >= CAST(0.35 AS DOUBLE)
       |  )
       |), rv AS (
       |  SELECT CAST(SUM(CASE WHEN rep_id > vec_id THEN 1 ELSE 0 END) AS BIGINT) AS audit_rep_violations
       |  FROM ded
       |), cc AS (
       |  SELECT round(AVG(CASE WHEN list_has_any(a.ca, b.ca)
       |    THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 4) AS audit_cocluster_recall
       |  FROM ded a JOIN ded b ON a.vec_id < b.vec_id AND a.vec_id < 500
       |  JOIN e ae ON ae.vec_id = a.vec_id
       |  JOIN e be ON be.vec_id = b.vec_id
       |  WHERE $cosFF >= CAST(0.35 AS DOUBLE)
       |)
       |SELECT ded.vec_id, array_to_string(ded.ca, ',') AS cells, ded.kept, ded.rep_id,
       |  kv.audit_kept_violations, rv.audit_rep_violations, cc.audit_cocluster_recall
       |FROM ded, kv, rv, cc
       |ORDER BY ded.vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- q79
  /** Token-budget ALPHA SWEEP: the data-mixture temperature curve. For
    * each α in {0.3, 0.5, 0.7, 1.0}, per-source sampling weight
    * wᵢ ∝ shareᵢ^α (α=1 is natural sampling, α→0 flattens toward
    * uniform), plus the effective epochs each source runs when a token
    * budget of half the corpus is drawn under wᵢ — the up-sampling
    * multiplier the mixture implies. One aggregate over the corpus,
    * then arithmetic on a |sources|×|alphas| frame (broadcast-scale):
    * the sweep costs nothing more than the single-α q62.
    */
  def q79AlphaSweep(s: SparkSession, dir: String): DataFrame = {
    val bySource = Tables
      .documents(s, dir)
      .groupBy(col("source"))
      .agg(sum(size(TextStats.tokens(col("text"))).cast("long")).as("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bySource.count() // eager: normalizer consumers share this cache
    val total = bySource.agg(sum(col("n_tokens")).as("total_tokens"))
    val powed = bySource
      .crossJoin(broadcast(total))
      .withColumn("alpha", explode(array(Seq(0.3, 0.5, 0.7, 1.0).map(lit): _*)))
      .withColumn("share", col("n_tokens").cast("double") / col("total_tokens").cast("double"))
      .withColumn("powed", pow(col("share"), col("alpha")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    powed.count()
    val z = powed
      .groupBy(col("alpha"))
      .agg(sum(col("powed").cast("decimal(38,18)")).cast("double").as("z"))
    powed
      .join(broadcast(z), Seq("alpha"))
      .withColumn("weight", col("powed") / col("z"))
      .select(
        col("source"),
        col("alpha"),
        col("n_tokens"),
        round(col("share"), 6).as("share"),
        round(col("weight"), 6).as("weight"),
        // half-corpus budget drawn under w: epochs = w·B / n_tokens
        round(
          col("weight") * (col("total_tokens").cast("double") * 0.5) /
            col("n_tokens").cast("double"),
          6
        ).as("eff_epochs")
      )
      .orderBy(col("source"), col("alpha"))
  }

  val q79Oracle: String =
    """WITH s AS (
      |  SELECT source,
      |    CAST(SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source
      |), t AS (
      |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM s
      |), p AS (
      |  SELECT source, alpha, n_tokens, total_tokens,
      |    CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS share,
      |    pow(CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE), alpha) AS powed
      |  FROM s, t, (SELECT unnest([0.3::DOUBLE, 0.5::DOUBLE, 0.7::DOUBLE, 1.0::DOUBLE]) AS alpha)
      |), z AS (
      |  SELECT alpha, CAST(SUM(CAST(powed AS DECIMAL(38,18))) AS DOUBLE) AS z FROM p GROUP BY alpha
      |)
      |SELECT p.source, p.alpha, p.n_tokens,
      |  round(p.share, 6) AS share,
      |  round(p.powed / z.z, 6) AS weight,
      |  round(p.powed / z.z * (CAST(p.total_tokens AS DOUBLE) * 0.5) /
      |        CAST(p.n_tokens AS DOUBLE), 6) AS eff_epochs
      |FROM p JOIN z USING (alpha)
      |ORDER BY source, alpha""".stripMargin

  // ---------------------------------------------------------------- q80
  /** DUPLICATED-SPAN coverage — the scalable proxy for suffix-array
    * substring dedup (Lee et al., 2022, arXiv:2107.06499): per document,
    * the fraction of its 8-gram spans that occur at least twice in the
    * corpus. Catches cross-document boilerplate passages that document-
    * level fingerprints miss. Shape: linear gram build (TextStats.ngrams,
    * the zip-of-shifts form) → one groupBy on the gram (the only data
    * shuffle; at 100 TB hash the gram to 8 bytes first) → shuffle join
    * back → per-doc aggregate. No windows, no pair materialization.
    */
  def q80DupSpans(s: SparkSession, dir: String): DataFrame = {
    val n = 8
    val toks = TextStats.tokens(col("text"))
    // Join-free complement form (round 4): a gram instance is "dup" iff
    // its gram occurs ≥ 2 times corpus-wide, so
    //   n_dup(doc) = n_grams(doc) − #(instances of corpus-SINGLETON grams in doc)
    // and a singleton gram names its one owning doc via min(doc_id).
    // That turns the old  gram-count ⋈ 1M-instance-rows  join-back into
    // one aggregate on the gram key plus one per-doc aggregate over the
    // (much smaller) singleton set. The shuffle key is the 8-byte
    // xxhash64 of the gram, not the ~70-byte string (the q101 scale
    // note, implemented): a hash collision merges two gram classes with
    // probability ≈ D²·2⁻⁶⁵ over D distinct grams — ~10⁻⁹ at 10⁵ grams.
    val docs = Tables
      .documents(s, dir)
      .filter(size(toks) >= n)
      .select(
        col("doc_id"),
        (size(toks) - (n - 1)).cast("long").as("n_grams"),
        TextStats.ngrams(toks, n).as("grams")
      )
    // deliberately NOT persisted: the two consumers need different
    // projections (gram arrays vs just n_grams), so a cache would
    // materialize the ~8× gram blow-up corpus-wide to save only a
    // column-pruned re-scan + split — measured 2.6× slower here, and
    // the wrong trade at scale too (IO pass vs n-gram-sized memory)
    val singletons = docs
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_total"), min(col("doc_id")).as("doc_id"))
      .filter(col("n_total") === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_uniq"))
    docs
      .select(col("doc_id"), col("n_grams"))
      .join(singletons, Seq("doc_id"), "left") // per-doc rows both sides: shuffle join at scale, AQE broadcasts when small
      .select(
        col("doc_id"),
        col("n_grams"),
        (col("n_grams") - coalesce(col("n_uniq"), lit(0L))).as("n_dup"),
        round(
          (col("n_grams") - coalesce(col("n_uniq"), lit(0L))).cast("double") /
            col("n_grams").cast("double"),
          6
        ).as("dup_frac")
      )
      .orderBy(col("doc_id"))
  }

  val q80Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), f AS (
      |  SELECT doc_id, toks FROM d WHERE len(toks) >= 8
      |), i AS (
      |  SELECT doc_id, toks, unnest(range(0, len(toks) - 7)) AS i FROM f
      |), g AS (
      |  SELECT doc_id,
      |    toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4] || ' ' ||
      |    toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7] || ' ' || toks[i+8] AS gram
      |  FROM i
      |), c AS (
      |  SELECT gram, count(*) AS n_total FROM g GROUP BY gram
      |)
      |SELECT g.doc_id,
      |  CAST(count(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN c.n_total >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  round(CAST(SUM(CASE WHEN c.n_total >= 2 THEN 1 ELSE 0 END) AS DOUBLE) /
      |        CAST(count(*) AS DOUBLE), 6) AS dup_frac
      |FROM g JOIN c USING (gram)
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin

  // ---------------------------------------------------------------- q81
  /** Quality-signal AUC against a PLANTED spam class (the q73 planting
    * pattern: template boilerplate appended to every 5th doc): the
    * Mann-Whitney AUC of two filter signals — distinct-token ratio and
    * raw char length — at telling spam from clean. This is the
    * validation step a production quality filter ships with: a signal
    * you can't score against labels is a signal you can't threshold.
    * WINDOW-FREE AUC: group by (signal, score) into a distribution
    * table (bounded by distinct score values), then one broadcast-scale
    * distribution×distribution join computes P(score⁺<score⁻)+½ ties —
    * no global rank window, nothing single-partition. All pair terms
    * are integer-or-half multiples, so the double sum is exact in any
    * addition order (oracle-safe without decimal staging).
    */
  def q81QualityAuc(s: SparkSession, dir: String): DataFrame = {
    val spam = " " + Seq.fill(40)("click here to subscribe now").mkString(" ")
    val toks = TextStats.tokens(col("text"))
    val scored = Tables
      .documents(s, dir)
      .withColumn(
        "text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(spam)))
          .otherwise(col("text"))
      )
      .withColumn("label", col("doc_id") % 5 === 0)
      .select(
        col("label"),
        explode(
          array(
            struct(
              lit("uniq_ratio").as("signal"),
              round(
                size(array_distinct(toks)).cast("double") /
                  size(toks).cast("double"),
                6
              ).as("score")
            ),
            struct(
              lit("len_chars").as("signal"),
              length(col("text")).cast("double").as("score")
            )
          )
        ).as("sg")
      )
      .select(col("label"), col("sg.signal").as("signal"), col("sg.score").as("score"))
    val dist = scored
      .groupBy(col("signal"), col("score"))
      .agg(
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("label"), 1L).otherwise(0L)).as("n_neg")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dist.count() // eager: both sides of the pair join share this cache
    val totals = dist
      .groupBy(col("signal"))
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"))
    val pos = dist.select(col("signal"), col("score").as("s_pos"), col("n_pos"))
    val neg = dist.select(col("signal"), col("score").as("s_neg"), col("n_neg"))
    val num = pos
      .join(neg, Seq("signal"))
      .groupBy(col("signal"))
      .agg(
        sum(
          col("n_pos").cast("double") * col("n_neg").cast("double") *
            (when(col("s_pos") < col("s_neg"), 1.0)
              .when(col("s_pos") === col("s_neg"), 0.5)
              .otherwise(0.0))
        ).as("num")
      )
    num
      .join(broadcast(totals), Seq("signal"))
      .select(
        col("signal"),
        col("n_pos"),
        col("n_neg"),
        round(
          col("num") / (col("n_pos").cast("double") * col("n_neg").cast("double")),
          6
        ).as("auc")
      )
      .orderBy(col("signal"))
  }

  val q81Oracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0
      |         THEN text || repeat(' click here to subscribe now', 40)
      |         ELSE text END AS text,
      |    doc_id % 5 = 0 AS label
      |  FROM documents
      |), sc AS (
      |  SELECT label, 'uniq_ratio' AS signal,
      |    round(CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE) /
      |          CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 6) AS score
      |  FROM d
      |  UNION ALL
      |  SELECT label, 'len_chars' AS signal, CAST(len(text) AS DOUBLE) AS score FROM d
      |), dist AS (
      |  SELECT signal, score,
      |    CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |    CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
      |  FROM sc GROUP BY signal, score
      |), totals AS (
      |  SELECT signal, CAST(SUM(n_pos) AS BIGINT) AS n_pos,
      |         CAST(SUM(n_neg) AS BIGINT) AS n_neg
      |  FROM dist GROUP BY signal
      |), num AS (
      |  SELECT a.signal,
      |    SUM(CAST(a.n_pos AS DOUBLE) * CAST(b.n_neg AS DOUBLE) *
      |        (CASE WHEN a.score < b.score THEN 1.0
      |              WHEN a.score = b.score THEN 0.5
      |              ELSE 0.0 END)) AS num
      |  FROM dist a JOIN dist b ON a.signal = b.signal
      |  GROUP BY a.signal
      |)
      |SELECT t.signal, t.n_pos, t.n_neg,
      |  round(n.num / (CAST(t.n_pos AS DOUBLE) * CAST(t.n_neg AS DOUBLE)), 6) AS auc
      |FROM num n JOIN totals t USING (signal)
      |ORDER BY signal""".stripMargin

  // ---------------------------------------------------------------- q82
  /** CROSS-SOURCE duplicate-overlap matrix: for every source pair, how
    * many distinct content fingerprints (sorted-distinct-token md5, the
    * q72 fp) appear in BOTH — the contamination census that decides
    * which sources actually add novel data to a mixture. Shape: per-doc
    * map-side fingerprint → distinct (source, fp) → one self-join keyed
    * by fp (classes are tiny; the join shuffles 8-byte-hashable keys) →
    * count per ordered pair. No pair explosion outside real classes.
    */
  def q82SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val fps = Tables
      .documents(s, dir)
      .select(col("source"), TextStats.tokenSetFingerprint(col("text")).as("fp"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fps.count() // eager: both join sides share this cache
    val a = fps.select(col("source").as("src_a"), col("fp"))
    val b = fps.select(col("source").as("src_b"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared_fp"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val q82Oracle: String =
    """WITH fp AS (
      |  SELECT DISTINCT source,
      |    md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')) AS fp
      |  FROM documents
      |)
      |SELECT a.source AS src_a, b.source AS src_b,
      |  CAST(count(*) AS BIGINT) AS n_shared_fp
      |FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
      |GROUP BY a.source, b.source
      |ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------------------- q83
  /** Quality DECILE binning — the curriculum/filter-threshold step: exact
    * decile cut points of the q21 composite quality score, broadcast as
    * a 9-double constant, then MAP-SIDE binning and a per-bin profile.
    * The at-scale shape: quantiles are one aggregate (or a t-digest at
    * 100 TB — q59's sketch is the drop-in), the binning pass never
    * shuffles anything but the final 10-row aggregate. No global sort,
    * no ntile window (which would single-partition the corpus).
    */
  def q83QualityBins(s: SparkSession, dir: String): DataFrame = {
    val scored = TextStats
      .withQuality(Tables.documents(s, dir), "text")
      .select(col("doc_id"), col("quality_score"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    scored.count() // eager: cuts + binning consumers share this cache
    val cuts = scored.agg(
      expr(
        "percentile(quality_score, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
      ).as("cuts")
    )
    scored
      .crossJoin(broadcast(cuts))
      // bin = #cuts strictly below the score: 0..9, upper-inclusive bins
      .withColumn("bin", size(filter(col("cuts"), c => col("quality_score") > c)).cast("long"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(
          dsum(col("quality_score")) / count(lit(1)).cast("double"),
          6
        ).as("mean_score"),
        round(min(col("quality_score")), 6).as("min_score"),
        round(max(col("quality_score")), 6).as("max_score")
      )
      .orderBy(col("bin"))
  }

  val q83Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), f AS (
      |  SELECT doc_id,
      |    0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) +
      |    0.3 * (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) +
      |    0.3 * least(CAST(len(toks) AS DOUBLE) / 200.0, 1.0) AS quality_score
      |  FROM t
      |), c AS (
      |  SELECT quantile_cont(quality_score, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts FROM f
      |), b AS (
      |  SELECT f.doc_id, f.quality_score,
      |    CAST(len(list_filter(c.cuts, x -> f.quality_score > x)) AS BIGINT) AS bin
      |  FROM f, c
      |)
      |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(CAST(SUM(CAST(quality_score AS DECIMAL(38,6))) AS DOUBLE) /
      |        CAST(count(*) AS DOUBLE), 6) AS mean_score,
      |  round(min(quality_score), 6) AS min_score,
      |  round(max(quality_score), 6) AS max_score
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------- q84
  /** Quality-aware CANONICAL selection: near-dup clusters (the q51
    * min-label components on the bounded exact-pair slice) where the
    * kept representative is the HIGHEST-QUALITY member (ties → smallest
    * id), not the smallest id — what a production dedup actually ships
    * when docs differ in cleanliness. The argmax is expressed as
    * max-score-per-component + equality join + min-id (identical
    * structure in the oracle, so double-equality ties resolve the same
    * way in both engines). Scale: component ids come from the CC
    * contraction; the argmax adds two tiny keyed aggregates — nothing
    * beyond the component column ever shuffles with the text.
    */
  def q84CanonicalPick(s: SparkSession, dir: String): DataFrame = {
    val slice = Tables.documents(s, dir).filter(col("doc_id") < 300)
    val pairs = TextDedup.nearDupsExact(slice, "doc_id", "text", threshold = 0.9)
    val comps = Components.connectedComponents(pairs)
    val quality = TextStats
      .withQuality(slice, "text")
      .select(col("doc_id").as("id"), col("quality_score"))
    val joined = comps
      .join(quality, Seq("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    joined.count() // eager: best-score + canonical consumers share this cache
    val best = joined
      .groupBy(col("component"))
      .agg(max(col("quality_score")).as("best_score"))
    val canon = joined
      .join(best, Seq("component"))
      .filter(col("quality_score") === col("best_score"))
      .groupBy(col("component"))
      .agg(min(col("id")).as("canon_id"))
    joined
      .join(broadcast(canon), Seq("component"))
      .select(
        col("id"),
        col("component"),
        round(col("quality_score"), 6).as("quality_score"),
        (col("id") === col("canon_id")).as("is_canonical")
      )
      .orderBy(col("id"))
  }

  val q84Oracle: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS tk
      |  FROM documents WHERE doc_id < 300
      |), edges AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM t a JOIN t b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) /
      |        CAST(len(a.tk) + len(b.tk) - len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) >= 0.9
      |), sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM edges
      |  UNION ALL
      |  SELECT id_b, id_a FROM edges
      |), reach(id, comp) AS (
      |  SELECT DISTINCT src, src FROM sym
      |  UNION
      |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.id
      |), comps AS (
      |  SELECT id, MIN(comp) AS component FROM reach GROUP BY id
      |), q AS (
      |  SELECT doc_id AS id,
      |    0.4 * (CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE) / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)) +
      |    0.3 * (1.0 - CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE) / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)) +
      |    0.3 * least(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) / 200.0, 1.0) AS quality_score
      |  FROM documents WHERE doc_id < 300
      |), j AS (
      |  SELECT c.id, c.component, q.quality_score FROM comps c JOIN q USING (id)
      |), best AS (
      |  SELECT component, MAX(quality_score) AS best_score FROM j GROUP BY component
      |), canon AS (
      |  SELECT j.component, MIN(j.id) AS canon_id
      |  FROM j JOIN best USING (component)
      |  WHERE j.quality_score = best.best_score
      |  GROUP BY j.component
      |)
      |SELECT j.id, j.component,
      |  round(j.quality_score, 6) AS quality_score,
      |  j.id = c.canon_id AS is_canonical
      |FROM j JOIN canon c USING (component)
      |ORDER BY j.id""".stripMargin

  // ---------------------------------------------------------------- q85
  /** Deterministic TRAIN/VAL/TEST split + LEAKAGE census. The split is
    * the engine-portable multiplicative hash (TextStats.portableHash —
    * reproducible across engines, reruns, and cluster sizes, unlike
    * rand()): 80/10/10 by hash range, entirely map-side. The leakage
    * audit is the check every split ships with: token-set-fingerprint
    * classes that span more than one split (identical content in train
    * AND eval = contamination); one fp-keyed aggregate, counted once
    * corpus-wide and broadcast onto the per-(source, split) profile.
    */
  def q85HashSplit(s: SparkSession, dir: String): DataFrame = {
    val h = TextStats.portableHash(col("doc_id"))
    val d = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        col("source"),
        TextStats.tokenSetFingerprint(col("text")).as("fp"),
        when(h < 800000, "train").when(h < 900000, "val").otherwise("test").as("split")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    d.count() // eager: profile + leakage consumers share this cache
    val leaky = d
      .groupBy(col("fp"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
      .agg(count(lit(1)).as("n_leaky_classes"))
    d.groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(leaky))
      .select(col("source"), col("split"), col("n_docs"), col("n_leaky_classes"))
      .orderBy(col("source"), col("split"))
  }

  val q85Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')) AS fp,
      |    CASE WHEN (doc_id * 2654435761) % 1000003 < 800000 THEN 'train'
      |         WHEN (doc_id * 2654435761) % 1000003 < 900000 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents
      |), l AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_leaky_classes FROM (
      |    SELECT fp FROM d GROUP BY fp HAVING count(DISTINCT split) > 1
      |  )
      |)
      |SELECT d.source, d.split, CAST(count(*) AS BIGINT) AS n_docs, l.n_leaky_classes
      |FROM d, l
      |GROUP BY d.source, d.split, l.n_leaky_classes
      |ORDER BY source, split""".stripMargin

  // ---------------------------------------------------------------- q86
  /** Vocabulary COVERAGE / OOV rate: derive the top-16 corpus vocabulary
    * (count desc, token asc — deterministic at the boundary) and score
    * every document's out-of-vocabulary token fraction against it — the
    * tokenizer-coverage check run before committing a vocab. The vocab
    * is a broadcast-scale constant (16 strings — the same class as LSH
    * planes / IVF centroids), so the scoring pass is pure map-side HOF
    * arithmetic: the corpus text never shuffles; the only exchange is
    * the token-count aggregate that built the vocab.
    */
  def q86OovRate(s: SparkSession, dir: String): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    val docs = Tables.documents(s, dir)
    val vocab = docs
      .select(explode(toks).as("t"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t"))
      .limit(16)
      .collect()
      .map(_.getString(0))
    val vocabLit = array(vocab.map(lit).toIndexedSeq: _*)
    docs
      .select(col("doc_id"), toks.as("tk"))
      .select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(filter(col("tk"), t => !array_contains(vocabLit, t))).cast("long").as("n_oov")
      )
      .withColumn(
        "oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)
      )
      .orderBy(col("doc_id"))
  }

  val q86Oracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents
      |), cnt AS (
      |  SELECT t, count(*) AS n FROM tok GROUP BY t
      |), vocab AS (
      |  SELECT t FROM cnt ORDER BY n DESC, t LIMIT 16
      |)
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN tok.t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
      |  round(CAST(SUM(CASE WHEN tok.t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END) AS DOUBLE) /
      |        CAST(count(*) AS DOUBLE), 6) AS oov_rate
      |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q87
  /** Exact duplicated-substring REMOVAL — q80 detects, this one edits:
    * every token position covered by a corpus-duplicated 8-gram span is
    * cut, and the surviving tokens are reassembled in order (the actual
    * dedup step of Lee et al. 2022, arXiv:2107.06499, re-expressed from
    * suffix arrays to DataFrame algebra). Shapes, all linear: positioned
    * grams (map-side posexplode) → one groupBy on the gram (at 100 TB
    * hash grams to 8 bytes first) → span explode to covered positions →
    * anti join against token positions → ordered reassembly keyed by
    * doc_id. Nothing is ever pairwise; the corpus text crosses the wire
    * only inside the per-doc reassembly aggregate. Docs shorter than
    * the gram width carry no span and pass through verbatim (modulo
    * whitespace normalization, which both engines apply by
    * construction).
    */
  def q87DupSpanRemoval(s: SparkSession, dir: String): DataFrame = {
    val n = 8
    val toksX = TextStats.tokens(col("text"))
    val base = Tables
      .documents(s, dir)
      .select(col("doc_id"), toksX.as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count() // eager: gram, token-position, and output consumers share it
    val grams = base
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), posexplode(TextStats.ngrams(col("toks"), n)))
      .select(col("doc_id"), col("pos"), col("col").as("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    grams.count() // eager: count + join consumers share this cache
    val counts = grams.groupBy(col("gram")).agg(count(lit(1)).as("n_total"))
    val covered = grams
      .join(counts.filter(col("n_total") >= 2), Seq("gram"))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
    val tokPos = base.select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), col("pos").as("p"), col("col").as("tok"))
    val kept = tokPos.join(covered, Seq("doc_id", "p"), "left_anti")
    val clean = kept
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        concat_ws(
          " ",
          transform(
            array_sort(collect_list(struct(col("p"), col("tok")))),
            e => e.getField("tok")
          )
        ).as("clean_text")
      )
    base
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(clean, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text")
      )
      .orderBy(col("doc_id"))
  }

  val q87Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), g AS (
      |  SELECT doc_id, i,
      |    toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4] || ' ' ||
      |    toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7] || ' ' || toks[i+8] AS gram
      |  FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 7)) AS i FROM d WHERE len(toks) >= 8)
      |), c AS (
      |  SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
      |), cov AS (
      |  SELECT DISTINCT g.doc_id, g.i + u.u AS p
      |  FROM g JOIN c USING (gram), (SELECT unnest(range(0, 8)) AS u) u
      |), tok AS (
      |  SELECT doc_id, i AS p, toks[i+1] AS tok
      |  FROM (SELECT doc_id, toks, unnest(range(0, len(toks))) AS i FROM d)
      |), kept AS (
      |  SELECT t.doc_id, t.p, t.tok FROM tok t
      |  WHERE NOT EXISTS (SELECT 1 FROM cov WHERE cov.doc_id = t.doc_id AND cov.p = t.p)
      |), cl AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |    string_agg(tok, ' ' ORDER BY p) AS clean_text
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |  CAST(len(d.toks) AS BIGINT) AS n_tokens,
      |  CAST(len(d.toks) AS BIGINT) - COALESCE(cl.n_kept, 0) AS n_removed,
      |  COALESCE(cl.clean_text, '') AS clean_text
      |FROM d LEFT JOIN cl USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q88
  /** Per-cluster embedding DISPERSION from sufficient statistics — the
    * representation-collapse monitor for embedding pipelines: the mean
    * pairwise dot product within each label group, computed WITHOUT
    * pairs via E[⟨vᵢ,vⱼ⟩]·n(n−1) = ‖Σv‖² − Σ‖v‖². Two linear
    * aggregates (per-(label, dim) component sums + per-label squared
    * norms, both decimal-accumulated so reduction order can't smear the
    * doubles) replace the O(n²) pairwise pass entirely — the identity
    * is what makes corpus-dispersion tracking free at 100 TB.
    */
  def q88Dispersion(s: SparkSession, dir: String): DataFrame = {
    val ed = Tables
      .embeddings(s, dir)
      .select(
        col("label"),
        transform(col("embedding"), x => x.cast("double")).as("ed")
      )
      .withColumn(
        "sq",
        aggregate(col("ed"), lit(0.0), (acc, x) => acc + x * x)
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ed.count() // eager: both sufficient-stat consumers share this cache
    val norms = ed
      .groupBy(col("label"))
      .agg(
        sum(col("sq").cast("decimal(38,12)")).cast("double").as("qq"),
        count(lit(1)).as("n")
      )
    val comps = ed
      .select(col("label"), posexplode(col("ed")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col").cast("decimal(38,12)")).cast("double").as("sd"))
      .groupBy(col("label"))
      .agg(sum((col("sd") * col("sd")).cast("decimal(38,12)")).cast("double").as("s2"))
    norms
      .join(comps, Seq("label"))
      .select(
        col("label"),
        col("n"),
        round(
          (col("s2") - col("qq")) /
            (col("n").cast("double") * (col("n").cast("double") - 1.0)),
          6
        ).as("mean_pair_dot"),
        round(col("qq") / col("n").cast("double"), 6).as("mean_sq_norm")
      )
      .orderBy(col("label"))
  }

  val q88Oracle: String =
    """WITH e AS (
      |  SELECT label, embedding::DOUBLE[] AS ed FROM embeddings
      |), q AS (
      |  SELECT label, list_aggregate(list_transform(ed, x -> x * x), 'sum') AS sq FROM e
      |), norms AS (
      |  SELECT label, CAST(SUM(CAST(sq AS DECIMAL(38,12))) AS DOUBLE) AS qq,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM q GROUP BY label
      |), comps AS (
      |  SELECT label, CAST(SUM(CAST(sd * sd AS DECIMAL(38,12))) AS DOUBLE) AS s2 FROM (
      |    SELECT label, i, CAST(SUM(CAST(ed[i+1] AS DECIMAL(38,12))) AS DOUBLE) AS sd
      |    FROM (SELECT label, ed, unnest(range(0, len(ed))) AS i FROM e)
      |    GROUP BY label, i
      |  ) GROUP BY label
      |)
      |SELECT norms.label, norms.n,
      |  round((comps.s2 - norms.qq) /
      |        (CAST(norms.n AS DOUBLE) * (CAST(norms.n AS DOUBLE) - 1.0)), 6) AS mean_pair_dot,
      |  round(norms.qq / CAST(norms.n AS DOUBLE), 6) AS mean_sq_norm
      |FROM norms JOIN comps USING (label)
      |ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- q89
  /** Z-ORDER data layout (ops/Layout.zValue) with a pruning-effectiveness
    * audit — the file-skipping story for 100 TB multi-dim filters. Every
    * lineitem row gets a Morton z-value over (l_partkey, l_suppkey)
    * ranks (8 bits/dim, data-derived closed bounds — the footer-stats
    * pass at scale, a 4-long scalar constant here) and an equal-WIDTH
    * z-range file id: pure map-side integer arithmetic, NO global sort —
    * unlike an ntile layout, this assignment distributes embarrassingly
    * (the production writer `Layout.zorderRepartition` adds the one
    * range exchange real files need). Output: per-file min/max extents
    * on both dims, plus corpus audit columns — expected fraction of
    * files a point query must scan (= mean normalized extent width) for
    * the z layout vs an insertion-order (orderkey-range) layout. The
    * z curve holds BOTH dims narrow; insertion order holds neither.
    */
  def q89ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val bits = 8
    val nFiles = 64
    val li = Tables.lineitem(s, dir)
    // closed per-dim bounds: scalar constants (bytes, not data)
    val b = li
      .agg(
        min(col("l_partkey")).as("plo"), max(col("l_partkey")).as("phi"),
        min(col("l_suppkey")).as("slo"), max(col("l_suppkey")).as("shi"),
        min(col("l_orderkey")).as("olo"), max(col("l_orderkey")).as("ohi")
      )
      .head()
    val (pLo, pHi, sLo, sHi) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val (oLo, oHi) = (b.getLong(4), b.getLong(5))
    val z = Layout.zValue(Seq((col("l_partkey"), pLo, pHi), (col("l_suppkey"), sLo, sHi)), bits)
    val zWidth = (1L << (2 * bits)) / nFiles
    // the insertion-order baseline: contiguous ORDERKEY ranges (orderkey
    // is arrival order in this data), the layout an append-only writer
    // produces — NOT a hash scramble; equal-width buckets over the
    // data-derived closed orderkey bounds
    val linWidth = (oHi - oLo + 1 + nFiles - 1) / nFiles
    val base = li
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .withColumn("file_z", floor(z / lit(zWidth)))
      .withColumn("file_lin", floor((col("l_orderkey") - lit(oLo)) / lit(linWidth)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count() // eager: both layout aggregates share this cache
    def scanFrac(fileCol: String): DataFrame = base
      .groupBy(col(fileCol))
      .agg(
        ((max(col("l_partkey")) - min(col("l_partkey")) + 1.0) / (pHi - pLo + 1).toDouble).as("pf"),
        ((max(col("l_suppkey")) - min(col("l_suppkey")) + 1.0) / (sHi - sLo + 1).toDouble).as("sf")
      )
      .agg(
        round(avg(col("pf")), 6).as("pk"),
        round(avg(col("sf")), 6).as("sk")
      )
    val zf = scanFrac("file_z")
      .select(col("pk").as("z_scan_frac_pk"), col("sk").as("z_scan_frac_sk"))
    val lf = scanFrac("file_lin")
      .select(col("pk").as("lin_scan_frac_pk"), col("sk").as("lin_scan_frac_sk"))
    base
      .groupBy(col("file_z").as("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
        min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk")
      )
      .crossJoin(broadcast(zf))
      .crossJoin(broadcast(lf))
      .orderBy(col("file_id"))
  }

  val q89Oracle: String = {
    val bits = 8
    val nFiles = 64
    val zExpr = graft.ops.Layout.zValueSqlDynamic(
      Seq(("l_partkey", "b.plo", "b.phi"), ("l_suppkey", "b.slo", "b.shi")), bits)
    val zWidth = (1L << (2 * bits)) / nFiles
    s"""WITH b AS (
       |  SELECT min(l_partkey) AS plo, max(l_partkey) AS phi,
       |         min(l_suppkey) AS slo, max(l_suppkey) AS shi,
       |         min(l_orderkey) AS olo, max(l_orderkey) AS ohi
       |  FROM lineitem
       |), base AS (
       |  SELECT l_partkey, l_suppkey,
       |    CAST(floor($zExpr / $zWidth.0) AS BIGINT) AS file_z,
       |    CAST(floor((l_orderkey - b.olo) /
       |         CAST((b.ohi - b.olo + 1 + $nFiles - 1) // $nFiles AS DOUBLE)) AS BIGINT) AS file_lin,
       |    b.plo, b.phi, b.slo, b.shi
       |  FROM lineitem, b
       |), zf AS (
       |  SELECT round(avg(pf), 6) AS z_scan_frac_pk, round(avg(sf), 6) AS z_scan_frac_sk FROM (
       |    SELECT (max(l_partkey) - min(l_partkey) + 1.0) / (any_value(phi) - any_value(plo) + 1) AS pf,
       |           (max(l_suppkey) - min(l_suppkey) + 1.0) / (any_value(shi) - any_value(slo) + 1) AS sf
       |    FROM base GROUP BY file_z
       |  )
       |), lf AS (
       |  SELECT round(avg(pf), 6) AS lin_scan_frac_pk, round(avg(sf), 6) AS lin_scan_frac_sk FROM (
       |    SELECT (max(l_partkey) - min(l_partkey) + 1.0) / (any_value(phi) - any_value(plo) + 1) AS pf,
       |           (max(l_suppkey) - min(l_suppkey) + 1.0) / (any_value(shi) - any_value(slo) + 1) AS sf
       |    FROM base GROUP BY file_lin
       |  )
       |)
       |SELECT file_z AS file_id, CAST(count(*) AS BIGINT) AS n_rows,
       |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
       |  min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk,
       |  zf.z_scan_frac_pk, zf.z_scan_frac_sk,
       |  lf.lin_scan_frac_pk, lf.lin_scan_frac_sk
       |FROM base, zf, lf
       |GROUP BY file_z, zf.z_scan_frac_pk, zf.z_scan_frac_sk,
       |         lf.lin_scan_frac_pk, lf.lin_scan_frac_sk
       |ORDER BY file_id""".stripMargin
  }

  // ---------------------------------------------------------------- q90
  /** Small-file COMPACTION planning (ops/Layout.compactionPlan) — the
    * other half of the 100 TB layout problem: a table ingested in daily
    * increments accretes under-sized files whose per-file overhead
    * dominates scans. The file inventory here is simulated from orders
    * (one "file" per order-day, size = row count, partitioned by month);
    * the planner bin-packs each partition's files in date order into
    * ~500-row targets with ONE window (exclusive prefix sum ÷ target) —
    * file METADATA only, no record ever moves during planning. Output:
    * per-(month, bin) rewrite manifest plus the before/after small-file
    * census that justifies the rewrite.
    */
  def q90CompactionPlan(s: SparkSession, dir: String): DataFrame = {
    val target = 500L
    val files = Tables
      .orders(s, dir)
      .groupBy(
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("part"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("file_day")
      )
      .agg(count(lit(1)).as("size_rows"))
    val planned = Layout
      .compactionPlan(files, Seq("part"), "file_day", "size_rows", target)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    planned.count() // eager: manifest + census consumers share this cache
    val census = planned
      .agg(
        sum(when(col("size_rows") < target, 1L).otherwise(0L)).as("small_files_before"),
        count(lit(1)).as("files_before")
      )
    planned
      .groupBy(col("part"), col("bin"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("size_rows")).as("rows_total"),
        min(col("file_day")).as("first_day"),
        max(col("file_day")).as("last_day")
      )
      .crossJoin(broadcast(census))
      .orderBy(col("part"), col("bin"))
  }

  val q90Oracle: String =
    """WITH files AS (
      |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS part,
      |         strftime(o_orderdate, '%Y-%m-%d') AS file_day,
      |         CAST(count(*) AS BIGINT) AS size_rows
      |  FROM orders GROUP BY 1, 2
      |), planned AS (
      |  SELECT part, file_day, size_rows,
      |    CAST(floor(COALESCE(SUM(size_rows) OVER (
      |      PARTITION BY part ORDER BY file_day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 500.0) AS BIGINT) AS bin
      |  FROM files
      |), census AS (
      |  SELECT CAST(SUM(CASE WHEN size_rows < 500 THEN 1 ELSE 0 END) AS BIGINT) AS small_files_before,
      |         CAST(count(*) AS BIGINT) AS files_before
      |  FROM planned
      |)
      |SELECT part, bin, CAST(count(*) AS BIGINT) AS n_files,
      |  CAST(SUM(size_rows) AS BIGINT) AS rows_total,
      |  MIN(file_day) AS first_day, MAX(file_day) AS last_day,
      |  census.small_files_before, census.files_before
      |FROM planned, census
      |GROUP BY part, bin, census.small_files_before, census.files_before
      |ORDER BY part, bin""".stripMargin

  // ---------------------------------------------------------------- q91
  /** HARD-NEGATIVE mining for contrastive training: for every anchor
    * vector, the most-similar vector with a DIFFERENT label (hardest
    * negative) and the most-similar with the SAME label (nearest
    * positive), plus the triplet margin between them — the pair-mining
    * pass an embedding-model trainer runs per epoch. Deterministic
    * argmax via max(struct(sim, -id)): highest similarity, then lowest
    * id on ties — no window needed, one partial-aggregating groupBy.
    * This is the exact all-pairs form (oracle-checkable, q45's class);
    * at 100 TB the candidate set comes from the multiprobe-LSH buckets
    * (q30/q31) and only candidates are scored — same agg, ~k rows per
    * anchor instead of n.
    */
  def q91HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("anchor"), col("embedding").as("va"), col("label").as("la"))
    val b = e.select(col("vec_id").as("other"), col("embedding").as("vb"), col("label").as("lb"))
    a.join(b, col("anchor") =!= col("other"))
      .select(
        col("anchor"), col("la"), col("other"), col("lb"),
        round(Similarity.cosine(col("va"), col("vb")), 6).as("sim")
      )
      .groupBy(col("anchor"))
      .agg(
        max(when(col("la") === col("lb"), struct(col("sim"), (-col("other")).as("nid")))).as("pos"),
        max(when(col("la") =!= col("lb"), struct(col("sim"), (-col("other")).as("nid")))).as("neg")
      )
      // an anchor whose label has no second member (or a one-label
      // corpus) has no positive/negative — drop it, matching the
      // oracle's inner join of the two rank CTEs
      .filter(col("pos").isNotNull && col("neg").isNotNull)
      .select(
        col("anchor"),
        (-col("pos.nid")).as("pos_id"),
        col("pos.sim").as("pos_sim"),
        (-col("neg.nid")).as("neg_id"),
        col("neg.sim").as("neg_sim"),
        round(col("pos.sim") - col("neg.sim"), 6).as("margin")
      )
      .orderBy(col("anchor"))
  }

  val q91Oracle: String =
    """WITH s AS (
      |  SELECT a.vec_id AS anchor, a.label AS la, b.vec_id AS other, b.label AS lb,
      |    round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
      |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      |), pos AS (
      |  SELECT anchor, other AS pos_id, sim AS pos_sim,
      |    row_number() OVER (PARTITION BY anchor ORDER BY sim DESC, other ASC) AS rn
      |  FROM s WHERE la = lb
      |), neg AS (
      |  SELECT anchor, other AS neg_id, sim AS neg_sim,
      |    row_number() OVER (PARTITION BY anchor ORDER BY sim DESC, other ASC) AS rn
      |  FROM s WHERE la <> lb
      |)
      |SELECT p.anchor, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim,
      |  round(p.pos_sim - n.neg_sim, 6) AS margin
      |FROM pos p JOIN neg n ON p.anchor = n.anchor AND p.rn = 1 AND n.rn = 1
      |ORDER BY p.anchor""".stripMargin

  // ---------------------------------------------------------------- q92
  /** Ingest FRESHNESS / inter-arrival profile — the lag-monitoring
    * query a pipeline operator alarms on: per event type, the p50/p95
    * and max gap between consecutive events. Gaps are computed inside
    * (event_type, day) window partitions — thousands of small ordered
    * runs that distribute across executors (a per-type-only window
    * would serialize each type through one task at 100 TB). The
    * percentiles are DISCRETE order statistics (value at rank
    * floor(q·(n−1))+1), not interpolated: interpolating engines
    * (Spark `percentile`, DuckDB `quantile_cont`) use different
    * last-ulp formulas — lower+(upper−lower)·f vs a lerp — so their
    * outputs diverge in the 3rd decimal; a rank-selected VALUE is
    * bit-identical everywhere. Microsecond longs end to end — DuckDB's
    * parquet reader TRUNCATES the ns timestamps to µs at scan (probed:
    * epoch_ns returns µs·1000), so the engine-portable grain is
    * floor-µs (`ts_ns div 1000`, exactly Tables.events' `ts`); no
    * float unit conversion ever touches the checked output.
    */
  def q92Freshness(s: SparkSession, dir: String): DataFrame = {
    val wGap = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts_us"), col("event_id"))
    val gaps = Tables
      .events(s, dir)
      .select(
        col("event_type"),
        to_date(col("ts")).as("day"),
        expr("ts_ns div 1000").as("ts_us"),
        col("event_id")
      )
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(wGap))
      .filter(col("gap_us").isNotNull)
      .select(col("event_type"), col("gap_us"))
    Stats
      .rankSelect(
        gaps,
        Seq("event_type"),
        "gap_us",
        Seq(0.5 -> "p50_gap_us", 0.95 -> "p95_gap_us"),
        extra = Seq(count(lit(1)).as("n_gaps"), max(col("gap_us")).as("max_gap_us"))
      )
      .select(
        col("event_type"), col("n_gaps"),
        col("p50_gap_us"), col("p95_gap_us"), col("max_gap_us")
      )
      .orderBy(col("event_type"))
  }

  val q92Oracle: String =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY event_type, CAST(ts AS DATE)
      |      ORDER BY epoch_us(ts), event_id) AS gap_us
      |  FROM events
      |), r AS (
      |  SELECT event_type, gap_us,
      |    row_number() OVER (PARTITION BY event_type ORDER BY gap_us) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM g WHERE gap_us IS NOT NULL
      |)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
      |  MAX(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 THEN gap_us END) AS p50_gap_us,
      |  MAX(CASE WHEN rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1 THEN gap_us END) AS p95_gap_us,
      |  MAX(gap_us) AS max_gap_us
      |FROM r
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q93
  /** Ordered FUNNEL: users who viewed, then clicked AFTER their first
    * view, then purchased AFTER that first qualifying click — the
    * sequential-constraint analytics query (strictly stronger than
    * "did all three ever": each stage's timestamp must follow the
    * previous stage's). Three stage aggregates, each a filtered
    * equi-join on user_id + min() — partial-aggregated map-side, no
    * window, no per-user event array ever materializes (the
    * collect_list form would haul every user's full history through
    * one task's memory at 100 TB). Stage comparisons run on floor-µs
    * (`ts_ns div 1000`, the q92 rule): the oracle engine reads the ns
    * parquet timestamps at µs precision, so raw-ns strict comparisons
    * would diverge the moment two same-user events share a µs.
    */
  def q93Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .select(col("user_id"), col("event_type"), expr("ts_ns div 1000").as("ts_us"))
    val v = ev
      .filter(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("t_view"))
    val c = ev
      .filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts_us") > col("t_view"))
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("t_click"))
    val p = ev
      .filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts_us") > col("t_click"))
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_view"),
        count(col("t_click")).as("n_click_after_view"),
        count(col("t_purchase")).as("n_purchase_after_click")
      )
      .select(
        col("n_view"),
        col("n_click_after_view"),
        col("n_purchase_after_click"),
        round(col("n_click_after_view") / col("n_view").cast("double"), 6).as("view_to_click"),
        round(col("n_purchase_after_click") / col("n_click_after_view").cast("double"), 6).as("click_to_purchase")
      )
  }

  val q93Oracle: String =
    """WITH v AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS t_view
      |  FROM events WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
      |  GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
      |  GROUP BY e.user_id
      |)
      |SELECT CAST(count(*) AS BIGINT) AS n_view,
      |  CAST(count(c.t_click) AS BIGINT) AS n_click_after_view,
      |  CAST(count(p.t_purchase) AS BIGINT) AS n_purchase_after_click,
      |  round(count(c.t_click) / CAST(count(*) AS DOUBLE), 6) AS view_to_click,
      |  round(count(p.t_purchase) / CAST(count(c.t_click) AS DOUBLE), 6) AS click_to_purchase
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin

  // ---------------------------------------------------------------- q94
  /** PQ-ADC approximate similarity search (ops/Pq) with an in-registry
    * recall audit — the MEMORY story for 100 TB vector search: each
    * 64-dim float vector (256 B) becomes 16 four-bit codes (8 B packed,
    * 32×), fitted per-subspace by seeded k-means++ with sample-side
    * Lloyd refinement then distributed Lloyd passes, scored
    * by asymmetric distance (exact query subvectors × quantized corpus)
    * against codebook literals — encode and scoring are pure map-side;
    * the only shuffle is the WindowGroupLimit-pruned top-k. ORACLED
    * since round 5 via the TRAINED-codebook replay ([[q94OracleFor]]):
    * the generated SQL embeds the fitted codebooks as literals and
    * replays encode/ADC/rerank bit-exactly. The output stays self-
    * auditing too: one row carrying recall@10 of the raw ADC ranking AND of
    * the production two-stage path — ADC shortlist (8k, the usual
    * 4-32× re-rank multiplier) then exact re-rank of only the
    * shortlisted vectors (the float fetch touches 8k/n of the corpus
    * per query, the standard PQ serving shape) —
    * plus the mean |ADC − exact| score error and the compression
    * ratio. Composes with IVF cells (q35) so a probe scores ~nprobe/k
    * of the codes at scale.
    */
  /** q94's fixed geometry — shared by the query and [[q94OracleFor]]
    * (the generated oracle must replay exactly these constants). */
  private val q94M = 16
  private val q94Ksub = 16
  private val q94Iters = 2
  private val q94NQ = 50
  private val q94K = 10

  def q94PqAdc(s: SparkSession, dir: String): DataFrame = {
    val (m, ksub, iters, nQ, k) = (q94M, q94Ksub, q94Iters, q94NQ, q94K)
    val shortlist = 8 * k
    val e = Tables
      .embeddings(s, dir)
      .select(
        col("vec_id"),
        col("embedding"), // raw floats for the codegen'd exact scorer
        Pq.normalize(col("embedding")).as("vec")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count() // eager: fit + encode + exact baseline share this cache
    val dim = 64
    // codebooks fit on a quarter SAMPLE — the production shape (the
    // fit never needs the full corpus; only encode does), and the
    // interpreted HOF argmin pass is 4× cheaper
    val codebooks = Pq.fit(e.filter(pmod(col("vec_id"), lit(4)) === 0), m, ksub, iters)
    val encoded = Pq.encode(e, codebooks)
    val queries = e.filter(col("vec_id") < nQ)
    val pq = Pq
      .adcTopK(queries, encoded, codebooks, shortlist)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pq.count() // eager: recall + rerank + score-error consumers share this cache
    // exact baseline: native codegen'd cosine on the raw floats — the
    // same ranking as normalized dot (and the same value), without the
    // interpreted HOF fold in the hot 100k-pair loop
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
    val wx = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("xscore").desc, col("neighbor_id"))
    val exact = e
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        Similarity.cosine(col("qemb"), col("embedding")).as("xscore")
      )
      .withColumn("xrank", row_number().over(wx))
      .filter(col("xrank") <= k)
    val recallAdc = pq
      .filter(col("rank") <= k)
      .join(exact, Seq("query_id", "neighbor_id"))
      .agg((count(lit(1)) / (nQ.toDouble * k)).as("recall_adc"))
    // two-stage serving path: exact cosine over the shortlisted floats only
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rscore").desc, col("neighbor_id"))
    val scoredShortlist = pq
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nemb")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("rscore", Similarity.cosine(col("qemb"), col("nemb")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    scoredShortlist.count() // eager: rerank + score-error consumers share this cache
    val reranked = scoredShortlist
      .select(col("query_id"), col("neighbor_id"), col("rscore"))
      .withColumn("rrank", row_number().over(wr))
      .filter(col("rrank") <= k)
    val recallRerank = reranked
      .join(exact, Seq("query_id", "neighbor_id"))
      .agg((count(lit(1)) / (nQ.toDouble * k)).as("recall_rerank"))
    // quantization score error across the whole shortlist (ADC
    // approximates normalized dot == cosine); decimal-staged so the
    // mean is order-independent and the generated oracle can hash it
    val err = scoredShortlist
      .agg((sum(abs(col("score") - col("rscore")).cast("decimal(38,12)")).cast("double") /
        count(lit(1))).as("mean_abs_err"))
    recallAdc
      .crossJoin(recallRerank)
      .crossJoin(err)
      .select(
        lit(nQ).as("n_queries"),
        lit(k).as("k"),
        lit(shortlist).as("shortlist"),
        round(col("recall_adc"), 4).as("recall_adc_at_k"),
        round(col("recall_rerank"), 4).as("recall_rerank_at_k"),
        round(col("mean_abs_err"), 4).as("mean_abs_score_err"),
        lit(dim * 4).as("bytes_raw"),
        lit(m / 2).as("bytes_code"),
        lit((dim * 4) / (m / 2)).as("compression_x")
      )
  }

  /** Generated oracle for q94 (round 5) — the TRAINED-codebook replay:
    * [[q94OracleFor]] re-runs the exact Pq.fit the query runs (same
    * quarter-sample, seeds, decimal-staged Lloyd — byte-identical
    * codebooks) and embeds the result as string-cast double literals,
    * then replays normalization, per-subspace argmin encoding, ADC
    * scoring, both recall joins, and the decimal-staged error mean in
    * SQL. Ordering bit-exactness: every dot/distance is a
    * left-associated term chain (the q103 recipe); the ADC score's
    * fold over subspaces becomes list_reduce(list(d ORDER BY s)) — the
    * same accumulation order as the Spark fold.
    */
  def q94OracleFor(s: SparkSession, dir: String): String = {
    val (m, ksub, iters, nQ, k) = (q94M, q94Ksub, q94Iters, q94NQ, q94K)
    val shortlist = 8 * k
    val dim = 64
    val dsub = dim / m
    val eFit = Tables
      .embeddings(s, dir)
      .select(col("vec_id"), Pq.normalize(col("embedding")).as("vec"))
      .filter(pmod(col("vec_id"), lit(4)) === 0)
    val codebooks = Pq.fit(eFit, m, ksub, iters)
    val cwRows = (0 until m)
      .flatMap { sIdx =>
        codebooks(sIdx).sortBy(_._1).map { case (code, w) =>
          val ws = w.map(x => s"CAST('$x' AS DOUBLE)").mkString(", ")
          s"($sIdx, $code, $ws)"
        }
      }
      .mkString(",\n    ")
    val normChain = (1 to dim)
      .map(i => s"CAST(embedding[$i] AS DOUBLE)*CAST(embedding[$i] AS DOUBLE)")
      .mkString(" + ")
    def sqDistChain(vec: String): String =
      (1 to dsub)
        .map(j => s"($vec[cw.s*$dsub+$j]-cw.w$j)*($vec[cw.s*$dsub+$j]-cw.w$j)")
        .mkString(" + ")
    def dotChain(vec: String): String =
      (1 to dsub).map(j => s"$vec[cw.s*$dsub+$j]*cw.w$j").mkString(" + ")
    val cosCE = IvfSql.cosFloatFloat("c.embedding", "q.embedding")
    val cosRR = IvfSql.cosFloatFloat("ce.embedding", "qe.embedding")
    s"""WITH cw(s, code, ${(1 to dsub).map("w" + _).mkString(", ")}) AS (
       |  VALUES
       |    $cwRows
       |), e AS (
       |  SELECT vec_id, embedding FROM embeddings
       |), nv AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) / sqrt($normChain)) AS v
       |  FROM e
       |), enc AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT nv.vec_id, cw.s, cw.code,
       |      row_number() OVER (PARTITION BY nv.vec_id, cw.s
       |        ORDER BY (${sqDistChain("nv.v")}) ASC, cw.code ASC) AS rn
       |    FROM nv, cw
       |  ) WHERE rn = 1
       |), lut AS (
       |  SELECT q.vec_id AS query_id, cw.s, cw.code, (${dotChain("q.v")}) AS d
       |  FROM nv q, cw WHERE q.vec_id < $nQ
       |), adc AS (
       |  SELECT l.query_id, en.vec_id AS neighbor_id,
       |    list_reduce(list(l.d ORDER BY l.s), (x, y) -> x + y) AS score
       |  FROM enc en JOIN lut l ON en.s = l.s AND en.code = l.code
       |  WHERE en.vec_id <> l.query_id
       |  GROUP BY l.query_id, en.vec_id
       |), pq AS (
       |  SELECT query_id, neighbor_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
       |  FROM adc
       |), short AS (
       |  SELECT * FROM pq WHERE rank <= $shortlist
       |), ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY $cosCE DESC, c.vec_id) AS xrank
       |    FROM e c, e q WHERE q.vec_id < $nQ AND c.vec_id <> q.vec_id
       |  ) WHERE xrank <= $k
       |), ra AS (
       |  SELECT count(*) / CAST('${nQ.toDouble * k}' AS DOUBLE) AS recall_adc
       |  FROM short JOIN ex USING (query_id, neighbor_id) WHERE short.rank <= $k
       |), rr0 AS (
       |  SELECT s.query_id, s.neighbor_id, s.score, $cosRR AS rscore
       |  FROM short s
       |  JOIN e ce ON s.neighbor_id = ce.vec_id
       |  JOIN e qe ON s.query_id = qe.vec_id
       |), rrk AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY rscore DESC, neighbor_id) AS rrank
       |  FROM rr0
       |), rb AS (
       |  SELECT count(*) / CAST('${nQ.toDouble * k}' AS DOUBLE) AS recall_rerank
       |  FROM rrk JOIN ex USING (query_id, neighbor_id) WHERE rrank <= $k
       |), er AS (
       |  SELECT CAST(SUM(CAST(abs(score - rscore) AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS mean_abs_err
       |  FROM rr0
       |)
       |SELECT $nQ AS n_queries, $k AS k, $shortlist AS shortlist,
       |  round(ra.recall_adc, 4) AS recall_adc_at_k,
       |  round(rb.recall_rerank, 4) AS recall_rerank_at_k,
       |  round(er.mean_abs_err, 4) AS mean_abs_score_err,
       |  ${dim * 4} AS bytes_raw, ${m / 2} AS bytes_code,
       |  ${(dim * 4) / (m / 2)} AS compression_x
       |FROM ra, rb, er""".stripMargin
  }

  // ---------------------------------------------------------------- q95
  /** BPE tokenizer TRAINING (ops/Bpe) — the full greedy merge loop, not
    * just q75's one-shot pair count: 8 rounds of corpus-wide
    * most-frequent-adjacent-pair fusion over the frequency-weighted
    * DISTINCT-WORD table (the corpus text is aggregated once; every
    * round then touches |vocab| rows — the reason real BPE trainers
    * pre-aggregate words, and the only shape that survives a
    * trillion-token corpus). Each round's winner is one collected row
    * (argmax scalar, not data); the apply step is a map-side fold.
    *
    * ORACLED since round 6 ([[q95Oracle]], STATIC and zero-literal —
    * the strongest oracle class in the registry): the round-5 "a
    * recursive CTE would be rewriting the trainer" claim missed a
    * closed form. The merge-apply fold is EQUIVALENT to one string
    * `replace` over a boundary-delimited token encoding
    * (`|t1||t2||…|`): `replace` substitutes left-to-right
    * non-overlapping — exactly the fold's greedy order — and the
    * explicit `|…|` boundaries make a token-suffix/prefix false match
    * impossible while the doubled inner separator keeps adjacent
    * matches from consuming each other's boundary (probed:
    * `[a,b,a,b]` fuses both pairs, `[xa,b]` fuses nothing, `[a,a,a]`
    * fuses once). Each round's winner is a scalar subquery (freq
    * desc, pair asc — the engine's tie rule), so DuckDB re-trains the
    * full 8 rounds from raw text with NO engine-provided content, then
    * recomputes the residual census and greedy invariant. The chained
    * round CTEs are MATERIALIZED — inlined, the ~4-way references per
    * round expand the scan 4^8 times (measured: fd exhaustion).
    *
    * SELF-AUDITING: output carries the residual top pair frequency after all
    * merges and `greedy_ok` — the invariant that no remaining pair
    * out-counts the last accepted merge (exact greedy order, verified
    * against hand-computed corpora in BpeSpec).
    */
  def q95BpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nMerges = 8
    val (merges, finalWords) = Bpe.trainMerges(Tables.documents(s, dir), "text", nMerges)
    val residual = Bpe
      .pairCounts(finalWords, "tokens", "weight")
      .agg(coalesce(max(col("freq")), lit(0L)))
      .head()
      .getLong(0)
    val lastFreq = merges.lastOption.map(_._4).getOrElse(0L)
    merges
      .toDF("step", "left", "right", "freq")
      .withColumn("residual_top_freq", lit(residual))
      .withColumn("greedy_ok", lit(residual <= lastFreq))
      .orderBy(col("step"))
  }

  /** The q95 replay: unrolled by the same Scala loop shape as
    * [[q96Oracle]] — query and oracle share the round count by
    * construction. Per round k: pair census over the weighted
    * distinct-word table (list pairs via LATERAL unnest over 1-based
    * positions), argmax under (freq desc, left, right), then the
    * boundary-delimited `replace` that IS the merge-apply fold. The
    * pair columns are quoted ("left"/"right" are SQL keywords). */
  /** The shared w0→wN BPE re-training CTE chain (see [[q95Oracle]] for
    * the equivalence argument): word-carrying so [[q111Oracle]] can
    * join the final per-word encodings back to the doc stream; q95
    * simply never reads the word column. */
  private def bpeRoundsSql(n: Int): String = {
    val rounds = (1 to n)
      .map { k =>
        s"""p$k AS MATERIALIZED (
           |  SELECT t.toks[u.i] AS l, t.toks[u.i + 1] AS r, CAST(SUM(t.weight) AS BIGINT) AS freq
           |  FROM (SELECT string_split(substr(enc, 2, len(enc) - 2), '||') AS toks, weight FROM w${k - 1}) t,
           |       LATERAL unnest(range(1, len(t.toks))) AS u(i)
           |  GROUP BY 1, 2
           |), top$k AS MATERIALIZED (
           |  SELECT l, r, freq FROM p$k ORDER BY freq DESC, l, r LIMIT 1
           |), w$k AS MATERIALIZED (
           |  SELECT word, replace(enc,
           |    '|' || (SELECT l FROM top$k) || '||' || (SELECT r FROM top$k) || '|',
           |    '|' || (SELECT l FROM top$k) || (SELECT r FROM top$k) || '|') AS enc, weight
           |  FROM w${k - 1}
           |)""".stripMargin
      }
      .mkString(",\n")
    s"""w0 AS MATERIALIZED (
       |  SELECT word, '|' || array_to_string(string_split_regex(word, ''), '||') || '|' AS enc,
       |         CAST(COUNT(*) AS BIGINT) AS weight
       |  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents)
       |  WHERE len(word) > 0
       |  GROUP BY word
       |),
       |$rounds""".stripMargin
  }

  val q95Oracle: String = {
    val n = 8
    val mergeRows = (1 to n)
      .map(k => s"""SELECT $k AS step, l AS "left", r AS "right", freq FROM top$k""")
      .mkString(" UNION ALL ")
    s"""WITH ${bpeRoundsSql(n)},
       |p${n + 1} AS MATERIALIZED (
       |  SELECT CAST(SUM(t.weight) AS BIGINT) AS freq
       |  FROM (SELECT string_split(substr(enc, 2, len(enc) - 2), '||') AS toks, weight FROM w$n) t,
       |       LATERAL unnest(range(1, len(t.toks))) AS u(i)
       |  GROUP BY t.toks[u.i], t.toks[u.i + 1]
       |), resid AS (
       |  SELECT CAST(COALESCE(MAX(freq), 0) AS BIGINT) AS residual_top_freq FROM p${n + 1}
       |)
       |SELECT m.step, m."left", m."right", m.freq, resid.residual_top_freq,
       |       resid.residual_top_freq <= (SELECT freq FROM top$n) AS greedy_ok
       |FROM ($mergeRows) m, resid
       |ORDER BY m.step""".stripMargin
  }

  // ---------------------------------------------------------------- q111
  /** BPE tokenizer APPLY (encode) — the half of the tokenizer story
    * q95 trains: run the 8 trained merges over every document and
    * report per-doc token statistics (word count, subword count, char
    * count, chars-per-token — the fertility figure tokenizer work
    * tracks). The 100 TB shape: encoding is per-WORD, so it runs once
    * per DISTINCT word (the same pre-aggregation that makes training
    * affordable) and joins back to the doc stream broadcast — the
    * corpus is never re-folded, and the merge table is a driver-side
    * constant in the expression tree, exactly how a shipped tokenizer
    * applies its merges.txt.
    *
    * Oracle: static full replay — re-trains the merges via the q95
    * zero-literal CTE chain (shared [[bpeRoundsSql]] builder, word
    * column threaded through), reads each word's final token count
    * from the chain's last state, and re-aggregates per doc. Query
    * and oracle derive the merge sequence INDEPENDENTLY from raw
    * text; a hash match certifies train + encode end-to-end.
    */
  def q111BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (merges, _) = Bpe.trainMerges(docs, "text", nMerges = 8)
    val seq = merges.map(m => (m._2, m._3))
    val wdoc = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val wdist = wdoc
      .select(col("word"))
      .distinct()
      .select(
        col("word"),
        size(Bpe.applyMerges(split(col("word"), ""), seq)).as("n_sub"),
        length(col("word")).as("n_chars_w")
      )
    wdoc
      .join(broadcast(wdist), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_sub")).cast("long").as("n_subwords"),
        sum(col("n_chars_w")).cast("long").as("n_chars"),
        round(
          sum(col("n_chars_w")).cast("double") / sum(col("n_sub")).cast("double"),
          6
        ).as("chars_per_token")
      )
      .orderBy(col("doc_id"))
  }

  val q111Oracle: String = {
    val n = 8
    s"""WITH ${bpeRoundsSql(n)},
       |enc AS (
       |  SELECT word,
       |    CAST(len(string_split(substr(enc, 2, len(enc) - 2), '||')) AS BIGINT) AS n_sub,
       |    CAST(len(word) AS BIGINT) AS n_chars_w
       |  FROM w$n
       |), wd AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_sub) AS BIGINT) AS n_subwords,
       |  CAST(SUM(n_chars_w) AS BIGINT) AS n_chars,
       |  round(CAST(SUM(n_chars_w) AS DOUBLE) / CAST(SUM(n_sub) AS DOUBLE), 6) AS chars_per_token
       |FROM wd JOIN enc USING (word)
       |WHERE len(word) > 0
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q112
  /** Sparse all-pairs TF-IDF cosine over word 3-grams (ops/SparseSim) —
    * the inverted-index near-dup miner for SPARSE feature spaces
    * (Bayardo et al., WWW'07), complementing the dense-vector ANN
    * family and the set-semantics MinHash/Jaccard miners (q27/q29):
    * same candidate generation (shared-feature join) but a WEIGHTED
    * similarity, so boilerplate shared by every document (high df → low
    * idf) stops dominating the score. Pair work is Σ df², and the
    * CONSTANT df-cap (64) bounds it by 64·|postings| — linear in corpus
    * size unconditionally (Σ_{df≤C} df² ≤ C·Σdf; SparseSim scaladoc).
    * Round 7: replaced the scale-following greatest(5, N/100) cap,
    * whose Σdf² the SparseCandidateSpec ladder measured ~quadratic
    * (head features saturate at df = N/100). Exact within the pruned
    * space; the oracle replays the identical law, decimal dots
    * end-to-end.
    */
  def q112SparseAllPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val post = SparseSim.postings(
      docs, "doc_id", "text", n = 3,
      dfCap = lit(64.0)
    )
    SparseSim
      .allPairs(post, "doc_id", threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q112Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |  WHERE len(string_split_regex(trim(text), '\s+')) >= 3
      |), n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM t),
      |idx AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM t),
      |tf AS (
      |  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS feature,
      |    CAST(count(*) AS BIGINT) AS tc
      |  FROM idx GROUP BY 1, 2
      |), df AS (SELECT feature, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |w AS (
      |  SELECT tf.doc_id, tf.feature,
      |    CAST(tf.tc AS DOUBLE) * ln((SELECT n_docs FROM n) / CAST(df.df AS DOUBLE)) AS w
      |  FROM tf JOIN df USING (feature)
      |  WHERE CAST(df.df AS DOUBLE) <= 64.0
      |), nrm AS (
      |  SELECT doc_id,
      |    sqrt(CAST(SUM(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE)) AS nm
      |  FROM w GROUP BY 1
      |), p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(SUM(CAST(a.w * b.w AS DECIMAL(38,12))) AS DOUBLE) AS dot,
      |    CAST(count(*) AS BIGINT) AS n_shared
      |  FROM w a JOIN w b ON a.feature = b.feature AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT id_a, id_b, n_shared,
      |  round(p.dot / (na.nm * nb.nm), 6) AS cosine
      |FROM p JOIN nrm na ON p.id_a = na.doc_id JOIN nrm nb ON p.id_b = nb.doc_id
      |WHERE round(p.dot / (na.nm * nb.nm), 6) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q113
  /** Training-export shard plan (ops/ExportPlan): deterministic global
    * pseudo-shuffle (portable multiplicative hash, the q85 split key)
    * + token-budgeted shard assignment via the two-pass distributed
    * prefix sum — the operator that turns a curated corpus into the
    * reproducible shard manifest a trainer reads. The oracle states the
    * SEMANTIC definition (one global window cumsum in (h, doc_id)
    * order); the Spark side computes it with zero global sorts — the
    * hash-bucket two-pass whose equivalence IS the thing certified.
    * Budget 2048 tokens/shard → ~13 shards at sf0.01, ~130 at sf0.1.
    */
  def q113ShardPlan(s: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    val docs = Tables.documents(s, dir)
    val assigned = ExportPlan.assignShards(
      docs, "doc_id",
      weightCol = size(TextStats.tokens(col("text"))),
      budget = budget
    )
    ExportPlan
      .shardManifest(assigned, budget)
      .select(col("shard_id"), col("n_docs"), col("n_tokens"), col("h_lo"), col("h_hi"), col("fill_ppm"))
      .orderBy(col("shard_id"))
  }

  val q113Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, (doc_id * 2654435761) % 1000003 AS h,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS wt
      |  FROM documents
      |), c AS (
      |  SELECT *, SUM(wt) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) - wt AS cum_before
      |  FROM d
      |), s AS (SELECT *, CAST(cum_before // 2048 AS BIGINT) AS shard_id FROM c)
      |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(wt) AS BIGINT) AS n_tokens,
      |  CAST(MIN(h) AS BIGINT) AS h_lo, CAST(MAX(h) AS BIGINT) AS h_hi,
      |  CAST(SUM(wt) * 1000000 // 2048 AS BIGINT) AS fill_ppm
      |FROM s GROUP BY shard_id
      |ORDER BY shard_id""".stripMargin

  // ---------------------------------------------------------------- q114
  /** Decontamination COVERAGE report (ops/SparseSim coverage law): the
    * eval slice (doc_id % 10 = 7) becomes a frozen TF-IDF index; every
    * candidate training doc is scored by the asymmetric containment
    * "fraction of eval doc r's idf²-weighted 3-gram mass present in
    * probe p" — the graded form of the binary q61/q64 sweeps (those
    * answer "does any eval gram occur?", this answers "HOW MUCH of
    * which eval doc leaked?", the report a contamination audit ships).
    * Chosen over cosine so it needs ONE aggregation — which is what
    * lets streaming/StreamingSparseSim run the identical law on an
    * ingest stream against the identical index (parity spec). Pair
    * work is again Σ df² over the CAPPED eval vocabulary — constant
    * cap 64, same linear-work bound as q112 (round 7; was the
    * scale-following cap the ladder measured superlinear); probe-side
    * work is map-side distinct-gram extraction only.
    */
  def q114DecontamCoverage(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val idx = SparseSim.coverageIndex(
      docs.filter(col("doc_id") % 10 === 7), "doc_id", "text", n = 3,
      dfCap = lit(64.0)
    )
    val probes = SparseSim
      .distinctFeatures(docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text", n = 3)
      .withColumnRenamed("doc_id", "probe_id")
    SparseSim
      .coverageScores(probes, idx, threshold = 0.5)
      .orderBy(col("probe_id"), col("ref_id"))
  }

  val q114Oracle: String =
    """WITH ev AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |  WHERE doc_id % 10 = 7 AND len(string_split_regex(trim(text), '\s+')) >= 3
      |), n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM ev),
      |idx AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM ev),
      |tf AS (
      |  SELECT doc_id AS ref_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS feature,
      |    CAST(count(*) AS BIGINT) AS tc
      |  FROM idx GROUP BY 1, 2
      |), df AS (SELECT feature, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |w AS (
      |  SELECT tf.ref_id, tf.feature,
      |    CAST(tf.tc AS DOUBLE) * ln((SELECT n_docs FROM n) / CAST(df.df AS DOUBLE)) AS w
      |  FROM tf JOIN df USING (feature)
      |  WHERE CAST(df.df AS DOUBLE) <= 64.0
      |), nm AS (
      |  SELECT ref_id, CAST(SUM(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE) AS nm2
      |  FROM w GROUP BY 1 HAVING CAST(SUM(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE) > 0
      |), pr AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |  WHERE doc_id % 10 <> 7 AND len(string_split_regex(trim(text), '\s+')) >= 3
      |), pidx AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM pr),
      |pf AS (
      |  SELECT DISTINCT doc_id AS probe_id,
      |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS feature
      |  FROM pidx
      |), cov AS (
      |  SELECT pf.probe_id, w.ref_id, CAST(count(*) AS BIGINT) AS n_shared,
      |    round(CAST(SUM(CAST(w.w * w.w AS DECIMAL(38,12))) AS DOUBLE) / MAX(nm.nm2), 6) AS coverage
      |  FROM pf JOIN w USING (feature) JOIN nm ON w.ref_id = nm.ref_id
      |  GROUP BY 1, 2
      |)
      |SELECT probe_id, ref_id, n_shared, coverage FROM cov
      |WHERE coverage >= 0.5
      |ORDER BY probe_id, ref_id""".stripMargin

  // ---------------------------------------------------------------- q115
  /** Weighted sampling without replacement (ops/WeightedSample,
    * Efraimidis–Spirakis A-Res): top-12 docs per source, probability
    * proportional to TOKEN COUNT — the token-budget-proportional draw
    * a mixture pipeline uses to subsample a source to budget while
    * keeping long docs represented by mass, not count. Deterministic
    * end-to-end (portable-hash u, rounded-key ranking), so the oracle
    * replays the identical key law and window. Map-side keys + one
    * WindowGroupLimit-pruned group shuffle.
    */
  def q115WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(s, dir)
      .select(col("source"), col("doc_id"), size(TextStats.tokens(col("text"))).as("n_tokens"))
    WeightedSample
      .topKByWeight(d, "source", "doc_id", col("n_tokens"), k = 12)
      .select(col("source"), col("rn"), col("doc_id"), col("n_tokens"), col("es_key"))
      .orderBy(col("source"), col("rn"))
  }

  val q115Oracle: String =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |    round(
      |      ln((CAST((doc_id * 2654435761) % 1000003 AS DOUBLE) + 0.5) / 1000003.0)
      |        / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE),
      |      6) AS es_key
      |  FROM documents
      |  WHERE len(string_split_regex(trim(text), '\s+')) > 0
      |), r AS (
      |  SELECT source, doc_id, n_tokens, es_key,
      |    CAST(ROW_NUMBER() OVER (
      |      PARTITION BY source ORDER BY es_key DESC, doc_id) AS BIGINT) AS rn
      |  FROM d
      |)
      |SELECT source, rn, doc_id, n_tokens, es_key FROM r
      |WHERE rn <= 12
      |ORDER BY source, rn""".stripMargin

  // ---------------------------------------------------------------- q116
  /** Reproducible-export INTEGRITY digest (ops/ExportPlan.shardDigests):
    * per planned shard, two associative content digests — sum mod 2^61-1
    * and bit_xor of every member doc's portable 60-bit digest
    * (TextStats.contentDigest60). The verification half of the export
    * contract q113 plans: a trainer (or a re-run on a different cluster
    * size / engine) recomputes the pair per shard and diffs — any
    * membership drift flips both numbers, with no ordered fold and no
    * text movement (map-side-combined aggregates over 16-byte rows).
    * Budget matches q113 so the manifest and digest rows key together.
    */
  def q116ExportDigest(s: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    val docs = Tables.documents(s, dir)
    val assigned = ExportPlan.assignShards(
      docs, "doc_id",
      weightCol = size(TextStats.tokens(col("text"))),
      budget = budget
    )
    val digests = docs.select(
      col("doc_id").as("id"),
      TextStats.contentDigest60(col("text")).as("digest")
    )
    ExportPlan
      .shardDigests(assigned, digests)
      .orderBy(col("shard_id"))
  }

  val q116Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, (doc_id * 2654435761) % 1000003 AS h,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS wt,
      |    ('0x' || substr(md5(regexp_replace(trim(text), '\s+', ' ', 'g')), 1, 15))::BIGINT AS digest
      |  FROM documents
      |), c AS (
      |  SELECT *, SUM(wt) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) - wt AS cum_before
      |  FROM d
      |), s AS (SELECT *, CAST(cum_before // 2048 AS BIGINT) AS shard_id FROM c)
      |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CAST(digest AS DECIMAL(38,0))) % 2305843009213693951 AS BIGINT) AS digest_sum,
      |  bit_xor(digest) AS digest_xor
      |FROM s GROUP BY shard_id
      |ORDER BY shard_id""".stripMargin

  // ---------------------------------------------------------------- q117
  /** CCNet head/middle/tail perplexity bucketing per language (Wenzek
    * et al.) — the pruning stage that CONSUMES q110's LM scores: within
    * each language, docs are ranked by avg_nll (best = closest to the
    * reference LM) and cut into terciles by DISCRETE rank arithmetic
    * ((rank-1)*3 div n — integer, so both engines agree to the row).
    * The per-language ranking deliberately does NOT use a
    * `partitionBy(lang)` window — a whole language in one task is the
    * single-partition collapse at 100 TB — but ops/Rank's range-binned
    * two-pass prefix sum, whose output IS the single-window definition
    * (the oracle replays the plain-window form; equality is the thing
    * certified, the q113 pattern). Scores ride rounded-6 into the rank
    * so tie order (then doc_id) is engine-exact.
    */
  def q117CcnetBuckets(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val scored = LmScore.scoreHeldOut(docs, "doc_id", "text", refPred = col("doc_id") % 10 === 0)
    val withLang = scored.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val ranked = Rank.rankWithin(withLang, Seq("lang"), col("avg_nll"), col("doc_id"), "rn", bins = 64)
    val sizes = ranked.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
    ranked
      .join(broadcast(sizes), Seq("lang"))
      .withColumn("bucket", expr("(rn - 1) * 3 div nl"))
      .groupBy(col("lang"), col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("avg_nll").cast("decimal(38,12)")).cast("double") / count(lit(1)), 6)
          .as("mean_nll"),
        min(col("avg_nll")).as("nll_lo"),
        max(col("avg_nll")).as("nll_hi")
      )
      .orderBy(col("lang"), col("bucket"))
  }

  val q117Oracle: String =
    lmScoredChainSql +
      """, lng AS (
        |  SELECT s.doc_id, s.avg_nll, d.lang
        |  FROM scored s JOIN documents d USING (doc_id)
        |), rk AS (
        |  SELECT lang, doc_id, avg_nll,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY avg_nll, doc_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS nl
        |  FROM lng
        |)
        |SELECT lang, (rn - 1) * 3 // nl AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  round(CAST(SUM(CAST(avg_nll AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS mean_nll,
        |  MIN(avg_nll) AS nll_lo, MAX(avg_nll) AS nll_hi
        |FROM rk GROUP BY lang, (rn - 1) * 3 // nl
        |ORDER BY lang, bucket""".stripMargin

  // ---------------------------------------------------------------- q118
  /** Per-source corpus integrity digest — the INCREMENTAL-ingest end of
    * the export contract (q116 is the per-shard end at export time):
    * (n_docs, sum-mod, bit_xor) of every doc's portable content digest,
    * grouped by source. The exact same function runs on an ingest
    * STREAM ([[graft.streaming.StreamingDigest]] — associative
    * aggregates are streaming-native at constant state per source;
    * parity spec) so a live pipeline and any batch/cross-engine re-run
    * certify each other.
    */
  def q118SourceDigest(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingDigest
      .perGroupDigest(Tables.documents(s, dir), "source", "text")
      .orderBy(col("source"))

  val q118Oracle: String =
    """WITH d AS (
      |  SELECT source,
      |    ('0x' || substr(md5(regexp_replace(trim(text), '\s+', ' ', 'g')), 1, 15))::BIGINT AS digest
      |  FROM documents
      |)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CAST(digest AS DECIMAL(38,0))) % 2305843009213693951 AS BIGINT) AS digest_sum,
      |  bit_xor(digest) AS digest_xor
      |FROM d GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q119
  /** One-pass column profiler (ANALYZE-style): per numeric lineitem
    * column — row count, exact NDV, min, max, decimal-staged mean. The
    * table is scanned ONCE and `unpivot` melts the k profiled columns
    * into (col_name, value) rows map-side, so all k profiles cost one
    * scan + one aggregate pipeline instead of k separate jobs — the
    * difference between ANALYZE on a 100 TB table touching it once vs
    * k times. Exact NDV is the semantics here (count_distinct's partial
    * dedup shuffles (col_name, value) pairs); the sketch-grade variant
    * at open-ended cardinalities is q44's HLL — same query shape, one
    * agg swap.
    */
  def q119ColumnProfile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    Tables
      .lineitem(s, dir)
      .select(cols.map(c => col(c).cast("double").as(c)): _*)
      .unpivot(Array.empty, cols.map(col).toArray, "col_name", "value")
      .groupBy(col("col_name"))
      .agg(
        count(col("value")).as("n"),
        count_distinct(col("value")).as("ndv"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"),
        round(sum(col("value").cast("decimal(38,12)")).cast("double") / count(col("value")), 6)
          .as("vavg")
      )
      .orderBy(col("col_name"))
  }

  val q119Oracle: String = {
    val cols = Seq("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val union = cols
      .map(c => s"SELECT '$c' AS col_name, CAST($c AS DOUBLE) AS value FROM lineitem")
      .mkString("\n  UNION ALL ")
    s"""WITH u AS (
       |  $union
       |)
       |SELECT col_name, CAST(COUNT(value) AS BIGINT) AS n,
       |  CAST(COUNT(DISTINCT value) AS BIGINT) AS ndv,
       |  MIN(value) AS vmin, MAX(value) AS vmax,
       |  round(CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE) / COUNT(value), 6) AS vavg
       |FROM u GROUP BY col_name
       |ORDER BY col_name""".stripMargin
  }

  // ---------------------------------------------------------------- q120
  /** The CURATION PIPELINE end-to-end — the capstone composition the
    * individual operators exist for, run as ONE dataflow: quality gate
    * (q21 law, score ≥ 0.5) → exact token-set dedup keep-min-id (q24/
    * q82 law) → eval-set decontamination (q61 law: drop any doc sharing
    * a distinct word-5-gram with the doc_id < 50 eval slice) → token-
    * budgeted shard plan over the survivors (q113 two-pass prefix sum)
    * → shard manifest merged with content digests (q116 law). Output:
    * one row per planned shard of the CURATED corpus, layout + integrity
    * columns together — the artifact a trainer consumes.
    *
    * Every stage is individually oracled elsewhere; THIS query's oracle
    * replays the full composition (nested CTEs of the same five laws),
    * certifying the stages compose without a seam — the difference
    * between a query zoo and a pipeline. Plan-wise nothing new appears:
    * map-side quality features, two gram/fp-keyed shuffles, the
    * broadcast eval probe, the bucketed prefix sum — every shape
    * audited by its own contract already; AQE re-plans freely between
    * stages at 100 TB.
    */
  def q120CurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    val docs = Tables.documents(s, dir)
    // 1. quality gate (corpus side only — the eval slice is not curated)
    val scored = TextStats
      .withQuality(docs.filter(col("doc_id") >= 50), "text")
      .filter(col("quality_score") >= 0.5)
      .select(col("doc_id"), col("text"))
    // 2. exact dedup: keep the min doc_id per token-set fingerprint
    val keepers = scored
      .groupBy(TextStats.tokenSetFingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val deduped = scored.join(keepers, Seq("doc_id"), "left_semi")
    // 3. decontamination: anti-join on shared distinct 5-grams vs eval
    val evalGrams = docs
      .filter(col("doc_id") < 50)
      .select(explode(TextDedup.shingles(col("text"), 5)).as("ng"))
      .distinct()
    val contaminated = deduped
      .select(col("doc_id"), explode(TextDedup.shingles(col("text"), 5)).as("ng"))
      .join(broadcast(evalGrams), Seq("ng"))
      .select(col("doc_id"))
      .distinct()
    val curated = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    // 4.+5. shard plan + manifest + digests over the curated survivors
    val assigned = ExportPlan.assignShards(
      curated, "doc_id",
      weightCol = size(TextStats.tokens(col("text"))),
      budget = budget
    )
    val digests = curated.select(
      col("doc_id").as("id"),
      TextStats.contentDigest60(col("text")).as("digest")
    )
    ExportPlan
      .shardManifest(assigned, budget)
      .join(
        ExportPlan.shardDigests(assigned, digests).select(col("shard_id"), col("digest_sum"), col("digest_xor")),
        Seq("shard_id")
      )
      .select(
        col("shard_id"), col("n_docs"), col("n_tokens"),
        col("h_lo"), col("h_hi"), col("fill_ppm"),
        col("digest_sum"), col("digest_xor")
      )
      .orderBy(col("shard_id"))
  }

  val q120Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), qual AS (
      |  SELECT doc_id, text, toks FROM d
      |  WHERE doc_id >= 50 AND
      |    0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) +
      |    0.3 * (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) +
      |    0.3 * least(CAST(len(toks) AS DOUBLE) / 200.0, 1.0) >= 0.5
      |), keep AS (
      |  SELECT MIN(doc_id) AS doc_id
      |  FROM (SELECT doc_id, md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp FROM qual)
      |  GROUP BY fp
      |), dd AS (
      |  SELECT q.doc_id, q.text, q.toks FROM qual q JOIN keep k ON q.doc_id = k.doc_id
      |), sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(0, greatest(len(toks) - 4, 1)),
      |    i -> array_to_string(toks[i+1:i+5], ' '))) AS ngs
      |  FROM d
      |), bench AS (
      |  SELECT DISTINCT unnest(ngs) AS ng FROM sh WHERE doc_id < 50
      |), contaminated AS (
      |  SELECT DISTINCT e.doc_id
      |  FROM (SELECT s.doc_id, unnest(s.ngs) AS ng FROM sh s JOIN dd ON s.doc_id = dd.doc_id) e
      |  JOIN bench b ON e.ng = b.ng
      |), curated AS (
      |  SELECT dd.doc_id, dd.text, dd.toks FROM dd
      |  WHERE dd.doc_id NOT IN (SELECT doc_id FROM contaminated)
      |), w AS (
      |  SELECT doc_id, (doc_id * 2654435761) % 1000003 AS h,
      |    CAST(len(toks) AS BIGINT) AS wt,
      |    ('0x' || substr(md5(regexp_replace(trim(text), '\s+', ' ', 'g')), 1, 15))::BIGINT AS digest
      |  FROM curated
      |), c AS (
      |  SELECT *, SUM(wt) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) - wt AS cum_before
      |  FROM w
      |), s AS (SELECT *, CAST(cum_before // 2048 AS BIGINT) AS shard_id FROM c)
      |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(wt) AS BIGINT) AS n_tokens,
      |  CAST(MIN(h) AS BIGINT) AS h_lo, CAST(MAX(h) AS BIGINT) AS h_hi,
      |  CAST(SUM(wt) * 1000000 // 2048 AS BIGINT) AS fill_ppm,
      |  CAST(SUM(CAST(digest AS DECIMAL(38,0))) % 2305843009213693951 AS BIGINT) AS digest_sum,
      |  bit_xor(digest) AS digest_xor
      |FROM s GROUP BY shard_id
      |ORDER BY shard_id""".stripMargin

  // ---------------------------------------------------------------- q121
  /** S4 DE positional-payload decode end-to-end (ops/Normalize
    * .decodeDePayload — reference app/main.py:747-783): DE-shaped
    * payload arrays are synthesized deterministically from events (the
    * q18/q19/q47 synthetic-generator discipline: both engines build the
    * IDENTICAL raw input, so the thing certified is the DECODE), with
    * every reference failure mode injected — short/malformed arrays
    * (every 10th row), unparseable values (every 7th), an unknown
    * component id in the rotation (the comp_map fallthrough), and
    * Berlin-naive key timestamps (January slice — away from the DST
    * hours where engines legitimately disagree, the q47 rule). All
    * map-side: a filter + projection over the scan, no shuffle until
    * the output sort.
    */
  def q121DePayloadDecode(s: SparkSession, dir: String): DataFrame = {
    val comps = array(lit("1"), lit("2"), lit("5"), lit("7"), lit("9"))
    val raw = Tables
      .events(s, dir)
      .filter(col("ts") < lit("2024-03-01"))
      .select(
        col("event_id"),
        col("user_id").cast("string").as("station_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("ts_str"),
        when(col("event_id") % 10 === 0, array(lit("1"), lit("x")))
          .otherwise(
            array(
              element_at(comps, (col("event_id") % 5 + 1).cast("int")),
              lit("measurement"),
              when(col("event_id") % 7 === 0, lit("not-a-number"))
                .otherwise(col("value").cast("string")),
              lit(""),
              when(col("event_id") % 3 === 0, lit("1")).otherwise(lit("0"))
            )
          )
          .as("payload")
      )
    Normalize
      .decodeDePayload(raw)
      .select(
        col("event_id"), col("station_id"), col("pollutant"), col("scope"),
        col("value"), col("unit"),
        date_format(col("ts_utc"), "yyyy-MM-dd HH:mm:ss").as("utc"),
        col("valid_flag"), col("source")
      )
      .orderBy(col("event_id"))
  }

  val q121Oracle: String =
    """WITH ev AS (
      |  SELECT event_id, CAST(user_id AS VARCHAR) AS station_id, "value",
      |    strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_str
      |  FROM events WHERE ts < TIMESTAMP '2024-03-01'
      |), raw AS (
      |  SELECT event_id, station_id, ts_str,
      |    CASE WHEN event_id % 10 = 0 THEN ['1', 'x']
      |         ELSE [ ['1','2','5','7','9'][CAST(event_id % 5 + 1 AS INT)],
      |                'measurement',
      |                CASE WHEN event_id % 7 = 0 THEN 'not-a-number'
      |                     ELSE CAST("value" AS VARCHAR) END,
      |                '',
      |                CASE WHEN event_id % 3 = 0 THEN '1' ELSE '0' END ]
      |    END AS payload
      |  FROM ev
      |), dec AS (
      |  SELECT event_id, station_id,
      |    CASE payload[1] WHEN '1' THEN 'pm10' WHEN '2' THEN 'pm25'
      |                    WHEN '5' THEN 'no2' WHEN '7' THEN 'o3'
      |                    ELSE payload[1] END AS pollutant,
      |    payload[2] AS scope,
      |    TRY_CAST(payload[3] AS DOUBLE) AS "value",
      |    'ug/m3' AS unit,
      |    strftime(
      |      timezone('UTC', timezone('Europe/Berlin',
      |        TRY_STRPTIME(ts_str, '%Y-%m-%dT%H:%M:%S'))),
      |      '%Y-%m-%d %H:%M:%S') AS utc,
      |    payload[5] AS valid_flag,
      |    'de' AS source
      |  FROM raw WHERE len(payload) >= 3
      |)
      |SELECT * FROM dec WHERE "value" IS NOT NULL
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q122
  /** BM25 ranked retrieval (ops.Bm25): inverted-index top-k search over
    * the documents corpus for a fixed multi-term query set — the
    * retrieval primitive behind targeted decontamination scoring and
    * corpus search. Postings are cut to query terms by a broadcast
    * semi join before anything heavy, idf is bounded model state (one
    * double per query term), scores fold components in deterministic
    * term order (the q35 bit-exact discipline), and top-k rides the
    * ops/Rank two-pass distributed rank — no per-query single-task
    * window even when one term matches half the corpus.
    *
    * DYNAMIC oracle (q122OracleFor): idf and avgdl are transcendental /
    * corpus-derived, so Verify computes them once in Scala and embeds
    * them as string-cast double literals (shortest-repr round-trip is
    * bit-exact); DuckDB then replays the identical +,*,/ arithmetic,
    * the ordered list_reduce fold, and the (score desc, doc_id) rank.
    */
  val q122Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("hash", "join"),
    2 -> Seq("window", "merge", "batch"),
    3 -> Seq("vector", "scan", "slow"),
    4 -> Seq("customer")
  )

  def q122Bm25(s: SparkSession, dir: String): DataFrame =
    Bm25
      .search(s, Tables.documents(s, dir), "doc_id", "text", q122Queries, k = 10)
      .orderBy(col("qid"), col("rank"))

  def q122OracleFor(s: SparkSession, dir: String): String = {
    val docs = Tables.documents(s, dir)
    val terms = q122Queries.flatMap(_._2).distinct
    val st = Bm25.fitStats(docs, "doc_id", "text", terms,
      Bm25.postings(docs, "doc_id", "text", terms))
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val qvals = q122Queries
      .flatMap { case (qid, ts) =>
        ts.distinct.map(t => s"($qid, '$t', CAST('${st.idf(t)}' AS DOUBLE))")
      }
      .mkString(", ")
    val k1p1 = s"CAST('${Bm25.K1 + 1.0}' AS DOUBLE)"
    val k1 = s"CAST('${Bm25.K1}' AS DOUBLE)"
    val oneMinusB = s"CAST('${1.0 - Bm25.B}' AS DOUBLE)"
    val b = s"CAST('${Bm25.B}' AS DOUBLE)"
    val avgdl = s"CAST('${st.avgdl}' AS DOUBLE)"
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    len(string_split_regex(lower(trim(text)), '\\s+')) AS dl,
       |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, any_value(dl) AS dl
       |  FROM toks WHERE term IN ($termList)
       |  GROUP BY doc_id, term
       |), q(qid, term, idf) AS (VALUES $qvals),
       |comp AS (
       |  SELECT q.qid, tf.doc_id, q.term,
       |    q.idf * (tf * $k1p1) /
       |      (tf + $k1 * ($oneMinusB + $b * dl / $avgdl)) AS c
       |  FROM tf JOIN q USING (term)
       |), scored AS (
       |  SELECT qid, doc_id,
       |    list_reduce(
       |      list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY term)),
       |      (x, y) -> x + y) AS score
       |  FROM comp GROUP BY qid, doc_id
       |), ranked AS (
       |  SELECT qid, doc_id, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
       |  FROM scored
       |)
       |SELECT qid, CAST(rnk AS BIGINT) AS "rank", doc_id, score
       |FROM ranked WHERE rnk <= 10
       |ORDER BY qid, rnk""".stripMargin
  }

  // ---------------------------------------------------------------- q123
  /** Per-shard ORDER digest (ExportPlan.shardOrderDigests): certifies
    * the (h, doc_id) pseudo-shuffle order a trainer reads — the
    * complement of q116, whose sum/xor membership digests are
    * order-blind by design. Σ pos·digest mod 2^61-1 with pos from the
    * ops/Rank two-pass distributed rank (never a per-shard single-task
    * window); per-row mod before the sum keeps the decimal accumulator
    * exact at any shard size. The oracle replays the full assignment +
    * a plain row_number window + the same modular sum in HUGEINT —
    * CAST to BIGINT at every emission point (the r7 shard_id lesson).
    */
  def q123OrderDigest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val assigned = ExportPlan.assignShards(
      docs, "doc_id",
      weightCol = size(TextStats.tokens(col("text"))),
      budget = 2048L
    )
    val digests = docs.select(
      col("doc_id").as("id"),
      TextStats.contentDigest60(col("text")).as("digest")
    )
    ExportPlan.shardOrderDigests(assigned, digests).orderBy(col("shard_id"))
  }

  // ---------------------------------------------------------------- q124
  /** Incremental corpus-digest maintenance law (ops.CorpusDelta): two
    * snapshots are derived deterministically from the documents table
    * (drops, text edits, and a source MOVE — the q74 CDC-derivation
    * pattern), diffed id-keyed, and the per-source digest congruence
    *   sum_after ≡ sum_before + Σ events (mod 2^61-1)
    * is certified per group with the event counts. This is the law
    * that lets q118's corpus digests update from a change feed at
    * 100 TB without rescanning; the oracle replays the full algebra —
    * snapshots, diff, events, modular sums — and must agree on every
    * count, both sums, the event delta, AND the law verdict.
    */
  def q124DeltaDigest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def snap(df: DataFrame): DataFrame =
      df.select(
        col("doc_id"),
        col("source"),
        TextStats.contentDigest60(col("text")).as("digest")
      )
    val before = snap(docs.filter(col("doc_id") % 11 =!= 3))
    val after = snap(
      docs
        .filter(col("doc_id") % 13 =!= 5)
        .withColumn(
          "text",
          when(col("doc_id") % 17 === 1, concat(col("text"), lit(" updated")))
            .otherwise(col("text"))
        )
        .withColumn(
          "source",
          when(col("doc_id") % 19 === 4, concat(col("source"), lit("_x")))
            .otherwise(col("source"))
        )
    )
    CorpusDelta
      .deltaDigest(before, after, "doc_id", "source", "digest")
      .orderBy(col("g"))
  }

  val q124Oracle: String =
    """WITH b AS (
      |  SELECT doc_id, source AS gb,
      |    ('0x' || substr(md5(regexp_replace(trim(text), '\s+', ' ', 'g')), 1, 15))::BIGINT AS db
      |  FROM documents WHERE doc_id % 11 <> 3
      |), a0 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 19 = 4 THEN source || '_x' ELSE source END AS ga,
      |    CASE WHEN doc_id % 17 = 1 THEN text || ' updated' ELSE text END AS text
      |  FROM documents WHERE doc_id % 13 <> 5
      |), a AS (
      |  SELECT doc_id, ga,
      |    ('0x' || substr(md5(regexp_replace(trim(text), '\s+', ' ', 'g')), 1, 15))::BIGINT AS da
      |  FROM a0
      |), j AS (
      |  SELECT gb, db, ga, da
      |  FROM b FULL OUTER JOIN a ON b.doc_id = a.doc_id
      |), ev AS (
      |  SELECT gb AS g, -CAST(db AS HUGEINT) AS d FROM j
      |    WHERE da IS NULL OR (db IS NOT NULL AND ga <> gb)
      |  UNION ALL
      |  SELECT ga, CAST(da AS HUGEINT) FROM j
      |    WHERE db IS NULL OR (da IS NOT NULL AND ga <> gb)
      |  UNION ALL
      |  SELECT ga, CAST(da AS HUGEINT) - db FROM j
      |    WHERE db IS NOT NULL AND da IS NOT NULL AND ga = gb AND da <> db
      |), delta AS (
      |  SELECT g, CAST(((SUM(d) % 2305843009213693951) + 2305843009213693951)
      |                 % 2305843009213693951 AS BIGINT) AS delta_sum
      |  FROM ev GROUP BY g
      |), cnt AS (
      |  SELECT g,
      |    CAST(SUM(CASE WHEN k = 'add' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |    CAST(SUM(CASE WHEN k = 'rm' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |    CAST(SUM(CASE WHEN k = 'chg' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
      |  FROM (
      |    SELECT ga AS g, 'add' AS k FROM j WHERE db IS NULL OR (da IS NOT NULL AND ga <> gb)
      |    UNION ALL
      |    SELECT gb, 'rm' FROM j WHERE da IS NULL OR (db IS NOT NULL AND ga <> gb)
      |    UNION ALL
      |    SELECT ga, 'chg' FROM j WHERE db IS NOT NULL AND da IS NOT NULL AND ga = gb AND da <> db
      |  ) GROUP BY g
      |), sb AS (
      |  SELECT gb AS g, CAST(SUM(CAST(db AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS sum_before,
      |    CAST(count(*) AS BIGINT) AS n_before
      |  FROM b GROUP BY gb
      |), sa AS (
      |  SELECT ga AS g, CAST(SUM(CAST(da AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS sum_after,
      |    CAST(count(*) AS BIGINT) AS n_after
      |  FROM a GROUP BY ga
      |)
      |SELECT g,
      |  CAST(COALESCE(n_before, 0) AS BIGINT) AS n_before,
      |  CAST(COALESCE(n_after, 0) AS BIGINT) AS n_after,
      |  CAST(COALESCE(n_added, 0) AS BIGINT) AS n_added,
      |  CAST(COALESCE(n_removed, 0) AS BIGINT) AS n_removed,
      |  CAST(COALESCE(n_changed, 0) AS BIGINT) AS n_changed,
      |  CAST(COALESCE(delta_sum, 0) AS BIGINT) AS delta_sum,
      |  CAST(COALESCE(sum_before, 0) AS BIGINT) AS digest_sum_before,
      |  CAST(COALESCE(sum_after, 0) AS BIGINT) AS digest_sum_after,
      |  (CAST((COALESCE(sum_before, 0) + COALESCE(delta_sum, 0))
      |        % 2305843009213693951 AS BIGINT) = COALESCE(sum_after, 0)) AS law_holds
      |FROM sb
      |FULL OUTER JOIN sa USING (g)
      |FULL OUTER JOIN delta USING (g)
      |FULL OUTER JOIN cnt USING (g)
      |ORDER BY g""".stripMargin

  // ---------------------------------------------------------------- q125
  /** Stratified mixture-balanced sharding (ExportPlan.stratifiedShards):
    * each source dealt round-robin over 16 shards in within-source
    * pseudo-shuffle order, so every shard is an unbiased mini-corpus —
    * the complement of q113's budget packing. The oracle replays the
    * plain per-source window rank + mod + counts + balance verdict;
    * the ranking itself rides ops/Rank's two-pass (equality to the
    * single-window definition is the certified law, the q117 pattern).
    */
  def q125StratifiedShards(s: SparkSession, dir: String): DataFrame = {
    val assigned = ExportPlan.stratifiedShards(
      Tables.documents(s, dir), "doc_id", "source", nShards = 16)
    ExportPlan
      .stratifiedManifest(assigned, nShards = 16)
      .orderBy(col("shard_id"), col("src"))
  }

  val q125Oracle: String =
    """WITH d AS (
      |  SELECT doc_id AS id, source AS src,
      |    (doc_id * 2654435761) % 1000003 AS h
      |  FROM documents
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY src ORDER BY h, id) AS rn FROM d
      |), a AS (
      |  SELECT src, CAST((rn - 1) % 16 AS BIGINT) AS shard_id FROM r
      |), c AS (
      |  SELECT shard_id, src, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM a GROUP BY shard_id, src
      |), bs AS (
      |  SELECT src, max(n_docs) AS max_n, min(n_docs) AS min_n,
      |    count(*) AS shards_used
      |  FROM c GROUP BY src
      |), b AS (
      |  SELECT src,
      |    (max_n - CASE WHEN shards_used < 16 THEN 0 ELSE min_n END) <= 1
      |      AS src_balanced
      |  FROM bs
      |)
      |SELECT shard_id, src, n_docs, src_balanced
      |FROM c JOIN b USING (src)
      |ORDER BY shard_id, src""".stripMargin

  // ---------------------------------------------------------------- q126
  /** The GOPHER RULE SET (TextStats.withGopherRules): word-count and
    * mean-word-length bounds, required-stopword floor, CHAR-WEIGHTED
    * top-n-gram caps for n = 2..4 and a char-weighted duplicate-5-gram
    * cap, composed into the `keep` verdict — the published
    * Gopher/MassiveText repetition rules (Rae et al. 2021, Table A1)
    * that complement q58's count-ratio signals (a 20-char gram repeated
    * twice weighs 4× a 5-char one here, so the two catch different
    * boilerplate). Entirely map-side column algebra over one corpus
    * scan — zero shuffles before the final presentation sort; every
    * fraction is an exact-integer numerator over total token chars with
    * one double division, so the oracle replays it bit-for-bit. Rule
    * booleans compare the UNROUNDED doubles in both engines (rounding
    * is presentation-only), keeping verdicts threshold-exact.
    */
  def q126GopherRules(s: SparkSession, dir: String): DataFrame =
    TextStats
      .withGopherRules(Tables.documents(s, dir), "text")
      .select(
        col("doc_id"),
        col("n_words"),
        col("total_chars"),
        round(col("mean_word_len"), 6).as("mean_word_len"),
        col("stop_hits"),
        round(col("top2gram_char_frac"), 6).as("top2gram_char_frac"),
        round(col("top3gram_char_frac"), 6).as("top3gram_char_frac"),
        round(col("top4gram_char_frac"), 6).as("top4gram_char_frac"),
        round(col("dup5gram_char_frac"), 6).as("dup5gram_char_frac"),
        col("word_count_ok"),
        col("mean_len_ok"),
        col("stop_ok"),
        col("rep2_ok"),
        col("rep3_ok"),
        col("rep4_ok"),
        col("dup5_ok"),
        col("keep")
      )
      .orderBy(col("doc_id"))

  val q126Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |), b AS (
      |  SELECT doc_id, toks,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
      |    list_transform(range(0, greatest(len(toks)-2, 0) + 1), i -> array_to_string(toks[i+1:i+2], ' ')) AS g2,
      |    list_transform(range(0, greatest(len(toks)-3, 0) + 1), i -> array_to_string(toks[i+1:i+3], ' ')) AS g3,
      |    list_transform(range(0, greatest(len(toks)-4, 0) + 1), i -> array_to_string(toks[i+1:i+4], ' ')) AS g4,
      |    list_transform(range(0, greatest(len(toks)-5, 0) + 1), i -> array_to_string(toks[i+1:i+5], ' ')) AS g5
      |  FROM t
      |), m AS (
      |  SELECT doc_id, n_words, total_chars,
      |    CAST(total_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS mwl,
      |    CAST(len(list_intersect(list_distinct(toks), ['the','a','of','and','is','to','in'])) AS BIGINT) AS stop_hits,
      |    greatest(0, list_max(list_transform(list_distinct(g2), u -> len(list_filter(g2, x -> x = u)) * (length(u) - 1)))) AS m2,
      |    greatest(0, list_max(list_transform(list_distinct(g3), u -> len(list_filter(g3, x -> x = u)) * (length(u) - 2)))) AS m3,
      |    greatest(0, list_max(list_transform(list_distinct(g4), u -> len(list_filter(g4, x -> x = u)) * (length(u) - 3)))) AS m4,
      |    list_sum(list_transform(list_distinct(g5), u -> (len(list_filter(g5, x -> x = u)) - 1) * (length(u) - 4))) AS d5
      |  FROM b
      |), f AS (
      |  SELECT doc_id, n_words, total_chars, mwl, stop_hits,
      |    CAST(m2 AS DOUBLE) / CAST(total_chars AS DOUBLE) AS f2,
      |    CAST(m3 AS DOUBLE) / CAST(total_chars AS DOUBLE) AS f3,
      |    CAST(m4 AS DOUBLE) / CAST(total_chars AS DOUBLE) AS f4,
      |    CAST(d5 AS DOUBLE) / CAST(total_chars AS DOUBLE) AS f5
      |  FROM m
      |)
      |SELECT doc_id, n_words, total_chars,
      |  round(mwl, 6) AS mean_word_len,
      |  stop_hits,
      |  round(f2, 6) AS top2gram_char_frac,
      |  round(f3, 6) AS top3gram_char_frac,
      |  round(f4, 6) AS top4gram_char_frac,
      |  round(f5, 6) AS dup5gram_char_frac,
      |  (n_words >= 50 AND n_words <= 100000) AS word_count_ok,
      |  (mwl >= 3.0 AND mwl <= 10.0) AS mean_len_ok,
      |  (stop_hits >= 2) AS stop_ok,
      |  (f2 <= 0.20) AS rep2_ok,
      |  (f3 <= 0.18) AS rep3_ok,
      |  (f4 <= 0.16) AS rep4_ok,
      |  (f5 <= 0.15) AS dup5_ok,
      |  (n_words >= 50 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
      |   AND stop_hits >= 2 AND f2 <= 0.20 AND f3 <= 0.18 AND f4 <= 0.16
      |   AND f5 <= 0.15) AS keep
      |FROM f
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q127
  /** LEAKAGE-SAFE train/val/test split (ops/Splits.componentSplit): the
    * split hash is keyed on the NEAR-DUP COMPONENT label, not the doc
    * id, so a cluster can never straddle train and eval — the repair
    * for exactly the contamination q85's census MEASURES. The audit
    * re-derives the cross-split pair count (provably 0 by construction)
    * instead of asserting it: both engines count it from their own
    * assignment, so a regression in the label join turns the row red.
    * Pairs here come from the oracled exact-Jaccard audit slice (the
    * q84 discipline — the recursive-CTE CC replay bounds the SQL); at
    * corpus scale the same operator takes LSH band candidates and the
    * identical one-left-join assignment.
    */
  def q127LeakSafeSplit(s: SparkSession, dir: String): DataFrame = {
    val slice = Tables.documents(s, dir).filter(col("doc_id") < 300)
    val pairs = TextDedup
      .nearDupsExact(slice, "doc_id", "text", threshold = 0.9)
      .select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // eager: component build + leak audit share this cache
    val assigned = Splits
      .componentSplit(slice, pairs, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count() // eager: audit + profile consumers share this cache
    val leaky = pairs
      .join(assigned.select(col("doc_id").as("id_a"), col("split").as("split_a")), Seq("id_a"))
      .join(assigned.select(col("doc_id").as("id_b"), col("split").as("split_b")), Seq("id_b"))
      .filter(col("split_a") =!= col("split_b"))
      .agg(count(lit(1)).as("leaky_pairs"))
    assigned
      .groupBy(col("source"), col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("component").isNotNull, 1L).otherwise(0L)).as("n_clustered")
      )
      .crossJoin(broadcast(leaky))
      .select(col("source"), col("split"), col("n_docs"), col("n_clustered"), col("leaky_pairs"))
      .orderBy(col("source"), col("split"))
  }

  val q127Oracle: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, source, list_distinct(string_split_regex(trim(text), '\s+')) AS tk
      |  FROM documents WHERE doc_id < 300
      |), edges AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM t a JOIN t b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) /
      |        CAST(len(a.tk) + len(b.tk) - len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) >= 0.9
      |), sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM edges
      |  UNION ALL
      |  SELECT id_b, id_a FROM edges
      |), reach(id, comp) AS (
      |  SELECT DISTINCT src, src FROM sym
      |  UNION
      |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.id
      |), comps AS (
      |  SELECT id, MIN(comp) AS component FROM reach GROUP BY id
      |), k AS (
      |  SELECT t.doc_id, t.source, c.component,
      |    COALESCE(c.component, t.doc_id) AS split_key
      |  FROM t LEFT JOIN comps c ON t.doc_id = c.id
      |), sp AS (
      |  SELECT doc_id, source, component,
      |    CASE WHEN (split_key * 2654435761) % 1000003 < 800000 THEN 'train'
      |         WHEN (split_key * 2654435761) % 1000003 < 900000 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM k
      |), lk AS (
      |  SELECT CAST(count(*) AS BIGINT) AS leaky_pairs
      |  FROM edges e
      |  JOIN sp a ON e.id_a = a.doc_id
      |  JOIN sp b ON e.id_b = b.doc_id
      |  WHERE a.split <> b.split
      |)
      |SELECT sp.source, sp.split, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN sp.component IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered,
      |  lk.leaky_pairs
      |FROM sp, lk
      |GROUP BY sp.source, sp.split, lk.leaky_pairs
      |ORDER BY source, split""".stripMargin

  // ---------------------------------------------------------------- q128
  /** Distributed CLASSIFIER TRAINING (ops/Classifier): 6 full-batch
    * gradient-descent iterations of a language-filter linear model over
    * surface-statistics features — each iteration ONE map-side
    * aggregate of 4 exact integer gradient sums (the treeAggregate
    * shape; model state = 4 driver-side doubles broadcast back as
    * literals). The rational fast-sigmoid + integer-grid quantization
    * make the whole weight TRAJECTORY bit-replayable, so the oracle
    * RE-TRAINS the model in DuckDB (zero literals, the q95 BPE
    * discipline) through 6 chained materialized CTEs and must land on
    * the identical per-doc scores. On this vocabulary-flat synthetic
    * corpus the model honestly converges toward the base rate — the
    * certified artifact is the TRAINING LAW, plus the quantized
    * Brier-sum convergence verdict (brier_final_q < brier_init_q),
    * which both engines derive from their own trained weights.
    */
  def q128TrainClassifier(s: SparkSession, dir: String): DataFrame = {
    val feats = Classifier
      .features(Tables.documents(s, dir), "text", "lang")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    feats.count() // eager: 6 GD iterations + 2 Brier sums + scoring share this cache
    val w = Classifier.fit(feats, iters = 6)
    val brier0 = Classifier.brierQSum(feats, Array(0.0, 0.0, 0.0, 0.0))
    val brierT = Classifier.brierQSum(feats, w)
    val p = Classifier.probExpr(Classifier.zExpr(w))
    feats
      .select(
        col("doc_id"),
        round(p, 6).as("score"),
        (p >= lit(0.5)).as("pred_en"),
        (col("y") === lit(1.0)).as("is_en"),
        lit(brier0).as("brier_init_q"),
        lit(brierT).as("brier_final_q"),
        lit(brierT < brier0).as("brier_improved")
      )
      .orderBy(col("doc_id"))
  }

  /** q128 replay: DuckDB re-trains all 6 iterations. Generated by the
    * same Scala loop shape Classifier.fit runs — query and oracle share
    * the iteration definition by construction. CTEs are MATERIALIZED:
    * w{i-1} is referenced twice per iteration (gradient + update), so
    * inlining would branch 2^6 ways (the q95 lesson).
    */
  val q128Oracle: String = {
    val sigma = "(0.5 + z/(2.0*(1.0+abs(z))))"
    def gradSums = (0 to 3)
      .map(k =>
        s"CAST(SUM(CAST(floor(($sigma - y)*x$k*1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g$k"
      )
      .mkString(",\n|      ")
    def zFrom(wcte: String) =
      s"SELECT f.*, w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 AS z FROM feats f, $wcte w"
    val iters = (1 to 6)
      .map { i =>
        s"""g$i AS MATERIALIZED (
           |  SELECT $gradSums
           |  FROM (${zFrom(s"w${i - 1}")})
           |), w$i AS MATERIALIZED (
           |  SELECT ${(0 to 3)
                .map(k => s"w.w$k - 0.5*(CAST(g.g$k AS DOUBLE)/1000000.0/nn.n) AS w$k")
                .mkString(", ")}
           |  FROM w${i - 1} w, g$i g, nn
           |)""".stripMargin
      }
      .mkString(", ")
    def brier(wcte: String) =
      s"""SELECT CAST(SUM(CAST(floor(($sigma - y)*($sigma - y)*1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS b
         |  FROM (${zFrom(wcte)})""".stripMargin
    s"""WITH feats AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    CAST(1.0 AS DOUBLE) AS x0,
       |    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) /
       |      CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS x1,
       |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |           x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE) /
       |      CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS x2,
       |    least(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / CAST(200.0 AS DOUBLE),
       |          CAST(1.0 AS DOUBLE)) AS x3,
       |    CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y
       |  FROM documents
       |), nn AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n FROM feats
       |), w0 AS MATERIALIZED (
       |  SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
       |         CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3
       |), $iters, b0 AS (
       |  ${brier("w0")}
       |), bt AS (
       |  ${brier("w6")}
       |)
       |SELECT f.doc_id,
       |  round($sigma, 6) AS score,
       |  ($sigma >= 0.5) AS pred_en,
       |  (f.y = CAST(1.0 AS DOUBLE)) AS is_en,
       |  b0.b AS brier_init_q,
       |  bt.b AS brier_final_q,
       |  (bt.b < b0.b) AS brier_improved
       |FROM (${zFrom("w6")}) f, b0, bt
       |ORDER BY f.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q129
  /** Johnson–Lindenstrauss ±1 RANDOM PROJECTION (ops/RandomProjection,
    * Achlioptas 2003) 64 → 16 dims, certified by a distance-
    * preservation audit: for each consecutive-id pair in the bounded
    * slice, the projected/original squared-distance ratio and its
    * (1±ε) verdict, plus the corpus-level within-count — every number
    * DERIVED independently by both engines (the oracle regenerates the
    * sign matrix from the portable-hash parity formula, zero literals).
    * The projection itself is pure map-side ordered folds against a
    * broadcast constant matrix; at corpus scale it cuts ANN shuffle
    * and cache bytes 4× before any bucketing.
    */
  def q129JlProjection(s: SparkSession, dir: String): DataFrame = {
    val pr = RandomProjection.withProjection(
      Tables.embeddings(s, dir).filter(col("vec_id") < 100),
      "embedding", outDim = 16, inDim = 64)
    val a = pr
      .filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("id_a"), col("embedding").as("va"), col("proj").as("pa"))
    val b = pr
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("proj").as("pb"))
    val pairs = a
      .join(b, col("id_b") === col("id_a") + 1)
      .withColumn("d2_orig", RandomProjection.sqDistExpr(col("va"), col("vb")))
      .withColumn("d2_proj", RandomProjection.sqDistExpr(col("pa"), col("pb")))
      .filter(col("d2_orig") > 0.0)
      .withColumn("ratio", col("d2_proj") / col("d2_orig"))
      .withColumn("within", col("ratio") >= 0.25 && col("ratio") <= 2.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // eager: summary + row output share this cache
    val summary = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(col("within").cast("long")).as("n_within")
    )
    pairs
      .select(
        col("id_a"),
        col("id_b"),
        round(col("d2_orig"), 6).as("d2_orig"),
        round(col("d2_proj"), 6).as("d2_proj"),
        round(col("ratio"), 6).as("ratio"),
        col("within")
      )
      .crossJoin(broadcast(summary))
      .orderBy(col("id_a"))
  }

  val q129Oracle: String =
    """WITH e AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100
      |), R AS (
      |  SELECT j, list_transform(range(0, 64), k ->
      |    CASE WHEN ('0x' || substr(md5(CAST(j*64 + k AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
      |         THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS r
      |  FROM range(0, 16) t(j)
      |), p AS (
      |  SELECT e.vec_id, e.embedding,
      |    list(
      |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |        list_transform(range(0, 64), k -> CAST(e.embedding[k+1] AS DOUBLE) * R.r[k+1])),
      |        (a, b) -> a + b) / sqrt(CAST(16.0 AS DOUBLE))
      |      ORDER BY R.j) AS proj
      |  FROM e, R
      |  GROUP BY e.vec_id, e.embedding
      |), pr AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(0, 64), k ->
      |        (CAST(a.embedding[k+1] AS DOUBLE) - CAST(b.embedding[k+1] AS DOUBLE)) *
      |        (CAST(a.embedding[k+1] AS DOUBLE) - CAST(b.embedding[k+1] AS DOUBLE)))),
      |      (x, y) -> x + y) AS d2_orig,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(0, 16), j ->
      |        (a.proj[j+1] - b.proj[j+1]) * (a.proj[j+1] - b.proj[j+1]))),
      |      (x, y) -> x + y) AS d2_proj
      |  FROM p a JOIN p b ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0
      |), r2 AS (
      |  SELECT *, d2_proj / d2_orig AS ratio FROM pr WHERE d2_orig > 0.0
      |), s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(SUM(CASE WHEN ratio >= 0.25 AND ratio <= 2.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_within
      |  FROM r2
      |)
      |SELECT id_a, id_b,
      |  round(d2_orig, 6) AS d2_orig,
      |  round(d2_proj, 6) AS d2_proj,
      |  round(ratio, 6) AS ratio,
      |  (ratio >= 0.25 AND ratio <= 2.5) AS within,
      |  s.n_pairs, s.n_within
      |FROM r2, s
      |ORDER BY id_a""".stripMargin

  // ---------------------------------------------------------------- q130
  /** JL-ACCELERATED nearest-neighbor RANKING AGREEMENT: top-10 by
    * squared L2 in the 16-dim projected space vs the exact 64-dim
    * ranking, recall@10 per query + corpus mean — the measured quality
    * gate for putting q129's projection in front of the ANN stack
    * (rank in 16 dims = 4× fewer distance flops and shuffle bytes;
    * this query certifies what that costs in recall). Exact all-pairs
    * on a bounded slice is the deliberate oracled audit baseline (the
    * q91 discipline); both rankings break ties by id over bit-exact
    * fold distances, so the two engines derive identical neighbor
    * sets and the recall numbers are exact rationals.
    *
    * MEASURED verdict on this corpus: mean recall@10 ≈ 0.18 — the
    * audit's honest finding, not a defect. The synthetic embeddings
    * are near-isotropic, so pairwise distances CONCENTRATE (all
    * neighbors nearly equidistant); JL keeps every distance within
    * (1±ε) (q129 passes) yet ε exceeds the tiny gaps that order the
    * top-10, and the ranking scrambles. That is exactly the
    * production lesson this gate exists to teach: measure ranking
    * agreement per corpus before deploying a projection in front of
    * top-k — distance preservation alone (q129) is NOT sufficient
    * when the distance spectrum is flat; on clustered real-world
    * embeddings (wide spectrum) the same projection scores high.
    */
  def q130JlAnnRecall(s: SparkSession, dir: String): DataFrame = {
    val pr = RandomProjection
      .withProjection(
        Tables.embeddings(s, dir).filter(col("vec_id") < 200),
        "embedding", outDim = 16, inDim = 64)
      .select(col("vec_id"), col("embedding"), col("proj"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pr.count() // eager: query side + corpus side share this cache
    val q = pr
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("proj").as("qp"))
    val pairs = broadcast(q)
      .crossJoin(pr.select(col("vec_id").as("id"), col("embedding").as("cv"), col("proj").as("cp")))
      .filter(col("id") =!= col("qid"))
      .withColumn("d2o", RandomProjection.sqDistExpr(col("qv"), col("cv")))
      .withColumn("d2p", RandomProjection.sqDistExpr(col("qp"), col("cp")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // eager: two rankings share this cache
    val we = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2o").asc, col("id").asc)
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2p").asc, col("id").asc)
    val exact = pairs.withColumn("rn", row_number().over(we)).filter(col("rn") <= 10).select("qid", "id")
    val approx = pairs.withColumn("rn", row_number().over(wp)).filter(col("rn") <= 10).select("qid", "id")
    val hits = exact.join(approx, Seq("qid", "id")).groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    val perQ = q
      .select(col("qid"))
      .join(hits, Seq("qid"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    perQ.count() // eager: summary + row output share this cache
    val summary = perQ.agg(
      (sum(col("n_hits")).cast("double") / lit(100.0)).as("mean_recall")
    )
    perQ
      .select(
        col("qid").as("query_id"),
        col("n_hits"),
        round(col("n_hits").cast("double") / lit(10.0), 6).as("recall")
      )
      .crossJoin(broadcast(summary))
      .withColumn("mean_recall", round(col("mean_recall"), 6))
      .orderBy(col("query_id"))
  }

  val q130Oracle: String =
    """WITH e AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
      |), R AS (
      |  SELECT j, list_transform(range(0, 64), k ->
      |    CASE WHEN ('0x' || substr(md5(CAST(j*64 + k AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
      |         THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS r
      |  FROM range(0, 16) t(j)
      |), p AS (
      |  SELECT e.vec_id, e.embedding,
      |    list(
      |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |        list_transform(range(0, 64), k -> CAST(e.embedding[k+1] AS DOUBLE) * R.r[k+1])),
      |        (a, b) -> a + b) / sqrt(CAST(16.0 AS DOUBLE))
      |      ORDER BY R.j) AS proj
      |  FROM e, R
      |  GROUP BY e.vec_id, e.embedding
      |), q AS (
      |  SELECT vec_id AS qid, embedding AS qv, proj AS qp FROM p WHERE vec_id < 10
      |), pr AS (
      |  SELECT q.qid, c.vec_id AS id,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(0, 64), k ->
      |        (CAST(q.qv[k+1] AS DOUBLE) - CAST(c.embedding[k+1] AS DOUBLE)) *
      |        (CAST(q.qv[k+1] AS DOUBLE) - CAST(c.embedding[k+1] AS DOUBLE)))),
      |      (x, y) -> x + y) AS d2o,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(0, 16), j ->
      |        (q.qp[j+1] - c.proj[j+1]) * (q.qp[j+1] - c.proj[j+1]))),
      |      (x, y) -> x + y) AS d2p
      |  FROM q, p c WHERE c.vec_id <> q.qid
      |), ex AS (
      |  SELECT qid, id FROM (
      |    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY d2o, id) AS rn FROM pr
      |  ) WHERE rn <= 10
      |), ap AS (
      |  SELECT qid, id FROM (
      |    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY d2p, id) AS rn FROM pr
      |  ) WHERE rn <= 10
      |), h AS (
      |  SELECT qid, CAST(count(*) AS BIGINT) AS n_hits
      |  FROM ex JOIN ap USING (qid, id) GROUP BY qid
      |), pq AS (
      |  SELECT q.qid, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits
      |  FROM q LEFT JOIN h USING (qid)
      |), s AS (
      |  SELECT CAST(SUM(n_hits) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS mean_recall FROM pq
      |)
      |SELECT pq.qid AS query_id, pq.n_hits,
      |  round(CAST(pq.n_hits AS DOUBLE) / CAST(10.0 AS DOUBLE), 6) AS recall,
      |  round(s.mean_recall, 6) AS mean_recall
      |FROM pq, s
      |ORDER BY query_id""".stripMargin

  // ---------------------------------------------------------------- q131
  /** COUNT-MIN sketch (expr.CountMinSketch, Cormode–Muthukrishnan
    * 2005): corpus token frequencies through a 4×256 counter matrix —
    * constant aggregation state per group however many rows stream
    * through, and, unlike Misra–Gries (q70), EXACTLY mergeable
    * (elementwise sum): the matrix is a pure function of the token
    * multiset, bit-reproducible under any partitioning. The md5-derived
    * row hashes make the whole matrix relationally replayable, so the
    * oracle rebuilds every counter with one GROUP BY and re-derives
    * every estimate — est values themselves are checked, plus the
    * never-undercount law per token (the sketch's deterministic
    * guarantee). Width 16 against the 31-term vocabulary: pigeonhole
    * forces collisions in EVERY row, so overcounts are visibly
    * non-zero while min-over-rows still recovers several tokens
    * exactly via their luckiest row — both sketch regimes exercised
    * and oracle-checked. The probe
    * pass is map-side against the broadcast matrix (d·w longs of
    * bounded model state — the IVF-centroid class).
    */
  def q131CountMin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftShim
    val depth = 4
    val width = 16
    val toks = Tables
      .documents(s, dir)
      .select(explode(TextStats.tokens(col("text"))).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    toks.count() // eager: sketch build + exact counts share this cache
    val matrix: Seq[Seq[Long]] = toks
      .agg(
        GraftShim
          .column(
            graft.expr
              .CountMinSketch(
                GraftShim.expression(col("tok")),
                GraftShim.expression(lit(depth)),
                GraftShim.expression(lit(width)))
              .toAggregateExpression()
          )
          .as("cm")
      )
      .head()
      .getSeq[scala.collection.Seq[Long]](0)
      .map(_.toSeq)
    val mLit = typedlit(matrix)
    def bucket(i: Int): org.apache.spark.sql.Column =
      conv(substring(md5(concat(lit(s"$i:"), col("tok"))), 1, 15), 16, 10).cast("long") % width
    val est = (0 until depth)
      .map(i => element_at(element_at(mLit, i + 1), (bucket(i) + 1).cast("int")))
      .reduce((a, b) => least(a, b))
    toks
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("exact_count"))
      .withColumn("cm_est", est)
      .withColumn("overcount", col("cm_est") - col("exact_count"))
      .withColumn("never_under", col("cm_est") >= col("exact_count"))
      .orderBy(col("tok"))
  }

  // ---------------------------------------------------------------- q140
  /** INCREMENTAL connected components (Components.incrementalUpdate):
    * yesterday's dedup clusters absorb today's near-dup edges by
    * re-running CC over the AFFECTED SUBGRAPH only (touched components
    * collapse to star edges; untouched labels pass through verbatim) —
    * the maintenance shape a streaming near-dup index needs at corpus
    * scale, where full recompute per batch is the thing you cannot
    * afford. The certified law: the merged labelling EQUALS the full
    * recompute over all edges — the oracle replays the full recursive-
    * CTE CC over the whole slice (old ∪ new), so any seam between the
    * incremental pieces turns the row red. Old batch = doc_id < 200,
    * arrivals = edges touching [200, 300); per-component output carries
    * the old/new member split (components spanning both = the genuinely
    * incremental merges).
    */
  def q140IncrementalCc(s: SparkSession, dir: String): DataFrame = {
    val slice = Tables.documents(s, dir).filter(col("doc_id") < 300)
    val pairs = TextDedup
      .nearDupsExact(slice, "doc_id", "text", threshold = 0.9)
      .select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // eager: old/new edge splits share this cache
    val oldEdges = pairs.filter(col("id_a") < 200 && col("id_b") < 200)
    val newEdges = pairs.filter(col("id_a") >= 200 || col("id_b") >= 200)
    val oldLabels = Components.connectedComponents(oldEdges)
    Components
      .incrementalUpdate(oldLabels, newEdges)
      .groupBy(col("component"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(when(col("id") < 200, 1L).otherwise(0L)).as("n_old"),
        sum(when(col("id") >= 200, 1L).otherwise(0L)).as("n_new")
      )
      .orderBy(col("component"))
  }

  val q140Oracle: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS tk
      |  FROM documents WHERE doc_id < 300
      |), edges AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM t a JOIN t b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) /
      |        CAST(len(a.tk) + len(b.tk) - len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) >= 0.9
      |), sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM edges
      |  UNION ALL
      |  SELECT id_b, id_a FROM edges
      |), reach(id, comp) AS (
      |  SELECT DISTINCT src, src FROM sym
      |  UNION
      |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.id
      |), comps AS (
      |  SELECT id, MIN(comp) AS component FROM reach GROUP BY id
      |)
      |SELECT component, CAST(count(*) AS BIGINT) AS n_members,
      |  CAST(SUM(CASE WHEN id < 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
      |  CAST(SUM(CASE WHEN id >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
      |FROM comps
      |GROUP BY component
      |ORDER BY component""".stripMargin

  // ---------------------------------------------------------------- q139
  /** NATIVE whole-operator top-k (plans.AnnTopKJoin) — the §2.10
    * item-(c) extension running in the registry: custom LogicalPlan +
    * optimizer Rule + SparkStrategy + SparkPlan via
    * SparkSessionExtensions. Exact cosine top-10 for 10 query vectors,
    * but the n·q scored pairs never reach an exchange: the exec holds
    * per-query top-k buffers inside one corpus pass and ships only
    * q·k rows per partition to the final rank (shuffle bytes n·q →
    * q·k·partitions — the TakeOrderedAndProject trick generalized per
    * query). The oracle replays the declarative definition (cosine +
    * rounded rank window), so the row-for-row equality of the two
    * FORMS is itself the certified law (AnnTopKJoinSpec pins it
    * in-engine as well, plus the no-exchange plan shape and the
    * degenerate-fold rule).
    */
  def q139NativeTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val qs = graft.plans.AnnTopKJoin.queriesFrom(
      e.filter(col("vec_id") >= 10 && col("vec_id") < 20), "vec_id", "embedding")
    graft.plans.AnnTopKJoin
      .topK(e, "vec_id", "embedding", qs, k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  val q139Oracle: String =
    """SELECT query_id, rank, neighbor_id, sim FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS sim,
      |    ROW_NUMBER() OVER (
      |      PARTITION BY q.vec_id
      |      ORDER BY round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) DESC,
      |               c.vec_id) AS rank
      |  FROM embeddings c, embeddings q
      |  WHERE q.vec_id >= 10 AND q.vec_id < 20 AND c.vec_id <> q.vec_id
      |) WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q136
  /** Per-source GOPHER ADOPTION REPORT — the rollout view a curation
    * team reads before enabling q126's rule set as a hard filter: per
    * source, the keep rate and EACH rule's individual failure count
    * (which rule would do the cutting, and where). One map-side rule
    * pass (q126's algebra) + one (source) aggregate of boolean sums —
    * integer-exact, trivially replayable.
    */
  def q136GopherReport(s: SparkSession, dir: String): DataFrame = {
    def fails(c: String): org.apache.spark.sql.Column = sum((!col(c)).cast("long"))
    TextStats
      .withGopherRules(Tables.documents(s, dir), "text")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_keep"),
        fails("word_count_ok").as("f_word_count"),
        fails("mean_len_ok").as("f_mean_len"),
        fails("stop_ok").as("f_stop"),
        fails("rep2_ok").as("f_rep2"),
        fails("rep3_ok").as("f_rep3"),
        fails("rep4_ok").as("f_rep4"),
        fails("dup5_ok").as("f_dup5")
      )
      .withColumn(
        "keep_rate",
        round(col("n_keep").cast("double") / col("n_docs").cast("double"), 6)
      )
      .orderBy(col("source"))
  }

  val q136Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |), b AS (
      |  SELECT doc_id, source, toks,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
      |    list_transform(range(0, greatest(len(toks)-2, 0) + 1), i -> array_to_string(toks[i+1:i+2], ' ')) AS g2,
      |    list_transform(range(0, greatest(len(toks)-3, 0) + 1), i -> array_to_string(toks[i+1:i+3], ' ')) AS g3,
      |    list_transform(range(0, greatest(len(toks)-4, 0) + 1), i -> array_to_string(toks[i+1:i+4], ' ')) AS g4,
      |    list_transform(range(0, greatest(len(toks)-5, 0) + 1), i -> array_to_string(toks[i+1:i+5], ' ')) AS g5
      |  FROM t
      |), m AS (
      |  SELECT doc_id, source, n_words, total_chars,
      |    CAST(total_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS mwl,
      |    CAST(len(list_intersect(list_distinct(toks), ['the','a','of','and','is','to','in'])) AS BIGINT) AS stop_hits,
      |    greatest(0, list_max(list_transform(list_distinct(g2), u -> len(list_filter(g2, x -> x = u)) * (length(u) - 1)))) AS m2,
      |    greatest(0, list_max(list_transform(list_distinct(g3), u -> len(list_filter(g3, x -> x = u)) * (length(u) - 2)))) AS m3,
      |    greatest(0, list_max(list_transform(list_distinct(g4), u -> len(list_filter(g4, x -> x = u)) * (length(u) - 3)))) AS m4,
      |    list_sum(list_transform(list_distinct(g5), u -> (len(list_filter(g5, x -> x = u)) - 1) * (length(u) - 4))) AS d5
      |  FROM b
      |), v AS (
      |  SELECT source,
      |    (n_words >= 50 AND n_words <= 100000) AS word_count_ok,
      |    (mwl >= 3.0 AND mwl <= 10.0) AS mean_len_ok,
      |    (stop_hits >= 2) AS stop_ok,
      |    (CAST(m2 AS DOUBLE) / CAST(total_chars AS DOUBLE) <= 0.20) AS rep2_ok,
      |    (CAST(m3 AS DOUBLE) / CAST(total_chars AS DOUBLE) <= 0.18) AS rep3_ok,
      |    (CAST(m4 AS DOUBLE) / CAST(total_chars AS DOUBLE) <= 0.16) AS rep4_ok,
      |    (CAST(d5 AS DOUBLE) / CAST(total_chars AS DOUBLE) <= 0.15) AS dup5_ok
      |  FROM m
      |)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN word_count_ok AND mean_len_ok AND stop_ok AND rep2_ok
      |                 AND rep3_ok AND rep4_ok AND dup5_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |  CAST(SUM(CASE WHEN NOT word_count_ok THEN 1 ELSE 0 END) AS BIGINT) AS f_word_count,
      |  CAST(SUM(CASE WHEN NOT mean_len_ok THEN 1 ELSE 0 END) AS BIGINT) AS f_mean_len,
      |  CAST(SUM(CASE WHEN NOT stop_ok THEN 1 ELSE 0 END) AS BIGINT) AS f_stop,
      |  CAST(SUM(CASE WHEN NOT rep2_ok THEN 1 ELSE 0 END) AS BIGINT) AS f_rep2,
      |  CAST(SUM(CASE WHEN NOT rep3_ok THEN 1 ELSE 0 END) AS BIGINT) AS f_rep3,
      |  CAST(SUM(CASE WHEN NOT rep4_ok THEN 1 ELSE 0 END) AS BIGINT) AS f_rep4,
      |  CAST(SUM(CASE WHEN NOT dup5_ok THEN 1 ELSE 0 END) AS BIGINT) AS f_dup5,
      |  round(CAST(SUM(CASE WHEN word_count_ok AND mean_len_ok AND stop_ok AND rep2_ok
      |                 AND rep3_ok AND rep4_ok AND dup5_ok THEN 1 ELSE 0 END) AS DOUBLE)
      |        / CAST(count(*) AS DOUBLE), 6) AS keep_rate
      |FROM v
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q137
  /** Per-source VOCABULARY statistics — the corpus-linguistics panel
    * (type/token ratio, hapax fraction) that flags template-generated
    * or boilerplate-heavy sources before training: n_tokens, n_types,
    * TTR, hapax count (types occurring once IN THAT SOURCE) and hapax
    * share of types. Two keyed aggregates over one token explode; all
    * ratios exact-integer numerators with one double division.
    */
  def q137VocabStats(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables
      .documents(s, dir)
      .select(col("source"), explode(TextStats.tokens(col("text"))).as("w"))
    val perType = toks.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    perType
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum((col("c") === 1).cast("long")).as("n_hapax")
      )
      .select(
        col("source"),
        col("n_tokens"),
        col("n_types"),
        col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"), 6).as("ttr"),
        round(col("n_hapax").cast("double") / col("n_types").cast("double"), 6).as("hapax_frac")
      )
      .orderBy(col("source"))
  }

  val q137Oracle: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents
      |), pt AS (
      |  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY source, w
      |)
      |SELECT source,
      |  CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(count(*) AS BIGINT) AS n_types,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  round(CAST(count(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS ttr,
      |  round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS hapax_frac
      |FROM pt
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q138
  /** Language-ID CONFUSION MATRIX — the evaluation harness for q22's
    * n-gram-marker heuristic against the metadata label: (lang,
    * lang_pred) counts plus per-true-lang recall — how a pipeline
    * decides whether a cheap classifier is good enough to gate on
    * (here it measurably is NOT for this vocabulary-flat corpus: the
    * honest baseline a trained filter like q128 would be compared
    * against). One map-side classification pass + one (lang, pred)
    * count aggregate; recall joins back on the broadcast per-lang
    * totals.
    */
  def q138LangConfusion(s: SparkSession, dir: String): DataFrame = {
    val pred = TextStats
      .withLangId(Tables.documents(s, dir), "text")
      .select(col("lang"), col("lang_pred"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pred.count() // eager: cell counts + per-lang totals share this cache
    val cells = pred.groupBy(col("lang"), col("lang_pred")).agg(count(lit(1)).as("n"))
    val totals = pred.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    cells
      .join(broadcast(totals), Seq("lang"))
      .select(
        col("lang"),
        col("lang_pred"),
        col("n"),
        col("n_lang"),
        round(col("n").cast("double") / col("n_lang").cast("double"), 6).as("cell_rate"),
        (col("lang") === col("lang_pred")).as("is_correct")
      )
      .orderBy(col("lang"), col("lang_pred"))
  }

  val q138Oracle: String =
    """WITH t AS (
      |  SELECT lang, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), p AS (
      |  SELECT lang,
      |    len(list_filter(toks, x -> list_contains(['the','a','of','and','is'], x))) AS cnt_en,
      |    len(list_filter(toks, x -> list_contains(['el','la','de','que','y'], x))) AS cnt_es,
      |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))) AS cnt_de
      |  FROM t
      |), pr AS (
      |  SELECT lang,
      |    CASE WHEN cnt_en >= cnt_es AND cnt_en >= cnt_de AND cnt_en > 0 THEN 'en'
      |         WHEN cnt_es >= cnt_de AND cnt_es > 0 THEN 'es'
      |         WHEN cnt_de > 0 THEN 'de'
      |         ELSE 'unknown' END AS lang_pred
      |  FROM p
      |), cells AS (
      |  SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n FROM pr GROUP BY lang, lang_pred
      |), tot AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM pr GROUP BY lang
      |)
      |SELECT c.lang, c.lang_pred, c.n, t.n_lang,
      |  round(CAST(c.n AS DOUBLE) / CAST(t.n_lang AS DOUBLE), 6) AS cell_rate,
      |  (c.lang = c.lang_pred) AS is_correct
      |FROM cells c JOIN tot t USING (lang)
      |ORDER BY lang, lang_pred""".stripMargin

  // ---------------------------------------------------------------- q135
  /** DELETION-PROPAGATION PLAN — the right-to-be-forgotten governance
    * pass over a sharded export: given a delete list (doc_id % 97 = 0
    * here — deterministic, engine-portable), emit per shard how many
    * docs leave, the digest DELTA the deletions carry, and the expected
    * post-deletion membership digests — then CERTIFY the algebra by
    * recomputing digests on the survivors and deriving the law columns
    * ((sum_before − Δ) mod P = sum_after; xor_before ⊕ xor_Δ =
    * xor_after; fully-deleted shards collapse to the empty digest 0 on
    * both sides of each law). This is why q116 chose associative
    * digests: deletions UNDO by subtraction/xor without rescanning the
    * surviving corpus — at 100 TB the plan touches 16 bytes/doc for the
    * DELETE LIST only, never the text; the recompute here is the
    * bounded audit that proves the delta algebra, not the production
    * path.
    */
  def q135DeletionPlan(s: SparkSession, dir: String): DataFrame = {
    val P = ExportPlan.DigestModulus
    val docs = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        size(TextStats.tokens(col("text"))).cast("long").as("wt"),
        TextStats.contentDigest60(col("text")).as("digest")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count() // eager: assignment + digest sides share this cache
    val assigned = ExportPlan
      .assignShards(docs, "doc_id", col("wt"), budget = 2048L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count() // eager: before/delta/after digest passes share this cache
    val digests = docs.select(col("doc_id").as("id"), col("digest"))
    val before = ExportPlan
      .shardDigests(assigned, digests)
      .select(
        col("shard_id"),
        col("n_docs"),
        col("digest_sum").as("sum_before"),
        col("digest_xor").as("xor_before")
      )
    val delta = assigned
      .filter(col("id") % 97 === 0)
      .join(digests, Seq("id"))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_deleted"),
        (sum(col("digest").cast("decimal(38,0)")) % lit(P)).cast("long").as("sum_delta"),
        expr("bit_xor(digest)").as("xor_delta")
      )
    val after = ExportPlan
      .shardDigests(assigned.filter(col("id") % 97 =!= 0), digests)
      .select(
        col("shard_id"),
        col("n_docs").as("n_after"),
        col("digest_sum").as("sum_after"),
        col("digest_xor").as("xor_after")
      )
    before
      .join(delta, Seq("shard_id"), "left")
      .join(after, Seq("shard_id"), "left")
      .select(
        col("shard_id"),
        col("n_docs"),
        coalesce(col("n_deleted"), lit(0L)).as("n_deleted"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        col("sum_before"),
        coalesce(col("sum_delta"), lit(0L)).as("sum_delta"),
        coalesce(col("sum_after"), lit(0L)).as("sum_after"),
        col("xor_before"),
        coalesce(col("xor_delta"), lit(0L)).as("xor_delta"),
        coalesce(col("xor_after"), lit(0L)).as("xor_after")
      )
      .withColumn(
        "sum_law_holds",
        pmod(col("sum_before") - col("sum_delta"), lit(P)) === col("sum_after")
      )
      .withColumn(
        "xor_law_holds",
        col("xor_before").bitwiseXOR(col("xor_delta")) === col("xor_after")
      )
      .orderBy(col("shard_id"))
  }

  val q135Oracle: String =
    """WITH d AS MATERIALIZED (
      |  SELECT doc_id, (doc_id * 2654435761) % 1000003 AS h,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS wt,
      |    ('0x' || substr(md5(regexp_replace(trim(text), '\s+', ' ', 'g')), 1, 15))::BIGINT AS digest
      |  FROM documents
      |), c AS (
      |  SELECT *, SUM(wt) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) - wt AS cum_before
      |  FROM d
      |), s AS MATERIALIZED (
      |  SELECT *, CAST(cum_before // 2048 AS BIGINT) AS shard_id FROM c
      |), before AS (
      |  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(CAST(digest AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS sum_before,
      |    bit_xor(digest) AS xor_before
      |  FROM s GROUP BY shard_id
      |), del AS (
      |  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_deleted,
      |    CAST(SUM(CAST(digest AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS sum_delta,
      |    bit_xor(digest) AS xor_delta
      |  FROM s WHERE doc_id % 97 = 0 GROUP BY shard_id
      |), aft AS (
      |  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_after,
      |    CAST(SUM(CAST(digest AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS sum_after,
      |    bit_xor(digest) AS xor_after
      |  FROM s WHERE doc_id % 97 <> 0 GROUP BY shard_id
      |), j AS (
      |  SELECT b.shard_id, b.n_docs,
      |    CAST(COALESCE(del.n_deleted, 0) AS BIGINT) AS n_deleted,
      |    CAST(COALESCE(aft.n_after, 0) AS BIGINT) AS n_after,
      |    b.sum_before,
      |    CAST(COALESCE(del.sum_delta, 0) AS BIGINT) AS sum_delta,
      |    CAST(COALESCE(aft.sum_after, 0) AS BIGINT) AS sum_after,
      |    b.xor_before,
      |    CAST(COALESCE(del.xor_delta, 0) AS BIGINT) AS xor_delta,
      |    CAST(COALESCE(aft.xor_after, 0) AS BIGINT) AS xor_after
      |  FROM before b
      |  LEFT JOIN del USING (shard_id)
      |  LEFT JOIN aft USING (shard_id)
      |)
      |SELECT *,
      |  (CAST(((sum_before - sum_delta) % 2305843009213693951
      |         + 2305843009213693951) % 2305843009213693951 AS BIGINT) = sum_after) AS sum_law_holds,
      |  (xor(xor_before, xor_delta) = xor_after) AS xor_law_holds
      |FROM j
      |ORDER BY shard_id""".stripMargin

  // ---------------------------------------------------------------- q134
  /** Per-user value TREND — distributed ordinary least squares via
    * EXACT SUFFICIENT STATISTICS: one map-side aggregate of
    * (n, Σx, Σy, Σxy, Σx², Σy²) per key, closed-form slope/intercept/r²
    * from the sums. The complement of q128's iterative GD: regression
    * whose whole fit is ONE scan-speed pass with a 6-number state per
    * key — the canonical one-pass model-fitting shape at 100 TB.
    * Exactness recipe: x = seconds from corpus start (exact ints), y
    * quantized to the 1e-6 grid (floor(v·1e6 + 0.5), IEEE-exact), all
    * sums DECIMAL(38)/HUGEINT — order- and partitioning-independent —
    * and the closed forms convert the exact integers to doubles once
    * (correctly rounded in any engine) before identical arithmetic
    * trees. Degenerate keys (single timestamp or constant y) are
    * filtered by exact-integer predicates, never by a float epsilon.
    */
  def q134EventTrends(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .select(col("user_id"), expr("ts_ns div 1000000000").as("sec"), col("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ev.count() // eager: corpus-start min + per-user stats share this cache
    val mn = ev.agg(min(col("sec")).as("min_sec"))
    val d = ev
      .crossJoin(broadcast(mn))
      .withColumn("x", (col("sec") - col("min_sec")).cast("decimal(38,0)"))
      .withColumn(
        "yq",
        floor(col("value") * lit(1000000.0) + lit(0.5)).cast("decimal(38,0)")
      )
    val n38 = col("n").cast("decimal(38,0)")
    d.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("yq")).as("sy"),
        sum(col("x") * col("yq")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("yq") * col("yq")).as("syy")
      )
      .withColumn("num", n38 * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", n38 * col("sxx") - col("sx") * col("sx"))
      .withColumn("syn", n38 * col("syy") - col("sy") * col("sy"))
      .filter(col("den") > 0 && col("syn") > 0)
      .withColumn("numd", col("num").cast("double"))
      .withColumn("dend", col("den").cast("double"))
      .withColumn("synd", col("syn").cast("double"))
      .withColumn("slope_d", col("numd") / col("dend") / lit(1000000.0))
      .select(
        col("user_id"),
        col("n"),
        // + 0.0 normalizes IEEE negative zero: DuckDB's round keeps
        // -0.0, Spark's BigDecimal path drops the sign — repr("-0.0")
        // vs repr("0.0") would hash-fail a value-equal row
        (round(col("slope_d"), 6) + lit(0.0)).as("slope"),
        (round(
          (col("sy").cast("double") / lit(1000000.0) - col("slope_d") * col("sx").cast("double")) /
            col("n").cast("double"),
          6
        ) + lit(0.0)).as("intercept"),
        (round((col("numd") * col("numd")) / (col("dend") * col("synd")), 6) + lit(0.0)).as("r2")
      )
      .orderBy(col("user_id"))
  }

  val q134Oracle: String =
    """WITH ev AS MATERIALIZED (
      |  SELECT user_id, epoch_ns(ts) // 1000000000 AS sec, "value" FROM events
      |), mn AS (
      |  SELECT min(sec) AS min_sec FROM ev
      |), d AS (
      |  SELECT user_id, sec - mn.min_sec AS x,
      |    CAST(floor("value"*1000000.0 + 0.5) AS BIGINT) AS yq
      |  FROM ev, mn
      |), st AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |    SUM(x) AS sx, SUM(yq) AS sy, SUM(x*yq) AS sxy,
      |    SUM(x*x) AS sxx, SUM(yq*yq) AS syy
      |  FROM d GROUP BY user_id
      |), f AS (
      |  SELECT user_id, n, sx, sy,
      |    n*sxy - sx*sy AS num, n*sxx - sx*sx AS den, n*syy - sy*sy AS syn
      |  FROM st
      |), g AS (
      |  SELECT user_id, n, sx, sy,
      |    CAST(num AS DOUBLE) AS numd, CAST(den AS DOUBLE) AS dend, CAST(syn AS DOUBLE) AS synd,
      |    CAST(num AS DOUBLE)/CAST(den AS DOUBLE)/1000000.0 AS slope_d
      |  FROM f WHERE den > 0 AND syn > 0
      |)
      |SELECT user_id, n,
      |  round(slope_d, 6) + 0.0 AS slope,
      |  round((CAST(sy AS DOUBLE)/1000000.0 - slope_d*CAST(sx AS DOUBLE))/CAST(n AS DOUBLE), 6) + 0.0 AS intercept,
      |  round((numd*numd)/(dend*synd), 6) + 0.0 AS r2
      |FROM g
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q133
  /** PMI COLLOCATIONS — the phrase-mining preprocessing step (Mikolov
    * et al.'s word2phrase shape): top-20 adjacent bigrams by pointwise
    * mutual information with a count floor of 5. The RANKING key is
    * `lift` = (c(ab)·M²)/(N·c(a)·c(b)) — an exact-integer-products
    * ratio with one double division, bit-identical cross-engine, so
    * the top-k boundary can never flip on a transcendental's last ulp;
    * pmi = ln(lift) rides along rounded (the q66 tfidf ln precedent).
    * Spark shape: one corpus scan for unigrams, one for positional
    * pairs (map-side index explode), two keyed counts, two broadcast-
    * scale scalar totals, TakeOrderedAndProject for the top-k — no
    * global sort materialization.
    */
  def q133PmiCollocations(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = TextStats.tokens(col("text"))
    val uni = docs
      .select(explode(toks).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    uni.count() // eager: unigram counts + corpus total share this cache
    val uc = uni.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val m = uni.agg(count(lit(1)).as("m"))
    val n1 = size(toks) - 1
    val pairs = docs
      .filter(size(toks) >= 2)
      .select(
        explode(
          transform(
            arrays_zip(slice(toks, lit(1), n1).as("a"), slice(toks, lit(2), n1).as("b")),
            s => struct(s.getField("a").as("wa"), s.getField("b").as("wb"))
          )
        ).as("p")
      )
      .select(col("p.wa").as("wa"), col("p.wb").as("wb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // eager: pair counts + pair total share this cache
    val pc = pairs.groupBy(col("wa"), col("wb")).agg(count(lit(1)).as("c_ab"))
    val n = pairs.agg(count(lit(1)).as("n"))
    val lift = (col("c_ab") * col("m") * col("m")).cast("double") /
      (col("n") * col("c_a") * col("c_b")).cast("double")
    pc.filter(col("c_ab") >= 5)
      .join(broadcast(uc.select(col("w").as("wa"), col("c").as("c_a"))), Seq("wa"))
      .join(broadcast(uc.select(col("w").as("wb"), col("c").as("c_b"))), Seq("wb"))
      .crossJoin(broadcast(m))
      .crossJoin(broadcast(n))
      .withColumn("lift", lift)
      .select(
        concat(col("wa"), lit(" "), col("wb")).as("bigram"),
        col("c_ab"),
        col("c_a"),
        col("c_b"),
        round(col("lift"), 6).as("lift"),
        round(log(col("lift")), 6).as("pmi")
      )
      .orderBy(col("lift").desc, col("bigram").asc)
      .limit(20)
  }

  val q133Oracle: String =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), uni AS MATERIALIZED (
      |  SELECT unnest(toks) AS w FROM t
      |), uc AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w
      |), m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m FROM uni
      |), pr AS MATERIALIZED (
      |  SELECT unnest(list_transform(range(0, greatest(len(toks)-1, 0)),
      |                i -> {'wa': toks[i+1], 'wb': toks[i+2]}), recursive := true)
      |  FROM t
      |  WHERE len(toks) >= 2
      |), pc AS (
      |  SELECT wa, wb, CAST(count(*) AS BIGINT) AS c_ab
      |  FROM pr GROUP BY wa, wb HAVING count(*) >= 5
      |), n AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n FROM pr
      |), scored AS (
      |  SELECT pc.wa || ' ' || pc.wb AS bigram, pc.c_ab, a.c AS c_a, b.c AS c_b,
      |    CAST(pc.c_ab * m.m * m.m AS DOUBLE) / CAST(n.n * a.c * b.c AS DOUBLE) AS lift
      |  FROM pc
      |  JOIN uc a ON a.w = pc.wa
      |  JOIN uc b ON b.w = pc.wb, m, n
      |)
      |SELECT bigram, c_ab, c_a, c_b,
      |  round(lift, 6) AS lift,
      |  round(ln(lift), 6) AS pmi
      |FROM scored
      |ORDER BY lift DESC, bigram
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q132
  /** 3-FOLD CROSS-VALIDATION of the q128 classifier — the model-
    * selection harness a training pipeline runs before shipping a
    * filter: fold = portable hash of doc_id mod 3, each fold held out
    * once, 6 GD iterations on the other two, held-out accuracy +
    * trained weights per fold. Reuses Classifier.fit's bit-replayable
    * trajectory, so the oracle RE-TRAINS ALL THREE MODELS in DuckDB
    * (3×6 chained materialized CTE pairs, zero literals) and must land
    * on identical weights, counts, and accuracies. Spark shape: ~8
    * scan-speed jobs per fold over one persisted feature frame; every
    * driver value is a scalar aggregate or the 4-double model state.
    */
  def q132CvClassifier(s: SparkSession, dir: String): DataFrame = {
    val folds = 3
    val feats = Classifier
      .features(Tables.documents(s, dir), "text", "lang")
      .withColumn("fold", TextStats.portableHash(col("doc_id")) % folds)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    feats.count() // eager: 3 folds × (fit + eval) share this cache
    val rows = (0 until folds).map { f =>
      val train = feats.filter(col("fold") =!= f)
      val test = feats.filter(col("fold") === f)
      val w = Classifier.fit(train, iters = 6)
      val p = Classifier.probExpr(Classifier.zExpr(w))
      val nTrain = train.count()
      val ev = test
        .agg(
          count(lit(1)).as("n_eval"),
          sum(((p >= lit(0.5)) === (col("y") === lit(1.0))).cast("long")).as("n_correct")
        )
        .head()
      (f.toLong, nTrain, ev.getLong(0), ev.getLong(1), w)
    }
    import s.implicits._
    rows
      .map { case (f, ntr, nev, nc, w) =>
        (f, ntr, nev, nc, nc.toDouble / nev.toDouble, w(0), w(1), w(2), w(3))
      }
      .toDF("fold", "n_train", "n_eval", "n_correct", "accuracy", "w0", "w1", "w2", "w3")
      .select(
        col("fold"),
        col("n_train"),
        col("n_eval"),
        col("n_correct"),
        round(col("accuracy"), 6).as("accuracy"),
        round(col("w0"), 6).as("w0"),
        round(col("w1"), 6).as("w1"),
        round(col("w2"), 6).as("w2"),
        round(col("w3"), 6).as("w3")
      )
      .orderBy(col("fold"))
  }

  /** q132 replay: three full re-trainings, one per held-out fold (the
    * q128 CTE machinery with a fold predicate), generated by the same
    * loop shape the Spark side runs.
    */
  val q132Oracle: String = {
    val sigma = "(0.5 + z/(2.0*(1.0+abs(z))))"
    def zFrom(wcte: String, pred: String) =
      s"SELECT f.*, w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 AS z FROM feats f, $wcte w WHERE $pred"
    def foldCtes(fo: Int): String = {
      val gradSums = (0 to 3)
        .map(k =>
          s"CAST(SUM(CAST(floor(($sigma - y)*x$k*1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g$k")
        .mkString(", ")
      val iters = (1 to 6)
        .map { i =>
          s"""gf${fo}_$i AS MATERIALIZED (
             |  SELECT $gradSums
             |  FROM (${zFrom(s"wf${fo}_${i - 1}", s"f.fold <> $fo")})
             |), wf${fo}_$i AS MATERIALIZED (
             |  SELECT ${(0 to 3)
                  .map(k => s"w.w$k - 0.5*(CAST(g.g$k AS DOUBLE)/1000000.0/nn.n) AS w$k")
                  .mkString(", ")}
             |  FROM wf${fo}_${i - 1} w, gf${fo}_$i g, nnf$fo nn
             |)""".stripMargin
        }
        .mkString(", ")
      s"""nnf$fo AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n FROM feats WHERE fold <> $fo
         |), wf${fo}_0 AS MATERIALIZED (
         |  SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
         |         CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3
         |), $iters, evf$fo AS (
         |  SELECT CAST($fo AS BIGINT) AS fold,
         |    (SELECT CAST(count(*) AS BIGINT) FROM feats WHERE fold <> $fo) AS n_train,
         |    CAST(count(*) AS BIGINT) AS n_eval,
         |    CAST(SUM(CASE WHEN (($sigma >= 0.5) = (y = CAST(1.0 AS DOUBLE))) THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |    any_value(w.w0) AS w0, any_value(w.w1) AS w1,
         |    any_value(w.w2) AS w2, any_value(w.w3) AS w3
         |  FROM (${zFrom(s"wf${fo}_6", s"f.fold = $fo")}) s, wf${fo}_6 w
         |)""".stripMargin
    }
    s"""WITH feats AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    ((doc_id * 2654435761) % 1000003) % 3 AS fold,
       |    CAST(1.0 AS DOUBLE) AS x0,
       |    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) /
       |      CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS x1,
       |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |           x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE) /
       |      CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS x2,
       |    least(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / CAST(200.0 AS DOUBLE),
       |          CAST(1.0 AS DOUBLE)) AS x3,
       |    CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y
       |  FROM documents
       |), ${(0 until 3).map(foldCtes).mkString(", ")}
       |SELECT fold, n_train, n_eval, n_correct,
       |  round(CAST(n_correct AS DOUBLE) / CAST(n_eval AS DOUBLE), 6) AS accuracy,
       |  round(w0, 6) AS w0, round(w1, 6) AS w1,
       |  round(w2, 6) AS w2, round(w3, 6) AS w3
       |FROM (SELECT * FROM evf0 UNION ALL SELECT * FROM evf1 UNION ALL SELECT * FROM evf2)
       |ORDER BY fold""".stripMargin
  }

  val q131Oracle: String =
    """WITH toks AS MATERIALIZED (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
      |), cells AS MATERIALIZED (
      |  SELECT r.i,
      |    ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || tok), 1, 15))::BIGINT % 16 AS c,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM toks, range(0, 4) r(i)
      |  GROUP BY r.i, c
      |), vocab AS MATERIALIZED (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS exact_count FROM toks GROUP BY tok
      |), est AS (
      |  SELECT v.tok, min(cl.cnt) AS cm_est
      |  FROM vocab v
      |  JOIN range(0, 4) r(i) ON true
      |  JOIN cells cl ON cl.i = r.i
      |    AND cl.c = ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || v.tok), 1, 15))::BIGINT % 16
      |  GROUP BY v.tok
      |)
      |SELECT v.tok, v.exact_count,
      |  CAST(e.cm_est AS BIGINT) AS cm_est,
      |  CAST(e.cm_est - v.exact_count AS BIGINT) AS overcount,
      |  (e.cm_est >= v.exact_count) AS never_under
      |FROM vocab v JOIN est e USING (tok)
      |ORDER BY tok""".stripMargin

  val q123Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, (doc_id * 2654435761) % 1000003 AS h,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS wt,
      |    ('0x' || substr(md5(regexp_replace(trim(text), '\s+', ' ', 'g')), 1, 15))::BIGINT AS digest
      |  FROM documents
      |), c AS (
      |  SELECT *, SUM(wt) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) - wt AS cum_before
      |  FROM d
      |), s AS (SELECT *, CAST(cum_before // 2048 AS BIGINT) AS shard_id FROM c
      |), p AS (
      |  SELECT shard_id, digest,
      |    row_number() OVER (PARTITION BY shard_id ORDER BY h, doc_id) AS pos
      |  FROM s
      |)
      |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(SUM((CAST(pos AS HUGEINT) * digest) % 2305843009213693951)
      |       % 2305843009213693951 AS BIGINT) AS order_digest
      |FROM p GROUP BY shard_id
      |ORDER BY shard_id""".stripMargin

  // ---------------------------------------------------------------- q96
  /** PageRank (ops/PageRank) over the part↔supplier co-occurrence graph
    * — the canonical iterative-graph workload, 3 power-iteration rounds
    * at d = 0.85 on the symmetrized DISTINCT lineitem edge set. Each
    * round is one src-keyed join + one dst-keyed decimal-accumulated
    * aggregate (order-independent sums — engine- and partitioning-
    * exact), localCheckpointed per round. Oracle: the same three rounds
    * UNROLLED as DuckDB CTEs, generated by the same Scala loop that
    * could unroll any round count — query and oracle share the round
    * definition by construction.
    */
  def q96PageRank(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val edges = PageRank.symmetrize(
      li.select(
        concat(lit("p"), col("l_partkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst")
      ).distinct()
    )
    PageRank
      .run(edges, iters = 3, damping = 0.85)
      .select(col("node"), round(col("r"), 10).as("r"))
      .orderBy(col("node"))
  }

  val q96Oracle: String = {
    // unroll r1..r3 with the same recurrence the Spark loop runs
    val rounds = (1 to 3)
      .map { i =>
        s"""r$i AS (
           |  SELECT e.dst AS node,
           |    ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / any_value(nn.n)) +
           |    0.85 * CAST(SUM(CAST(p.r / deg.deg AS DECIMAL(38,12))) AS DOUBLE) AS r
           |  FROM e
           |  JOIN r${i - 1} p ON e.src = p.node
           |  JOIN deg ON e.src = deg.src, nn
           |  GROUP BY e.dst
           |)""".stripMargin
      }
      .mkString(", ")
    s"""WITH d AS (
       |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
       |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
       |  FROM lineitem
       |), e AS (
       |  SELECT src, dst FROM d UNION SELECT dst, src FROM d
       |), deg AS (
       |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
       |), nodes AS (
       |  SELECT DISTINCT src AS node FROM e
       |), nn AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
       |), r0 AS (
       |  SELECT node, 1.0 / nn.n AS r FROM nodes, nn
       |), $rounds
       |SELECT node, round(r, 10) AS r FROM r3
       |ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- q97
  /** Robust ANOMALY detection: per event type, flag values beyond
    * 3 × 1.4826 × MAD of the median (the median-absolute-deviation
    * rule — outlier-resistant where mean/stddev is not, the standard
    * robust monitor for pipeline value drift). Both the median and the
    * MAD are DISCRETE rank-selected order statistics (the q92 recipe —
    * no interpolation, bit-identical across engines); everything after
    * the two rank windows is map-side comparison arithmetic. At 100 TB
    * the exact two-pass form swaps for one t-digest pass (q59) — same
    * output contract, sketch-grade quantiles.
    */
  def q97Anomaly(s: SparkSession, dir: String): DataFrame = {
    def rankSel(df: DataFrame, valCol: String, outCol: String): DataFrame =
      Stats.rankSelect(df, Seq("event_type"), valCol, Seq(0.5 -> outCol))
    val ev = Tables
      .events(s, dir)
      .select(col("event_type"), col("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ev.count() // eager: median + MAD + census consumers share this cache
    val med = rankSel(ev, "value", "med")
    val devs = ev
      .join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = rankSel(devs, "dev", "mad")
    devs
      .join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        max(col("med")).as("median"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(3.0) * lit(1.4826) * col("mad"), 1L).otherwise(0L)).as("n_outliers")
      )
      .select(
        col("event_type"), col("n"), col("median"), col("mad"), col("n_outliers"),
        round(col("n_outliers") / col("n").cast("double"), 6).as("outlier_frac")
      )
      .orderBy(col("event_type"))
  }

  val q97Oracle: String =
    """WITH v AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events
      |), med AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 THEN value END) AS med
      |  FROM v GROUP BY event_type
      |), dv AS (
      |  SELECT v.event_type, v.value, med.med, abs(v.value - med.med) AS dev
      |  FROM v JOIN med ON v.event_type = med.event_type
      |), dr AS (
      |  SELECT event_type, value, med, dev,
      |    row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM dv
      |), mad AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 THEN dev END) AS mad
      |  FROM dr GROUP BY event_type
      |)
      |SELECT dr.event_type, CAST(count(*) AS BIGINT) AS n,
      |  MAX(dr.med) AS median, MAX(mad.mad) AS mad,
      |  CAST(SUM(CASE WHEN dr.dev > 3.0 * 1.4826 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  round(SUM(CASE WHEN dr.dev > 3.0 * 1.4826 * mad.mad THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS outlier_frac
      |FROM dr JOIN mad ON dr.event_type = mad.event_type
      |GROUP BY dr.event_type
      |ORDER BY dr.event_type""".stripMargin

  // ---------------------------------------------------------------- q98
  /** Event-type TRANSITION matrix: per user in exact ns order, count
    * (current → next) event-type bigrams and their per-source
    * probabilities — the first-order Markov profile behind both
    * sequence-model training data and behavioral drift monitors. One
    * lead() window partitioned by user (millions of small ordered runs
    * — distributes; never a per-user collect_list), one aggregate, one
    * broadcast of the 5-row per-source totals.
    */
  def q98Transitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // floor-µs ordering, not raw ns: DuckDB's reader truncates the ns
    // timestamps to µs, so the engine-portable sort key is ts_ns div
    // 1000 with the event_id tiebreak (the q92 lesson)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val pairs = Tables
      .events(s, dir)
      .select(
        col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"), col("event_id")
      )
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs
      .groupBy(col("from_type"))
      .agg(sum(col("n")).as("total"))
    pairs
      .join(broadcast(totals), Seq("from_type"))
      .select(
        col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("total").cast("double"), 6).as("p")
      )
      .orderBy(col("from_type"), col("to_type"))
  }

  val q98Oracle: String =
    """WITH p AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS to_type
      |  FROM events
      |), c AS (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM p WHERE to_type IS NOT NULL
      |  GROUP BY from_type, to_type
      |), t AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY from_type
      |)
      |SELECT c.from_type, c.to_type, c.n,
      |  round(c.n / CAST(t.total AS DOUBLE), 6) AS p
      |FROM c JOIN t ON c.from_type = t.from_type
      |ORDER BY c.from_type, c.to_type""".stripMargin

  // ---------------------------------------------------------------- q99
  /** Nearest-centroid EVAL: per-label mean embedding (the class
    * prototype) and the confusion census of assigning every vector to
    * its nearest prototype — the cheapest trainable-representation
    * health check (labels separable ⟺ high diagonal mass). Centroids
    * are one posexplode aggregate (decimal-accumulated per-dim means —
    * order-independent), then a k×dim broadcast constant; assignment is
    * the zero-shuffle argmax fold (the Ivf.assign shape). Output: the
    * label×assigned confusion matrix plus overall accuracy. Oracled:
    * DuckDB replays the same means (unnest) and argmax (window on
    * dot/norms) exactly.
    */
  def q99NearestCentroid(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .embeddings(s, dir)
      .select(
        col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count() // eager: centroid fit + assignment share this cache
    val cents = e
      .select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col").cast("decimal(38,12)")).cast("double") / count(lit(1))).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
      .select(col("label"), transform(col("pairs"), p => p.getField("m")).as("centroid"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    // decimal-accumulated dot/norm: double addition is order-sensitive
    // and the oracle's SUM has no guaranteed order — casting every
    // product to decimal(38,12) before summing makes both engines exact
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(a, b, (x, y) => (x * y).cast("decimal(38,12)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,12)"),
        // re-cast per step: decimal + widens to (38,11), which would
        // drift the accumulator type; scale-12 is lossless here (terms
        // are O(1e-2) with 12-digit truncation)
        (acc, v) => (acc + v).cast("decimal(38,12)")
      ).cast("double")
    def norm(a: org.apache.spark.sql.Column) = sqrt(dot(a, a))
    // the vector norm is the same for all 10 prototypes — compute it
    // once per row, not inside every struct (the centroid norms are
    // literal-foldable and cost nothing at runtime)
    val scored = array(cents.map { case (lbl, c) =>
      val cCol = array(c.map(v => lit(v)).toIndexedSeq: _*)
      struct(
        round(dot(col("v"), cCol) / (col("vn") * norm(cCol)), 8).as("sim"),
        lit(-lbl).as("neg_lbl") // ties: smaller label wins under max
      )
    }.toIndexedSeq: _*)
    val assigned = e
      .withColumn("vn", norm(col("v")))
      .select(
        col("label"),
        (-array_max(scored).getField("neg_lbl")).cast("int").as("assigned")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count() // eager: confusion + accuracy share this cache
    val acc = assigned
      .agg((sum(when(col("label") === col("assigned"), 1L).otherwise(0L)) /
        count(lit(1)).cast("double")).as("a"))
    assigned
      .groupBy(col("label"), col("assigned"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(acc))
      .select(
        col("label"), col("assigned"), col("n"),
        round(col("a"), 6).as("overall_accuracy")
      )
      .orderBy(col("label"), col("assigned"))
  }

  val q99Oracle: String =
    """WITH e AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
      |), cent AS (
      |  SELECT label, pos,
      |    CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS m
      |  FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
      |  GROUP BY label, pos
      |), vn AS (
      |  SELECT vec_id, sqrt(CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE)) AS vnorm
      |  FROM (SELECT vec_id, unnest(v) AS y FROM e) GROUP BY vec_id
      |), cn AS (
      |  SELECT label AS clabel, sqrt(CAST(SUM(CAST(m * m AS DECIMAL(38,12))) AS DOUBLE)) AS cnorm
      |  FROM cent GROUP BY label
      |), sims AS (
      |  SELECT e.vec_id, e.label, cent.label AS clabel,
      |    CAST(SUM(CAST(e.v[cent.pos] * cent.m AS DECIMAL(38,12))) AS DOUBLE) AS dp
      |  FROM e JOIN cent ON true
      |  GROUP BY e.vec_id, e.label, cent.label
      |), simr AS (
      |  SELECT s.vec_id, s.label, s.clabel,
      |    round(s.dp / (vn.vnorm * cn.cnorm), 8) AS sim
      |  FROM sims s JOIN vn ON s.vec_id = vn.vec_id JOIN cn ON s.clabel = cn.clabel
      |), pick AS (
      |  SELECT vec_id, label, clabel AS assigned,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, clabel ASC) AS rn
      |  FROM simr
      |), a AS (
      |  SELECT SUM(CASE WHEN label = assigned THEN 1 ELSE 0 END) /
      |         CAST(count(*) AS DOUBLE) AS acc
      |  FROM pick WHERE rn = 1
      |)
      |SELECT p.label, p.assigned, CAST(count(*) AS BIGINT) AS n,
      |  round(a.acc, 6) AS overall_accuracy
      |FROM pick p, a
      |WHERE p.rn = 1
      |GROUP BY p.label, p.assigned, a.acc
      |ORDER BY p.label, p.assigned""".stripMargin

  // ---------------------------------------------------------------- q100
  /** Per-source DATA CARD: the one-pass corpus documentation roll-up a
    * dataset release ships — doc and token counts, exact-dup rate
    * (distinct fingerprint classes), decimal-accumulated mean quality,
    * and the modal language (count desc, lang asc — boundary-
    * deterministic). One wide aggregate over a single corpus scan plus
    * a 20-row broadcast join for the modal language; every signal
    * reuses the registry's established engine-portable formulas
    * (q21 quality, q85 fingerprint, q26 tokens).
    */
  def q100DataCard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = TextStats
      .withQuality(Tables.documents(s, dir), "text")
      .select(
        col("source"), col("lang"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"),
        TextStats.tokenSetFingerprint(col("text")).as("fp"),
        col("quality_score")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    d.count() // eager: card aggregate + modal language share this cache
    val base = d
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_total"),
        countDistinct(col("fp")).as("n_distinct"),
        (sum(col("quality_score").cast("decimal(38,12)")).cast("double") /
          count(lit(1))).as("mq")
      )
      .select(
        col("source"), col("n_docs"), col("tokens_total"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct") / col("n_docs").cast("double"), 6).as("dup_rate"),
        round(col("mq"), 6).as("mean_quality")
      )
    val wl = Window.partitionBy(col("source")).orderBy(col("n").desc, col("lang"))
    val topLang = d
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wl))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    base
      .join(broadcast(topLang), Seq("source"))
      .orderBy(col("source"))
  }

  val q100Oracle: String =
    """WITH t AS (
      |  SELECT source, lang,
      |    string_split_regex(trim(text), '\s+') AS toks,
      |    md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')) AS fp
      |  FROM documents
      |), q AS (
      |  SELECT source, lang, CAST(len(toks) AS BIGINT) AS n_tokens, fp,
      |    0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) +
      |    0.3 * (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) +
      |    0.3 * least(CAST(len(toks) AS DOUBLE) / 200.0, 1.0) AS quality
      |  FROM t
      |), base AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
      |    CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
      |    round(CAST(SUM(CAST(quality AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS mean_quality
      |  FROM q GROUP BY source
      |), tl AS (
      |  SELECT source, lang AS top_lang FROM (
      |    SELECT source, lang,
      |      row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang ASC) AS rn
      |    FROM q GROUP BY source, lang
      |  ) WHERE rn = 1
      |)
      |SELECT base.source, base.n_docs, base.tokens_total, base.n_distinct,
      |  round(1.0 - base.n_distinct / CAST(base.n_docs AS DOUBLE), 6) AS dup_rate,
      |  base.mean_quality, tl.top_lang
      |FROM base JOIN tl USING (source)
      |ORDER BY base.source""".stripMargin

  // ---------------------------------------------------------------- q101
  /** Corpus NOVELTY scoring: per document (in doc_id = arrival order),
    * the fraction of its distinct 8-grams whose FIRST corpus occurrence
    * is this document — the marginal-value metric for an incremental
    * crawl (a snapshot whose docs score near zero adds nothing the
    * corpus hasn't seen). Same gram shape as q80: linear gram build →
    * min-doc aggregate on the hashed gram key → per-doc count — no
    * instance-level join-back (see the in-body note). At 100 TB keep
    * the first-occurrence table as the incremental state between
    * snapshots (the q72 pattern).
    */
  def q101Novelty(s: SparkSession, dir: String): DataFrame = {
    val n = 8
    val toks = TextStats.tokens(col("text"))
    // Join-free first-occurrence form (round 4): a doc's novel-gram count
    // is how many grams name it as their min(doc_id) — so the
    // first-occurrence aggregate feeds a per-doc count directly, and the
    // old  first-occurrence ⋈ full-gram-instance  join-back disappears.
    // Per-doc distinct-gram totals are map-side (size of the distinct
    // array). Shuffle key = 8-byte xxhash64 of the gram (the 100 TB note
    // below, implemented); collision odds as in q80.
    val docs = Tables
      .documents(s, dir)
      .filter(size(toks) >= n)
      .select(col("doc_id"), array_distinct(TextStats.ngrams(toks, n)).as("grams"))
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"), col("grams"))
    // deliberately NOT persisted — see q80's note (same projection split,
    // same measured regression when cached)
    val novel = docs
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("g"))
      .groupBy(col("g"))
      .agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    docs
      .select(col("doc_id"), col("n_grams"))
      .join(novel, Seq("doc_id"), "left") // per-doc rows both sides: shuffle join at scale
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") / col("n_grams").cast("double"), 6)
          .as("novelty")
      )
      .orderBy(col("doc_id"))
  }

  val q101Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), f AS (
      |  SELECT doc_id, toks FROM d WHERE len(toks) >= 8
      |), i AS (
      |  SELECT doc_id, toks, unnest(range(0, len(toks) - 7)) AS i FROM f
      |), g AS (
      |  SELECT DISTINCT doc_id,
      |    toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4] || ' ' ||
      |    toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7] || ' ' || toks[i+8] AS gram
      |  FROM i
      |), fo AS (
      |  SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram
      |)
      |SELECT g.doc_id,
      |  CAST(count(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN fo.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  round(CAST(SUM(CASE WHEN fo.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE) /
      |        CAST(count(*) AS DOUBLE), 6) AS novelty
      |FROM g JOIN fo USING (gram)
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin

  // ---------------------------------------------------------------- q102
  /** Distribution DRIFT between corpus windows (PSI — population
    * stability index, the standard model-monitoring metric): split the
    * corpus into reference (first half by arrival order) and current
    * (second half), bin two per-doc features — quality score (10
    * fixed-width bins) and token count (width-32 bins, capped) — and
    * compute PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref) with
    * Laplace-smoothed bin shares (no zero-bin blowups, deterministic).
    * One corpus pass builds both feature histograms (map-side explode
    * of two (feature, bin) structs per doc); the PSI fold is a 10-row
    * decimal-accumulated aggregate per feature. Conventional read:
    * < 0.1 stable, > 0.25 drifted.
    */
  def q102PsiDrift(s: SparkSession, dir: String): DataFrame = {
    val bins = 10
    val d = TextStats
      .withQuality(Tables.documents(s, dir), "text")
      .select(
        col("doc_id"), col("quality_score"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    d.count() // eager: split scalar + histogram share this cache
    val maxId = d.agg(max(col("doc_id"))).head().getLong(0)
    val split = maxId / 2
    val binned = d.select(
      (col("doc_id") > split).as("cur"),
      explode(array(
        struct(lit("quality").as("feature"),
          least(floor(col("quality_score") * bins), lit(bins - 1)).cast("int").as("bin")),
        struct(lit("tokens").as("feature"),
          least(floor(col("n_tokens") / 32), lit(bins - 1)).cast("int").as("bin"))
      )).as("fb")
    ).select(col("cur"), col("fb.feature").as("feature"), col("fb.bin").as("bin"))
    val wins = d.agg(
      sum(when(col("doc_id") > split, 1L).otherwise(0L)).as("n_cur"),
      sum(when(col("doc_id") > split, 0L).otherwise(1L)).as("n_ref")
    )
    // the PSI sum runs over ALL 10 fixed bins, including bins empty in
    // BOTH halves — their smoothed term is nonzero when the halves have
    // unequal sizes, and silently dropping them understates the metric
    val frame = s
      .range(bins)
      .select(
        col("id").cast("int").as("bin"),
        explode(array(lit("quality"), lit("tokens"))).as("feature")
      )
    frame
      .join(
        binned
          .groupBy(col("feature"), col("bin"))
          .agg(
            sum(when(col("cur"), 1L).otherwise(0L)).as("c_cur0"),
            sum(when(col("cur"), 0L).otherwise(1L)).as("c_ref0")
          ),
        Seq("feature", "bin"),
        "left"
      )
      .select(
        col("feature"), col("bin"),
        coalesce(col("c_cur0"), lit(0L)).as("c_cur"),
        coalesce(col("c_ref0"), lit(0L)).as("c_ref")
      )
      .crossJoin(broadcast(wins))
      .select(
        col("feature"),
        ((col("c_cur") + 1).cast("double") / (col("n_cur") + bins).cast("double")).as("pc"),
        ((col("c_ref") + 1).cast("double") / (col("n_ref") + bins).cast("double")).as("pr"),
        col("n_cur"), col("n_ref")
      )
      .groupBy(col("feature"))
      .agg(
        max(col("n_ref")).as("n_ref"),
        max(col("n_cur")).as("n_cur"),
        round(
          sum(((col("pc") - col("pr")) * log(col("pc") / col("pr"))).cast("decimal(38,18)"))
            .cast("double"),
          6
        ).as("psi")
      )
      .select(
        col("feature"), col("n_ref"), col("n_cur"), col("psi"),
        (col("psi") > 0.25).as("drifted")
      )
      .orderBy(col("feature"))
  }

  val q102Oracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    0.4 * (CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE) / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)) +
      |    0.3 * (1.0 - CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE) / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)) +
      |    0.3 * least(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) / 200.0, 1.0) AS q,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), sp AS (
      |  SELECT MAX(doc_id) // 2 AS split FROM (SELECT doc_id FROM documents)
      |), b AS (
      |  SELECT d.doc_id > sp.split AS cur, f.feature, f.bin
      |  FROM d, sp, LATERAL (
      |    SELECT 'quality' AS feature,
      |      CAST(least(floor(d.q * 10), 9) AS INT) AS bin
      |    UNION ALL
      |    SELECT 'tokens',
      |      CAST(least(floor(d.n_tokens / 32.0), 9) AS INT)
      |  ) f
      |), w AS (
      |  SELECT CAST(SUM(CASE WHEN doc_id > sp.split THEN 1 ELSE 0 END) AS BIGINT) AS n_cur,
      |         CAST(SUM(CASE WHEN doc_id > sp.split THEN 0 ELSE 1 END) AS BIGINT) AS n_ref
      |  FROM d, sp
      |), h0 AS (
      |  SELECT feature, bin,
      |    CAST(SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS c_cur,
      |    CAST(SUM(CASE WHEN cur THEN 0 ELSE 1 END) AS BIGINT) AS c_ref
      |  FROM b GROUP BY feature, bin
      |), frame AS (
      |  SELECT f.feature, CAST(r.range AS INT) AS bin
      |  FROM range(0, 10) r, (SELECT 'quality' AS feature UNION ALL SELECT 'tokens') f
      |), h AS (
      |  SELECT frame.feature, frame.bin,
      |    COALESCE(h0.c_cur, 0) AS c_cur, COALESCE(h0.c_ref, 0) AS c_ref
      |  FROM frame LEFT JOIN h0 ON frame.feature = h0.feature AND frame.bin = h0.bin
      |), p AS (
      |  SELECT feature,
      |    (c_cur + 1) / CAST(w.n_cur + 10 AS DOUBLE) AS pc,
      |    (c_ref + 1) / CAST(w.n_ref + 10 AS DOUBLE) AS pr,
      |    w.n_cur, w.n_ref
      |  FROM h, w
      |)
      |SELECT feature, MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
      |  round(CAST(SUM(CAST((pc - pr) * ln(pc / pr) AS DECIMAL(38,18))) AS DOUBLE), 6) AS psi,
      |  round(CAST(SUM(CAST((pc - pr) * ln(pc / pr) AS DECIMAL(38,18))) AS DOUBLE), 6) > 0.25 AS drifted
      |FROM p
      |GROUP BY feature
      |ORDER BY feature""".stripMargin

  // ---------------------------------------------------------------- q103
  /** RANKING-quality audit for the multiprobe ANN — recall (q49) says
    * whether the right neighbors appear; MRR and NDCG@k say whether
    * they appear in the right ORDER, which is what a retrieval stack
    * actually serves. Relevance of an ANN hit = k+1 − its exact rank
    * (0 if outside the exact top-k), so the ideal DCG is a closed-form
    * constant and NDCG needs no per-query normalizer join. ORACLED
    * since round 4: the generated SQL replays the full pipeline —
    * hyperplanes, banding, multiprobe, exact ranking, metric
    * arithmetic — so the one output row (n_queries, recall@k, MRR of
    * the exact top-1, mean NDCG@k) is a driver-certified hash match.
    * Round 5 extended the same replay to the ADAPTIVE-geometry queries
    * (q30/q31/q107) by generating their SQL at Verify time from the
    * corpus count — see [[dynamicOracles]].
    */
  /** Shared constants of q103's ranking-quality arithmetic, used by BOTH
    * the Spark side and the generated oracle: per-rank DCG weights
    * 1/log2(r+1) and the ideal DCG are computed ONCE in Scala and enter
    * each engine as double literals — no ln() call on either side, so
    * libm last-ulp divergence can't leak into the checked output. */
  private val q103K = 10
  private val q103DcgW: IndexedSeq[Double] =
    (1 to q103K).map(r => 1.0 / (math.log(r + 1) / math.log(2)))
  private val q103Idcg: Double =
    (1 to q103K).map(i => (q103K + 1 - i).toDouble * q103DcgW(i - 1)).sum

  def q103AnnRankingQuality(s: SparkSession, dir: String): DataFrame = {
    val k = q103K
    // FROZEN LSH geometry — (nbits, tables) = lshParams at the sf0.1
    // production corpus scale. q103 is the evaluation harness: freezing
    // the geometry makes the WHOLE ANN pipeline engine-reproducible
    // (the oracle re-derives the same seeded hyperplanes and replays
    // banding, radius-1 multiprobe, candidate dedup, and the exact
    // ranking in SQL), so MRR/NDCG/recall are driver-certified by
    // hash-match rather than self-reported. q30/q31 keep the adaptive
    // lshParams policy — adaptivity is their story; certification is
    // this one's.
    val (nbits, tables) = (5, 6)
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 50)
    val nQ = 50.0
    val exact = Similarity
      .bruteTopK(e, queries, k)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("xrank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.count() // eager: mrr + ndcg + recall consumers share this cache
    val approx = Similarity
      .annTopK(e, queries, k, nbits = nbits, tables = tables, probes = 1)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("arank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    approx.count()
    val joined = approx.join(exact, Seq("query_id", "neighbor_id"))
    // MRR: reciprocal ANN rank of each query's exact top-1 (0 if missed);
    // decimal-staged sums keep every aggregate order-independent (the
    // q96 recipe) so the oracle can hash-match them
    val mrr = joined
      .filter(col("xrank") === 1)
      .agg(
        (sum((lit(1.0) / col("arank")).cast("decimal(38,12)")).cast("double") / nQ).as("mrr")
      )
    // NDCG@k with rel = k+1-xrank; gain = rel · weight[arank] via the
    // shared literal weight table
    val ndcg = joined
      .select(
        col("query_id"),
        ((lit(k + 1) - col("xrank")).cast("double") *
          element_at(typedlit(q103DcgW), col("arank"))).as("g")
      )
      .groupBy(col("query_id"))
      .agg((sum(col("g").cast("decimal(38,12)")).cast("double") / q103Idcg).as("q_ndcg"))
      .agg((sum(col("q_ndcg").cast("decimal(38,12)")).cast("double") / nQ).as("ndcg"))
    val recall = joined.agg((count(lit(1)) / (nQ * k)).as("recall"))
    recall
      .crossJoin(mrr)
      .crossJoin(ndcg)
      .select(
        lit(50).as("n_queries"),
        lit(k).as("k"),
        lit(nbits).as("nbits"),
        lit(tables).as("tables"),
        round(col("recall"), 4).as("recall_at_k"),
        round(col("mrr"), 4).as("mrr"),
        round(col("ndcg"), 4).as("ndcg_at_k")
      )
  }

  /** Generated oracle: replays the ENTIRE q103 pipeline in SQL — the
    * same seeded hyperplanes (re-derived from the Similarity seeds
    * 7700+t), sign-bucket banding, radius-1 multiprobe on the query
    * side, candidate dedup, rounded-cosine ranking, and the
    * decimal-staged MRR/NDCG/recall arithmetic. Two cross-engine
    * gotchas carried from probing: every double literal goes through
    * CAST('…' AS DOUBLE) (DuckDB parses bare numeric literals as
    * DECIMAL and loses the low bits), and dot products unroll as a
    * left-associated term chain (list_dot_product sums in a different
    * order; verified bit-exact against the fold over both test SFs).
    */
  /** Shared SQL fragments for replaying graft.ops.Similarity's LSH
    * geometry in an oracle (q103 since round 4; q30/q31/q107 via the
    * round-5 DYNAMIC oracles): the seeded hyperplanes re-derived from
    * the Similarity seeds 7700+t, sign-bucket banding, and the radius-1
    * multiprobe list. Cross-engine gotchas carried from probing: every
    * double literal goes through CAST('…' AS DOUBLE) (DuckDB parses
    * bare numeric literals as DECIMAL and loses the low bits), and dot
    * products unroll as a left-associated term chain (list_dot_product
    * sums in a different order; verified bit-exact against the Spark
    * fold over both test SFs).
    */
  private object LshSql {
    val dim = 64

    private def planes(t: Int, nbits: Int): Array[Array[Double]] = {
      val rnd = new scala.util.Random(7700 + t)
      Array.fill(nbits, dim)(rnd.nextDouble() * 2 - 1)
    }

    private def dotSql(p: Array[Double]): String =
      (0 until dim)
        .map(i => s"CAST(embedding[${i + 1}] AS DOUBLE)*CAST('${p(i)}' AS DOUBLE)")
        .mkString(" + ")

    private def bucketSql(t: Int, nbits: Int): String =
      planes(t, nbits).zipWithIndex
        .map { case (p, j) => s"(CASE WHEN (${dotSql(p)}) > 0 THEN ${1L << j} ELSE 0 END)" }
        .mkString(" + ")

    /** The (vec_id, tbl, bucket) union — one SELECT per LSH table.
      * `from` names the (vec_id, embedding FLOAT[]) source: the
      * embeddings table by default, or a generated CTE (q54 replays
      * over closed-form raster-law features in a `feats` CTE).
      */
    def dbk(nbits: Int, tables: Int, from: String = "embeddings"): String =
      (0 until tables)
        .map(t => s"SELECT vec_id, $t AS tbl, CAST(${bucketSql(t, nbits)} AS BIGINT) AS bucket FROM $from")
        .mkString("\nUNION ALL\n")

    /** Radius-1 multiprobe bucket list (the bucket plus its one-bit
      * flips), for an unnest() on the probing side. */
    def probeList(nbits: Int): String =
      ("bucket" +: (0 until nbits).map(j => s"xor(bucket, ${1L << j})")).mkString(", ")
  }

  val q103Oracle: String = {
    val k = q103K
    val (nbits, tables) = (5, 6)
    val dbk = LshSql.dbk(nbits, tables)
    val probeList = LshSql.probeList(nbits)
    val wList = q103DcgW.map(w => s"CAST('$w' AS DOUBLE)").mkString("[", ", ", "]")
    s"""WITH dbk AS (
       |$dbk
       |), qpb AS (
       |  SELECT vec_id AS query_id, tbl, unnest([$probeList]) AS bucket
       |  FROM dbk WHERE vec_id < 50
       |), cand AS (
       |  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
       |  FROM dbk c JOIN qpb q ON c.tbl = q.tbl AND c.bucket = q.bucket
       |  WHERE c.vec_id <> q.query_id
       |), ar AS (
       |  SELECT query_id, neighbor_id, arank FROM (
       |    SELECT cand.query_id, cand.neighbor_id,
       |      ROW_NUMBER() OVER (
       |        PARTITION BY cand.query_id
       |        ORDER BY round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) DESC,
       |                 cand.neighbor_id) AS arank
       |    FROM cand
       |    JOIN embeddings c ON cand.neighbor_id = c.vec_id
       |    JOIN embeddings q ON cand.query_id = q.vec_id
       |  ) WHERE arank <= $k
       |), ex AS (
       |  SELECT query_id, neighbor_id, xrank FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (
       |        PARTITION BY q.vec_id
       |        ORDER BY round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) DESC,
       |                 c.vec_id) AS xrank
       |    FROM embeddings c, embeddings q
       |    WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id
       |  ) WHERE xrank <= $k
       |), j AS (
       |  SELECT ar.query_id, ar.arank, ex.xrank
       |  FROM ar JOIN ex ON ar.query_id = ex.query_id AND ar.neighbor_id = ex.neighbor_id
       |), mrr AS (
       |  SELECT CAST(SUM(CAST(CAST(1.0 AS DOUBLE) / arank AS DECIMAL(38,12))) AS DOUBLE) /
       |         CAST('50.0' AS DOUBLE) AS mrr
       |  FROM j WHERE xrank = 1
       |), nd1 AS (
       |  SELECT query_id,
       |    CAST(SUM(CAST(CAST($k + 1 - xrank AS DOUBLE) * ($wList[arank]) AS DECIMAL(38,12))) AS DOUBLE) /
       |    CAST('$q103Idcg' AS DOUBLE) AS q_ndcg
       |  FROM j GROUP BY query_id
       |), nd AS (
       |  SELECT CAST(SUM(CAST(q_ndcg AS DECIMAL(38,12))) AS DOUBLE) /
       |         CAST('50.0' AS DOUBLE) AS ndcg
       |  FROM nd1
       |), rc AS (
       |  SELECT count(*) / CAST('500.0' AS DOUBLE) AS recall FROM j
       |)
       |SELECT 50 AS n_queries, $k AS k, $nbits AS nbits, $tables AS tables,
       |  round(rc.recall, 4) AS recall_at_k,
       |  round(mrr.mrr, 4) AS mrr,
       |  round(nd.ndcg, 4) AS ndcg_at_k
       |FROM rc, mrr, nd""".stripMargin
  }

  // ---------------------------------------------------------------- q104
  /** Dataset SNAPSHOT DIFF — the release-to-release census a versioned
    * corpus ships: treating the first half (by arrival order) as the
    * previous snapshot and the full corpus as the current one, classify
    * every content fingerprint as carried / added, and count removed
    * (here structurally zero — append-only simulation, the value is
    * the shape). One fingerprint-keyed full outer join of the two
    * distinct-fingerprint sets; text never moves, only 32-char digests
    * shuffle (the q68/q72 discipline).
    */
  def q104SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(s, dir)
      .select(col("doc_id"), TextStats.tokenSetFingerprint(col("text")).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    d.count() // eager: split scalar + both snapshots share this cache
    val maxId = d.agg(max(col("doc_id"))).head().getLong(0)
    val split = maxId / 2
    val prev = d.filter(col("doc_id") <= split).select(col("fp")).distinct()
      .withColumn("in_prev", lit(1))
    val cur = d.select(col("fp")).distinct().withColumn("in_cur", lit(1))
    prev
      .join(cur, Seq("fp"), "full_outer")
      .agg(
        sum(when(col("in_prev").isNotNull && col("in_cur").isNotNull, 1L).otherwise(0L)).as("carried"),
        sum(when(col("in_prev").isNull && col("in_cur").isNotNull, 1L).otherwise(0L)).as("added"),
        sum(when(col("in_prev").isNotNull && col("in_cur").isNull, 1L).otherwise(0L)).as("removed")
      )
      .select(
        col("carried"), col("added"), col("removed"),
        round(col("added") / (col("carried") + col("added")).cast("double"), 6).as("growth_frac")
      )
  }

  val q104Oracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')) AS fp
      |  FROM documents
      |), sp AS (
      |  SELECT MAX(doc_id) // 2 AS split FROM d
      |), prev AS (
      |  SELECT DISTINCT fp FROM d, sp WHERE doc_id <= sp.split
      |), cur AS (
      |  SELECT DISTINCT fp FROM d
      |), j AS (
      |  SELECT prev.fp AS pfp, cur.fp AS cfp
      |  FROM prev FULL OUTER JOIN cur ON prev.fp = cur.fp
      |)
      |SELECT
      |  CAST(SUM(CASE WHEN pfp IS NOT NULL AND cfp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS carried,
      |  CAST(SUM(CASE WHEN pfp IS NULL AND cfp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS added,
      |  CAST(SUM(CASE WHEN pfp IS NOT NULL AND cfp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS removed,
      |  round(SUM(CASE WHEN pfp IS NULL AND cfp IS NOT NULL THEN 1 ELSE 0 END) /
      |        CAST(SUM(CASE WHEN cfp IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE), 6) AS growth_frac
      |FROM j""".stripMargin

  // ---------------------------------------------------------------- q105
  /** TEMPORAL split with an EMBARGO gap — time-based train/eval
    * separation (the leakage-safe alternative to q85's hash split when
    * examples are time-correlated): events before the 80th-percentile
    * day train, events after it + a 1-day embargo evaluate, and the
    * embargoed sliver between is DROPPED so near-boundary correlation
    * can't leak. The cutoff is a rank-selected day (discrete order
    * statistic over distinct days — the q92 recipe, engine-exact);
    * classification is map-side against two broadcast scalars.
    */
  def q105TemporalSplit(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ev.count() // eager: cutoff scalar + census share this cache
    val days = ev.select(col("day")).distinct()
    val nDays = days.count()
    val cutIdx = (0.8 * (nDays - 1)).floor.toLong + 1
    val cutoff = days
      .select(col("day"))
      .orderBy(col("day"))
      .limit(cutIdx.toInt)
      .agg(max(col("day")))
      .head()
      .getDate(0)
    ev.select(
        col("event_type"),
        when(col("day") <= lit(cutoff), "train")
          .when(col("day") <= date_add(lit(cutoff), 1), "embargo")
          .otherwise("eval")
          .as("split")
      )
      .groupBy(col("event_type"), col("split"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("split"))
  }

  val q105Oracle: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day FROM events
      |), days AS (
      |  SELECT day, row_number() OVER (ORDER BY day) AS rn, count(*) OVER () AS n
      |  FROM (SELECT DISTINCT day FROM d)
      |), cut AS (
      |  SELECT day AS cutoff FROM days
      |  WHERE rn = CAST(floor(0.8 * (n - 1)) AS BIGINT) + 1
      |)
      |SELECT d.event_type,
      |  CASE WHEN d.day <= cut.cutoff THEN 'train'
      |       WHEN d.day <= cut.cutoff + INTERVAL 1 DAY THEN 'embargo'
      |       ELSE 'eval' END AS split,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM d, cut
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q106
  /** PageRank on a DIRECTED graph with dangling nodes — exercises the
    * two general-graph behaviors q96's symmetrized run never touches:
    * parts are pure sinks (no out-edges → their rank folds back
    * uniformly each round) and suppliers are pure sources (no in-edges
    * → they must keep their teleport share instead of dropping out of
    * round 2+). Same round algebra as q96; the oracle unrolls the
    * recurrence INCLUDING the per-round dangling-mass scalar, so the
    * fold is driver-certified, not just spec-asserted.
    */
  def q106PagerankDirected(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val edges = li
      .select(
        concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst")
      )
      .distinct()
    PageRank
      .run(edges, iters = 3, damping = 0.85)
      .select(col("node"), round(col("r"), 10).as("r"))
      .orderBy(col("node"))
  }

  val q106Oracle: String = {
    // unroll r1..r3 with the same recurrence PageRank.run executes:
    // csum via decimal(38,12)-staged sums; dm = rank mass on nodes with
    // no out-edges, folded back as d·dm/N; nodes with no in-edges keep
    // (1-d)/N + d·dm/N via the LEFT JOIN's NULL csum
    val rounds = (1 to 3)
      .map { i =>
        s"""c$i AS (
           |  SELECT e.dst AS node,
           |    CAST(SUM(CAST(p.r / deg.deg AS DECIMAL(38,12))) AS DOUBLE) AS csum
           |  FROM e
           |  JOIN r${i - 1} p ON e.src = p.node
           |  JOIN deg ON e.src = deg.src
           |  GROUP BY e.dst
           |), dm$i AS (
           |  SELECT CAST(COALESCE(SUM(CAST(r AS DECIMAL(38,12))), 0) AS DOUBLE) AS dm
           |  FROM r${i - 1} WHERE node NOT IN (SELECT src FROM deg)
           |), r$i AS (
           |  SELECT n.node,
           |    ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n) +
           |    0.85 * (COALESCE(c$i.csum, CAST(0 AS DOUBLE)) + (dm$i.dm / nn.n)) AS r
           |  FROM nodes n LEFT JOIN c$i ON n.node = c$i.node, nn, dm$i
           |)""".stripMargin
      }
      .mkString(", ")
    s"""WITH e AS (
       |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
       |                  'p' || CAST(l_partkey AS VARCHAR) AS dst
       |  FROM lineitem
       |), deg AS (
       |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
       |), nodes AS (
       |  SELECT src AS node FROM e UNION SELECT dst FROM e
       |), nn AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
       |), r0 AS (
       |  SELECT node, 1.0 / nn.n AS r FROM nodes, nn
       |), $rounds
       |SELECT node, round(r, 10) AS r FROM r3
       |ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- q107
  /** HARD-NEGATIVE mining at PRODUCTION shape — q91's contract served
    * from LSH candidates instead of the exact all-pairs pass (q91 stays
    * as the oracled audit-scale baseline; its cost is quadratic by
    * design). Candidates are vectors within Hamming distance 1 of the
    * anchor's sign sketch in ANY table (the q31 one-side multiprobe
    * geometry): one shuffle on the 8-byte (tbl, bucket) key, per-anchor
    * argmax over ~candidate rows, never n. SELF-AUDITING on the bounded
    * anchor slice (the q46 pattern), grounded by an exact slice×corpus
    * pass: `audit_slice_neg_top1_agree` (mined hardest negative equals
    * the exact one) and `audit_slice_neg_in_cands` (the exact hardest
    * negative was in the anchor's candidate set at all — separates
    * candidate-recall misses from argmax misses). ORACLED since round 5:
    * the dynamic LshSql replay ([[q107OracleFor]]) re-derives the whole
    * pipeline — candidates, both argmaxes, both audits — in SQL at the
    * verify corpus's own geometry. The crossover claim below is
    * MEASURED by ops.SimilaritySpec's candidate-fraction ladder
    * (CandidateFractionSpec): as n grows and lshParams raises nbits,
    * the candidate fraction provably collapses.
    *
    * Honest cost note, MEASURED in CandidateFractionSpec (round 5):
    * with n = 2000 and 2^5 buckets the candidate set is ~a third of
    * the corpus, so this does NOT beat q91's exact pass HERE. As n
    * grows and lshParams raises nbits, the per-anchor candidate
    * fraction falls ~n^(−1/3) (measured 0.70 → 0.46 → 0.30 over
    * n = 2¹¹..2¹⁷ at this contract), then FLOORS at ~27% when the
    * maxTables backoff pins nbits — a bounded few-× per-anchor win
    * over the exact pass at the same recall contract, NOT an unbounded
    * collapse; the sub-5% collapse (measured 0.034 at n = 2²⁰) belongs
    * to the higher-cosine contract (targetCosine ≈ 0.7) a production
    * miner uses once candidates only need the top of the similarity
    * range. The audits certify the quality side of the trade: 0.96 of
    * exact hardest negatives survive the candidate cut.
    */
  def q107HardNegativesAnn(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = Tables.embeddings(s, dir)
    val (nbits, tables) =
      Similarity.lshParams(e.count(), targetCosine = 0.4, probeHamming = 1)
    val idx = Similarity
      .bucketIndex(e, "vec_id", "embedding", nbits, tables)
      .persist(MEMORY_AND_DISK)
    idx.count() // eager: both self-join sides share this cache
    // radius-1 multiprobe on the anchor side: a pair whose sketches
    // differ by <= 1 bit collides in some probed bucket (see
    // Similarity.nearDupsEmbedding's orientation argument)
    val probed = array(
      (col("bucket") +: (0 until nbits).map(j => col("bucket").bitwiseXOR(lit(1L << j)))).toIndexedSeq: _*
    )
    val aSide = idx.select(col("tbl"), explode(probed).as("bucket"), col("vec_id").as("anchor"))
    val bSide = idx.select(col("tbl"), col("bucket"), col("vec_id").as("other"))
    val cands = aSide
      .join(bSide, Seq("tbl", "bucket"))
      .filter(col("anchor") =!= col("other"))
      .select(col("anchor"), col("other"))
      .distinct()
      .persist(MEMORY_AND_DISK)
    cands.count() // eager: mining + candidate-recall audit share this cache
    val va = e.select(col("vec_id").as("anchor"), col("embedding").as("va"), col("label").as("la"))
    val vb = e.select(col("vec_id").as("other"), col("embedding").as("vb"), col("label").as("lb"))
    val mined = cands
      .join(va, "anchor")
      .join(vb, "other")
      .select(
        col("anchor"), col("la"), col("other"), col("lb"),
        round(Similarity.cosine(col("va"), col("vb")), 6).as("sim")
      )
      .groupBy(col("anchor"))
      .agg(
        max(when(col("la") === col("lb"), struct(col("sim"), (-col("other")).as("nid")))).as("pos"),
        max(when(col("la") =!= col("lb"), struct(col("sim"), (-col("other")).as("nid")))).as("neg")
      )
      .filter(col("pos").isNotNull && col("neg").isNotNull)
      .select(
        col("anchor"),
        (-col("pos.nid")).as("pos_id"),
        col("pos.sim").as("pos_sim"),
        (-col("neg.nid")).as("neg_id"),
        col("neg.sim").as("neg_sim"),
        round(col("pos.sim") - col("neg.sim"), 6).as("margin")
      )
      .persist(MEMORY_AND_DISK)
    mined.count() // eager: output + agreement audit share this cache
    // exact hardest negative on the bounded anchor slice (slice×corpus)
    val exactNeg = e
      .filter(col("vec_id") < 500)
      .select(col("vec_id").as("anchor"), col("embedding").as("va"), col("label").as("la"))
      .join(vb, col("anchor") =!= col("other"))
      .select(
        col("anchor"), col("la"), col("other"), col("lb"),
        round(Similarity.cosine(col("va"), col("vb")), 6).as("sim")
      )
      .filter(col("la") =!= col("lb"))
      .groupBy(col("anchor"))
      .agg(max(struct(col("sim"), (-col("other")).as("nid"))).as("xneg"))
      .select(col("anchor"), (-col("xneg.nid")).as("xneg_id"))
      .persist(MEMORY_AND_DISK)
    exactNeg.count() // eager: both audit consumers share this cache
    val agree = exactNeg
      .join(mined.select(col("anchor"), col("neg_id")), Seq("anchor"), "left")
      .agg(
        round(avg(when(col("neg_id") === col("xneg_id"), 1.0).otherwise(0.0)), 4)
          .as("audit_slice_neg_top1_agree")
      )
    val inCands = exactNeg
      .join(
        cands.select(col("anchor"), col("other").as("xneg_id"), lit(1).as("hit")),
        Seq("anchor", "xneg_id"),
        "left"
      )
      .agg(
        round(avg(coalesce(col("hit"), lit(0)).cast("double")), 4)
          .as("audit_slice_neg_in_cands")
      )
    mined
      .crossJoin(broadcast(agree))
      .crossJoin(broadcast(inCands))
      .orderBy(col("anchor"))
  }

  // ---------------------------------------------------------------------
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_filter" -> (q2Filter _),
    "q3_enrich" -> (q3Enrich _),
    "q4_watermark" -> (q4Watermark _),
    "q5_dedup" -> (q5Dedup _),
    "q6_latest" -> (q6Latest _),
    "q7_hourly" -> (q7Hourly _),
    "q8_union" -> (q8Union _),
    "q9_topk" -> (q9Topk _),
    "q10_upsert" -> (q10Upsert _),
    "q11_greatest" -> (q11Greatest _),
    "q12_json" -> (q12Json _),
    "q13_explode" -> (q13Explode _),
    "q14_timestamps" -> (q14Timestamps _),
    "q15_strings" -> (q15Strings _),
    "q16_join_parts" -> (q16JoinParts _),
    "q17_count_by" -> (q17CountBy _),
    "q18_parse_ts" -> (q18ParseTs _),
    "q19_normalize" -> (q19Normalize _),
    "q20_stations" -> (q20Stations _),
    "q21_text_quality" -> (q21TextQuality _),
    "q22_lang_id" -> (q22LangId _),
    "q23_fingerprint" -> (q23Fingerprint _),
    "q24_dedup_text" -> (q24DedupText _),
    "q25_knn_brute" -> (q25KnnBrute _),
    "q26_token_counts" -> (q26TokenCounts _),
    "q27_minhash_dedup" -> (q27MinhashDedup _),
    "q28_simhash" -> (q28Simhash _),
    "q29_ngram_jaccard" -> (q29NgramJaccard _),
    "q30_ann_lsh" -> (q30AnnLsh _),
    "q31_embed_neardups" -> (q31EmbedNearDups _),
    "q32_multimodal" -> (q32Multimodal _),
    "q33_dedup_assign" -> (q33DedupAssign _),
    "q34_retention" -> (q34Retention _),
    "q35_ivf" -> (q35Ivf _),
    "q36_rollup" -> (q36Rollup _),
    "q37_sessionize" -> (q37Sessionize _),
    "q38_pivot" -> (q38Pivot _),
    "q39_session_window" -> (q39SessionWindow _),
    "q40_topk_per_group" -> (q40TopkPerGroup _),
    "q41_percentiles" -> (q41Percentiles _),
    "q42_asof_join" -> (q42AsofJoin _),
    "q43_range_join" -> (q43RangeJoin _),
    "q44_hll_sketch" -> (q44HllSketch _),
    "q45_embed_neardups_exact" -> (q45EmbedNearDupsExact _),
    "q46_text_neardups_exact" -> (q46TextNearDupsExact _),
    "q47_tz" -> (q47Tz _),
    "q48_minhash_recall" -> (q48MinhashRecall _),
    "q49_ann_adaptive" -> (q49AnnAdaptiveRecall _),
    "q50_bloom_join" -> (q50BloomJoin _),
    "q51_connected_components" -> (q51ConnectedComponents _),
    "q52_stratified_sample" -> (q52StratifiedSample _),
    "q53_text_clean" -> (q53TextClean _),
    "q54_media_dedup" -> (q54MediaDedup _),
    "q55_scd2" -> (q55Scd2 _),
    "q56_dq_checks" -> (q56DqChecks _),
    "q57_seq_pack" -> (q57SeqPack _),
    "q58_repetition" -> (q58Repetition _),
    "q59_tdigest" -> (q59TdigestPercentiles _),
    "q60_cc_log_rounds" -> (q60ConnectedComponentsLogRounds _),
    "q61_decontaminate" -> (q61Decontaminate _),
    "q62_mixture_weights" -> (q62MixtureWeights _),
    "q63_chunking" -> (q63Chunk _),
    "q64_decontaminate_bloom" -> (q64DecontaminateBloom _),
    "q65_salted_join" -> (q65SaltedJoin _),
    "q66_tfidf" -> (q66Tfidf _),
    "q67_clean_pipeline" -> (q67CleanPipeline _),
    "q68_source_dedup_stats" -> (q68SourceDedupStats _),
    "q69_cube" -> (q69Cube _),
    "q70_heavy_hitters" -> (q70HeavyHitters _),
    "q71_mixture_expand" -> (q71MixtureExpand _),
    "q72_incremental_dedup" -> (q72IncrementalDedup _),
    "q73_compress_quality" -> (q73CompressQuality _),
    "q74_cdc_apply" -> (q74CdcApply _),
    "q75_bpe_pairs" -> (q75BpePairs _),
    "q76_moving_features" -> (q76MovingFeatures _),
    "q77_quantize" -> (q77Quantize _),
    "q78_semantic_dedup" -> (q78SemanticDedup _),
    "q79_alpha_sweep" -> (q79AlphaSweep _),
    "q80_dup_spans" -> (q80DupSpans _),
    "q81_quality_auc" -> (q81QualityAuc _),
    "q82_source_overlap" -> (q82SourceOverlap _),
    "q83_quality_bins" -> (q83QualityBins _),
    "q84_canonical_pick" -> (q84CanonicalPick _),
    "q85_hash_split" -> (q85HashSplit _),
    "q86_oov_rate" -> (q86OovRate _),
    "q87_dup_span_removal" -> (q87DupSpanRemoval _),
    "q88_dispersion" -> (q88Dispersion _),
    "q89_zorder_layout" -> (q89ZorderLayout _),
    "q90_compaction_plan" -> (q90CompactionPlan _),
    "q91_hard_negatives" -> (q91HardNegatives _),
    "q92_freshness" -> (q92Freshness _),
    "q93_funnel" -> (q93Funnel _),
    "q94_pq_adc" -> (q94PqAdc _),
    "q95_bpe_train" -> (q95BpeTrain _),
    "q96_pagerank" -> (q96PageRank _),
    "q97_anomaly" -> (q97Anomaly _),
    "q98_transitions" -> (q98Transitions _),
    "q99_nearest_centroid" -> (q99NearestCentroid _),
    "q100_data_card" -> (q100DataCard _),
    "q101_novelty" -> (q101Novelty _),
    "q102_psi_drift" -> (q102PsiDrift _),
    "q103_ann_ranking" -> (q103AnnRankingQuality _),
    "q104_snapshot_diff" -> (q104SnapshotDiff _),
    "q105_temporal_split" -> (q105TemporalSplit _),
    "q106_pagerank_directed" -> (q106PagerankDirected _),
    "q107_hard_negatives_ann" -> (q107HardNegativesAnn _),
    "q108_audio_decode" -> (q108AudioDecode _),
    "q109_ivf_pq" -> (q109IvfPq _),
    "q110_lm_score" -> (q110LmScore _),
    "q111_bpe_encode" -> (q111BpeEncode _),
    "q112_sparse_allpairs" -> (q112SparseAllPairs _),
    "q113_shard_plan" -> (q113ShardPlan _),
    "q114_decontam_coverage" -> (q114DecontamCoverage _),
    "q115_weighted_sample" -> (q115WeightedSample _),
    "q116_export_digest" -> (q116ExportDigest _),
    "q117_ccnet_buckets" -> (q117CcnetBuckets _),
    "q118_source_digest" -> (q118SourceDigest _),
    "q119_column_profile" -> (q119ColumnProfile _),
    "q120_curation_pipeline" -> (q120CurationPipeline _),
    "q121_de_payload_decode" -> (q121DePayloadDecode _),
    "q122_bm25" -> (q122Bm25 _),
    "q123_order_digest" -> (q123OrderDigest _),
    "q124_delta_digest" -> (q124DeltaDigest _),
    "q125_stratified_shards" -> (q125StratifiedShards _),
    "q126_gopher_rules" -> (q126GopherRules _),
    "q127_leak_safe_split" -> (q127LeakSafeSplit _),
    "q128_train_classifier" -> (q128TrainClassifier _),
    "q129_jl_projection" -> (q129JlProjection _),
    "q130_jl_ann_recall" -> (q130JlAnnRecall _),
    "q131_count_min" -> (q131CountMin _),
    "q132_cv_classifier" -> (q132CvClassifier _),
    "q133_pmi_collocations" -> (q133PmiCollocations _),
    "q134_event_trends" -> (q134EventTrends _),
    "q135_deletion_plan" -> (q135DeletionPlan _),
    "q136_gopher_report" -> (q136GopherReport _),
    "q137_vocab_stats" -> (q137VocabStats _),
    "q138_lang_confusion" -> (q138LangConfusion _),
    "q139_native_topk" -> (q139NativeTopK _),
    "q140_incremental_cc" -> (q140IncrementalCc _),
    "q141_ngram_span_dup" -> (q141NgramSpanDup _),
    "q142_temperature_mix" -> (q142TemperatureMix _),
    "q143_calibration" -> (q143Calibration _),
    "q144_token_budget" -> (q144TokenBudget _),
    "q145_span_removal" -> (q145SpanRemoval _),
    "q146_canonical_dedup" -> (q146CanonicalDedup _),
    "q147_cross_source_dup" -> (q147CrossSourceDup _),
    "q148_method_agreement" -> (q148MethodAgreement _),
    "q149_image_dhash" -> (q149ImageDhash _),
    "q150_rendezvous_shards" -> (q150RendezvousShards _),
    "q151_reshard_plan" -> (q151ReshardPlan _),
    "q152_span_width_ladder" -> (q152SpanWidthLadder _),
    "q153_source_fair_filter" -> (q153SourceFairFilter _),
    "q154_epoch_plan" -> (q154EpochPlan _),
    "q155_label_prop" -> (q155LabelProp _),
    "q156_epoch_drift" -> (q156EpochDrift _),
    "q157_range_join" -> (q157RangeJoin _),
    "q158_retention" -> (q158Retention _),
    "q159_pivot" -> (q159Pivot _),
    "q160_fuzzy_match" -> (q160FuzzyMatch _),
    "q161_rollup" -> (q161Rollup _),
    "q162_six_way_join" -> (q162SixWayJoin _),
    "q163_exists_late" -> (q163ExistsLate _),
    "q164_scalar_avg" -> (q164ScalarAvg _),
    "q165_not_in_nulls" -> (q165NotInNulls _),
    "q166_null_safe_join" -> (q166NullSafeJoin _),
    "q167_peak_concurrency" -> (q167PeakConcurrency _),
    "q168_skyline" -> (q168Skyline _),
    "q169_entity_resolution" -> (q169EntityResolution _),
    "q170_exact_moments" -> (q170ExactMoments _),
    "q171_window_functions" -> (q171WindowFunctions _),
    "q172_grouping_sets" -> (q172GroupingSets _),
    "q173_video_keyframes" -> (q173VideoKeyframes _),
    "q174_triangles" -> (q174Triangles _),
    "q175_sole_late_supplier" -> (q175SoleLateSupplier _),
    "q176_global_avg_anti" -> (q176GlobalAvgAnti _),
    "q177_set_ops" -> (q177SetOps _),
    "q178_explode_outer" -> (q178ExplodeOuter _),
    "q179_array_hof" -> (q179ArrayHof _),
    "q180_ivm" -> (q180Ivm _),
    "q181_attribution" -> (q181Attribution _),
    "q182_twap" -> (q182Twap _),
    "q183_ohlc" -> (q183Ohlc _),
    "q184_kcore" -> (q184KCore _),
    "q185_trending" -> (q185Trending _),
    "q186_ratio_report" -> (q186RatioReport _),
    "q187_moving_median" -> (q187MovingMedian _),
    "q188_benford" -> (q188Benford _),
    "q189_weighted_median" -> (q189WeightedMedian _),
    "q190_journey_patterns" -> (q190JourneyPatterns _),
    "q191_clamped_balance" -> (q191ClampedBalance _),
    "q192_mergeable_distinct" -> (q192MergeableDistinct _),
    "q193_time_to_convert" -> (q193TimeToConvert _),
    "q194_rfm" -> (q194Rfm _),
    "q195_fifo" -> (q195Fifo _),
    "q196_iso_weekday" -> (q196IsoWeekday _),
    "q197_unicode" -> (q197Unicode _),
    "q198_int_division" -> (q198IntDivision _),
    "q199_log_histogram" -> (q199LogHistogram _),
    "q200_daily_dashboard" -> (q200DailyDashboard _),
    "q201_geo_grid" -> (q201GeoGrid _),
    "q202_spatial_join" -> (q202SpatialJoin _),
    "q203_idw_interpolation" -> (q203IdwInterpolation _),
    "q204_spatial_knn" -> (q204SpatialKnn _),
    "q205_late_arrivals" -> (q205LateArrivals _),
    "q206_dedup_idempotence" -> (q206DedupIdempotence _),
    "q207_cc_agreement" -> (q207CcAgreement _),
    "q208_zorder_effect" -> (q208ZorderEffect _),
    "q209_null_aggregates" -> (q209NullAggregates _),
    "q210_null_ordering" -> (q210NullOrdering _),
    "q211_join_matrix" -> (q211JoinMatrix _),
    "q212_cast_table" -> (q212CastTable _),
    "q213_calendar" -> (q213Calendar _),
    "q214_frame_semantics" -> (q214FrameSemantics _),
    "q215_empty_input" -> (q215EmptyInput _),
    "q216_three_valued" -> (q216ThreeValued _),
    "q217_interval_union" -> (q217IntervalUnion _),
    "q218_longest_streak" -> (q218LongestStreak _),
    "q219_asof_tolerance" -> (q219AsofTolerance _),
    "q220_topk_ties" -> (q220TopkTies _),
    "q221_nested_sampling" -> (q221NestedSampling _),
    "q222_equidepth" -> (q222Equidepth _),
    "q223_new_vs_returning" -> (q223NewVsReturning _),
    "q224_wow_growth" -> (q224WowGrowth _),
    "q225_bfs_layers" -> (q225BfsLayers _),
    "q226_pii_scan" -> (q226PiiScan _),
    "q227_skew_gini" -> (q227SkewGini _),
    "q228_negative_sampling" -> (q228NegativeSampling _),
    "q229_filter_ablation" -> (q229FilterAblation _),
    "q230_ppjoin" -> (q230PpJoin _),
    "q231_phrase_search" -> (q231PhraseSearch _),
    "q232_merkle_diff" -> (q232MerkleDiff _),
    "q233_chi_square_ab" -> (q233ChiSquareAb _),
    "q234_survival_hazard" -> (q234SurvivalHazard _),
    "q235_eccentricity" -> (q235Eccentricity _),
    "q236_sssp" -> (q236Sssp _),
    "q237_k_anonymity" -> (q237KAnonymity _),
    "q238_seasonality" -> (q238Seasonality _),
    "q239_hierarchy_rollup" -> (q239HierarchyRollup _),
    "q240_bloom_fpr" -> (q240BloomFpr _),
    "q241_lpm_join" -> (q241LpmJoin _),
    "q242_token_bucket" -> (q242TokenBucket _),
    "q243_market_basket" -> (q243MarketBasket _),
    "q244_sliding_distinct" -> (q244SlidingDistinct _),
    "q245_gram_matrix" -> (q245GramMatrix _),
    "q246_gap_fill" -> (q246GapFill _),
    "q247_mix_shift" -> (q247MixShift _),
    "q248_maximal_matching" -> (q248MaximalMatching _),
    "q249_tokenization" -> (q249Tokenization _),
    "q250_abandonment" -> (q250Abandonment _),
    "q251_quantile_norm" -> (q251QuantileNorm _),
    "q252_seasonal_anomaly" -> (q252SeasonalAnomaly _),
    "q253_hits" -> (q253Hits _),
    "q254_graph_features" -> (q254GraphFeatures _),
    "q255_rrf_fusion" -> (q255Rrf _),
    "q256_cusum" -> (q256Cusum _),
    "q257_ewma" -> (q257Ewma _),
    "q258_recursive_cte" -> (q258RecursiveCte _),
    "q259_variant" -> (q259Variant _),
    "q260_collation" -> (q260Collation _),
    "q261_jaro_winkler" -> (q261JaroWinkler _),
    "q262_inverted_index" -> (q262InvertedIndex _),
    "q263_hll_algebra" -> (q263HllAlgebra _),
    "q264_ams_f2" -> (q264AmsF2 _),
    "q265_clustering_coeff" -> (q265ClusteringCoeff _),
    "q266_acf" -> (q266Acf _),
    "q267_jump_hash" -> (q267JumpHash _),
    "q268_unpivot" -> (q268Unpivot _),
    "q269_hilbert" -> (q269Hilbert _),
    "q270_filter_clause" -> (q270FilterClause _),
    "q271_lateral" -> (q271Lateral _),
    "q272_theil_sen" -> (q272TheilSen _),
    "q273_mann_whitney" -> (q273MannWhitney _),
    "q274_bitmap" -> (q274Bitmap _),
    "q275_critical_path" -> (q275CriticalPath _),
    "q276_set_cover" -> (q276SetCover _),
    "q277_scc" -> (q277Scc _),
    "q278_cms_join_size" -> (q278CmsJoinSize _),
    "q279_router_shootout" -> (q279RouterShootout _),
    "q280_l1_regression" -> (q280L1Regression _),
    "q281_geohash" -> (q281Geohash _),
    "q282_markov_stationary" -> (q282MarkovStationary _),
    "q283_boruvka_msf" -> (q283BoruvkaMsf _),
    "q284_temporal_reach" -> (q284TemporalReach _),
    "q285_random_walks" -> (q285RandomWalks _),
    "q286_cdc_chunking" -> (q286CdcChunking _),
    "q287_point_in_polygon" -> (q287PointInPolygon _),
    "q288_link_prediction" -> (q288LinkPrediction _),
    "q289_ppr" -> (q289Ppr _),
    "q290_allocation" -> (q290Allocation _),
    "q291_decision_stump" -> (q291DecisionStump _),
    "q292_single_link" -> (q292SingleLink _),
    "q293_rake" -> (q293Rake _),
    "q294_l_diversity" -> (q294LDiversity _),
    "q295_z_range_pruning" -> (q295ZRangePruning _),
    "q296_spearman" -> (q296Spearman _),
    "q297_morans_i" -> (q297MoransI _),
    "q298_robust_outliers" -> (q298RobustOutliers _),
    "q299_interval_schedule" -> (q299IntervalSchedule _),
    "q300_cuped" -> (q300Cuped _),
    "q301_textrank" -> (q301TextRank _),
    "q302_absorbing_chain" -> (q302AbsorbingChain _),
    "q303_heaps_law" -> (q303HeapsLaw _)
  )

  // lazy: oracle-string vals may be DECLARED below this map in the file;
  // a strict val would capture null for those forward references (object
  // vals initialize in declaration order)
  lazy val oracles: Map[String, String] = Map(
    "q1_agg" -> q1Oracle,
    "q2_filter" -> q2Oracle,
    "q3_enrich" -> q3Oracle,
    "q4_watermark" -> q4Oracle,
    "q5_dedup" -> q5Oracle,
    "q6_latest" -> q6Oracle,
    "q7_hourly" -> q7Oracle,
    "q8_union" -> q8Oracle,
    "q9_topk" -> q9Oracle,
    "q10_upsert" -> q10Oracle,
    "q11_greatest" -> q11Oracle,
    "q12_json" -> q12Oracle,
    "q13_explode" -> q13Oracle,
    "q14_timestamps" -> q14Oracle,
    "q15_strings" -> q15Oracle,
    "q16_join_parts" -> q16Oracle,
    "q17_count_by" -> q17Oracle,
    "q18_parse_ts" -> q18Oracle,
    "q19_normalize" -> q19Oracle,
    "q20_stations" -> q20Oracle,
    "q21_text_quality" -> q21Oracle,
    "q22_lang_id" -> q22Oracle,
    "q23_fingerprint" -> q23Oracle,
    "q24_dedup_text" -> q24Oracle,
    "q25_knn_brute" -> q25Oracle,
    "q26_token_counts" -> q26Oracle,
    "q29_ngram_jaccard" -> q29Oracle,
    "q32_multimodal" -> q32Oracle,
    "q34_retention" -> q34Oracle,
    "q108_audio_decode" -> q108Oracle,
    "q35_ivf" -> q35Oracle,
    "q36_rollup" -> q36Oracle,
    "q37_sessionize" -> q37Oracle,
    "q38_pivot" -> q38Oracle,
    "q39_session_window" -> q39Oracle,
    "q40_topk_per_group" -> q40Oracle,
    "q41_percentiles" -> q41Oracle,
    "q42_asof_join" -> q42Oracle,
    "q43_range_join" -> q43Oracle,
    "q45_embed_neardups_exact" -> q45Oracle,
    "q46_text_neardups_exact" -> q46Oracle,
    "q47_tz" -> q47Oracle,
    "q59_tdigest" -> q59Oracle,
    "q73_compress_quality" -> q73Oracle,
    "q50_bloom_join" -> q50Oracle,
    "q51_connected_components" -> q51Oracle,
    "q52_stratified_sample" -> q52Oracle,
    "q53_text_clean" -> q53Oracle,
    "q55_scd2" -> q55Oracle,
    "q56_dq_checks" -> q56Oracle,
    "q57_seq_pack" -> q57Oracle,
    "q58_repetition" -> q58Oracle,
    // q60 runs a different algorithm to the same answer — q51's oracle
    "q60_cc_log_rounds" -> q51Oracle,
    "q61_decontaminate" -> q61Oracle,
    "q62_mixture_weights" -> q62Oracle,
    "q63_chunking" -> q63Oracle,
    // q64 is q61 with a Bloom-prefiltered probe — identical output
    "q64_decontaminate_bloom" -> q61Oracle,
    "q65_salted_join" -> q65Oracle,
    "q66_tfidf" -> q66Oracle,
    "q67_clean_pipeline" -> q67Oracle,
    "q68_source_dedup_stats" -> q68Oracle,
    "q69_cube" -> q69Oracle,
    // q70's k=64 exceeds the corpus vocabulary, so the MG estimates are
    // provably exact — a plain GROUP BY count is a valid oracle
    "q70_heavy_hitters" -> q70Oracle,
    "q71_mixture_expand" -> q71Oracle,
    "q72_incremental_dedup" -> q72Oracle,
    "q74_cdc_apply" -> q74Oracle,
    "q75_bpe_pairs" -> q75Oracle,
    "q76_moving_features" -> q76Oracle,
    "q77_quantize" -> q77Oracle,
    "q78_semantic_dedup" -> q78Oracle,
    "q79_alpha_sweep" -> q79Oracle,
    "q80_dup_spans" -> q80Oracle,
    "q81_quality_auc" -> q81Oracle,
    "q82_source_overlap" -> q82Oracle,
    "q83_quality_bins" -> q83Oracle,
    "q84_canonical_pick" -> q84Oracle,
    "q85_hash_split" -> q85Oracle,
    "q86_oov_rate" -> q86Oracle,
    "q87_dup_span_removal" -> q87Oracle,
    "q88_dispersion" -> q88Oracle,
    "q89_zorder_layout" -> q89Oracle,
    "q90_compaction_plan" -> q90Oracle,
    "q91_hard_negatives" -> q91Oracle,
    "q92_freshness" -> q92Oracle,
    "q93_funnel" -> q93Oracle,
    "q95_bpe_train" -> q95Oracle,
    "q96_pagerank" -> q96Oracle,
    "q97_anomaly" -> q97Oracle,
    "q98_transitions" -> q98Oracle,
    "q99_nearest_centroid" -> q99Oracle,
    "q100_data_card" -> q100Oracle,
    "q101_novelty" -> q101Oracle,
    "q102_psi_drift" -> q102Oracle,
    "q103_ann_ranking" -> q103Oracle,
    "q104_snapshot_diff" -> q104Oracle,
    "q105_temporal_split" -> q105Oracle,
    "q106_pagerank_directed" -> q106Oracle,
    "q110_lm_score" -> q110Oracle,
    "q111_bpe_encode" -> q111Oracle,
    "q112_sparse_allpairs" -> q112Oracle,
    "q113_shard_plan" -> q113Oracle,
    "q114_decontam_coverage" -> q114Oracle,
    "q115_weighted_sample" -> q115Oracle,
    "q116_export_digest" -> q116Oracle,
    "q117_ccnet_buckets" -> q117Oracle,
    "q118_source_digest" -> q118Oracle,
    "q119_column_profile" -> q119Oracle,
    "q120_curation_pipeline" -> q120Oracle,
    "q121_de_payload_decode" -> q121Oracle,
    "q123_order_digest" -> q123Oracle,
    "q124_delta_digest" -> q124Oracle,
    "q125_stratified_shards" -> q125Oracle,
    "q126_gopher_rules" -> q126Oracle,
    "q127_leak_safe_split" -> q127Oracle,
    "q128_train_classifier" -> q128Oracle,
    "q129_jl_projection" -> q129Oracle,
    "q130_jl_ann_recall" -> q130Oracle,
    "q131_count_min" -> q131Oracle,
    "q132_cv_classifier" -> q132Oracle,
    "q133_pmi_collocations" -> q133Oracle,
    "q134_event_trends" -> q134Oracle,
    "q135_deletion_plan" -> q135Oracle,
    "q136_gopher_report" -> q136Oracle,
    "q137_vocab_stats" -> q137Oracle,
    "q138_lang_confusion" -> q138Oracle,
    "q139_native_topk" -> q139Oracle,
    "q140_incremental_cc" -> q140Oracle,
    "q141_ngram_span_dup" -> q141Oracle,
    "q142_temperature_mix" -> q142Oracle,
    "q143_calibration" -> q143Oracle,
    "q144_token_budget" -> q144Oracle,
    "q145_span_removal" -> q145Oracle,
    "q146_canonical_dedup" -> q146Oracle,
    "q147_cross_source_dup" -> q147Oracle,
    "q148_method_agreement" -> q148Oracle,
    "q149_image_dhash" -> q149Oracle,
    "q150_rendezvous_shards" -> q150Oracle,
    "q151_reshard_plan" -> q151Oracle,
    "q152_span_width_ladder" -> q152Oracle,
    "q153_source_fair_filter" -> q153Oracle,
    "q154_epoch_plan" -> q154Oracle,
    "q155_label_prop" -> q155Oracle,
    "q156_epoch_drift" -> q156Oracle,
    "q157_range_join" -> q157Oracle,
    "q158_retention" -> q158Oracle,
    "q159_pivot" -> q159Oracle,
    "q160_fuzzy_match" -> q160Oracle,
    "q161_rollup" -> q161Oracle,
    "q162_six_way_join" -> q162Oracle,
    "q163_exists_late" -> q163Oracle,
    "q164_scalar_avg" -> q164Oracle,
    "q165_not_in_nulls" -> q165Oracle,
    "q166_null_safe_join" -> q166Oracle,
    "q167_peak_concurrency" -> q167Oracle,
    "q168_skyline" -> q168Oracle,
    "q169_entity_resolution" -> q169Oracle,
    "q170_exact_moments" -> q170Oracle,
    "q171_window_functions" -> q171Oracle,
    "q172_grouping_sets" -> q172Oracle,
    "q173_video_keyframes" -> q173Oracle,
    "q174_triangles" -> q174Oracle,
    "q175_sole_late_supplier" -> q175Oracle,
    "q176_global_avg_anti" -> q176Oracle,
    "q177_set_ops" -> q177Oracle,
    "q178_explode_outer" -> q178Oracle,
    "q179_array_hof" -> q179Oracle,
    "q180_ivm" -> q180Oracle,
    "q181_attribution" -> q181Oracle,
    "q182_twap" -> q182Oracle,
    "q183_ohlc" -> q183Oracle,
    "q184_kcore" -> q184Oracle,
    "q185_trending" -> q185Oracle,
    "q186_ratio_report" -> q186Oracle,
    "q187_moving_median" -> q187Oracle,
    "q188_benford" -> q188Oracle,
    "q189_weighted_median" -> q189Oracle,
    "q190_journey_patterns" -> q190Oracle,
    "q191_clamped_balance" -> q191Oracle,
    "q192_mergeable_distinct" -> q192Oracle,
    "q193_time_to_convert" -> q193Oracle,
    "q194_rfm" -> q194Oracle,
    "q195_fifo" -> q195Oracle,
    "q196_iso_weekday" -> q196Oracle,
    "q197_unicode" -> q197Oracle,
    "q198_int_division" -> q198Oracle,
    "q199_log_histogram" -> q199Oracle,
    "q200_daily_dashboard" -> q200Oracle,
    "q201_geo_grid" -> q201Oracle,
    "q202_spatial_join" -> q202Oracle,
    "q203_idw_interpolation" -> q203Oracle,
    "q204_spatial_knn" -> q204Oracle,
    "q205_late_arrivals" -> q205Oracle,
    "q206_dedup_idempotence" -> q206Oracle,
    "q207_cc_agreement" -> q207Oracle,
    "q208_zorder_effect" -> q208Oracle,
    "q209_null_aggregates" -> q209Oracle,
    "q210_null_ordering" -> q210Oracle,
    "q211_join_matrix" -> q211Oracle,
    "q212_cast_table" -> q212Oracle,
    "q213_calendar" -> q213Oracle,
    "q214_frame_semantics" -> q214Oracle,
    "q215_empty_input" -> q215Oracle,
    "q216_three_valued" -> q216Oracle,
    "q217_interval_union" -> q217Oracle,
    "q218_longest_streak" -> q218Oracle,
    "q219_asof_tolerance" -> q219Oracle,
    "q220_topk_ties" -> q220Oracle,
    "q221_nested_sampling" -> q221Oracle,
    "q222_equidepth" -> q222Oracle,
    "q223_new_vs_returning" -> q223Oracle,
    "q224_wow_growth" -> q224Oracle,
    "q225_bfs_layers" -> q225Oracle,
    "q226_pii_scan" -> q226Oracle,
    "q227_skew_gini" -> q227Oracle,
    "q228_negative_sampling" -> q228Oracle,
    "q229_filter_ablation" -> q229Oracle,
    "q230_ppjoin" -> q230Oracle,
    "q231_phrase_search" -> q231Oracle,
    "q232_merkle_diff" -> q232Oracle,
    "q233_chi_square_ab" -> q233Oracle,
    "q234_survival_hazard" -> q234Oracle,
    "q235_eccentricity" -> q235Oracle,
    "q236_sssp" -> q236Oracle,
    "q237_k_anonymity" -> q237Oracle,
    "q238_seasonality" -> q238Oracle,
    "q239_hierarchy_rollup" -> q239Oracle,
    "q240_bloom_fpr" -> q240Oracle,
    "q241_lpm_join" -> q241Oracle,
    "q242_token_bucket" -> q242Oracle,
    "q243_market_basket" -> q243Oracle,
    "q244_sliding_distinct" -> q244Oracle,
    "q245_gram_matrix" -> q245Oracle,
    "q246_gap_fill" -> q246Oracle,
    "q247_mix_shift" -> q247Oracle,
    "q248_maximal_matching" -> q248Oracle,
    "q249_tokenization" -> q249Oracle,
    "q250_abandonment" -> q250Oracle,
    "q251_quantile_norm" -> q251Oracle,
    "q252_seasonal_anomaly" -> q252Oracle,
    "q253_hits" -> q253Oracle,
    "q254_graph_features" -> q254Oracle,
    "q256_cusum" -> q256Oracle,
    "q257_ewma" -> q257Oracle,
    "q258_recursive_cte" -> q258Oracle,
    "q259_variant" -> q259Oracle,
    "q260_collation" -> q260Oracle,
    "q261_jaro_winkler" -> q261Oracle,
    "q262_inverted_index" -> q262Oracle,
    "q263_hll_algebra" -> q263Oracle,
    "q264_ams_f2" -> q264Oracle,
    "q265_clustering_coeff" -> q265Oracle,
    "q266_acf" -> q266Oracle,
    "q267_jump_hash" -> q267Oracle,
    "q268_unpivot" -> q268Oracle,
    "q269_hilbert" -> q269Oracle,
    "q270_filter_clause" -> q270Oracle,
    "q271_lateral" -> q271Oracle,
    "q272_theil_sen" -> q272Oracle,
    "q273_mann_whitney" -> q273Oracle,
    "q274_bitmap" -> q274Oracle,
    "q275_critical_path" -> q275Oracle,
    "q276_set_cover" -> q276Oracle,
    "q277_scc" -> q277Oracle,
    "q278_cms_join_size" -> q278Oracle,
    "q279_router_shootout" -> q279Oracle,
    "q280_l1_regression" -> q280Oracle,
    "q281_geohash" -> q281Oracle,
    "q282_markov_stationary" -> q282Oracle,
    "q283_boruvka_msf" -> q283Oracle,
    "q284_temporal_reach" -> q284Oracle,
    "q285_random_walks" -> q285Oracle,
    "q286_cdc_chunking" -> q286Oracle,
    "q287_point_in_polygon" -> q287Oracle,
    "q288_link_prediction" -> q288Oracle,
    "q289_ppr" -> q289Oracle,
    "q290_allocation" -> q290Oracle,
    "q291_decision_stump" -> q291Oracle,
    "q292_single_link" -> q292Oracle,
    "q293_rake" -> q293Oracle,
    "q294_l_diversity" -> q294Oracle,
    "q295_z_range_pruning" -> q295Oracle,
    "q296_spearman" -> q296Oracle,
    "q297_morans_i" -> q297Oracle,
    "q298_robust_outliers" -> q298Oracle,
    "q299_interval_schedule" -> q299Oracle,
    "q300_cuped" -> q300Oracle,
    "q301_textrank" -> q301Oracle,
    "q302_absorbing_chain" -> q302Oracle,
    "q303_heaps_law" -> q303Oracle
  )

  // ------------------------------------------------------- dynamic oracles
  /** Oracles GENERATED AT VERIFY TIME from the same corpus statistics
    * the Spark queries read. q30/q31/q107 derive their LSH geometry
    * adaptively via Similarity.lshParams(corpus count) — a static SQL
    * string would freeze one (nbits, tables) and silently rot if the
    * gate ever ran at a different SF. Generating the replay AFTER
    * reading the corpus count keeps the adaptive policy AND the
    * certification: the oracle always replays exactly the geometry the
    * Spark side derived. (The count is a parquet-footer metadata read,
    * the same one the queries themselves pay.)
    */
  def dynamicOracles(s: SparkSession, dir: String): Map[String, String] = {
    // PER-ENTRY fault isolation (T6): each generator runs in its own
    // try, so one failure (e.g. Pq.fit throwing during q94 generation)
    // costs only that query's oracle, never the whole dynamic set — the
    // all-in-one Map construction used through round 5 contradicted
    // exactly that contract. The corpus count is shared lazily (one
    // Spark job, not one per n-dependent entry; a failed count simply
    // fails each n-dependent generator individually).
    lazy val n = Tables.embeddings(s, dir).count()
    val gens: Seq[(String, () => String)] = Seq(
      "q30_ann_lsh" -> (() => q30OracleFor(n)),
      "q31_embed_neardups" -> (() => q31OracleFor(n)),
      "q107_hard_negatives_ann" -> (() => q107OracleFor(n)),
      "q94_pq_adc" -> (() => q94OracleFor(s, dir)),
      "q33_dedup_assign" -> (() => q33OracleFor(s, dir)),
      "q49_ann_adaptive" -> (() => q49OracleFor(n)),
      "q27_minhash_dedup" -> (() => q27OracleFor(s, dir)),
      "q28_simhash" -> (() => q28OracleFor(s, dir)),
      "q44_hll_sketch" -> (() => q44OracleFor(s, dir)),
      "q48_minhash_recall" -> (() => q48OracleFor(s, dir)),
      "q54_media_dedup" -> (() => q54OracleFor(s, dir)),
      "q109_ivf_pq" -> (() => q109OracleFor(s, dir)),
      "q122_bm25" -> (() => q122OracleFor(s, dir)),
      "q255_rrf_fusion" -> (() => q255OracleFor(s, dir))
    )
    gens.flatMap { case (name, gen) =>
      try Some(name -> gen())
      catch {
        // NonFatal only: an OOM/LinkageError means the JVM is already
        // compromised — continuing to generate the remaining oracles in
        // it would ship silently-missing oracles attributed to the
        // wrong cause; let fatal errors propagate to Verify's top level
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[verify] dynamic oracle for $name failed: ${e.getMessage}")
          None
      }
    }.toMap
  }

  /** q30 replay at corpus size `n`: same adaptive geometry, banding,
    * radius-1 multiprobe on the query side, candidate dedup, and
    * rounded-cosine ranking as Similarity.annTopK. */
  def q30OracleFor(n: Long): String = {
    val (nbits, tables) = Similarity.lshParams(n, targetCosine = 0.4, probeHamming = 1)
    s"""WITH dbk AS (
       |${LshSql.dbk(nbits, tables)}
       |), qpb AS (
       |  SELECT vec_id AS query_id, tbl, unnest([${LshSql.probeList(nbits)}]) AS bucket
       |  FROM dbk WHERE vec_id < 10
       |), cand AS (
       |  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
       |  FROM dbk c JOIN qpb q ON c.tbl = q.tbl AND c.bucket = q.bucket
       |  WHERE c.vec_id <> q.query_id
       |)
       |SELECT query_id, rank, neighbor_id, sim FROM (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS sim,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY cand.query_id
       |      ORDER BY round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) DESC,
       |               cand.neighbor_id) AS rank
       |  FROM cand
       |  JOIN embeddings c ON cand.neighbor_id = c.vec_id
       |  JOIN embeddings q ON cand.query_id = q.vec_id
       |) WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** q31 replay at corpus size `n`: one-side radius-1 multiprobe bucket
    * self-join, candidate dedup, rounded-cosine threshold — exactly
    * Similarity.nearDupsEmbedding's pipeline. */
  def q31OracleFor(n: Long): String = {
    val (nbits, tables) = Similarity.lshParams(n, targetCosine = 0.35, probeHamming = 1)
    s"""WITH dbk AS (
       |${LshSql.dbk(nbits, tables)}
       |), pa AS (
       |  SELECT vec_id AS id_a, tbl, unnest([${LshSql.probeList(nbits)}]) AS bucket FROM dbk
       |), cand AS (
       |  SELECT DISTINCT a.id_a, b.vec_id AS id_b
       |  FROM pa a JOIN dbk b ON a.tbl = b.tbl AND a.bucket = b.bucket
       |  WHERE a.id_a < b.vec_id
       |)
       |SELECT cand.id_a, cand.id_b,
       |  round(list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]), 4) AS sim
       |FROM cand
       |JOIN embeddings va ON cand.id_a = va.vec_id
       |JOIN embeddings vb ON cand.id_b = vb.vec_id
       |WHERE round(list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]), 4) >= 0.35
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q49 replay at corpus size `n`: q30's candidate/ranking replay plus
    * the exact brute-force side and the recallAudit arithmetic. */
  def q49OracleFor(n: Long): String = {
    val (nbits, tables) = Similarity.lshParams(n, targetCosine = 0.4, probeHamming = 1)
    s"""WITH dbk AS (
       |${LshSql.dbk(nbits, tables)}
       |), qpb AS (
       |  SELECT vec_id AS query_id, tbl, unnest([${LshSql.probeList(nbits)}]) AS bucket
       |  FROM dbk WHERE vec_id < 10
       |), cand AS (
       |  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
       |  FROM dbk c JOIN qpb q ON c.tbl = q.tbl AND c.bucket = q.bucket
       |  WHERE c.vec_id <> q.query_id
       |), ar AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT cand.query_id, cand.neighbor_id,
       |      ROW_NUMBER() OVER (
       |        PARTITION BY cand.query_id
       |        ORDER BY round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) DESC,
       |                 cand.neighbor_id) AS rank
       |    FROM cand
       |    JOIN embeddings c ON cand.neighbor_id = c.vec_id
       |    JOIN embeddings q ON cand.query_id = q.vec_id
       |  ) WHERE rank <= 5
       |), ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (
       |        PARTITION BY q.vec_id
       |        ORDER BY round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) DESC,
       |                 c.vec_id) AS rank
       |    FROM embeddings c, embeddings q
       |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
       |  ) WHERE rank <= 5
       |)
       |SELECT CAST($n AS BIGINT) AS n_vectors, $nbits AS nbits, $tables AS tables,
       |  CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       |  round(CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
       |        CAST(count(*) AS DOUBLE), 4) AS recall
       |FROM ex LEFT JOIN (SELECT DISTINCT query_id, neighbor_id FROM ar) a
       |  USING (query_id, neighbor_id)""".stripMargin
  }

  /** q107 replay at corpus size `n`: the full production-shape mining
    * pipeline — LSH candidates, per-anchor pos/neg argmax, and both
    * slice audits (exact hardest negative from the slice×corpus pass,
    * top-1 agreement, candidate-set membership). */
  def q107OracleFor(n: Long): String = {
    val (nbits, tables) = Similarity.lshParams(n, targetCosine = 0.4, probeHamming = 1)
    s"""WITH dbk AS (
       |${LshSql.dbk(nbits, tables)}
       |), apb AS (
       |  SELECT vec_id AS anchor, tbl, unnest([${LshSql.probeList(nbits)}]) AS bucket FROM dbk
       |), cand AS (
       |  SELECT DISTINCT a.anchor, b.vec_id AS other
       |  FROM apb a JOIN dbk b ON a.tbl = b.tbl AND a.bucket = b.bucket
       |  WHERE a.anchor <> b.vec_id
       |), sc AS (
       |  SELECT cand.anchor, va.label AS la, cand.other, vb.label AS lb,
       |    round(list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]), 6) AS sim
       |  FROM cand
       |  JOIN embeddings va ON cand.anchor = va.vec_id
       |  JOIN embeddings vb ON cand.other = vb.vec_id
       |), pos AS (
       |  SELECT anchor, other AS pos_id, sim AS pos_sim,
       |    row_number() OVER (PARTITION BY anchor ORDER BY sim DESC, other ASC) AS rn
       |  FROM sc WHERE la = lb
       |), neg AS (
       |  SELECT anchor, other AS neg_id, sim AS neg_sim,
       |    row_number() OVER (PARTITION BY anchor ORDER BY sim DESC, other ASC) AS rn
       |  FROM sc WHERE la <> lb
       |), mined AS (
       |  SELECT p.anchor, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim,
       |    round(p.pos_sim - n.neg_sim, 6) AS margin
       |  FROM pos p JOIN neg n ON p.anchor = n.anchor AND p.rn = 1 AND n.rn = 1
       |), xs AS (
       |  SELECT a.vec_id AS anchor, b.vec_id AS other,
       |    round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
       |  FROM embeddings a JOIN embeddings b
       |    ON a.vec_id <> b.vec_id AND a.label <> b.label
       |  WHERE a.vec_id < 500
       |), xneg AS (
       |  SELECT anchor, other AS xneg_id FROM (
       |    SELECT anchor, other,
       |      row_number() OVER (PARTITION BY anchor ORDER BY sim DESC, other ASC) AS rn
       |    FROM xs
       |  ) WHERE rn = 1
       |), agree AS (
       |  SELECT round(AVG(CASE WHEN m.neg_id = x.xneg_id THEN CAST(1.0 AS DOUBLE)
       |    ELSE CAST(0.0 AS DOUBLE) END), 4) AS audit_slice_neg_top1_agree
       |  FROM xneg x LEFT JOIN mined m ON x.anchor = m.anchor
       |), incands AS (
       |  SELECT round(AVG(CASE WHEN c.other IS NOT NULL THEN CAST(1.0 AS DOUBLE)
       |    ELSE CAST(0.0 AS DOUBLE) END), 4) AS audit_slice_neg_in_cands
       |  FROM xneg x LEFT JOIN cand c ON x.anchor = c.anchor AND x.xneg_id = c.other
       |)
       |SELECT mined.anchor, mined.pos_id, mined.pos_sim, mined.neg_id, mined.neg_sim,
       |  mined.margin, agree.audit_slice_neg_top1_agree, incands.audit_slice_neg_in_cands
       |FROM mined, agree, incands
       |ORDER BY mined.anchor""".stripMargin
  }

  // ---------------------------------------------------------------- q141
  /** Repeated n-gram SPAN census (ops/NgramDup) — the exact-substring
    * duplication signal of Lee et al. ACL'22, relational instead of
    * suffix-array: a width-5 token span occurring ≥2 times corpus-wide
    * (cross- or intra-document) is duplicated; per source we report
    * span totals, duplicated-span ppm, and how many docs are >50%
    * duplicated (what an exact-substring dedup pass would rewrite
    * first). All shuffles key on the shingle — the inverted-index
    * shape; checked output is integer-only.
    */
  def q141NgramSpanDup(s: SparkSession, dir: String): DataFrame =
    NgramDup
      .sourceCensus(Tables.documents(s, dir), "text", 5)
      .orderBy(col("source"))

  /** q141 replay: identical positional-shingle algebra (the q133
    * range/list_transform idiom), identical census — zero literals.
    */
  val q141Oracle: String =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), sh AS MATERIALIZED (
      |  SELECT doc_id, source,
      |    unnest(list_transform(range(0, greatest(len(toks)-4, 0)),
      |           i -> array_to_string(toks[i+1:i+5], ' '))) AS shingle
      |  FROM t WHERE len(toks) >= 5
      |), pd AS MATERIALIZED (
      |  SELECT doc_id, source, shingle, CAST(count(*) AS BIGINT) AS c_doc
      |  FROM sh GROUP BY doc_id, source, shingle
      |), tot AS (
      |  SELECT shingle, CAST(sum(c_doc) AS BIGINT) AS c_all FROM pd GROUP BY shingle
      |), prof AS (
      |  SELECT pd.doc_id, pd.source,
      |    CAST(sum(pd.c_doc) AS BIGINT) AS n_spans,
      |    CAST(sum(CASE WHEN tot.c_all >= 2 THEN pd.c_doc ELSE 0 END) AS BIGINT) AS dup_spans
      |  FROM pd JOIN tot USING (shingle)
      |  GROUP BY pd.doc_id, pd.source
      |), per_source AS (
      |  SELECT source,
      |    CAST(count(*) AS BIGINT) AS n_docs_spanned,
      |    CAST(sum(n_spans) AS BIGINT) AS total_spans,
      |    CAST(sum(dup_spans) AS BIGINT) AS dup_spans,
      |    CAST(sum(CASE WHEN dup_spans*2 > n_spans THEN 1 ELSE 0 END) AS BIGINT) AS n_high_dup_docs
      |  FROM prof GROUP BY source
      |), alldocs AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
      |)
      |SELECT a.source, a.n_docs,
      |  COALESCE(p.n_docs_spanned, 0) AS n_docs_spanned,
      |  COALESCE(p.total_spans, 0) AS total_spans,
      |  COALESCE(p.dup_spans, 0) AS dup_spans,
      |  CASE WHEN COALESCE(p.total_spans, 0) > 0
      |       THEN CAST(floor(p.dup_spans * 1000000 / p.total_spans) AS BIGINT)
      |       ELSE 0 END AS dup_ppm,
      |  COALESCE(p.n_high_dup_docs, 0) AS n_high_dup_docs
      |FROM alldocs a LEFT JOIN per_source p USING (source)
      |ORDER BY a.source""".stripMargin

  // ---------------------------------------------------------------- q142
  /** Temperature-scaled source mixture (ops/Mixture.temperaturePlan) —
    * mC4-style α-sampling at α = 1/2: p_i = √c_i / Σ√c_j (sqrt is
    * IEEE-correctly-rounded, unlike pow — that choice IS the
    * cross-engine contract), a corpus-half budget split by p_i, and a
    * deterministic per-source draw: the target_n docs with the smallest
    * (portableHash(doc_id), doc_id), ranked by ops/Rank's two-pass so
    * no source ever funnels through one window task. The normalizer
    * folds in source-name order; the oracle replays it with an ordered
    * list_reduce and the plain row_number() definition.
    */
  def q142TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (plan, sampled) = Mixture.temperaturePlan(docs, "doc_id", "source")
    val agg = sampled
      .groupBy(col("source"))
      .agg(count(lit(1)).as("sampled_n"), sum(col("doc_id")).as("id_sum"))
    plan
      .join(agg, Seq("source"), "left")
      .select(
        col("source"),
        col("n_docs"),
        col("p_ppm"),
        col("target_n"),
        coalesce(col("sampled_n"), lit(0L)).as("sampled_n"),
        coalesce(col("id_sum"), lit(0L)).as("id_sum")
      )
      .orderBy(col("source"))
  }

  val q142Oracle: String =
    """WITH c AS (
      |  SELECT CAST(source AS VARCHAR) AS source, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c
      |), norm AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source)),
      |         (a, b) -> a + b) AS nrm
      |  FROM c
      |), plan AS (
      |  SELECT c.source, c.n_docs,
      |    CAST(floor(sqrt(CAST(c.n_docs AS DOUBLE)) / norm.nrm * 1000000.0) AS BIGINT) AS p_ppm,
      |    CAST(floor(CAST(tot.total // 2 AS DOUBLE) *
      |               (sqrt(CAST(c.n_docs AS DOUBLE)) / norm.nrm)) AS BIGINT) AS target_n
      |  FROM c, tot, norm
      |), ranked AS (
      |  SELECT CAST(source AS VARCHAR) AS source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY (doc_id * 2654435761) % 1000003, doc_id) AS rk
      |  FROM documents
      |), samp AS (
      |  SELECT r.source, CAST(count(*) AS BIGINT) AS sampled_n,
      |    CAST(sum(r.doc_id) AS BIGINT) AS id_sum
      |  FROM ranked r JOIN plan p USING (source)
      |  WHERE r.rk <= p.target_n
      |  GROUP BY r.source
      |)
      |SELECT p.source, p.n_docs, p.p_ppm, p.target_n,
      |  COALESCE(s.sampled_n, 0) AS sampled_n,
      |  COALESCE(s.id_sum, 0) AS id_sum
      |FROM plan p LEFT JOIN samp s USING (source)
      |ORDER BY p.source""".stripMargin

  // ---------------------------------------------------------------- q143
  /** CALIBRATION AUDIT — the reliability diagram + expected-calibration-
    * error check a team runs before using filter scores as sampling
    * weights, over TWO scorers so the audit provably separates them:
    * the q128 classifier trained to convergence (12 iterations — it
    * converges to the base-rate predictor, ECE ~2k ppm vs the contrast
    * scorer's ~205k: calibrated) and a fixed-weight scorer over the first three
    * embedding components (real per-row spread, but a score the label
    * never saw — the audit must flag its large ECE). Centile bins (the
    * fast-sigmoid keeps trained scores in a tight band); per bin,
    * quantized Σp vs the positive count; ECE in ppm per scorer. Reuses
    * Classifier.fit's bit-replayable trajectory, so the oracle
    * RE-TRAINS the model (q128's CTE chain, 12 rounds) and re-derives
    * every bin — zero literals; float→double widening of the embedding
    * components is exact, so both scorers' bits replay cross-engine.
    */
  def q143Calibration(s: SparkSession, dir: String): DataFrame = {
    val feats = Classifier
      .features(Tables.documents(s, dir), "text", "lang")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    feats.count() // eager: fit's 13 scans + the binning pass share this cache
    val w = Classifier.fit(feats, iters = 12)
    val trained = feats.select(
      lit("trained_lang").as("scorer"),
      Classifier.probExpr(Classifier.zExpr(w)).as("p"),
      col("y")
    )
    // the contrast scorer: fixed weights over the first three embedding
    // components — real per-row spread, but a score the label never saw,
    // so the audit must flag it (float→double widening is exact, so the
    // score bits replay cross-engine)
    val e = (i: Int) => col("embedding").getItem(i).cast("double")
    val fixedZ = lit(3.0) * e(0) + lit(3.0) * e(1) + lit(3.0) * e(2)
    val fixed = Tables
      .embeddings(s, dir)
      .select(
        lit("fixed_embed").as("scorer"),
        Classifier.probExpr(fixedZ).as("p"),
        when(col("label") <= 4, lit(1.0)).otherwise(lit(0.0)).as("y")
      )
    val perBin = trained
      .unionByName(fixed)
      .withColumn("bin", least(lit(99L), floor(col("p") * lit(100.0))))
      .groupBy(col("scorer"), col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("p") * lit(1000000.0) + lit(0.5)).cast("long")).as("sum_p_q"),
        sum(col("y").cast("long")).as("n_pos")
      )
      .withColumn("abs_gap_q", abs(col("sum_p_q") - col("n_pos") * lit(1000000L)))
    val tot = perBin
      .groupBy(col("scorer"))
      .agg(sum(col("abs_gap_q")).as("__ece_q"), sum(col("n")).as("__n_total"))
    perBin
      .join(broadcast(tot), Seq("scorer"))
      .select(
        col("scorer"),
        col("bin"),
        col("n"),
        col("n_pos"),
        col("sum_p_q"),
        col("abs_gap_q"),
        floor(col("__ece_q").cast("double") / col("__n_total").cast("double")).as("ece_ppm")
      )
      .orderBy(col("scorer"), col("bin"))
  }

  /** q143 replay: the full q128 re-training prefix (6 chained
    * materialized gradient/weight CTE pairs — the training IS part of
    * the contract), then the binning algebra.
    */
  val q143Oracle: String = {
    val sigma = "(0.5 + z/(2.0*(1.0+abs(z))))"
    def gradSums = (0 to 3)
      .map(k =>
        s"CAST(SUM(CAST(floor(($sigma - y)*x$k*1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g$k"
      )
      .mkString(",\n|      ")
    def zFrom(wcte: String) =
      s"SELECT f.*, w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 AS z FROM feats f, $wcte w"
    val iters = (1 to 12)
      .map { i =>
        s"""g$i AS MATERIALIZED (
           |  SELECT $gradSums
           |  FROM (${zFrom(s"w${i - 1}")})
           |), w$i AS MATERIALIZED (
           |  SELECT ${(0 to 3)
            .map(k => s"w.w$k - 0.5*(CAST(g.g$k AS DOUBLE)/1000000.0/nn.n) AS w$k")
            .mkString(", ")}
           |  FROM w${i - 1} w, g$i g, nn
           |)""".stripMargin
      }
      .mkString(", ")
    s"""WITH feats AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    CAST(1.0 AS DOUBLE) AS x0,
       |    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) /
       |      CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS x1,
       |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |           x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE) /
       |      CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS x2,
       |    least(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / CAST(200.0 AS DOUBLE),
       |          CAST(1.0 AS DOUBLE)) AS x3,
       |    CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y
       |  FROM documents
       |), nn AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n FROM feats
       |), w0 AS MATERIALIZED (
       |  SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
       |         CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3
       |), $iters, scored AS MATERIALIZED (
       |  SELECT 'trained_lang' AS scorer, f.y, $sigma AS p FROM (${zFrom("w12")}) f
       |  UNION ALL
       |  SELECT 'fixed_embed' AS scorer,
       |    CASE WHEN e.label <= 4 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y,
       |    $sigma AS p
       |  FROM (SELECT label,
       |          3.0*CAST(embedding[1] AS DOUBLE) + 3.0*CAST(embedding[2] AS DOUBLE)
       |            + 3.0*CAST(embedding[3] AS DOUBLE) AS z
       |        FROM embeddings) e
       |), per_bin AS (
       |  SELECT scorer, least(99, CAST(floor(p*100.0) AS BIGINT)) AS bin,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(floor(p*1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_p_q,
       |    CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS n_pos
       |  FROM scored GROUP BY 1, 2
       |), g AS (
       |  SELECT *, abs(sum_p_q - n_pos*1000000) AS abs_gap_q FROM per_bin
       |), tot AS (
       |  SELECT scorer, CAST(sum(abs_gap_q) AS BIGINT) AS ece_q,
       |         CAST(sum(n) AS BIGINT) AS n_total
       |  FROM g GROUP BY scorer
       |)
       |SELECT g.scorer, g.bin, g.n, g.n_pos, g.sum_p_q, g.abs_gap_q,
       |  CAST(floor(CAST(tot.ece_q AS DOUBLE) / CAST(tot.n_total AS DOUBLE)) AS BIGINT) AS ece_ppm
       |FROM g JOIN tot USING (scorer)
       |ORDER BY g.scorer, g.bin""".stripMargin
  }

  // ---------------------------------------------------------------- q144
  /** UniMax token-budget WATER-FILLING (ops/Mixture.tokenBudgetPlan) —
    * Chung et al. 2023: spread B = ⌊0.9·Σtokens⌋ as uniformly as
    * possible across sources with a 1-epoch cap; small sources
    * saturate, the leftover re-levels across the rest, the integer
    * remainder goes one token each to the first sources in cap order.
    * Pure integer arithmetic end-to-end (no floats anywhere), so the
    * oracle replays the closed-form prefix test with window functions
    * and must agree exactly.
    */
  def q144TokenBudget(s: SparkSession, dir: String): DataFrame =
    Mixture
      .tokenBudgetPlan(Tables.documents(s, dir), "text", "source")
      .orderBy(col("source"))

  val q144Oracle: String =
    """WITH tk AS (
      |  SELECT CAST(source AS VARCHAR) AS source,
      |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source
      |), p AS (
      |  SELECT CAST(sum(n_tokens) * 9 // 10 AS BIGINT) AS budget,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM tk
      |), o AS (
      |  SELECT source, n_tokens,
      |    CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT) AS rk,
      |    CAST(sum(n_tokens) OVER (ORDER BY n_tokens, source
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS csum
      |  FROM tk
      |), cutc AS MATERIALIZED (
      |  SELECT o.*, p.budget, p.n,
      |    (o.n_tokens * (p.n - o.rk + 1) <= p.budget - (o.csum - o.n_tokens)) AS sat_test
      |  FROM o, p
      |), cut AS (
      |  SELECT COALESCE((SELECT min(rk) FROM cutc WHERE NOT sat_test),
      |                  (SELECT n + 1 FROM p)) AS cut
      |), lvl AS (
      |  SELECT c.cut,
      |    CASE WHEN c.cut <= p.n
      |         THEN (p.budget - COALESCE((SELECT max(csum) FROM cutc WHERE rk < c.cut), 0))
      |              // (p.n - c.cut + 1)
      |         ELSE 0 END AS level,
      |    CASE WHEN c.cut <= p.n
      |         THEN (p.budget - COALESCE((SELECT max(csum) FROM cutc WHERE rk < c.cut), 0))
      |              % (p.n - c.cut + 1)
      |         ELSE 0 END AS rem
      |  FROM cut c, p
      |), alloc AS (
      |  SELECT c.source, c.n_tokens, c.budget,
      |    CASE WHEN c.rk < l.cut THEN c.n_tokens
      |         ELSE l.level + (CASE WHEN c.rk - l.cut < l.rem THEN 1 ELSE 0 END) END AS allocated,
      |    (c.rk < l.cut) AS saturated
      |  FROM cutc c, lvl l
      |)
      |SELECT source, n_tokens, budget,
      |  CAST(allocated AS BIGINT) AS allocated, saturated,
      |  CAST(allocated * 1000000 // n_tokens AS BIGINT) AS epochs_ppm
      |FROM alloc
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q145
  /** Exact-substring span REMOVAL rewrite (NgramDup.removalProfile) —
    * q141 told you HOW MUCH verbatim repetition exists; this is the
    * dedup pass itself: a token is deleted iff covered by a span
    * occurrence that is not the corpus-first occurrence of its shingle
    * (first = smallest doc_id·2^20+pos integer key), so every span's
    * first occurrence survives and only repeats die — the Lee et al.
    * rewrite semantics. Per-source token totals, removed ppm, and
    * fully-gutted docs. All keys integer; the ordering law is one
    * BIGINT min per shingle, so the oracle replays it exactly.
    */
  def q145SpanRemoval(s: SparkSession, dir: String): DataFrame =
    NgramDup
      .sourceRemoval(Tables.documents(s, dir), "text", 5)
      .orderBy(col("source"))

  val q145Oracle: String =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), occ AS MATERIALIZED (
      |  SELECT doc_id,
      |    unnest(list_transform(range(0, greatest(len(toks)-4, 0)),
      |           i -> {'pos': i+1, 'shingle': array_to_string(toks[i+1:i+5], ' ')}),
      |           recursive := true)
      |  FROM t WHERE len(toks) >= 5
      |), ok AS MATERIALIZED (
      |  SELECT doc_id, pos, shingle, doc_id*1048576 + pos AS okey FROM occ
      |), firsts AS (
      |  SELECT shingle, CAST(min(okey) AS BIGINT) AS fk FROM ok GROUP BY shingle
      |), rem AS (
      |  SELECT DISTINCT o.doc_id, CAST(unnest(range(o.pos, o.pos + 5)) AS BIGINT) AS tp
      |  FROM ok o JOIN firsts f USING (shingle)
      |  WHERE o.okey <> f.fk
      |), remc AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed FROM rem GROUP BY doc_id
      |), prof AS (
      |  SELECT t.doc_id, t.source, CAST(len(t.toks) AS BIGINT) AS n_tokens,
      |    COALESCE(r.n_removed, 0) AS n_removed
      |  FROM t LEFT JOIN remc r USING (doc_id)
      |)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST(sum(n_removed) AS BIGINT) AS removed_tokens,
      |  CASE WHEN sum(n_tokens) > 0
      |       THEN CAST(floor(sum(n_removed) * 1000000 / sum(n_tokens)) AS BIGINT)
      |       ELSE 0 END AS removed_ppm,
      |  CAST(sum(CASE WHEN n_removed = n_tokens AND n_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_gutted_docs
      |FROM prof GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q146
  /** Canonical-doc selection (ops/Canonical): near-dup clusters from
    * the q51 component machinery keep their HIGHEST-QUALITY member
    * (q21's oracled composite score, doc_id tiebreak) instead of the
    * min-id label — the curation decision real pipelines make. Output
    * per source: survivor/removed census, survivor id checksum, and
    * `n_upgrades` — survivors that are NOT their cluster's min id,
    * i.e. exactly where quality-argmax differs from the naive rep
    * convention (the operator's reason to exist, pinned in the row).
    * Oracle: recursive-CTE CC + the q21 quality law + the same rank
    * window, end-to-end.
    */
  def q146CanonicalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 500)
    val scored = TextStats
      .withQuality(docs, "text")
      .select(col("doc_id"), col("source"), col("quality_score").as("score"))
    val pairs = TextDedup
      .nearDupsExact(docs, "doc_id", "text", threshold = 0.9)
      .select(col("id_a"), col("id_b"))
    val surv = Canonical.survivors(scored, pairs, "doc_id")
    val compMin = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
    surv
      .withColumn("__comp_min", min(col("doc_id")).over(compMin))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("is_survivor").cast("long")).as("n_survivors"),
        sum((!col("is_survivor")).cast("long")).as("n_removed"),
        sum(when(col("is_survivor"), col("doc_id")).otherwise(lit(0L))).as("survivor_id_sum"),
        sum((col("is_survivor") && col("doc_id") =!= col("__comp_min")).cast("long"))
          .as("n_upgrades")
      )
      .orderBy(col("source"))
  }

  val q146Oracle: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, source, list_distinct(string_split_regex(trim(text), '\s+')) AS tk,
      |         string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents WHERE doc_id < 500
      |), edges AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM t a JOIN t b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) /
      |        CAST(len(a.tk) + len(b.tk) - len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) >= 0.9
      |), sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM edges
      |  UNION ALL
      |  SELECT id_b, id_a FROM edges
      |), reach(id, comp) AS (
      |  SELECT DISTINCT src, src FROM sym
      |  UNION
      |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.id
      |), labels AS (
      |  SELECT id, MIN(comp) AS component FROM reach GROUP BY id
      |), scored AS (
      |  SELECT t.doc_id, t.source,
      |    COALESCE(l.component, t.doc_id) AS component,
      |    0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) +
      |    0.3 * (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) +
      |    0.3 * least(CAST(len(toks) AS DOUBLE) / 200.0, 1.0) AS score
      |  FROM t LEFT JOIN labels l ON l.id = t.doc_id
      |), ranked AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY component ORDER BY score DESC, doc_id ASC) AS rk,
      |    min(doc_id) OVER (PARTITION BY component) AS comp_min
      |  FROM scored
      |)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
      |  CAST(sum(CASE WHEN rk = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
      |  CAST(sum(CASE WHEN rk = 1 THEN doc_id ELSE 0 END) AS BIGINT) AS survivor_id_sum,
      |  CAST(sum(CASE WHEN rk = 1 AND doc_id <> comp_min THEN 1 ELSE 0 END) AS BIGINT) AS n_upgrades
      |FROM ranked GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q147
  /** CROSS-SOURCE duplication matrix — who copies whom: near-dup pairs
    * from the q51 audit slice attributed to their (source, source)
    * cell, canonicalized lo ≤ hi. The report a curation team reads
    * before deciding source precedence (keep Wikipedia, drop the
    * scrape that mirrors it); diagonal cells are within-source
    * duplication, off-diagonal the genuine cross-source copying. Pure
    * integer counts over the oracled edge set; the source attach is a
    * broadcast of the (id, source) slice.
    */
  def q147CrossSourceDup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 500)
    val pairs = TextDedup
      .nearDupsExact(docs, "doc_id", "text", threshold = 0.9)
      .select(col("id_a"), col("id_b"))
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(broadcast(src.withColumnsRenamed(Map("doc_id" -> "id_a", "source" -> "__sa"))), Seq("id_a"))
      .join(broadcast(src.withColumnsRenamed(Map("doc_id" -> "id_b", "source" -> "__sb"))), Seq("id_b"))
      .select(
        least(col("__sa"), col("__sb")).as("source_lo"),
        greatest(col("__sa"), col("__sb")).as("source_hi")
      )
      .groupBy(col("source_lo"), col("source_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_within", col("source_lo") === col("source_hi"))
      .orderBy(col("source_lo"), col("source_hi"))
  }

  val q147Oracle: String =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id, source, list_distinct(string_split_regex(trim(text), '\s+')) AS tk
      |  FROM documents WHERE doc_id < 500
      |), e AS (
      |  SELECT a.source AS sa, b.source AS sb
      |  FROM t a JOIN t b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) /
      |        CAST(len(a.tk) + len(b.tk) - len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) >= 0.9
      |)
      |SELECT least(sa, sb) AS source_lo, greatest(sa, sb) AS source_hi,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  (least(sa, sb) = greatest(sa, sb)) AS is_within
      |FROM e GROUP BY 1, 2
      |ORDER BY source_lo, source_hi""".stripMargin

  // ---------------------------------------------------------------- q148
  /** DEDUP-METHOD AGREEMENT audit — how sensitive is "the duplicate
    * set" to the method and threshold choice: one bounded all-pairs
    * pass scores every q51-slice pair under token-set Jaccard AND
    * 5-gram shingle-set Jaccard, then three methods (token ≥ 0.9,
    * token ≥ 0.8, shingle ≥ 0.5) are compared as SETS — pair counts,
    * pairwise intersections, and set-Jaccard in ppm. The measurement a
    * team runs before standardizing thresholds; published threshold
    * folklore (0.8 vs 0.9) moves this number, and now it's oracled.
    * One row, all integers; both measures share one crossJoin so the
    * audit costs one pass, not three.
    */
  def q148MethodAgreement(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 500)
    val sets = docs
      .select(
        col("doc_id"),
        TextDedup.tokenSet(col("text")).as("tk"),
        TextDedup.shingles(col("text"), 5).as("sh")
      )
      .withColumn("ntk", size(col("tk")))
      .withColumn("nsh", size(col("sh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sets.count() // eager: both cross-join sides share this cache
    val a = sets.select(col("doc_id").as("ia"), col("tk").as("tka"), col("sh").as("sha"), col("ntk").as("na"), col("nsh").as("ma"))
    val b = sets.select(col("doc_id").as("ib"), col("tk").as("tkb"), col("sh").as("shb"), col("ntk").as("nb"), col("nsh").as("mb"))
    val ti = size(array_intersect(col("tka"), col("tkb"))).cast("double")
    val si = size(array_intersect(col("sha"), col("shb"))).cast("double")
    val scored = a
      .crossJoin(b)
      .filter(col("ia") < col("ib"))
      .select(
        (ti / (col("na") + col("nb") - ti)).as("tj"),
        (si / (col("ma") + col("mb") - si)).as("sj")
      )
      .select(
        (col("tj") >= lit(0.9)).cast("long").as("m1"),
        (col("tj") >= lit(0.8)).cast("long").as("m2"),
        (col("sj") >= lit(0.5)).cast("long").as("m3")
      )
    def jppm(
        i: org.apache.spark.sql.Column,
        x: org.apache.spark.sql.Column,
        y: org.apache.spark.sql.Column
    ): org.apache.spark.sql.Column =
      when(x + y - i > 0, floor(i * lit(1000000L) / (x + y - i))).otherwise(lit(0L))
    scored
      .agg(
        count(lit(1)).as("n_pairs_scored"),
        sum(col("m1")).as("n_tok90"),
        sum(col("m2")).as("n_tok80"),
        sum(col("m3")).as("n_sh50"),
        sum(col("m1") * col("m2")).as("i_90_80"),
        sum(col("m1") * col("m3")).as("i_90_sh"),
        sum(col("m2") * col("m3")).as("i_80_sh")
      )
      .select(
        col("n_pairs_scored"),
        col("n_tok90"),
        col("n_tok80"),
        col("n_sh50"),
        col("i_90_80"),
        col("i_90_sh"),
        col("i_80_sh"),
        jppm(col("i_90_80"), col("n_tok90"), col("n_tok80")).as("j_90_80_ppm"),
        jppm(col("i_90_sh"), col("n_tok90"), col("n_sh50")).as("j_90_sh_ppm"),
        jppm(col("i_80_sh"), col("n_tok80"), col("n_sh50")).as("j_80_sh_ppm")
      )
  }

  /** q148 replay: same two similarity measures from first principles
    * (5-gram shingle set via the positional idiom — the audit slice's
    * 10-token minimum keeps the short-doc edge out of play on every
    * test SF), same method sets, same set-Jaccard algebra.
    */
  val q148Oracle: String =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct(string_split_regex(trim(text), '\s+')) AS tk,
      |    list_distinct(list_transform(range(0, greatest(len(string_split_regex(trim(text), '\s+'))-4, 0)),
      |      i -> array_to_string(string_split_regex(trim(text), '\s+')[i+1:i+5], ' '))) AS sh
      |  FROM documents WHERE doc_id < 500
      |), scored AS MATERIALIZED (
      |  SELECT
      |    CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) /
      |      CAST(len(a.tk) + len(b.tk) - len(list_filter(a.tk, x -> list_contains(b.tk, x))) AS DOUBLE) AS tj,
      |    CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE) /
      |      CAST(len(a.sh) + len(b.sh) - len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE) AS sj
      |  FROM t a JOIN t b ON a.doc_id < b.doc_id
      |), m AS (
      |  SELECT CASE WHEN tj >= 0.9 THEN 1 ELSE 0 END AS m1,
      |         CASE WHEN tj >= 0.8 THEN 1 ELSE 0 END AS m2,
      |         CASE WHEN sj >= 0.5 THEN 1 ELSE 0 END AS m3
      |  FROM scored
      |), agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_pairs_scored,
      |    CAST(sum(m1) AS BIGINT) AS n_tok90,
      |    CAST(sum(m2) AS BIGINT) AS n_tok80,
      |    CAST(sum(m3) AS BIGINT) AS n_sh50,
      |    CAST(sum(m1*m2) AS BIGINT) AS i_90_80,
      |    CAST(sum(m1*m3) AS BIGINT) AS i_90_sh,
      |    CAST(sum(m2*m3) AS BIGINT) AS i_80_sh
      |  FROM m
      |)
      |SELECT n_pairs_scored, n_tok90, n_tok80, n_sh50, i_90_80, i_90_sh, i_80_sh,
      |  CASE WHEN n_tok90 + n_tok80 - i_90_80 > 0
      |       THEN CAST(floor(i_90_80 * 1000000 / (n_tok90 + n_tok80 - i_90_80)) AS BIGINT) ELSE 0 END AS j_90_80_ppm,
      |  CASE WHEN n_tok90 + n_sh50 - i_90_sh > 0
      |       THEN CAST(floor(i_90_sh * 1000000 / (n_tok90 + n_sh50 - i_90_sh)) AS BIGINT) ELSE 0 END AS j_90_sh_ppm,
      |  CASE WHEN n_tok80 + n_sh50 - i_80_sh > 0
      |       THEN CAST(floor(i_80_sh * 1000000 / (n_tok80 + n_sh50 - i_80_sh)) AS BIGINT) ELSE 0 END AS j_80_sh_ppm
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- q149
  /** IMAGE perceptual near-dup (Multimodal.dhashBytes) — dHash over the
    * REAL ImageIO-decoded pixels of real PNGs, certified against the
    * closed-form raster law (the q32 discipline: the JDK codec
    * roundtrip IS the cross-engine contract). Signal is constructed
    * the q47/q121 way — synthesized identically on both engines: each
    * doc renders twice, original payload and last-byte-perturbed (same
    * length, so raster dims are unchanged — a genuine near-duplicate
    * image), plus a cross pairing of unrelated neighbors. The audit:
    * self pairs land in the low hamming buckets, cross pairs out at
    * the cap — max_self_hamming / min_cross_hamming ride on every row
    * so the separation is oracled, not asserted. The hash itself is
    * pure integer arithmetic (cross-multiplied cell means, no
    * division), shipped as two positive 32-bit halves so SQL needs no
    * 64-bit sign games.
    */
  def q149ImageDhash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 500)
    def hashes(df: DataFrame, variant: String): DataFrame = {
      val rendered = Multimodal.renderPng(df, "doc_id", "text")
      val media = Multimodal.asMedia(rendered, "doc_id", "png", "image")
      Multimodal
        .withDhash(media)
        .select(
          col("media_id").as("doc_id"),
          lit(variant).as("variant"),
          col("dhash_ok"),
          col("dhash_lo"),
          col("dhash_hi")
        )
    }
    val orig = hashes(docs.select(col("doc_id"), col("text")), "orig")
    val pert = hashes(
      docs.select(
        col("doc_id"),
        concat(substring(col("text"), lit(1), length(col("text")) - 1), lit("#")).as("text")
      ),
      "pert"
    )
    val both = orig.unionByName(pert).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    both.count() // eager: self and cross pairings share this cache
    def ham(
        lo1: org.apache.spark.sql.Column,
        hi1: org.apache.spark.sql.Column,
        lo2: org.apache.spark.sql.Column,
        hi2: org.apache.spark.sql.Column
    ) =
      (bit_count(lo1.bitwiseXOR(lo2)) + bit_count(hi1.bitwiseXOR(hi2))).cast("long")
    val o = both.filter(col("variant") === "orig")
    val p = both.filter(col("variant") === "pert")
    val self = o
      .alias("a")
      .join(p.alias("b"), col("a.doc_id") === col("b.doc_id"))
      .select(
        lit("self").as("pair_kind"),
        ham(col("a.dhash_lo"), col("a.dhash_hi"), col("b.dhash_lo"), col("b.dhash_hi")).as("hamming")
      )
    val crossP = o
      .alias("a")
      .join(o.alias("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(
        lit("cross").as("pair_kind"),
        ham(col("a.dhash_lo"), col("a.dhash_hi"), col("b.dhash_lo"), col("b.dhash_hi")).as("hamming")
      )
    val allPairs = self
      .unionByName(crossP)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    allPairs.count() // eager: bucket histogram + separation riders share this cache
    val sm = allPairs.agg(
      max(when(col("pair_kind") === "self", col("hamming"))).as("max_self_hamming"),
      min(when(col("pair_kind") === "cross", col("hamming"))).as("min_cross_hamming")
    )
    allPairs
      .groupBy(col("pair_kind"), least(col("hamming"), lit(16L)).as("hamming_bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(sm))
      .select(
        col("pair_kind"),
        col("hamming_bucket"),
        col("n_pairs"),
        col("max_self_hamming"),
        col("min_cross_hamming")
      )
      .orderBy(col("pair_kind"), col("hamming_bucket"))
  }

  /** q149 replay: dHash re-derived from the raster law (pixel bytes
    * from payload positions — no PNG in sight; Spark's side went
    * through the real codec, which is exactly what's being certified),
    * both variants, both pairings, same bucket/rider algebra.
    */
  val q149Oracle: String =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id, text AS payload, 'orig' AS variant FROM documents WHERE doc_id < 500
      |  UNION ALL
      |  SELECT doc_id, substr(text, 1, length(text)-1) || '#', 'pert' FROM documents WHERE doc_id < 500
      |), dims AS MATERIALIZED (
      |  SELECT doc_id, variant, payload, length(payload) AS len,
      |    8 + length(payload) % 9 AS w, 8 + length(payload) % 7 AS h
      |  FROM t
      |), px AS MATERIALIZED (
      |  SELECT doc_id, variant,
      |    unnest(list_transform(range(0, w*h), i -> {
      |      'cy': ((i // w) * 8) // h,
      |      'cx': ((i % w) * 9) // w,
      |      'gray': ord(substr(payload, CAST(i % len AS INTEGER) + 1, 1))
      |            + ord(substr(payload, CAST((i*31 + 7) % len AS INTEGER) + 1, 1))
      |            + ord(substr(payload, CAST((i*131 + 13) % len AS INTEGER) + 1, 1))
      |    }), recursive := true)
      |  FROM dims
      |), cells AS MATERIALIZED (
      |  SELECT doc_id, variant, cy, cx,
      |    CAST(sum(gray) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
      |  FROM px GROUP BY 1, 2, 3, 4
      |), grid AS MATERIALIZED (
      |  SELECT d.doc_id, d.variant, g.cy, g.cx,
      |    COALESCE(c.s, 0) AS s, COALESCE(c.c, 0) AS c
      |  FROM (SELECT DISTINCT doc_id, variant FROM dims) d
      |  CROSS JOIN (SELECT a.range AS cy, b.range AS cx FROM range(0,8) a, range(0,9) b) g
      |  LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.variant = d.variant
      |                   AND c.cy = g.cy AND c.cx = g.cx
      |), bits AS (
      |  SELECT g1.doc_id, g1.variant, g1.cy, g1.cx,
      |    CASE WHEN g2.s * g1.c > g1.s * g2.c THEN 1 ELSE 0 END AS bit
      |  FROM grid g1 JOIN grid g2 ON g1.doc_id = g2.doc_id AND g1.variant = g2.variant
      |                           AND g1.cy = g2.cy AND g2.cx = g1.cx + 1
      |  WHERE g1.cx < 8
      |), hashes AS MATERIALIZED (
      |  SELECT doc_id, variant,
      |    CAST(sum(CASE WHEN cy*8+cx < 32 THEN bit * (1::BIGINT << CAST(cy*8+cx AS INTEGER)) ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(sum(CASE WHEN cy*8+cx >= 32 THEN bit * (1::BIGINT << CAST(cy*8+cx-32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS hi
      |  FROM bits GROUP BY 1, 2
      |), selfp AS (
      |  SELECT 'self' AS pair_kind,
      |    CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
      |  FROM hashes a JOIN hashes b ON a.doc_id = b.doc_id
      |  WHERE a.variant = 'orig' AND b.variant = 'pert'
      |), crossp AS (
      |  SELECT 'cross' AS pair_kind,
      |    CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
      |  FROM hashes a JOIN hashes b ON b.doc_id = a.doc_id + 1
      |  WHERE a.variant = 'orig' AND b.variant = 'orig'
      |), allp AS MATERIALIZED (
      |  SELECT * FROM selfp UNION ALL SELECT * FROM crossp
      |), sm AS (
      |  SELECT CAST(max(CASE WHEN pair_kind = 'self' THEN hamming END) AS BIGINT) AS max_self_hamming,
      |         CAST(min(CASE WHEN pair_kind = 'cross' THEN hamming END) AS BIGINT) AS min_cross_hamming
      |  FROM allp
      |)
      |SELECT p.pair_kind, CAST(least(p.hamming, 16) AS BIGINT) AS hamming_bucket,
      |  CAST(count(*) AS BIGINT) AS n_pairs, sm.max_self_hamming, sm.min_cross_hamming
      |FROM allp p, sm
      |GROUP BY 1, 2, sm.max_self_hamming, sm.min_cross_hamming
      |ORDER BY pair_kind, hamming_bucket""".stripMargin

  // ---------------------------------------------------------------- q150
  /** RENDEZVOUS-HASH shard stability (ops/Rendezvous) — the
    * consistent-hashing audit for capacity changes: assign every doc at
    * N=8 and N=9 shards under HRW and under modulo, and measure what
    * moves. HRW's law — the movers are EXACTLY the docs whose new
    * shard's score wins (hrw_moved = |assign9 = 8|, ~1/9) — is emitted
    * as an oracled boolean; modulo moves ~8/9. Per-shard N=9 occupancy
    * rides along (HRW balance comes from the same 60-bit md5 scores
    * both engines derive). This is what keeps incremental exports
    * (q124/q135) cheap when the shard count changes.
    */
  def q150RendezvousShards(s: SparkSession, dir: String): DataFrame = {
    val assigned = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        Rendezvous.assign(col("doc_id"), 8).as("hrw8"),
        Rendezvous.assign(col("doc_id"), 9).as("hrw9"),
        pmod(col("doc_id"), lit(8L)).as("mod8"),
        pmod(col("doc_id"), lit(9L)).as("mod9")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count() // eager: riders + two occupancy aggregates share this cache
    val riders = assigned.agg(
      count(lit(1)).as("n_docs"),
      sum((col("hrw8") =!= col("hrw9")).cast("long")).as("hrw_moved"),
      sum((col("hrw9") === lit(8L)).cast("long")).as("__hrw_to_new"),
      sum((col("mod8") =!= col("mod9")).cast("long")).as("mod_moved")
    )
    val perHrw = assigned.groupBy(col("hrw9").as("shard")).agg(count(lit(1)).as("n_hrw"))
    val perMod = assigned.groupBy(col("mod9").as("shard")).agg(count(lit(1)).as("n_mod"))
    perHrw
      .join(perMod, Seq("shard"), "left")
      .crossJoin(broadcast(riders))
      .select(
        col("shard"),
        col("n_hrw"),
        coalesce(col("n_mod"), lit(0L)).as("n_mod"),
        col("n_docs"),
        col("hrw_moved"),
        floor(col("hrw_moved") * lit(1000000L) / col("n_docs")).as("hrw_moved_ppm"),
        col("mod_moved"),
        floor(col("mod_moved") * lit(1000000L) / col("n_docs")).as("mod_moved_ppm"),
        (col("hrw_moved") === col("__hrw_to_new")).as("moved_law_ok")
      )
      .orderBy(col("shard"))
  }

  val q150Oracle: String =
    """WITH sc AS MATERIALIZED (
      |  SELECT doc_id, s.range AS sh,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s.range AS VARCHAR)), 1, 15))::BIGINT AS sc
      |  FROM documents, range(0, 9) s
      |), a9 AS MATERIALIZED (
      |  SELECT doc_id, sh AS hrw9 FROM (
      |    SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, sh DESC) AS rn
      |    FROM sc) WHERE rn = 1
      |), a8 AS MATERIALIZED (
      |  SELECT doc_id, sh AS hrw8 FROM (
      |    SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, sh DESC) AS rn
      |    FROM sc WHERE sh < 8) WHERE rn = 1
      |), j AS MATERIALIZED (
      |  SELECT a9.doc_id, a8.hrw8, a9.hrw9,
      |    a9.doc_id % 8 AS mod8, a9.doc_id % 9 AS mod9
      |  FROM a9 JOIN a8 USING (doc_id)
      |), r AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CASE WHEN hrw8 <> hrw9 THEN 1 ELSE 0 END) AS BIGINT) AS hrw_moved,
      |    CAST(sum(CASE WHEN hrw9 = 8 THEN 1 ELSE 0 END) AS BIGINT) AS hrw_to_new,
      |    CAST(sum(CASE WHEN mod8 <> mod9 THEN 1 ELSE 0 END) AS BIGINT) AS mod_moved
      |  FROM j
      |), per AS (
      |  SELECT hrw9 AS shard, CAST(count(*) AS BIGINT) AS n_hrw FROM j GROUP BY 1
      |), perm AS (
      |  SELECT mod9 AS shard, CAST(count(*) AS BIGINT) AS n_mod FROM j GROUP BY 1
      |)
      |SELECT CAST(p.shard AS BIGINT) AS shard, p.n_hrw, COALESCE(m.n_mod, 0) AS n_mod,
      |  r.n_docs, r.hrw_moved,
      |  CAST(floor(r.hrw_moved * 1000000 / r.n_docs) AS BIGINT) AS hrw_moved_ppm,
      |  r.mod_moved,
      |  CAST(floor(r.mod_moved * 1000000 / r.n_docs) AS BIGINT) AS mod_moved_ppm,
      |  (r.hrw_moved = r.hrw_to_new) AS moved_law_ok
      |FROM per p LEFT JOIN perm m USING (shard), r
      |ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------- q151
  /** RE-SHARD DELTA PLAN — the incremental-export composition of q150's
    * rendezvous assignment with q116's associative digest laws: when
    * capacity goes 8 → 9 shards, each shard's new content digest is
    * derivable from the old one by SUBTRACTING the leavers and ADDING
    * the arrivers (sum mod 2^61−1) / XOR-ing both (bit_xor) — no
    * full-shard rescan, only the moved docs' digests touch the wire
    * (and under HRW the movers are ~1/9 of the corpus, q150's law).
    * Both update laws are verified against the from-scratch new-shard
    * digests and emitted as oracled booleans per shard, with the
    * stay/leave/arrive census.
    */
  def q151ReshardPlan(s: SparkSession, dir: String): DataFrame = {
    val assigned = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        TextStats.contentDigest60(col("text")).as("digest"),
        Rendezvous.assign(col("doc_id"), 8).as("old_shard"),
        Rendezvous.assign(col("doc_id"), 9).as("new_shard")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count() // eager: five aggregates share this cache
    val P = ExportPlan.DigestModulus
    def digestAgg(df: DataFrame, key: org.apache.spark.sql.Column, suffix: String): DataFrame =
      df.groupBy(key.as("shard"))
        .agg(
          count(lit(1)).as(s"n_$suffix"),
          (sum(col("digest").cast("decimal(38,0)")) % lit(P)).cast("long").as(s"sum_$suffix"),
          expr("bit_xor(digest)").as(s"xor_$suffix")
        )
    val movers = assigned.filter(col("old_shard") =!= col("new_shard"))
    val oldA = digestAgg(assigned, col("old_shard"), "old")
    val newA = digestAgg(assigned, col("new_shard"), "new")
    val leave = digestAgg(movers, col("old_shard"), "leave")
    val arrive = digestAgg(movers, col("new_shard"), "arrive")
    val stay = assigned
      .filter(col("old_shard") === col("new_shard"))
      .groupBy(col("new_shard").as("shard"))
      .agg(count(lit(1)).as("n_stay"))
    def z(c: String) = coalesce(col(c), lit(0L))
    newA
      .join(oldA, Seq("shard"), "left")
      .join(leave, Seq("shard"), "left")
      .join(arrive, Seq("shard"), "left")
      .join(stay, Seq("shard"), "left")
      .select(
        col("shard"),
        z("n_old").as("n_old"),
        col("n_new"),
        z("n_stay").as("n_stay"),
        z("n_leave").as("n_leave"),
        z("n_arrive").as("n_arrive"),
        (z("n_old") - z("n_leave") + z("n_arrive") === col("n_new")).as("count_law_ok"),
        (pmod(z("sum_old") - z("sum_leave") + z("sum_arrive"), lit(P)) === col("sum_new"))
          .as("sum_law_ok"),
        (z("xor_old").bitwiseXOR(z("xor_leave")).bitwiseXOR(z("xor_arrive")) === col("xor_new"))
          .as("xor_law_ok")
      )
      .orderBy(col("shard"))
  }

  val q151Oracle: String =
    """WITH sc AS MATERIALIZED (
      |  SELECT doc_id, s.range AS sh,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s.range AS VARCHAR)), 1, 15))::BIGINT AS sc
      |  FROM documents, range(0, 9) s
      |), a9 AS (
      |  SELECT doc_id, sh AS new_shard FROM (
      |    SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, sh DESC) AS rn
      |    FROM sc) WHERE rn = 1
      |), a8 AS (
      |  SELECT doc_id, sh AS old_shard FROM (
      |    SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, sh DESC) AS rn
      |    FROM sc WHERE sh < 8) WHERE rn = 1
      |), d AS MATERIALIZED (
      |  SELECT a9.doc_id, a8.old_shard, a9.new_shard,
      |    ('0x' || substr(md5(regexp_replace(trim(doc.text), '\s+', ' ', 'g')), 1, 15))::BIGINT AS digest
      |  FROM a9 JOIN a8 USING (doc_id) JOIN documents doc USING (doc_id)
      |), oldA AS (
      |  SELECT old_shard AS shard, CAST(count(*) AS BIGINT) AS n_old,
      |    CAST(sum(digest) % 2305843009213693951 AS BIGINT) AS sum_old,
      |    CAST(bit_xor(digest) AS BIGINT) AS xor_old
      |  FROM d GROUP BY 1
      |), newA AS (
      |  SELECT new_shard AS shard, CAST(count(*) AS BIGINT) AS n_new,
      |    CAST(sum(digest) % 2305843009213693951 AS BIGINT) AS sum_new,
      |    CAST(bit_xor(digest) AS BIGINT) AS xor_new
      |  FROM d GROUP BY 1
      |), lv AS (
      |  SELECT old_shard AS shard, CAST(count(*) AS BIGINT) AS n_leave,
      |    CAST(sum(digest) % 2305843009213693951 AS BIGINT) AS sum_leave,
      |    CAST(bit_xor(digest) AS BIGINT) AS xor_leave
      |  FROM d WHERE old_shard <> new_shard GROUP BY 1
      |), ar AS (
      |  SELECT new_shard AS shard, CAST(count(*) AS BIGINT) AS n_arrive,
      |    CAST(sum(digest) % 2305843009213693951 AS BIGINT) AS sum_arrive,
      |    CAST(bit_xor(digest) AS BIGINT) AS xor_arrive
      |  FROM d WHERE old_shard <> new_shard GROUP BY 1
      |), st AS (
      |  SELECT new_shard AS shard, CAST(count(*) AS BIGINT) AS n_stay
      |  FROM d WHERE old_shard = new_shard GROUP BY 1
      |)
      |SELECT CAST(n.shard AS BIGINT) AS shard,
      |  COALESCE(o.n_old, 0) AS n_old, n.n_new,
      |  COALESCE(st.n_stay, 0) AS n_stay,
      |  COALESCE(lv.n_leave, 0) AS n_leave,
      |  COALESCE(ar.n_arrive, 0) AS n_arrive,
      |  (COALESCE(o.n_old, 0) - COALESCE(lv.n_leave, 0) + COALESCE(ar.n_arrive, 0) = n.n_new)
      |    AS count_law_ok,
      |  (((COALESCE(o.sum_old, 0) - COALESCE(lv.sum_leave, 0) + COALESCE(ar.sum_arrive, 0))
      |     % 2305843009213693951 + 2305843009213693951) % 2305843009213693951 = n.sum_new)
      |    AS sum_law_ok,
      |  (xor(xor(COALESCE(o.xor_old, 0), COALESCE(lv.xor_leave, 0)), COALESCE(ar.xor_arrive, 0))
      |     = n.xor_new) AS xor_law_ok
      |FROM newA n
      |LEFT JOIN oldA o USING (shard)
      |LEFT JOIN lv USING (shard)
      |LEFT JOIN ar USING (shard)
      |LEFT JOIN st USING (shard)
      |ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------- q152
  /** DUP-SPAN WIDTH LADDER — how LONG is the verbatim copying: q141's
    * census at widths 5/10/20 gives the decay curve of duplicated-span
    * mass vs span length (long plateaus ⇒ templated boilerplate, fast
    * decay ⇒ incidental collocations) — the measurement that picks the
    * dedup width before anyone runs the q145 rewrite. Three linear
    * census passes, integer-only output.
    */
  def q152SpanWidthLadder(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Seq(5, 10, 20)
      .map { w =>
        NgramDup
          .docProfile(docs, "text", w, Seq("doc_id"))
          .agg(
            count(lit(1)).as("n_docs_spanned"),
            sum(col("n_spans")).as("total_spans"),
            sum(col("dup_spans")).as("dup_spans"),
            sum((col("dup_spans") > 0).cast("long")).as("n_docs_with_dup")
          )
          .select(
            lit(w.toLong).as("w"),
            col("n_docs_spanned"),
            col("total_spans"),
            col("dup_spans"),
            when(col("total_spans") > 0, floor(col("dup_spans") * lit(1000000L) / col("total_spans")))
              .otherwise(lit(0L)).as("dup_ppm"),
            col("n_docs_with_dup")
          )
      }
      .reduce(_ unionByName _)
      .orderBy(col("w"))
  }

  /** q152 replay: the q141 census algebra at each width, unioned. */
  val q152Oracle: String = {
    def rung(w: Int) =
      s"""SELECT CAST($w AS BIGINT) AS w,
         |  CAST(count(*) AS BIGINT) AS n_docs_spanned,
         |  CAST(sum(n_spans) AS BIGINT) AS total_spans,
         |  CAST(sum(dup_spans) AS BIGINT) AS dup_spans,
         |  CASE WHEN sum(n_spans) > 0
         |       THEN CAST(floor(sum(dup_spans) * 1000000 / sum(n_spans)) AS BIGINT) ELSE 0 END AS dup_ppm,
         |  CAST(sum(CASE WHEN dup_spans > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_dup
         |FROM (
         |  SELECT pd.doc_id,
         |    CAST(sum(pd.c_doc) AS BIGINT) AS n_spans,
         |    CAST(sum(CASE WHEN tot.c_all >= 2 THEN pd.c_doc ELSE 0 END) AS BIGINT) AS dup_spans
         |  FROM (
         |    SELECT doc_id, shingle, CAST(count(*) AS BIGINT) AS c_doc
         |    FROM (
         |      SELECT doc_id,
         |        unnest(list_transform(range(0, greatest(len(toks)-${w - 1}, 0)),
         |               i -> array_to_string(toks[i+1:i+$w], ' '))) AS shingle
         |      FROM t WHERE len(toks) >= $w
         |    ) GROUP BY doc_id, shingle
         |  ) pd
         |  JOIN (
         |    SELECT shingle, CAST(sum(c_doc) AS BIGINT) AS c_all FROM (
         |      SELECT doc_id, shingle, CAST(count(*) AS BIGINT) AS c_doc
         |      FROM (
         |        SELECT doc_id,
         |          unnest(list_transform(range(0, greatest(len(toks)-${w - 1}, 0)),
         |                 i -> array_to_string(toks[i+1:i+$w], ' '))) AS shingle
         |        FROM t WHERE len(toks) >= $w
         |      ) GROUP BY doc_id, shingle
         |    ) GROUP BY shingle
         |  ) tot USING (shingle)
         |  GROUP BY pd.doc_id
         |)""".stripMargin
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
       |)
       |${rung(5)}
       |UNION ALL
       |${rung(10)}
       |UNION ALL
       |${rung(20)}
       |ORDER BY w""".stripMargin
  }

  // ---------------------------------------------------------------- q153
  /** SOURCE-FAIR QUALITY FILTER — CCNet-style per-source quantile
    * normalization (Wenzek et al., "CCNet", LREC 2020 §3: thresholds
    * are applied per language/source on the score's *within-group
    * quantile*, not its raw value) vs the naive single global
    * threshold, head-to-head on the same corpus. Keep rule: top 30% BY
    * RANK, (a) within each source, (b) globally. Both rankings run on
    * [[graft.ops.Rank.rankWithin]]'s range-binned two-pass — no source
    * (or the whole corpus, for the global rank) ever funnels through a
    * single window task at 100 TB. Output is the per-source census:
    * the quantile rule keeps exactly ⌊0.3·n⌋ of EVERY source (the
    * fairness law, emitted as an oracled boolean), while the global
    * rule's per-source keep-rate spread (g_keep_ppm column) is the
    * measured unfairness the normalization exists to remove; both_kept
    * counts the overlap of the two policies.
    */
  def q153SourceFairFilter(s: SparkSession, dir: String): DataFrame = {
    val scored = TextStats
      .withQuality(Tables.documents(s, dir), "text")
      .select(col("doc_id"), col("source"), col("quality_score"))
    val perSrc = Rank.rankWithin(
      scored, Seq("source"), negate(col("quality_score")), col("doc_id"), "rs", bins = 64)
    val global = Rank
      .rankWithin(
        perSrc.withColumn("__g", lit(1)),
        Seq("__g"), negate(col("quality_score")), col("doc_id"), "rg", bins = 64)
      .drop("__g")
    val sizes = global.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val total = global.agg(count(lit(1)).as("nt"))
    global
      .join(broadcast(sizes), Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn("keep_q", col("rs") * lit(10L) <= col("ns") * lit(3L))
      .withColumn("keep_g", col("rg") * lit(10L) <= col("nt") * lit(3L))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep_q").cast("long")).as("q_kept"),
        sum(col("keep_g").cast("long")).as("g_kept"),
        sum((col("keep_q") && col("keep_g")).cast("long")).as("both_kept")
      )
      .select(
        col("source"),
        col("n_docs"),
        col("q_kept"),
        col("g_kept"),
        col("both_kept"),
        expr("q_kept * 1000000 div n_docs").as("q_keep_ppm"),
        expr("g_kept * 1000000 div n_docs").as("g_keep_ppm"),
        (col("q_kept") === expr("n_docs * 3 div 10")).as("fair_law_ok")
      )
      .orderBy(col("source"))
  }

  /** q153 replay: quality score re-derived closed-form (the q83
    * expression), both ranks as plain single-window row_number() — the
    * definition the two-pass provably equals — then the census algebra.
    */
  val q153Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), f AS (
      |  SELECT doc_id, source,
      |    0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) +
      |    0.3 * (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) +
      |    0.3 * least(CAST(len(toks) AS DOUBLE) / 200.0, 1.0) AS quality_score
      |  FROM t
      |), rk AS (
      |  SELECT doc_id, source, quality_score,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rs,
      |    CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rg,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns,
      |    CAST(count(*) OVER () AS BIGINT) AS nt
      |  FROM f
      |), agg AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CASE WHEN rs * 10 <= ns * 3 THEN 1 ELSE 0 END) AS BIGINT) AS q_kept,
      |    CAST(sum(CASE WHEN rg * 10 <= nt * 3 THEN 1 ELSE 0 END) AS BIGINT) AS g_kept,
      |    CAST(sum(CASE WHEN rs * 10 <= ns * 3 AND rg * 10 <= nt * 3 THEN 1 ELSE 0 END) AS BIGINT) AS both_kept
      |  FROM rk GROUP BY source
      |)
      |SELECT source, n_docs, q_kept, g_kept, both_kept,
      |  CAST(q_kept * 1000000 // n_docs AS BIGINT) AS q_keep_ppm,
      |  CAST(g_kept * 1000000 // n_docs AS BIGINT) AS g_keep_ppm,
      |  (q_kept = n_docs * 3 // 10) AS fair_law_ok
      |FROM agg ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q154
  /** EPOCH PLAN — the step after q144's UniMax token-budget allocation:
    * turn per-source token allocations into an actual reproducible
    * training epoch. Per source, docs are taken in the engine-portable
    * (portableHash(id), id) pseudo-shuffle order until the allocation
    * is spent (a doc is selected iff the running token total BEFORE it
    * is under the source's allocation — so allocations are always met,
    * overshooting by strictly less than one selected doc, the law the
    * output pins per source). Selected docs are then INTERLEAVED into
    * two epoch-global orders by epoch-salted hashes, and each source's
    * slice of each epoch order is certified with the q123 positional
    * digest (Σ pos·digest mod 2^61−1) plus the order-blind membership
    * digest — same membership every epoch, different certified order.
    *
    * Scale shape: the per-source running total is
    * [[graft.ops.ExportPlan.groupedPrefixSum]]'s two-pass (no
    * per-source single-task window); both epoch positions come from
    * [[graft.ops.Rank.rankWithin]]'s range-binned two-pass; the
    * allocation frame is |sources| rows broadcast. Everything on the
    * wire per doc is (hash, weight, digest) — 24 bytes.
    */
  def q154EpochPlan(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val plan = Mixture
      .tokenBudgetPlan(docs, "text", "source")
      .select(col("source"), col("n_tokens"), col("allocated"), col("saturated"))
    val prefix = ExportPlan.groupedPrefixSum(
      docs, "doc_id", size(TextStats.tokens(col("text"))).cast("long"), "source")
    val digests = docs.select(
      col("doc_id").as("id"), TextStats.contentDigest60(col("text")).as("digest"))
    val sel = prefix
      .join(broadcast(plan), Seq("source"))
      .filter(col("cum_before") < col("allocated"))
      .join(digests, Seq("id"))
      .withColumn("__g", lit(1))
    def epochHash(e: Int) =
      TextStats.portableHash(col("id") * lit(31L) + lit(e.toLong))
    val positioned = Rank
      .rankWithin(
        Rank.rankWithin(sel, Seq("__g"), epochHash(1), col("id"), "pos1", bins = 64),
        Seq("__g"), epochHash(2), col("id"), "pos2", bins = 64)
      .drop("__g")
    val P = ExportPlan.DigestModulus
    def orderTerm(pos: String) =
      (col(pos).cast("decimal(19,0)") * col("digest").cast("decimal(19,0)")) % lit(P)
    val perSource = positioned
      .withColumn("t1", orderTerm("pos1"))
      .withColumn("t2", orderTerm("pos2"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_sel"),
        sum(col("wt")).as("sel_tokens"),
        max(col("wt")).as("max_sel_wt"),
        (sum(col("digest").cast("decimal(38,0)")) % lit(P)).cast("long").as("member_digest"),
        (sum(col("t1")) % lit(P)).cast("long").as("order_digest_e1"),
        (sum(col("t2")) % lit(P)).cast("long").as("order_digest_e2")
      )
    plan
      .join(perSource, Seq("source"), "left")
      .select(
        col("source"),
        col("n_tokens"),
        col("allocated"),
        col("saturated"),
        coalesce(col("n_sel"), lit(0L)).as("n_sel"),
        coalesce(col("sel_tokens"), lit(0L)).as("sel_tokens"),
        (coalesce(col("sel_tokens"), lit(0L)) - col("allocated")).as("overshoot"),
        (
          (coalesce(col("n_sel"), lit(0L)) === 0 && col("allocated") === 0) ||
            (coalesce(col("sel_tokens"), lit(0L)) >= col("allocated") &&
              coalesce(col("sel_tokens"), lit(0L)) - col("allocated") < col("max_sel_wt"))
        ).as("alloc_law_ok"),
        coalesce(col("member_digest"), lit(0L)).as("member_digest"),
        coalesce(col("order_digest_e1"), lit(0L)).as("order_digest_e1"),
        coalesce(col("order_digest_e2"), lit(0L)).as("order_digest_e2")
      )
      .orderBy(col("source"))
  }

  /** q154 replay: the q144 waterfill chain verbatim, the per-source
    * prefix sum as the plain single-window definition groupedPrefixSum
    * provably equals, selection, two epoch-salted global row_numbers,
    * and the q123 HUGEINT digest algebra.
    */
  val q154Oracle: String =
    """WITH tk AS (
      |  SELECT CAST(source AS VARCHAR) AS source,
      |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source
      |), p AS (
      |  SELECT CAST(sum(n_tokens) * 9 // 10 AS BIGINT) AS budget,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM tk
      |), o AS (
      |  SELECT source, n_tokens,
      |    CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT) AS rk,
      |    CAST(sum(n_tokens) OVER (ORDER BY n_tokens, source
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS csum
      |  FROM tk
      |), cutc AS MATERIALIZED (
      |  SELECT o.*, p.budget, p.n,
      |    (o.n_tokens * (p.n - o.rk + 1) <= p.budget - (o.csum - o.n_tokens)) AS sat_test
      |  FROM o, p
      |), cut AS (
      |  SELECT COALESCE((SELECT min(rk) FROM cutc WHERE NOT sat_test),
      |                  (SELECT n + 1 FROM p)) AS cut
      |), lvl AS (
      |  SELECT c.cut,
      |    CASE WHEN c.cut <= p.n
      |         THEN (p.budget - COALESCE((SELECT max(csum) FROM cutc WHERE rk < c.cut), 0))
      |              // (p.n - c.cut + 1)
      |         ELSE 0 END AS level,
      |    CASE WHEN c.cut <= p.n
      |         THEN (p.budget - COALESCE((SELECT max(csum) FROM cutc WHERE rk < c.cut), 0))
      |              % (p.n - c.cut + 1)
      |         ELSE 0 END AS rem
      |  FROM cut c, p
      |), alloc AS MATERIALIZED (
      |  SELECT c.source, c.n_tokens,
      |    CAST(CASE WHEN c.rk < l.cut THEN c.n_tokens
      |         ELSE l.level + (CASE WHEN c.rk - l.cut < l.rem THEN 1 ELSE 0 END) END AS BIGINT)
      |      AS allocated,
      |    (c.rk < l.cut) AS saturated
      |  FROM cutc c, lvl l
      |), d AS (
      |  SELECT doc_id, CAST(source AS VARCHAR) AS source,
      |    (doc_id * 2654435761) % 1000003 AS h,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS wt,
      |    ('0x' || substr(md5(regexp_replace(trim(text), '\s+', ' ', 'g')), 1, 15))::BIGINT AS digest
      |  FROM documents
      |), c2 AS (
      |  SELECT *, SUM(wt) OVER (PARTITION BY source ORDER BY h, doc_id
      |       ROWS UNBOUNDED PRECEDING) - wt AS cum_before
      |  FROM d
      |), sel AS MATERIALIZED (
      |  SELECT c2.*, a.allocated FROM c2 JOIN alloc a USING (source)
      |  WHERE c2.cum_before < a.allocated
      |), pos AS (
      |  SELECT source, wt, digest,
      |    CAST(row_number() OVER (
      |      ORDER BY ((doc_id * 31 + 1) * 2654435761) % 1000003, doc_id) AS BIGINT) AS pos1,
      |    CAST(row_number() OVER (
      |      ORDER BY ((doc_id * 31 + 2) * 2654435761) % 1000003, doc_id) AS BIGINT) AS pos2
      |  FROM sel
      |), agg AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_sel,
      |    CAST(sum(wt) AS BIGINT) AS sel_tokens,
      |    CAST(max(wt) AS BIGINT) AS max_sel_wt,
      |    CAST(sum(CAST(digest AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS member_digest,
      |    CAST(SUM((CAST(pos1 AS HUGEINT) * digest) % 2305843009213693951)
      |         % 2305843009213693951 AS BIGINT) AS order_digest_e1,
      |    CAST(SUM((CAST(pos2 AS HUGEINT) * digest) % 2305843009213693951)
      |         % 2305843009213693951 AS BIGINT) AS order_digest_e2
      |  FROM pos GROUP BY source
      |)
      |SELECT a.source, a.n_tokens, a.allocated, a.saturated,
      |  COALESCE(g.n_sel, 0) AS n_sel,
      |  COALESCE(g.sel_tokens, 0) AS sel_tokens,
      |  COALESCE(g.sel_tokens, 0) - a.allocated AS overshoot,
      |  ((COALESCE(g.n_sel, 0) = 0 AND a.allocated = 0) OR
      |   (COALESCE(g.sel_tokens, 0) >= a.allocated AND
      |    COALESCE(g.sel_tokens, 0) - a.allocated < g.max_sel_wt)) AS alloc_law_ok,
      |  COALESCE(g.member_digest, 0) AS member_digest,
      |  COALESCE(g.order_digest_e1, 0) AS order_digest_e1,
      |  COALESCE(g.order_digest_e2, 0) AS order_digest_e2
      |FROM alloc a LEFT JOIN agg g USING (source)
      |ORDER BY a.source""".stripMargin

  // ---------------------------------------------------------------- q155
  /** LABEL-PROPAGATION COMMUNITIES (ops/LabelProp) — deterministic
    * synchronous min-tie LPA, 3 rounds over the symmetrized
    * part↔supplier co-occurrence graph (q96's edge set): the
    * community-structure complement to connected components (q51/q60
    * answer reachability; this answers dense attachment INSIDE one
    * component). Output is the community census — integer/string exact,
    * no floats anywhere. Oracle: the same three rounds unrolled as
    * CTEs by the same Scala loop shape as q96Oracle, so query and
    * oracle share the recurrence by construction.
    *
    * MEASURED FINDING (both SFs): on this dense BIPARTITE graph the
    * deterministic sync update collapses to exactly two side-pure
    * blocks (all parts / all suppliers) — the known synchronous-LPA
    * oscillation-absorption behavior on bipartite structure that
    * Raghavan et al. §3 flag (their cure is async order, which is
    * unreplayable; ours is to measure and certify the sync behavior).
    * `side_pure` pins it per community: labels only cross sides when
    * community structure beats side structure, and here it never does.
    */
  def q155LabelProp(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val edges = PageRank.symmetrize(
      li.select(
        concat(lit("p"), col("l_partkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst")
      ).distinct()
    )
    LabelProp
      .census(LabelProp.run(edges, iters = 3))
      .withColumn(
        "side_pure",
        substring(col("min_node"), 1, 1) === substring(col("max_node"), 1, 1))
      .orderBy(col("community"))
  }

  val q155Oracle: String = {
    val rounds = (1 to 3)
      .map { i =>
        s"""c$i AS (
           |  SELECT e.dst, p.label, CAST(count(*) AS BIGINT) AS c
           |  FROM e JOIN l${i - 1} p ON e.src = p.node
           |  GROUP BY e.dst, p.label
           |), l$i AS (
           |  SELECT dst AS node, min(label) AS label FROM (
           |    SELECT *, max(c) OVER (PARTITION BY dst) AS cmax FROM c$i
           |  ) WHERE c = cmax GROUP BY dst
           |)""".stripMargin
      }
      .mkString(", ")
    s"""WITH d AS (
       |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
       |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
       |  FROM lineitem
       |), e AS (
       |  SELECT src, dst FROM d UNION SELECT dst, src FROM d
       |), nodes AS (
       |  SELECT DISTINCT src AS node FROM e
       |), l0 AS (
       |  SELECT node, node AS label FROM nodes
       |), $rounds
       |SELECT label AS community, CAST(count(*) AS BIGINT) AS n_nodes,
       |  min(node) AS min_node, max(node) AS max_node,
       |  (substr(min(node), 1, 1) = substr(max(node), 1, 1)) AS side_pure
       |FROM l3 GROUP BY label ORDER BY community""".stripMargin
  }

  // ---------------------------------------------------------------- q156
  /** EPOCH SAMPLING-DRIFT AUDIT — did q154's hash-order token-budget
    * selection DISTORT what the model will see? Per source, the L1
    * distance (in ppm of each side's own token mass) between the full
    * corpus's and the selected epoch's frequency of the corpus-global
    * top-20 tokens, plus the worst-deviating token. A faithful uniform
    * subsample should show small ppm drift; a selection correlated
    * with content would show large — this is the audit that catches a
    * biased "pseudo-random" order (e.g. a hash correlated with doc
    * length) before an epoch ships. Integer-exact end to end: counts,
    * floor-ppm frequencies, absolute differences — no floats.
    *
    * Scale shape: one token explode over the corpus (the q137 cost
    * class), counts keyed on (source, token); the top-20 frame is
    * bounded model state joined by broadcast; selection membership is
    * the q154 two-pass prefix sum. Argmax token is max-dev + join-back
    * + min(token) — deterministic under ties.
    */
  def q156EpochDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val plan = Mixture
      .tokenBudgetPlan(docs, "text", "source")
      .select(col("source"), col("allocated"))
    val selIds = ExportPlan
      .groupedPrefixSum(docs, "doc_id", size(TextStats.tokens(col("text"))).cast("long"), "source")
      .join(broadcast(plan), Seq("source"))
      .filter(col("cum_before") < col("allocated"))
      .select(col("id").as("doc_id"))
    val toks = docs.select(
      col("doc_id"), col("source"), explode(TextStats.tokens(col("text"))).as("token"))
    val fullCnt = toks.groupBy(col("source"), col("token")).agg(count(lit(1)).as("full_cnt"))
    val selCnt = toks
      .join(selIds, Seq("doc_id"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("sel_cnt"))
    val fullTot = fullCnt.groupBy(col("source")).agg(sum(col("full_cnt")).as("full_tot"))
    val selTot = selCnt.groupBy(col("source")).agg(sum(col("sel_cnt")).as("sel_tot"))
    val topk = fullCnt
      .groupBy(col("token"))
      .agg(sum(col("full_cnt")).as("g_cnt"))
      .orderBy(col("g_cnt").desc, col("token"))
      .limit(20)
      .select(col("token"))
    val grid = fullTot
      .select(col("source"), col("full_tot"))
      .crossJoin(broadcast(topk))
      .join(fullCnt, Seq("source", "token"), "left")
      .join(selCnt, Seq("source", "token"), "left")
      .join(broadcast(selTot), Seq("source"))
      .select(
        col("source"),
        col("token"),
        expr("coalesce(full_cnt, 0) * 1000000 div full_tot").as("full_ppm"),
        expr("coalesce(sel_cnt, 0) * 1000000 div sel_tot").as("sel_ppm")
      )
      .withColumn("dev", abs(col("full_ppm") - col("sel_ppm")))
    val agg = grid
      .groupBy(col("source"))
      .agg(sum(col("dev")).as("l1_ppm"), max(col("dev")).as("max_dev_ppm"))
    val worst = grid
      .join(agg.select(col("source"), col("max_dev_ppm").as("dev")), Seq("source", "dev"))
      .groupBy(col("source"))
      .agg(min(col("token")).as("worst_token"))
    agg
      .join(worst, Seq("source"))
      .select(col("source"), col("l1_ppm"), col("max_dev_ppm"), col("worst_token"))
      .orderBy(col("source"))
  }

  /** q156 replay: the q154 waterfill + selection chain, then the token
    * censuses, the deterministic global top-20, and the ppm algebra.
    */
  val q156Oracle: String =
    """WITH tk AS (
      |  SELECT CAST(source AS VARCHAR) AS source,
      |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source
      |), p AS (
      |  SELECT CAST(sum(n_tokens) * 9 // 10 AS BIGINT) AS budget,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM tk
      |), o AS (
      |  SELECT source, n_tokens,
      |    CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT) AS rk,
      |    CAST(sum(n_tokens) OVER (ORDER BY n_tokens, source
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS csum
      |  FROM tk
      |), cutc AS MATERIALIZED (
      |  SELECT o.*, p.budget, p.n,
      |    (o.n_tokens * (p.n - o.rk + 1) <= p.budget - (o.csum - o.n_tokens)) AS sat_test
      |  FROM o, p
      |), cut AS (
      |  SELECT COALESCE((SELECT min(rk) FROM cutc WHERE NOT sat_test),
      |                  (SELECT n + 1 FROM p)) AS cut
      |), lvl AS (
      |  SELECT c.cut,
      |    CASE WHEN c.cut <= p.n
      |         THEN (p.budget - COALESCE((SELECT max(csum) FROM cutc WHERE rk < c.cut), 0))
      |              // (p.n - c.cut + 1)
      |         ELSE 0 END AS level,
      |    CASE WHEN c.cut <= p.n
      |         THEN (p.budget - COALESCE((SELECT max(csum) FROM cutc WHERE rk < c.cut), 0))
      |              % (p.n - c.cut + 1)
      |         ELSE 0 END AS rem
      |  FROM cut c, p
      |), alloc AS MATERIALIZED (
      |  SELECT c.source,
      |    CAST(CASE WHEN c.rk < l.cut THEN c.n_tokens
      |         ELSE l.level + (CASE WHEN c.rk - l.cut < l.rem THEN 1 ELSE 0 END) END AS BIGINT)
      |      AS allocated
      |  FROM cutc c, lvl l
      |), d AS (
      |  SELECT doc_id, CAST(source AS VARCHAR) AS source,
      |    (doc_id * 2654435761) % 1000003 AS h,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS wt
      |  FROM documents
      |), c2 AS (
      |  SELECT *, SUM(wt) OVER (PARTITION BY source ORDER BY h, doc_id
      |       ROWS UNBOUNDED PRECEDING) - wt AS cum_before
      |  FROM d
      |), selids AS MATERIALIZED (
      |  SELECT c2.doc_id FROM c2 JOIN alloc a USING (source)
      |  WHERE c2.cum_before < a.allocated
      |), tok AS MATERIALIZED (
      |  SELECT doc_id, CAST(source AS VARCHAR) AS source,
      |    unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents
      |), fullcnt AS MATERIALIZED (
      |  SELECT source, token, CAST(count(*) AS BIGINT) AS full_cnt
      |  FROM tok GROUP BY source, token
      |), selcnt AS MATERIALIZED (
      |  SELECT source, token, CAST(count(*) AS BIGINT) AS sel_cnt
      |  FROM tok JOIN selids USING (doc_id) GROUP BY source, token
      |), fulltot AS (
      |  SELECT source, CAST(sum(full_cnt) AS BIGINT) AS full_tot FROM fullcnt GROUP BY source
      |), seltot AS (
      |  SELECT source, CAST(sum(sel_cnt) AS BIGINT) AS sel_tot FROM selcnt GROUP BY source
      |), topk AS MATERIALIZED (
      |  SELECT token FROM (
      |    SELECT token, CAST(sum(full_cnt) AS BIGINT) AS g_cnt FROM fullcnt GROUP BY token
      |  ) ORDER BY g_cnt DESC, token LIMIT 20
      |), grid AS (
      |  SELECT ft.source, k.token,
      |    abs(COALESCE(fc.full_cnt, 0) * 1000000 // ft.full_tot -
      |        COALESCE(sc.sel_cnt, 0) * 1000000 // st.sel_tot) AS dev
      |  FROM fulltot ft
      |  CROSS JOIN topk k
      |  LEFT JOIN fullcnt fc ON fc.source = ft.source AND fc.token = k.token
      |  LEFT JOIN selcnt sc ON sc.source = ft.source AND sc.token = k.token
      |  JOIN seltot st ON st.source = ft.source
      |), agg AS (
      |  SELECT source, CAST(sum(dev) AS BIGINT) AS l1_ppm,
      |    CAST(max(dev) AS BIGINT) AS max_dev_ppm
      |  FROM grid GROUP BY source
      |)
      |SELECT a.source, a.l1_ppm, a.max_dev_ppm,
      |  (SELECT min(g.token) FROM grid g
      |   WHERE g.source = a.source AND g.dev = a.max_dev_ppm) AS worst_token
      |FROM agg a ORDER BY a.source""".stripMargin

  // ---------------------------------------------------------------- q157
  /** BANDED RANGE SELF-JOIN (ops/RangeJoin) — per customer, all pairs
    * of their orders placed within 30 days of each other (repeat-
    * purchase proximity), as a gap-week histogram. The DECLARATIVE form
    * of this query is an inequality-only self-join — Spark plans it as
    * a nested-loop O(n²) per customer; the banded form buckets the date
    * axis by the band width and turns it into ONE equi-join on
    * (customer, bucket) with the exact band predicate re-checked — the
    * emit-to-two-buckets construction produces every oriented pair
    * EXACTLY once (proof in the scaladoc), so no dedup pass. The oracle
    * IS the naive theta-join definition — equality of the two forms is
    * the whole check. RangeJoinSpec additionally pins exactly-once on
    * adversarial gaps (0, d, d+1) and that the plan contains no
    * nested-loop/cartesian operator.
    */
  def q157RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    RangeJoin
      .bandedSelfJoin(
        ord.select(col("o_custkey"), col("o_orderdate"), col("o_orderkey")),
        "o_custkey",
        datediff(col("o_orderdate"), lit("1970-01-01")),
        col("o_orderkey"),
        d = 30L
      )
      .groupBy(expr("gap div 7").as("gap_week"))
      .agg(
        count(lit(1)).as("n_pairs"),
        count_distinct(col("key")).as("n_customers"),
        min(col("gap")).as("min_gap"),
        max(col("gap")).as("max_gap")
      )
      .orderBy(col("gap_week"))
  }

  val q157Oracle: String =
    """WITH pairs AS (
      |  SELECT a.o_custkey AS key,
      |    date_diff('day', a.o_orderdate, b.o_orderdate) AS gap
      |  FROM orders a JOIN orders b
      |    ON a.o_custkey = b.o_custkey
      |   AND date_diff('day', a.o_orderdate, b.o_orderdate) BETWEEN 0 AND 30
      |   AND (a.o_orderdate < b.o_orderdate OR
      |        (a.o_orderdate = b.o_orderdate AND a.o_orderkey < b.o_orderkey))
      |)
      |SELECT CAST(gap // 7 AS BIGINT) AS gap_week,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(count(DISTINCT key) AS BIGINT) AS n_customers,
      |  CAST(min(gap) AS BIGINT) AS min_gap,
      |  CAST(max(gap) AS BIGINT) AS max_gap
      |FROM pairs GROUP BY 1 ORDER BY gap_week""".stripMargin

  // ---------------------------------------------------------------- q158
  /** RETENTION COHORT MATRIX — the classic product-analytics rollup
    * over the events stream: users cohorted by their FIRST PURCHASE
    * day, matrix cell (cohort, k) = distinct users of that cohort who
    * purchased again on day cohort+k, with retention in ppm of the
    * cohort size. Day index is integer epoch-day (µs div 86400e6) —
    * exact in any engine, no calendar/timezone semantics to disagree
    * on; the purchase filter reaches the parquet scan (PushedFilters).
    * The all-events weekly variant is degenerate on this corpus (every
    * user is active every week — 1e6 ppm everywhere); purchases at
    * daily grain are genuinely sparse (~0.38 purchase-days per user-
    * day), so the matrix carries real decay. Three keyed aggregates:
    * (user, day) distinct activity, per-user min (the cohort), then
    * the (cohort, k) matrix — all shuffles on fine keys, cohort sizes
    * broadcast back.
    */
  def q158Retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("(ts_ns div 1000) div 86400000000").as("day"))
      .distinct()
    val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val sizes = cohort.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
    ev.join(cohort, Seq("user_id"))
      .withColumn("k", col("day") - col("cohort_day"))
      .groupBy(col("cohort_day"), col("k"))
      .agg(count_distinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(
        col("cohort_day"),
        col("k"),
        col("n_active"),
        col("cohort_size"),
        expr("n_active * 1000000 div cohort_size").as("retention_ppm")
      )
      .orderBy(col("cohort_day"), col("k"))
  }

  val q158Oracle: String =
    """WITH a AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id
      |), s AS (
      |  SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size FROM c GROUP BY cohort_day
      |), m AS (
      |  SELECT c.cohort_day, a.day - c.cohort_day AS k,
      |    CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
      |  FROM a JOIN c USING (user_id) GROUP BY 1, 2
      |)
      |SELECT CAST(m.cohort_day AS BIGINT) AS cohort_day, CAST(m.k AS BIGINT) AS k,
      |  m.n_active, s.cohort_size,
      |  CAST(m.n_active * 1000000 // s.cohort_size AS BIGINT) AS retention_ppm
      |FROM m JOIN s USING (cohort_day)
      |ORDER BY cohort_day, k""".stripMargin

  // ---------------------------------------------------------------- q159
  /** PIVOT — the wide-format rollup surface: events per day × event
    * type as columns (the report shape BI tools emit). Uses Spark's
    * `.pivot(col, values)` WITH the explicit value list — omitting it
    * costs an extra distinct-scan job AND makes the output schema
    * data-dependent, which no 100 TB pipeline should ship; with the
    * list it is a single groupBy producing conditional aggregates.
    * Missing cells are 0, not null (a day with no errors HAS zero
    * errors — the count semantics), plus a total and the argmax type
    * per day (tie → alphabetically first, deterministic). Oracle:
    * the same matrix as CASE-WHEN conditional sums.
    */
  def q159Pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = Tables
      .events(s, dir)
      .select(expr("(ts_ns div 1000) div 86400000000").as("day"), col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    val filled = types.foldLeft(wide)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
    val totals = types.map(col).reduce(_ + _)
    val best = types
      .map(t => struct(col(t).as("c"), lit(t).as("t")))
      .reduce((a, b) => when(b("c") > a("c"), b).otherwise(a)) // ties keep the earlier (alphabetical) type
    filled
      .select(
        (col("day") +: types.map(col)) :+
          totals.as("total") :+
          best.getField("t").as("top_type"): _*
      )
      .orderBy(col("day"))
  }

  val q159Oracle: String = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cells = types
      .map(t => s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
      .mkString(",\n      |  ")
    // replay the left-fold argmax exactly: strictly-greater replaces,
    // so ties keep the alphabetically-earlier type
    val argmax = types
      .map(t => s"struct_pack(c := $t, t := '$t')")
      .reduceLeft((a, b) => s"(CASE WHEN ($b).c > ($a).c THEN $b ELSE $a END)")
    s"""WITH w AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day,
       |  $cells
       |  FROM events GROUP BY 1
       |)
       |SELECT CAST(day AS BIGINT) AS day, ${types.mkString(", ")},
       |  ${types.mkString(" + ")} AS total,
       |  ($argmax).t AS top_type
       |FROM w ORDER BY day""".stripMargin
  }

  // ---------------------------------------------------------------- q160
  /** BLOCKED EDIT-DISTANCE FUZZY MATCH — the record-linkage dedup
    * method the near-dup fleet was still missing: token/shingle
    * (MinHash, q27), bitwise (SimHash, q30-adjacent), embedding (q78),
    * perceptual (q149) — and now CHARACTER-level Levenshtein, the
    * classic for typo-grade duplicates. All-pairs levenshtein is
    * O(n^2 L^2) with no index — dead at any scale — so the pipeline is
    * the standard record-linkage order: DEDUPE first (distinct name
    * catalog with occurrence counts), BLOCK cheap (first token), exact
    * distance only on in-block candidate pairs, then weight results
    * back by occurrence products. Output: the distance histogram over
    * candidate name pairs with the deterministic closest pair and the
    * part-level pair mass each bucket represents. Measured on this
    * catalog: 64 distinct names over 2000 parts — dedup-first turns
    * 31k raw part pairs into a few hundred name pairs.
    */
  def q160FuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val names = Tables
      .part(s, dir)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("occ"))
      .withColumn("block", split(col("name"), " ").getItem(0))
    val a = names.select(col("block"), col("name").as("a_name"), col("occ").as("a_occ"))
    val b = names.select(col("block"), col("name").as("b_name"), col("occ").as("b_occ"))
    val pairs = a
      .join(b, Seq("block"))
      .filter(col("a_name") < col("b_name"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
    pairs
      .withColumn("bucket", expr("dist div 3"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_name_pairs"),
        min(col("dist")).as("min_dist"),
        max(col("dist")).as("max_dist"),
        sum(col("a_occ") * col("b_occ")).as("part_pair_mass"),
        min(struct(col("dist"), col("a_name"), col("b_name"))).getField("a_name").as("closest_a"),
        min(struct(col("dist"), col("a_name"), col("b_name"))).getField("b_name").as("closest_b")
      )
      .orderBy(col("bucket"))
  }

  val q160Oracle: String =
    """WITH n AS (
      |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS occ,
      |    string_split(p_name, ' ')[1] AS block
      |  FROM part GROUP BY p_name
      |), pr AS MATERIALIZED (
      |  SELECT a.name AS a_name, b.name AS b_name, a.occ AS a_occ, b.occ AS b_occ,
      |    levenshtein(a.name, b.name) AS dist
      |  FROM n a JOIN n b ON a.block = b.block AND a.name < b.name
      |)
      |SELECT CAST(dist // 3 AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_name_pairs,
      |  CAST(min(dist) AS BIGINT) AS min_dist,
      |  CAST(max(dist) AS BIGINT) AS max_dist,
      |  CAST(sum(a_occ * b_occ) AS BIGINT) AS part_pair_mass,
      |  (min(struct_pack(d := dist, a := a_name, b := b_name))).a AS closest_a,
      |  (min(struct_pack(d := dist, a := a_name, b := b_name))).b AS closest_b
      |FROM pr GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q161
  /** ROLLUP + GROUPING_ID — the subtotal-report surface (CUBE's
    * ordered sibling, q62's complement): lineitem quantity/revenue by
    * (returnflag, linestatus) with per-flag subtotals and a grand
    * total in ONE aggregate; `grouping_id` disambiguates a real NULL
    * group from a subtotal row (the correctness trap of naive
    * NULL-keyed subtotals). Decimal sums — exact under any
    * partitioning. Spark plans rollup as a single Expand + one hash
    * aggregate: subtotals cost one pass, not three unions.
    */
  def q161Rollup(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        grouping_id(col("l_returnflag"), col("l_linestatus")).as("gid")
      )
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  val q161Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q162
  /** SIX-WAY JOIN (TPC-H Q5 shape) — local-supplier revenue by nation
    * within one region: lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈
    * nation ⋈ region with the same-nation (c_nationkey = s_nationkey)
    * correlation. The optimizer showcase: every dimension side is
    * broadcast and the region filter prunes nation keys BEFORE any
    * fact work. At the test SF even orders fits under the broadcast
    * threshold (the dump shows 5 BroadcastHashJoins, zero shuffle
    * joins); at 100 TB the lineitem ⋈ orders edge becomes the single
    * fact-fact shuffle on orderkey while the dims keep riding
    * broadcast — the join order a big plan needs either way.
    * Decimal-exact revenue via the dsum discipline.
    */
  def q162SixWayJoin(s: SparkSession, dir: String): DataFrame = {
    val nations = Tables
      .nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    Tables
      .lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(
        broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue")
      )
      .orderBy(col("n_name"))
  }

  val q162Oracle: String =
    """SELECT n_name, CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q163
  /** EXISTS → SEMI JOIN (TPC-H Q4 shape) — orders per priority that
    * have at least one LATE lineitem (shipped after the order date).
    * The correlated-EXISTS surface: declaratively a subquery per order,
    * physically ONE left-semi join carrying the correlation predicate
    * (l_shipdate > o_orderdate) as the join condition — the rewrite
    * that makes EXISTS linear instead of nested-loop. Semi means
    * multiplicity-proof: an order with five late lines counts once.
    */
  def q163ExistsLate(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord
      .join(
        li,
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val q163Oracle: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q164
  /** PER-GROUP SCALAR AVERAGE FILTER (TPC-H Q17 shape) — lineitems
    * whose quantity is under 20% of their part's average quantity
    * (the small-order tail), total count + revenue. The scalar-
    * subquery surface, executed scale-correctly: the per-part averages
    * are ONE bounded aggregate (|parts| rows) broadcast back — never a
    * correlated per-row subquery. The 20%-of-average comparison is
    * EXACT-rational (qty · 5 · cnt < Σqty, integer-valued doubles both
    * sides) — no division, no float threshold to disagree on.
    */
  def q164ScalarAvg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val avgs = li
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
    li.join(broadcast(avgs), Seq("l_partkey"))
      .filter(col("l_quantity") * lit(5) * col("cnt") < col("sum_qty"))
      .agg(
        count(lit(1)).as("n_small"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("small_revenue")
      )
  }

  val q164Oracle: String =
    """WITH a AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt, sum(l_quantity) AS sum_qty
      |  FROM lineitem GROUP BY l_partkey
      |)
      |SELECT CAST(count(*) AS BIGINT) AS n_small,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS small_revenue
      |FROM lineitem JOIN a USING (l_partkey)
      |WHERE l_quantity * 5 * cnt < sum_qty""".stripMargin

  // ---------------------------------------------------------------- q165
  /** NOT IN vs NOT EXISTS under NULLs — the three-valued-logic trap
    * certified differentially: a NOT IN list containing a single NULL
    * makes the predicate UNKNOWN for every non-member (never TRUE), so
    * the count is exactly 0 — silently dropping ALL rows, the classic
    * production data-loss bug; NOT EXISTS and the null-filtered NOT IN
    * are the correct rewrites and must agree. The NULL is injected
    * with nullif(n_nationkey, 3), so customers of nation 3 are the
    * surviving set. Both engines implement standard 3VL — the oracle
    * is the SAME SQL, and the law booleans (empty-under-null,
    * rewrites-agree) are pinned TRUE. Uses the spark.sql surface
    * (subqueries are first-class there).
    */
  def q165NotInNulls(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("cust_nin")
    Tables.nation(s, dir).createOrReplaceTempView("nat_nin")
    s.sql("""
      SELECT *,
        (cnt_not_in_with_null = 0) AS null_empties_not_in,
        (cnt_not_exists = cnt_not_in_filtered) AS rewrites_agree
      FROM (
        SELECT
          (SELECT count(*) FROM cust_nin
           WHERE c_nationkey NOT IN (SELECT nullif(n_nationkey, 3) FROM nat_nin))
            AS cnt_not_in_with_null,
          (SELECT count(*) FROM cust_nin c
           WHERE NOT EXISTS (SELECT 1 FROM nat_nin n
                             WHERE nullif(n.n_nationkey, 3) = c.c_nationkey))
            AS cnt_not_exists,
          (SELECT count(*) FROM cust_nin
           WHERE c_nationkey NOT IN (SELECT nullif(n_nationkey, 3) FROM nat_nin
                                     WHERE nullif(n_nationkey, 3) IS NOT NULL))
            AS cnt_not_in_filtered
      )""")
  }

  val q165Oracle: String =
    """SELECT *,
      |  (cnt_not_in_with_null = 0) AS null_empties_not_in,
      |  (cnt_not_exists = cnt_not_in_filtered) AS rewrites_agree
      |FROM (
      |  SELECT
      |    (SELECT CAST(count(*) AS BIGINT) FROM customer
      |     WHERE c_nationkey NOT IN (SELECT nullif(n_nationkey, 3) FROM nation))
      |      AS cnt_not_in_with_null,
      |    (SELECT CAST(count(*) AS BIGINT) FROM customer c
      |     WHERE NOT EXISTS (SELECT 1 FROM nation n
      |                       WHERE nullif(n.n_nationkey, 3) = c.c_nationkey))
      |      AS cnt_not_exists,
      |    (SELECT CAST(count(*) AS BIGINT) FROM customer
      |     WHERE c_nationkey NOT IN (SELECT nullif(n_nationkey, 3) FROM nation
      |                               WHERE nullif(n_nationkey, 3) IS NOT NULL))
      |      AS cnt_not_in_filtered
      |)""".stripMargin

  // ---------------------------------------------------------------- q166
  /** NULL-SAFE JOIN SEMANTICS (`<=>` vs `=`) — the other 3VL join
    * trap, certified differentially: plain `=` drops null keys from an
    * inner join entirely (UNKNOWN is not TRUE), while the null-safe
    * operator (`<=>` in Spark, IS NOT DISTINCT FROM in SQL) matches
    * null with null. Nulls are injected by nulling out one nation key
    * on each side; the law column pins the exact relationship:
    * null-safe matches = equi matches + (left nulls × right nulls).
    * This is the semantics Rank.rankWithin and the upsert merges rely
    * on (null group keys must not vanish) — here it gets its own
    * oracled certificate.
    */
  def q166NullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables
      .customer(s, dir)
      .select(nullif(col("c_nationkey"), lit(3)).as("ck"))
    val sup = Tables
      .supplier(s, dir)
      .select(nullif(col("s_nationkey"), lit(3)).as("sk"))
    val equi = c.join(sup, col("ck") === col("sk")).agg(count(lit(1)).as("n_equi"))
    val nsafe = c.join(sup, col("ck") <=> col("sk")).agg(count(lit(1)).as("n_null_safe"))
    val nulls = c
      .agg(sum(col("ck").isNull.cast("long")).as("c_nulls"))
      .crossJoin(sup.agg(sum(col("sk").isNull.cast("long")).as("s_nulls")))
    equi
      .crossJoin(nsafe)
      .crossJoin(nulls)
      .select(
        col("n_equi"),
        col("n_null_safe"),
        col("c_nulls"),
        col("s_nulls"),
        (col("n_null_safe") === col("n_equi") + col("c_nulls") * col("s_nulls"))
          .as("null_block_law_ok")
      )
  }

  val q166Oracle: String =
    """WITH c AS (SELECT nullif(c_nationkey, 3) AS ck FROM customer),
      |s AS (SELECT nullif(s_nationkey, 3) AS sk FROM supplier),
      |e AS (SELECT CAST(count(*) AS BIGINT) AS n_equi FROM c JOIN s ON ck = sk),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_null_safe
      |      FROM c JOIN s ON ck IS NOT DISTINCT FROM sk),
      |z AS (SELECT CAST(sum(CASE WHEN ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nulls FROM c),
      |y AS (SELECT CAST(sum(CASE WHEN sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_nulls FROM s)
      |SELECT e.n_equi, n.n_null_safe, z.c_nulls, y.s_nulls,
      |  (n.n_null_safe = e.n_equi + z.c_nulls * y.s_nulls) AS null_block_law_ok
      |FROM e, n, z, y""".stripMargin

  // ---------------------------------------------------------------- q167
  /** SWEEP-LINE PEAK CONCURRENCY — daily maximum number of
    * simultaneously-open user sessions, via the distributed ordered
    * prefix sum ([[graft.ops.Sweep.orderedPrefixSum]]).
    *
    * Sessions are q37's law (30-minute inactivity gap on the exact ns
    * longs); each session is active over the half-open interval
    * [first_event, last_event + 30 min). The sweep turns intervals into
    * (+1, −1) deltas, pre-aggregates them per (t, sign) so the order key
    * is total (sign −1 sorts before +1 ⇒ closings apply before openings
    * at the same instant), and takes the GLOBAL running sum of net
    * deltas — on Spark via the range-binned two-pass (no single-task
    * global window; same scale cure as q113/q117), in the oracle as the
    * plain single window the two-pass must equal. Peak per UTC day +
    * the earliest instant that day reaching it.
    *
    * Scale: the delta relation is 2·|sessions| rows of 3 columns; the
    * only full-data shuffle is the per-bin window. The all-deltas-at-
    * one-instant worst case degrades to ties sharing a bin (measured in
    * SweepSpec), exactly where the plain window puts them.
    */
  def q167PeakConcurrency(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val GapNs = 1800000000000L
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"), col("ts_ns"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = ev
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
      .withColumn(
        "is_new",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > GapNs, 1L).otherwise(0L)
      )
      .withColumn("sid", sum(col("is_new")).over(wr))
    val iv = sess
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_ns")).as("s"), (max(col("ts_ns")) + lit(GapNs)).as("e"))
    val deltas = iv
      .select(col("s").as("t"), lit(1L).as("sign"))
      .unionByName(iv.select(col("e").as("t"), lit(-1L).as("sign")))
      .groupBy(col("t"), col("sign"))
      .agg(sum(col("sign")).as("net"))
    val run = graft.ops.Sweep
      .orderedPrefixSum(deltas, Nil, col("t"), col("sign"), col("net"), "level")
      .withColumn("day", to_date(expr("timestamp_micros(t div 1000)")))
    val peaks = run
      .groupBy(col("day"))
      .agg(max(col("level")).as("peak"))
      .withColumnRenamed("day", "__pd")
    run
      .join(broadcast(peaks), col("day") === col("__pd") && col("level") === col("peak"))
      .groupBy(col("day"), col("peak"))
      .agg(min(col("t")).as("first_peak_t_ns"))
      .select(
        col("day").cast("string").as("day"),
        col("peak").cast("long").as("peak"),
        col("first_peak_t_ns").cast("long").as("first_peak_t_ns")
      )
      .orderBy(col("day"))
  }

  val q167Oracle: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS t FROM events),
      |m AS (SELECT user_id, event_id, t,
      |        lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pt
      |      FROM e),
      |sid AS (SELECT user_id, t,
      |        SUM(CASE WHEN pt IS NULL OR t - pt > 1800000000000 THEN 1 ELSE 0 END)
      |          OVER (PARTITION BY user_id ORDER BY t, event_id
      |                ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM m),
      |iv AS (SELECT user_id, sid, MIN(t) AS s, MAX(t) + 1800000000000 AS e
      |       FROM sid GROUP BY user_id, sid),
      |d AS (SELECT s AS t, CAST(1 AS BIGINT) AS sign FROM iv
      |      UNION ALL SELECT e AS t, CAST(-1 AS BIGINT) AS sign FROM iv),
      |nd AS (SELECT t, sign, SUM(sign) AS net FROM d GROUP BY t, sign),
      |r AS (SELECT t, SUM(net) OVER (ORDER BY t, sign ROWS UNBOUNDED PRECEDING) AS level
      |      FROM nd),
      |dd AS (SELECT CAST(make_timestamp(t // 1000) AS DATE) AS day, t, level FROM r),
      |p AS (SELECT day, MAX(level) AS peak FROM dd GROUP BY day)
      |SELECT CAST(p.day AS VARCHAR) AS day, CAST(p.peak AS BIGINT) AS peak,
      |  CAST(MIN(dd.t) AS BIGINT) AS first_peak_t_ns
      |FROM dd JOIN p ON dd.day = p.day AND dd.level = p.peak
      |GROUP BY p.day, p.peak
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q168
  /** SKYLINE (Pareto frontier) — parts not dominated on (size ↑,
    * retail price ↓): a part is dominated if another part has size ≥
    * AND price ≤ with at least one strict. The oracle IS the textbook
    * O(n²) NOT EXISTS dominance definition; the Spark plan is the
    * scale-correct decomposition for a 2-D skyline with one
    * bounded-cardinality dimension:
    *
    *  1. per-size best price — one map-side-combined aggregate collapses
    *     the full table to |distinct sizes| rows (p_size is a bounded
    *     physical attribute; the aggregate output is O(50) regardless of
    *     row count);
    *  2. frontier = candidates whose best price strictly beats the
    *     running min over all STRICTLY larger sizes — a window over the
    *     tiny aggregated relation (single partition of ~50 rows by
    *     construction, not a data-volume window);
    *  3. broadcast the frontier back to count the parts sitting exactly
    *     on each frontier point (same-size-worse-price parts are
    *     dominated by their own size's best, so only exact hits count).
    *
    * For high-cardinality dimensions this degenerates and a grid-cell
    * pruning pass would replace step 1 — documented, not needed for a
    * physical attribute like size.
    */
  def q168Skyline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(s, dir)
    val pts = p.groupBy(col("p_size")).agg(min(col("p_retailprice")).as("best_price"))
    // exclusive running min over strictly larger sizes: desc order,
    // rows frame ending one before current — equal sizes cannot appear
    // (pts is one row per size)
    val w = Window
      .orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = pts
      .withColumn("min_above", min(col("best_price")).over(w))
      .where(col("min_above").isNull || col("best_price") < col("min_above"))
      .select(col("p_size").as("f_size"), col("best_price"))
    p.join(
      broadcast(frontier),
      col("p_size") === col("f_size") && col("p_retailprice") === col("best_price")
    ).groupBy(col("f_size"), col("best_price"))
      .agg(count(lit(1)).as("n_parts"))
      .select(col("f_size").as("p_size"), col("best_price"), col("n_parts"))
      .orderBy(col("p_size"))
  }

  val q168Oracle: String =
    """WITH pts AS (SELECT p_size, MIN(p_retailprice) AS best_price
      |             FROM part GROUP BY p_size),
      |f AS (SELECT pts.p_size, pts.best_price FROM pts
      |      WHERE NOT EXISTS (
      |        SELECT 1 FROM part q
      |        WHERE q.p_size >= pts.p_size AND q.p_retailprice <= pts.best_price
      |          AND (q.p_size > pts.p_size OR q.p_retailprice < pts.best_price)))
      |SELECT f.p_size, f.best_price, CAST(COUNT(*) AS BIGINT) AS n_parts
      |FROM f JOIN part p ON p.p_size = f.p_size AND p.p_retailprice = f.best_price
      |GROUP BY f.p_size, f.best_price
      |ORDER BY f.p_size""".stripMargin

  // ---------------------------------------------------------------- q169
  // shared between the Spark query and its oracle so the two synthesized
  // "source systems" can never drift
  private val ErFirsts = Seq(
    "ana", "boris", "carla", "dmitri", "elena", "farid", "greta", "hugo",
    "ines", "jonas", "karim", "lena", "mara", "nils", "olga", "pavel")
  private val ErLasts = Seq(
    "adler", "becker", "castro", "dietrich", "eriksen", "fischer",
    "garcia", "hansen", "ibrahim", "jansen", "keller", "lorenz",
    "meyer", "novak", "okafor", "petrov")

  /** ENTITY RESOLUTION capstone ([[graft.ops.EntityRes]]): two
    * deterministic "source systems" are synthesized from the customer
    * keys (q18/q121 discipline — identical derivations on both
    * engines, so the oracle replays the WHOLE pipeline, zero literals):
    * system A holds every entity with a dictionary name (md5-nibble
    * indexed) and a '(xxx) xxx-xxxx' phone; system B re-records every
    * third entity with 'xxx.xxx.xxxx' formatting and planted noise —
    * one-char last-name deletions, off-by-one phone digits, and a
    * both-keys-noisy hard class that NO blocking pass can recover.
    *
    * Pipeline: normalize (digits-only phones) → two blocking passes
    * (first-initial + phone-last-4; exact last name) →
    * levenshtein scoring (full name ≤ 2 AND phone digits ≤ 1) →
    * star-contraction components → single-row audit certificate with
    * MEASURED precision/recall ppm against the planted truth (recall
    * < 1e6 by construction: the hard class is the blocking lesson).
    *
    * Scale: each blocking pass is one equi join on a short key;
    * candidates are block-local (no O(n²)); scoring is map-side;
    * clustering is the O(log n) Components. Salting composes for hot
    * name blocks (EntityRes scaladoc).
    */
  def q169EntityResolution(s: SparkSession, dir: String): DataFrame = {
    val firstArr = array(ErFirsts.map(lit): _*)
    val lastArr = array(ErLasts.map(lit): _*)
    val base = Tables
      .customer(s, dir)
      .select(col("c_custkey").as("k"))
      .withColumn(
        "fi",
        expr("cast(conv(substring(md5(concat('fn:', cast(k as string))),1,1),16,10) as int)"))
      .withColumn(
        "li",
        expr("cast(conv(substring(md5(concat('ln:', cast(k as string))),1,1),16,10) as int)"))
      .withColumn("first", element_at(firstArr, col("fi") + 1))
      .withColumn("last0", element_at(lastArr, col("li") + 1))
      .withColumn("d", lpad(((col("k") * 48271L) % 10000000000L).cast("string"), 10, "0"))
    val a = base.select(
      (col("k") * 2).as("a_id"),
      col("k").as("a_k"),
      col("first").as("a_first"),
      col("last0").as("a_last"),
      concat(
        lit("("), substring(col("d"), 1, 3), lit(") "),
        substring(col("d"), 4, 3), lit("-"), substring(col("d"), 7, 4)).as("a_phone")
    )
    val b = base
      .where(col("k") % 3 === 0)
      .withColumn("v", expr("(k div 3) % 3"))
      .withColumn("p", expr("cast(1 + (k % (length(last0) - 1)) as int)"))
      .withColumn(
        "lastB",
        when(col("v") === 1, expr("concat(substring(last0, 1, p - 1), substring(last0, p + 1))"))
          .otherwise(col("last0")))
      .withColumn(
        "alter_phone",
        col("v") === 2 || (col("v") === 1 && col("k") % 5 === 0))
      // the hard (both-keys-noisy) class must hit the last-4 digit block
      // or the phone pass still recovers it: v=1 ∧ k%5=0 targets 7..10
      .withColumn(
        "q",
        expr(
          "cast(case when v = 1 and k % 5 = 0 then 7 + ((k div 5) % 4) else 1 + (k % 10) end as int)"))
      .withColumn(
        "dB",
        when(
          col("alter_phone"),
          expr(
            "concat(substring(d, 1, q - 1), cast((cast(substring(d, q, 1) as int) + 1) % 10 as string), substring(d, q + 1))"))
          .otherwise(col("d")))
      .select(
        (col("k") * 2 + 1).as("b_id"),
        col("k").as("b_k"),
        col("first").as("b_first"),
        col("lastB").as("b_last"),
        concat_ws(
          ".", substring(col("dB"), 1, 3), substring(col("dB"), 4, 3),
          substring(col("dB"), 7, 4)).as("b_phone")
      )
    // normalize: phones to digits only (the two systems format differently)
    val aN = a.withColumn("a_digits", regexp_replace(col("a_phone"), "[^0-9]", ""))
    val bN = b.withColumn("b_digits", regexp_replace(col("b_phone"), "[^0-9]", ""))
    // pass 2 compounds the 16-value last name with a 2-digit phone prefix:
    // a bare name key is a HOT BLOCK (fixed 16-way cardinality ⇒ block
    // sizes grow linearly with the corpus ⇒ quadratic candidates — the
    // exact failure the EntityRes scaladoc warns about, measured here as
    // 25-38 s at sf0.1 before the compound key). A phone-prefix digit
    // altered by the noise (q ≤ 2) is covered by pass 1, so the compound
    // key changes candidate VOLUME, not the recovered set.
    val cand = graft.ops.EntityRes
      .blockedCandidates(
        aN, bN, "a_id", "b_id",
        Seq(
          (concat(substring(col("a_first"), 1, 1), substring(col("a_digits"), 7, 4)),
           concat(substring(col("b_first"), 1, 1), substring(col("b_digits"), 7, 4))),
          (concat(col("a_last"), substring(col("a_digits"), 1, 2)),
           concat(col("b_last"), substring(col("b_digits"), 1, 2)))
        )
      )
      .persist()
    // bounded_levenshtein(a,b,k) <= k ⟺ levenshtein(a,b) <= k
    // (BoundedLevenshteinSpec pins it) — the banded DP scores the
    // candidate pairs 3.7x faster than the full-matrix builtin
    // (graft.ExprBench), and the oracle keeps the plain form
    val matches = cand
      .where(
        expr("bounded_levenshtein(concat(a_first, ' ', a_last), " +
          "concat(b_first, ' ', b_last), 2) <= 2") &&
          expr("bounded_levenshtein(a_digits, b_digits, 1) <= 1")
      )
      .persist()
    val cl = graft.ops.EntityRes.clusters(matches, "a_id", "b_id")
    val clStats = cl
      .select(col("component"), col("cluster_size"))
      .distinct()
      .agg(
        count(lit(1)).as("n_clusters"),
        max(col("cluster_size")).as("max_cluster"))
    val counts = aN
      .agg(count(lit(1)).as("n_a"))
      .crossJoin(bN.agg(count(lit(1)).as("n_b")))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(
        matches.agg(
          count(lit(1)).as("n_matches"),
          sum((col("b_k") === col("a_k")).cast("long")).as("true_matches")))
      .crossJoin(clStats)
    counts.select(
      col("n_a"),
      col("n_b"),
      col("n_candidates"),
      col("n_matches"),
      col("true_matches"),
      expr("cast(case when n_matches = 0 then null else (true_matches * 1000000) div n_matches end as bigint)").as("precision_ppm"),
      expr("cast((true_matches * 1000000) div n_b as bigint)").as("recall_ppm"),
      col("n_clusters"),
      col("max_cluster").cast("long").as("max_cluster")
    )
  }

  val q169Oracle: String = {
    val fArr = ErFirsts.map(n => s"'$n'").mkString(", ")
    val lArr = ErLasts.map(n => s"'$n'").mkString(", ")
    s"""WITH RECURSIVE base AS (
       |  SELECT c_custkey AS k,
       |    CAST(('0x' || substr(md5('fn:' || CAST(c_custkey AS VARCHAR)), 1, 1)) AS BIGINT) AS fi,
       |    CAST(('0x' || substr(md5('ln:' || CAST(c_custkey AS VARCHAR)), 1, 1)) AS BIGINT) AS li,
       |    lpad(CAST((c_custkey * 48271) % 10000000000 AS VARCHAR), 10, '0') AS d
       |  FROM customer
       |), nm AS (
       |  SELECT k, d,
       |    ([$fArr])[fi + 1] AS first,
       |    ([$lArr])[li + 1] AS last0
       |  FROM base
       |), a AS (
       |  SELECT k * 2 AS a_id, k AS a_k, first AS a_first, last0 AS a_last,
       |    '(' || substr(d, 1, 3) || ') ' || substr(d, 4, 3) || '-' || substr(d, 7, 4) AS a_phone
       |  FROM nm
       |), bp AS (
       |  SELECT k, d, first, last0,
       |    (k // 3) % 3 AS v,
       |    CAST(1 + (k % (length(last0) - 1)) AS INT) AS p,
       |    CAST(CASE WHEN (k // 3) % 3 = 1 AND k % 5 = 0 THEN 7 + ((k // 5) % 4)
       |              ELSE 1 + (k % 10) END AS INT) AS q
       |  FROM nm WHERE k % 3 = 0
       |), b AS (
       |  SELECT k * 2 + 1 AS b_id, k AS b_k, first AS b_first,
       |    CASE WHEN v = 1 THEN concat(substr(last0, 1, p - 1), substr(last0, p + 1))
       |         ELSE last0 END AS b_last,
       |    concat_ws('.', substr(dB, 1, 3), substr(dB, 4, 3), substr(dB, 7, 4)) AS b_phone
       |  FROM (
       |    SELECT *, CASE WHEN v = 2 OR (v = 1 AND k % 5 = 0)
       |      THEN concat(substr(d, 1, q - 1),
       |                  CAST((CAST(substr(d, q, 1) AS INT) + 1) % 10 AS VARCHAR),
       |                  substr(d, q + 1))
       |      ELSE d END AS dB
       |    FROM bp)
       |), an AS (SELECT *, regexp_replace(a_phone, '[^0-9]', '', 'g') AS a_digits FROM a),
       |bn AS (SELECT *, regexp_replace(b_phone, '[^0-9]', '', 'g') AS b_digits FROM b),
       |cand AS (
       |  SELECT DISTINCT ON (a_id, b_id) * FROM (
       |    SELECT an.*, bn.* FROM an JOIN bn
       |      ON substr(a_first, 1, 1) || substr(a_digits, 7, 4)
       |       = substr(b_first, 1, 1) || substr(b_digits, 7, 4)
       |    UNION ALL
       |    SELECT an.*, bn.* FROM an JOIN bn
       |      ON a_last || substr(a_digits, 1, 2) = b_last || substr(b_digits, 1, 2))
       |), m AS (
       |  SELECT * FROM cand
       |  WHERE levenshtein(a_first || ' ' || a_last, b_first || ' ' || b_last) <= 2
       |    AND levenshtein(a_digits, b_digits) <= 1
       |), sym AS (
       |  SELECT a_id AS src, b_id AS dst FROM m
       |  UNION ALL SELECT b_id, a_id FROM m
       |), reach(id, comp) AS (
       |  SELECT DISTINCT src, src FROM sym
       |  UNION
       |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.id
       |), comps AS (SELECT id, MIN(comp) AS component FROM reach GROUP BY id),
       |sizes AS (SELECT component, COUNT(*) AS cluster_size FROM comps GROUP BY component),
       |cstat AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |                 CAST(MAX(cluster_size) AS BIGINT) AS max_cluster FROM sizes),
       |cnts AS (
       |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM an) AS n_a,
       |         (SELECT CAST(COUNT(*) AS BIGINT) FROM bn) AS n_b,
       |         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
       |         (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_matches,
       |         (SELECT CAST(SUM(CASE WHEN b_k = a_k THEN 1 ELSE 0 END) AS BIGINT) FROM m) AS true_matches
       |)
       |SELECT cnts.n_a, cnts.n_b, cnts.n_candidates, cnts.n_matches, cnts.true_matches,
       |  CAST(CASE WHEN cnts.n_matches = 0 THEN NULL ELSE (cnts.true_matches * 1000000) // cnts.n_matches END AS BIGINT) AS precision_ppm,
       |  CAST((cnts.true_matches * 1000000) // cnts.n_b AS BIGINT) AS recall_ppm,
       |  cstat.n_clusters, cstat.max_cluster
       |FROM cnts, cstat""".stripMargin
  }

  // ---------------------------------------------------------------- q170
  /** EXACT higher statistical moments — per-type stddev, time↔value
    * correlation, and skewness computed from EXACT integer power sums
    * (n, Σx, Σx², Σy, Σy², Σy³, Σxy), not from the engines' float
    * aggregates. The q128/q134 discipline, extended to third moments:
    * values quantize to a 1e-6 grid, timestamps to whole seconds minus
    * a fixed epoch offset (shrinks the magnitude so the n·Σx² − (Σx)²
    * cancellation costs ~3 digits instead of ~7 — an ACCURACY choice;
    * parity never depended on it), all sums accumulate in
    * decimal(38,0) — associative, partitioning-independent, bit-equal
    * to DuckDB's HUGEINT sums. The derived doubles then come from ONE
    * identical arithmetic spelling on both engines (m2p·sqrt(m2p)
    * instead of pow(·,1.5): sqrt is correctly-rounded IEEE, pow is
    * not), floored onto a 1e-9 grid so the checked output is integer.
    *
    * Scale: one map-side-combined aggregate, 7 sums per group — the
    * textbook single-pass sufficient-statistics shape; magnitudes hold
    * to 100× this corpus inside decimal(38) (Σy³ ≲ 4e32).
    */
  def q170ExactMoments(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .select(
        col("event_type"),
        expr("cast(floor(value * 1000000 + 0.5) as bigint)").as("vq"),
        expr("(ts_ns div 1000000000) - 1600000000").as("xs")
      )
    def dsum0(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    val sums = ev
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dsum0(col("xs")).as("sx"),
        dsum0(col("xs") * col("xs")).as("sxx"),
        dsum0(col("vq")).as("sy"),
        dsum0(col("vq") * col("vq")).as("syy"),
        // vq³ ≈ 1.8e26 overflows the per-row BIGINT product on BOTH
        // engines — widen the first factor before multiplying
        sum(col("vq").cast("decimal(38,0)") * col("vq") * col("vq")).as("syyy"),
        dsum0(col("xs") * col("vq")).as("sxy")
      )
    sums
      .withColumn("nd", expr("cast(n as double)"))
      .withColumn("m2", expr("nd * cast(syy as double) - cast(sy as double) * cast(sy as double)"))
      .withColumn("mx2", expr("nd * cast(sxx as double) - cast(sx as double) * cast(sx as double)"))
      .withColumn("mean", expr("cast(sy as double) / nd"))
      .withColumn("m2p", expr("cast(syy as double) / nd - mean * mean"))
      .withColumn(
        "m3p",
        expr("cast(syyy as double) / nd - 3.0 * mean * (cast(syy as double) / nd) + 2.0 * mean * mean * mean"))
      .select(
        col("event_type"),
        col("n"),
        expr("cast(sy div n as bigint)").as("mean_e6"),
        expr("cast(floor(sqrt(m2 / (nd * (nd - 1.0))) / 1000000.0 * 1000000000.0 + 0.5) as bigint)")
          .as("stddev_e9"),
        expr(
          "cast(floor((nd * cast(sxy as double) - cast(sx as double) * cast(sy as double)) / sqrt(mx2 * m2) * 1000000000.0 + 0.5) as bigint)")
          .as("corr_e9"),
        expr("cast(floor(m3p / (m2p * sqrt(m2p)) * 1000000000.0 + 0.5) as bigint)").as("skew_e9")
      )
      .orderBy(col("event_type"))
  }

  val q170Oracle: String =
    """WITH q AS (
      |  SELECT event_type,
      |    CAST(floor("value" * 1000000 + 0.5) AS BIGINT) AS vq,
      |    (epoch_ns(ts) // 1000000000) - 1600000000 AS xs
      |  FROM events
      |), s AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(xs) AS sx, SUM(xs * xs) AS sxx,
      |    SUM(vq) AS sy, SUM(vq * vq) AS syy,
      |    SUM(CAST(vq AS HUGEINT) * vq * vq) AS syyy,
      |    SUM(xs * vq) AS sxy
      |  FROM q GROUP BY event_type
      |), d AS (
      |  SELECT *, CAST(n AS DOUBLE) AS nd,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS m2,
      |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS mx2,
      |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean
      |  FROM s
      |), d2 AS (
      |  SELECT *,
      |    CAST(syy AS DOUBLE) / nd - mean * mean AS m2p,
      |    CAST(syyy AS DOUBLE) / nd - 3.0 * mean * (CAST(syy AS DOUBLE) / nd) + 2.0 * mean * mean * mean AS m3p
      |  FROM d
      |)
      |SELECT event_type, n,
      |  CAST(sy // n AS BIGINT) AS mean_e6,
      |  CAST(floor(sqrt(m2 / (nd * (nd - 1.0))) / 1000000.0 * 1000000000.0 + 0.5) AS BIGINT) AS stddev_e9,
      |  CAST(floor((nd * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt(mx2 * m2) * 1000000000.0 + 0.5) AS BIGINT) AS corr_e9,
      |  CAST(floor(m3p / (m2p * sqrt(m2p)) * 1000000000.0 + 0.5) AS BIGINT) AS skew_e9
      |FROM d2
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q171
  /** WINDOW-FUNCTION CERTIFICATE — the full analytic-function surface
    * (row_number, lag, lead, nth_value, first/last_value, ntile,
    * percent_rank, rank, dense_rank, cume_dist) certified differentially
    * on BOTH ordering regimes: a total order (o_orderdate, o_orderkey)
    * where every function is frame-deterministic, and a TIES order
    * (o_orderpriority) exercising rank/dense_rank/cume_dist's
    * tie semantics (all three depend only on key values, so they are
    * deterministic under ties; frame-dependent functions stay on the
    * total order). nth/first/last pin an explicit ROWS
    * UNBOUNDED-to-UNBOUNDED frame on both engines — default frames end
    * at CURRENT ROW, which would make last_value a self-reference.
    * percent_rank/cume_dist emit as raw doubles: both engines compute
    * the same small-integer ratio in one IEEE division.
    */
  def q171WindowFunctions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir).where(col("o_custkey") < 300)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wp = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderpriority"))
    o.select(
      col("o_custkey"),
      col("o_orderkey"),
      row_number().over(w).as("rn"),
      lag(col("o_totalprice"), 1).over(w).as("lag_price"),
      lead(col("o_totalprice"), 1).over(w).as("lead_price"),
      nth_value(col("o_totalprice"), 2).over(wf).as("nth2_price"),
      first(col("o_totalprice")).over(wf).as("first_price"),
      last(col("o_totalprice")).over(wf).as("last_price"),
      ntile(4).over(w).as("ntile4"),
      percent_rank().over(w).as("pr"),
      rank().over(wp).as("rank_pri"),
      dense_rank().over(wp).as("dense_pri"),
      cume_dist().over(wp).as("cd_pri")
    ).orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q171Oracle: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(row_number() OVER w AS INT) AS rn,
      |  lag(o_totalprice, 1) OVER w AS lag_price,
      |  lead(o_totalprice, 1) OVER w AS lead_price,
      |  nth_value(o_totalprice, 2) OVER wf AS nth2_price,
      |  first_value(o_totalprice) OVER wf AS first_price,
      |  last_value(o_totalprice) OVER wf AS last_price,
      |  CAST(ntile(4) OVER w AS INT) AS ntile4,
      |  percent_rank() OVER w AS pr,
      |  CAST(rank() OVER wp AS INT) AS rank_pri,
      |  CAST(dense_rank() OVER wp AS INT) AS dense_pri,
      |  cume_dist() OVER wp AS cd_pri
      |FROM orders
      |WHERE o_custkey < 300
      |WINDOW
      |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      |  wp AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q172
  /** GROUPING SETS — arbitrary subtotal combinations in ONE
    * Expand+aggregate pass (rollup q36/q161 and cube q69 are the
    * special cases; this is the general form): per (flag, status),
    * per status alone, and the grand total — deliberately NOT a rollup
    * prefix chain. grouping_id disambiguates genuine NULL group values
    * from subtotal rows; sums take the dsum decimal discipline.
    */
  def q172GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"),
        col("l_linestatus")
      )
      .agg(
        grouping_id().as("gid"),
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n")
      )
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"), col("sum_qty"), col("n"))
      .orderBy(
        col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q172Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q173
  /** VIDEO KEYFRAME PIPELINE — the video member of the multimodal fleet
    * (image q32/q149, audio q108): an opaque binary payload, the
    * [[graft.ops.Multimodal.frameSample]] posexplode generator (one
    * 100 MB video row → many frame rows, no driver materialization),
    * per-frame 60-bit signatures, a consecutive-frame hamming lag, and
    * scene-cut keyframe selection (frame 0, or hamming > threshold).
    *
    * The CODEC is the sanctioned stub (container decode libs aren't in
    * this environment): payloads are deterministic md5-derived frame
    * bytes, with every even doc repeating each content frame 3×
    * (static-scene runs) — so keyframe counts are non-trivial and the
    * whole pipeline replays in SQL. The Spark side still exercises the
    * REAL plumbing a production video op needs: binary concat-fold
    * assembly, binary substring framing, generator explode,
    * hex→integer signatures, per-video ordered lag — swap the stub
    * synthesis for an ffmpeg mapInPandas kernel and nothing downstream
    * changes.
    *
    * Scale: frames explode map-side; the only shuffle is the per-video
    * lag window (fine-grained keys) + final aggregate.
    */
  def q173VideoKeyframes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables
      .documents(s, dir)
      .where(col("doc_id") < 400)
      .select(col("doc_id"))
      .withColumn("n_frames", expr("cast(6 + (doc_id % 4) as int)"))
    // stub "decode": assemble the opaque payload as F concatenated
    // 16-byte md5 frames; even docs repeat each content id 3x
    val media = docs.withColumn(
      "bytes",
      expr(
        """aggregate(
          |  transform(sequence(0, n_frames - 1),
          |    i -> unhex(md5(concat('vf:', cast(doc_id as string), ':',
          |           cast(case when doc_id % 2 = 0 then i div 3 else i end as string))))),
          |  cast(x'' as binary),
          |  (acc, b) -> concat(acc, b))""".stripMargin)
    )
    val frames = graft.ops.Multimodal
      .frameSample(media, frameBytes = 16, stride = 16)
      .withColumn("fhex", hex(col("frame_bytes")))
      .withColumn("s1", expr("cast(conv(substring(fhex, 1, 15), 16, 10) as bigint)"))
      .withColumn("s2", expr("cast(conv(substring(fhex, 17, 15), 16, 10) as bigint)"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val cuts = frames
      .withColumn("p1", lag(col("s1"), 1).over(w))
      .withColumn("p2", lag(col("s2"), 1).over(w))
      .withColumn(
        "ham",
        when(col("p1").isNull, lit(null))
          .otherwise(expr("bit_count(s1 ^ p1) + bit_count(s2 ^ p2)")))
      .withColumn("is_key", (col("ham").isNull || col("ham") > 12).cast("long"))
    cuts
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(col("is_key")).as("n_keyframes"),
        coalesce(sum(col("ham")), lit(0L)).as("sum_hamming"),
        min(col("s1")).as("min_sig")
      )
      .orderBy(col("doc_id"))
  }

  val q173Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(6 + (doc_id % 4) AS INT) AS n_frames
      |  FROM documents WHERE doc_id < 400
      |), fx AS (
      |  SELECT doc_id, unnest(range(0, n_frames)) AS fi FROM d
      |), fr AS (
      |  SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      |    md5('vf:' || CAST(doc_id AS VARCHAR) || ':' ||
      |        CAST(CASE WHEN doc_id % 2 = 0 THEN fi // 3 ELSE fi END AS VARCHAR)) AS fhex
      |  FROM fx
      |), sig AS (
      |  SELECT doc_id, frame_idx,
      |    CAST(('0x' || substr(fhex, 1, 15)) AS BIGINT) AS s1,
      |    CAST(('0x' || substr(fhex, 17, 15)) AS BIGINT) AS s2
      |  FROM fr
      |), lg AS (
      |  SELECT doc_id, frame_idx, s1,
      |    lag(s1) OVER w AS p1, lag(s2) OVER w AS p2, s2
      |  FROM sig WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
      |), km AS (
      |  SELECT doc_id, s1,
      |    CASE WHEN p1 IS NULL THEN NULL
      |         ELSE bit_count(xor(s1, p1)) + bit_count(xor(s2, p2)) END AS ham,
      |    CASE WHEN p1 IS NULL OR bit_count(xor(s1, p1)) + bit_count(xor(s2, p2)) > 12
      |         THEN 1 ELSE 0 END AS is_key
      |  FROM lg
      |)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
      |  CAST(SUM(is_key) AS BIGINT) AS n_keyframes,
      |  CAST(COALESCE(SUM(ham), 0) AS BIGINT) AS sum_hamming,
      |  MIN(s1) AS min_sig
      |FROM km
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q174
  /** TRIANGLE COUNTING ([[graft.ops.Triangles]]) — degree-ordered
    * orientation (Suri & Vassilvitskii WWW'11): orient each edge
    * toward the higher-(degree, id) endpoint so every out-degree is
    * O(√m), form wedges by a source self-join, close them against the
    * edge set. The graph is synthesized deterministically from the
    * customer keys (edges k→k+{1,2,5} inside blocks of 10, endpoints
    * semi-joined against real keys — no contiguity assumption), so
    * triangles are the planted (k, k+1, k+2) runs plus nothing — and
    * the oracle counts them with the textbook canonical x<y<z triple
    * join the oriented plan must equal. Wedge counts are
    * orientation-dependent diagnostics and deliberately NOT in the
    * checked output; edges and triangles are orientation-invariant.
    */
  /** The deterministic bounded-degree test graph shared by q174/q184:
    * edges k→k+{1,2,5} inside blocks of 10 over the real customer keys
    * (semi-joined — no contiguity assumption).
    */
  private def blockGraph(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.customer(s, dir).select(col("c_custkey").as("k"))
    val cand = keys
      .withColumn("d", explode(array(lit(1L), lit(2L), lit(5L))))
      .withColumn("v", col("k") + col("d"))
      .where(expr("(k div 10) = (v div 10)"))
    cand
      .join(keys.withColumnRenamed("k", "v"), Seq("v"), "left_semi")
      .select(col("k").as("u"), col("v"))
  }

  // the same graph as a DuckDB CTE body (shared by the q174/q184 oracles)
  private val BlockGraphSql: String =
    """SELECT cand.k AS u, cand.v
      |  FROM (SELECT k.c_custkey AS k, k.c_custkey + d.d AS v
      |        FROM customer k, (SELECT unnest([1, 2, 5]) AS d) d
      |        WHERE (k.c_custkey // 10) = ((k.c_custkey + d.d) // 10)) cand
      |  JOIN customer k2 ON k2.c_custkey = cand.v""".stripMargin

  def q174Triangles(s: SparkSession, dir: String): DataFrame = {
    val edges = blockGraph(s, dir)
    val tri = graft.ops.Triangles.triangles(edges, "u", "v")
    val triB = tri
      .withColumn("bucket", expr("least(u, least(v, w)) div 500"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_triangles"))
    val edgB = edges
      .withColumn("bucket", expr("least(u, v) div 500"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_edges"))
    edgB
      .join(triB, Seq("bucket"), "left")
      .na
      .fill(0L, Seq("n_triangles"))
      .select(col("bucket"), col("n_edges"), col("n_triangles"))
      .orderBy(col("bucket"))
  }

  val q174Oracle: String =
    s"""WITH e AS (
      |$BlockGraphSql
      |), t AS (
      |  SELECT a.u AS x
      |  FROM e a
      |  JOIN e b ON b.u = a.u AND b.v > a.v
      |  JOIN e c ON c.u = a.v AND c.v = b.v
      |), tb AS (
      |  SELECT x // 500 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM t GROUP BY 1
      |), eb AS (
      |  SELECT u // 500 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_edges FROM e GROUP BY 1
      |)
      |SELECT CAST(eb.bucket AS BIGINT) AS bucket, eb.n_edges,
      |  CAST(COALESCE(tb.n_triangles, 0) AS BIGINT) AS n_triangles
      |FROM eb LEFT JOIN tb ON eb.bucket = tb.bucket
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q175
  /** TPC-H Q21 SHAPE — "sole late supplier": suppliers whose line was
    * the ONLY late one (shipdate > orderdate + 60 days) in an order
    * that involved at least one OTHER supplier. The two correlated
    * subqueries surface physically as one left-semi join (some other
    * supplier exists in the order) and one left-anti join (no other
    * LATE supplier in the order) over a deduped (order, supplier)
    * late set — the EXISTS/NOT-EXISTS pair every engine must turn into
    * semi/anti joins to survive a fact-scale order list. Top-20 by
    * wait count with a total tiebreak.
    */
  def q175SoleLateSupplier(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val sup = Tables.supplier(s, dir)
    val lateSO = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .where(expr("l_shipdate > o_orderdate + INTERVAL 60 DAYS"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val withOther = lateSO.join(
      l.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2")),
      col("ok") === col("ok2") && col("sk") =!= col("sk2"),
      "left_semi")
    val sole = withOther.join(
      lateSO.select(col("ok").as("ok3"), col("sk").as("sk3")),
      col("ok") === col("ok3") && col("sk") =!= col("sk3"),
      "left_anti")
    sole
      .groupBy(col("sk"))
      .agg(count(lit(1)).as("numwait"))
      .join(sup, col("sk") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q175Oracle: String =
    """WITH late AS (
      |  SELECT DISTINCT l.l_orderkey AS ok, l.l_suppkey AS sk
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |), sole AS (
      |  SELECT t.ok, t.sk FROM late t
      |  WHERE EXISTS (SELECT 1 FROM lineitem l2
      |                WHERE l2.l_orderkey = t.ok AND l2.l_suppkey <> t.sk)
      |    AND NOT EXISTS (SELECT 1 FROM late t3
      |                    WHERE t3.ok = t.ok AND t3.sk <> t.sk)
      |)
      |SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM sole JOIN supplier s ON s.s_suppkey = sole.sk
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q176
  /** TPC-H Q22 SHAPE — customers with above-average balance and no
    * recent orders: per market segment (the "country code" analogue),
    * count customers whose balance beats the GLOBAL positive-balance
    * average and who placed no order in the last 60 data-days (anti
    * join against a cutoff derived from max(o_orderdate); the literal
    * "never ordered" predicate is vacuous on this corpus — measured 0
    * rows). The average-threshold
    * compare is EXACT-INTEGER via cross-multiplication on cent-grid
    * balances (ab_q · n_pos > sum_q) — a float threshold could flip a
    * borderline customer between engines; integers cannot. Balance
    * totals emit in cents.
    */
  def q176GlobalAvgAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables
      .customer(s, dir)
      .withColumn("ab_q", expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)"))
    val thr = c
      .where(col("ab_q") > 0)
      .agg(count(lit(1)).as("n_pos"), sum(col("ab_q")).as("sum_q"))
    // "no orders" is vacuous on this corpus (every customer ordered at
    // least once — measured 0 rows); the Q22 anti-join becomes "no
    // RECENT orders" against a data-derived 60-day cutoff
    val o = Tables.orders(s, dir)
    val recent = o
      .crossJoin(broadcast(o.agg(max(col("o_orderdate")).as("mx"))))
      .where(expr("o_orderdate >= mx - INTERVAL 60 DAYS"))
      .select(col("o_custkey"))
    val noOrders = c.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
    noOrders
      .crossJoin(broadcast(thr))
      .where(col("ab_q") * col("n_pos") > col("sum_q"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), sum(col("ab_q")).as("totacctbal_cents"))
      .orderBy(col("c_mktsegment"))
  }

  val q176Oracle: String =
    """WITH c AS (
      |  SELECT *, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS ab_q FROM customer
      |), thr AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pos, CAST(SUM(ab_q) AS BIGINT) AS sum_q
      |  FROM c WHERE ab_q > 0
      |)
      |SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(c.ab_q) AS BIGINT) AS totacctbal_cents
      |FROM c, thr
      |WHERE c.ab_q * thr.n_pos > thr.sum_q
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 60 DAY)
      |GROUP BY c.c_mktsegment
      |ORDER BY c.c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q177
  /** SET-OPERATION CERTIFICATE — bag (ALL) vs set semantics across
    * INTERSECT/EXCEPT/UNION, certified differentially. Multiset
    * semantics are a classic cross-engine trap: `INTERSECT ALL` keeps
    * min(multiplicities), `EXCEPT ALL` subtracts them, plain
    * INTERSECT/EXCEPT deduplicate FIRST — engines that implement bag
    * ops as join rewrites get the multiplicities wrong. Inputs are two
    * suppkey multisets (A-flag vs R-flag lines, folded mod 100 so
    * multiplicities are deep); outputs are the six cardinalities plus
    * two content checksums, all scalars.
    */
  def q177SetOps(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val a = l.where(col("l_returnflag") === "A").select((col("l_suppkey") % 100).as("x"))
    val b = l.where(col("l_returnflag") === "R").select((col("l_suppkey") % 100).as("x"))
    val ia = a.intersectAll(b)
    val ea = a.exceptAll(b)
    def cnt(df: DataFrame, name: String) = df.agg(count(lit(1)).as(name))
    def sm(df: DataFrame, name: String) =
      df.agg(coalesce(sum(col("x")), lit(0L)).as(name))
    cnt(ia, "n_intersect_all")
      .crossJoin(cnt(a.intersect(b), "n_intersect"))
      .crossJoin(cnt(ea, "n_except_all"))
      .crossJoin(cnt(a.except(b), "n_except"))
      .crossJoin(cnt(a.unionAll(b), "n_union_all"))
      .crossJoin(cnt(a.unionAll(b).distinct(), "n_union_distinct"))
      .crossJoin(sm(ia, "sum_intersect_all"))
      .crossJoin(sm(ea, "sum_except_all"))
  }

  val q177Oracle: String =
    """WITH a AS (SELECT l_suppkey % 100 AS x FROM lineitem WHERE l_returnflag = 'A'),
      |b AS (SELECT l_suppkey % 100 AS x FROM lineitem WHERE l_returnflag = 'R'),
      |ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
      |ea AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ia) AS n_intersect_all,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_intersect,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ea) AS n_except_all,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_except,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT * FROM a UNION ALL SELECT * FROM b)) AS n_union_all,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_union_distinct,
      |  (SELECT CAST(COALESCE(SUM(x), 0) AS BIGINT) FROM ia) AS sum_intersect_all,
      |  (SELECT CAST(COALESCE(SUM(x), 0) AS BIGINT) FROM ea) AS sum_except_all""".stripMargin

  // ---------------------------------------------------------------- q178
  /** EXPLODE vs EXPLODE_OUTER CERTIFICATE — generator null/empty
    * semantics: `explode` DROPS rows whose array is empty or null,
    * `explode_outer` keeps them as a single null-element row (the LEFT
    * JOIN LATERAL shape in SQL). Arrays are planted per doc: every
    * 3rd empty, every 3rd+1 null, the rest real token slices. The
    * conservation law (outer rows − inner rows = empty-or-null docs)
    * is pinned TRUE, and posexplode's 0-BASED index is certified via
    * the Σ n(n−1)/2 closed form — a 1-based generator would miss by
    * exactly Σn.
    */
  def q178ExplodeOuter(s: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(s, dir)
      .where(col("doc_id") < 600)
      .withColumn(
        "arr",
        expr(
          """case when doc_id % 3 = 0 then array()
            |     when doc_id % 3 = 1 then cast(null as array<string>)
            |     else slice(split(trim(text), '\\s+'), 1, 5) end""".stripMargin))
    val inner = d.select(col("doc_id"), explode(col("arr")).as("tok"))
    val outer = d.select(col("doc_id"), explode_outer(col("arr")).as("tok"))
    val pos = d.select(col("doc_id"), posexplode(col("arr")).as(Seq("p", "tok")))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val nInner = inner.agg(count(lit(1)).as("n_inner"))
    val nOuter = outer.agg(
      count(lit(1)).as("n_outer"),
      sum(col("tok").isNull.cast("long")).as("n_null_tok_rows"))
    val nEmpty = d.agg(
      sum((col("arr").isNull || size(col("arr")) === 0).cast("long")).as("n_empty_or_null"))
    val sumPos = pos.agg(coalesce(sum(col("p")), lit(0L)).as("sum_pos"))
    // NOTE: with ANSI off, Spark's size(NULL) is the legacy -1, not
    // null — coalesce would never fire; guard explicitly
    val closed = d.agg(
      coalesce(
        sum(expr(
          "(case when arr is null then 0 else size(arr) end) * ((case when arr is null then 0 else size(arr) end) - 1) div 2")),
        lit(0L)).as("sum_pos_closed"))
    nDocs
      .crossJoin(nInner)
      .crossJoin(nOuter)
      .crossJoin(nEmpty)
      .crossJoin(sumPos)
      .crossJoin(closed)
      .select(
        col("n_docs"),
        col("n_inner"),
        col("n_outer"),
        col("n_null_tok_rows"),
        col("n_empty_or_null"),
        (col("n_outer") - col("n_inner") === col("n_empty_or_null")).as("conservation_ok"),
        (col("n_null_tok_rows") === col("n_empty_or_null")).as("null_rows_ok"),
        col("sum_pos"),
        (col("sum_pos") === col("sum_pos_closed")).as("pos_zero_based_ok")
      )
  }

  val q178Oracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN []
      |         WHEN doc_id % 3 = 1 THEN NULL
      |         ELSE list_slice(string_split_regex(trim(text), '\s+'), 1, 5) END AS arr
      |  FROM documents WHERE doc_id < 600
      |), inner_e AS (
      |  SELECT doc_id, unnest(arr) AS tok FROM d
      |), outer_e AS (
      |  SELECT d.doc_id, u.tok
      |  FROM d LEFT JOIN LATERAL (SELECT unnest(d.arr) AS tok) u ON true
      |), stats AS (
      |  SELECT
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_docs,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM inner_e) AS n_inner,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM outer_e) AS n_outer,
      |    (SELECT CAST(SUM(CASE WHEN tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM outer_e) AS n_null_tok_rows,
      |    (SELECT CAST(SUM(CASE WHEN arr IS NULL OR len(arr) = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM d) AS n_empty_or_null,
      |    (SELECT CAST(COALESCE(SUM(COALESCE(len(arr), 0) * (COALESCE(len(arr), 0) - 1) // 2), 0) AS BIGINT) FROM d) AS sum_pos_closed
      |)
      |SELECT n_docs, n_inner, n_outer, n_null_tok_rows, n_empty_or_null,
      |  (n_outer - n_inner = n_empty_or_null) AS conservation_ok,
      |  (n_null_tok_rows = n_empty_or_null) AS null_rows_ok,
      |  sum_pos_closed AS sum_pos,
      |  TRUE AS pos_zero_based_ok
      |FROM stats""".stripMargin

  // ---------------------------------------------------------------- q179
  /** ARRAY HIGHER-ORDER-FUNCTION CERTIFICATE — the lambda surface
    * (transform, filter, aggregate/fold, sort, slice, distinct,
    * position) certified against DuckDB's list_* family. Indexing
    * conventions differ per engine (Spark slice is (start, LENGTH),
    * DuckDB list_slice is (begin, END-inclusive); Spark array_position
    * is 0-when-missing, DuckDB NULL-when-missing) — the certificate
    * pins the translation table the engine's users rely on.
    * list_distinct is order-unstable in DuckDB, so only its LENGTH is
    * checked.
    */
  def q179ArrayHof(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .where(col("doc_id") < 300)
      .withColumn("toks", expr("slice(split(trim(text), '\\\\s+'), 1, 8)"))
      .select(
        col("doc_id"),
        expr("size(toks)").as("n"),
        expr("aggregate(transform(toks, x -> length(x)), 0, (a, x) -> a + x)")
          .cast("long").as("sum_lens"),
        expr("size(filter(toks, x -> length(x) > 4))").as("n_long"),
        expr("array_join(slice(array_sort(toks), 1, 3), ',')").as("first3_sorted"),
        expr("size(array_distinct(toks))").as("nd"),
        expr("array_position(array_sort(toks), element_at(toks, 1))").as("pos_first")
      )
      .orderBy(col("doc_id"))

  val q179Oracle: String =
    """SELECT doc_id,
      |  CAST(len(tk) AS INT) AS n,
      |  CAST(list_aggregate(list_transform(tk, x -> length(x)), 'sum') AS BIGINT) AS sum_lens,
      |  CAST(len(list_filter(tk, x -> length(x) > 4)) AS INT) AS n_long,
      |  array_to_string(list_slice(list_sort(tk), 1, 3), ',') AS first3_sorted,
      |  CAST(len(list_distinct(tk)) AS INT) AS nd,
      |  CAST(list_position(list_sort(tk), tk[1]) AS BIGINT) AS pos_first
      |FROM (
      |  SELECT doc_id, list_slice(string_split_regex(trim(text), '\s+'), 1, 8) AS tk
      |  FROM documents WHERE doc_id < 300)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q180
  /** INCREMENTAL VIEW MAINTENANCE ([[graft.ops.Ivm]]) — a per-key
    * (count, sum) view over early events is maintained from a weighted
    * changelog (inserts: the next 6 data-days; retractions: every 5th
    * base event) and certified EQUAL to recomputing the view from the
    * changed base — per key, with the equality laws in the checked row.
    * Maintenance cost is O(|delta|): the delta aggregate reads only
    * the changelog and the merge is one outer join on the key — the
    * property that makes a 100 TB materialized view refreshable.
    * Values ride the integer cent grid so sums are associative-exact.
    */
  def q180Ivm(s: SparkSession, dir: String): DataFrame = {
    val Day = 86400000000000L
    val ev = Tables
      .events(s, dir)
      .select(
        col("event_id"),
        col("ts_ns"),
        (col("user_id") % 200).as("k"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("vq"))
      .crossJoin(broadcast(
        Tables.events(s, dir).agg(min(col("ts_ns")).as("t_min"))))
      .withColumn("t0", col("t_min") + lit(18 * Day))
      .withColumn("t1", col("t_min") + lit(24 * Day))
    val base = ev.where(col("ts_ns") < col("t0"))
    val state0 = base
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("vq")).as("sm"))
    val inserts = ev
      .where(col("ts_ns") >= col("t0") && col("ts_ns") < col("t1"))
      .select(col("k"), lit(1L).as("w"), col("vq").as("v"))
    val retracts = base
      .where(col("event_id") % 5 === 0)
      .select(col("k"), lit(-1L).as("w"), col("vq").as("v"))
    val maintained = graft.ops.Ivm
      .maintain(state0, inserts.unionByName(retracts), Seq("k"))
      .withColumnsRenamed(Map("cnt" -> "m_cnt", "sm" -> "m_sm"))
    val recomputed = ev
      .where(
        (col("ts_ns") < col("t0") && col("event_id") % 5 =!= 0) ||
          (col("ts_ns") >= col("t0") && col("ts_ns") < col("t1")))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("r_cnt"), sum(col("vq")).as("r_sm"))
    maintained
      .join(recomputed, Seq("k"), "full_outer")
      .select(
        col("k"),
        coalesce(col("m_cnt"), lit(-1L)).as("cnt"),
        coalesce(col("m_sm"), lit(-1L)).as("sm"),
        (col("m_cnt") <=> col("r_cnt")).as("cnt_law_ok"),
        (col("m_sm") <=> col("r_sm")).as("sum_law_ok")
      )
      .orderBy(col("k"))
  }

  val q180Oracle: String =
    """WITH ev AS (
      |  SELECT event_id, epoch_ns(ts) AS t, user_id % 200 AS k,
      |    CAST(floor("value" * 100 + 0.5) AS BIGINT) AS vq,
      |    (SELECT MIN(epoch_ns(ts)) FROM events) + 18 * 86400000000000 AS t0,
      |    (SELECT MIN(epoch_ns(ts)) FROM events) + 24 * 86400000000000 AS t1
      |  FROM events
      |), base AS (SELECT * FROM ev WHERE t < t0),
      |state0 AS (
      |  SELECT k, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(vq) AS BIGINT) AS sm
      |  FROM base GROUP BY k
      |), changes AS (
      |  SELECT k, CAST(1 AS BIGINT) AS w, vq AS v FROM ev WHERE t >= t0 AND t < t1
      |  UNION ALL
      |  SELECT k, CAST(-1 AS BIGINT) AS w, vq AS v FROM base WHERE event_id % 5 = 0
      |), delta AS (
      |  SELECT k, CAST(SUM(w) AS BIGINT) AS d_cnt, CAST(SUM(w * v) AS BIGINT) AS d_sm
      |  FROM changes GROUP BY k
      |), maintained AS (
      |  SELECT COALESCE(s.k, d.k) AS k,
      |    COALESCE(s.cnt, 0) + COALESCE(d.d_cnt, 0) AS m_cnt,
      |    COALESCE(s.sm, 0) + COALESCE(d.d_sm, 0) AS m_sm
      |  FROM state0 s FULL OUTER JOIN delta d ON s.k = d.k
      |), kept AS (SELECT * FROM maintained WHERE m_cnt > 0),
      |recomputed AS (
      |  SELECT k, CAST(COUNT(*) AS BIGINT) AS r_cnt, CAST(SUM(vq) AS BIGINT) AS r_sm
      |  FROM ev
      |  WHERE (t < t0 AND event_id % 5 <> 0) OR (t >= t0 AND t < t1)
      |  GROUP BY k
      |)
      |SELECT COALESCE(kept.k, recomputed.k) AS k,
      |  CAST(COALESCE(kept.m_cnt, -1) AS BIGINT) AS cnt,
      |  CAST(COALESCE(kept.m_sm, -1) AS BIGINT) AS sm,
      |  (kept.m_cnt IS NOT DISTINCT FROM recomputed.r_cnt) AS cnt_law_ok,
      |  (kept.m_sm IS NOT DISTINCT FROM recomputed.r_sm) AS sum_law_ok
      |FROM kept FULL OUTER JOIN recomputed ON kept.k = recomputed.k
      |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q181
  /** MULTI-TOUCH ATTRIBUTION — for every purchase, the view/click
    * touches of the same user in the prior 7 days earn credit under
    * three industry rules at once: last-touch (most recent touch takes
    * the conversion), first-touch (earliest takes it), and linear
    * (1/n in ppm, floor — deterministic integer credit). One
    * user-keyed equi join with the window predicate (per-user touch
    * lists are small; the join never goes quadratic in the corpus),
    * then per-conversion argmin/argmax via struct-ordered min/max
    * (exact (ts, event_id) tie-break). Reported per channel.
    */
  def q181Attribution(s: SparkSession, dir: String): DataFrame = {
    val Week = 604800000000000L
    val ev = Tables.events(s, dir)
    val conv = ev
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("cu"), col("ts_ns").as("cts"), col("event_id").as("cid"))
    val touch = ev
      .where(col("event_type").isin("view", "click"))
      .select(
        col("user_id").as("tu"),
        col("ts_ns").as("tts"),
        col("event_id").as("tid"),
        col("event_type").as("channel"))
    val pairs = conv.join(
      touch,
      col("cu") === col("tu") &&
        col("tts") < col("cts") && col("tts") >= col("cts") - lit(Week))
    val perConv = pairs
      .groupBy(col("cu"), col("cid"))
      .agg(
        count(lit(1)).as("n_touch"),
        max(struct(col("tts"), col("tid"), col("channel"))).as("last_t"),
        min(struct(col("tts"), col("tid"), col("channel"))).as("first_t"))
    val credited = pairs
      .join(
        perConv.select(col("cid").as("cid2"), col("n_touch"), col("last_t"), col("first_t")),
        col("cid") === col("cid2"))
    // a pair IS the winning touch iff its (ts, id) equals the argmax —
    // (tts, tid) is a total order, so channel equality is implied
    credited
      .groupBy(col("channel"))
      .agg(
        count(lit(1)).as("n_credited_pairs"),
        sum((struct(col("tts"), col("tid")) ===
          struct(col("last_t.tts"), col("last_t.tid"))).cast("long")).as("last_touch_convs"),
        sum((struct(col("tts"), col("tid")) ===
          struct(col("first_t.tts"), col("first_t.tid"))).cast("long")).as("first_touch_convs"),
        sum(expr("1000000 div n_touch")).as("linear_ppm_total")
      )
      .orderBy(col("channel"))
  }

  val q181Oracle: String =
    """WITH conv AS (
      |  SELECT user_id AS cu, epoch_ns(ts) AS cts, event_id AS cid
      |  FROM events WHERE event_type = 'purchase'
      |), touch AS (
      |  SELECT user_id AS tu, epoch_ns(ts) AS tts, event_id AS tid, event_type AS channel
      |  FROM events WHERE event_type IN ('view', 'click')
      |), pairs AS (
      |  SELECT * FROM conv JOIN touch
      |    ON cu = tu AND tts < cts AND tts >= cts - 604800000000000
      |), pr AS (
      |  SELECT channel,
      |    row_number() OVER (PARTITION BY cid ORDER BY tts DESC, tid DESC) AS rl,
      |    row_number() OVER (PARTITION BY cid ORDER BY tts ASC, tid ASC) AS rf,
      |    COUNT(*) OVER (PARTITION BY cid) AS n_touch
      |  FROM pairs
      |)
      |SELECT channel,
      |  CAST(COUNT(*) AS BIGINT) AS n_credited_pairs,
      |  CAST(SUM(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch_convs,
      |  CAST(SUM(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS first_touch_convs,
      |  CAST(SUM(1000000 // n_touch) AS BIGINT) AS linear_ppm_total
      |FROM pr
      |GROUP BY channel
      |ORDER BY channel""".stripMargin

  // ---------------------------------------------------------------- q182
  /** TIME-WEIGHTED AVERAGE (TWAP) — per user, the step-function
    * integral of `value` over time divided by the covered duration:
    * each observation holds from its timestamp to the next (lead), the
    * last one contributes no interval. Products ride
    * decimal(38,0)·ns — a cents×ns product reaches ~1.5e20 and
    * OVERFLOWS a per-row BIGINT, so the first factor widens before
    * multiplying (the q170 lesson); the final ratio is an integral
    * division of exact integers, so both engines floor the same value.
    */
  def q182Twap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val ev = Tables
      .events(s, dir)
      .select(
        col("user_id"),
        col("ts_ns"),
        col("event_id"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("vc"))
      .withColumn("nxt", lead(col("ts_ns"), 1).over(w))
      .where(col("nxt").isNotNull)
      .withColumn("dur", col("nxt") - col("ts_ns"))
    ev.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("vc").cast("decimal(38,0)") * col("dur")).as("wsum"),
        sum(col("dur")).as("tsum"))
      .where(col("tsum") > 0)
      .select(
        col("user_id"),
        col("n_intervals"),
        expr("cast(wsum div tsum as bigint)").as("twap_cents"),
        col("tsum").cast("long").as("covered_ns"))
      .orderBy(col("user_id"))
  }

  val q182Oracle: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS t, event_id,
      |    CAST(floor("value" * 100 + 0.5) AS BIGINT) AS vc
      |  FROM events
      |), l AS (
      |  SELECT user_id, vc,
      |    lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS dur
      |  FROM e
      |), d AS (SELECT * FROM l WHERE dur IS NOT NULL)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
      |  CAST(SUM(CAST(vc AS HUGEINT) * dur) // SUM(dur) AS BIGINT) AS twap_cents,
      |  CAST(SUM(dur) AS BIGINT) AS covered_ns
      |FROM d
      |GROUP BY user_id
      |HAVING SUM(dur) > 0
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q183
  /** OHLC BARS — per (event_type, UTC day): open/close via
    * struct-ordered argmin/argmax on the exact (ts_ns, event_id) total
    * order (never "first row seen" — that's partition-order
    * nondeterminism), high/low as plain extremes, plus the overnight
    * gap (open − previous close) through a lag window OVER THE
    * AGGREGATED bars — the window-on-aggregate composition every OHLC
    * pipeline needs. All prices in integer cents.
    */
  def q183Ohlc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables
      .events(s, dir)
      .select(
        col("event_type"),
        to_date(expr("timestamp_micros(ts_ns div 1000)")).as("day"),
        col("ts_ns"),
        col("event_id"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("vc"))
    val bars = ev
      .groupBy(col("event_type"), col("day"))
      .agg(
        count(lit(1)).as("n"),
        min(struct(col("ts_ns"), col("event_id"), col("vc"))).getField("vc").as("open_cents"),
        max(col("vc")).as("high_cents"),
        min(col("vc")).as("low_cents"),
        max(struct(col("ts_ns"), col("event_id"), col("vc"))).getField("vc").as("close_cents"))
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    bars
      .withColumn(
        "gap_cents",
        coalesce(col("open_cents") - lag(col("close_cents"), 1).over(wd), lit(0L)))
      .select(
        col("event_type"),
        col("day").cast("string").as("day"),
        col("n"),
        col("open_cents"),
        col("high_cents"),
        col("low_cents"),
        col("close_cents"),
        col("gap_cents"))
      .orderBy(col("event_type"), col("day"))
  }

  val q183Oracle: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
      |    epoch_ns(ts) AS t, event_id,
      |    CAST(floor("value" * 100 + 0.5) AS BIGINT) AS vc
      |  FROM events
      |), e2 AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type, day ORDER BY t ASC, event_id ASC) AS ra,
      |    row_number() OVER (PARTITION BY event_type, day ORDER BY t DESC, event_id DESC) AS rd
      |  FROM e
      |), bars AS (
      |  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n,
      |    MAX(CASE WHEN ra = 1 THEN vc END) AS open_cents,
      |    MAX(vc) AS high_cents, MIN(vc) AS low_cents,
      |    MAX(CASE WHEN rd = 1 THEN vc END) AS close_cents
      |  FROM e2 GROUP BY event_type, day
      |)
      |SELECT event_type, CAST(day AS VARCHAR) AS day, n,
      |  open_cents, high_cents, low_cents, close_cents,
      |  CAST(COALESCE(open_cents - lag(close_cents) OVER
      |    (PARTITION BY event_type ORDER BY day), 0) AS BIGINT) AS gap_cents
      |FROM bars
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- q184
  /** K-CORE DECOMPOSITION ([[graft.ops.KCore]]) — iterative peeling to
    * the maximal subgraph of minimum degree ≥ k, on the shared block
    * graph, for k = 3 and k = 4. The deletion CASCADE is the point:
    * block ends start under-degree, their removal pushes interior
    * nodes under, and the fixpoint is reached only after several
    * rounds. The oracle UNROLLS 8 peel rounds per k as chained CTEs
    * (the q155 unrolled-rounds discipline) and pins a computed
    * stability verdict (|round 7| = |round 8| — peeling is monotone,
    * so equal cardinality ⟺ equal sets); Spark iterates to its own
    * fixpoint, so a cascade deeper than the unroll turns the row red
    * instead of silently passing.
    */
  def q184KCore(s: SparkSession, dir: String): DataFrame = {
    val edges = blockGraph(s, dir).persist()
    val allBuckets = edges.select(expr("u div 500").as("bucket")).distinct()
    val perK = Seq(3, 4).map { k =>
      val ce = graft.ops.KCore.coreEdges(edges, k).persist()
      val nodes = ce
        .select(col("u").as("id"))
        .unionByName(ce.select(col("v").as("id")))
        .distinct()
      val nb = nodes
        .groupBy(expr("id div 500").as("bucket"))
        .agg(count(lit(1)).as("n_core_nodes"))
      val eb = ce
        .groupBy(expr("u div 500").as("bucket"))
        .agg(count(lit(1)).as("n_core_edges"))
      // MEASURED fixpoint certificate, not a literal: recompute induced
      // degrees on the returned edge set and assert every surviving
      // node still clears k (vacuously true on an empty core). The
      // oracle pins its own stability predicate (|round 7| = |round 8|
      // cardinality); both must independently come out true. A one-row
      // broadcast-scalar cross join attaches the verdict to every
      // bucket row.
      val stable = ce
        .select(col("u").as("id"))
        .unionByName(ce.select(col("v").as("id")))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("deg"))
        .agg(coalesce(min(col("deg")) >= k, lit(true)).as("stable_ok"))
      allBuckets
        .join(nb, Seq("bucket"), "left")
        .join(eb, Seq("bucket"), "left")
        .na
        .fill(0L, Seq("n_core_nodes", "n_core_edges"))
        .withColumn("k", lit(k))
        .crossJoin(broadcast(stable))
    }
    perK
      .reduce(_ unionByName _)
      .select(
        col("k"),
        col("bucket"),
        col("n_core_nodes"),
        col("n_core_edges"),
        col("stable_ok"))
      .orderBy(col("k"), col("bucket"))
  }

  val q184Oracle: String = {
    val rounds = 8
    def chain(k: Int): String = {
      val sb = new StringBuilder
      // MATERIALIZED is load-bearing: each round references its
      // predecessor 3x, and DuckDB's default CTE inlining would go
      // exponential over 8 rounds (the q95 BPE lesson — here it
      // surfaced as "Too many open files" from 2^8 base-table scans)
      sb ++= s"e${k}_0 AS MATERIALIZED (SELECT u, v FROM eset),\n"
      for (r <- 1 to rounds) {
        val p = s"e${k}_${r - 1}"
        sb ++= s"""d${k}_$r AS (
                  |  SELECT id, COUNT(*) AS deg FROM (
                  |    SELECT u AS id FROM $p UNION ALL SELECT v FROM $p) GROUP BY id),
                  |k${k}_$r AS (SELECT id FROM d${k}_$r WHERE deg >= $k),
                  |e${k}_$r AS MATERIALIZED (
                  |  SELECT e.u, e.v FROM $p e
                  |  JOIN k${k}_$r a ON a.id = e.u
                  |  JOIN k${k}_$r b ON b.id = e.v),
                  |""".stripMargin
      }
      sb.toString
    }
    def summary(k: Int): String =
      s"""SELECT $k AS k, bkt.bucket,
         |  COALESCE(nb.n_core_nodes, 0) AS n_core_nodes,
         |  COALESCE(eb.n_core_edges, 0) AS n_core_edges,
         |  (SELECT COUNT(*) FROM e${k}_${rounds - 1}) = (SELECT COUNT(*) FROM e${k}_$rounds) AS stable_ok
         |FROM (SELECT DISTINCT u // 500 AS bucket FROM eset) bkt
         |LEFT JOIN (
         |  SELECT id // 500 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_core_nodes FROM (
         |    SELECT DISTINCT id FROM (
         |      SELECT u AS id FROM e${k}_$rounds UNION ALL SELECT v FROM e${k}_$rounds))
         |  GROUP BY 1) nb ON nb.bucket = bkt.bucket
         |LEFT JOIN (
         |  SELECT u // 500 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_core_edges
         |  FROM e${k}_$rounds GROUP BY 1) eb ON eb.bucket = bkt.bucket""".stripMargin
    s"""WITH eset AS MATERIALIZED (
       |$BlockGraphSql
       |),
       |${chain(3)}${chain(4)}
       |dummy AS (SELECT 1)
       |SELECT CAST(k AS INT) AS k, CAST(bucket AS BIGINT) AS bucket,
       |  n_core_nodes, n_core_edges, stable_ok
       |FROM (
       |${summary(3)}
       |UNION ALL
       |${summary(4)}
       |)
       |ORDER BY k, bucket""".stripMargin
  }

  // ---------------------------------------------------------------- q185
  /** TRENDING VALUES — day-over-day frequency lift with +1 smoothing:
    * per day, the top-3 prop-k values by
    * lift_ppm = ⌊cnt_today · (total_prev + D) · 10⁶ /
    *            ((cnt_prev + 1) · (total_today) · 1)⌋-style ratio
    * (exact integer floor on both engines — the FLOOR IS the
    * definition, so ranking can never flip on a stray ulp), ties to
    * the smaller value. First day has no previous and is excluded.
    * The JSON prop surface (get_json_object / json_extract_string)
    * feeds the counts.
    */
  def q185Trending(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables
      .events(s, dir)
      .select(
        to_date(expr("timestamp_micros(ts_ns div 1000)")).as("day"),
        expr("cast(get_json_object(props, '$.k') as bigint)").as("kv"))
      .where(col("kv").isNotNull)
    val counts = ev.groupBy(col("day"), col("kv")).agg(count(lit(1)).as("cnt"))
    val totals = ev.groupBy(col("day")).agg(count(lit(1)).as("total"))
    val wt = Window.orderBy(col("day"))
    // previous-day count per value (0 when absent yesterday) via a
    // self-join on (kv, day-1); previous-day total via lag over the
    // tiny per-day totals
    val prevCounts = counts.select(
      col("kv").as("pkv"),
      expr("date_add(day, 1)").as("pday"),
      col("cnt").as("prev_cnt"))
    val prevTotals = totals
      .withColumn("prev_total", lag(col("total"), 1).over(wt))
      .where(col("prev_total").isNotNull)
    val lifted = counts
      .join(prevTotals, Seq("day"))
      .join(
        prevCounts,
        col("kv") === col("pkv") && col("day") === col("pday"),
        "left")
      .withColumn("pc", coalesce(col("prev_cnt"), lit(0L)))
      .withColumn(
        "lift_ppm",
        expr("cast((cnt * prev_total * 1000000) div ((pc + 1) * total) as bigint)"))
    val wr = Window
      .partitionBy(col("day"))
      .orderBy(col("lift_ppm").desc, col("kv").asc)
    lifted
      .withColumn("rnk", row_number().over(wr))
      .where(col("rnk") <= 3)
      .select(
        col("day").cast("string").as("day"),
        col("rnk"),
        col("kv"),
        col("cnt"),
        col("lift_ppm"))
      .orderBy(col("day"), col("rnk"))
  }

  val q185Oracle: String =
    """WITH ev AS (
      |  SELECT CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
      |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
      |  FROM events
      |), e AS (SELECT * FROM ev WHERE kv IS NOT NULL),
      |counts AS (SELECT day, kv, CAST(COUNT(*) AS BIGINT) AS cnt FROM e GROUP BY day, kv),
      |totals AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS total FROM e GROUP BY day),
      |pt AS (
      |  SELECT day, total, lag(total) OVER (ORDER BY day) AS prev_total FROM totals
      |), lifted AS (
      |  SELECT c.day, c.kv, c.cnt,
      |    CAST((c.cnt * pt.prev_total * 1000000) //
      |         ((COALESCE(p.cnt, 0) + 1) * pt.total) AS BIGINT) AS lift_ppm
      |  FROM counts c
      |  JOIN pt ON pt.day = c.day AND pt.prev_total IS NOT NULL
      |  LEFT JOIN counts p ON p.kv = c.kv AND p.day + 1 = c.day
      |), rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY day ORDER BY lift_ppm DESC, kv ASC) AS rnk
      |  FROM lifted
      |)
      |SELECT CAST(day AS VARCHAR) AS day, CAST(rnk AS INT) AS rnk, kv, cnt, lift_ppm
      |FROM rk WHERE rnk <= 3
      |ORDER BY day, rnk""".stripMargin

  // ---------------------------------------------------------------- q186
  /** RATIO-TO-REPORT CERTIFICATE — the percent-of-total analytic
    * family: each (type, day) cell's share of its type (whole-partition
    * window sum — no ORDER BY, unbounded frame), its cumulative share
    * through time (ordered running sum over the same partition), and
    * the type's share of the grand total (window over the empty
    * partition). All shares are integer ppm via exact integral
    * division — cnt·10⁶ div total — so no float ratio can drift.
    */
  def q186RatioReport(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cell = Tables
      .events(s, dir)
      .groupBy(
        col("event_type"),
        to_date(expr("timestamp_micros(ts_ns div 1000)")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val wType = Window.partitionBy(col("event_type"))
    val wCum = Window
      .partitionBy(col("event_type"))
      .orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    cell
      .withColumn("type_total", sum(col("cnt")).over(wType))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("grand", sum(col("cnt")).over(wAll))
      .select(
        col("event_type"),
        col("day").cast("string").as("day"),
        col("cnt"),
        expr("cast((cnt * 1000000) div type_total as bigint)").as("share_ppm"),
        expr("cast((cum * 1000000) div type_total as bigint)").as("cum_share_ppm"),
        expr("cast((type_total * 1000000) div grand as bigint)").as("type_share_ppm"))
      .orderBy(col("event_type"), col("day"))
  }

  val q186Oracle: String =
    """WITH cell AS (
      |  SELECT event_type,
      |    CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2
      |), w AS (
      |  SELECT event_type, day, cnt,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS type_total,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
      |                   ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(cnt) OVER () AS grand
      |  FROM cell
      |)
      |SELECT event_type, CAST(day AS VARCHAR) AS day, cnt,
      |  CAST((cnt * 1000000) // type_total AS BIGINT) AS share_ppm,
      |  CAST((cum * 1000000) // type_total AS BIGINT) AS cum_share_ppm,
      |  CAST((type_total * 1000000) // grand AS BIGINT) AS type_share_ppm
      |FROM w
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- q187
  /** MOVING MEDIAN — 7-day discrete sliding median of daily event
    * counts per type. Interpolated medians diverge cross-engine in the
    * last ulp (the q41/q92 lesson), so the DISCRETE lower median IS
    * the definition: order the window's values by (count, day) —
    * a total order — and take position ⌈n/2⌉. The window materializes
    * as a banded self-join on the date offset (0..6) over the tiny
    * per-day grid, then one rank window per (type, day) cell — the
    * rank-selection recipe, slid through time.
    */
  def q187MovingMedian(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables
      .events(s, dir)
      .groupBy(
        col("event_type"),
        to_date(expr("timestamp_micros(ts_ns div 1000)")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val win = daily
      .join(
        daily.select(
          col("event_type").as("et2"),
          col("day").as("wday"),
          col("cnt").as("wcnt")),
        col("event_type") === col("et2") &&
          expr("datediff(day, wday)").between(0, 6))
    val wr = Window
      .partitionBy(col("event_type"), col("day"))
      .orderBy(col("wcnt").asc, col("wday").asc)
    win
      .withColumn("rn", row_number().over(wr))
      .withColumn(
        "n_win",
        count(lit(1)).over(Window.partitionBy(col("event_type"), col("day"))))
      .where(col("rn") === expr("(n_win + 1) div 2"))
      .select(
        col("event_type"),
        col("day").cast("string").as("day"),
        col("cnt"),
        col("n_win").cast("long").as("n_win"),
        col("wcnt").as("med7"))
      .orderBy(col("event_type"), col("day"))
  }

  val q187Oracle: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2
      |), win AS (
      |  SELECT a.event_type, a.day, a.cnt, b.day AS wday, b.cnt AS wcnt
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type
      |   AND a.day - b.day BETWEEN 0 AND 6
      |), rk AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type, day ORDER BY wcnt ASC, wday ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type, day) AS n_win
      |  FROM win
      |)
      |SELECT event_type, CAST(day AS VARCHAR) AS day, cnt,
      |  CAST(n_win AS BIGINT) AS n_win, wcnt AS med7
      |FROM rk WHERE rn = (n_win + 1) // 2
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- q188
  /** BENFORD FIRST-DIGIT AUDIT — the data-quality screen for fabricated
    * or truncated numeric columns: per event type, the first-digit
    * distribution of positive cent values against Benford's
    * log10(1 + 1/d), with a scaled chi-square statistic. The Benford
    * masses are fixed 1e-6-grid integer literals (transcendental-free
    * recipe), the digit comes from the decimal string head (no
    * floating log10), and the chi-square numerator (obs·10⁶ − n·p)²
    * reaches ~4e20 — per-row INT64 overflow, so it rides
    * decimal(38,0)/HUGEINT (the q170/q182 widen-first lesson).
    */
  def q188Benford(s: SparkSession, dir: String): DataFrame = {
    val p6 = Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L, 51152L, 45757L)
    val ev = Tables
      .events(s, dir)
      .select(
        col("event_type"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
      .where(col("cents") > 0)
      .withColumn("d", expr("cast(substring(cast(cents as string), 1, 1) as int)"))
    val obs = ev.groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("obs"))
    val totals = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    import s.implicits._
    val bexp = Seq.tabulate(9)(i => (i + 1, p6(i))).toDF("d_e", "p_e6")
    val obs2 = obs.withColumnsRenamed(Map("event_type" -> "o_et", "d" -> "o_d"))
    val full = totals
      .crossJoin(bexp)
      .join(obs2, col("event_type") === col("o_et") && col("d_e") === col("o_d"), "left")
      .select(
        col("event_type"),
        col("d_e"),
        coalesce(col("obs"), lit(0L)).as("obs"),
        col("n"),
        col("p_e6"))
    val chi = full
      .withColumn(
        "dev2",
        expr("(cast(obs as decimal(38,0)) * 1000000 - cast(n as decimal(38,0)) * p_e6) * " +
          "(cast(obs as decimal(38,0)) * 1000000 - cast(n as decimal(38,0)) * p_e6)"))
      .withColumn("term", expr("cast(dev2 div (cast(n as decimal(38,0)) * p_e6 * 1000000) as bigint)"))
    chi
      .groupBy(col("event_type"), col("n"))
      .agg(
        sum(when(col("d_e") === 1, col("obs")).otherwise(0L)).as("obs_d1"),
        sum(when(col("d_e") === 9, col("obs")).otherwise(0L)).as("obs_d9"),
        sum(col("term")).as("chi2_scaled"))
      .orderBy(col("event_type"))
  }

  val q188Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(floor("value" * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |), pos AS (
      |  SELECT event_type,
      |    CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS d
      |  FROM ev WHERE cents > 0
      |), obs AS (SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS obs FROM pos GROUP BY 1, 2),
      |totals AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM pos GROUP BY 1),
      |bexp AS (
      |  SELECT CAST(u.d AS INT) AS d_e, u.p AS p_e6 FROM (
      |    SELECT unnest([1,2,3,4,5,6,7,8,9]) AS d,
      |           unnest([301029,176091,124938,96910,79181,66946,57991,51152,45757]) AS p) u
      |), fl AS (
      |  SELECT t.event_type, b.d_e, COALESCE(o.obs, 0) AS obs, t.n, b.p_e6
      |  FROM totals t CROSS JOIN bexp b
      |  LEFT JOIN obs o ON o.event_type = t.event_type AND o.d = b.d_e
      |), chi AS (
      |  SELECT event_type, n, d_e, obs,
      |    CAST(((CAST(obs AS HUGEINT) * 1000000 - CAST(n AS HUGEINT) * p_e6) *
      |          (CAST(obs AS HUGEINT) * 1000000 - CAST(n AS HUGEINT) * p_e6))
      |         // (CAST(n AS HUGEINT) * p_e6 * 1000000) AS BIGINT) AS term
      |  FROM fl
      |)
      |SELECT event_type, n,
      |  CAST(SUM(CASE WHEN d_e = 1 THEN obs ELSE 0 END) AS BIGINT) AS obs_d1,
      |  CAST(SUM(CASE WHEN d_e = 9 THEN obs ELSE 0 END) AS BIGINT) AS obs_d9,
      |  CAST(SUM(term) AS BIGINT) AS chi2_scaled
      |FROM chi
      |GROUP BY event_type, n
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q189
  /** WEIGHTED MEDIAN via the distributed prefix sum
    * ([[graft.ops.Sweep.orderedPrefixSum]]) — per return flag, the
    * smallest price whose cumulative quantity weight reaches half the
    * total. Weights pre-aggregate per (flag, price) so the order key
    * is UNIQUE within each group — the (l_orderkey, l_linenumber)
    * non-uniqueness gotcha never enters — and the crossing-point
    * definition (min price with cum ≥ ⌈W/2⌉) is tie-free by
    * construction. The cumulative sum is the range-binned two-pass;
    * the oracle replays the plain single window it must equal.
    */
  def q189WeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(s, dir)
      .select(
        col("l_returnflag").as("flag"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("pc"),
        expr("cast(floor(l_quantity + 0.5) as bigint)").as("w"))
    val byPrice = li.groupBy(col("flag"), col("pc")).agg(sum(col("w")).as("wsum"))
    val cum = graft.ops.Sweep.orderedPrefixSum(
      byPrice, Seq("flag"), col("pc"), col("pc"), col("wsum"), "cumw")
    val tot = byPrice
      .groupBy(col("flag"))
      .agg(sum(col("wsum")).as("wtot"))
      .withColumnRenamed("flag", "__tf")
    cum
      .join(broadcast(tot), col("flag") === col("__tf"))
      .where(col("cumw") * 2 >= col("wtot"))
      .groupBy(col("flag"), col("wtot"))
      .agg(min(col("pc")).as("wmedian_cents"))
      .select(col("flag"), col("wtot"), col("wmedian_cents"))
      .orderBy(col("flag"))
  }

  val q189Oracle: String =
    """WITH li AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
      |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS w
      |  FROM lineitem
      |), bp AS (
      |  SELECT flag, pc, CAST(SUM(w) AS BIGINT) AS wsum FROM li GROUP BY flag, pc
      |), c AS (
      |  SELECT flag, pc, wsum,
      |    SUM(wsum) OVER (PARTITION BY flag ORDER BY pc ROWS UNBOUNDED PRECEDING) AS cumw
      |  FROM bp
      |), t AS (SELECT flag, CAST(SUM(wsum) AS BIGINT) AS wtot FROM bp GROUP BY flag)
      |SELECT c.flag, t.wtot, CAST(MIN(c.pc) AS BIGINT) AS wmedian_cents
      |FROM c JOIN t ON c.flag = t.flag
      |WHERE c.cumw * 2 >= t.wtot
      |GROUP BY c.flag, t.wtot
      |ORDER BY c.flag""".stripMargin

  // ---------------------------------------------------------------- q190
  /** JOURNEY PATTERN MINING — each user's event history collapses to an
    * ordered initial string ('v','c','p','s','e' by the exact
    * (ts, event_id) order), and a pattern table counts the users whose
    * journey matches each regex: the anywhere-funnel v.*c.*p, the
    * adjacency vc, repeat purchase p.*p, starts-with-signup ^s, and
    * ends-in-error e$. Construction is one sorted struct collect per
    * user (Spark) ≡ ordered string_agg (DuckDB) — the deterministic
    * sequence-to-string recipe; the regex subset (classes, anchors,
    * dot-star) is engine-portable.
    */
  def q190JourneyPatterns(s: SparkSession, dir: String): DataFrame = {
    val pats = Seq("v.*c.*p", "vc", "p.*p", "^s", "e$")
    val ev = Tables
      .events(s, dir)
      .select(
        col("user_id"),
        col("ts_ns"),
        col("event_id"),
        expr("substring(event_type, 1, 1)").as("ini"))
    import s.implicits._
    val journeys = ev
      .groupBy(col("user_id"))
      .agg(
        array_join(
          expr("transform(array_sort(collect_list(struct(ts_ns, event_id, ini))), x -> x.ini)"),
          "").as("j"))
    pats
      .toDF("pattern")
      .crossJoin(journeys)
      .groupBy(col("pattern"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(expr("case when regexp_like(j, pattern) then 1 else 0 end")).as("n_matched"))
      .orderBy(col("pattern"))
  }

  val q190Oracle: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS t, event_id, substr(event_type, 1, 1) AS ini
      |  FROM events
      |), j AS (
      |  SELECT user_id, string_agg(ini, '' ORDER BY t, event_id) AS j
      |  FROM e GROUP BY user_id
      |), pats AS (
      |  SELECT unnest(['v.*c.*p', 'vc', 'p.*p', '^s', 'e$']) AS pattern
      |)
      |SELECT pattern,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(CASE WHEN regexp_matches(j.j, pattern) THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
      |FROM pats CROSS JOIN j
      |GROUP BY pattern
      |ORDER BY pattern""".stripMargin

  // ---------------------------------------------------------------- q191
  /** CLAMPED RUNNING BALANCE ([[graft.ops.Sweep.clampedRunningSum]]) —
    * per-user inventory-style level where purchases draw down and other
    * events deposit, floored at zero: level_i = max(0, level_{i−1} +
    * delta_i). The sequential-looking recurrence is computed
    * declaratively via the two-window identity level = cum − min(0,
    * running-min(cum)) — ClampedLawSpec PROVES the identity against
    * the sequential fold; the oracle replays the same windows, so the
    * cross-engine check pins the arithmetic and the spec pins the
    * semantics. Outputs per user: final level (struct-ordered last),
    * max level, floor-hit count.
    */
  def q191ClampedBalance(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .select(
        col("user_id"),
        col("ts_ns"),
        col("event_id"),
        when(
          col("event_type") === "purchase",
          -expr("cast(floor(value * 100 + 0.5) as bigint)"))
          .otherwise(expr("cast(floor(value * 100 + 0.5) as bigint)")).as("delta"))
    val lvl = graft.ops.Sweep.clampedRunningSum(
      ev, Seq("user_id"), col("ts_ns"), col("event_id"), col("delta"), "lvl")
    lvl
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("lvl")).as("max_lvl"),
        max(struct(col("ts_ns"), col("event_id"), col("lvl")))
          .getField("lvl").as("final_lvl"),
        sum((col("lvl") === 0).cast("long")).as("n_floor_hits"))
      .orderBy(col("user_id"))
  }

  val q191Oracle: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS t, event_id,
      |    CASE WHEN event_type = 'purchase'
      |         THEN -CAST(floor("value" * 100 + 0.5) AS BIGINT)
      |         ELSE CAST(floor("value" * 100 + 0.5) AS BIGINT) END AS delta
      |  FROM events
      |), c AS (
      |  SELECT user_id, t, event_id,
      |    SUM(delta) OVER (PARTITION BY user_id ORDER BY t, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM e
      |), l AS (
      |  SELECT user_id, t, event_id,
      |    cum - LEAST(0, MIN(cum) OVER (PARTITION BY user_id ORDER BY t, event_id
      |                                  ROWS UNBOUNDED PRECEDING)) AS lvl
      |  FROM c
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY t DESC, event_id DESC) AS rd
      |  FROM l
      |)
      |SELECT user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(MAX(lvl) AS BIGINT) AS max_lvl,
      |  CAST(MAX(CASE WHEN rd = 1 THEN lvl END) AS BIGINT) AS final_lvl,
      |  CAST(SUM(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_floor_hits
      |FROM r
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q192
  /** EXACT MERGEABLE DISTINCT — the bitmap-rollup law HLL only
    * approximates: daily per-(type, day) distinct-user sets materialize
    * as sorted id arrays (the partial), weekly counts come from FOLDING
    * the daily partials with array_union — never rescanning the base —
    * and the law `|merged| = direct COUNT(DISTINCT)` is pinned per
    * cell, alongside the naive Σ(daily distinct) overcount that
    * motivates mergeable structures in the first place. Weeks are
    * epoch-day div 7 (integer, engine-portable — weekofyear semantics
    * are not).
    */
  def q192MergeableDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .select(
        col("event_type"),
        expr("(ts_ns div 86400000000000)").as("eday"),
        expr("((ts_ns div 86400000000000) div 7)").as("wk"),
        col("user_id"))
    val daily = ev
      .groupBy(col("event_type"), col("wk"), col("eday"))
      .agg(
        sort_array(collect_set(col("user_id"))).as("u_arr"),
        countDistinct(col("user_id")).as("n_day"))
    val weekly = daily
      .groupBy(col("event_type"), col("wk"))
      .agg(
        expr(
          "size(aggregate(collect_list(u_arr), cast(array() as array<bigint>), (acc, x) -> array_union(acc, x)))")
          .cast("long").as("n_merged"),
        sum(col("n_day")).as("sum_daily"))
    val direct = ev
      .groupBy(col("event_type"), col("wk"))
      .agg(countDistinct(col("user_id")).as("n_direct"))
    weekly
      .join(direct, Seq("event_type", "wk"))
      .select(
        col("event_type"),
        col("wk"),
        col("n_direct"),
        col("n_merged"),
        col("sum_daily"),
        (col("n_merged") === col("n_direct")).as("merge_law_ok"),
        (col("sum_daily") - col("n_direct")).as("naive_overcount"))
      .orderBy(col("event_type"), col("wk"))
  }

  val q192Oracle: String =
    """WITH ev AS (
      |  SELECT event_type,
      |    epoch_ns(ts) // 86400000000000 AS eday,
      |    (epoch_ns(ts) // 86400000000000) // 7 AS wk,
      |    user_id
      |  FROM events
      |), daily AS (
      |  SELECT event_type, wk, eday, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_day
      |  FROM ev GROUP BY 1, 2, 3
      |), weekly AS (
      |  SELECT event_type, wk, CAST(SUM(n_day) AS BIGINT) AS sum_daily
      |  FROM daily GROUP BY 1, 2
      |), direct AS (
      |  SELECT event_type, wk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_direct
      |  FROM ev GROUP BY 1, 2
      |)
      |SELECT d.event_type, CAST(d.wk AS BIGINT) AS wk, d.n_direct,
      |  d.n_direct AS n_merged,
      |  w.sum_daily,
      |  TRUE AS merge_law_ok,
      |  w.sum_daily - d.n_direct AS naive_overcount
      |FROM direct d JOIN weekly w ON d.event_type = w.event_type AND d.wk = w.wk
      |ORDER BY d.event_type, d.wk""".stripMargin

  // ---------------------------------------------------------------- q193
  /** FUNNEL TIME-TO-CONVERT — users whose first purchase follows their
    * first view, with DISCRETE p50/p90 of the conversion latency
    * (rank-selected order statistics, the q92/q97 recipe — interpolated
    * quantiles diverge cross-engine): order latencies by (latency,
    * user_id), p50 at row (n+1) div 2, p90 at row (9n) div 10 + 1.
    * Latencies in whole milliseconds.
    */
  def q193TimeToConvert(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val firsts = ev
      .where(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts_ns"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("ts_ns"))).as("first_purchase"))
      .where(
        col("first_view").isNotNull && col("first_purchase").isNotNull &&
          col("first_purchase") > col("first_view"))
      .select(
        col("user_id"),
        expr("(first_purchase - first_view) div 1000000").as("tt_ms"))
    val w = Window.orderBy(col("tt_ms").asc, col("user_id").asc)
    val ranked = firsts
      .withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(firsts.agg(count(lit(1)).as("n"))))
    ranked
      .where(
        col("rn") === expr("(n + 1) div 2") || col("rn") === expr("(n * 9) div 10 + 1"))
      .groupBy(col("n"))
      .agg(
        min(when(col("rn") === expr("(n + 1) div 2"), col("tt_ms"))).as("p50_ms"),
        min(when(col("rn") === expr("(n * 9) div 10 + 1"), col("tt_ms"))).as("p90_ms"))
      .select(col("n").as("n_converting"), col("p50_ms"), col("p90_ms"))
  }

  val q193Oracle: String =
    """WITH f AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS fv,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS fp
      |  FROM events WHERE event_type IN ('view', 'purchase')
      |  GROUP BY user_id
      |), c AS (
      |  SELECT user_id, (fp - fv) // 1000000 AS tt_ms
      |  FROM f WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp > fv
      |), r AS (
      |  SELECT *, row_number() OVER (ORDER BY tt_ms ASC, user_id ASC) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM c
      |)
      |SELECT CAST(n AS BIGINT) AS n_converting,
      |  CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN tt_ms END) AS BIGINT) AS p50_ms,
      |  CAST(MIN(CASE WHEN rn = (n * 9) // 10 + 1 THEN tt_ms END) AS BIGINT) AS p90_ms
      |FROM r
      |WHERE rn = (n + 1) // 2 OR rn = (n * 9) // 10 + 1
      |GROUP BY n""".stripMargin

  // ---------------------------------------------------------------- q194
  /** RFM SEGMENTATION — the classic marketing cube: per user, Recency
    * (last purchase instant), Frequency (purchase count), Monetary
    * (cent sum), each cut into quintiles by ntile(5) over a TOTAL
    * order ((metric desc, user_id) — ntile under ties is
    * order-dependent, so the tiebreak is part of the definition);
    * output is the populated (r, f, m) cells with user counts and
    * monetary mass. Users who never purchased are excluded up front
    * (their R/M are undefined, not zero).
    */
  def q194Rfm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables
      .events(s, dir)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        max(col("ts_ns")).as("last_p"),
        count(lit(1)).as("freq"),
        sum(expr("cast(floor(value * 100 + 0.5) as bigint)")).as("cents"))
    val rq = Window.orderBy(col("last_p").desc, col("user_id").asc)
    val fq = Window.orderBy(col("freq").desc, col("user_id").asc)
    val mq = Window.orderBy(col("cents").desc, col("user_id").asc)
    p.withColumn("r_q", ntile(5).over(rq))
      .withColumn("f_q", ntile(5).over(fq))
      .withColumn("m_q", ntile(5).over(mq))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("cents_total"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  val q194Oracle: String =
    """WITH p AS (
      |  SELECT user_id, MAX(epoch_ns(ts)) AS last_p,
      |    CAST(COUNT(*) AS BIGINT) AS freq,
      |    CAST(SUM(CAST(floor("value" * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY user_id
      |), q AS (
      |  SELECT *,
      |    ntile(5) OVER (ORDER BY last_p DESC, user_id ASC) AS r_q,
      |    ntile(5) OVER (ORDER BY freq DESC, user_id ASC) AS f_q,
      |    ntile(5) OVER (ORDER BY cents DESC, user_id ASC) AS m_q
      |  FROM p
      |)
      |SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q, CAST(m_q AS INT) AS m_q,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(cents) AS BIGINT) AS cents_total
      |FROM q
      |GROUP BY r_q, f_q, m_q
      |ORDER BY r_q, f_q, m_q""".stripMargin

  // ---------------------------------------------------------------- q195
  /** FIFO LOT DEPLETION — first-in-first-out inventory matching made
    * declarative: per part, 'A'-flag lines are restock lots in
    * (shipdate, orderkey, linenumber) order and 'R'-flag demand D
    * consumes them front to back. The sequential matching has a closed
    * prefix-sum form:
    *
    *   consumed_i = clamp(D − lot_start_i, 0, size_i)
    *
    * where lot_start_i is the exclusive cumulative size. Two FIFO laws
    * are certified in-row: Σ consumed = min(D, supply) per part, and
    * at most ONE partially-consumed lot per part — both aggregated as
    * violation counts pinned 0.
    */
  def q195Fifo(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables
      .lineitem(s, dir)
      .select(
        col("l_partkey").as("pk"),
        col("l_returnflag").as("fl"),
        col("l_shipdate"),
        col("l_orderkey"),
        col("l_linenumber"),
        expr("cast(floor(l_quantity + 0.5) as bigint)").as("qty"))
    val demand = li
      .where(col("fl") === "R")
      .groupBy(col("pk"))
      .agg(sum(col("qty")).as("d"))
    val w = Window
      .partitionBy(col("pk"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lots = li
      .where(col("fl") === "A")
      .withColumn("cum", sum(col("qty")).over(w))
      .withColumn("lot_start", col("cum") - col("qty"))
      .join(demand, Seq("pk"), "left")
      .na
      .fill(0L, Seq("d"))
      .withColumn(
        "consumed",
        greatest(lit(0L), least(col("qty"), col("d") - col("lot_start"))))
    val perPart = lots
      .groupBy(col("pk"), col("d"))
      .agg(
        sum(col("qty")).as("supply"),
        sum(col("consumed")).as("consumed_sum"),
        sum((col("consumed") === col("qty")).cast("long")).as("n_depleted"),
        sum((col("consumed") > 0 && col("consumed") < col("qty")).cast("long")).as("n_partial"))
    perPart
      .groupBy(expr("pk div 1000").as("bucket"))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("consumed_sum")).as("sum_consumed"),
        sum(col("n_depleted")).as("n_depleted_lots"),
        sum((col("consumed_sum") =!= least(col("d"), col("supply"))).cast("long"))
          .as("conservation_violations"),
        sum((col("n_partial") > 1).cast("long")).as("partial_lot_violations"))
      .orderBy(col("bucket"))
  }

  val q195Oracle: String =
    """WITH li AS (
      |  SELECT l_partkey AS pk, l_returnflag AS fl, l_shipdate, l_orderkey,
      |    l_linenumber, CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
      |  FROM lineitem
      |), dem AS (
      |  SELECT pk, CAST(SUM(qty) AS BIGINT) AS d FROM li WHERE fl = 'R' GROUP BY pk
      |), lots AS (
      |  SELECT li.pk, li.qty,
      |    SUM(qty) OVER (PARTITION BY li.pk
      |                   ORDER BY l_shipdate, l_orderkey, l_linenumber
      |                   ROWS UNBOUNDED PRECEDING) - qty AS lot_start,
      |    COALESCE(dem.d, 0) AS d
      |  FROM li LEFT JOIN dem ON dem.pk = li.pk
      |  WHERE fl = 'A'
      |), c AS (
      |  SELECT pk, d, qty,
      |    GREATEST(0, LEAST(qty, d - lot_start)) AS consumed
      |  FROM lots
      |), pp AS (
      |  SELECT pk, d, CAST(SUM(qty) AS BIGINT) AS supply,
      |    CAST(SUM(consumed) AS BIGINT) AS consumed_sum,
      |    CAST(SUM(CASE WHEN consumed = qty THEN 1 ELSE 0 END) AS BIGINT) AS n_depleted,
      |    CAST(SUM(CASE WHEN consumed > 0 AND consumed < qty THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
      |  FROM c GROUP BY pk, d
      |)
      |SELECT CAST(pk // 1000 AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  CAST(SUM(consumed_sum) AS BIGINT) AS sum_consumed,
      |  CAST(SUM(n_depleted) AS BIGINT) AS n_depleted_lots,
      |  CAST(SUM(CASE WHEN consumed_sum <> LEAST(d, supply) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS conservation_violations,
      |  CAST(SUM(CASE WHEN n_partial > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS partial_lot_violations
      |FROM pp
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q196
  /** ISO WEEKDAY CERTIFICATE — day-of-week semantics differ per engine
    * (Spark's dayofweek is 1 = Sunday; DuckDB's isodow is 1 = Monday):
    * the portable formula `((dayofweek + 5) % 7) + 1` lands Spark on
    * ISO numbering, and the English day NAME (date_format 'EEEE' ↔
    * dayname) rides along as a second witness. Per ISO weekday:
    * events, purchase share ppm.
    */
  def q196IsoWeekday(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .select(
        to_date(expr("timestamp_micros(ts_ns div 1000)")).as("day"),
        col("event_type"))
      .withColumn("isodow", expr("((dayofweek(day) + 5) % 7) + 1"))
      .withColumn("dow_name", expr("date_format(day, 'EEEE')"))
      .groupBy(col("isodow"), col("dow_name"))
      .agg(
        count(lit(1)).as("n"),
        sum((col("event_type") === "purchase").cast("long")).as("n_purchase"))
      .select(
        col("isodow"),
        col("dow_name"),
        col("n"),
        expr("cast((n_purchase * 1000000) div n as bigint)").as("purchase_ppm"))
      .orderBy(col("isodow"))

  val q196Oracle: String =
    """WITH e AS (
      |  SELECT CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day, event_type
      |  FROM events
      |)
      |SELECT CAST(isodow(day) AS INT) AS isodow,
      |  dayname(day) AS dow_name,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST((SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 1000000)
      |       // COUNT(*) AS BIGINT) AS purchase_ppm
      |FROM e
      |GROUP BY isodow(day), dayname(day)
      |ORDER BY isodow""".stripMargin

  // ---------------------------------------------------------------- q197
  /** UNICODE STRING CERTIFICATE — code-point vs byte semantics across
    * the string surface on adversarial samples (combining accents,
    * Greek, CJK, an astral-plane emoji, padding): length counts CODE
    * POINTS on both engines (the emoji is 1, not 2 UTF-16 units),
    * octet_length/strlen counts bytes, substring/instr/left/right/
    * reverse/lpad are all code-point-indexed, and case mapping agrees
    * on the Latin/Greek samples. Pinning the pairs (length,
    * octet_length) is what certifies neither engine silently falls
    * back to byte indexing.
    */
  def q197Unicode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val samples = Seq("héllo wörld", "ΚΌΣΜΕ", "こんにちは", "a😀b", "  pad  ", "a,b,c")
    samples
      .toDF("t")
      .select(
        col("t"),
        length(col("t")).as("n_chars"),
        expr("octet_length(t)").as("n_bytes"),
        upper(col("t")).as("up"),
        lower(col("t")).as("lo"),
        expr("substring(t, 2, 3)").as("sub23"),
        expr("instr(t, 'l')").as("pos_l"),
        reverse(col("t")).as("rev"),
        expr("left(t, 2)").as("l2"),
        expr("right(t, 2)").as("r2"),
        expr("lpad(t, 8, '-')").as("pad8"),
        expr("trim(t)").as("trimmed"),
        expr("split_part(t, ',', 2)").as("csv2"))
      .orderBy(col("t"))
  }

  val q197Oracle: String =
    """WITH s AS (
      |  SELECT unnest(['héllo wörld', 'ΚΌΣΜΕ', 'こんにちは', 'a😀b', '  pad  ', 'a,b,c']) AS t
      |)
      |SELECT t,
      |  CAST(length(t) AS INT) AS n_chars,
      |  CAST(strlen(t) AS INT) AS n_bytes,
      |  upper(t) AS up,
      |  lower(t) AS lo,
      |  substr(t, 2, 3) AS sub23,
      |  CAST(strpos(t, 'l') AS INT) AS pos_l,
      |  reverse(t) AS rev,
      |  left(t, 2) AS l2,
      |  right(t, 2) AS r2,
      |  lpad(t, 8, '-') AS pad8,
      |  trim(t) AS trimmed,
      |  split_part(t, ',', 2) AS csv2
      |FROM s
      |ORDER BY t""".stripMargin

  // ---------------------------------------------------------------- q198
  /** NEGATIVE INTEGER DIVISION CERTIFICATE — `div` / `%` / `pmod` on a
    * signed grid. Both engines truncate integral division toward zero
    * and give `%` the dividend's sign (probed; NOT universal — Python
    * floors both), so the certificate pins: (a) truncation on the
    * full signed grid, (b) the Euclidean identity a = b·(a div b) +
    * a % b, (c) Spark's ACTUAL pmod rule — `if (a % b < 0)
    * ((a % b) + b) % b else a % b` — which for NEGATIVE moduli is NOT
    * the textbook ((a%b)+b)%b emulation (measured: pmod(1, −3) = 1,
    * emulation −2) and is only non-negative when b > 0
    * (pmod(−1, −3) = −1); the oracle replicates the rule verbatim and
    * the non-negativity law is scoped to positive b, and (d) floor
    * division recovered as (a − pmod) div b for b > 0. The law columns
    * make any future engine change (or a floor-semantics port) turn
    * the row red.
    */
  def q198IntDivision(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grid = for { a <- Seq(-7L, -3L, -1L, 0L, 1L, 3L, 7L); b <- Seq(-3L, -2L, 2L, 3L) } yield (a, b)
    grid
      .toDF("a", "b")
      .select(
        col("a"),
        col("b"),
        expr("a div b").as("q_trunc"),
        expr("a % b").as("r_sign"),
        expr("pmod(a, b)").as("r_pos"),
        expr("case when b > 0 then (a - pmod(a, b)) div b else a div b end").as("q_floor"),
        expr("b * (a div b) + (a % b) = a").as("euclid_ok"),
        expr("b < 0 or pmod(a, b) >= 0").as("pmod_nonneg_ok"))
      .orderBy(col("a"), col("b"))
  }

  val q198Oracle: String =
    """WITH g AS (
      |  SELECT a.a, b.b
      |  FROM (SELECT unnest([-7, -3, -1, 0, 1, 3, 7]) AS a) a,
      |       (SELECT unnest([-3, -2, 2, 3]) AS b) b
      |)
      |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
      |  CAST(a // b AS BIGINT) AS q_trunc,
      |  CAST(a % b AS BIGINT) AS r_sign,
      |  CAST(CASE WHEN (a % b) < 0 THEN ((a % b) + b) % b ELSE a % b END AS BIGINT) AS r_pos,
      |  CAST(CASE WHEN b > 0
      |       THEN (a - CASE WHEN (a % b) < 0 THEN ((a % b) + b) % b ELSE a % b END) // b
      |       ELSE a // b END AS BIGINT) AS q_floor,
      |  (b * (a // b) + (a % b) = a) AS euclid_ok,
      |  (b < 0 OR CASE WHEN (a % b) < 0 THEN ((a % b) + b) % b ELSE a % b END >= 0) AS pmod_nonneg_ok
      |FROM g
      |ORDER BY a, b""".stripMargin

  // ---------------------------------------------------------------- q199
  /** LOG₂-BUCKETED HISTOGRAM (HdrHistogram-style) — latency/value
    * histograms at scale use power-of-two buckets so the bucket id is
    * integer arithmetic, not a transcendental: floor(log2(x)) =
    * length(bin(x)) − 1 (the binary string length — engine-portable
    * and exact where a float log2 would wobble on boundary values like
    * exactly 2^k). Per (type, bucket): count, bucket bounds via
    * shiftleft, share and cumulative share in exact ppm.
    */
  def q199LogHistogram(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables
      .events(s, dir)
      .select(
        col("event_type"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
      .where(col("cents") > 0)
      .withColumn("bucket", expr("cast(length(bin(cents)) - 1 as int)"))
    val h = ev.groupBy(col("event_type"), col("bucket")).agg(count(lit(1)).as("n"))
    val wt = Window.partitionBy(col("event_type"))
    val wc = Window
      .partitionBy(col("event_type"))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("total", sum(col("n")).over(wt))
      .withColumn("cum", sum(col("n")).over(wc))
      .select(
        col("event_type"),
        col("bucket"),
        expr("shiftleft(1L, bucket)").as("lo_cents"),
        expr("shiftleft(1L, bucket + 1) - 1").as("hi_cents"),
        col("n"),
        expr("cast((n * 1000000) div total as bigint)").as("share_ppm"),
        expr("cast((cum * 1000000) div total as bigint)").as("cum_ppm"))
      .orderBy(col("event_type"), col("bucket"))
  }

  val q199Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(floor("value" * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |), b AS (
      |  SELECT event_type, CAST(length(bin(cents)) - 1 AS INT) AS bucket
      |  FROM ev WHERE cents > 0
      |), h AS (
      |  SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM b GROUP BY 1, 2
      |), w AS (
      |  SELECT *, SUM(n) OVER (PARTITION BY event_type) AS total,
      |    SUM(n) OVER (PARTITION BY event_type ORDER BY bucket
      |                 ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM h
      |)
      |SELECT event_type, bucket,
      |  CAST(1 << bucket AS BIGINT) AS lo_cents,
      |  CAST((1 << (bucket + 1)) - 1 AS BIGINT) AS hi_cents,
      |  n,
      |  CAST((n * 1000000) // total AS BIGINT) AS share_ppm,
      |  CAST((cum * 1000000) // total AS BIGINT) AS cum_ppm
      |FROM w
      |ORDER BY event_type, bucket""".stripMargin

  // ---------------------------------------------------------------- q200
  /** DAILY OPERATIONS DASHBOARD — the analytics-family capstone (the
    * event-side sibling of q120's curation capstone): ONE dataflow per
    * UTC day composing this round's certified laws — q37 gap
    * sessionization (sessions started), q167's sweep-line concurrency
    * (daily peak of open sessions, global two-pass prefix sum), the
    * purchase/revenue cents grid, exact distinct users, and a
    * struct-ordered top event type. The oracle replays the full chain;
    * every constituent law is individually certified upstream, so a
    * red row here localizes to the COMPOSITION.
    */
  def q200DailyDashboard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val GapNs = 1800000000000L
    val ev = Tables
      .events(s, dir)
      .select(
        col("user_id"), col("event_id"), col("ts_ns"), col("event_type"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
      .withColumn("day", to_date(expr("timestamp_micros(ts_ns div 1000)")))
    // per-day core stats
    val core = ev
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum((col("event_type") === "purchase").cast("long")).as("n_purchases"),
        sum(when(col("event_type") === "purchase", col("cents")).otherwise(0L))
          .as("revenue_cents"))
    // top event type per day (deterministic argmax: count desc, type asc)
    val topType = ev
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("day"))
      .agg(max(struct(col("cnt"), expr("- ascii(event_type)").as("na"), col("event_type")))
        .getField("event_type").as("top_type"))
    // sessions started per day (q37 law; session start day)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val starts = ev
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
      .where(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > GapNs)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions_started"))
    // daily peak concurrency (q167 law, global sweep)
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = ev
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
      .withColumn(
        "is_new",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > GapNs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("is_new")).over(wr))
    val iv = sess
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_ns")).as("st"), (max(col("ts_ns")) + lit(GapNs)).as("en"))
    val deltas = iv
      .select(col("st").as("t"), lit(1L).as("sign"))
      .unionByName(iv.select(col("en").as("t"), lit(-1L).as("sign")))
      .groupBy(col("t"), col("sign"))
      .agg(sum(col("sign")).as("net"))
    val run = graft.ops.Sweep
      .orderedPrefixSum(deltas, Nil, col("t"), col("sign"), col("net"), "level")
      .withColumn("day", to_date(expr("timestamp_micros(t div 1000)")))
    val peaks = run.groupBy(col("day")).agg(max(col("level")).cast("long").as("peak_concurrency"))
    core
      .join(topType, Seq("day"))
      .join(starts, Seq("day"), "left")
      .join(peaks, Seq("day"), "left")
      .na
      .fill(0L, Seq("n_sessions_started", "peak_concurrency"))
      .select(
        col("day").cast("string").as("day"),
        col("n_events"),
        col("n_users"),
        col("n_sessions_started"),
        col("peak_concurrency"),
        col("n_purchases"),
        expr("cast((n_purchases * 1000000) div n_events as bigint)").as("purchase_ppm"),
        col("revenue_cents"),
        col("top_type"))
      .orderBy(col("day"))
  }

  val q200Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS t, event_type,
      |    CAST(floor("value" * 100 + 0.5) AS BIGINT) AS cents,
      |    CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day
      |  FROM events
      |), core AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END) AS BIGINT) AS revenue_cents
      |  FROM ev GROUP BY day
      |), tt AS (
      |  SELECT day, event_type AS top_type FROM (
      |    SELECT day, event_type,
      |      row_number() OVER (PARTITION BY day ORDER BY COUNT(*) DESC, event_type ASC) AS rn
      |    FROM ev GROUP BY day, event_type) x
      |  WHERE rn = 1
      |), m AS (
      |  SELECT user_id, event_id, t, day,
      |    lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pt
      |  FROM ev
      |), st AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_sessions_started
      |  FROM m WHERE pt IS NULL OR t - pt > 1800000000000
      |  GROUP BY day
      |), sid AS (
      |  SELECT user_id, t,
      |    SUM(CASE WHEN pt IS NULL OR t - pt > 1800000000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m
      |), iv AS (
      |  SELECT user_id, sid, MIN(t) AS s, MAX(t) + 1800000000000 AS e
      |  FROM sid GROUP BY user_id, sid
      |), d AS (
      |  SELECT s AS t, CAST(1 AS BIGINT) AS sign FROM iv
      |  UNION ALL SELECT e, CAST(-1 AS BIGINT) FROM iv
      |), nd AS (SELECT t, sign, SUM(sign) AS net FROM d GROUP BY t, sign),
      |r AS (
      |  SELECT t, SUM(net) OVER (ORDER BY t, sign ROWS UNBOUNDED PRECEDING) AS level
      |  FROM nd
      |), pk AS (
      |  SELECT CAST(make_timestamp(t // 1000) AS DATE) AS day,
      |    CAST(MAX(level) AS BIGINT) AS peak_concurrency
      |  FROM r GROUP BY 1
      |)
      |SELECT CAST(core.day AS VARCHAR) AS day, core.n_events, core.n_users,
      |  COALESCE(st.n_sessions_started, 0) AS n_sessions_started,
      |  COALESCE(pk.peak_concurrency, 0) AS peak_concurrency,
      |  core.n_purchases,
      |  CAST((core.n_purchases * 1000000) // core.n_events AS BIGINT) AS purchase_ppm,
      |  core.revenue_cents,
      |  tt.top_type
      |FROM core
      |JOIN tt ON tt.day = core.day
      |LEFT JOIN st ON st.day = core.day
      |LEFT JOIN pk ON pk.day = core.day
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q201
  /** GEO GRID INDEX ([[graft.ops.Geo]]) — stations (synthetic
    * micro-degree lat/lon from supplier keys, both engines replay the
    * LCG) bucketed into 10° truncating-division cells; per cell the
    * station count and the nearest station to the cell center by EXACT
    * squared integer distance (struct-ordered argmin, (d2, suppkey)
    * tiebreak). No trig, no sqrt — the transcendental-free spatial
    * recipe; nearest/containment decisions are order-equivalent under
    * squaring.
    */
  def q201GeoGrid(s: SparkSession, dir: String): DataFrame = {
    val st = Tables
      .supplier(s, dir)
      .select(col("s_suppkey").as("sk"))
      .withColumn("lat", expr("((sk * 2654435761) % 120000000) - 60000000"))
      .withColumn("lon", expr("((sk * 2246822519) % 360000000) - 180000000"))
    val W = 10000000L
    st.withColumn("cr", expr(s"lat div $W"))
      .withColumn("cc", expr(s"lon div $W"))
      .withColumn("clat", col("cr") * W + lit(W / 2))
      .withColumn("clon", col("cc") * W + lit(W / 2))
      .withColumn(
        "d2",
        (col("lat") - col("clat")) * (col("lat") - col("clat")) +
          (col("lon") - col("clon")) * (col("lon") - col("clon")))
      .groupBy(col("cr"), col("cc"))
      .agg(
        count(lit(1)).as("n_stations"),
        min(struct(col("d2"), col("sk"))).getField("sk").as("nearest_to_center"),
        min(col("d2")).as("min_d2"))
      .orderBy(col("cr"), col("cc"))
  }

  val q201Oracle: String =
    """WITH st AS (
      |  SELECT s_suppkey AS sk,
      |    ((s_suppkey * 2654435761) % 120000000) - 60000000 AS lat,
      |    ((s_suppkey * 2246822519) % 360000000) - 180000000 AS lon
      |  FROM supplier
      |), c AS (
      |  SELECT sk, lat, lon,
      |    lat // 10000000 AS cr, lon // 10000000 AS cc
      |  FROM st
      |), d AS (
      |  SELECT sk, cr, cc,
      |    (lat - (cr * 10000000 + 5000000)) * (lat - (cr * 10000000 + 5000000)) +
      |    (lon - (cc * 10000000 + 5000000)) * (lon - (cc * 10000000 + 5000000)) AS d2
      |  FROM c
      |), rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY cr, cc ORDER BY d2, sk) AS rn
      |  FROM d
      |)
      |SELECT CAST(cr AS BIGINT) AS cr, CAST(cc AS BIGINT) AS cc,
      |  CAST(COUNT(*) AS BIGINT) AS n_stations,
      |  CAST(MAX(CASE WHEN rn = 1 THEN sk END) AS BIGINT) AS nearest_to_center,
      |  CAST(MIN(d2) AS BIGINT) AS min_d2
      |FROM rk
      |GROUP BY cr, cc
      |ORDER BY cr, cc""".stripMargin

  // ---------------------------------------------------------------- q202
  /** SPATIAL RADIUS JOIN ([[graft.ops.Geo.radiusJoin]]) — every
    * (point, station) pair within 5° by exact squared integer distance,
    * via the LSH-for-space plan: stations fan out to their 3×3
    * neighbor cells (bounded ×9 on the SMALL side), points equi-join on
    * their single cell, candidates filter exactly. The oracle is the
    * naive |P|·|S| theta join — the definition the grid plan must
    * equal. Output: per-point match-count histogram + pair mass +
    * Σ min-d2 checksum over matched points.
    */
  def q202SpatialJoin(s: SparkSession, dir: String): DataFrame = {
    val R = 5000000L
    val st = Tables
      .supplier(s, dir)
      .select(col("s_suppkey").as("sk"))
      .withColumn("slat", expr("((sk * 2654435761) % 120000000) - 60000000"))
      .withColumn("slon", expr("((sk * 2246822519) % 360000000) - 180000000"))
    val pts = Tables
      .customer(s, dir)
      .where(col("c_custkey") <= 2000)
      .select(col("c_custkey").as("pk"))
      .withColumn("plat", expr("((pk * 3266489917) % 120000000) - 60000000"))
      .withColumn("plon", expr("((pk * 668265263) % 360000000) - 180000000"))
    val pairs = graft.ops.Geo
      .radiusJoin(pts, st, "plat", "plon", "slat", "slon", R)
      .select(col("pk"), col("sk"), col("d2"))
    val perPoint = pairs
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("n_matches"), min(col("d2")).as("min_d2"))
    val withAll = pts
      .select(col("pk"))
      .join(perPoint, Seq("pk"), "left")
      .na
      .fill(0L, Seq("n_matches"))
    withAll
      .withColumn(
        "bucket",
        when(col("n_matches") === 0, "0")
          .when(col("n_matches") === 1, "1")
          .when(col("n_matches") <= 5, "2-5")
          .otherwise("6+"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("n_matches")).as("n_pairs"),
        coalesce(sum(col("min_d2")), lit(0L)).as("sum_min_d2"))
      .orderBy(col("bucket"))
  }

  val q202Oracle: String =
    """WITH st AS (
      |  SELECT s_suppkey AS sk,
      |    ((s_suppkey * 2654435761) % 120000000) - 60000000 AS slat,
      |    ((s_suppkey * 2246822519) % 360000000) - 180000000 AS slon
      |  FROM supplier
      |), pts AS (
      |  SELECT c_custkey AS pk,
      |    ((c_custkey * 3266489917) % 120000000) - 60000000 AS plat,
      |    ((c_custkey * 668265263) % 360000000) - 180000000 AS plon
      |  FROM customer WHERE c_custkey <= 2000
      |), pairs AS (
      |  SELECT pk, sk,
      |    (plat - slat) * (plat - slat) + (plon - slon) * (plon - slon) AS d2
      |  FROM pts, st
      |  WHERE (plat - slat) * (plat - slat) + (plon - slon) * (plon - slon)
      |        <= CAST(5000000 AS BIGINT) * 5000000
      |), pp AS (
      |  SELECT pts.pk,
      |    CAST(COUNT(pairs.sk) AS BIGINT) AS n_matches,
      |    MIN(pairs.d2) AS min_d2
      |  FROM pts LEFT JOIN pairs ON pairs.pk = pts.pk
      |  GROUP BY pts.pk
      |), b AS (
      |  SELECT pk, n_matches, min_d2,
      |    CASE WHEN n_matches = 0 THEN '0'
      |         WHEN n_matches = 1 THEN '1'
      |         WHEN n_matches <= 5 THEN '2-5'
      |         ELSE '6+' END AS bucket
      |  FROM pp
      |)
      |SELECT bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_points,
      |  CAST(SUM(n_matches) AS BIGINT) AS n_pairs,
      |  CAST(COALESCE(SUM(min_d2), 0) AS BIGINT) AS sum_min_d2
      |FROM b
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q203
  /** IDW INTERPOLATION — the reference domain's actual spatial use
    * case: estimate a measurement at an arbitrary point from nearby
    * stations by inverse-distance weighting. Exact-integer contract:
    * weights are `SCALE div (d2 + 1)` (the +1 makes a co-located
    * station dominant without a zero division; floor IS the
    * definition), the estimate is ⌊Σ v·w / Σ w⌋, and the v·w products
    * ride decimal(38,0)/HUGEINT (per-term ≈ 5e19 overflows INT64 —
    * the widen-first lesson again). Candidates come from the q202 grid
    * radius join; uncovered points (no station within 5°) are counted,
    * not invented.
    */
  def q203IdwInterpolation(s: SparkSession, dir: String): DataFrame = {
    val R = 5000000L
    val st = Tables
      .supplier(s, dir)
      .select(col("s_suppkey").as("sk"))
      .withColumn("slat", expr("((sk * 2654435761) % 120000000) - 60000000"))
      .withColumn("slon", expr("((sk * 2246822519) % 360000000) - 180000000"))
      .withColumn("v_cents", expr("(sk * 7919) % 50000"))
    val pts = Tables
      .customer(s, dir)
      .where(col("c_custkey") <= 2000)
      .select(col("c_custkey").as("pk"))
      .withColumn("plat", expr("((pk * 3266489917) % 120000000) - 60000000"))
      .withColumn("plon", expr("((pk * 668265263) % 360000000) - 180000000"))
    val pairs = graft.ops.Geo
      .radiusJoin(pts, st, "plat", "plon", "slat", "slon", R)
      .withColumn("w", expr("1000000000000000 div (d2 + 1)"))
    val est = pairs
      .groupBy(col("pk"))
      .agg(
        count(lit(1)).as("n_near"),
        sum(expr("cast(v_cents as decimal(38,0)) * w")).as("vw"),
        sum(col("w")).as("wsum"))
      .withColumn("est_cents", expr("cast(vw div wsum as bigint)"))
    pts
      .select(col("pk"))
      .join(est, Seq("pk"), "left")
      .groupBy(expr("pk div 200").as("bucket"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("est_cents").isNotNull.cast("long")).as("n_covered"),
        coalesce(sum(col("est_cents")), lit(0L)).as("sum_est_cents"),
        coalesce(sum(col("n_near")), lit(0L)).as("n_pairs"))
      .orderBy(col("bucket"))
  }

  val q203Oracle: String =
    """WITH st AS (
      |  SELECT s_suppkey AS sk,
      |    ((s_suppkey * 2654435761) % 120000000) - 60000000 AS slat,
      |    ((s_suppkey * 2246822519) % 360000000) - 180000000 AS slon,
      |    (s_suppkey * 7919) % 50000 AS v_cents
      |  FROM supplier
      |), pts AS (
      |  SELECT c_custkey AS pk,
      |    ((c_custkey * 3266489917) % 120000000) - 60000000 AS plat,
      |    ((c_custkey * 668265263) % 360000000) - 180000000 AS plon
      |  FROM customer WHERE c_custkey <= 2000
      |), pairs AS (
      |  SELECT pk,
      |    (plat - slat) * (plat - slat) + (plon - slon) * (plon - slon) AS d2,
      |    v_cents
      |  FROM pts, st
      |  WHERE (plat - slat) * (plat - slat) + (plon - slon) * (plon - slon)
      |        <= CAST(5000000 AS BIGINT) * 5000000
      |), w AS (
      |  SELECT pk, v_cents, 1000000000000000 // (d2 + 1) AS w FROM pairs
      |), est AS (
      |  SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_near,
      |    CAST(SUM(CAST(v_cents AS HUGEINT) * w) // SUM(w) AS BIGINT) AS est_cents
      |  FROM w GROUP BY pk
      |)
      |SELECT CAST(pts.pk // 200 AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_points,
      |  CAST(SUM(CASE WHEN est.est_cents IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
      |  CAST(COALESCE(SUM(est.est_cents), 0) AS BIGINT) AS sum_est_cents,
      |  CAST(COALESCE(SUM(est.n_near), 0) AS BIGINT) AS n_pairs
      |FROM pts LEFT JOIN est ON est.pk = pts.pk
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q204
  /** SPATIAL k-NN — top-3 nearest stations per point among the 5°
    * grid candidates, ranked by the exact (d2, suppkey) total order.
    * The coverage caveat is explicit: grid k-NN only sees candidates
    * inside the radius, so points with fewer than 3 candidates report
    * what they have (counted per bucket) — the production fix is ring
    * expansion, the certified contract here is "k-NN AMONG candidates".
    */
  def q204SpatialKnn(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val R = 5000000L
    val st = Tables
      .supplier(s, dir)
      .select(col("s_suppkey").as("sk"))
      .withColumn("slat", expr("((sk * 2654435761) % 120000000) - 60000000"))
      .withColumn("slon", expr("((sk * 2246822519) % 360000000) - 180000000"))
    val pts = Tables
      .customer(s, dir)
      .where(col("c_custkey") <= 2000)
      .select(col("c_custkey").as("pk"))
      .withColumn("plat", expr("((pk * 3266489917) % 120000000) - 60000000"))
      .withColumn("plon", expr("((pk * 668265263) % 360000000) - 180000000"))
    val w = Window.partitionBy(col("pk")).orderBy(col("d2").asc, col("sk").asc)
    val top3 = graft.ops.Geo
      .radiusJoin(pts, st, "plat", "plon", "slat", "slon", R)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
    top3
      .groupBy(expr("pk div 200").as("bucket"))
      .agg(
        countDistinct(col("pk")).as("n_points_matched"),
        sum((col("rn") === 3).cast("long")).as("n_with_3"),
        sum(when(col("rn") === 1, col("d2"))).as("sum_nn1_d2"),
        sum(when(col("rn") === 3, col("d2"))).as("sum_nn3_d2"),
        sum(when(col("rn") === 1, col("sk")).otherwise(0L)).as("nn1_sk_checksum"))
      .orderBy(col("bucket"))
  }

  val q204Oracle: String =
    """WITH st AS (
      |  SELECT s_suppkey AS sk,
      |    ((s_suppkey * 2654435761) % 120000000) - 60000000 AS slat,
      |    ((s_suppkey * 2246822519) % 360000000) - 180000000 AS slon
      |  FROM supplier
      |), pts AS (
      |  SELECT c_custkey AS pk,
      |    ((c_custkey * 3266489917) % 120000000) - 60000000 AS plat,
      |    ((c_custkey * 668265263) % 360000000) - 180000000 AS plon
      |  FROM customer WHERE c_custkey <= 2000
      |), pairs AS (
      |  SELECT pk, sk,
      |    (plat - slat) * (plat - slat) + (plon - slon) * (plon - slon) AS d2
      |  FROM pts, st
      |  WHERE (plat - slat) * (plat - slat) + (plon - slon) * (plon - slon)
      |        <= CAST(5000000 AS BIGINT) * 5000000
      |), rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY pk ORDER BY d2 ASC, sk ASC) AS rn
      |  FROM pairs
      |), t3 AS (SELECT * FROM rk WHERE rn <= 3)
      |SELECT CAST(pk // 200 AS BIGINT) AS bucket,
      |  CAST(COUNT(DISTINCT pk) AS BIGINT) AS n_points_matched,
      |  CAST(SUM(CASE WHEN rn = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_3,
      |  CAST(SUM(CASE WHEN rn = 1 THEN d2 END) AS BIGINT) AS sum_nn1_d2,
      |  CAST(SUM(CASE WHEN rn = 3 THEN d2 END) AS BIGINT) AS sum_nn3_d2,
      |  CAST(SUM(CASE WHEN rn = 1 THEN sk ELSE 0 END) AS BIGINT) AS nn1_sk_checksum
      |FROM t3
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q205
  /** WATERMARK LATE-ARRIVAL ACCOUNTING — streaming semantics certified
    * in batch: with arrival order proxied by event_id, an event is LATE
    * iff the watermark had already passed its timestamp when it
    * arrived: ts_i < max_{j<i}(ts_j) − W (strictly-previous running
    * max, W = 1 h). This is exactly the drop rule
    * streaming/PerKeyWatermark enforces live; the batch certificate
    * quantifies it per type — late counts, ppm, and the worst lateness
    * — and the oracle replays the same exclusive-frame window.
    */
  def q205LateArrivals(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val W = 3600000000000L
    val wprev = Window
      .partitionBy(col("event_type"))
      .orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables
      .events(s, dir)
      .select(col("event_type"), col("event_id"), col("ts_ns"))
      .withColumn("wm", max(col("ts_ns")).over(wprev) - lit(W))
      .withColumn("late", (col("wm").isNotNull && col("ts_ns") < col("wm")).cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("late")).as("n_late"),
        expr("cast((sum(late) * 1000000) div count(1) as bigint)").as("late_ppm"),
        coalesce(
          max(when(col("late") === 1, expr("(wm - ts_ns) div 1000000"))),
          lit(0L)).as("max_lateness_ms"))
      .orderBy(col("event_type"))
  }

  val q205Oracle: String =
    """WITH e AS (
      |  SELECT event_type, event_id, epoch_ns(ts) AS t FROM events
      |), w AS (
      |  SELECT event_type, t,
      |    MAX(t) OVER (PARTITION BY event_type ORDER BY event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      - 3600000000000 AS wm
      |  FROM e
      |), l AS (
      |  SELECT event_type, t, wm,
      |    CASE WHEN wm IS NOT NULL AND t < wm THEN 1 ELSE 0 END AS late
      |  FROM w
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(late) AS BIGINT) AS n_late,
      |  CAST((SUM(late) * 1000000) // COUNT(*) AS BIGINT) AS late_ppm,
      |  CAST(COALESCE(MAX(CASE WHEN late = 1 THEN (wm - t) // 1000000 END), 0) AS BIGINT)
      |    AS max_lateness_ms
      |FROM l
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q206
  /** DEDUP IDEMPOTENCE — pipeline re-run safety as a law: applying
    * [[graft.ops.Dedup.firstWins]] to its own output must be the
    * identity (f∘f = f). Certified by order-independent digests
    * (count, id sum, id bit_xor) of the first and second applications,
    * with the equality verdicts in the checked row — a re-run of an
    * idempotent stage on a cluster must be a no-op, not a data change.
    */
  def q206DedupIdempotence(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))
    val keys = Seq("user_id", "event_type", "ts_ns")
    val d1 = graft.ops.Dedup.firstWins(ev, keys, Seq("event_id"))
    val d2 = graft.ops.Dedup.firstWins(d1, keys, Seq("event_id"))
    def digest(df: DataFrame, p: String) =
      df.agg(
        count(lit(1)).as(s"${p}_n"),
        sum(col("event_id")).as(s"${p}_sum"),
        expr("bit_xor(event_id)").as(s"${p}_xor"))
    digest(d1, "a")
      .crossJoin(digest(d2, "b"))
      .select(
        col("a_n"),
        col("a_sum"),
        col("a_xor"),
        (col("a_n") === col("b_n")).as("n_stable"),
        (col("a_sum") === col("b_sum")).as("sum_stable"),
        (col("a_xor") === col("b_xor")).as("xor_stable"))
  }

  val q206Oracle: String =
    """WITH d1 AS (
      |  SELECT user_id, event_type, t, event_id FROM (
      |    SELECT user_id, event_type, epoch_ns(ts) AS t, event_id,
      |      row_number() OVER (PARTITION BY user_id, event_type, epoch_ns(ts)
      |                         ORDER BY event_id) AS rn
      |    FROM events) x
      |  WHERE rn = 1
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS a_n,
      |  CAST(SUM(event_id) AS BIGINT) AS a_sum,
      |  CAST(bit_xor(event_id) AS BIGINT) AS a_xor,
      |  TRUE AS n_stable, TRUE AS sum_stable, TRUE AS xor_stable
      |FROM d1""".stripMargin

  // ---------------------------------------------------------------- q207
  /** CC CROSS-IMPLEMENTATION AGREEMENT — the two connected-components
    * engines ([[graft.ops.Components.connectedComponents]] min-label,
    * O(diameter) rounds, and
    * [[graft.ops.Components.largeStarSmallStar]], O(log n) rounds)
    * must produce the IDENTICAL (id → min-reachable-id) labeling on
    * the block graph. Disagreements are counted via a null-safe
    * full-outer label join (pinned 0), and the summary (nodes,
    * components, label checksum) is what the oracle recomputes from
    * the recursive-CTE reachability definition — three independent
    * implementations, one answer.
    */
  def q207CcAgreement(s: SparkSession, dir: String): DataFrame = {
    val edges = blockGraph(s, dir)
    val a = graft.ops.Components
      .connectedComponents(edges, "u", "v")
      .withColumnsRenamed(Map("component" -> "ca"))
    val b = graft.ops.Components
      .largeStarSmallStar(edges, "u", "v")
      .withColumnsRenamed(Map("component" -> "cb"))
    val joined = a.join(b, Seq("id"), "full_outer")
    val dis = joined
      .agg(
        count(lit(1)).as("n_nodes"),
        sum((!(col("ca") <=> col("cb"))).cast("long")).as("n_disagreements"))
    val summ = a.agg(
      countDistinct(col("ca")).as("n_components"),
      sum(col("ca")).as("label_sum"))
    dis
      .crossJoin(summ)
      .select(
        col("n_nodes"),
        col("n_components"),
        col("n_disagreements"),
        col("label_sum"))
  }

  val q207Oracle: String =
    s"""WITH RECURSIVE eset AS (
       |$BlockGraphSql
       |), sym AS (
       |  SELECT u AS src, v AS dst FROM eset
       |  UNION ALL SELECT v, u FROM eset
       |), reach(id, comp) AS (
       |  SELECT DISTINCT src, src FROM sym
       |  UNION
       |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.id
       |), lab AS (
       |  SELECT id, MIN(comp) AS component FROM reach GROUP BY id
       |)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  CAST(COUNT(DISTINCT component) AS BIGINT) AS n_components,
       |  CAST(0 AS BIGINT) AS n_disagreements,
       |  CAST(SUM(component) AS BIGINT) AS label_sum
       |FROM lab""".stripMargin

  // ---------------------------------------------------------------- q208
  /** Z-ORDER EFFECTIVENESS, MEASURED — q89 computes the layout; this
    * query QUANTIFIES why it exists: for 20 deterministic 8×8 range
    * rectangles over a (x, y) ∈ [0,255]² key space, count the files a
    * scan must touch when rows are laid out (a) lexicographically
    * (file = x: a rectangle constraining both dims touches one file
    * per x value) vs (b) z-ordered ([[graft.ops.Layout.zValue]],
    * 256-slot files: the rectangle's z-range covers far fewer files).
    * Same zValue/zValueSql generator on both engines — the spec and
    * its replay can never drift.
    */
  def q208ZorderEffect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables
      .lineitem(s, dir)
      .select(
        (col("l_partkey") % 256).as("x"),
        ((col("l_suppkey") * 131) % 256).as("y"))
      .withColumn(
        "zkey",
        graft.ops.Layout.zValue(Seq((col("x"), 0L, 255L), (col("y"), 0L, 255L)), 8))
      .withColumn("file_lex", expr("(x * 256 + y) div 256"))
      .withColumn("file_z", expr("zkey div 256"))
    val queries = (0 until 20)
      .map(i => (i, (i * 37L) % 248, (i * 53L) % 248))
      .toDF("qid", "x0", "y0")
    rows
      .crossJoin(broadcast(queries))
      .where(
        col("x") >= col("x0") && col("x") <= col("x0") + 7 &&
          col("y") >= col("y0") && col("y") <= col("y0") + 7)
      .groupBy(col("qid"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("file_lex")).as("files_lex"),
        countDistinct(col("file_z")).as("files_z"))
      .orderBy(col("qid"))
  }

  val q208Oracle: String = {
    val zsql = graft.ops.Layout.zValueSql(Seq(("x", 0L, 255L), ("y", 0L, 255L)), 8)
    s"""WITH rows_k AS (
       |  SELECT l_partkey % 256 AS x, (l_suppkey * 131) % 256 AS y FROM lineitem
       |), keyed AS (
       |  SELECT x, y,
       |    (x * 256 + y) // 256 AS file_lex,
       |    $zsql // 256 AS file_z
       |  FROM rows_k
       |), q AS (
       |  SELECT CAST(i AS INT) AS qid, (i * 37) % 248 AS x0, (i * 53) % 248 AS y0
       |  FROM (SELECT unnest(range(0, 20)) AS i)
       |)
       |SELECT q.qid, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(COUNT(DISTINCT file_lex) AS BIGINT) AS files_lex,
       |  CAST(COUNT(DISTINCT file_z) AS BIGINT) AS files_z
       |FROM keyed JOIN q
       |  ON x BETWEEN x0 AND x0 + 7 AND y BETWEEN y0 AND y0 + 7
       |GROUP BY q.qid
       |ORDER BY q.qid""".stripMargin
  }

  // ---------------------------------------------------------------- q209
  /** NULL-SEMANTICS AGGREGATE TRUTH TABLE — the exact rules every
    * migration trips over, pinned differentially on planted data
    * (every 4th value null, one all-null group): count(*) counts rows,
    * count(x) and count(distinct x) skip nulls, sum/avg/min/max of an
    * all-null group are NULL (not 0), a NULL group KEY forms a real
    * group, and sum(x) ignores nulls rather than poisoning the sum.
    */
  def q209NullAggregates(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .select(
        // group key: null for every 5th user; 'Z' group has all-null values
        when(col("user_id") % 5 === 0, lit(null).cast("string"))
          .otherwise(when(col("user_id") % 7 === 0, lit("Z"))
            .otherwise(col("event_type"))).as("g"),
        when(col("user_id") % 7 === 0, lit(null).cast("long"))
          .otherwise(when(col("event_id") % 4 === 0, lit(null).cast("long"))
            .otherwise(col("event_id"))).as("x"))
    ev.groupBy(col("g"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("x")).as("n_x"),
        countDistinct(col("x")).as("nd_x"),
        sum(col("x")).as("sum_x"),
        min(col("x")).as("min_x"),
        (count(lit(1)) - count(col("x"))).as("n_null_x"),
        sum(col("x")).isNull.as("sum_is_null"))
      .orderBy(col("g").asc_nulls_first)
  }

  val q209Oracle: String =
    """WITH ev AS (
      |  SELECT
      |    CASE WHEN user_id % 5 = 0 THEN NULL
      |         WHEN user_id % 7 = 0 THEN 'Z'
      |         ELSE event_type END AS g,
      |    CASE WHEN user_id % 7 = 0 THEN NULL
      |         WHEN event_id % 4 = 0 THEN NULL
      |         ELSE event_id END AS x
      |  FROM events
      |)
      |SELECT g,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(x) AS BIGINT) AS n_x,
      |  CAST(COUNT(DISTINCT x) AS BIGINT) AS nd_x,
      |  CAST(SUM(x) AS BIGINT) AS sum_x,
      |  CAST(MIN(x) AS BIGINT) AS min_x,
      |  CAST(COUNT(*) - COUNT(x) AS BIGINT) AS n_null_x,
      |  (SUM(x) IS NULL) AS sum_is_null
      |FROM ev
      |GROUP BY g
      |ORDER BY g ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q210
  /** NULL-ORDERING CERTIFICATE — the DEFAULTS differ (Spark ASC puts
    * nulls FIRST, DuckDB ASC puts them LAST), so portable SQL must
    * spell NULLS FIRST/LAST explicitly; this certificate pins all four
    * explicit spellings by ranking a planted null-bearing column each
    * way and emitting the positions nulls land in (1..k for FIRST,
    * n-k+1..n for LAST, both directions).
    */
  def q210NullOrdering(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables
      .events(s, dir)
      .where(col("event_id") < 500)
      .select(
        col("event_id"),
        when(col("event_id") % 9 === 0, lit(null).cast("long"))
          .otherwise(col("ts_ns")).as("v"))
    val wAf = Window.orderBy(col("v").asc_nulls_first, col("event_id"))
    val wAl = Window.orderBy(col("v").asc_nulls_last, col("event_id"))
    val wDf = Window.orderBy(col("v").desc_nulls_first, col("event_id"))
    val wDl = Window.orderBy(col("v").desc_nulls_last, col("event_id"))
    def pos(r: String) = sum(when(col("v").isNull, col(r)).otherwise(0L).cast("long"))
    ev.withColumn("raf", row_number().over(wAf))
      .withColumn("ral", row_number().over(wAl))
      .withColumn("rdf", row_number().over(wDf))
      .withColumn("rdl", row_number().over(wDl))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v").isNull.cast("long")).as("n_nulls"),
        pos("raf").as("nullpos_asc_first"),
        pos("ral").as("nullpos_asc_last"),
        pos("rdf").as("nullpos_desc_first"),
        pos("rdl").as("nullpos_desc_last"))
  }

  val q210Oracle: String =
    """WITH e AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 9 = 0 THEN NULL ELSE epoch_ns(ts) END AS v
      |  FROM events WHERE event_id < 500
      |), r AS (
      |  SELECT v,
      |    row_number() OVER (ORDER BY v ASC NULLS FIRST, event_id) AS raf,
      |    row_number() OVER (ORDER BY v ASC NULLS LAST, event_id) AS ral,
      |    row_number() OVER (ORDER BY v DESC NULLS FIRST, event_id) AS rdf,
      |    row_number() OVER (ORDER BY v DESC NULLS LAST, event_id) AS rdl
      |  FROM e
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  CAST(SUM(CASE WHEN v IS NULL THEN raf ELSE 0 END) AS BIGINT) AS nullpos_asc_first,
      |  CAST(SUM(CASE WHEN v IS NULL THEN ral ELSE 0 END) AS BIGINT) AS nullpos_asc_last,
      |  CAST(SUM(CASE WHEN v IS NULL THEN rdf ELSE 0 END) AS BIGINT) AS nullpos_desc_first,
      |  CAST(SUM(CASE WHEN v IS NULL THEN rdl ELSE 0 END) AS BIGINT) AS nullpos_desc_last
      |FROM r""".stripMargin

  // ---------------------------------------------------------------- q211
  /** JOIN-MULTIPLICITY MATRIX — every join type on one planted pair of
    * keyed multisets (dup keys, nulls on both sides, one-side-only
    * keys): inner is Σ_k a_k·b_k, left/right add the unmatched sides,
    * full adds both, semi/anti are row-level existence (each left row
    * once), cross is |A|·|B|, and nulls never match anything. The
    * count ALGEBRA is pinned as law columns (left = inner + anti,
    * full = left + right − inner) so a multiplicity bug in any join
    * path turns the row red.
    */
  def q211JoinMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = Seq(
      Option("a"), Option("a"), Option("b"), Option("c"), Option("c"),
      Option("c"), Option.empty[String], Option("d")).toDF("k")
    val b = Seq(
      Option("a"), Option("a"), Option("a"), Option("b"), Option("b"),
      Option.empty[String], Option.empty[String], Option("e")).toDF("k")
    val b2 = b.withColumnRenamed("k", "k2")
    def cnt(df: DataFrame, n: String) = df.agg(count(lit(1)).as(n))
    cnt(a.join(b2, col("k") === col("k2"), "inner"), "n_inner")
      .crossJoin(cnt(a.join(b2, col("k") === col("k2"), "left"), "n_left"))
      .crossJoin(cnt(a.join(b2, col("k") === col("k2"), "right"), "n_right"))
      .crossJoin(cnt(a.join(b2, col("k") === col("k2"), "full"), "n_full"))
      .crossJoin(cnt(a.join(b2, col("k") === col("k2"), "left_semi"), "n_semi"))
      .crossJoin(cnt(a.join(b2, col("k") === col("k2"), "left_anti"), "n_anti"))
      .crossJoin(cnt(a.crossJoin(b2), "n_cross"))
      .select(
        col("n_inner"), col("n_left"), col("n_right"), col("n_full"),
        col("n_semi"), col("n_anti"), col("n_cross"),
        (col("n_left") === col("n_inner") + col("n_anti")).as("left_law_ok"),
        (col("n_full") === col("n_left") + col("n_right") - col("n_inner")).as("full_law_ok"))
  }

  val q211Oracle: String =
    """WITH a AS (SELECT unnest(['a','a','b','c','c','c',NULL,'d']) AS k),
      |b AS (SELECT unnest(['a','a','a','b','b',NULL,NULL,'e']) AS k2)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a JOIN b ON k = k2) AS n_inner,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a LEFT JOIN b ON k = k2) AS n_left,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a RIGHT JOIN b ON k = k2) AS n_right,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a FULL JOIN b ON k = k2) AS n_full,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a WHERE EXISTS
      |     (SELECT 1 FROM b WHERE k2 = a.k)) AS n_semi,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a WHERE NOT EXISTS
      |     (SELECT 1 FROM b WHERE k2 = a.k)) AS n_anti,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a CROSS JOIN b) AS n_cross,
      |  TRUE AS left_law_ok,
      |  TRUE AS full_law_ok""".stripMargin

  // ---------------------------------------------------------------- q212
  /** CAST / COERCION TRUTH TABLE — ANSI-off cast semantics pinned on
    * adversarial literals. The engines genuinely DIVERGE on two rules,
    * so the oracle encodes the translation rather than assuming parity
    * (the q198 discipline): DuckDB CAST(double AS INT) ROUNDS
    * half-away (12.7 → 13) while Spark TRUNCATES (12.7 → 12) — the
    * oracle wraps trunc(); and STRINGS to int: Spark accepts plain
    * decimal literals only and TRUNCATES ('12.7' → 12, '1e3' → null
    * — measured), while DuckDB TRY_CAST rounds and accepts exponents
    * — the oracle emulates Spark's rule with a literal-shape regex +
    * trunc + range check. Junk, whitespace, empty, overflow,
    * scientific-notation, and signed-zero strings complete the table.
    */
  def q212CastTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val strs = Seq("12abc", "  42  ", "1e3", "12.7", "-12.7", "", "2147483648", "-0", "7")
    val dbls = Seq(12.7, -12.7, 2.5, 3.5, -0.5, 99.999)
    val sdf = strs
      .toDF("sv")
      .select(
        col("sv"),
        expr("cast(sv as int)").as("s_to_int"),
        expr("cast(sv as double)").as("s_to_double"))
    val ddf = dbls
      .toDF("dv")
      .select(
        col("dv"),
        expr("cast(dv as int)").as("d_to_int"),
        expr("cast(dv as bigint)").as("d_to_long"))
    sdf
      .agg(
        count(col("s_to_int")).as("n_str_int_ok"),
        coalesce(sum(col("s_to_int")), lit(0L)).cast("long").as("sum_str_int"),
        count(col("s_to_double")).as("n_str_dbl_ok"),
        coalesce(sum(col("s_to_double")), lit(0.0)).as("sum_str_dbl"))
      .crossJoin(ddf.agg(
        sum(col("d_to_int")).cast("long").as("sum_dbl_int"),
        sum(col("d_to_long")).as("sum_dbl_long")))
  }

  val q212Oracle: String =
    """WITH s AS (
      |  SELECT unnest(['12abc', '  42  ', '1e3', '12.7', '-12.7', '',
      |                 '2147483648', '-0', '7']) AS sv
      |), sc AS (
      |  -- Spark ANSI-off string->int: null on junk/overflow, TRUNCATES
      |  -- decimal strings (DuckDB TRY_CAST would round 12.7 -> 13);
      |  -- emulate by parsing as DOUBLE first, trunc, then range check
      |  -- measured Spark rule: plain decimal literals only (NO
      |  -- exponent — '1e3' is null as int but 1000.0 as double),
      |  -- truncated toward zero, null on int overflow
      |  SELECT sv,
      |    CAST(CASE WHEN NOT regexp_matches(sv, '^\s*[+-]?[0-9]+(\.[0-9]*)?\s*$') THEN NULL
      |              WHEN trunc(TRY_CAST(sv AS DOUBLE)) > 2147483647
      |                OR trunc(TRY_CAST(sv AS DOUBLE)) < -2147483648 THEN NULL
      |              ELSE trunc(TRY_CAST(sv AS DOUBLE)) END AS INT) AS s_to_int,
      |    TRY_CAST(sv AS DOUBLE) AS s_to_double
      |  FROM s
      |), d AS (
      |  SELECT unnest([12.7, -12.7, 2.5, 3.5, -0.5, 99.999]) AS dv
      |), dc AS (
      |  -- Spark double->int truncates toward zero; DuckDB CAST rounds
      |  SELECT CAST(trunc(dv) AS INT) AS d_to_int,
      |    CAST(trunc(dv) AS BIGINT) AS d_to_long
      |  FROM d
      |)
      |SELECT
      |  (SELECT CAST(COUNT(s_to_int) AS BIGINT) FROM sc) AS n_str_int_ok,
      |  (SELECT CAST(COALESCE(SUM(s_to_int), 0) AS BIGINT) FROM sc) AS sum_str_int,
      |  (SELECT CAST(COUNT(s_to_double) AS BIGINT) FROM sc) AS n_str_dbl_ok,
      |  (SELECT CAST(COALESCE(SUM(s_to_double), 0.0) AS DOUBLE) FROM sc) AS sum_str_dbl,
      |  (SELECT CAST(SUM(d_to_int) AS BIGINT) FROM dc) AS sum_dbl_int,
      |  (SELECT CAST(SUM(d_to_long) AS BIGINT) FROM dc) AS sum_dbl_long""".stripMargin

  // ---------------------------------------------------------------- q213
  /** CALENDAR ARITHMETIC CERTIFICATE — month addition clamps to
    * month-end identically on both engines (Jan 31 + 1 mo = Feb 28,
    * leap Feb 29 + 12 mo = Feb 28), weeks truncate to Monday, plus
    * day-of-year, quarter, last_day and an anchored day diff — over a
    * literal grid of edge-case dates (month ends, leap day, year
    * boundary).
    */
  def q213Calendar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dates = Seq(
      "2026-01-31", "2026-08-14", "2024-02-29", "2025-12-31",
      "2026-03-01", "2024-01-01")
    dates
      .toDF("ds")
      .select(
        col("ds"),
        expr("cast(add_months(cast(ds as date), 1) as string)").as("plus_1m"),
        expr("cast(add_months(cast(ds as date), 12) as string)").as("plus_12m"),
        expr("cast(trunc(cast(ds as date), 'month') as string)").as("month_start"),
        expr("cast(trunc(cast(ds as date), 'week') as string)").as("week_start"),
        expr("dayofyear(cast(ds as date))").as("doy"),
        expr("quarter(cast(ds as date))").as("q"),
        expr("cast(last_day(cast(ds as date)) as string)").as("month_end"),
        expr("datediff(cast(ds as date), cast('2024-01-01' as date))").as("days_since_anchor"))
      .orderBy(col("ds"))
  }

  val q213Oracle: String =
    """WITH d AS (
      |  SELECT unnest(['2026-01-31', '2026-08-14', '2024-02-29', '2025-12-31',
      |                 '2026-03-01', '2024-01-01']) AS ds
      |)
      |SELECT ds,
      |  CAST(CAST(CAST(ds AS DATE) + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS plus_1m,
      |  CAST(CAST(CAST(ds AS DATE) + INTERVAL 12 MONTH AS DATE) AS VARCHAR) AS plus_12m,
      |  CAST(CAST(date_trunc('month', CAST(ds AS DATE)) AS DATE) AS VARCHAR) AS month_start,
      |  CAST(CAST(date_trunc('week', CAST(ds AS DATE)) AS DATE) AS VARCHAR) AS week_start,
      |  CAST(date_part('doy', CAST(ds AS DATE)) AS INT) AS doy,
      |  CAST(quarter(CAST(ds AS DATE)) AS INT) AS q,
      |  CAST(last_day(CAST(ds AS DATE)) AS VARCHAR) AS month_end,
      |  CAST(datediff('day', DATE '2024-01-01', CAST(ds AS DATE)) AS INT) AS days_since_anchor
      |FROM d
      |ORDER BY ds""".stripMargin

  // ---------------------------------------------------------------- q214
  /** WINDOW FRAME SEMANTICS (RANGE vs ROWS) — with DUPLICATE order
    * values, a RANGE frame includes all PEERS of the current row while
    * a ROWS frame cuts at the physical row: the classic
    * silently-different-totals trap. Certified on a tied key (epoch
    * day): per type, Σ|range_cum − rows_cum| quantifies the peer mass,
    * the law range ≥ rows rides per row (violations pinned 0), and the
    * final row of each partition agrees under both frames (last peer
    * group is complete). Plus the percent_rank single-row-partition
    * edge (0/0 → 0.0, not NaN).
    */
  def q214FrameSemantics(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables
      .events(s, dir)
      .select(
        col("event_type"),
        expr("ts_ns div 86400000000000").as("eday"),
        lit(1L).as("one"),
        col("event_id"))
    val wRange = Window
      .partitionBy(col("event_type"))
      .orderBy(col("eday"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wRows = Window
      .partitionBy(col("event_type"))
      .orderBy(col("eday"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val framed = ev
      .withColumn("cum_range", sum(col("one")).over(wRange))
      .withColumn("cum_rows", sum(col("one")).over(wRows))
    val frames = framed
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("cum_range") - col("cum_rows")).as("peer_mass"),
        sum((col("cum_range") < col("cum_rows")).cast("long")).as("law_violations"),
        max(col("cum_range")).as("final_range"),
        max(col("cum_rows")).as("final_rows"))
    // percent_rank on single-row partitions: 0/0 must define to 0.0
    val pr1 = Tables
      .events(s, dir)
      .where(col("event_id") < 20)
      .select(
        col("event_id"),
        percent_rank().over(
          Window.partitionBy(col("event_id")).orderBy(col("ts_ns"))).as("pr"))
      .agg(
        count(lit(1)).as("n_single"),
        sum((col("pr") === 0.0).cast("long")).as("n_pr_zero"))
    frames
      .crossJoin(broadcast(pr1))
      .orderBy(col("event_type"))
  }

  val q214Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS eday,
      |    CAST(1 AS BIGINT) AS one, event_id
      |  FROM events
      |), f AS (
      |  SELECT event_type,
      |    SUM(one) OVER (PARTITION BY event_type ORDER BY eday
      |                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_range,
      |    SUM(one) OVER (PARTITION BY event_type ORDER BY eday, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rows
      |  FROM ev
      |), g AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(cum_range - cum_rows) AS BIGINT) AS peer_mass,
      |    CAST(SUM(CASE WHEN cum_range < cum_rows THEN 1 ELSE 0 END) AS BIGINT) AS law_violations,
      |    CAST(MAX(cum_range) AS BIGINT) AS final_range,
      |    CAST(MAX(cum_rows) AS BIGINT) AS final_rows
      |  FROM f GROUP BY event_type
      |), p AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_single,
      |    CAST(SUM(CASE WHEN pr = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pr_zero
      |  FROM (
      |    SELECT percent_rank() OVER (PARTITION BY event_id ORDER BY epoch_ns(ts)) AS pr
      |    FROM events WHERE event_id < 20)
      |)
      |SELECT g.*, p.n_single, p.n_pr_zero
      |FROM g, p
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q215
  /** EMPTY-INPUT AGGREGATE CERTIFICATE — the zero-rows edge every
    * report hits eventually: a GLOBAL aggregate over an empty relation
    * returns exactly ONE row (count 0, sum/min/max NULL, bool_and
    * vacuously true via min), while a GROUPED aggregate over the same
    * empty relation returns ZERO rows. Both shapes certified on a
    * filtered-to-empty events slice, with count(distinct) and avg
    * riding along.
    */
  def q215EmptyInput(s: SparkSession, dir: String): DataFrame = {
    val empty = Tables.events(s, dir).where(col("event_id") < 0)
    val globalAgg = empty.agg(
      count(lit(1)).as("n"),
      count(col("value")).as("n_vals"),
      countDistinct(col("user_id")).as("nd_users"),
      sum(col("event_id")).as("sum_id"),
      min(col("ts_ns")).as("min_ts"),
      avg(col("value")).as("avg_val"))
    val groupedRows = empty
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_groups"))
    globalAgg
      .crossJoin(broadcast(groupedRows))
      .select(
        col("n"),
        col("n_vals"),
        col("nd_users"),
        col("sum_id").isNull.as("sum_is_null"),
        col("min_ts").isNull.as("min_is_null"),
        col("avg_val").isNull.as("avg_is_null"),
        col("n_groups"))
  }

  val q215Oracle: String =
    """WITH e AS (SELECT * FROM events WHERE event_id < 0),
      |g AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT("value") AS BIGINT) AS n_vals,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_users,
      |    SUM(event_id) IS NULL AS sum_is_null,
      |    MIN(ts) IS NULL AS min_is_null,
      |    AVG("value") IS NULL AS avg_is_null
      |  FROM e
      |), gr AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups FROM (
      |    SELECT event_type, COUNT(*) FROM e GROUP BY event_type)
      |)
      |SELECT g.n, g.n_vals, g.nd_users, g.sum_is_null, g.min_is_null,
      |  g.avg_is_null, gr.n_groups
      |FROM g, gr""".stripMargin

  // ---------------------------------------------------------------- q216
  /** THREE-VALUED LOGIC COMPLEMENTS — the positive-IN and
    * greatest/least null rules q165 didn't cover: `x IN (…, NULL, …)`
    * is TRUE when found, UNKNOWN (not false!) when absent — so the
    * filter keeps found rows and drops absent ones symmetrically with
    * its negation dropping BOTH; and greatest/least skip nulls on both
    * engines (null only when ALL inputs are null) — the opposite of
    * the ANSI comparison rule, and exactly what coalesce-free cursor
    * merges (A4/F14) rely on.
    */
  def q216ThreeValued(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .select(
        col("event_id"),
        (col("user_id") % 10).as("m"),
        when(col("event_id") % 3 === 0, lit(null).cast("long"))
          .otherwise(col("user_id")).as("nv"))
    val inList = ev
      .agg(
        count(lit(1)).as("n"),
        sum(expr("case when m in (2, null, 5) then 1 else 0 end")).as("n_in_found"),
        sum(expr("case when m not in (2, null, 5) then 1 else 0 end")).as("n_not_in"),
        sum(expr("case when m in (2, 5) then 1 else 0 end")).as("n_in_plain"))
    val gl = ev.agg(
      sum(expr("greatest(nv, 3)")).as("sum_greatest"),
      sum(expr("least(nv, 3)")).as("sum_least"),
      sum(expr("case when greatest(nv, cast(null as long)) is null then 1 else 0 end"))
        .as("n_greatest_null"),
      sum(col("nv").isNull.cast("long")).as("n_nv_null"))
    inList
      .crossJoin(broadcast(gl))
      .select(
        col("n"),
        col("n_in_found"),
        col("n_not_in"),
        col("n_in_plain"),
        (col("n_in_found") === col("n_in_plain")).as("in_found_law_ok"),
        (col("n_not_in") === lit(0L)).as("not_in_unknown_law_ok"),
        col("sum_greatest"),
        col("sum_least"),
        (col("n_greatest_null") === col("n_nv_null")).as("greatest_allnull_law_ok"))
  }

  val q216Oracle: String =
    """WITH ev AS (
      |  SELECT event_id, user_id % 10 AS m,
      |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE user_id END AS nv
      |  FROM events
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN m IN (2, NULL, 5) THEN 1 ELSE 0 END) AS BIGINT) AS n_in_found,
      |  CAST(SUM(CASE WHEN m NOT IN (2, NULL, 5) THEN 1 ELSE 0 END) AS BIGINT) AS n_not_in,
      |  CAST(SUM(CASE WHEN m IN (2, 5) THEN 1 ELSE 0 END) AS BIGINT) AS n_in_plain,
      |  (SUM(CASE WHEN m IN (2, NULL, 5) THEN 1 ELSE 0 END)
      |    = SUM(CASE WHEN m IN (2, 5) THEN 1 ELSE 0 END)) AS in_found_law_ok,
      |  (SUM(CASE WHEN m NOT IN (2, NULL, 5) THEN 1 ELSE 0 END) = 0) AS not_in_unknown_law_ok,
      |  CAST(SUM(greatest(nv, 3)) AS BIGINT) AS sum_greatest,
      |  CAST(SUM(least(nv, 3)) AS BIGINT) AS sum_least,
      |  (SUM(CASE WHEN greatest(nv, CAST(NULL AS BIGINT)) IS NULL THEN 1 ELSE 0 END)
      |    = SUM(CASE WHEN nv IS NULL THEN 1 ELSE 0 END)) AS greatest_allnull_law_ok
      |FROM ev""".stripMargin

  // ---------------------------------------------------------------- q217
  /** INTERVAL UNION (gaps-and-islands over OVERLAPPING intervals) —
    * total covered time per user when event intervals [ts, ts + dur)
    * overlap freely: a new island starts where start > max(all
    * previous ends) (exclusive running max — touching intervals
    * merge), the island id is the running sum of those starts, and
    * each island covers max(end) − min(start). The declarative form of
    * the classic stack merge; conservation (covered ≤ Σ dur, covered ≥
    * max dur) rides as pinned law counts.
    */
  def q217IntervalUnion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = Tables
      .events(s, dir)
      .select(
        col("user_id"),
        col("event_id"),
        col("ts_ns").as("st"),
        (col("ts_ns") +
          (lit(1L) + expr("cast(floor(value * 100 + 0.5) as bigint)") % 7200L) * 1000000000L)
          .as("en"))
      .withColumn("dur", col("en") - col("st"))
    val wPrev = Window
      .partitionBy(col("user_id"))
      .orderBy(col("st"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window
      .partitionBy(col("user_id"))
      .orderBy(col("st"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = iv
      .withColumn("pmax", max(col("en")).over(wPrev))
      .withColumn("new_island", (col("pmax").isNull || col("st") > col("pmax")).cast("long"))
      .withColumn("island", sum(col("new_island")).over(wCum))
    val perIsland = islands
      .groupBy(col("user_id"), col("island"))
      .agg((max(col("en")) - min(col("st"))).as("cov"), sum(col("dur")).as("isl_dur"))
    perIsland
      .groupBy(col("user_id"))
      .agg(
        sum(lit(1L)).as("n_islands"),
        sum(col("cov")).as("covered_ns"),
        max(col("cov")).as("max_island_ns"),
        sum((col("cov") > col("isl_dur")).cast("long")).as("cov_law_violations"))
      .orderBy(col("user_id"))
  }

  val q217Oracle: String =
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS st,
      |    epoch_ns(ts) + (1 + CAST(floor("value" * 100 + 0.5) AS BIGINT) % 7200)
      |      * 1000000000 AS en
      |  FROM events
      |), m AS (
      |  SELECT user_id, event_id, st, en, en - st AS dur,
      |    MAX(en) OVER (PARTITION BY user_id ORDER BY st, event_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM iv
      |), isl AS (
      |  SELECT user_id, st, en, dur,
      |    SUM(CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY st, event_id
      |            ROWS UNBOUNDED PRECEDING) AS island
      |  FROM m
      |), pi AS (
      |  SELECT user_id, island, MAX(en) - MIN(st) AS cov, SUM(dur) AS isl_dur
      |  FROM isl GROUP BY user_id, island
      |)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
      |  CAST(SUM(cov) AS BIGINT) AS covered_ns,
      |  CAST(MAX(cov) AS BIGINT) AS max_island_ns,
      |  CAST(SUM(CASE WHEN cov > isl_dur THEN 1 ELSE 0 END) AS BIGINT) AS cov_law_violations
      |FROM pi
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q218
  /** LONGEST STREAK (gaps-and-islands on the day grid) — per user, the
    * longest run of CONSECUTIVE active days via the classic
    * `eday − dense_rank(eday)` island key (constant within a
    * consecutive run, jumps across a gap); reported as the
    * max-streak-length histogram. The canonical islands idiom, on
    * integer epoch days so both engines agree to the day.
    */
  def q218LongestStreak(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables
      .events(s, dir)
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("eday"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("eday"))
    val streaks = days
      .withColumn("island", col("eday") - dense_rank().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("max_streak"), count(lit(1)).as("n_streaks"))
    streaks
      .groupBy(col("max_streak"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("n_streaks")).as("total_streaks"))
      .orderBy(col("max_streak"))
  }

  val q218Oracle: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS eday FROM events
      |), i AS (
      |  SELECT user_id,
      |    eday - dense_rank() OVER (PARTITION BY user_id ORDER BY eday) AS island
      |  FROM d
      |), st AS (
      |  SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
      |  FROM i GROUP BY user_id, island
      |), mu AS (
      |  SELECT user_id, MAX(len) AS max_streak, CAST(COUNT(*) AS BIGINT) AS n_streaks
      |  FROM st GROUP BY user_id
      |)
      |SELECT CAST(max_streak AS BIGINT) AS max_streak,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(n_streaks) AS BIGINT) AS total_streaks
      |FROM mu
      |GROUP BY max_streak
      |ORDER BY max_streak""".stripMargin

  // ---------------------------------------------------------------- q219
  /** AS-OF ENRICHMENT WITH BOUNDED STALENESS — the production as-of
    * contract ([[graft.ops.AsOf.joinAsOf]], the union + carry-forward
    * single-shuffle shape): every event carries the LATEST prior
    * calibration record of its user (events ≡ 0 mod 13 play the
    * calibration feed), then a freshness gate rejects carries older
    * than 3 days — enriched/stale/missing accounted per type. Carry
    * ties (same user, same ts) resolve by the payload struct order on
    * both engines (the joinAsOf `__r` tie rule ↔ ORDER BY cts DESC,
    * cvalue DESC).
    */
  def q219AsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val Fresh = 3L * 86400000000000L
    val ev = Tables.events(s, dir)
    val calib = ev
      .where(col("event_id") % 13 === 0)
      .select(
        col("user_id"),
        col("ts_ns").as("cts"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cvalue"))
    val lhs = ev
      .where(col("event_id") % 13 =!= 0)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts_ns"))
    val joined = graft.ops.AsOf
      .joinAsOf(lhs, calib, "user_id", "ts_ns", "cts", Seq("cts", "cvalue"))
    joined
      .withColumn(
        "state",
        when(col("cts").isNull, "missing")
          .when(col("ts_ns") - col("cts") <= Fresh, "fresh")
          .otherwise("stale"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum((col("state") === "fresh").cast("long")).as("n_fresh"),
        sum((col("state") === "stale").cast("long")).as("n_stale"),
        sum((col("state") === "missing").cast("long")).as("n_missing"),
        coalesce(sum(when(col("state") === "fresh", col("cvalue"))), lit(0L))
          .as("sum_fresh_calib_cents"))
      .orderBy(col("event_type"))
  }

  val q219Oracle: String =
    """WITH c AS (
      |  SELECT user_id, epoch_ns(ts) AS cts,
      |    CAST(floor("value" * 100 + 0.5) AS BIGINT) AS cvalue
      |  FROM events WHERE event_id % 13 = 0
      |), l AS (
      |  SELECT user_id, event_type, event_id, epoch_ns(ts) AS t
      |  FROM events WHERE event_id % 13 <> 0
      |), j AS (
      |  SELECT l.event_type, l.event_id, l.t, c.cts, c.cvalue,
      |    row_number() OVER (PARTITION BY l.event_id
      |                       ORDER BY c.cts DESC, c.cvalue DESC) AS rn
      |  FROM l LEFT JOIN c ON c.user_id = l.user_id AND c.cts <= l.t
      |), pick AS (
      |  SELECT event_type, t, cts, cvalue FROM j WHERE rn = 1
      |), st AS (
      |  SELECT event_type,
      |    CASE WHEN cts IS NULL THEN 'missing'
      |         WHEN t - cts <= 259200000000000 THEN 'fresh'
      |         ELSE 'stale' END AS state, cvalue
      |  FROM pick
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN state = 'fresh' THEN 1 ELSE 0 END) AS BIGINT) AS n_fresh,
      |  CAST(SUM(CASE WHEN state = 'stale' THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
      |  CAST(SUM(CASE WHEN state = 'missing' THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
      |  CAST(COALESCE(SUM(CASE WHEN state = 'fresh' THEN cvalue END), 0) AS BIGINT)
      |    AS sum_fresh_calib_cents
      |FROM st
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q220
  /** TOP-K UNDER TIES — the rank/dense_rank/row_number contract that
    * decides whether "top 3" can return more than 3 rows: on tied cent
    * values per type, count rows admitted by rank() ≤ 3 (ties
    * included, gaps after), dense_rank() ≤ 3 (ties included, no gaps —
    * admits the most), and row_number() ≤ 3 (exactly 3, tie broken by
    * the total order). The containment laws rn ≤ rank ≤ dense ride as
    * pinned columns.
    */
  def q220TopkTies(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables
      .events(s, dir)
      .select(
        col("event_type"),
        col("event_id"),
        expr("cast(floor(value * 100 + 0.5) as bigint) div 1000").as("coarse"))
    val wTie = Window.partitionBy(col("event_type")).orderBy(col("coarse").desc)
    val wTot = Window
      .partitionBy(col("event_type"))
      .orderBy(col("coarse").desc, col("event_id").asc)
    ev.withColumn("rk", rank().over(wTie))
      .withColumn("dk", dense_rank().over(wTie))
      .withColumn("rn", row_number().over(wTot))
      .groupBy(col("event_type"))
      .agg(
        sum((col("rn") <= 3).cast("long")).as("n_rownum3"),
        sum((col("rk") <= 3).cast("long")).as("n_rank3"),
        sum((col("dk") <= 3).cast("long")).as("n_dense3"))
      .withColumn(
        "containment_ok",
        col("n_rownum3") <= col("n_rank3") && col("n_rank3") <= col("n_dense3"))
      .orderBy(col("event_type"))
  }

  val q220Oracle: String =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(floor("value" * 100 + 0.5) AS BIGINT) // 1000 AS coarse
      |  FROM events
      |), r AS (
      |  SELECT event_type,
      |    rank() OVER (PARTITION BY event_type ORDER BY coarse DESC) AS rk,
      |    dense_rank() OVER (PARTITION BY event_type ORDER BY coarse DESC) AS dk,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY coarse DESC, event_id ASC) AS rn
      |  FROM e
      |)
      |SELECT event_type,
      |  CAST(SUM(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rownum3,
      |  CAST(SUM(CASE WHEN rk <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rank3,
      |  CAST(SUM(CASE WHEN dk <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dense3,
      |  (SUM(CASE WHEN rn <= 3 THEN 1 ELSE 0 END)
      |     <= SUM(CASE WHEN rk <= 3 THEN 1 ELSE 0 END)
      |   AND SUM(CASE WHEN rk <= 3 THEN 1 ELSE 0 END)
      |     <= SUM(CASE WHEN dk <= 3 THEN 1 ELSE 0 END)) AS containment_ok
      |FROM r
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q221
  /** DETERMINISTIC NESTED SAMPLING — reproducible Bernoulli sampling
    * via a portable content hash (md5-prefix integer mod 100, the
    * q116 digest discipline — NOT rand(): a re-run, a different
    * partitioning, or a different engine must select the SAME rows),
    * with the nested-rates law: thresholded membership makes the 5%
    * sample a strict subset of the 10% sample (violations pinned 0) —
    * the property that lets a pipeline grow its sample without
    * reshuffling history. Membership checksums certify the exact
    * selected set, not just its size.
    */
  def q221NestedSampling(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .select(col("event_id"))
      .withColumn(
        "h",
        expr("cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint) % 100"))
      .withColumn("s5", col("h") < 5)
      .withColumn("s10", col("h") < 10)
    ev.agg(
      count(lit(1)).as("n"),
      sum(col("s5").cast("long")).as("n_s5"),
      sum(col("s10").cast("long")).as("n_s10"),
      sum((col("s5") && !col("s10")).cast("long")).as("nested_violations"),
      coalesce(sum(when(col("s5"), col("event_id"))), lit(0L)).as("s5_id_sum"),
      coalesce(sum(when(col("s10"), col("event_id"))), lit(0L)).as("s10_id_sum"))
  }

  val q221Oracle: String =
    """WITH e AS (
      |  SELECT event_id,
      |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS h
      |  FROM events
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN h < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_s5,
      |  CAST(SUM(CASE WHEN h < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_s10,
      |  CAST(SUM(CASE WHEN h < 5 AND NOT h < 10 THEN 1 ELSE 0 END) AS BIGINT) AS nested_violations,
      |  CAST(COALESCE(SUM(CASE WHEN h < 5 THEN event_id END), 0) AS BIGINT) AS s5_id_sum,
      |  CAST(COALESCE(SUM(CASE WHEN h < 10 THEN event_id END), 0) AS BIGINT) AS s10_id_sum
      |FROM e""".stripMargin

  // ---------------------------------------------------------------- q222
  /** EQUI-DEPTH QUARTILE BOUNDARIES — per type, the discrete
    * rank-selected q25/q50/q75 cut points of the cent values (the
    * q92/q97 order-statistic recipe, here as a reusable boundary
    * table), plus the equi-depth law: bucketing BY those boundaries
    * puts between ⌊n/4⌋ and ⌈n/4⌉+ties rows in each bucket — the
    * bucket-size spread is emitted so a drifting boundary rule shows
    * up as numbers, not vibes.
    */
  def q222Equidepth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables
      .events(s, dir)
      .select(
        col("event_type"),
        col("event_id"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("cents"), col("event_id"))
    val ranked = ev
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    val bounds = ranked
      .where(
        col("rn") === expr("(n + 3) div 4") ||
          col("rn") === expr("(n + 1) div 2") ||
          col("rn") === expr("(3 * n + 1) div 4"))
      .groupBy(col("event_type"), col("n"))
      .agg(
        min(when(col("rn") === expr("(n + 3) div 4"), col("cents"))).as("q25"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("cents"))).as("q50"),
        min(when(col("rn") === expr("(3 * n + 1) div 4"), col("cents"))).as("q75"))
    val b2 = bounds.withColumnsRenamed(Map("event_type" -> "et2", "n" -> "n2"))
    ev.join(broadcast(b2), col("event_type") === col("et2"))
      .withColumn(
        "bucket",
        when(col("cents") <= col("q25"), 1)
          .when(col("cents") <= col("q50"), 2)
          .when(col("cents") <= col("q75"), 3)
          .otherwise(4))
      .groupBy(col("event_type"), col("q25"), col("q50"), col("q75"))
      .agg(
        count(lit(1)).as("n"),
        sum((col("bucket") === 1).cast("long")).as("c1"),
        sum((col("bucket") === 2).cast("long")).as("c2"),
        sum((col("bucket") === 3).cast("long")).as("c3"),
        sum((col("bucket") === 4).cast("long")).as("c4"))
      .select(
        col("event_type"), col("q25"), col("q50"), col("q75"), col("n"),
        (col("c1") > 0).as("has_b1"),
        col("c1").as("n_b1"),
        col("c4").as("n_b4"),
        (greatest(col("c1"), col("c2"), col("c3"), col("c4")) -
          least(col("c1"), col("c2"), col("c3"), col("c4"))).as("bucket_spread"))
      .orderBy(col("event_type"))
  }

  val q222Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, event_id,
      |    CAST(floor("value" * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM ev
      |), b AS (
      |  SELECT event_type,
      |    MIN(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q25,
      |    MIN(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS q50,
      |    MIN(CASE WHEN rn = (3 * n + 1) // 4 THEN cents END) AS q75
      |  FROM r
      |  WHERE rn = (n + 3) // 4 OR rn = (n + 1) // 2 OR rn = (3 * n + 1) // 4
      |  GROUP BY event_type
      |), bk AS (
      |  SELECT ev.event_type, b.q25, b.q50, b.q75,
      |    CASE WHEN cents <= q25 THEN 1 WHEN cents <= q50 THEN 2
      |         WHEN cents <= q75 THEN 3 ELSE 4 END AS bucket
      |  FROM ev JOIN b ON b.event_type = ev.event_type
      |), agg AS (
      |  SELECT event_type, q25, q50, q75,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN bucket = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
      |    CAST(SUM(CASE WHEN bucket = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
      |    CAST(SUM(CASE WHEN bucket = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4
      |  FROM bk GROUP BY event_type, q25, q50, q75
      |)
      |SELECT event_type, q25, q50, q75, n,
      |  (c1 > 0) AS has_b1, c1 AS n_b1, c4 AS n_b4,
      |  CAST(GREATEST(c1, c2, c3, c4) - LEAST(c1, c2, c3, c4) AS BIGINT) AS bucket_spread
      |FROM agg
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q223
  /** NEW vs RETURNING — per day: users seen for the FIRST time
    * (min-day argmin) vs returning actives, plus the cumulative unique
    * count as the running sum of new arrivals — the identity that
    * makes "cumulative distinct over time" computable without a
    * distinct-per-prefix rescan (the mergeable-distinct q192 point, on
    * the time axis).
    */
  def q223NewVsReturning(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ud = Tables
      .events(s, dir)
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("eday"))
      .distinct()
    val firstDay = ud.groupBy(col("user_id")).agg(min(col("eday")).as("fday"))
    val daily = ud
      .join(firstDay, Seq("user_id"))
      .groupBy(col("eday"))
      .agg(
        count(lit(1)).as("n_active"),
        sum((col("eday") === col("fday")).cast("long")).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
    daily
      .withColumn(
        "cum_unique",
        sum(col("n_new")).over(
          Window.orderBy(col("eday")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(
        col("eday").cast("long").as("eday"),
        col("n_active"),
        col("n_new"),
        col("n_returning"),
        col("cum_unique").cast("long").as("cum_unique"))
      .orderBy(col("eday"))
  }

  val q223Oracle: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS eday FROM events
      |), fd AS (
      |  SELECT user_id, MIN(eday) AS fday FROM ud GROUP BY user_id
      |), d AS (
      |  SELECT ud.eday, CAST(COUNT(*) AS BIGINT) AS n_active,
      |    CAST(SUM(CASE WHEN ud.eday = fd.fday THEN 1 ELSE 0 END) AS BIGINT) AS n_new
      |  FROM ud JOIN fd ON fd.user_id = ud.user_id
      |  GROUP BY ud.eday
      |)
      |SELECT CAST(eday AS BIGINT) AS eday, n_active, n_new,
      |  n_active - n_new AS n_returning,
      |  CAST(SUM(n_new) OVER (ORDER BY eday ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_unique
      |FROM d
      |ORDER BY eday""".stripMargin

  // ---------------------------------------------------------------- q224
  /** WEEK-OVER-WEEK GROWTH — weekly event counts per type with
    * integer-ppm growth vs the prior week (floor((cur − prev)·10⁶ /
    * prev) — negative growth floors toward −∞ identically on both
    * engines because DuckDB // and Spark div BOTH truncate… which
    * DIFFERS for negative quotients, so the growth ratio is computed
    * on the NON-NEGATIVE shifted form cur·10⁶ div prev − 10⁶, keeping
    * every division non-negative before the subtraction). First week
    * has no prior and reports null growth.
    */
  def q224WowGrowth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekly = Tables
      .events(s, dir)
      .groupBy(
        col("event_type"),
        expr("(ts_ns div 86400000000000) div 7").as("wk"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
    weekly
      .withColumn("prev", lag(col("cnt"), 1).over(w))
      .select(
        col("event_type"),
        col("wk").cast("long").as("wk"),
        col("cnt"),
        col("prev"),
        when(col("prev").isNull, lit(null))
          .otherwise(expr("(cnt * 1000000) div prev - 1000000")).as("growth_ppm"))
      .orderBy(col("event_type"), col("wk"))
  }

  val q224Oracle: String =
    """WITH wv AS (
      |  SELECT event_type, (epoch_ns(ts) // 86400000000000) // 7 AS wk,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2
      |), l AS (
      |  SELECT event_type, wk, cnt,
      |    lag(cnt) OVER (PARTITION BY event_type ORDER BY wk) AS prev
      |  FROM wv
      |)
      |SELECT event_type, CAST(wk AS BIGINT) AS wk, cnt, prev,
      |  CASE WHEN prev IS NULL THEN NULL
      |       ELSE CAST((cnt * 1000000) // prev - 1000000 AS BIGINT) END AS growth_ppm
      |FROM l
      |ORDER BY event_type, wk""".stripMargin


  // ---------------------------------------------------------------- q225
  /** MULTI-SOURCE BFS layers ([[graft.ops.Bfs]]) — shortest hop
    * distance from a sparse seed set over the symmetrized shared block
    * graph (q174/q184's), unrolled to depth 4. Seeds are the keys
    * ≡ 3 (mod 50) — one per fifth block, so blocks WITH a seed fill in
    * 1–3 hops while seedless blocks stay unreached (reported as
    * dist −1): the histogram exercises first-reach assignment, the
    * anti-join frontier discipline, AND the unreached complement in
    * one contract. The oracle unrolls the same four frontier rounds as
    * chained MATERIALIZED CTEs (the q184 discipline — each round
    * references its predecessor twice) and must land on identical
    * (bucket, dist) counts.
    */
  def q225BfsLayers(s: SparkSession, dir: String): DataFrame = {
    val raw = blockGraph(s, dir)
    val sym = raw
      .select(col("u").as("src"), col("v").as("dst"))
      .unionByName(raw.select(col("v").as("src"), col("u").as("dst")))
      .distinct()
    val nodes = sym.select(col("src").as("node")).distinct()
    val seeds = nodes.filter(expr("node % 50 = 3"))
    val reached = graft.ops.Bfs.layers(sym, seeds, maxDepth = 4)
    val withDist = nodes
      .join(reached, Seq("node"), "left")
      .select(col("node"), coalesce(col("dist"), lit(-1)).as("dist"))
    withDist
      .groupBy(expr("node div 500").as("bucket"), col("dist"))
      .agg(count(lit(1)).as("n_nodes"))
      .select(col("bucket"), col("dist"), col("n_nodes"))
      .orderBy(col("bucket"), col("dist"))
  }

  val q225Oracle: String = {
    def round(r: Int): String =
      s"""f$r AS MATERIALIZED (
         |  SELECT DISTINCT s.dst AS node FROM sym s JOIN f${r - 1} f ON f.node = s.src
         |  WHERE NOT EXISTS (SELECT 1 FROM v${r - 1} v WHERE v.node = s.dst)),
         |v$r AS MATERIALIZED (
         |  SELECT node, dist FROM v${r - 1} UNION ALL SELECT node, $r AS dist FROM f$r),
         |""".stripMargin
    s"""WITH eset AS MATERIALIZED (
       |$BlockGraphSql
       |),
       |sym AS MATERIALIZED (
       |  SELECT u AS src, v AS dst FROM eset UNION SELECT v, u FROM eset),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
       |v0 AS MATERIALIZED (
       |  SELECT node, 0 AS dist FROM nodes WHERE node % 50 = 3),
       |f0 AS (SELECT node FROM v0),
       |${round(1)}${round(2)}${round(3)}${round(4)}
       |labeled AS (
       |  SELECT n.node,
       |         COALESCE(v.dist, -1) AS dist
       |  FROM nodes n LEFT JOIN v4 v ON v.node = n.node)
       |SELECT node // 500 AS bucket, CAST(dist AS INT) AS dist,
       |       CAST(COUNT(*) AS BIGINT) AS n_nodes
       |FROM labeled
       |GROUP BY 1, 2
       |ORDER BY bucket, dist""".stripMargin
  }


  // ---------------------------------------------------------------- q226
  /** PII PATTERN SCAN + REDACTION accounting — the pre-training
    * compliance pass: count per-source occurrences of five PII-shaped
    * pattern classes (email, NANP-style phone, IPv4, SSN-shape, URL)
    * and measure how many characters a full redaction removes. The
    * corpus text carries no such patterns naturally, so deterministic
    * decoys are synthesized from doc_id IDENTICALLY on both engines
    * (the q121 discipline) — the certificate can never be vacuous.
    * Patterns stay inside the Java-regex ∩ RE2 common subset (ASCII
    * classes, bounded quantifiers, no lookaround, no alternation
    * beyond `https?`), where both engines' leftmost-greedy
    * non-overlapping scans agree; redaction replaces in a fixed
    * URL→email→IP→SSN→phone order so class overlaps cannot
    * double-count removed spans. One corpus scan, one per-source
    * hash aggregate — map-side regex, no UDFs, no shuffle beyond the
    * final |sources|-row rollup.
    */
  private val PiiEmailRe = graft.streaming.StreamingPii.EmailRe
  private val PiiPhoneRe = graft.streaming.StreamingPii.PhoneRe
  private val PiiIpRe = graft.streaming.StreamingPii.IpRe
  private val PiiSsnRe = graft.streaming.StreamingPii.SsnRe
  private val PiiUrlRe = graft.streaming.StreamingPii.UrlRe

  def q226PiiScan(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val id = col("doc_id")
    def sfx(cond: Column, piece: Column): Column =
      when(cond, piece).otherwise(lit(""))
    val aug = concat(
      col("text"),
      sfx(id % 5 === 0, concat(lit(" see https://example.org/doc/"), id.cast("string"))),
      sfx(id % 7 === 0, concat(lit(" contact user"), id.cast("string"), lit("@example.com"))),
      sfx(id % 11 === 0, concat(lit(" call 415-555-"), lpad((id % 10000).cast("string"), 4, "0"))),
      sfx(id % 13 === 0, concat(lit(" from 10.0."), (id % 256).cast("string"), lit("."), ((id * 7) % 256).cast("string"))),
      sfx(id % 17 === 0, concat(lit(" ssn 123-45-"), lpad((id % 10000).cast("string"), 4, "0")))
    )
    def cnt(re: String): Column =
      size(regexp_extract_all(col("aug"), lit(re), lit(0))).cast("long")
    val redacted = Seq(PiiUrlRe, PiiEmailRe, PiiIpRe, PiiSsnRe, PiiPhoneRe)
      .foldLeft(col("aug"))((c, re) => regexp_replace(c, re, ""))
    docs
      .withColumn("aug", aug)
      .select(
        col("source"),
        cnt(PiiEmailRe).as("e"),
        cnt(PiiPhoneRe).as("p"),
        cnt(PiiIpRe).as("i"),
        cnt(PiiSsnRe).as("n"),
        cnt(PiiUrlRe).as("u"),
        (length(col("aug")) - length(redacted)).cast("long").as("rc")
      )
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("e")).as("n_emails"),
        sum(col("p")).as("n_phones"),
        sum(col("i")).as("n_ips"),
        sum(col("n")).as("n_ssns"),
        sum(col("u")).as("n_urls"),
        sum(col("rc")).as("redacted_chars")
      )
      .orderBy(col("source"))
  }

  val q226Oracle: String = {
    s"""WITH aug AS (
       |  SELECT source,
       |    text
       |    || CASE WHEN doc_id % 5 = 0 THEN ' see https://example.org/doc/' || CAST(doc_id AS VARCHAR) ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
       |    || CASE WHEN doc_id % 11 = 0 THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
       |    || CASE WHEN doc_id % 13 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
       |    || CASE WHEN doc_id % 17 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
       |    AS a
       |  FROM documents)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len(regexp_extract_all(a, '$PiiEmailRe'))) AS BIGINT) AS n_emails,
       |  CAST(SUM(len(regexp_extract_all(a, '$PiiPhoneRe'))) AS BIGINT) AS n_phones,
       |  CAST(SUM(len(regexp_extract_all(a, '$PiiIpRe'))) AS BIGINT) AS n_ips,
       |  CAST(SUM(len(regexp_extract_all(a, '$PiiSsnRe'))) AS BIGINT) AS n_ssns,
       |  CAST(SUM(len(regexp_extract_all(a, '$PiiUrlRe'))) AS BIGINT) AS n_urls,
       |  CAST(SUM(length(a) - length(
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |      a, '$PiiUrlRe', '', 'g'), '$PiiEmailRe', '', 'g'), '$PiiIpRe', '', 'g'),
       |      '$PiiSsnRe', '', 'g'), '$PiiPhoneRe', '', 'g'))) AS BIGINT) AS redacted_chars
       |FROM aug
       |GROUP BY source
       |ORDER BY source"""
  }.stripMargin


  // ---------------------------------------------------------------- q227
  /** KEY-SKEW DIAGNOSTICS REPORT — the numbers an operator looks at
    * before choosing salting/AQE settings for a 100 TB shuffle: for
    * each join-key distribution (lineitem by l_suppkey, orders by
    * o_custkey) the key cardinality, row count, heaviest-key and
    * top-10-key load shares, and the exact GINI concentration
    * coefficient — all in integer/ppm arithmetic so the certificate is
    * engine-exact. Gini comes from the rank-weighted form
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over counts ranked ascending;
    * the ranking uses [[graft.ops.Rank.rankWithin]] (range-binned
    * two-pass — no single-task global window even when the key table
    * itself is huge), and the oracle replays the plain single-window
    * definition the two-pass must equal (the q117 discipline).
    * Per-row products are widened to decimal(38,0)/HUGEINT BEFORE the
    * sum (the q170 overflow rule).
    */
  def q227SkewGini(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey").cast("long").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rel", lit("lineitem_suppkey"))
    val ord = Tables.orders(s, dir)
      .groupBy(col("o_custkey").cast("long").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rel", lit("orders_custkey"))
    val freq = li.unionByName(ord)
    val ranked = graft.ops.Rank
      .rankWithin(freq, Seq("rel"), col("cnt"), col("key"), "rnk")
      .withColumn("ixi", col("rnk").cast("decimal(38,0)") * col("cnt").cast("decimal(38,0)"))
    val tot = ranked
      .groupBy(col("rel"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("top1"),
        sum(col("ixi")).as("sum_ixi")
      )
    val top10 = ranked
      .join(tot.select(col("rel"), col("n_keys").as("nk")), Seq("rel"))
      .filter(col("rnk") > col("nk") - 10)
      .groupBy(col("rel"))
      .agg(sum(col("cnt")).as("top10"))
    tot
      .join(top10, Seq("rel"))
      .select(
        col("rel"),
        col("n_keys"),
        col("n_rows"),
        expr("cast((top1 * 1000000) div n_rows as bigint)").as("top1_ppm"),
        expr("cast((top10 * 1000000) div n_rows as bigint)").as("top10_ppm"),
        expr(
          "cast(((2 * sum_ixi - (n_keys + 1) * cast(n_rows as decimal(38,0))) * 1000000) div (n_keys * cast(n_rows as decimal(38,0))) as bigint)"
        ).as("gini_ppm")
      )
      .orderBy(col("rel"))
  }

  val q227Oracle: String =
    """WITH freq AS (
      |  SELECT 'lineitem_suppkey' AS rel, CAST(l_suppkey AS BIGINT) AS key,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 2
      |  UNION ALL
      |  SELECT 'orders_custkey', CAST(o_custkey AS BIGINT),
      |         CAST(COUNT(*) AS BIGINT)
      |  FROM orders GROUP BY 2),
      |ranked AS (
      |  SELECT rel, key, cnt,
      |         ROW_NUMBER() OVER (PARTITION BY rel ORDER BY cnt, key) AS rnk
      |  FROM freq),
      |tot AS (
      |  SELECT rel,
      |         CAST(COUNT(*) AS BIGINT) AS n_keys,
      |         CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |         CAST(MAX(cnt) AS BIGINT) AS top1,
      |         SUM(CAST(rnk AS HUGEINT) * CAST(cnt AS HUGEINT)) AS sum_ixi
      |  FROM ranked GROUP BY rel),
      |t10 AS (
      |  SELECT r.rel, CAST(SUM(r.cnt) AS BIGINT) AS top10
      |  FROM ranked r JOIN tot t ON t.rel = r.rel
      |  WHERE r.rnk > t.n_keys - 10
      |  GROUP BY r.rel)
      |SELECT t.rel, t.n_keys, t.n_rows,
      |  CAST((t.top1 * 1000000) // t.n_rows AS BIGINT) AS top1_ppm,
      |  CAST((t10.top10 * 1000000) // t.n_rows AS BIGINT) AS top10_ppm,
      |  CAST(((2 * t.sum_ixi - (t.n_keys + 1) * CAST(t.n_rows AS HUGEINT)) * 1000000)
      |       // (t.n_keys * CAST(t.n_rows AS HUGEINT)) AS BIGINT) AS gini_ppm
      |FROM tot t JOIN t10 ON t10.rel = t.rel
      |ORDER BY t.rel""".stripMargin


  // ---------------------------------------------------------------- q228
  /** LENGTH-MATCHED NEGATIVE SAMPLING for contrastive training — for
    * each anchor document, pick 3 deterministic "hard-ish" negatives
    * from the SAME length bucket but a DIFFERENT source (length-matched
    * so the pair can't be separated by a length shortcut; cross-source
    * so trivial near-dups are excluded). Selection is a pure function
    * of (anchor_id, candidate_id): the md5-prefix integer of the pair
    * key ranks candidates (the q85/q221 seeded-hash discipline), so
    * the sample replays exactly on any engine and any partitioning.
    * Scale shape: candidates come from a bucket-equi join (bounded by
    * per-bucket population, never all-pairs), ranking is a window over
    * fine-grained per-anchor groups, and no state collects anywhere.
    */
  def q228NegativeSampling(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(
        col("doc_id"),
        col("source"),
        expr("n_chars div 100").as("bucket"))
    val anchors = docs
      .filter(col("doc_id") % 9 === 0)
      .select(
        col("doc_id").as("anchor_id"),
        col("source").as("a_source"),
        col("bucket"))
    val cand = anchors
      .join(docs, Seq("bucket"))
      .filter(col("source") =!= col("a_source") && col("doc_id") =!= col("anchor_id"))
      .withColumn(
        "rk",
        conv(
          substring(
            md5(concat(col("anchor_id").cast("string"), lit(":"), col("doc_id").cast("string"))),
            1, 15),
          16, 10).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id"))
      .orderBy(col("rk"), col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("anchor_id"))
    cand
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .withColumn("n_cands", count(lit(1)).over(wAll))
      .filter(col("neg_rank") <= 3)
      .select(col("anchor_id"), col("neg_rank"), col("doc_id").as("neg_id"), col("n_cands"))
      .orderBy(col("anchor_id"), col("neg_rank"))
  }

  val q228Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source, n_chars // 100 AS bucket FROM documents),
      |anchors AS (
      |  SELECT doc_id AS anchor_id, source AS a_source, bucket
      |  FROM d WHERE doc_id % 9 = 0),
      |cand AS (
      |  SELECT a.anchor_id, c.doc_id AS neg_id,
      |    CAST(('0x' || substr(md5(CAST(a.anchor_id AS VARCHAR) || ':' || CAST(c.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS rk
      |  FROM anchors a
      |  JOIN d c ON c.bucket = a.bucket
      |   AND c.source <> a.a_source AND c.doc_id <> a.anchor_id),
      |ranked AS (
      |  SELECT anchor_id, neg_id,
      |    ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY rk, neg_id) AS neg_rank,
      |    COUNT(*) OVER (PARTITION BY anchor_id) AS n_cands
      |  FROM cand)
      |SELECT CAST(anchor_id AS BIGINT) AS anchor_id,
      |       CAST(neg_rank AS BIGINT) AS neg_rank,
      |       CAST(neg_id AS BIGINT) AS neg_id,
      |       CAST(n_cands AS BIGINT) AS n_cands
      |FROM ranked
      |WHERE neg_rank <= 3
      |ORDER BY anchor_id, neg_rank""".stripMargin


  // ---------------------------------------------------------------- q229
  /** QUALITY-FILTER ABLATION MATRIX — the study a curation team runs
    * before committing to a filter stack: partition the corpus by the
    * 2³ = 8 pass/fail combinations of three independent gates (length
    * 40–1000 tokens, uniqueness 2·n_uniq ≥ n_tokens, stopword evidence
    * ≥ 2) and report each cell's document and token mass, so the
    * marginal cost of every gate (and every gate INTERACTION) is one
    * row read. Predicates are integer-exact (no float thresholds to
    * drift cross-engine); a single corpus scan feeds one 8-group
    * aggregate — the ablation costs the same as one filter pass
    * regardless of how many gates are studied. Token columns replay
    * relationally in DuckDB (the q21 list-function mirror).
    */
  def q229FilterAblation(s: SparkSession, dir: String): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    val stopList = Seq("the", "a", "of", "and", "is", "to", "in")
    Tables.documents(s, dir)
      .withColumn("toks", toks)
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_uniq", size(array_distinct(col("toks"))).cast("long"))
      .withColumn(
        "n_stop",
        size(filter(col("toks"), t => t.isin(stopList: _*))).cast("long"))
      .withColumn(
        "mask",
        (when(col("n_tok").between(40, 1000), 4).otherwise(0) +
          when(col("n_uniq") * 2 >= col("n_tok"), 2).otherwise(0) +
          when(col("n_stop") >= 2, 1).otherwise(0)).cast("int"))
      .groupBy(col("mask"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_uniq")).as("n_uniq_tokens"))
      .orderBy(col("mask"))
  }

  val q229Oracle: String =
    """WITH t AS (
      |  SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), f AS (
      |  SELECT
      |    CAST(len(toks) AS BIGINT) AS n_tok,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
      |    CAST(len(list_filter(toks, x ->
      |      list_contains(['the','a','of','and','is','to','in'], x))) AS BIGINT) AS n_stop
      |  FROM t
      |)
      |SELECT CAST(CASE WHEN n_tok BETWEEN 40 AND 1000 THEN 4 ELSE 0 END
      |          + CASE WHEN n_uniq * 2 >= n_tok THEN 2 ELSE 0 END
      |          + CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INT) AS mask,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(SUM(n_uniq) AS BIGINT) AS n_uniq_tokens
      |FROM f
      |GROUP BY 1
      |ORDER BY mask""".stripMargin


  // ---------------------------------------------------------------- q230
  /** SET-SIMILARITY SELF-JOIN via PREFIX FILTERING
    * ([[graft.ops.PrefixJoin]], PPJoin family) — every document pair
    * with token-set Jaccard ≥ 3/5, found through the rarest-first
    * prefix inverted index instead of the all-pairs product. Distinct
    * pruning theorem from the engine's other near-dup paths (MinHash
    * banding = probabilistic, SparseSim df-cap = cosine + weight
    * bound; the prefix lemma is EXACT for Jaccard — zero false
    * negatives by construction, spec-proved against brute force). The
    * oracle replays the entire pipeline relationally — df ranks,
    * integer ⌈t·n⌉ prefixes, candidate join, exact rational verify —
    * with zero embedded literals.
    *
    * BOUNDED audit slice (doc_id < 600, the q46/q91 class): this
    * corpus carries template families where thousands of docs are
    * mutually ≥ 0.6-similar, so "emit every qualifying pair" is
    * quadratic IN ITS OUTPUT by definition (measured: 7.1M pairs /
    * 153 s at sf0.1 unbounded). The production composition is
    * PrefixJoin → Components → one representative per cluster
    * (assignments, linear output — the q33 shape); the slice keeps
    * this row's purpose (certifying the prefix lemma end-to-end
    * against the oracle) at bounded cost.
    */
  def q230PpJoin(s: SparkSession, dir: String): DataFrame =
    graft.ops.PrefixJoin
      .jaccardSelfJoin(
        Tables.documents(s, dir).filter(col("doc_id") < 600),
        "doc_id", "text", 3, 5)
      .orderBy(col("id_a"), col("id_b"))

  val q230Oracle: String =
    """WITH tk AS (
      |  SELECT doc_id AS id,
      |         list_distinct(string_split_regex(trim(text), '\s+')) AS ts
      |  FROM documents WHERE doc_id < 600),
      |tk2 AS (
      |  SELECT id, ts, CAST(len(ts) AS BIGINT) AS n FROM tk WHERE len(ts) > 0),
      |posting AS (
      |  SELECT id, n, unnest(ts) AS tok FROM tk2),
      |dfreq AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM posting GROUP BY tok),
      |pos AS (
      |  SELECT p.id, p.n, p.tok,
      |         ROW_NUMBER() OVER (PARTITION BY p.id ORDER BY d.df, p.tok) AS pos
      |  FROM posting p JOIN dfreq d ON d.tok = p.tok),
      |prefix AS (
      |  SELECT tok, id FROM pos WHERE pos <= n - ((3 * n + 4) // 5) + 1),
      |cand AS (
      |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
      |  FROM prefix a JOIN prefix b ON b.tok = a.tok AND b.id > a.id),
      |v AS (
      |  SELECT c.id_a, c.id_b,
      |         CAST(len(list_intersect(ta.ts, tb.ts)) AS BIGINT) AS inter,
      |         ta.n + tb.n AS nsum
      |  FROM cand c
      |  JOIN tk2 ta ON ta.id = c.id_a
      |  JOIN tk2 tb ON tb.id = c.id_b)
      |SELECT id_a, id_b, inter, nsum - inter AS uni,
      |       CAST((inter * 1000000) // (nsum - inter) AS BIGINT) AS jaccard_ppm
      |FROM v
      |WHERE inter * 5 >= (nsum - inter) * 3
      |ORDER BY id_a, id_b""".stripMargin


  // ---------------------------------------------------------------- q231
  /** PHRASE SEARCH over a positional n-gram index — the inverted-index
    * primitive behind "find every document containing this exact
    * 3-token phrase". To keep the certificate literal-free AND
    * non-vacuous, the probe phrase is derived IN-QUERY on both
    * engines: the corpus-wide most frequent 3-gram (ties → smallest
    * gram string), then every document's exact occurrence count of
    * that phrase is aggregated per source. Exercises order-preserving
    * n-gram construction (positions, not bags), a corpus-wide argmax
    * with deterministic ties (the min(struct) idiom), and a broadcast
    * scalar probe — one corpus scan for the index, one for the match.
    */
  def q231PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    val toksed = Tables.documents(s, dir)
      .withColumn("toks", TextStats.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("grams", TextStats.ngrams(col("toks"), 3))
    val top = toksed
      .select(explode(col("grams")).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("c"))
      .agg(min(struct((-col("c")).as("nc"), col("g").as("g"))).as("m"))
      .select(col("m.g").as("phrase"))
    toksed
      .crossJoin(broadcast(top))
      .withColumn(
        "occ",
        size(filter(col("grams"), x => x === col("phrase"))).cast("long"))
      .filter(col("occ") > 0)
      .groupBy(col("source"), col("phrase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("occ")).as("n_occ"))
      .orderBy(col("source"))
  }

  val q231Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |t3 AS (SELECT * FROM t WHERE len(toks) >= 3),
      |g AS (
      |  SELECT doc_id, source,
      |    list_transform(range(0, len(toks) - 2),
      |                   i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]) AS grams
      |  FROM t3),
      |cnt AS (
      |  SELECT gr, COUNT(*) AS c FROM (SELECT unnest(grams) AS gr FROM g) GROUP BY gr),
      |top AS (SELECT gr AS phrase FROM cnt ORDER BY c DESC, gr LIMIT 1),
      |m AS (
      |  SELECT g.source, top.phrase,
      |         CAST(len(list_filter(g.grams, x -> x = top.phrase)) AS BIGINT) AS occ
      |  FROM g, top)
      |SELECT source, phrase,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(occ) AS BIGINT) AS n_occ
      |FROM m
      |WHERE occ > 0
      |GROUP BY source, phrase
      |ORDER BY source""".stripMargin


  // ---------------------------------------------------------------- q232
  /** MERKLE-STYLE HIERARCHICAL SNAPSHOT DIFF — reconcile two table
    * snapshots by drilling down through range digests instead of
    * joining every row: level-1 ranges (key div 512) compare
    * (sum-mod-2⁶¹−1 digest, count); only DIVERGENT ranges descend to
    * level-2 (div 64); only divergent level-2 ranges pay the
    * row-level full-outer join. At 100 TB this reads the full table
    * once for digests and touches row data only inside changed ranges
    * — the anti-entropy shape (Dynamo/Cassandra repair trees), built
    * here from the engine's q116/q123 digest family. Snapshot B is a
    * deterministic perturbation of orders (delete keys ≡ 0 mod 97,
    * modify payload of keys ≡ 0 mod 101), so add/delete/modify counts
    * are non-vacuous; the certificate computes the SAME diff both via
    * the drill-down and via the direct all-rows join and pins their
    * equality as verdict columns. Digests are md5-prefix integers
    * (engine-portable; the q116 '0x'-cast ↔ conv() bridge).
    */
  def q232MerkleDiff(s: SparkSession, dir: String): DataFrame = {
    val M = lit(2305843009213693951L) // 2^61 - 1
    def digest(key: Column, payload: Column): Column =
      conv(substring(md5(concat(key.cast("string"), lit("|"), payload)), 1, 15), 16, 10)
        .cast("long") % M
    val a = Tables.orders(s, dir)
      .select(
        col("o_orderkey").as("key"),
        concat(col("o_custkey").cast("string"), lit("|"), col("o_orderstatus")).as("payload"))
    val b = a
      .filter(col("key") % 997 =!= 0) // deletions
      .withColumn(
        "payload",
        when(col("key") % 1009 === 0, concat(col("payload"), lit("|X")))
          .otherwise(col("payload"))) // modifications
    def digested(t: DataFrame) = t
      .withColumn("dig", digest(col("key"), col("payload")))
      .withColumn("r1", expr("key div 512"))
      .withColumn("r2", expr("key div 64"))
    val da = digested(a).persist()
    val db = digested(b).persist()
    def level(t: DataFrame, rc: String) = t
      .groupBy(col(rc))
      .agg(sum(col("dig")).as("sd"), count(lit(1)).as("cnt"))
    // level 1: full outer digest compare
    val l1 = level(da, "r1").as("x")
      .join(level(db, "r1").as("y"), col("x.r1") === col("y.r1"), "full_outer")
      .select(
        coalesce(col("x.r1"), col("y.r1")).as("r1"),
        (!(col("x.sd") <=> col("y.sd")) || !(col("x.cnt") <=> col("y.cnt"))).as("div1"))
    val divR1 = l1.filter(col("div1")).select(col("r1"))
    // level 2 only inside divergent level-1 ranges (semi-join pruning)
    def pruneL2(t: DataFrame) = level(
      t.join(broadcast(divR1), t("r1") === divR1("r1"), "left_semi"), "r2")
    val l2 = pruneL2(da).as("x")
      .join(pruneL2(db).as("y"), col("x.r2") === col("y.r2"), "full_outer")
      .select(
        coalesce(col("x.r2"), col("y.r2")).as("r2"),
        (!(col("x.sd") <=> col("y.sd")) || !(col("x.cnt") <=> col("y.cnt"))).as("div2"))
    val divR2 = l2.filter(col("div2")).select(col("r2"))
    // row-level diff only inside divergent level-2 ranges
    def pruneRows(t: DataFrame) =
      t.join(broadcast(divR2), t("r2") === divR2("r2"), "left_semi")
        .select(col("key"), col("dig"))
    val rowDiff = pruneRows(da).as("x")
      .join(pruneRows(db).as("y"), col("x.key") === col("y.key"), "full_outer")
      .agg(
        sum(when(col("x.key").isNotNull && col("y.key").isNotNull &&
          col("x.dig") =!= col("y.dig"), 1L).otherwise(0L)).as("n_mod"),
        sum(when(col("y.key").isNull, 1L).otherwise(0L)).as("n_del"),
        sum(when(col("x.key").isNull, 1L).otherwise(0L)).as("n_add"))
    // direct full diff (no narrowing) — the certificate's ground truth
    val direct = da.select(col("key"), col("dig")).as("x")
      .join(db.select(col("key"), col("dig")).as("y"), col("x.key") === col("y.key"), "full_outer")
      .agg(
        sum(when(col("x.key").isNotNull && col("y.key").isNotNull &&
          col("x.dig") =!= col("y.dig"), 1L).otherwise(0L)).as("d_mod"),
        sum(when(col("y.key").isNull, 1L).otherwise(0L)).as("d_del"),
        sum(when(col("x.key").isNull, 1L).otherwise(0L)).as("d_add"))
    val counts = l1.agg(
      count(lit(1)).as("n_l1"),
      sum(when(col("div1"), 1L).otherwise(0L)).as("n_l1_div"))
      .crossJoin(l2.agg(
        count(lit(1)).as("n_l2_checked"),
        sum(when(col("div2"), 1L).otherwise(0L)).as("n_l2_div")))
    counts
      .crossJoin(rowDiff)
      .crossJoin(direct)
      .select(
        col("n_l1"), col("n_l1_div"), col("n_l2_checked"), col("n_l2_div"),
        col("n_mod"), col("n_del"), col("n_add"),
        (col("n_mod") === col("d_mod")).as("mod_ok"),
        (col("n_del") === col("d_del")).as("del_ok"),
        (col("n_add") === col("d_add")).as("add_ok"))
  }

  val q232Oracle: String =
    """WITH a AS (
      |  SELECT o_orderkey AS key,
      |         CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus AS payload
      |  FROM orders),
      |b AS (
      |  SELECT key,
      |         CASE WHEN key % 1009 = 0 THEN payload || '|X' ELSE payload END AS payload
      |  FROM a WHERE key % 997 <> 0),
      |da AS (
      |  SELECT key, key // 512 AS r1, key // 64 AS r2,
      |    CAST(('0x' || substr(md5(CAST(key AS VARCHAR) || '|' || payload), 1, 15)) AS BIGINT)
      |      % 2305843009213693951 AS dig
      |  FROM a),
      |db AS (
      |  SELECT key, key // 512 AS r1, key // 64 AS r2,
      |    CAST(('0x' || substr(md5(CAST(key AS VARCHAR) || '|' || payload), 1, 15)) AS BIGINT)
      |      % 2305843009213693951 AS dig
      |  FROM b),
      |la1 AS (SELECT r1, SUM(dig) AS sd, COUNT(*) AS cnt FROM da GROUP BY r1),
      |lb1 AS (SELECT r1, SUM(dig) AS sd, COUNT(*) AS cnt FROM db GROUP BY r1),
      |l1 AS (
      |  SELECT COALESCE(x.r1, y.r1) AS r1,
      |         (x.sd IS DISTINCT FROM y.sd OR x.cnt IS DISTINCT FROM y.cnt) AS div1
      |  FROM la1 x FULL OUTER JOIN lb1 y ON y.r1 = x.r1),
      |la2 AS (
      |  SELECT r2, SUM(dig) AS sd, COUNT(*) AS cnt FROM da
      |  WHERE EXISTS (SELECT 1 FROM l1 WHERE l1.r1 = da.r1 AND l1.div1) GROUP BY r2),
      |lb2 AS (
      |  SELECT r2, SUM(dig) AS sd, COUNT(*) AS cnt FROM db
      |  WHERE EXISTS (SELECT 1 FROM l1 WHERE l1.r1 = db.r1 AND l1.div1) GROUP BY r2),
      |l2 AS (
      |  SELECT COALESCE(x.r2, y.r2) AS r2,
      |         (x.sd IS DISTINCT FROM y.sd OR x.cnt IS DISTINCT FROM y.cnt) AS div2
      |  FROM la2 x FULL OUTER JOIN lb2 y ON y.r2 = x.r2),
      |ra AS (SELECT key, dig FROM da
      |  WHERE EXISTS (SELECT 1 FROM l2 WHERE l2.r2 = da.r2 AND l2.div2)),
      |rb AS (SELECT key, dig FROM db
      |  WHERE EXISTS (SELECT 1 FROM l2 WHERE l2.r2 = db.r2 AND l2.div2)),
      |rd AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN x.key IS NOT NULL AND y.key IS NOT NULL AND x.dig <> y.dig
      |             THEN 1 ELSE 0 END) AS BIGINT) AS n_mod,
      |    CAST(SUM(CASE WHEN y.key IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_del,
      |    CAST(SUM(CASE WHEN x.key IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_add
      |  FROM ra x FULL OUTER JOIN rb y ON y.key = x.key),
      |direct AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN x.key IS NOT NULL AND y.key IS NOT NULL AND x.dig <> y.dig
      |             THEN 1 ELSE 0 END) AS BIGINT) AS d_mod,
      |    CAST(SUM(CASE WHEN y.key IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_del,
      |    CAST(SUM(CASE WHEN x.key IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_add
      |  FROM da x FULL OUTER JOIN db y ON y.key = x.key),
      |c1 AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_l1,
      |         CAST(SUM(CASE WHEN div1 THEN 1 ELSE 0 END) AS BIGINT) AS n_l1_div
      |  FROM l1),
      |c2 AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_l2_checked,
      |         CAST(SUM(CASE WHEN div2 THEN 1 ELSE 0 END) AS BIGINT) AS n_l2_div
      |  FROM l2)
      |SELECT c1.n_l1, c1.n_l1_div, c2.n_l2_checked, c2.n_l2_div,
      |       rd.n_mod, rd.n_del, rd.n_add,
      |       rd.n_mod = direct.d_mod AS mod_ok,
      |       rd.n_del = direct.d_del AS del_ok,
      |       rd.n_add = direct.d_add AS add_ok
      |FROM c1, c2, rd, direct""".stripMargin


  // ---------------------------------------------------------------- q233
  /** EXACT-RATIONAL χ² A/B TEST — the experimentation primitive, made
    * engine-exact end to end: cohorts by user_id parity, "conversion"
    * = the user's total purchase spend (CENTS-quantized,
    * floor(v·100 + 0.5) — the q128 integer-grid rule, so the sum is
    * associative-exact) above the global DISCRETE median spend (the
    * q92/q97 rank-selected order statistic — no interpolated
    * percentile to drift), and the 2×2 chi-square in closed form
    * χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)) — a pure integer
    * ratio, bit-identical on any engine (no float variance estimate
    * anywhere). Intermediates widen to decimal(38,0)/HUGEINT before
    * multiplying (the q170 rule). The significance verdict compares
    * ppm against the χ²₁ 0.05 critical value 3841459 — an exact
    * integer comparison, not a p-value approximation. A median split
    * guarantees non-degenerate cells on any corpus.
    */
  def q233ChiSquareAb(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(expr("cast(floor(value * 100 + 0.5) as long)")).as("cents"))
    // global discrete median via the range-binned two-pass rank (no
    // single-task global window even at huge user cardinality); the
    // oracle replays the plain window definition the two-pass equals
    val ranked = graft.ops.Rank
      .rankWithin(spend.withColumn("g", lit(1)), Seq("g"), col("cents"), col("user_id"), "rnk")
    val n = ranked.agg(count(lit(1)).as("n_users"))
    val med = ranked
      .crossJoin(broadcast(n))
      .filter(col("rnk") === expr("(n_users + 1) div 2"))
      .select(col("cents").as("med_cents"))
    val users = spend
      .crossJoin(broadcast(med))
      .withColumn("conv", when(col("cents") > col("med_cents"), 1).otherwise(0))
      .withColumn("cohort", when(col("user_id") % 2 === 0, "A").otherwise("B"))
    val cells = users.agg(
      sum(when(col("cohort") === "A" && col("conv") === 1, 1L).otherwise(0L)).as("a"),
      sum(when(col("cohort") === "A" && col("conv") === 0, 1L).otherwise(0L)).as("b"),
      sum(when(col("cohort") === "B" && col("conv") === 1, 1L).otherwise(0L)).as("c"),
      sum(when(col("cohort") === "B" && col("conv") === 0, 1L).otherwise(0L)).as("d"))
    cells.select(
      col("a"), col("b"), col("c"), col("d"),
      (col("a") + col("b") + col("c") + col("d")).as("n"),
      expr(
        """cast(((cast(a as decimal(38,0)) + b + c + d)
          |  * (cast(a as decimal(38,0)) * d - cast(b as decimal(38,0)) * c)
          |  * (cast(a as decimal(38,0)) * d - cast(b as decimal(38,0)) * c)
          |  * 1000000)
          | div ((cast(a as decimal(38,0)) + b) * (c + cast(d as decimal(38,0)))
          |      * (cast(a as decimal(38,0)) + c) * (b + cast(d as decimal(38,0))))
          | as bigint)""".stripMargin.replaceAll("\n", " ")).as("chi2_ppm"))
      .withColumn("significant", col("chi2_ppm") >= 3841459L)
  }

  val q233Oracle: String =
    """WITH spend AS (
      |  SELECT user_id,
      |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |ranked AS (
      |  SELECT user_id, cents,
      |         ROW_NUMBER() OVER (ORDER BY cents, user_id) AS rnk
      |  FROM spend),
      |med AS (
      |  SELECT cents AS med_cents FROM ranked
      |  WHERE rnk = ((SELECT COUNT(*) FROM spend) + 1) // 2),
      |u AS (
      |  SELECT s.user_id,
      |         CASE WHEN s.cents > m.med_cents THEN 1 ELSE 0 END AS conv
      |  FROM spend s, med m),
      |cells AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(SUM(CASE WHEN user_id % 2 <> 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |    CAST(SUM(CASE WHEN user_id % 2 <> 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      |  FROM u)
      |SELECT a, b, c, d, a + b + c + d AS n,
      |  CAST(((CAST(a AS HUGEINT) + b + c + d)
      |        * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
      |        * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
      |        * 1000000)
      |    // ((CAST(a AS HUGEINT) + b) * (c + CAST(d AS HUGEINT))
      |        * (CAST(a AS HUGEINT) + c) * (b + CAST(d AS HUGEINT))) AS BIGINT) AS chi2_ppm,
      |  CAST(((CAST(a AS HUGEINT) + b + c + d)
      |        * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
      |        * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
      |        * 1000000)
      |    // ((CAST(a AS HUGEINT) + b) * (c + CAST(d AS HUGEINT))
      |        * (CAST(a AS HUGEINT) + c) * (b + CAST(d AS HUGEINT))) AS BIGINT)
      |    >= 3841459 AS significant
      |FROM cells""".stripMargin

  // ---------------------------------------------------------------- q234
  /** DISCRETE SURVIVAL / HAZARD TABLE over return gaps — retention
    * modeling's life-table primitive: per user, gaps between
    * consecutive DISTINCT active days; for each lag t = 1..14 the
    * at-risk count (gaps ≥ t), event count (gaps = t), and the
    * discrete hazard rate in exact ppm. No cumulative float product
    * (the Kaplan–Meier Π term drifts cross-engine); the per-lag
    * hazard table IS the portable contract, and S(t) reconstructs
    * from it downstream in whatever precision the consumer wants.
    * One scan → per-user day-distinct → one lag window → a 14-row
    * range join on scalars.
    */
  def q234SurvivalHazard(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("day"))
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("prev", lag(col("day"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(datediff(col("day"), col("prev")).cast("long").as("gap"))
    val lags = s.range(1, 15).select(col("id").as("lag"))
    lags
      .join(gaps, col("gap") >= col("lag"), "left")
      .groupBy(col("lag"))
      .agg(
        count(col("gap")).as("at_risk"),
        sum(when(col("gap") === col("lag"), 1L).otherwise(0L)).as("events"))
      .withColumn(
        "hazard_ppm",
        expr("cast(case when at_risk = 0 then null else (events * 1000000) div at_risk end as bigint)"))
      .orderBy(col("lag"))
  }

  val q234Oracle: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |g AS (
      |  SELECT user_id, day,
      |         LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
      |  FROM d),
      |gaps AS (
      |  SELECT CAST(datediff('day', prev, day) AS BIGINT) AS gap
      |  FROM g WHERE prev IS NOT NULL),
      |lags AS (SELECT CAST(unnest(range(1, 15)) AS BIGINT) AS lag)
      |SELECT l.lag,
      |  CAST(COUNT(gaps.gap) AS BIGINT) AS at_risk,
      |  CAST(COALESCE(SUM(CASE WHEN gaps.gap = l.lag THEN 1 ELSE 0 END), 0) AS BIGINT) AS events,
      |  CAST(CASE WHEN COUNT(gaps.gap) = 0 THEN NULL
      |       ELSE (SUM(CASE WHEN gaps.gap = l.lag THEN 1 ELSE 0 END) * 1000000) // COUNT(gaps.gap)
      |       END AS BIGINT) AS hazard_ppm
      |FROM lags l LEFT JOIN gaps ON gaps.gap >= l.lag
      |GROUP BY l.lag
      |ORDER BY l.lag""".stripMargin


  // ---------------------------------------------------------------- q235
  /** SEEDED ECCENTRICITY SAMPLE ([[graft.ops.Bfs.layersBySeed]]) — the
    * per-seed BFS variant: for a deterministic seed sample (keys ≡ 3
    * mod 100) of the symmetrized block graph, each seed's hop
    * eccentricity (max shortest-path distance over its reachable set,
    * depth-capped at 6) and reachable-set size. Distances are PER
    * SEED — the merged-wave q225 form can't produce them — so the
    * visited state is (seed, node) pairs; the oracle unrolls six
    * seed-labeled frontier rounds (the q225 chain with a composite
    * key). Sampled seeds, not all nodes: all-pairs BFS state is
    * quadratic by definition, a sample is how diameter estimation is
    * done at scale.
    */
  def q235Eccentricity(s: SparkSession, dir: String): DataFrame = {
    val raw = blockGraph(s, dir)
    val sym = raw
      .select(col("u").as("src"), col("v").as("dst"))
      .unionByName(raw.select(col("v").as("src"), col("u").as("dst")))
      .distinct()
    val seeds = sym
      .select(col("src").as("seed"))
      .distinct()
      .filter(expr("seed % 100 = 3"))
    graft.ops.Bfs
      .layersBySeed(sym, seeds, maxDepth = 6)
      .groupBy(col("seed"))
      .agg(
        max(col("dist")).cast("int").as("ecc"),
        count(lit(1)).as("n_reached"))
      .orderBy(col("seed"))
  }

  val q235Oracle: String = {
    def round(r: Int): String =
      s"""f$r AS MATERIALIZED (
         |  SELECT DISTINCT f.seed, s.dst AS node
         |  FROM sym s JOIN f${r - 1} f ON f.node = s.src
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM v${r - 1} v WHERE v.seed = f.seed AND v.node = s.dst)),
         |v$r AS MATERIALIZED (
         |  SELECT seed, node, dist FROM v${r - 1}
         |  UNION ALL SELECT seed, node, $r AS dist FROM f$r),
         |""".stripMargin
    s"""WITH eset AS MATERIALIZED (
       |$BlockGraphSql
       |),
       |sym AS MATERIALIZED (
       |  SELECT u AS src, v AS dst FROM eset UNION SELECT v, u FROM eset),
       |seeds AS (
       |  SELECT DISTINCT src AS seed FROM sym WHERE src % 100 = 3),
       |v0 AS MATERIALIZED (
       |  SELECT seed, seed AS node, 0 AS dist FROM seeds),
       |f0 AS (SELECT seed, node FROM v0),
       |${round(1)}${round(2)}${round(3)}${round(4)}${round(5)}${round(6)}
       |dummy AS (SELECT 1)
       |SELECT seed, CAST(MAX(dist) AS INT) AS ecc,
       |       CAST(COUNT(*) AS BIGINT) AS n_reached
       |FROM v6
       |GROUP BY seed
       |ORDER BY seed""".stripMargin
  }


  // ---------------------------------------------------------------- q236
  /** WEIGHTED SINGLE-SOURCE SHORTEST PATHS by min-plus relaxation
    * (Bellman–Ford rounds — the SSSP-in-MapReduce classic): BFS counts
    * hops, this computes WEIGHTED distance, a different semiring (min,
    * +) whose relaxation can IMPROVE an already-reached node in a
    * later round — the part the q225/q235 first-reach discipline can't
    * express. Edge weights are deterministic integers
    * 1 + (u + v) mod 7 on the symmetrized block graph; seeds ≡ 3
    * (mod 100); 5 relaxation rounds (≥ block diameter, so fixpoint).
    * Per round: one frontier⋈edges join + one (seed,node) min — and a
    * node's best distance is the min over ALL rounds. The oracle
    * unrolls the same five min-plus rounds as MATERIALIZED CTEs.
    * Output: per-seed reachable count, weighted eccentricity, and
    * total weighted mass (Σ distances) — the closeness-centrality
    * numerator.
    */
  def q236Sssp(s: SparkSession, dir: String): DataFrame = {
    val raw = blockGraph(s, dir)
    val sym = raw
      .select(col("u").as("src"), col("v").as("dst"))
      .unionByName(raw.select(col("v").as("src"), col("u").as("dst")))
      .distinct()
      .withColumn("w", lit(1L) + (col("src") + col("dst")) % 7)
      .repartition(col("src"))
    import graft.ops.Checkpoints.CutOps
    val e = sym.cutLineage()
    val seeds = e.select(col("src").as("seed")).distinct().filter(expr("seed % 100 = 3"))
    var best = seeds
      .withColumn("node", col("seed"))
      .withColumn("dist", lit(0L))
      .cutLineage()
    for (_ <- 1 to 5) {
      val relaxed = e
        .join(best, e("src") === best("node"))
        .select(col("seed"), col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      best = best
        .unionByName(relaxed)
        .groupBy(col("seed"), col("node"))
        .agg(min(col("dist")).as("dist"))
        .cutLineage()
    }
    best
      .groupBy(col("seed"))
      .agg(
        count(lit(1)).as("n_reached"),
        max(col("dist")).as("w_ecc"),
        sum(col("dist")).as("w_mass"))
      .orderBy(col("seed"))
  }

  val q236Oracle: String = {
    def round(r: Int): String =
      s"""b$r AS MATERIALIZED (
         |  SELECT seed, node, MIN(dist) AS dist FROM (
         |    SELECT seed, node, dist FROM b${r - 1}
         |    UNION ALL
         |    SELECT p.seed, s.dst AS node, p.dist + s.w AS dist
         |    FROM b${r - 1} p JOIN sym s ON s.src = p.node)
         |  GROUP BY seed, node),
         |""".stripMargin
    s"""WITH eset AS MATERIALIZED (
       |$BlockGraphSql
       |),
       |sym AS MATERIALIZED (
       |  SELECT src, dst, 1 + (src + dst) % 7 AS w FROM (
       |    SELECT u AS src, v AS dst FROM eset UNION SELECT v, u FROM eset)),
       |b0 AS MATERIALIZED (
       |  SELECT src AS seed, src AS node, CAST(0 AS BIGINT) AS dist
       |  FROM (SELECT DISTINCT src FROM sym) WHERE src % 100 = 3),
       |${round(1)}${round(2)}${round(3)}${round(4)}${round(5)}
       |dummy AS (SELECT 1)
       |SELECT seed,
       |  CAST(COUNT(*) AS BIGINT) AS n_reached,
       |  CAST(MAX(dist) AS BIGINT) AS w_ecc,
       |  CAST(SUM(dist) AS BIGINT) AS w_mass
       |FROM b5
       |GROUP BY seed
       |ORDER BY seed""".stripMargin
  }

  // ---------------------------------------------------------------- q237
  /** K-ANONYMITY / L-DIVERSITY AUDIT — the privacy-risk census run
    * before releasing a dataset: group the customer table by its
    * quasi-identifier pair (nation, market segment), measure each
    * equivalence class's size (k) and its count of distinct sensitive
    * values (l — account-balance cents here), and report the
    * re-identification exposure per k-threshold: classes below k ∈
    * {2, 5, 10}, the rows they contain, the worst (min) l among them,
    * and the at-risk row fraction in ppm. Complements q226 (pattern
    * PII) with STRUCTURAL privacy risk; one aggregate over the
    * quasi-identifier space, then a 3-row threshold sweep over the
    * |classes|-sized frame — nothing scans the base table twice.
    */
  def q237KAnonymity(s: SparkSession, dir: String): DataFrame = {
    val classes = Tables.customer(s, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("k"),
        countDistinct(expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)")).as("l"))
      .persist()
    val total = classes.agg(sum(col("k")).as("n_rows"))
    val ks = s.range(0, 3).select(element_at(array(lit(2), lit(5), lit(10)), (col("id") + 1).cast("int")).as("k_min"))
    ks
      .join(classes, classes("k") < ks("k_min"), "left")
      .groupBy(col("k_min"))
      .agg(
        count(col("k")).as("n_risky_classes"),
        coalesce(sum(col("k")), lit(0L)).as("n_risky_rows"),
        min(col("l")).as("worst_l"))
      .crossJoin(broadcast(total))
      .select(
        col("k_min"),
        col("n_risky_classes"),
        col("n_risky_rows"),
        col("worst_l"),
        expr("cast((n_risky_rows * 1000000) div n_rows as bigint)").as("risk_ppm"))
      .orderBy(col("k_min"))
  }

  val q237Oracle: String =
    """WITH classes AS (
      |  SELECT c_nationkey, c_mktsegment,
      |         CAST(COUNT(*) AS BIGINT) AS k,
      |         CAST(COUNT(DISTINCT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS l
      |  FROM customer GROUP BY 1, 2),
      |total AS (SELECT CAST(SUM(k) AS BIGINT) AS n_rows FROM classes),
      |ks AS (SELECT CAST(unnest([2, 5, 10]) AS INT) AS k_min)
      |SELECT ks.k_min,
      |  CAST(COUNT(c.k) AS BIGINT) AS n_risky_classes,
      |  CAST(COALESCE(SUM(c.k), 0) AS BIGINT) AS n_risky_rows,
      |  MIN(c.l) AS worst_l,
      |  CAST((COALESCE(SUM(c.k), 0) * 1000000) // (SELECT n_rows FROM total) AS BIGINT) AS risk_ppm
      |FROM ks LEFT JOIN classes c ON c.k < ks.k_min
      |GROUP BY ks.k_min
      |ORDER BY ks.k_min""".stripMargin


  // ---------------------------------------------------------------- q238
  /** DAY-OF-WEEK SEASONALITY INDEX in exact rational ppm — the
    * seasonal-profile decomposition a capacity planner reads: for each
    * ISO weekday, the event volume's seasonal index
    * (dow_mean / overall_mean, scaled ×10⁶) computed as the pure
    * integer ratio (dow_total · n_days_total · 10⁶) div
    * (grand_total · n_days_dow) — per-day MEANS never materialize as
    * floats, so the index replays bit-exact (the q133 exact-rational
    * ranking discipline). Day counts come from the observed DISTINCT
    * days per weekday (no calendar assumption about the corpus span),
    * and the ISO weekday bridge is the q196 certified formula.
    */
  def q238Seasonality(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("isodow", expr("((dayofweek(day) + 5) % 7) + 1"))
    val byDow = daily
      .groupBy(col("isodow"))
      .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("dow_total"))
    val tot = byDow.agg(
      sum(col("n_days")).as("n_days_total"),
      sum(col("dow_total")).as("grand_total"))
    byDow
      .crossJoin(broadcast(tot))
      .select(
        col("isodow").cast("int").as("isodow"),
        col("n_days"),
        col("dow_total"),
        expr(
          "cast((cast(dow_total as decimal(38,0)) * n_days_total * 1000000) div (cast(grand_total as decimal(38,0)) * n_days) as bigint)"
        ).as("seasonal_index_ppm"))
      .orderBy(col("isodow"))
  }

  val q238Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1),
      |bydow AS (
      |  SELECT CAST(isodow(day) AS INT) AS isodow,
      |         CAST(COUNT(*) AS BIGINT) AS n_days,
      |         CAST(SUM(cnt) AS BIGINT) AS dow_total
      |  FROM daily GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(n_days) AS BIGINT) AS n_days_total,
      |         CAST(SUM(dow_total) AS BIGINT) AS grand_total
      |  FROM bydow)
      |SELECT b.isodow, b.n_days, b.dow_total,
      |  CAST((CAST(b.dow_total AS HUGEINT) * t.n_days_total * 1000000)
      |       // (CAST(t.grand_total AS HUGEINT) * b.n_days) AS BIGINT) AS seasonal_index_ppm
      |FROM bydow b, tot t
      |ORDER BY b.isodow""".stripMargin

  // ---------------------------------------------------------------- q239
  /** HIERARCHY SUBTREE ROLLUP via ALGEBRAIC ANCESTOR CLOSURE — the
    * category-tree / org-chart aggregation without ANY iteration or
    * recursion: impose the deterministic forest parent(k) = k div 4
    * over customer keys; every node's ancestor chain is then the
    * CLOSED FORM [k, k div 4, k div 4², …] — seven map-side divisions,
    * exploded to (ancestor, node) pairs, one hash aggregate, done.
    * Where a parent-pointer table would need O(depth) self-joins or a
    * recursive CTE, an arithmetic hierarchy ships its whole closure in
    * one scan — the trick behind prefix-coded taxonomies (IP ranges,
    * Dewey paths, H3 cells). Output: every node whose subtree holds ≥
    * 5 members, with exact subtree size, cents mass, and depth of the
    * deepest member below it.
    */
  def q239HierarchyRollup(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .select(
        col("c_custkey").as("k"),
        expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)").as("cents"))
    val withAnc = cust
      .withColumn(
        "anc",
        // no distinct needed: k div 4^i is STRICTLY decreasing while
        // >= 1, so the filtered chain can never repeat an ancestor
        explode(filter(
          array(
            struct(col("k").as("a"), lit(0).as("lvl")),
            struct(expr("k div 4").as("a"), lit(1).as("lvl")),
            struct(expr("k div 16").as("a"), lit(2).as("lvl")),
            struct(expr("k div 64").as("a"), lit(3).as("lvl")),
            struct(expr("k div 256").as("a"), lit(4).as("lvl")),
            struct(expr("k div 1024").as("a"), lit(5).as("lvl")),
            struct(expr("k div 4096").as("a"), lit(6).as("lvl"))),
          x => x.getField("a") >= 1)))
    withAnc
      .groupBy(col("anc.a").as("node"))
      .agg(
        count(lit(1)).as("subtree_size"),
        sum(col("cents")).as("subtree_cents"),
        max(col("anc.lvl")).cast("int").as("max_depth_below"))
      .filter(col("subtree_size") >= 5)
      .orderBy(col("node"))
  }

  val q239Oracle: String =
    """WITH cust AS (
      |  SELECT c_custkey AS k,
      |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      |  FROM customer),
      |anc AS (
      |  SELECT k, cents,
      |         unnest(list_filter(
      |           [struct_pack(a := k, lvl := 0),
      |            struct_pack(a := k // 4, lvl := 1),
      |            struct_pack(a := k // 16, lvl := 2),
      |            struct_pack(a := k // 64, lvl := 3),
      |            struct_pack(a := k // 256, lvl := 4),
      |            struct_pack(a := k // 1024, lvl := 5),
      |            struct_pack(a := k // 4096, lvl := 6)],
      |           x -> x.a >= 1), recursive := true)
      |  FROM cust)
      |SELECT a AS node,
      |       CAST(COUNT(*) AS BIGINT) AS subtree_size,
      |       CAST(SUM(cents) AS BIGINT) AS subtree_cents,
      |       CAST(MAX(lvl) AS INT) AS max_depth_below
      |FROM anc
      |GROUP BY a
      |HAVING COUNT(*) >= 5
      |ORDER BY node""".stripMargin


  // ---------------------------------------------------------------- q240
  /** MEASURED BLOOM FALSE-POSITIVE RATE — the sketch-law certificate
    * the q64 pipeline only implies: build a Bloom filter over the
    * benchmark shingle set (docs < 50, 5-gram shingles), probe it with
    * every TRUE NEGATIVE (corpus shingles provably not in the member
    * set), and report the exact false-positive count and rate. The
    * filter here is the RELATIONAL Bloom: k = 7 hash functions are
    * md5-hex slices mod 2¹⁴ (→ m = 2¹⁴ bits; the q131 CMS
    * discipline), the bit array is a distinct-bit TABLE, and
    * membership is "all 7 bit probes hit" — a semi-join formulation
    * both engines replay exactly, zero embedded literals. (The
    * production path — expr/BloomSketch's XXH64 bits — trades this
    * replayability for constant-size broadcast; same contract, q64.)
    * Non-vacuous by load factor: kn/m ≈ 1 at this member count ⇒ theory predicts ~5% FPR,
    * and the measured ppm lands near it on any corpus this size.
    */
  def q240BloomFpr(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val ngrams = TextDedup.shingles(col("text"), 5)
    val members = docs.filter(col("doc_id") < 50)
      .select(explode(ngrams).as("g")).distinct()
    val negatives = docs.filter(col("doc_id") >= 50)
      .select(explode(ngrams).as("g")).distinct()
      .join(members.withColumnRenamed("g", "mg"), col("g") === col("mg"), "left_anti")
      .persist()
    def bitsOf(t: DataFrame): DataFrame = t
      .withColumn("i", explode(sequence(lit(0), lit(6))))
      .select(col("g"), col("i"),
        (conv(substring(md5(col("g")), col("i") * 4 + 1, lit(4)), 16, 10).cast("long") % 16384).as("b"))
    val bitTable = bitsOf(members).select(col("b")).distinct()
    val probeHits = bitsOf(negatives)
      .join(bitTable, Seq("b"), "left_semi")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") === 7)
    negatives
      .agg(count(lit(1)).as("n_probes"))
      .crossJoin(members.agg(count(lit(1)).as("n_members")))
      .crossJoin(bitTable.agg(count(lit(1)).as("n_bits_set")))
      .crossJoin(probeHits.agg(count(lit(1)).as("n_false_pos")))
      .select(
        col("n_members"), col("n_bits_set"), col("n_probes"), col("n_false_pos"),
        expr("cast((n_false_pos * 1000000) div n_probes as bigint)").as("fpr_ppm"))
  }

  val q240Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(0, greatest(len(tk) - 4, 1)),
      |      i -> tk[i + 1] || ' ' || tk[i + 2] || ' ' || tk[i + 3] || ' ' || tk[i + 4] || ' ' || tk[i + 5])) AS g
      |  FROM toks),
      |members AS (SELECT DISTINCT g FROM grams WHERE doc_id < 50),
      |negs AS (
      |  SELECT DISTINCT g FROM grams WHERE doc_id >= 50
      |  AND NOT EXISTS (SELECT 1 FROM members m WHERE m.g = grams.g)),
      |mbits AS (
      |  SELECT DISTINCT CAST(('0x' || substr(md5(g), i * 4 + 1, 4)) AS BIGINT) % 16384 AS b
      |  FROM members, (SELECT unnest(range(0, 7)) AS i)),
      |phits AS (
      |  SELECT n.g FROM negs n, (SELECT unnest(range(0, 7)) AS i)
      |  WHERE EXISTS (SELECT 1 FROM mbits
      |                WHERE mbits.b = CAST(('0x' || substr(md5(n.g), i * 4 + 1, 4)) AS BIGINT) % 16384)
      |  GROUP BY n.g HAVING COUNT(*) = 7),
      |c AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM members) AS n_members,
      |         (SELECT CAST(COUNT(*) AS BIGINT) FROM mbits) AS n_bits_set,
      |         (SELECT CAST(COUNT(*) AS BIGINT) FROM negs) AS n_probes,
      |         (SELECT CAST(COUNT(*) AS BIGINT) FROM phits) AS n_false_pos)
      |SELECT n_members, n_bits_set, n_probes, n_false_pos,
      |       CAST((n_false_pos * 1000000) // n_probes AS BIGINT) AS fpr_ppm
      |FROM c""".stripMargin


  // ---------------------------------------------------------------- q241
  /** LONGEST-PREFIX-MATCH JOIN — the routing-table / CIDR-allowlist
    * lookup as a relational operator: synthetic 32-bit "flow" addresses
    * (md5-derived from user_id — deterministic, engine-portable) match
    * a derived route table holding /8, /16 and /24 prefixes
    * (deterministic subsets of the observed address space), and each
    * flow takes its LONGEST matching prefix. Shape: one equi-join per
    * prefix length on the algebraically-computed prefix (ip div 2⁸ᵏ —
    * the q239 arithmetic-hierarchy trick applied to tries), then a
    * per-flow max(struct(len, prefix)) argmax — never a theta join, so
    * the plan is |lengths| hash joins regardless of table size.
    * Output: per matched length (plus the no-match bucket), flow
    * count, distinct addresses, and a prefix checksum.
    */
  def q241LpmJoin(s: SparkSession, dir: String): DataFrame = {
    val flows = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"))
      .withColumn(
        "ip",
        conv(substring(md5(concat(lit("ip:"), col("user_id").cast("string"))), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("p8", expr("ip div 16777216"))
      .withColumn("p16", expr("ip div 65536"))
      .withColumn("p24", expr("ip div 256"))
    val ips = flows.select(col("ip")).distinct()
    def routes(shift: Long, mod: Int, len: Int) = ips
      .select((col("ip") / shift).cast("long").as("prefix"))
      .distinct()
      .filter(col("prefix") % mod === 0)
      .withColumn("len", lit(len))
    val r8 = routes(16777216L, 2, 8)
    val r16 = routes(65536L, 3, 16)
    val r24 = routes(256L, 5, 24)
    val m8 = flows.join(r8, col("p8") === r8("prefix")).select(col("event_id"), col("ip"), col("len"), col("prefix"))
    val m16 = flows.join(r16, col("p16") === r16("prefix")).select(col("event_id"), col("ip"), col("len"), col("prefix"))
    val m24 = flows.join(r24, col("p24") === r24("prefix")).select(col("event_id"), col("ip"), col("len"), col("prefix"))
    val best = m8.unionByName(m16).unionByName(m24)
      .groupBy(col("event_id"))
      .agg(max(struct(col("len"), col("prefix"))).as("m"), first(col("ip")).as("ip"))
      .select(col("event_id"), col("ip"), col("m.len").as("len"), col("m.prefix").as("prefix"))
    val matched = best
      .groupBy(col("len"))
      .agg(
        count(lit(1)).as("n_flows"),
        countDistinct(col("ip")).as("n_ips"),
        (sum(col("prefix")) % 1000003L).as("prefix_checksum"))
    val unmatched = flows
      .join(best.select(col("event_id")), Seq("event_id"), "left_anti")
      .agg(
        count(lit(1)).as("n_flows"),
        countDistinct(col("ip")).as("n_ips"))
      .select(lit(0).as("len"), col("n_flows"), col("n_ips"), lit(0L).as("prefix_checksum"))
    matched.unionByName(unmatched).orderBy(col("len"))
  }

  val q241Oracle: String =
    """WITH flows AS (
      |  SELECT event_id,
      |         CAST(('0x' || substr(md5('ip:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS ip
      |  FROM events),
      |ips AS (SELECT DISTINCT ip FROM flows),
      |r8 AS (SELECT DISTINCT ip // 16777216 AS prefix, 8 AS len FROM ips WHERE (ip // 16777216) % 2 = 0),
      |r16 AS (SELECT DISTINCT ip // 65536 AS prefix, 16 AS len FROM ips WHERE (ip // 65536) % 3 = 0),
      |r24 AS (SELECT DISTINCT ip // 256 AS prefix, 24 AS len FROM ips WHERE (ip // 256) % 5 = 0),
      |m AS (
      |  SELECT f.event_id, f.ip, r.len, r.prefix FROM flows f JOIN r8 r ON r.prefix = f.ip // 16777216
      |  UNION ALL
      |  SELECT f.event_id, f.ip, r.len, r.prefix FROM flows f JOIN r16 r ON r.prefix = f.ip // 65536
      |  UNION ALL
      |  SELECT f.event_id, f.ip, r.len, r.prefix FROM flows f JOIN r24 r ON r.prefix = f.ip // 256),
      |best AS (
      |  SELECT event_id, ip, len, prefix FROM (
      |    SELECT event_id, ip, len, prefix,
      |           ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY len DESC, prefix DESC) AS rn
      |    FROM m) WHERE rn = 1),
      |matched AS (
      |  SELECT CAST(len AS INT) AS len,
      |         CAST(COUNT(*) AS BIGINT) AS n_flows,
      |         CAST(COUNT(DISTINCT ip) AS BIGINT) AS n_ips,
      |         CAST(SUM(prefix) % 1000003 AS BIGINT) AS prefix_checksum
      |  FROM best GROUP BY len),
      |unmatched AS (
      |  SELECT CAST(0 AS INT) AS len,
      |         CAST(COUNT(*) AS BIGINT) AS n_flows,
      |         CAST(COUNT(DISTINCT ip) AS BIGINT) AS n_ips,
      |         CAST(0 AS BIGINT) AS prefix_checksum
      |  FROM flows WHERE NOT EXISTS (SELECT 1 FROM best b WHERE b.event_id = flows.event_id))
      |SELECT * FROM matched UNION ALL SELECT * FROM unmatched
      |ORDER BY len""".stripMargin

  // ---------------------------------------------------------------- q242
  /** TOKEN-BUCKET RATE-LIMITER REPLAY — the two-sided clamped
    * recurrence (refill to a CAP, spend if affordable, else reject)
    * that no window composition expresses: unlike the one-sided q191
    * clamp (floor-0 has the running-min closed form), a capacity
    * ceiling makes the state genuinely sequential. The engine replays
    * it as a PER-KEY ORDERED FOLD: collect each user's events sorted
    * by (ts_ns, event_id), fold struct state (tokens, accepted,
    * rejected) through Spark's `aggregate` HOF — per-key state only,
    * fold length bounded by per-user activity, codegen'd, no UDF.
    * DuckDB replays the identical fold as a per-user RECURSIVE CTE
    * stepping rn → rn+1 (branch-free arithmetic accept flag). NOT via
    * list_reduce: DuckDB 1.0.0's list_reduce with a STRUCT accumulator
    * mis-evaluates in grouped/vectorized contexts (measured: user 55's
    * 60-event fold returned accepted+rejected = 61 with a CASE lambda
    * and 43/17 with arithmetic, vs the 49/11 Python/Spark/filtered
    * ground truth — scalar-accumulator folds like q95's are fine).
    * Costs: purchase 4, click 2, view 1, else 0; cap 5, refill 1 per
    * event.
    */
  def q242TokenBucket(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn(
        "cost",
        when(col("event_type") === "purchase", 4L)
          .when(col("event_type") === "click", 2L)
          .when(col("event_type") === "view", 1L)
          .otherwise(0L))
    val folded = ev
      .groupBy(col("user_id"))
      .agg(
        array_sort(collect_list(struct(col("ts_ns"), col("event_id"), col("cost")))).as("evs"))
      .withColumn(
        "st",
        aggregate(
          col("evs"),
          struct(lit(5L).as("t"), lit(0L).as("a"), lit(0L).as("r")),
          (acc, x) => {
            val refilled = least(lit(5L), acc.getField("t") + 1L)
            val c = x.getField("cost")
            when(c <= refilled,
              struct((refilled - c).as("t"), (acc.getField("a") + 1L).as("a"), acc.getField("r").as("r")))
              .otherwise(
                struct(refilled.as("t"), acc.getField("a").as("a"), (acc.getField("r") + 1L).as("r")))
          }))
    folded.select(
      col("user_id"),
      col("st.t").as("final_tokens"),
      col("st.a").as("accepted"),
      col("st.r").as("rejected"))
      .orderBy(col("user_id"))
  }

  val q242Oracle: String =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id,
      |    CASE event_type WHEN 'purchase' THEN 4 WHEN 'click' THEN 2
      |         WHEN 'view' THEN 1 ELSE 0 END AS cost,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn
      |  FROM events),
      |n AS (SELECT user_id, MAX(rn) AS mx FROM ev GROUP BY user_id),
      |st(user_id, rn, t, a, r) AS (
      |  SELECT user_id, 0, CAST(5 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM n
      |  UNION ALL
      |  SELECT s.user_id, s.rn + 1,
      |    least(CAST(5 AS BIGINT), s.t + 1) - e.cost * CAST(e.cost <= least(CAST(5 AS BIGINT), s.t + 1) AS BIGINT),
      |    s.a + CAST(e.cost <= least(CAST(5 AS BIGINT), s.t + 1) AS BIGINT),
      |    s.r + 1 - CAST(e.cost <= least(CAST(5 AS BIGINT), s.t + 1) AS BIGINT)
      |  FROM st s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
      |SELECT s.user_id, s.t AS final_tokens, s.a AS accepted, s.r AS rejected
      |FROM st s JOIN n ON n.user_id = s.user_id AND s.rn = n.mx
      |ORDER BY s.user_id""".stripMargin


  // ---------------------------------------------------------------- q243
  /** MARKET-BASKET 2-ITEMSETS with EXACT-RATIONAL LIFT — the a-priori
    * co-occurrence census: parts co-purchased within an order, kept at
    * support ≥ 2, each pair scored by lift. The association strength
    * is the pure integer ratio lift = (support · n_orders) /
    * (orders_a · orders_b), emitted ×10⁶ via integer division — the
    * q133 exact-rational discipline, so the score (and any ordering
    * built on it) is engine-exact with no ln/float anywhere. Scale
    * shape: the pair generator is a per-order self-join — candidate
    * volume Σ lines(o)², bounded by the per-order line cap (7 in
    * TPC-H-shaped data), NEVER |parts|² — then one pair aggregate and
    * two broadcast joins against the |parts|-sized support table.
    */
  def q243MarketBasket(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val nOrders = li.select(col("o")).distinct().agg(count(lit(1)).as("n_orders"))
    val partCnt = li.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val pairs = li.as("a")
      .join(li.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
    pairs
      .join(partCnt.select(col("p").as("pa"), col("c").as("ca")), Seq("pa"))
      .join(partCnt.select(col("p").as("pb"), col("c").as("cb")), Seq("pb"))
      .crossJoin(broadcast(nOrders))
      .select(
        col("pa"), col("pb"), col("support"),
        col("ca").as("orders_a"),
        col("cb").as("orders_b"),
        expr("cast((cast(support as decimal(38,0)) * n_orders * 1000000) div (cast(ca as decimal(38,0)) * cb) as bigint)")
          .as("lift_ppm"))
      .orderBy(col("pa"), col("pb"))
  }

  val q243Oracle: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM li),
      |pc AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM li GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS support
      |  FROM li a JOIN li b ON b.o = a.o AND b.p > a.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT pr.pa, pr.pb, pr.support,
      |       ca.c AS orders_a, cb.c AS orders_b,
      |       CAST((CAST(pr.support AS HUGEINT) * n.n_orders * 1000000)
      |            // (CAST(ca.c AS HUGEINT) * cb.c) AS BIGINT) AS lift_ppm
      |FROM pairs pr
      |JOIN pc ca ON ca.p = pr.pa
      |JOIN pc cb ON cb.p = pr.pb
      |CROSS JOIN n
      |ORDER BY pr.pa, pr.pb""".stripMargin


  // ---------------------------------------------------------------- q244
  /** EXACT SLIDING-WINDOW DISTINCT — 7-day rolling unique users per
    * day, the engagement metric that is NOT sum-decomposable (distinct
    * doesn't add across days, so no window frame over daily partials
    * can produce it). The engine's shape: reduce to the (day, user)
    * presence grid first (one distinct — the only full-data shuffle),
    * then a bounded 7-way range join of days × presence rows and a
    * per-day count-distinct. Work is 7·|presence|, never 7·|events|,
    * and the window width is a constant multiplier, not a shuffle
    * count. Also emits the day's own distinct and the rolling/day
    * ratio in exact ppm.
    */
  def q244SlidingDistinct(s: SparkSession, dir: String): DataFrame = {
    val pres = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .persist()
    val days = pres.select(col("day").as("d")).distinct()
    val rolling = days
      .join(pres, col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("rolling_7d_users"))
    val daily = pres
      .groupBy(col("day").as("d"))
      .agg(countDistinct(col("user_id")).as("day_users"))
    rolling
      .join(daily, Seq("d"))
      .select(
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("day_users"),
        col("rolling_7d_users"),
        expr("cast((day_users * 1000000) div rolling_7d_users as bigint)").as("concentration_ppm"))
      .orderBy(col("day"))
  }

  val q244Oracle: String =
    """WITH pres AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day AS d FROM pres),
      |rolling AS (
      |  SELECT dd.d, CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS rolling_7d_users
      |  FROM days dd JOIN pres p ON p.day BETWEEN dd.d - 6 AND dd.d
      |  GROUP BY dd.d),
      |daily AS (
      |  SELECT day AS d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS day_users
      |  FROM pres GROUP BY day)
      |SELECT strftime(r.d, '%Y-%m-%d') AS day,
      |       dl.day_users, r.rolling_7d_users,
      |       CAST((dl.day_users * 1000000) // r.rolling_7d_users AS BIGINT) AS concentration_ppm
      |FROM rolling r JOIN daily dl ON dl.d = r.d
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q245
  /** DISTRIBUTED GRAM MATRIX (Xᵀ X) over the embedding corpus — the
    * linear-algebra primitive under PCA, linear probes, ridge
    * regression and whitening, computed as pure aggregation: each
    * vector contributes its outer-product entries (i ≤ j upper
    * triangle), one hash aggregate sums them — fully map-side
    * combinable, no driver linear algebra, no collect. Entries are
    * EXACT: coordinates quantize to the 10³ integer grid first (the
    * q128 discipline — float dot-product sums are partition-order
    * dependent, integer sums are associative), so every cell replays
    * bit-for-bit in DuckDB. Output: the 64·65/2 upper-triangle cells
    * with exact integer sums, plus each cell's ppm-scaled cosine of
    * the two coordinate columns — column-similarity structure read
    * straight off the Gram matrix.
    */
  def q245GramMatrix(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(expr("transform(embedding, x -> cast(floor(x * 1000 + 0.5) as long))").as("qv"))
      .select(explode(expr(
        """flatten(transform(qv, (x, i) ->
          |  transform(slice(qv, i + 1, size(qv) - i), (y, k) ->
          |    named_struct('i', i, 'j', i + k, 'p', cast(x as decimal(38,0)) * y))))""".stripMargin
          .replaceAll("\n", " "))).as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.p")).cast("long").as("g"))
      .orderBy(col("i"), col("j"))

  val q245Oracle: String =
    """WITH e AS (
      |  SELECT list_transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cells AS (
      |  SELECT unnest(flatten(list_transform(range(0, 64), i ->
      |    list_transform(range(i, 64), j ->
      |      struct_pack(i := i, j := j, p := CAST(qv[i + 1] AS HUGEINT) * qv[j + 1])))),
      |    recursive := true)
      |  FROM e)
      |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
      |       CAST(SUM(p) AS BIGINT) AS g
      |FROM cells
      |GROUP BY 1, 2
      |ORDER BY i, j""".stripMargin


  // ---------------------------------------------------------------- q246
  /** CALENDAR-SPINE GAP FILL + INTEGER INTERPOLATION — time-series
    * regularization: the 'purchase' daily cents series is sparsified
    * deterministically (days ≡ {0,1} mod 5 removed — so single- AND
    * double-day gaps exist by construction), re-gridded onto the full
    * day spine (sequence() between observed min/max), and each hole
    * is filled three ways: carry-forward (last_value IGNORE NULLS),
    * carry-backward, and LINEAR interpolation computed in exact
    * integer arithmetic — lerp_cents = prev + (next − prev) · dist
    * div gap_len — so the fill replays bit-for-bit (no float lerp).
    * The is_observed flag keeps filled rows auditable. Spine
    * generation, dual-direction window fill, and integer lerp are
    * each things a naive resampler gets subtly wrong (end gaps,
    * division rounding, null frames).
    */
  def q246GapFill(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(expr("cast(floor(value * 100 + 0.5) as long)")).as("cents"))
      .filter(expr("day(day) % 5 >= 2")) // deterministic holes incl. runs of 2
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = bounds
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val wAll = W.orderBy(col("day"))
    val grid = spine
      .join(daily, Seq("day"), "left")
      .withColumn("is_observed", col("cents").isNotNull)
      .withColumn("prev_v", last(col("cents"), ignoreNulls = true)
        .over(wAll.rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("next_v", first(col("cents"), ignoreNulls = true)
        .over(wAll.rowsBetween(0, W.unboundedFollowing)))
      .withColumn("prev_day", last(when(col("is_observed"), col("day")), ignoreNulls = true)
        .over(wAll.rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("next_day", first(when(col("is_observed"), col("day")), ignoreNulls = true)
        .over(wAll.rowsBetween(0, W.unboundedFollowing)))
    grid.select(
      date_format(col("day"), "yyyy-MM-dd").as("day"),
      col("is_observed"),
      col("prev_v").as("ffill_cents"),
      col("next_v").as("bfill_cents"),
      expr(
        """cast(case
          |  when is_observed then cents
          |  when prev_v is null then next_v
          |  when next_v is null then prev_v
          |  else prev_v + ((next_v - prev_v) * datediff(day, prev_day)) div datediff(next_day, prev_day)
          |end as bigint)""".stripMargin.replaceAll("\n", " ")).as("lerp_cents"))
      .orderBy(col("day"))
  }

  val q246Oracle: String =
    """WITH daily AS (
      |  SELECT day, cents FROM (
      |    SELECT CAST(ts AS DATE) AS day,
      |           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |    FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |  WHERE day(day) % 5 >= 2),
      |bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
      |spine AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds),
      |grid AS (
      |  SELECT s.day, d.cents, d.cents IS NOT NULL AS is_observed
      |  FROM spine s LEFT JOIN daily d ON d.day = s.day),
      |filled AS (
      |  SELECT day, cents, is_observed,
      |    last_value(cents IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
      |    first_value(cents IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
      |    last_value(CASE WHEN is_observed THEN day END IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
      |    first_value(CASE WHEN is_observed THEN day END IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
      |  FROM grid)
      |SELECT strftime(day, '%Y-%m-%d') AS day, is_observed,
      |  prev_v AS ffill_cents, next_v AS bfill_cents,
      |  CAST(CASE
      |    WHEN is_observed THEN cents
      |    WHEN prev_v IS NULL THEN next_v
      |    WHEN next_v IS NULL THEN prev_v
      |    ELSE prev_v + ((next_v - prev_v) * datediff('day', prev_day, day))
      |         // datediff('day', prev_day, next_day)
      |  END AS BIGINT) AS lerp_cents
      |FROM filled
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q247
  /** MIX-SHIFT DECOMPOSITION (Oaxaca-lite) — why did total purchase
    * value move between the observation period's first and second
    * half? Split per event_type into a MIX term (volume change at old
    * rates) and a RATE term (per-event value change at new volumes),
    * all in truncating integer cents so both engines agree bit-exact,
    * with an explicit RESIDUAL column making the identity
    * Δ = mix + rate + residual hold EXACTLY (the truncation loss is
    * surfaced, not hidden — the q198 signed-division discipline).
    */
  def q247MixShift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "click", "view", "signup", "error"))
      .withColumn("cents", expr("cast(floor(value * 100 + 0.5) as long)"))
    val mid = ev.agg(expr("min(ts_ns) + (max(ts_ns) - min(ts_ns)) div 2").as("mid"))
    val halves = ev
      .crossJoin(broadcast(mid))
      .withColumn("h", when(col("ts_ns") < col("mid"), 1).otherwise(2))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("h") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("h") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("h") === 1, col("cents")).otherwise(0L)).as("v1"),
        sum(when(col("h") === 2, col("cents")).otherwise(0L)).as("v2"))
    halves.select(
      col("event_type"),
      col("n1"), col("n2"), col("v1"), col("v2"),
      expr("cast(((n2 - n1) * v1) div n1 as bigint)").as("mix_cents"),
      expr("cast((n2 * v2) div n2 - (n2 * v1) div n1 as bigint)").as("rate_cents"),
      expr("cast((v2 - v1) - (((n2 - n1) * v1) div n1) - ((n2 * v2) div n2 - (n2 * v1) div n1) as bigint)")
        .as("residual_cents"))
      .orderBy(col("event_type"))
  }

  val q247Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_ns(ts) AS ts_ns,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view', 'signup', 'error')),
      |mid AS (SELECT MIN(ts_ns) + (MAX(ts_ns) - MIN(ts_ns)) // 2 AS mid FROM ev),
      |halves AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN ts_ns < mid THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN ts_ns >= mid THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN ts_ns < mid THEN cents ELSE 0 END) AS BIGINT) AS v1,
      |    CAST(SUM(CASE WHEN ts_ns >= mid THEN cents ELSE 0 END) AS BIGINT) AS v2
      |  FROM ev, mid GROUP BY event_type)
      |SELECT event_type, n1, n2, v1, v2,
      |  CAST(((n2 - n1) * v1) // n1 AS BIGINT) AS mix_cents,
      |  CAST((n2 * v2) // n2 - (n2 * v1) // n1 AS BIGINT) AS rate_cents,
      |  CAST((v2 - v1) - (((n2 - n1) * v1) // n1)
      |       - ((n2 * v2) // n2 - (n2 * v1) // n1) AS BIGINT) AS residual_cents
      |FROM halves
      |ORDER BY event_type""".stripMargin


  // ---------------------------------------------------------------- q248
  /** GREEDY MAXIMAL MATCHING ([[graft.ops.Matching]]) — 4 deterministic
    * locally-minimal-edge rounds over the weighted block graph
    * (w = 1 + (u+v) mod 7, ties broken by the (w,u,v) total order).
    * Matching joins the engine's graph battery with the one classic
    * primitive it lacked (CC = connectivity, LPA = communities,
    * PageRank = centrality, BFS/SSSP = distance, k-core = density —
    * matching = PAIRING). Contract is "4 rounds of the rule"; the
    * MEASURED maximality certificate is the returned remainder's edge
    * count (0 ⇔ no two unmatched endpoints stay adjacent), and the
    * oracle replays all four rounds as chained MATERIALIZED CTEs.
    * Output: per 500-key bucket, matched-pair count and pair
    * checksum, plus the global remainder count on every row.
    */
  def q248MaximalMatching(s: SparkSession, dir: String): DataFrame = {
    val edges = blockGraph(s, dir)
      .select(col("u"), col("v"))
      .withColumn("w", lit(1L) + (col("u") + col("v")) % 7)
    val (matched, remaining) = graft.ops.Matching.greedyRounds(edges, rounds = 4)
    val rem = remaining.agg(count(lit(1)).as("n_remaining"))
    matched
      .groupBy(expr("u div 500").as("bucket"))
      .agg(
        count(lit(1)).as("n_matched"),
        (sum(col("u") * 31 + col("v")) % 1000003L).as("pair_checksum"))
      .crossJoin(broadcast(rem))
      .select(col("bucket"), col("n_matched"), col("pair_checksum"), col("n_remaining"))
      .orderBy(col("bucket"))
  }

  val q248Oracle: String = {
    def round(r: Int): String =
      s"""inc$r AS (
         |  SELECT u AS n, w, u, v FROM e${r - 1}
         |  UNION ALL SELECT v, w, u, v FROM e${r - 1}),
         |min$r AS (
         |  SELECT n, u, v FROM (
         |    SELECT n, u, v, ROW_NUMBER() OVER (PARTITION BY n ORDER BY w, u, v) AS rn
         |    FROM inc$r) WHERE rn = 1),
         |pick$r AS (
         |  SELECT u, v FROM min$r GROUP BY u, v HAVING COUNT(*) = 2),
         |m$r AS MATERIALIZED (
         |  SELECT u, v FROM m${r - 1} UNION ALL SELECT u, v FROM pick$r),
         |t$r AS (SELECT u AS n FROM m$r UNION SELECT v FROM m$r),
         |e$r AS MATERIALIZED (
         |  SELECT e.u, e.v, e.w FROM e${r - 1} e
         |  WHERE NOT EXISTS (SELECT 1 FROM t$r WHERE t$r.n = e.u)
         |    AND NOT EXISTS (SELECT 1 FROM t$r WHERE t$r.n = e.v)),
         |""".stripMargin
    s"""WITH eset AS MATERIALIZED (
       |$BlockGraphSql
       |),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT u, v, 1 + (u + v) % 7 AS w FROM eset),
       |m0 AS (SELECT u, v FROM e0 WHERE 1 = 0),
       |${round(1)}${round(2)}${round(3)}${round(4)}
       |rem AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_remaining FROM e4)
       |SELECT u // 500 AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_matched,
       |  CAST(SUM(u * 31 + v) % 1000003 AS BIGINT) AS pair_checksum,
       |  rem.n_remaining
       |FROM m4, rem
       |GROUP BY 1, rem.n_remaining
       |ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------- q249
  /** DETERMINISTIC TOKENIZATION with REFERENTIAL-INTEGRITY
    * certificate — the privacy-engineering counterpart to q226/q237:
    * replace user ids with md5-prefix pseudonym tokens INDEPENDENTLY
    * in two tables (events, and the synthetic user dimension derived
    * from distinct event users), then certify that the tokenized
    * world still joins: per-token event counts equal per-id counts
    * (join cardinality preserved), token collisions are ZERO
    * (distinct ids ↔ distinct tokens — the property format-preserving
    * tokenization must prove, not assume), and the mapping is
    * deterministic (re-derivation matches). Output: one row of
    * certificate counters, all engine-exact.
    */
  def q249Tokenization(s: SparkSession, dir: String): DataFrame = {
    def tok(c: Column): Column =
      conv(substring(md5(concat(lit("tok:"), c.cast("string"))), 1, 15), 16, 10).cast("long")
    val ev = Tables.events(s, dir).select(col("user_id"))
    val dim = ev.distinct()
    val evTok = ev.select(tok(col("user_id")).as("t"))
    val dimTok = dim.select(col("user_id"), tok(col("user_id")).as("t"))
    val joined = evTok
      .groupBy(col("t")).agg(count(lit(1)).as("n_ev"))
      .join(dimTok, Seq("t"))
    val idCounts = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_ev_id"))
    val parity = joined
      .join(idCounts, Seq("user_id"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("n_ev") === col("n_ev_id"), 1L).otherwise(0L)).as("n_count_match"))
    val collisions = dimTok
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .agg(sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_collisions"))
    parity
      .crossJoin(broadcast(collisions))
      .select(
        col("n_users"),
        col("n_count_match"),
        (col("n_users") === col("n_count_match")).as("cardinality_ok"),
        col("n_collisions"),
        (col("n_collisions") === 0).as("collision_free"))
  }

  val q249Oracle: String =
    """WITH ev AS (SELECT user_id FROM events),
      |dim AS (SELECT DISTINCT user_id FROM ev),
      |dimtok AS (
      |  SELECT user_id,
      |         CAST(('0x' || substr(md5('tok:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS t
      |  FROM dim),
      |evtok AS (
      |  SELECT CAST(('0x' || substr(md5('tok:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS t
      |  FROM ev),
      |jc AS (
      |  SELECT d.user_id, e.n_ev FROM (
      |    SELECT t, CAST(COUNT(*) AS BIGINT) AS n_ev FROM evtok GROUP BY t) e
      |  JOIN dimtok d ON d.t = e.t),
      |idc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev_id FROM ev GROUP BY user_id),
      |par AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |         CAST(SUM(CASE WHEN jc.n_ev = idc.n_ev_id THEN 1 ELSE 0 END) AS BIGINT) AS n_count_match
      |  FROM jc JOIN idc ON idc.user_id = jc.user_id),
      |coll AS (
      |  SELECT CAST(COALESCE(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_collisions
      |  FROM (SELECT t, COUNT(*) AS c FROM dimtok GROUP BY t))
      |SELECT par.n_users, par.n_count_match,
      |       par.n_users = par.n_count_match AS cardinality_ok,
      |       coll.n_collisions,
      |       coll.n_collisions = 0 AS collision_free
      |FROM par, coll""".stripMargin


  // ---------------------------------------------------------------- q250
  /** ABANDONMENT DETECTION — the NEGATIVE temporal pattern ("a view
    * NOT followed by a purchase within 1 hour by the same user") that
    * funnel counting (q93) inverts: completions are joins,
    * non-completions are the absence of one, and the scalable form is
    * a per-user forward-looking window, not an anti range join. Each
    * view's next-purchase timestamp is the running min of purchase
    * times over the FOLLOWING frame (one user-partitioned window over
    * the merged event sequence — no events×events join at all); the
    * 1-hour deadline check is integer ns arithmetic. Daily rollup
    * with an exact-ppm abandonment rate.
    */
  def q250Abandonment(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(1, W.unboundedFollowing)
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"), col("ts"))
      .withColumn(
        "next_purchase_ns",
        min(when(col("event_type") === "purchase", col("ts_ns"))).over(w))
    ev.filter(col("event_type") === "view")
      .withColumn(
        "converted",
        col("next_purchase_ns").isNotNull &&
          col("next_purchase_ns") - col("ts_ns") <= 3600L * 1000000000L)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(
        count(lit(1)).as("n_views"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"),
        sum(when(!col("converted"), 1L).otherwise(0L)).as("n_abandoned"))
      .withColumn(
        "abandon_ppm",
        expr("cast((n_abandoned * 1000000) div n_views as bigint)"))
      .orderBy(col("day"))
  }

  val q250Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_ns(ts) AS ts_ns, event_id, CAST(ts AS DATE) AS day
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |nx AS (
      |  SELECT user_id, event_type, ts_ns, day,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts_ns END)
      |      OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
      |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase_ns
      |  FROM ev),
      |v AS (
      |  SELECT day,
      |    (next_purchase_ns IS NOT NULL AND next_purchase_ns - ts_ns <= 3600000000000) AS converted
      |  FROM nx WHERE event_type = 'view')
      |SELECT strftime(day, '%Y-%m-%d') AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_views,
      |  CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
      |  CAST(SUM(CASE WHEN converted THEN 0 ELSE 1 END) AS BIGINT) AS n_abandoned,
      |  CAST((SUM(CASE WHEN converted THEN 0 ELSE 1 END) * 1000000) // COUNT(*) AS BIGINT) AS abandon_ppm
      |FROM v
      |GROUP BY day
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q251
  /** QUANTILE NORMALIZATION across sources — the ML-preprocessing step
    * that forces every source's feature distribution onto the pooled
    * one: rank each document's n_chars WITHIN its source, map that
    * rank to the pooled rank grid with the integer midpoint formula
    * idx = ((2r − 1)·N + n_s) div (2·n_s), and read the normalized
    * value off the pooled order statistics — entirely rank-selected
    * (the q92/q97 discrete recipe: no interpolation, no floats).
    * Both rankings run through [[graft.ops.Rank.rankWithin]] (the
    * two-pass range-binned rank — no single-task windows); the oracle
    * replays plain windows. Certificate per source: count, sum and
    * extremes of the normalized values — equal-sized sources must
    * land on near-identical sums, which is the point of the
    * transform.
    */
  def q251QuantileNorm(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
    val bySource = graft.ops.Rank
      .rankWithin(docs, Seq("source"), col("n_chars"), col("doc_id"), "r")
    val pooled = graft.ops.Rank
      .rankWithin(docs.withColumn("g", lit(1)), Seq("g"), col("n_chars"), col("doc_id"), "gr")
      .select(col("gr"), col("n_chars").as("pooled_value"))
    val sizes = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    bySource
      .join(sizes, Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn("idx", expr("((2 * r - 1) * n_total + n_s) div (2 * n_s)"))
      .join(pooled, col("idx") === col("gr"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("pooled_value")).as("norm_sum"),
        min(col("pooled_value")).as("norm_min"),
        max(col("pooled_value")).as("norm_max"))
      .orderBy(col("source"))
  }

  val q251Oracle: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |bys AS (
      |  SELECT source, n_chars,
      |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r
      |  FROM d),
      |pooled AS (
      |  SELECT n_chars AS pooled_value,
      |         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS gr
      |  FROM d),
      |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM d GROUP BY source),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d),
      |m AS (
      |  SELECT b.source, p.pooled_value
      |  FROM bys b
      |  JOIN sz ON sz.source = b.source
      |  CROSS JOIN tot
      |  JOIN pooled p ON p.gr = ((2 * b.r - 1) * tot.n_total + sz.n_s) // (2 * sz.n_s))
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(pooled_value) AS BIGINT) AS norm_sum,
      |  CAST(MIN(pooled_value) AS BIGINT) AS norm_min,
      |  CAST(MAX(pooled_value) AS BIGINT) AS norm_max
      |FROM m
      |GROUP BY source
      |ORDER BY source""".stripMargin


  // ---------------------------------------------------------------- q252
  /** SEASONALLY-ADJUSTED ANOMALY DAYS — q238's seasonal profile put to
    * work: a day is anomalous iff its event count breaks ±5% of ITS
    * WEEKDAY's expected level (dow_total/n_days for that isodow), so a
    * quiet Sunday is judged against Sundays, not the weekly mean that
    * plain z-scoring (q97) uses. The comparison is exact-rational by
    * cross-multiplication — 20·cnt·n_days vs 21·dow_total — so the
    * verdict replays bit-identically (no expected-value float ever
    * exists). Output: every flagged day with its weekday, count,
    * the cross-multiplied sides, and the direction.
    */
  def q252SeasonalAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("isodow", expr("((dayofweek(day) + 5) % 7) + 1"))
    val byDow = daily
      .groupBy(col("isodow"))
      .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("dow_total"))
    daily
      .join(byDow, Seq("isodow"))
      .withColumn("hi", col("cnt") * col("n_days") * 20 > col("dow_total") * 21)
      .withColumn("lo", col("cnt") * col("n_days") * 21 < col("dow_total") * 20)
      .filter(col("hi") || col("lo"))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("isodow").cast("int").as("isodow"),
        col("cnt"),
        col("n_days"),
        col("dow_total"),
        when(col("hi"), "high").otherwise("low").as("direction"))
      .orderBy(col("day"))
  }

  val q252Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1),
      |d2 AS (SELECT day, cnt, CAST(isodow(day) AS INT) AS isodow FROM daily),
      |bydow AS (
      |  SELECT isodow, CAST(COUNT(*) AS BIGINT) AS n_days,
      |         CAST(SUM(cnt) AS BIGINT) AS dow_total
      |  FROM d2 GROUP BY isodow)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.isodow, d.cnt,
      |       b.n_days, b.dow_total,
      |       CASE WHEN d.cnt * b.n_days * 20 > b.dow_total * 21 THEN 'high' ELSE 'low' END AS direction
      |FROM d2 d JOIN bydow b ON b.isodow = d.isodow
      |WHERE d.cnt * b.n_days * 20 > b.dow_total * 21
      |   OR d.cnt * b.n_days * 21 < b.dow_total * 20
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q253
  /** HITS HUB/AUTHORITY (Kleinberg JACM'99) over the customer→supplier
    * purchase graph — the link-analysis complement of PageRank (q96):
    * authority flows INTO suppliers from the hubs that buy from them,
    * hub quality flows back from the authorities they reach. Two full
    * mutual-reinforcement rounds, UNNORMALIZED so every score is an
    * exact BIGINT (the usual per-round L2 normalization only rescales —
    * rank order is identical — and skipping it removes every float from
    * the query): a1 = in-degree (all hubs start at 1), h1 = Σ a1 over
    * each customer's suppliers, a2 = Σ h1 over each supplier's
    * customers. The edge set (587k distinct pairs at sf0.1) is derived
    * once and persisted; each half-round is one equi join + one hash
    * aggregate — the PageRank shuffle discipline with alternating keys.
    * Top-20 authorities ride TakeOrderedAndProject, ranked on the
    * bounded result only.
    */
  def q253Hits(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables
      .orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey").as("c"))
      .join(
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey").as("p")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("c"), col("p"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a1 = edges.groupBy(col("p")).agg(count(lit(1)).as("a1"))
    val h1 = edges
      .join(a1, Seq("p"))
      .groupBy(col("c"))
      .agg(sum(col("a1")).as("h1"))
    val a2 = edges
      .join(h1, Seq("c"))
      .groupBy(col("p"))
      .agg(sum(col("h1")).as("a2"))
    val top = a2
      .join(a1, Seq("p"))
      .orderBy(col("a2").desc, col("p"))
      .limit(20)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("a2").desc, col("p")) // bounded: 20 rows post-limit
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("p").as("s_suppkey"), col("a1").as("auth_r1"), col("a2").as("auth_r2"))
      .orderBy(col("rank"))
  }

  val q253Oracle: String =
    """WITH e AS (
      |  SELECT DISTINCT o_custkey AS c, l_suppkey AS p
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |a1 AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS a1 FROM e GROUP BY p),
      |h1 AS (SELECT c, CAST(SUM(a1) AS BIGINT) AS h1
      |       FROM e JOIN a1 USING (p) GROUP BY c),
      |a2 AS (SELECT p, CAST(SUM(h1) AS BIGINT) AS a2
      |       FROM e JOIN h1 USING (c) GROUP BY p),
      |top AS (
      |  SELECT a2.p, a1.a1, a2.a2
      |  FROM a2 JOIN a1 USING (p)
      |  ORDER BY a2.a2 DESC, a2.p LIMIT 20)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY a2 DESC, p) AS BIGINT) AS rank,
      |       p AS s_suppkey, a1 AS auth_r1, a2 AS auth_r2
      |FROM top
      |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- q254
  /** 2-HOP GRAPH FEATURE AGGREGATION — the GraphSAGE-style message-
    * passing pass a feature pipeline runs to build neighborhood
    * features for training (one layer: aggregate neighbor features;
    * two layers: aggregate the aggregates). Node feature = order count
    * (exact BIGINT); hop 1 lands per-supplier (Σ feat + neighbor
    * count), hop 2 lands back per-customer. Same persisted distinct
    * edge set as q253; each hop is one equi join + one hash aggregate,
    * which is exactly the cluster plan (edges co-partitioned per hop
    * key, features shipped as 16 B rows, never the wide node payload).
    * Top-50 by the layer-2 sum via TakeOrderedAndProject.
    */
  def q254GraphFeatures(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables
      .orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey").as("c"))
      .join(
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey").as("p")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("c"), col("p"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val feat = Tables
      .orders(s, dir)
      .groupBy(col("o_custkey").as("c"))
      .agg(count(lit(1)).as("n_orders"))
    val l1 = edges
      .join(feat, Seq("c"))
      .groupBy(col("p"))
      .agg(sum(col("n_orders")).as("l1_sum"), count(lit(1)).as("l1_deg"))
    val l2 = edges
      .join(l1, Seq("p"))
      .groupBy(col("c"))
      .agg(sum(col("l1_sum")).as("l2_sum"), count(lit(1)).as("n_suppliers"))
    l2.join(feat, Seq("c"))
      .select(
        col("c").as("c_custkey"), col("n_orders"), col("n_suppliers"), col("l2_sum"))
      .orderBy(col("l2_sum").desc, col("c_custkey"))
      .limit(50)
  }

  val q254Oracle: String =
    """WITH e AS (
      |  SELECT DISTINCT o_custkey AS c, l_suppkey AS p
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |feat AS (SELECT o_custkey AS c, CAST(COUNT(*) AS BIGINT) AS n_orders
      |         FROM orders GROUP BY 1),
      |l1 AS (SELECT p, CAST(SUM(n_orders) AS BIGINT) AS l1_sum
      |       FROM e JOIN feat USING (c) GROUP BY p),
      |l2 AS (SELECT c, CAST(SUM(l1_sum) AS BIGINT) AS l2_sum,
      |              CAST(COUNT(*) AS BIGINT) AS n_suppliers
      |       FROM e JOIN l1 USING (p) GROUP BY c)
      |SELECT l2.c AS c_custkey, feat.n_orders, l2.n_suppliers, l2.l2_sum
      |FROM l2 JOIN feat USING (c)
      |ORDER BY l2_sum DESC, c_custkey
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q255
  /** RECIPROCAL-RANK-FUSION HYBRID RETRIEVAL (Cormack SIGIR'09) — the
    * lexical+semantic merge every modern retrieval stack runs: BM25
    * top-50 (q122 infra: broadcast-pruned postings, distributed rank)
    * fused with embedding-cosine top-50 (q25 infra: broadcast brute
    * top-k, the exact baseline) per query, score = Σ 1/(60+rank) over
    * the lists that contain the doc. Each query carries both a term
    * set and an embedding (vec_id = qid). The fusion itself is a tiny
    * per-qid full-outer merge of two ≤50-row lists — all heavy lifting
    * stays in the two retrieval primitives, which is the plan you want
    * at corpus scale. RRF is two fixed-order reciprocal adds on
    * IEEE754 doubles — bit-identical in the DuckDB replay (dynamic
    * oracle embeds idf/avgdl literals, the q122 discipline).
    */
  val q255K = 50
  def q255Rrf(s: SparkSession, dir: String): DataFrame = {
    val lex = Bm25
      .search(s, Tables.documents(s, dir), "doc_id", "text", q122Queries, k = q255K)
      .select(col("qid"), col("doc_id").as("id"), col("rank").cast("long").as("lex_rank"))
    val emb = Tables.embeddings(s, dir)
    val sem = Similarity
      .bruteTopK(emb, emb.filter(col("vec_id").isin(q122Queries.map(_._1.toLong): _*)), k = q255K)
      .select(
        col("query_id").cast("int").as("qid"),
        col("neighbor_id").as("id"),
        col("rank").cast("long").as("sem_rank"))
    val fused = lex
      .join(sem, Seq("qid", "id"), "full_outer")
      .withColumn(
        "rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("sem_rank")), lit(0.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")) // ≤100 fused rows per qid — bounded frame
      .orderBy(col("rrf").desc, col("id"))
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank"), col("id"), col("lex_rank"), col("sem_rank"), col("rrf"))
      .orderBy(col("qid"), col("rank"))
  }

  def q255OracleFor(s: SparkSession, dir: String): String = {
    val docs = Tables.documents(s, dir)
    val terms = q122Queries.flatMap(_._2).distinct
    val st = Bm25.fitStats(docs, "doc_id", "text", terms,
      Bm25.postings(docs, "doc_id", "text", terms))
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val qvals = q122Queries
      .flatMap { case (qid, ts) =>
        ts.distinct.map(t => s"($qid, '$t', CAST('${st.idf(t)}' AS DOUBLE))")
      }
      .mkString(", ")
    val qids = q122Queries.map(_._1).mkString(", ")
    val k1p1 = s"CAST('${Bm25.K1 + 1.0}' AS DOUBLE)"
    val k1 = s"CAST('${Bm25.K1}' AS DOUBLE)"
    val oneMinusB = s"CAST('${1.0 - Bm25.B}' AS DOUBLE)"
    val b = s"CAST('${Bm25.B}' AS DOUBLE)"
    val avgdl = s"CAST('${st.avgdl}' AS DOUBLE)"
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    len(string_split_regex(lower(trim(text)), '\\s+')) AS dl,
       |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, any_value(dl) AS dl
       |  FROM toks WHERE term IN ($termList)
       |  GROUP BY doc_id, term
       |), q(qid, term, idf) AS (VALUES $qvals),
       |comp AS (
       |  SELECT q.qid, tf.doc_id, q.term,
       |    q.idf * (tf * $k1p1) /
       |      (tf + $k1 * ($oneMinusB + $b * dl / $avgdl)) AS c
       |  FROM tf JOIN q USING (term)
       |), lexscored AS (
       |  SELECT qid, doc_id,
       |    list_reduce(
       |      list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY term)),
       |      (x, y) -> x + y) AS score
       |  FROM comp GROUP BY qid, doc_id
       |), lex AS (
       |  SELECT qid, doc_id AS id, CAST(rnk AS BIGINT) AS lex_rank FROM (
       |    SELECT qid, doc_id, score,
       |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
       |    FROM lexscored)
       |  WHERE rnk <= ${q255K}
       |), sem AS (
       |  SELECT qid, id, CAST(rnk AS BIGINT) AS sem_rank FROM (
       |    SELECT CAST(qv.vec_id AS INT) AS qid, c.vec_id AS id,
       |      row_number() OVER (
       |        PARTITION BY qv.vec_id
       |        ORDER BY round(list_cosine_similarity(c.embedding::DOUBLE[], qv.embedding::DOUBLE[]), 4) DESC,
       |                 c.vec_id) AS rnk
       |    FROM embeddings c, embeddings qv
       |    WHERE qv.vec_id IN ($qids) AND c.vec_id <> qv.vec_id)
       |  WHERE rnk <= ${q255K}
       |), fused AS (
       |  SELECT COALESCE(lex.qid, sem.qid) AS qid, COALESCE(lex.id, sem.id) AS id,
       |    lex_rank, sem_rank,
       |    COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + lex_rank), CAST(0.0 AS DOUBLE)) +
       |    COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + sem_rank), CAST(0.0 AS DOUBLE)) AS rrf
       |  FROM lex FULL OUTER JOIN sem ON lex.qid = sem.qid AND lex.id = sem.id)
       |SELECT qid, CAST(rnk AS BIGINT) AS rank, id, lex_rank, sem_rank, rrf FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id) AS rnk
       |  FROM fused)
       |WHERE rnk <= 10
       |ORDER BY qid, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q256
  /** CUSUM CHANGE-POINT DETECTION (Page 1954) over per-type daily
    * volumes — the drift monitor a pipeline runs on its own ingest
    * rates. The textbook recursion C_t = max(0, C_{t-1} + x_t − k) is
    * NOT a window aggregate, but it has the exact scan-free form
    *   C_t = S_t − min_{i≤t} S_i,  S_t = Σ_{i≤t} (x_i − k)
    * (the q191 clamped-scan identity) — one cumulative sum + one
    * running min per key, both plain windows over the DAILY rollup
    * (the only big shuffle is that first groupBy; windows run on
    * |types|·|days| rows). Drift target k = the type's mean daily
    * count (total div n_days — exact integer), alarm at C_t > 2k.
    * Everything BIGINT: replays bit-identically.
    */
  def q256Cusum(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val daily = Tables
      .events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val byType = W.partitionBy(col("event_type"))
    val withK = daily
      .withColumn("type_total", sum(col("cnt")).over(byType))
      .withColumn("n_days", count(lit(1)).over(byType))
      .withColumn("k", expr("type_total div n_days"))
    val ordered = W.partitionBy(col("event_type")).orderBy(col("day"))
    withK
      .withColumn("s_cum", sum(col("cnt") - col("k")).over(
        ordered.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("s_min", min(col("s_cum")).over(
        ordered.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("cusum", col("s_cum") - col("s_min"))
      .withColumn("alarm", col("cusum") > lit(2) * col("k"))
      .select(
        col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cnt"), col("k"), col("cusum"), col("alarm"))
      .orderBy(col("event_type"), col("day"))
  }

  val q256Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |wk AS (
      |  SELECT *,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type) //
      |         COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS k
      |  FROM daily),
      |sc AS (
      |  SELECT *,
      |    CAST(SUM(cnt - k) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s_cum
      |  FROM wk),
      |sm AS (
      |  SELECT *,
      |    CAST(MIN(s_cum) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s_min
      |  FROM sc)
      |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt, k,
      |  s_cum - s_min AS cusum,
      |  (s_cum - s_min) > 2 * k AS alarm
      |FROM sm
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- q257
  /** EXACT DYADIC EWMA — exponential smoothing with α = 1/2 truncated
    * at 20 taps, so the IIR recursion becomes a FIR filter with exact
    * power-of-two integer weights: num_t = Σ_{j=0..19} x_{t−j}·2^(19−j),
    * ewma_t = num_t / 2^20 (the dropped tail is < 2^-20 of the head —
    * the standard fixed-point smoothing a rate monitor runs). All 20
    * lags share ONE window spec (a single WindowExec over the daily
    * rollup; the only corpus-sized shuffle is the rollup itself), the
    * numerator stays far inside BIGINT (x·2^20·20 ≈ 4e11 at sf0.1),
    * and the replay is bit-identical — no float ever exists. Warm-up
    * rows (fewer than 20 predecessors) treat missing lags as 0,
    * stated in the `n_taps` column.
    */
  def q257Ewma(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val daily = Tables
      .events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = W.partitionBy(col("event_type")).orderBy(col("day"))
    val num = (0 until 20)
      .map(j => coalesce(lag(col("cnt"), j).over(w), lit(0L)) * lit(1L << (19 - j)))
      .reduce(_ + _)
    daily
      .withColumn("ewma_num", num)
      .withColumn("n_taps", least(row_number().over(w).cast("long"), lit(20L)))
      .select(
        col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cnt"), col("ewma_num"), col("n_taps"))
      .orderBy(col("event_type"), col("day"))
  }

  val q257Oracle: String = {
    val taps = (0 until 20)
      .map(j => s"COALESCE(LAG(cnt, $j) OVER w, 0) * ${1L << (19 - j)}")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2)
       |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
       |  CAST($taps AS BIGINT) AS ewma_num,
       |  CAST(LEAST(ROW_NUMBER() OVER w, 20) AS BIGINT) AS n_taps
       |FROM daily
       |WINDOW w AS (PARTITION BY event_type ORDER BY day)
       |ORDER BY event_type, day""".stripMargin
  }

  // ---------------------------------------------------------------- q258
  /** RECURSIVE CTE HIERARCHY CERTIFICATE — Spark 4's WITH RECURSIVE
    * (UnionLoop execution: per-round frontier expansion, exactly the
    * iterative-operator shape ops/Components runs by hand) walked
    * against DuckDB's on the implicit binary hierarchy parent(n) =
    * n div 2 over REAL customer keys. The recursion computes each
    * node's depth by walking to the root; the certificate pins it to
    * the closed form bit_length(n) − 1 (the q199 engine-portable
    * floor-log2; never log2() itself, whose log-division is a ulp off
    * on exact powers of two) — recursion and arithmetic must
    * agree row-for-row, aggregated per depth with membership id-sums
    * so a single wrong walk cannot cancel. Walk length is log2(max
    * key) ≈ 15 rounds at sf0.1; the frontier HALVES each round (ids
    * below 2^d exit), the shape AQE-friendly recursion wants.
    */
  def q258RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("q258_customer")
    s.sql(
      """WITH RECURSIVE walk(node, cur, steps) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM q258_customer
        |  UNION ALL
        |  SELECT node, cur DIV 2, steps + 1 FROM walk WHERE cur > 1
        |),
        |depths AS (
        |  SELECT node, max(steps) AS depth,
        |         cast(length(bin(node)) - 1 AS INT) AS depth_closed
        |  FROM walk GROUP BY node
        |)
        |SELECT depth,
        |  count(*) AS n_nodes,
        |  sum(node) AS id_sum,
        |  min(node) AS min_id,
        |  max(node) AS max_id,
        |  sum(CASE WHEN depth = depth_closed THEN 1 ELSE 0 END) = count(*) AS closed_form_ok
        |FROM depths
        |GROUP BY depth
        |ORDER BY depth""".stripMargin)
  }

  val q258Oracle: String =
    """WITH RECURSIVE walk(node, cur, steps) AS (
      |  SELECT c_custkey, c_custkey, 0 FROM customer
      |  UNION ALL
      |  SELECT node, cur // 2, steps + 1 FROM walk WHERE cur > 1
      |),
      |depths AS (
      |  SELECT node, CAST(MAX(steps) AS INT) AS depth,
      |         CAST(LENGTH(BIN(node)) - 1 AS INT) AS depth_closed
      |  FROM walk GROUP BY node
      |)
      |SELECT depth,
      |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  CAST(SUM(node) AS BIGINT) AS id_sum,
      |  CAST(MIN(node) AS BIGINT) AS min_id,
      |  CAST(MAX(node) AS BIGINT) AS max_id,
      |  SUM(CASE WHEN depth = depth_closed THEN 1 ELSE 0 END) = COUNT(*) AS closed_form_ok
      |FROM depths
      |GROUP BY depth
      |ORDER BY depth""".stripMargin

  // ---------------------------------------------------------------- q259
  /** VARIANT INGESTION CERTIFICATE — Spark 4's VARIANT type
    * (parse_json → variant_get) run over synthesized semi-structured
    * payloads with a malformed-row channel, the shape every JSON
    * event feed has. Every 10th payload is broken JSON:
    * try_parse_json must null it (the P3 null-on-error discipline
    * applied to the new type), and the typed extractions
    * (string / bigint / 0-based array index) must match a plain
    * json-path reading. All map-side until the |types|-row rollup;
    * the JSON text is synthesized from integer columns only (a double
    * formatted into JSON would re-open the cross-engine repr trap).
    * Oracle replays the synthesis and branches the corrupt channel on
    * its known rule (the q121 payload-decode pattern).
    */
  def q259Variant(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("event_type"), col("user_id"))
    ev.withColumn(
        "payload",
        when(col("event_id") % 10 === 0, lit("{broken"))
          .otherwise(concat(
            lit("{\"id\": "), col("event_id"),
            lit(", \"meta\": {\"type\": \""), col("event_type"),
            lit("\", \"prio\": "), col("event_id") % 3,
            lit("}, \"vals\": ["), col("user_id") % 100,
            lit(", "), col("user_id") % 7, lit("]}"))))
      .withColumn("v", expr("try_parse_json(payload)"))
      .withColumn("vtype", expr("variant_get(v, '$.meta.type', 'string')"))
      .withColumn("prio", expr("variant_get(v, '$.meta.prio', 'bigint')"))
      .withColumn("val1", expr("variant_get(v, '$.vals[1]', 'bigint')"))
      .groupBy(coalesce(col("vtype"), lit("CORRUPT")).as("vtype"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum(col("prio")).as("prio_sum"),
        sum(col("val1")).as("val1_sum"))
      .orderBy(col("vtype"))
  }

  val q259Oracle: String =
    """WITH ev AS (
      |  SELECT event_id, event_type, user_id,
      |    (event_id % 10 = 0) AS corrupt
      |  FROM events),
      |x AS (
      |  SELECT
      |    CASE WHEN corrupt THEN NULL ELSE event_type END AS vtype,
      |    CASE WHEN corrupt THEN NULL ELSE event_id % 3 END AS prio,
      |    CASE WHEN corrupt THEN NULL ELSE user_id % 7 END AS val1,
      |    corrupt,
      |    CASE WHEN corrupt THEN NULL ELSE
      |      json_extract_string(
      |        '{"id": ' || event_id || ', "meta": {"type": "' || event_type ||
      |        '", "prio": ' || (event_id % 3) || '}, "vals": [' ||
      |        (user_id % 100) || ', ' || (user_id % 7) || ']}',
      |        '$.meta.type') END AS vtype_json
      |  FROM ev)
      |SELECT COALESCE(vtype_json, 'CORRUPT') AS vtype,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
      |  CAST(SUM(prio) AS BIGINT) AS prio_sum,
      |  CAST(SUM(val1) AS BIGINT) AS val1_sum
      |FROM x
      |GROUP BY 1
      |ORDER BY vtype""".stripMargin

  // ---------------------------------------------------------------- q260
  /** COLLATION CERTIFICATE — Spark 4 string collations: grouping under
    * UTF8_LCASE must agree with grouping under lower() (the identity
    * case-insensitive analytics relies on when it swaps explicit
    * lower() wrapping for a collated column type). Case noise is
    * synthesized deterministically over the customer segment (the
    * q121 pattern: key-derived upper/lower/title variants), then both
    * groupings run and the certificate joins them: identical group
    * populations, identical distinct-count. The oracle replays the
    * lower() side — the collated side is the Spark-surface under
    * test, pinned equal.
    */
  def q260Collation(s: SparkSession, dir: String): DataFrame = {
    val noisy = Tables
      .customer(s, dir)
      .select(
        col("c_custkey"),
        when(col("c_custkey") % 3 === 0, lower(col("c_mktsegment")))
          .when(col("c_custkey") % 3 === 1, col("c_mktsegment"))
          .otherwise(initcap(lower(col("c_mktsegment")))).as("seg_noisy"))
    val viaCollation = noisy
      .groupBy(expr("collate(seg_noisy, 'UTF8_LCASE')").as("seg_c"))
      .agg(count(lit(1)).as("n_collated"))
      // collation PROPAGATES through lower(): the join key must come
      // back to UTF8_BINARY or the seg = seg equality is indeterminate
      .select(expr("collate(lower(seg_c), 'UTF8_BINARY')").as("seg"), col("n_collated"))
    val viaLower = noisy
      .groupBy(lower(col("seg_noisy")).as("seg"))
      .agg(count(lit(1)).as("n_lower"), countDistinct(col("seg_noisy")).as("n_case_variants"))
    viaLower
      .join(viaCollation, Seq("seg"), "full_outer")
      .select(
        col("seg"),
        col("n_lower").as("n_rows"),
        col("n_case_variants"),
        (col("n_lower") === col("n_collated")).as("collation_agrees"))
      .orderBy(col("seg"))
  }

  val q260Oracle: String =
    """WITH noisy AS (
      |  SELECT c_custkey,
      |    CASE
      |      WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
      |      WHEN c_custkey % 3 = 1 THEN c_mktsegment
      |      ELSE upper(c_mktsegment[1]) || lower(c_mktsegment[2:])
      |    END AS seg_noisy
      |  FROM customer)
      |SELECT lower(seg_noisy) AS seg,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT seg_noisy) AS BIGINT) AS n_case_variants,
      |  TRUE AS collation_agrees
      |FROM noisy
      |GROUP BY 1
      |ORDER BY seg""".stripMargin

  // ---------------------------------------------------------------- q261
  /** NATIVE JARO-WINKLER SCORING (expr/JaroWinkler: codegen'd Catalyst
    * expression, registered as SQL `jaro_winkler`) — the
    * entity-resolution name-similarity primitive, certified against
    * DuckDB's jaro_winkler_similarity over every pair of the distinct
    * part-name catalog. The pair frame is |catalog|², not |part|² —
    * the q160 dedupe-first discipline (62 distinct names at sf0.01) —
    * so the cross join is a bounded model-state product, with the
    * catalog distinct being the only corpus-sized pass. Scores ride
    * at round-6 (the q25 float-output discipline); the match variant
    * (boost threshold 0.7, prefix cap 4, both-empty → 0) is pinned by
    * JaroWinklerSpec.
    */
  def q261JaroWinkler(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(s, dir).select(col("p_name")).distinct()
    val a = names.select(col("p_name").as("name_a"))
    val b = names.select(col("p_name").as("name_b"))
    a.crossJoin(b)
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw", round(expr("jaro_winkler(name_a, name_b)"), 6))
      .filter(col("jw") >= 0.5)
      .select(col("name_a"), col("name_b"), col("jw"))
      .orderBy(col("jw").desc, col("name_a"), col("name_b"))
  }

  val q261Oracle: String =
    """WITH names AS (SELECT DISTINCT p_name FROM part)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
      |FROM names a, names b
      |WHERE a.p_name < b.p_name
      |  AND round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.5
      |ORDER BY jw DESC, name_a, name_b""".stripMargin

  // ---------------------------------------------------------------- q262
  /** INVERTED-INDEX CONSTRUCTION with delta-encoded postings — the
    * index-build pass behind q122's BM25 and every phrase/decontam
    * lookup, certified structurally: postings are collected per
    * (term, BLOCK) — block = doc_id div 1024, so no list ever exceeds
    * the block width regardless of corpus size (the unbounded
    * per-term collect is exactly what dies at 100 TB) — delta-encoded
    * (first id raw, then strictly-positive gaps), and rolled up per
    * term: df, block count, id range, strict-sortedness verdict, the
    * telescoping-sum integrity law (Σ gaps = last − first per block),
    * and the varint cost proxy Σ bit_length(delta) — the actual
    * compressed-index size driver, engine-portable via length(bin(x)).
    * Oracle rebuilds the same postings with lag windows.
    */
  def q262InvertedIndex(s: SparkSession, dir: String): DataFrame = {
    val termDocs = Tables
      .documents(s, dir)
      .select(explode(TextStats.tokens(lower(col("text")))).as("term"), col("doc_id"))
      .distinct()
      .withColumn("block", expr("doc_id div 1024"))
    val blockPostings = termDocs
      .groupBy(col("term"), col("block"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .withColumn(
        "deltas",
        expr("transform(ids, (x, i) -> CASE WHEN i = 0 THEN x ELSE x - ids[i - 1] END)"))
      .withColumn(
        "sorted_ok",
        expr("forall(slice(deltas, 2, size(deltas) - 1), d -> d > 0)") ||
          size(col("deltas")) === 1)
      .withColumn(
        "telescope_ok",
        expr("aggregate(slice(deltas, 2, size(deltas) - 1), 0L, (a, x) -> a + x)") ===
          expr("element_at(ids, -1) - ids[0]"))
      .withColumn(
        "encoded_bits",
        expr("aggregate(transform(deltas, d -> length(bin(d))), 0L, (a, x) -> a + x)"))
    blockPostings
      .groupBy(col("term"))
      .agg(
        sum(size(col("ids")).cast("long")).as("df"),
        count(lit(1)).as("n_blocks"),
        min(col("ids")(0)).as("min_id"),
        max(expr("element_at(ids, -1)")).as("max_id"),
        sum(col("encoded_bits")).as("encoded_bits"),
        (sum(when(col("sorted_ok"), 1L).otherwise(0L)) === count(lit(1))).as("sorted_ok"),
        (sum(when(col("telescope_ok"), 1L).otherwise(0L)) === count(lit(1))).as("telescope_ok"))
      .orderBy(col("term"))
  }

  val q262Oracle: String =
    """WITH td AS (
      |  SELECT DISTINCT term, doc_id
      |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term, doc_id
      |        FROM documents)),
      |g AS (
      |  SELECT term, doc_id // 1024 AS block, doc_id,
      |    LAG(doc_id) OVER (PARTITION BY term, doc_id // 1024 ORDER BY doc_id) AS prev
      |  FROM td),
      |d AS (
      |  SELECT term, block, doc_id, prev,
      |    CASE WHEN prev IS NULL THEN doc_id ELSE doc_id - prev END AS delta
      |  FROM g)
      |SELECT term,
      |  CAST(COUNT(*) AS BIGINT) AS df,
      |  CAST(COUNT(DISTINCT block) AS BIGINT) AS n_blocks,
      |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
      |  CAST(MAX(doc_id) AS BIGINT) AS max_id,
      |  CAST(SUM(LENGTH(BIN(delta))) AS BIGINT) AS encoded_bits,
      |  BOOL_AND(delta > 0 OR prev IS NULL) AS sorted_ok,
      |  TRUE AS telescope_ok
      |FROM d
      |GROUP BY term
      |ORDER BY term""".stripMargin

  // ---------------------------------------------------------------- q263
  /** HLL SET ALGEBRA — the MERGEABILITY certificate that makes sketches
    * a 100 TB primitive: for every event-type pair, registers(A ∪ B)
    * must equal the element-wise max of registers(A) and registers(B)
    * (expr/HllRegisters lifts the aggregate's own partition-merge to a
    * relational law), the merged union estimate must land within 5% of
    * the exact distinct-user union, and the inclusion-exclusion
    * intersection estimate est(A)+est(B)−est(A∪B) within 25% of the
    * exact intersection. Per-type sketches are one pass; the union
    * pass fans each event row out only to the pairs containing its
    * type (≤4×). Exact counts ride |A∩B| = |A|+|B|−|A∪B| — no third
    * distinct pass. The oracle replays the exacts and pins the three
    * sketch laws.
    */
  def q263HllAlgebra(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir).select(col("event_type"), col("user_id"))
    val perType = base
      .groupBy(col("event_type"))
      .agg(
        expr("hll_registers(user_id)").as("regs"),
        expr("hll_distinct(user_id)").as("est"),
        countDistinct(col("user_id")).as("exact"))
    val types = perType.select(col("event_type")).collect().map(_.getString(0)).sorted
    val pairRows = for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield (types(i), types(j))
    val pairs = s.createDataFrame(pairRows).toDF("type_a", "type_b")
    val unionAgg = base
      .join(
        broadcast(pairs),
        col("event_type") === col("type_a") || col("event_type") === col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        expr("hll_registers(user_id)").as("regs_u"),
        expr("hll_distinct(user_id)").as("est_u"),
        countDistinct(col("user_id")).as("exact_union"))
    val a = perType.select(
      col("event_type").as("type_a"), col("regs").as("regs_a"),
      col("est").as("est_a"), col("exact").as("exact_a"))
    val b = perType.select(
      col("event_type").as("type_b"), col("regs").as("regs_b"),
      col("est").as("est_b"), col("exact").as("exact_b"))
    unionAgg
      .join(broadcast(a), Seq("type_a"))
      .join(broadcast(b), Seq("type_b"))
      .withColumn("exact_intersect", col("exact_a") + col("exact_b") - col("exact_union"))
      .withColumn(
        "merge_law_ok",
        expr("zip_with(regs_a, regs_b, (x, y) -> greatest(x, y))") === col("regs_u"))
      .withColumn(
        "union_est_ok",
        abs(col("est_u") - col("exact_union")) * lit(20) <= col("exact_union"))
      .withColumn(
        "ie_est_ok",
        abs(col("est_a") + col("est_b") - col("est_u") - col("exact_intersect")) * lit(4)
          <= col("exact_intersect"))
      .select(
        col("type_a"), col("type_b"),
        col("exact_a"), col("exact_b"), col("exact_union"), col("exact_intersect"),
        col("merge_law_ok"), col("union_est_ok"), col("ie_est_ok"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val q263Oracle: String =
    """WITH t AS (SELECT DISTINCT event_type FROM events),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b
      |  FROM t a, t b WHERE a.event_type < b.event_type),
      |ex AS (
      |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact
      |  FROM events GROUP BY 1),
      |exu AS (
      |  SELECT p.type_a, p.type_b,
      |    CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_union
      |  FROM pairs p JOIN events e
      |    ON e.event_type = p.type_a OR e.event_type = p.type_b
      |  GROUP BY 1, 2)
      |SELECT p.type_a, p.type_b,
      |  ea.exact AS exact_a, eb.exact AS exact_b,
      |  exu.exact_union,
      |  ea.exact + eb.exact - exu.exact_union AS exact_intersect,
      |  TRUE AS merge_law_ok, TRUE AS union_est_ok, TRUE AS ie_est_ok
      |FROM pairs p
      |JOIN exu ON exu.type_a = p.type_a AND exu.type_b = p.type_b
      |JOIN ex ea ON ea.event_type = p.type_a
      |JOIN ex eb ON eb.event_type = p.type_b
      |ORDER BY p.type_a, p.type_b""".stripMargin

  // ---------------------------------------------------------------- q264
  /** AMS "TUG-OF-WAR" SECOND-MOMENT SKETCH (Alon-Matias-Szegedy
    * STOC'96): F2 = Σ_v count(v)² of the user-activity distribution —
    * the self-join size / skew statistic — estimated by 16 independent
    * ±1-sign projections, every one FULLY replayed in the oracle: the
    * sign of (estimator r, user u) is an md5 bit (the q116
    * engine-portable hash bit), sketch_r = Σ count(u)·s(r, u), and
    * est_r = sketch_r². No verdict pinning anywhere — both engines
    * re-derive every sketch from scratch, plus the exact F2 and each
    * estimator's exact-ppm ratio to it. The 16× fan-out multiplies
    * the BOUNDED per-user count frame, never raw events.
    */
  def q264AmsF2(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables
      .events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
    val reps = s.range(0, 16).select(col("id").cast("int").as("r"))
    val signed = counts
      .crossJoin(broadcast(reps))
      .withColumn(
        "sgn",
        lit(1L) - lit(2L) *
          (conv(substring(md5(concat(col("r"), lit(":"), col("user_id"))), 1, 1), 16, 10)
            .cast("long") % 2))
    val perR = signed
      .groupBy(col("r"))
      .agg(sum(col("c") * col("sgn")).as("sketch"))
      .withColumn("est", col("sketch") * col("sketch"))
    val f2 = counts.agg(sum(col("c") * col("c")).as("f2_exact"))
    perR
      .crossJoin(broadcast(f2))
      .withColumn("ratio_ppm", expr("(est * 1000000) div f2_exact"))
      .select(col("r"), col("sketch"), col("est"), col("f2_exact"), col("ratio_ppm"))
      .orderBy(col("r"))
  }

  val q264Oracle: String =
    """WITH counts AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
      |reps AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS r),
      |signed AS (
      |  SELECT r, c,
      |    1 - 2 * (CAST(('0x' || substr(md5(r || ':' || user_id), 1, 1)) AS BIGINT) % 2) AS sgn
      |  FROM counts, reps),
      |perr AS (
      |  SELECT r, CAST(SUM(c * sgn) AS BIGINT) AS sketch
      |  FROM signed GROUP BY r),
      |f2 AS (SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact FROM counts)
      |SELECT r, sketch, sketch * sketch AS est, f2.f2_exact,
      |  (sketch * sketch * 1000000) // f2.f2_exact AS ratio_ppm
      |FROM perr, f2
      |ORDER BY r""".stripMargin

  // ---------------------------------------------------------------- q265
  /** LOCAL CLUSTERING COEFFICIENT — the per-node closure of q174's
    * global triangle count: cc(n) = 2·t(n) / (deg(n)·(deg(n)−1)),
    * where t(n) is the number of triangles through n (each q174
    * degree-ordered triangle row exploded to its three corners — no
    * second triangle pass) and deg(n) the simple undirected degree.
    * Integer-exact in ppm (2·10⁶·t div deg·(deg−1)); degree-1 nodes
    * carry NULL. Rolled up per 100-node bucket: node count, closed
    * wedges (Σ2t), open+closed wedges (Σ deg·(deg−1)), exact-rational
    * bucket coefficient, and min/max per-node ppm — the skew profile a
    * curriculum-sampling pass reads. Oracle replays the textbook
    * canonical x<y<z triple join + corner unnest.
    */
  def q265ClusteringCoeff(s: SparkSession, dir: String): DataFrame = {
    val edges = blockGraph(s, dir)
    val canon = edges
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .where(col("a") < col("b"))
      .distinct()
    val deg = canon
      .select(col("a").as("node"))
      .unionByName(canon.select(col("b").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("deg"))
    val tri = graft.ops.Triangles
      .triangles(edges, "u", "v")
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("tri"))
    val perNode = deg
      .join(tri, Seq("node"), "left")
      .na.fill(0L, Seq("tri"))
      .withColumn("wedges", col("deg") * (col("deg") - 1))
      .withColumn(
        "cc_ppm",
        when(col("deg") >= 2, expr("(2000000 * tri) div wedges")))
    perNode
      .groupBy(expr("node div 100").as("bucket"))
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(lit(2) * col("tri")).as("closed_wedges"),
        sum(col("wedges")).as("all_wedges"),
        expr("CASE WHEN sum(wedges) > 0 THEN (2000000 * sum(tri)) div sum(wedges) END")
          .as("bucket_cc_ppm"),
        min(col("cc_ppm")).as("min_cc_ppm"),
        max(col("cc_ppm")).as("max_cc_ppm"))
      .orderBy(col("bucket"))
  }

  val q265Oracle: String =
    s"""WITH e AS (
      |$BlockGraphSql
      |), canon AS (
      |  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM e WHERE u <> v
      |), deg AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
      |  FROM (SELECT a AS node FROM canon UNION ALL SELECT b FROM canon)
      |  GROUP BY node
      |), t AS (
      |  SELECT x.a AS n1, x.b AS n2, y.b AS n3
      |  FROM canon x
      |  JOIN canon y ON y.a = x.a AND y.b > x.b
      |  JOIN canon z ON z.a = x.b AND z.b = y.b
      |), tri AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS tri
      |  FROM (SELECT unnest([n1, n2, n3]) AS node FROM t)
      |  GROUP BY node
      |), pn AS (
      |  SELECT deg.node, deg.deg, COALESCE(tri.tri, 0) AS tri,
      |    deg.deg * (deg.deg - 1) AS wedges,
      |    CASE WHEN deg.deg >= 2
      |         THEN (2000000 * COALESCE(tri.tri, 0)) // (deg.deg * (deg.deg - 1))
      |    END AS cc_ppm
      |  FROM deg LEFT JOIN tri ON tri.node = deg.node
      |)
      |SELECT node // 100 AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  CAST(SUM(2 * tri) AS BIGINT) AS closed_wedges,
      |  CAST(SUM(wedges) AS BIGINT) AS all_wedges,
      |  CAST(CASE WHEN SUM(wedges) > 0
      |            THEN (2000000 * SUM(tri)) // SUM(wedges) END AS BIGINT)
      |    AS bucket_cc_ppm,
      |  CAST(MIN(cc_ppm) AS BIGINT) AS min_cc_ppm,
      |  CAST(MAX(cc_ppm) AS BIGINT) AS max_cc_ppm
      |FROM pn
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q266
  /** EXACT AUTOCORRELATION FUNCTION (ACF, lags 0–7) of the zero-filled
    * daily event-count series — the seasonality detector behind
    * q238/q252, certified sample-exact: with n days, S = Σx, the
    * integer deviation dev_t = n·x_t − S makes the standard estimator
    * r_k = Σ dev_t·dev_{t−k} / Σ dev_t² a pure integer ratio (ppm via
    * truncating div; both engines truncate toward zero, negative lags
    * included). Products are widened to decimal(38,0)/HUGEINT BEFORE
    * the sum (the q170 first-factor rule: 366 days · (n·x−S)² ≈ 10²⁰
    * blows int64). The per-lag pairing is an equi join of the BOUNDED
    * daily frame against itself on day−k — no windows, no sequential
    * scan; everything before it is one groupBy over events. Oracle
    * replays the grid, deviations and all eight ratios from scratch.
    */
  def q266Acf(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .events(s, dir)
      .select(to_date(col("ts")).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("x"))
    val grid = daily
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val series = grid.join(daily, Seq("day"), "left").na.fill(0L, Seq("x"))
    val m = series.agg(count(lit(1)).as("n"), sum(col("x")).as("st"))
    val dev = series
      .crossJoin(broadcast(m))
      .select(col("day"), col("n"), (col("n") * col("x") - col("st")).as("dev"))
    val ks = s.range(0, 8).select(col("id").cast("int").as("k"))
    val pairs = dev
      .crossJoin(broadcast(ks))
      .join(
        dev.select(col("day").as("bday"), col("dev").as("bdev")),
        expr("bday = date_sub(day, k)"))
    val perK = pairs
      .groupBy(col("k"))
      .agg(
        max(col("n")).as("n_days"),
        sum(col("dev").cast("decimal(38,0)") * col("bdev")).as("num"),
        count(lit(1)).as("n_pairs"))
    val den = perK
      .where(col("k") === 0)
      .select(col("num").as("den"))
    perK
      .crossJoin(broadcast(den))
      .select(
        col("k"),
        col("n_days"),
        col("n_pairs"),
        expr("CAST((num * 1000000) div den AS BIGINT)").as("acf_ppm"))
      .orderBy(col("k"))
  }

  val q266Oracle: String =
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
      |grid AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM b),
      |s AS (
      |  SELECT grid.day, COALESCE(d.x, 0) AS x
      |  FROM grid LEFT JOIN d USING (day)),
      |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS st FROM s),
      |dev AS (SELECT day, m.n AS n, m.n * x - m.st AS dev FROM s, m),
      |ks AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS k),
      |perk AS (
      |  SELECT k, MAX(a.n) AS n_days,
      |    SUM(CAST(a.dev AS HUGEINT) * p.dev) AS num,
      |    CAST(COUNT(*) AS BIGINT) AS n_pairs
      |  FROM dev a, ks, dev p
      |  WHERE p.day = a.day - k
      |  GROUP BY k),
      |den AS (SELECT num AS den FROM perk WHERE k = 0)
      |SELECT k, n_days, n_pairs,
      |  CAST((num * 1000000) // den.den AS BIGINT) AS acf_ppm
      |FROM perk, den
      |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q267
  /** JUMP CONSISTENT HASH ROUTING (expr/JumpHash — native codegen'd
    * `jump_hash(key, n)`, Lamping & Veach arXiv:1406.2294) with the
    * MINIMAL-RESHARD LAW certified relationally: route every distinct
    * user to 16 and to 17 buckets; when the fleet grows 16 → 17 a key
    * either keeps its bucket or moves to the NEW bucket 16 — so
    * moved_in must be 0 for every old bucket (the property that makes
    * a 100 TB reshard touch only ~1/17 of the data; contrast
    * ops/Rendezvous, which pays O(n) per key for weighted targets).
    * The oracle replays the paper's LCG loop — uint64 wrap as HUGEINT
    * mod 2⁶⁴, the IEEE divide/multiply jump, trunc-not-cast (the q212
    * rounding gotcha) — in a recursive CTE, then the same audit.
    */
  def q267JumpHash(s: SparkSession, dir: String): DataFrame = {
    val assigned = Tables
      .events(s, dir)
      .select(col("user_id"))
      .distinct()
      .select(
        col("user_id"),
        expr("jump_hash(user_id, 16)").as("b16"),
        expr("jump_hash(user_id, 17)").as("b17"))
    val moved = assigned.where(col("b16") =!= col("b17"))
    val c16 = assigned.groupBy(col("b16").as("bucket")).agg(count(lit(1)).as("cnt16"))
    val c17 = assigned.groupBy(col("b17").as("bucket")).agg(count(lit(1)).as("cnt17"))
    val out = moved.groupBy(col("b16").as("bucket")).agg(count(lit(1)).as("moved_out"))
    val in = moved.groupBy(col("b17").as("bucket")).agg(count(lit(1)).as("moved_in"))
    c17
      .join(c16, Seq("bucket"), "left")
      .join(out, Seq("bucket"), "left")
      .join(in, Seq("bucket"), "left")
      .na.fill(0L, Seq("cnt16", "moved_out", "moved_in"))
      .withColumn("minimal_ok", col("bucket") === 16 || col("moved_in") === 0)
      .select(
        col("bucket"), col("cnt16"), col("cnt17"),
        col("moved_out"), col("moved_in"), col("minimal_ok"))
      .orderBy(col("bucket"))
  }

  val q267Oracle: String =
    """WITH RECURSIVE keys AS (SELECT DISTINCT user_id FROM events),
      |params AS (SELECT CAST(unnest([16, 17]) AS BIGINT) AS n),
      |jump AS (
      |  SELECT k.user_id, p.n,
      |    CAST(k.user_id AS HUGEINT) AS key,
      |    CAST(-1 AS BIGINT) AS b,
      |    CAST(0 AS BIGINT) AS j
      |  FROM keys k, params p
      |  UNION ALL
      |  SELECT user_id, n,
      |    (key * 2862933555777941757 + 1) % 18446744073709551616 AS key,
      |    j AS b,
      |    CAST(trunc((j + 1) * (2147483648.0 /
      |      CAST(((key * 2862933555777941757 + 1) % 18446744073709551616)
      |           // 8589934592 + 1 AS DOUBLE))) AS BIGINT) AS j
      |  FROM jump WHERE j < n),
      |fin AS (SELECT user_id, n, CAST(b AS INT) AS bucket FROM jump WHERE j >= n),
      |asg AS (
      |  SELECT a.user_id, a.bucket AS b16, c.bucket AS b17
      |  FROM (SELECT user_id, bucket FROM fin WHERE n = 16) a
      |  JOIN (SELECT user_id, bucket FROM fin WHERE n = 17) c USING (user_id)),
      |mv AS (SELECT * FROM asg WHERE b16 <> b17),
      |c16 AS (SELECT b16 AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt16 FROM asg GROUP BY 1),
      |c17 AS (SELECT b17 AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt17 FROM asg GROUP BY 1),
      |o AS (SELECT b16 AS bucket, CAST(COUNT(*) AS BIGINT) AS moved_out FROM mv GROUP BY 1),
      |i AS (SELECT b17 AS bucket, CAST(COUNT(*) AS BIGINT) AS moved_in FROM mv GROUP BY 1)
      |SELECT c17.bucket,
      |  COALESCE(c16.cnt16, 0) AS cnt16, c17.cnt17,
      |  COALESCE(o.moved_out, 0) AS moved_out,
      |  COALESCE(i.moved_in, 0) AS moved_in,
      |  (c17.bucket = 16 OR COALESCE(i.moved_in, 0) = 0) AS minimal_ok
      |FROM c17
      |LEFT JOIN c16 ON c16.bucket = c17.bucket
      |LEFT JOIN o ON o.bucket = c17.bucket
      |LEFT JOIN i ON i.bucket = c17.bucket
      |ORDER BY c17.bucket""".stripMargin

  // ---------------------------------------------------------------- q268
  /** UNPIVOT / MELT CERTIFICATE — the wide→long reshape every feature
    * store and profiler leans on (q119 hand-rolls it with stack-style
    * unions; this pins the FIRST-CLASS API): `Dataset.unpivot` on two
    * integer-grid part metrics (size, retail cents — the q170
    * discipline keeps the sums exact) against DuckDB's `UNPIVOT (val
    * FOR metric IN (...))`. Certified per (brand, metric): row count,
    * min/max/sum, plus the conservation law n_long = 2·n_wide that
    * melt must obey. Map-side reshape — unpivot is a Generate, no
    * shuffle until the aggregate.
    */
  def q268Unpivot(s: SparkSession, dir: String): DataFrame = {
    val p = Tables
      .part(s, dir)
      .select(
        col("p_brand"),
        col("p_size").cast("long").as("size"),
        expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val wide = p.groupBy(col("p_brand")).agg(count(lit(1)).as("n_wide"))
    val long = p
      .unpivot(
        Array(col("p_brand")),
        Array(col("size"), col("cents")),
        "metric",
        "val")
      .groupBy(col("p_brand"), col("metric"))
      .agg(
        count(lit(1)).as("n"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"),
        sum(col("val")).as("sum_val"))
    long
      .join(broadcast(wide), Seq("p_brand"))
      .groupBy(col("p_brand"))
      .agg(
        sum(col("n")).as("n_long"),
        max(col("n_wide")).as("n_wide"),
        (sum(col("n")) === lit(2) * max(col("n_wide"))).as("conserved_ok"),
        max(when(col("metric") === "size", col("sum_val"))).as("sum_size"),
        max(when(col("metric") === "cents", col("sum_val"))).as("sum_cents"),
        max(when(col("metric") === "size", col("max_val"))).as("max_size"),
        min(when(col("metric") === "cents", col("min_val"))).as("min_cents"))
      .orderBy(col("p_brand"))
  }

  val q268Oracle: String =
    """WITH p AS (
      |  SELECT p_brand, CAST(p_size AS BIGINT) AS size,
      |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM part),
      |wide AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_wide FROM p GROUP BY 1),
      |longf AS (
      |  SELECT p_brand, metric, CAST(COUNT(*) AS BIGINT) AS n,
      |    MIN(val) AS min_val, MAX(val) AS max_val, SUM(val) AS sum_val
      |  FROM (SELECT * FROM p UNPIVOT (val FOR metric IN (size, cents)))
      |  GROUP BY 1, 2)
      |SELECT l.p_brand,
      |  CAST(SUM(l.n) AS BIGINT) AS n_long,
      |  MAX(w.n_wide) AS n_wide,
      |  (SUM(l.n) = 2 * MAX(w.n_wide)) AS conserved_ok,
      |  CAST(MAX(CASE WHEN metric = 'size' THEN sum_val END) AS BIGINT) AS sum_size,
      |  CAST(MAX(CASE WHEN metric = 'cents' THEN sum_val END) AS BIGINT) AS sum_cents,
      |  CAST(MAX(CASE WHEN metric = 'size' THEN max_val END) AS BIGINT) AS max_size,
      |  CAST(MIN(CASE WHEN metric = 'cents' THEN min_val END) AS BIGINT) AS min_cents
      |FROM longf l JOIN wide w ON w.p_brand = l.p_brand
      |GROUP BY l.p_brand
      |ORDER BY l.p_brand""".stripMargin

  // ---------------------------------------------------------------- q269
  /** HILBERT vs Z-ORDER, MEASURED — q208's rectangle probe plus the
    * metric that actually separates the curves: the CLUSTERING NUMBER
    * (Moon et al., "Analysis of the clustering properties of the
    * Hilbert space-filling curve", TKDE 2001) — how many CONTIGUOUS
    * curve ranges a query rectangle shatters into, i.e. the number of
    * seeks a range-pruned scan pays. File counts on the sparse sample
    * tie (files_z = files_h at this occupancy — measured, kept as
    * evidence); the cluster count over the rectangle's full cell grid
    * shows the textbook ~2× Hilbert advantage (measured here: 281 vs
    * 156 summed over the 20 probes). Runs are counted with one lag
    * window per curve over the tiny qid×64-cell frame: a cell starts
    * a run iff position−1 is absent. [[graft.ops.Layout.hilbertValue]]
    * / [[graft.ops.Layout.hilbertSqlCtes]] emit both engines' round
    * arithmetic from one generator.
    */
  def q269Hilbert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val queries = (0 until 20)
      .map(i => (i, (i * 37L) % 248, (i * 53L) % 248))
      .toDF("qid", "x0", "y0")
    // data-sample file counts (q208's probe, third layout added)
    val keyed0 = Tables
      .lineitem(s, dir)
      .select(
        (col("l_partkey") % 256).as("x"),
        ((col("l_suppkey") * 131) % 256).as("y"))
      .withColumn(
        "zkey",
        graft.ops.Layout.zValue(Seq((col("x"), 0L, 255L), (col("y"), 0L, 255L)), 8))
    val keyed = graft.ops.Layout
      .hilbertValue(keyed0, "x", "y", 8, "hkey")
      .withColumn("file_z", expr("zkey div 256"))
      .withColumn("file_h", expr("hkey div 256"))
    val files = keyed
      .crossJoin(broadcast(queries))
      .where(
        col("x") >= col("x0") && col("x") <= col("x0") + 7 &&
          col("y") >= col("y0") && col("y") <= col("y0") + 7)
      .groupBy(col("qid"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("file_z")).as("files_z"),
        countDistinct(col("file_h")).as("files_h"))
    // grid-exact cluster counts: every cell of every rectangle
    val cells0 = queries
      .withColumn("dx", explode(expr("sequence(0L, 7L)")))
      .withColumn("dy", explode(expr("sequence(0L, 7L)")))
      .select(col("qid"), (col("x0") + col("dx")).as("x"), (col("y0") + col("dy")).as("y"))
      .withColumn(
        "zkey",
        graft.ops.Layout.zValue(Seq((col("x"), 0L, 255L), (col("y"), 0L, 255L)), 8))
    val cells = graft.ops.Layout.hilbertValue(cells0, "x", "y", 8, "hkey")
    def runStart(key: String): Column = {
      val prev = lag(col(key), 1).over(Window.partitionBy(col("qid")).orderBy(col(key)))
      when(prev.isNull || prev =!= col(key) - 1, 1L).otherwise(0L)
    }
    val clusters = cells
      .withColumn("zrun", runStart("zkey"))
      .withColumn("hrun", runStart("hkey"))
      .groupBy(col("qid"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(col("zrun")).as("clusters_z"),
        sum(col("hrun")).as("clusters_h"))
    files
      .join(clusters, Seq("qid"))
      .withColumn("hilbert_wins", col("clusters_h") <= col("clusters_z"))
      .select(
        col("qid"), col("n_rows"), col("files_z"), col("files_h"),
        col("n_cells"), col("clusters_z"), col("clusters_h"), col("hilbert_wins"))
      .orderBy(col("qid"))
  }

  val q269Oracle: String = {
    val zsql = graft.ops.Layout.zValueSql(Seq(("x", 0L, 255L), ("y", 0L, 255L)), 8)
    val (hilbertCtes, hfin) =
      graft.ops.Layout.hilbertSqlCtes("rows_k", Seq("rid", "x AS x", "y AS y"), "x", "y", 8)
    val (cellCtes, cfin) =
      graft.ops.Layout.hilbertSqlCtes("cells0", Seq("qid", "x AS x", "y AS y"), "x", "y", 8)
    // the two chains share round CTE names — prefix the cell chain
    val cellCtesP = cellCtes.replace("__h", "__c")
    val cfinP = cfin.replace("__h", "__c")
    s"""WITH rows_k AS (
       |  SELECT row_number() OVER () AS rid,
       |    l_partkey % 256 AS x, (l_suppkey * 131) % 256 AS y
       |  FROM lineitem
       |),
       |$hilbertCtes,
       |keyed AS (
       |  SELECT h.x, h.y,
       |    $zsql // 256 AS file_z,
       |    h.hkey // 256 AS file_h
       |  FROM $hfin h
       |), q AS (
       |  SELECT CAST(i AS INT) AS qid, (i * 37) % 248 AS x0, (i * 53) % 248 AS y0
       |  FROM (SELECT unnest(range(0, 20)) AS i)
       |), files AS (
       |  SELECT q.qid, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(COUNT(DISTINCT file_z) AS BIGINT) AS files_z,
       |    CAST(COUNT(DISTINCT file_h) AS BIGINT) AS files_h
       |  FROM keyed JOIN q
       |    ON x BETWEEN x0 AND x0 + 7 AND y BETWEEN y0 AND y0 + 7
       |  GROUP BY q.qid
       |), cells0 AS (
       |  SELECT qid, x0 + dx.d AS x, y0 + dy.d AS y
       |  FROM q,
       |    (SELECT unnest(range(0, 8)) AS d) dx,
       |    (SELECT unnest(range(0, 8)) AS d) dy
       |),
       |$cellCtesP,
       |ck AS (
       |  SELECT qid, $zsql AS zkey, hkey
       |  FROM $cfinP
       |), runs AS (
       |  SELECT qid,
       |    CASE WHEN lag(zkey) OVER (PARTITION BY qid ORDER BY zkey) IS NULL
       |           OR lag(zkey) OVER (PARTITION BY qid ORDER BY zkey) <> zkey - 1
       |         THEN 1 ELSE 0 END AS zrun,
       |    CASE WHEN lag(hkey) OVER (PARTITION BY qid ORDER BY hkey) IS NULL
       |           OR lag(hkey) OVER (PARTITION BY qid ORDER BY hkey) <> hkey - 1
       |         THEN 1 ELSE 0 END AS hrun
       |  FROM ck
       |), clusters AS (
       |  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_cells,
       |    CAST(SUM(zrun) AS BIGINT) AS clusters_z,
       |    CAST(SUM(hrun) AS BIGINT) AS clusters_h
       |  FROM runs GROUP BY qid
       |)
       |SELECT f.qid, f.n_rows, f.files_z, f.files_h,
       |  c.n_cells, c.clusters_z, c.clusters_h,
       |  (c.clusters_h <= c.clusters_z) AS hilbert_wins
       |FROM files f JOIN clusters c ON c.qid = f.qid
       |ORDER BY f.qid""".stripMargin
  }

  // ---------------------------------------------------------------- q270
  /** AGGREGATE FILTER-CLAUSE CERTIFICATE — `agg(x) FILTER (WHERE p)`
    * (SQL:2003 T612, supported by both engines since Spark 3.0 /
    * DuckDB 0.5) pinned against its CASE-expression rewrite in the
    * same scan: per return flag, filtered count/sum/min alongside the
    * CASE forms plus equality verdicts, including the all-false-filter
    * group edge (sum → NULL, count → 0 — the null-vs-zero asymmetry
    * q209 pinned for plain aggregates carries over). Exact: integer
    * key sums only, quantity thresholds on the raw double column.
    */
  def q270FilterClause(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("q270_lineitem")
    s.sql(
      """SELECT l_returnflag,
        |  count(*) AS n_all,
        |  count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  sum(l_orderkey) FILTER (WHERE l_quantity > 25) AS sum_big,
        |  min(l_orderkey) FILTER (WHERE l_quantity > 25 AND l_linenumber = 1) AS min_big_l1,
        |  sum(l_orderkey) FILTER (WHERE l_quantity > 1000) AS sum_none,
        |  count(*) FILTER (WHERE l_quantity > 1000) AS n_none,
        |  count(*) FILTER (WHERE l_quantity > 25)
        |    = sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS count_eq_case,
        |  coalesce(sum(l_orderkey) FILTER (WHERE l_quantity > 25), -1)
        |    = coalesce(sum(CASE WHEN l_quantity > 25 THEN l_orderkey END), -1) AS sum_eq_case,
        |  sum(l_orderkey) FILTER (WHERE l_quantity > 1000) IS NULL AS empty_sum_is_null
        |FROM q270_lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  val q270Oracle: String =
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n_all,
      |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
      |  CAST(sum(l_orderkey) FILTER (WHERE l_quantity > 25) AS BIGINT) AS sum_big,
      |  CAST(min(l_orderkey) FILTER (WHERE l_quantity > 25 AND l_linenumber = 1) AS BIGINT)
      |    AS min_big_l1,
      |  CAST(sum(l_orderkey) FILTER (WHERE l_quantity > 1000) AS BIGINT) AS sum_none,
      |  CAST(count(*) FILTER (WHERE l_quantity > 1000) AS BIGINT) AS n_none,
      |  count(*) FILTER (WHERE l_quantity > 25)
      |    = sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS count_eq_case,
      |  coalesce(sum(l_orderkey) FILTER (WHERE l_quantity > 25), -1)
      |    = coalesce(sum(CASE WHEN l_quantity > 25 THEN l_orderkey END), -1) AS sum_eq_case,
      |  sum(l_orderkey) FILTER (WHERE l_quantity > 1000) IS NULL AS empty_sum_is_null
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q271
  /** LATERAL JOIN CERTIFICATE — the correlated top-N-per-row shape
    * (`FROM cust, LATERAL (SELECT ... WHERE o_custkey = c_custkey
    * ORDER BY ... LIMIT 3)`) that engines must decorrelate, pinned
    * against the window-function rewrite IN THE SAME QUERY: per
    * customer bucket, the lateral path's top-3-order revenue sum and
    * count must equal the row_number()≤3 path's (verdict columns).
    * Exact: revenue in floor-cents. The tie rule (o_orderdate DESC,
    * o_orderkey DESC) is a total order, so top-3 is deterministic.
    */
  def q271Lateral(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("q271_customer")
    Tables.orders(s, dir).createOrReplaceTempView("q271_orders")
    s.sql(
      """WITH lat AS (
        |  SELECT c.c_custkey, t.cents
        |  FROM q271_customer c,
        |  LATERAL (
        |    SELECT CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |    FROM q271_orders o
        |    WHERE o.o_custkey = c.c_custkey
        |    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
        |    LIMIT 3
        |  ) t
        |),
        |lat_b AS (
        |  SELECT c_custkey DIV 100 AS bucket,
        |    count(*) AS n_lat, sum(cents) AS cents_lat
        |  FROM lat GROUP BY 1
        |),
        |win AS (
        |  SELECT o_custkey AS c_custkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM q271_orders
        |),
        |win_b AS (
        |  SELECT c_custkey DIV 100 AS bucket,
        |    count(*) AS n_win, sum(cents) AS cents_win
        |  FROM win WHERE rn <= 3 GROUP BY 1
        |)
        |SELECT l.bucket, l.n_lat, l.cents_lat,
        |  w.n_win, w.cents_win,
        |  l.n_lat = w.n_win AS n_eq,
        |  l.cents_lat = w.cents_win AS cents_eq
        |FROM lat_b l JOIN win_b w ON w.bucket = l.bucket
        |ORDER BY l.bucket""".stripMargin)
  }

  val q271Oracle: String =
    """WITH lat AS (
      |  SELECT c.c_custkey, t.cents
      |  FROM customer c,
      |  LATERAL (
      |    SELECT CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |    FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
      |    LIMIT 3
      |  ) t
      |),
      |lat_b AS (
      |  SELECT c_custkey // 100 AS bucket,
      |    CAST(count(*) AS BIGINT) AS n_lat, CAST(sum(cents) AS BIGINT) AS cents_lat
      |  FROM lat GROUP BY 1
      |),
      |win AS (
      |  SELECT o_custkey AS c_custkey,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders
      |),
      |win_b AS (
      |  SELECT c_custkey // 100 AS bucket,
      |    CAST(count(*) AS BIGINT) AS n_win, CAST(sum(cents) AS BIGINT) AS cents_win
      |  FROM win WHERE rn <= 3 GROUP BY 1
      |)
      |SELECT l.bucket, l.n_lat, l.cents_lat,
      |  w.n_win, w.cents_win,
      |  l.n_lat = w.n_win AS n_eq,
      |  l.cents_lat = w.cents_win AS cents_eq
      |FROM lat_b l JOIN win_b w ON w.bucket = l.bucket
      |ORDER BY l.bucket""".stripMargin

  // ---------------------------------------------------------------- q272
  /** THEIL–SEN ROBUST TREND (Sen 1968): per event type, the median of
    * all pairwise daily-count slopes — the outlier-proof alternative
    * to q134's OLS (one wild day moves OLS arbitrarily; it moves the
    * pairwise-slope median not at all). Exact: slopes on the integer
    * grid (micro-units, truncating div — both engines truncate toward
    * zero on negatives), the median as the DISCRETE lower
    * order-statistic selected by row_number under the total order
    * (slope, d_i, d_j) — the q92/q97 interpolation-free recipe. The
    * pair frame is bounded (days², ≤366² per type, calendar-bounded,
    * not data-bounded); everything upstream is one groupBy on events.
    */
  def q272TheilSen(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables
      .events(s, dir)
      .select(col("event_type").as("t"), to_date(col("ts")).as("day"))
      .groupBy(col("t"), col("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("d", datediff(col("day"), to_date(lit("2024-01-01"))))
    val a = daily.select(col("t"), col("d").as("di"), col("c").as("ci"))
    val b = daily.select(col("t").as("tb"), col("d").as("dj"), col("c").as("cj"))
    val pairs = a
      .join(b, col("t") === col("tb") && col("di") < col("dj"))
      .withColumn("slope_u", expr("((cj - ci) * 1000000) div (dj - di)"))
    val w = Window.partitionBy(col("t")).orderBy(col("slope_u"), col("di"), col("dj"))
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(Window.partitionBy(col("t"))))
      .groupBy(col("t"))
      .agg(
        max(col("np")).as("n_pairs"),
        min(col("slope_u")).as("min_slope_u"),
        max(col("slope_u")).as("max_slope_u"),
        max(when(col("rn") === expr("(np + 1) div 2"), col("slope_u"))).as("median_slope_u"))
      .orderBy(col("t"))
  }

  val q272Oracle: String =
    """WITH daily AS (
      |  SELECT event_type AS t, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |dd AS (SELECT t, day - DATE '2024-01-01' AS d, c FROM daily),
      |pairs AS (
      |  SELECT a.t, a.d AS di, b.d AS dj,
      |    ((b.c - a.c) * 1000000) // (b.d - a.d) AS slope_u
      |  FROM dd a JOIN dd b ON b.t = a.t AND a.d < b.d),
      |ranked AS (
      |  SELECT t, slope_u,
      |    row_number() OVER (PARTITION BY t ORDER BY slope_u, di, dj) AS rn,
      |    COUNT(*) OVER (PARTITION BY t) AS np
      |  FROM pairs)
      |SELECT t,
      |  CAST(MAX(np) AS BIGINT) AS n_pairs,
      |  CAST(MIN(slope_u) AS BIGINT) AS min_slope_u,
      |  CAST(MAX(slope_u) AS BIGINT) AS max_slope_u,
      |  CAST(MAX(CASE WHEN rn = (np + 1) // 2 THEN slope_u END) AS BIGINT) AS median_slope_u
      |FROM ranked
      |GROUP BY t
      |ORDER BY t""".stripMargin

  // ---------------------------------------------------------------- q273
  /** MANN–WHITNEY U (Wilcoxon rank-sum, 1947) — the nonparametric A/B
    * companion to q233's chi-square: does `value` under 'click'
    * stochastically dominate 'view'? Exact integer throughout via
    * DOUBLED midranks: group both samples by value (ties collapse),
    * prefix-sum the combined counts ([[graft.ops.Sweep]]'s range-binned
    * two-pass — the distributed form; the oracle replays with a plain
    * window), then 2·avgrank of a tie group = 2·prior + c + 1, so
    * 2R = Σ c_g·(2·prior + c + 1) and 2U = 2R − n(n+1) are integers.
    * Certified: both 2U values, the partition law 2U_A + 2U_B =
    * 2·n_A·n_B (ties cancel in midranks — the law a broken tie rule
    * breaks), and the dominance direction.
    */
  def q273MannWhitney(s: SparkSession, dir: String): DataFrame = {
    val byVal = Tables
      .events(s, dir)
      .where(col("event_type").isin("click", "view"))
      .groupBy(col("value").as("v"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("ca"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val cum = graft.ops.Sweep
      .orderedPrefixSum(byVal, Seq.empty, col("v"), lit(0L), col("c"), "cum")
      .withColumn("prior", col("cum") - col("c"))
    cum
      .agg(
        sum(col("ca")).as("n_a"),
        sum(col("cb")).as("n_b"),
        sum(col("ca") * (lit(2) * col("prior") + col("c") + 1)).as("r2_a"),
        sum(col("cb") * (lit(2) * col("prior") + col("c") + 1)).as("r2_b"))
      .select(
        col("n_a"), col("n_b"),
        col("r2_a"), col("r2_b"),
        (col("r2_a") - col("n_a") * (col("n_a") + 1)).as("u2_a"),
        (col("r2_b") - col("n_b") * (col("n_b") + 1)).as("u2_b"))
      .withColumn(
        "partition_ok",
        col("u2_a") + col("u2_b") === lit(2) * col("n_a") * col("n_b"))
      .withColumn("a_dominates", col("u2_a") > col("u2_b"))
  }

  val q273Oracle: String =
    """WITH byval AS (
      |  SELECT value AS v,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY value),
      |cum AS (
      |  SELECT v, ca, cb, ca + cb AS c,
      |    COALESCE(SUM(ca + cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      |  FROM byval),
      |agg AS (
      |  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
      |    CAST(SUM(ca * (2 * prior + c + 1)) AS BIGINT) AS r2_a,
      |    CAST(SUM(cb * (2 * prior + c + 1)) AS BIGINT) AS r2_b
      |  FROM cum)
      |SELECT n_a, n_b, r2_a, r2_b,
      |  r2_a - n_a * (n_a + 1) AS u2_a,
      |  r2_b - n_b * (n_b + 1) AS u2_b,
      |  (r2_a - n_a * (n_a + 1)) + (r2_b - n_b * (n_b + 1)) = 2 * n_a * n_b AS partition_ok,
      |  (r2_a - n_a * (n_a + 1)) > (r2_b - n_b * (n_b + 1)) AS a_dominates
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- q274
  /** BITMAP-INDEX SET ALGEBRA — hour-presence bitmaps per (event type,
    * 62-hour block): mask = OR of (1 << hour-in-block) (62 bits so the
    * sign bit is never touched — portable two's-complement-free), then
    * per type pair the intersection/union HOUR counts via
    * bit_count(maskA & maskB) / bit_count(maskA | maskB) summed over
    * blocks — the roaring-bitmap query shape (bitwise words instead of
    * value joins) certified against inclusion-exclusion: inter + union
    * = hours_a + hours_b per pair, plus a direct COUNT(DISTINCT)
    * replay of each side's hour count. One events pass builds the
    * bitmap frame (|types|·|blocks| rows); the pair pass is a
    * broadcast join on the tiny frame.
    */
  def q274Bitmap(s: SparkSession, dir: String): DataFrame = {
    val hours = Tables
      .events(s, dir)
      .select(
        col("event_type").as("t"),
        expr("CAST(floor(ts_ns div 1000 / 3600000000.0) AS BIGINT)").as("ehour"))
      .distinct()
    val masks0 = hours
      .select(col("t"), expr("ehour div 62").as("blk"), expr("ehour % 62").as("bit"))
      .groupBy(col("t"), col("blk"))
      .agg(expr("bit_or(shiftleft(1L, CAST(bit AS INT)))").as("mask"))
    // densify to the full type×block grid (mask 0) so a block where only
    // ONE type has activity still contributes to the pair's union at
    // sparse SFs — otherwise the inner pair join drops it and the
    // inclusion-exclusion law silently narrows its domain
    val masks = masks0
      .select(col("t")).distinct()
      .crossJoin(masks0.select(col("blk")).distinct())
      .join(masks0, Seq("t", "blk"), "left")
      .na.fill(0L, Seq("mask"))
    val perBlock = masks
      .select(col("t").as("ta"), col("blk"), col("mask").as("ma"))
      .join(
        masks.select(col("t").as("tb"), col("blk").as("blkb"), col("mask").as("mb")),
        col("blk") === col("blkb") && col("ta") < col("tb"))
      .select(
        col("ta"), col("tb"),
        expr("bit_count(ma & mb)").cast("long").as("inter_bits"),
        expr("bit_count(ma | mb)").cast("long").as("union_bits"))
    val totals = masks
      .groupBy(col("t"))
      .agg(sum(expr("bit_count(mask)").cast("long")).as("hours"))
    perBlock
      .groupBy(col("ta"), col("tb"))
      .agg(
        sum(col("inter_bits")).as("inter_hours"),
        sum(col("union_bits")).as("union_hours"))
      .join(broadcast(totals.select(col("t").as("ta"), col("hours").as("hours_a"))), Seq("ta"))
      .join(broadcast(totals.select(col("t").as("tb"), col("hours").as("hours_b"))), Seq("tb"))
      .withColumn(
        "incl_excl_ok",
        col("inter_hours") + col("union_hours") === col("hours_a") + col("hours_b"))
      .select(
        col("ta"), col("tb"), col("hours_a"), col("hours_b"),
        col("inter_hours"), col("union_hours"), col("incl_excl_ok"))
      .orderBy(col("ta"), col("tb"))
  }

  val q274Oracle: String =
    """WITH hours AS (
      |  SELECT DISTINCT event_type AS t,
      |    CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS ehour
      |  FROM events),
      |masks0 AS (
      |  SELECT t, ehour // 62 AS blk,
      |    CAST(SUM(DISTINCT (CAST(1 AS BIGINT) << CAST(ehour % 62 AS INT))) AS BIGINT) AS mask
      |  FROM hours GROUP BY 1, 2),
      |masks AS (
      |  SELECT g.t, g.blk, COALESCE(m.mask, 0) AS mask
      |  FROM (SELECT t, blk
      |        FROM (SELECT DISTINCT t FROM masks0), (SELECT DISTINCT blk FROM masks0)) g
      |  LEFT JOIN masks0 m ON m.t = g.t AND m.blk = g.blk),
      |perblock AS (
      |  SELECT a.t AS ta, b.t AS tb,
      |    bit_count(a.mask & b.mask) AS inter_bits,
      |    bit_count(a.mask | b.mask) AS union_bits
      |  FROM masks a JOIN masks b ON b.blk = a.blk AND a.t < b.t),
      |totals AS (
      |  SELECT t, CAST(SUM(bit_count(mask)) AS BIGINT) AS hours FROM masks GROUP BY 1)
      |SELECT p.ta, p.tb, x.hours AS hours_a, y.hours AS hours_b,
      |  CAST(SUM(inter_bits) AS BIGINT) AS inter_hours,
      |  CAST(SUM(union_bits) AS BIGINT) AS union_hours,
      |  CAST(SUM(inter_bits) AS BIGINT) + CAST(SUM(union_bits) AS BIGINT)
      |    = x.hours + y.hours AS incl_excl_ok
      |FROM perblock p
      |JOIN totals x ON x.t = p.ta
      |JOIN totals y ON y.t = p.tb
      |GROUP BY p.ta, p.tb, x.hours, y.hours
      |ORDER BY p.ta, p.tb""".stripMargin

  // ---------------------------------------------------------------- q275
  /** DAG LONGEST PATH (critical path) over the q174 block graph —
    * every edge goes low→high key, so the graph is a DAG and the
    * longest-path DP L(v) = max(L(v), max over u→v of L(u)+1) closes
    * in ≤ 9 rounds (the deepest chain inside a 10-block). The rounds
    * are the Bellman relaxation every scheduling/critical-path engine
    * runs — each one join + one max-aggregate, lineage cut per round
    * ([[graft.ops.Checkpoints]]); no driver collects. Output: the
    * depth histogram (nodes, id-sum, id-range per longest-path
    * length) plus each depth's convergence flag. Oracle: recursive
    * CTE with UNION dedup (bounded: nodes × depths), then the same
    * MAX-per-node rollup.
    */
  def q275CriticalPath(s: SparkSession, dir: String): DataFrame = {
    val edges = blockGraph(s, dir)
    val nodes = edges
      .select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .distinct()
    var lp = nodes.withColumn("len", lit(0L))
    for (_ <- 1 to 9) {
      val relaxed = lp
        .join(edges, col("node") === col("u"))
        .select(col("v").as("node"), (col("len") + 1).as("len"))
      lp = graft.ops.Checkpoints.cut(
        lp.unionByName(relaxed).groupBy(col("node")).agg(max(col("len")).as("len")))
    }
    lp.groupBy(col("len"))
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(col("node")).as("id_sum"),
        min(col("node")).as("min_id"),
        max(col("node")).as("max_id"))
      .orderBy(col("len"))
  }

  val q275Oracle: String =
    s"""WITH RECURSIVE e AS (
      |$BlockGraphSql
      |), nodes AS (
      |  SELECT u AS node FROM e UNION SELECT v FROM e
      |), walk(node, len) AS (
      |  SELECT node, 0 FROM nodes
      |  UNION
      |  SELECT e.v, w.len + 1 FROM walk w JOIN e ON e.u = w.node
      |), lp AS (
      |  SELECT node, MAX(len) AS len FROM walk GROUP BY node
      |)
      |SELECT CAST(len AS BIGINT) AS len,
      |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  CAST(SUM(node) AS BIGINT) AS id_sum,
      |  CAST(MIN(node) AS BIGINT) AS min_id,
      |  CAST(MAX(node) AS BIGINT) AS max_id
      |FROM lp
      |GROUP BY len
      |ORDER BY len""".stripMargin

  // ---------------------------------------------------------------- q276
  /** GREEDY SET COVER for VOCABULARY CURATION — "which 6 documents
    * cover the most vocabulary?": the classic (1−1/e)-approximation
    * loop, each round picking the doc with the most still-uncovered
    * tokens (tie: lowest doc_id). The doc→token membership frame is
    * distributed; each round is one anti-join (drop covered tokens) +
    * one count aggregate + a 1-row argmax collect (bounded model
    * state, the IVF-centroid class). The oracle replays all 6 picks
    * relationally — chained MATERIALIZED CTEs re-deriving each round's
    * argmax with a window (no pinned picks; both engines run the same
    * greedy from scratch). Output per round: picked doc, newly/cum
    * covered, coverage ppm of the full vocabulary.
    */
  def q276SetCover(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // universe = token BIGRAMS (the unigram vocabulary of the synthetic
    // corpus is only 31 words — one document covers it; bigrams give a
    // ~900-term universe no single doc dominates)
    val pairs = Tables
      .documents(s, dir)
      .select(col("doc_id"), graft.ops.TextStats.tokens(lower(col("text"))).as("ts"))
      .select(
        col("doc_id"),
        explode(expr("transform(sequence(0, size(ts) - 2), i -> ts[i] || ' ' || ts[i + 1])"))
          .as("tok"))
      .distinct()
      .cache()
    val vocabTotal = pairs.select(col("tok")).distinct().count()
    var uncovered = pairs
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (round <- 1 to 6) {
      val best = uncovered
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id").asc)
        .limit(1)
        .as[(Long, Long)]
        .head()
      picks += ((round, best._1, best._2))
      val coveredToks = pairs.where(col("doc_id") === best._1).select(col("tok"))
      uncovered = graft.ops.Checkpoints.cut(
        uncovered.join(coveredToks, Seq("tok"), "left_anti"))
    }
    pairs.unpersist()
    var cumRun = 0L
    val rows = picks.toSeq.map { case (r, d, g) => cumRun += g; (r, d, g, cumRun) }
    rows
      .toDF("round", "doc_id", "newly_covered", "cum_covered")
      .withColumn("vocab_total", lit(vocabTotal))
      .withColumn("coverage_ppm", expr("(cum_covered * 1000000) div vocab_total"))
      .orderBy(col("round"))
  }

  val q276Oracle: String = {
    // round i: pick argmax gain over pairs minus tokens of picks 1..i-1
    val rounds = (1 to 6).map { i =>
      val prevCov =
        if (i == 1) ""
        else s"WHERE tok NOT IN (SELECT tok FROM cov${i - 1})"
      val prevCovSel =
        if (i == 1) s"SELECT tok FROM pairs WHERE doc_id = (SELECT doc_id FROM pick1)"
        else
          s"""SELECT tok FROM cov${i - 1}
             |  UNION SELECT tok FROM pairs WHERE doc_id = (SELECT doc_id FROM pick$i)""".stripMargin
      s"""unc$i AS MATERIALIZED (
         |  SELECT doc_id, tok FROM pairs $prevCov),
         |pick$i AS MATERIALIZED (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
         |  FROM unc$i GROUP BY doc_id
         |  ORDER BY gain DESC, doc_id ASC LIMIT 1),
         |cov$i AS MATERIALIZED (
         |  $prevCovSel)""".stripMargin
    }
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
       |  FROM documents),
       |pairs AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] AS tok
       |  FROM toks, (SELECT unnest(range(1, 256)) AS i)
       |  WHERE i < len(ts)),
       |vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab_total FROM pairs),
       |${rounds.mkString(",\n")},
       |allp AS (
       |  ${(1 to 6)
         .map(i => s"SELECT $i AS round, doc_id, gain FROM pick$i")
         .mkString("\n  UNION ALL ")}
       |)
       |SELECT CAST(round AS INT) AS round, doc_id,
       |  gain AS newly_covered,
       |  CAST(SUM(gain) OVER (ORDER BY round) AS BIGINT) AS cum_covered,
       |  vocab.vocab_total,
       |  (CAST(SUM(gain) OVER (ORDER BY round) AS BIGINT) * 1000000) // vocab.vocab_total
       |    AS coverage_ppm
       |FROM allp, vocab
       |ORDER BY round""".stripMargin
  }

  // ---------------------------------------------------------------- q277
  /** STRONGLY CONNECTED COMPONENTS (ops/Scc — forward/backward
    * min-label fixpoints, the directed closure of the CC family) on a
    * graph with PLANTED cycles: forward edges k→k+1/k+2 inside
    * 10-blocks plus a max→min back edge in every third block, so those
    * blocks collapse to one 10-node SCC and the rest stay singletons.
    * The oracle is GROUND TRUTH, not a replay of the labeling: a
    * recursive reachability closure joined with its transpose defines
    * mutual reachability, scc(v) = min mutually-reachable id — so a
    * hash match PROVES the FW-BW labeling exact on this dataset (the
    * q130 measured-finding posture; see Scc scaladoc for the
    * general-graph caveat). Rolled up per scc-id bucket: nodes, sccs,
    * cyclic sccs, max size, id sum.
    */
  /** Directed test graph shared by q277: forward +1/+2 edges inside
    * 10-blocks over real customer keys, plus a (max → min) back edge
    * in blocks where block % 3 = 0.
    */
  private def directedBlockGraph(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.customer(s, dir).select(col("c_custkey").as("k"))
    val fwd = keys
      .withColumn("d", explode(array(lit(1L), lit(2L))))
      .withColumn("v", col("k") + col("d"))
      .where(expr("(k div 10) = (v div 10)"))
      .join(keys.withColumnRenamed("k", "v"), Seq("v"), "left_semi")
      .select(col("k").as("src"), col("v").as("dst"))
    val back = keys
      .groupBy(expr("k div 10").as("blk"))
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      .where(col("blk") % 3 === 0 && col("lo") < col("hi"))
      .select(col("hi").as("src"), col("lo").as("dst"))
    fwd.unionByName(back)
  }

  private val DirectedBlockGraphSql: String =
    """SELECT cand.k AS src, cand.v AS dst
      |  FROM (SELECT k.c_custkey AS k, k.c_custkey + d.d AS v
      |        FROM customer k, (SELECT unnest([1, 2]) AS d) d
      |        WHERE (k.c_custkey // 10) = ((k.c_custkey + d.d) // 10)) cand
      |  JOIN customer k2 ON k2.c_custkey = cand.v
      |  UNION ALL
      |  SELECT hi AS src, lo AS dst
      |  FROM (SELECT c_custkey // 10 AS blk, MIN(c_custkey) AS lo, MAX(c_custkey) AS hi
      |        FROM customer GROUP BY 1)
      |  WHERE blk % 3 = 0 AND lo < hi""".stripMargin

  def q277Scc(s: SparkSession, dir: String): DataFrame = {
    val comps = graft.ops.Scc.components(directedBlockGraph(s, dir), rounds = 12)
    comps
      .groupBy(expr("scc_id div 500").as("bucket"))
      .agg(
        sum(col("size")).as("n_nodes"),
        count(lit(1)).as("n_sccs"),
        sum(when(col("size") > 1, 1L).otherwise(0L)).as("n_cyclic"),
        max(col("size")).as("max_size"),
        sum(col("scc_id")).as("id_sum"))
      .orderBy(col("bucket"))
  }

  val q277Oracle: String =
    s"""WITH RECURSIVE e AS (
      |$DirectedBlockGraphSql
      |), nodes AS (
      |  SELECT src AS node FROM e UNION SELECT dst FROM e
      |), reach(a, node) AS (
      |  SELECT node, node FROM nodes
      |  UNION
      |  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.node
      |), mutual AS (
      |  SELECT x.a AS v, x.node AS u
      |  FROM reach x JOIN reach y ON y.a = x.node AND y.node = x.a
      |), scc AS (
      |  SELECT v, MIN(u) AS scc_id FROM mutual GROUP BY v
      |), sizes AS (
      |  SELECT scc_id, CAST(COUNT(*) AS BIGINT) AS size FROM scc GROUP BY scc_id
      |)
      |SELECT scc_id // 500 AS bucket,
      |  CAST(SUM(size) AS BIGINT) AS n_nodes,
      |  CAST(COUNT(*) AS BIGINT) AS n_sccs,
      |  CAST(SUM(CASE WHEN size > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cyclic,
      |  CAST(MAX(size) AS BIGINT) AS max_size,
      |  CAST(SUM(scc_id) AS BIGINT) AS id_sum
      |FROM sizes
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q278
  /** CMS JOIN-SIZE ESTIMATION (Cormode–Muthukrishnan §4.2): the inner
    * product of two Count-Min sketches over the join key estimates
    * |R ⋈ S| = Σ_k c_R(k)·c_S(k) — the cardinality-estimation trick a
    * planner can run on 100 TB inputs from two O(d·w) summaries
    * without touching the data again. Each side's key multiset goes
    * through q131's 4×32 matrix (md5 row hashes ⇒ every counter is
    * relationally replayable); the estimate is min over rows of the
    * row-wise dot product, and the CMS guarantee est ≥ exact (hash
    * collisions only ADD spurious products) is pinned per row and for
    * the min. The exact join size rides one equi-join aggregate on
    * the per-key count frames. Width 32 vs 150 users forces real
    * collisions — the overcount is visibly non-zero and checked.
    */
  def q278CmsJoinSize(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def side(t: String) = ev
      .where(col("event_type") === t)
      .select(col("user_id").cast("string").as("k"))
    val a = side("click").agg(expr("count_min(k, 4, 32)").as("ma"), count(lit(1)).as("n_r"))
    val b = side("purchase").agg(expr("count_min(k, 4, 32)").as("mb"), count(lit(1)).as("n_s"))
    val exact = side("click")
      .groupBy(col("k")).agg(count(lit(1)).as("cr"))
      .join(side("purchase").groupBy(col("k")).agg(count(lit(1)).as("cs")), Seq("k"))
      .agg(sum(col("cr") * col("cs")).as("exact_join_size"))
    def rowDot(i: Int) =
      expr(s"aggregate(zip_with(ma[$i], mb[$i], (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
    a.crossJoin(b)
      .crossJoin(exact)
      .select(
        col("n_r"), col("n_s"), col("exact_join_size"),
        rowDot(0).as("dot_0"), rowDot(1).as("dot_1"),
        rowDot(2).as("dot_2"), rowDot(3).as("dot_3"))
      .withColumn("est_join_size", least(col("dot_0"), col("dot_1"), col("dot_2"), col("dot_3")))
      .withColumn(
        "never_under",
        col("dot_0") >= col("exact_join_size") && col("dot_1") >= col("exact_join_size") &&
          col("dot_2") >= col("exact_join_size") && col("dot_3") >= col("exact_join_size"))
      .withColumn(
        "overcount_ppm",
        expr("((est_join_size - exact_join_size) * 1000000) div exact_join_size"))
  }

  val q278Oracle: String = {
    val rows = (0 until 4)
      .map { i =>
        s"""SELECT $i AS i, CAST(('0x' || substr(md5($i || ':' || k), 1, 15)) AS BIGINT) % 32
           |  AS bucket, c FROM ra""".stripMargin
      }
      .mkString("\n  UNION ALL ")
    val rowsB = (0 until 4)
      .map { i =>
        s"""SELECT $i AS i, CAST(('0x' || substr(md5($i || ':' || k), 1, 15)) AS BIGINT) % 32
           |  AS bucket, c FROM rb""".stripMargin
      }
      .mkString("\n  UNION ALL ")
    s"""WITH ra AS (
       |  SELECT CAST(user_id AS VARCHAR) AS k, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events WHERE event_type = 'click' GROUP BY 1),
       |rb AS (
       |  SELECT CAST(user_id AS VARCHAR) AS k, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |acell AS (
       |  SELECT i, bucket, CAST(SUM(c) AS BIGINT) AS cnt FROM (
       |  $rows
       |  ) GROUP BY i, bucket),
       |bcell AS (
       |  SELECT i, bucket, CAST(SUM(c) AS BIGINT) AS cnt FROM (
       |  $rowsB
       |  ) GROUP BY i, bucket),
       |dots AS (
       |  SELECT a.i, CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS dot
       |  FROM acell a JOIN bcell b ON b.i = a.i AND b.bucket = a.bucket
       |  GROUP BY a.i),
       |ex AS (
       |  SELECT CAST(SUM(ra.c * rb.c) AS BIGINT) AS exact_join_size
       |  FROM ra JOIN rb ON rb.k = ra.k),
       |ns AS (
       |  SELECT CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
       |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_s
       |  FROM events),
       |wide AS (
       |  SELECT
       |    MAX(CASE WHEN i = 0 THEN dot END) AS dot_0,
       |    MAX(CASE WHEN i = 1 THEN dot END) AS dot_1,
       |    MAX(CASE WHEN i = 2 THEN dot END) AS dot_2,
       |    MAX(CASE WHEN i = 3 THEN dot END) AS dot_3
       |  FROM dots)
       |SELECT ns.n_r, ns.n_s, ex.exact_join_size,
       |  wide.dot_0, wide.dot_1, wide.dot_2, wide.dot_3,
       |  least(wide.dot_0, wide.dot_1, wide.dot_2, wide.dot_3) AS est_join_size,
       |  (wide.dot_0 >= ex.exact_join_size AND wide.dot_1 >= ex.exact_join_size AND
       |   wide.dot_2 >= ex.exact_join_size AND wide.dot_3 >= ex.exact_join_size) AS never_under,
       |  ((least(wide.dot_0, wide.dot_1, wide.dot_2, wide.dot_3) - ex.exact_join_size)
       |    * 1000000) // ex.exact_join_size AS overcount_ppm
       |FROM wide, ex, ns""".stripMargin
  }

  // ---------------------------------------------------------------- q279
  /** CONSISTENT-ROUTER SHOOTOUT — the three placement schemes a 100 TB
    * platform chooses between, run side by side on the same keys at
    * n = 16 → 17 buckets and certified on the SAME contract: jump
    * (expr/JumpHash — O(ln n), zero memory), rendezvous/HRW
    * (ops/Rendezvous — O(n) hashes, weighted-capable), and a
    * 4-vnode-per-bucket HASH RING (the memcached/Dynamo scheme:
    * successor vnode by 60-bit position, wraparound to the global
    * minimum). For each: bucket-load spread at both sizes, how many
    * keys move when bucket 16 joins, and the minimal-move law (every
    * mover lands on the NEW bucket — true for all three, for three
    * different structural reasons; mod-N hashing, the scheme they
    * replace, moves ~16/17 of keys and breaks the law). All three are
    * md5-replayable: the oracle re-derives jump's LCG loop
    * recursively, HRW's argmax, and the ring's filtered-successor
    * COALESCE from scratch.
    */
  def q279RouterShootout(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.events(s, dir).select(col("user_id")).distinct()
    def h60(c: Column): Column =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    // jump + HRW: direct column expressions at both sizes
    val jump = keys.select(
      lit("jump").as("router"), col("user_id"),
      expr("jump_hash(user_id, 16)").cast("long").as("b16"),
      expr("jump_hash(user_id, 17)").cast("long").as("b17"))
    val hrw = keys.select(
      lit("rendezvous").as("router"), col("user_id"),
      graft.ops.Rendezvous.assign(col("user_id"), 16).as("b16"),
      graft.ops.Rendezvous.assign(col("user_id"), 17).as("b17"))
    // ring: 4 vnodes per bucket, successor-with-wraparound
    val vnodes = s
      .range(0, 17)
      .select(col("id").as("b"))
      .crossJoin(s.range(0, 4).select(col("id").as("i")))
      .select(
        col("b"), col("i"),
        h60(concat(lit("v:"), col("b").cast("string"), lit(":"), col("i").cast("string")))
          .as("vh"))
    def ringAt(n: Int): DataFrame =
      keys
        .withColumn("kh", h60(concat(lit("k:"), col("user_id").cast("string"))))
        .crossJoin(broadcast(vnodes.where(col("b") < n)))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("vh") >= col("kh"), struct(col("vh"), col("b")))).as("ge"),
          min(struct(col("vh"), col("b"))).as("glob"))
        .select(
          col("user_id"),
          coalesce(col("ge.b"), col("glob.b")).as(s"b$n"))
    val ring = ringAt(16)
      .join(ringAt(17), Seq("user_id"))
      .select(lit("ring").as("router"), col("user_id"), col("b16"), col("b17"))
    val asg = jump.unionByName(hrw).unionByName(ring)
    val l16 = asg
      .groupBy(col("router"), col("b16")).agg(count(lit(1)).as("c"))
      .groupBy(col("router"))
      .agg(max(col("c")).as("max16"), min(col("c")).as("min16"))
    val l17 = asg
      .groupBy(col("router"), col("b17")).agg(count(lit(1)).as("c"))
      .groupBy(col("router"))
      .agg(max(col("c")).as("max17"), min(col("c")).as("min17"))
    val mv = asg
      .groupBy(col("router"))
      .agg(
        sum(when(col("b16") =!= col("b17"), 1L).otherwise(0L)).as("n_moved"),
        (sum(when(col("b16") =!= col("b17") && col("b17") =!= 16, 1L).otherwise(0L)) === 0L)
          .as("moved_only_to_new"),
        count(lit(1)).as("n_keys"))
    l16
      .join(l17, Seq("router"))
      .join(mv, Seq("router"))
      .select(
        col("router"), col("n_keys"), col("max16"), col("min16"),
        col("max17"), col("min17"), col("n_moved"), col("moved_only_to_new"))
      .orderBy(col("router"))
  }

  val q279Oracle: String =
    """WITH RECURSIVE keys AS (SELECT DISTINCT user_id FROM events),
      |params AS (SELECT CAST(unnest([16, 17]) AS BIGINT) AS n),
      |jumpw AS (
      |  SELECT k.user_id, p.n,
      |    CAST(k.user_id AS HUGEINT) AS key,
      |    CAST(-1 AS BIGINT) AS b, CAST(0 AS BIGINT) AS j
      |  FROM keys k, params p
      |  UNION ALL
      |  SELECT user_id, n,
      |    (key * 2862933555777941757 + 1) % 18446744073709551616 AS key,
      |    j AS b,
      |    CAST(trunc((j + 1) * (2147483648.0 /
      |      CAST(((key * 2862933555777941757 + 1) % 18446744073709551616)
      |           // 8589934592 + 1 AS DOUBLE))) AS BIGINT) AS j
      |  FROM jumpw WHERE j < n),
      |jumpa AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN n = 16 THEN b END) AS b16,
      |    MAX(CASE WHEN n = 17 THEN b END) AS b17
      |  FROM jumpw WHERE j >= n GROUP BY user_id),
      |shards AS (SELECT CAST(unnest(range(0, 17)) AS BIGINT) AS sh),
      |hrws AS (
      |  SELECT k.user_id, s.sh,
      |    CAST(('0x' || substr(md5(CAST(k.user_id AS VARCHAR) || ':' || CAST(s.sh AS VARCHAR)),
      |      1, 15)) AS BIGINT) AS sc
      |  FROM keys k, shards s),
      |hrwa AS (
      |  SELECT user_id,
      |    arg_max(sh, sc) FILTER (WHERE sh < 16) AS b16,
      |    arg_max(sh, sc) AS b17
      |  FROM hrws GROUP BY user_id),
      |vn AS (
      |  SELECT b.sh AS b, i.i,
      |    CAST(('0x' || substr(md5('v:' || CAST(b.sh AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)),
      |      1, 15)) AS BIGINT) AS vh
      |  FROM shards b, (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS i) i),
      |kh AS (
      |  SELECT user_id,
      |    CAST(('0x' || substr(md5('k:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS kh
      |  FROM keys),
      |ringn AS (
      |  SELECT k.user_id, p.n,
      |    COALESCE(
      |      arg_min(v.b, v.vh) FILTER (WHERE v.vh >= k.kh),
      |      arg_min(v.b, v.vh)) AS b
      |  FROM kh k, params p
      |  JOIN vn v ON v.b < p.n
      |  GROUP BY k.user_id, p.n),
      |ringa AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN n = 16 THEN b END) AS b16,
      |    MAX(CASE WHEN n = 17 THEN b END) AS b17
      |  FROM ringn GROUP BY user_id),
      |asg AS (
      |  SELECT 'jump' AS router, user_id, b16, b17 FROM jumpa
      |  UNION ALL SELECT 'rendezvous', user_id, b16, b17 FROM hrwa
      |  UNION ALL SELECT 'ring', user_id, b16, b17 FROM ringa),
      |l16 AS (
      |  SELECT router, MAX(c) AS max16, MIN(c) AS min16
      |  FROM (SELECT router, b16, CAST(COUNT(*) AS BIGINT) AS c FROM asg GROUP BY 1, 2)
      |  GROUP BY router),
      |l17 AS (
      |  SELECT router, MAX(c) AS max17, MIN(c) AS min17
      |  FROM (SELECT router, b17, CAST(COUNT(*) AS BIGINT) AS c FROM asg GROUP BY 1, 2)
      |  GROUP BY router),
      |mv AS (
      |  SELECT router,
      |    CAST(SUM(CASE WHEN b16 <> b17 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
      |    SUM(CASE WHEN b16 <> b17 AND b17 <> 16 THEN 1 ELSE 0 END) = 0 AS moved_only_to_new,
      |    CAST(COUNT(*) AS BIGINT) AS n_keys
      |  FROM asg GROUP BY router)
      |SELECT l16.router, mv.n_keys, l16.max16, l16.min16,
      |  l17.max17, l17.min17, mv.n_moved, mv.moved_only_to_new
      |FROM l16
      |JOIN l17 ON l17.router = l16.router
      |JOIN mv ON mv.router = l16.router
      |ORDER BY l16.router""".stripMargin

  // ---------------------------------------------------------------- q280
  /** L1 (LEAST-ABSOLUTE-DEVIATIONS) REGRESSION BY GRID SWEEP — the
    * robust-fit companion to q272: fit daily event count = a + b·day
    * per event type by sweeping b over an integer micro-slope grid
    * (the distributed hyperparameter-sweep shape: candidates × points
    * is one broadcast fan-out, loss is an exact integer aggregate).
    * For each candidate b, the optimal a is the DISCRETE median of
    * the residuals y − b·x (the L1 theory's exact minimizer, lower
    * order statistic — q92's interpolation-free recipe), and the loss
    * Σ|y − b·x − a| is exact in micro-units. Winner = argmin (loss,
    * b). q272's Theil–Sen slope rides along with the signed gap
    * between the two robust estimators as a MEASURED diagnostic (on a
    * 30-point noisy series they differ by up to ~0.3 counts/day —
    * they are different estimators and only agree asymptotically;
    * both engines must reproduce the exact gap). Everything
    * downstream of the daily rollup runs on a ≤(366·|grid|·types)-row
    * bounded frame.
    */
  def q280L1Regression(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables
      .events(s, dir)
      .select(col("event_type").as("t"), to_date(col("ts")).as("day"))
      .groupBy(col("t"), col("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("d", datediff(col("day"), to_date(lit("2024-01-01"))))
    // slope grid: -2e6 .. 2e6 micro-units in 5e4 steps (81 candidates)
    val grid = s.range(-40, 41).select((col("id") * 50000L).as("bu"))
    val resid = daily
      .crossJoin(broadcast(grid))
      // residual in micro-units: 1e6·c − bu·d
      .withColumn("r", lit(1000000L) * col("c") - col("bu") * col("d"))
    val wOrd = Window.partitionBy(col("t"), col("bu")).orderBy(col("r"))
    val wAll = Window.partitionBy(col("t"), col("bu"))
    val withMed = resid
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("np", count(lit(1)).over(wAll))
      .withColumn("med", max(when(col("rn") === expr("(np + 1) div 2"), col("r"))).over(wAll))
    val losses = withMed
      .groupBy(col("t"), col("bu"))
      .agg(sum(abs(col("r") - col("med"))).as("loss"), max(col("med")).as("a_u"))
    val wBest = Window.partitionBy(col("t")).orderBy(col("loss"), col("bu"))
    val best = losses
      .withColumn("rk", row_number().over(wBest))
      .where(col("rk") === 1)
      .select(col("t"), col("bu").as("b_u"), col("a_u"), col("loss"))
    val ts = q272TheilSen(s, dir).select(col("t"), col("median_slope_u"))
    best
      .join(ts, Seq("t"))
      .withColumn("slope_gap_u", col("b_u") - col("median_slope_u"))
      .orderBy(col("t"))
  }

  val q280Oracle: String =
    """WITH daily AS (
      |  SELECT event_type AS t, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |dd AS (SELECT t, day - DATE '2024-01-01' AS d, c FROM daily),
      |grid AS (SELECT CAST(unnest(range(-40, 41)) AS BIGINT) * 50000 AS bu),
      |resid AS (
      |  SELECT t, bu, 1000000 * c - bu * d AS r FROM dd, grid),
      |withmed AS (
      |  SELECT t, bu, r,
      |    row_number() OVER (PARTITION BY t, bu ORDER BY r) AS rn,
      |    COUNT(*) OVER (PARTITION BY t, bu) AS np
      |  FROM resid),
      |med AS (
      |  SELECT t, bu, MAX(CASE WHEN rn = (np + 1) // 2 THEN r END) AS med
      |  FROM withmed GROUP BY t, bu),
      |losses AS (
      |  SELECT r.t, r.bu, CAST(SUM(ABS(r.r - m.med)) AS BIGINT) AS loss,
      |    CAST(MAX(m.med) AS BIGINT) AS a_u
      |  FROM resid r JOIN med m ON m.t = r.t AND m.bu = r.bu
      |  GROUP BY r.t, r.bu),
      |best AS (
      |  SELECT t, bu AS b_u, a_u, loss,
      |    row_number() OVER (PARTITION BY t ORDER BY loss, bu) AS rk
      |  FROM losses),
      |pairs AS (
      |  SELECT a.t, ((b.c - a.c) * 1000000) // (b.d - a.d) AS slope_u, a.d AS di, b.d AS dj
      |  FROM dd a JOIN dd b ON b.t = a.t AND a.d < b.d),
      |tsr AS (
      |  SELECT t, slope_u,
      |    row_number() OVER (PARTITION BY t ORDER BY slope_u, di, dj) AS rn,
      |    COUNT(*) OVER (PARTITION BY t) AS np
      |  FROM pairs),
      |theil AS (
      |  SELECT t, CAST(MAX(CASE WHEN rn = (np + 1) // 2 THEN slope_u END) AS BIGINT)
      |    AS median_slope_u
      |  FROM tsr GROUP BY t)
      |SELECT b.t, b.b_u, b.a_u, b.loss, th.median_slope_u,
      |  b.b_u - th.median_slope_u AS slope_gap_u
      |FROM best b JOIN theil th ON th.t = b.t
      |WHERE b.rk = 1
      |ORDER BY b.t""".stripMargin

  // ---------------------------------------------------------------- q281
  /** GEOHASH ENCODE/DECODE (Niemeyer 2008, public domain) over q201's
    * micro-degree station coordinates — 8-char hashes, exact integer
    * arithmetic end to end: 20-bit lon/lat ranks via integer
    * multiply-then-div (no float quantization to flip a floor),
    * bit-interleave lon-first (the Morton pattern Layout.zValue uses,
    * lon in the odd positions), then 8×5-bit base32 chars from the
    * standard '0123456789bcdefghjkmnpqrstuvwxyz' alphabet. The
    * ROUND-TRIP law is checked through the STRING: chars are parsed
    * back via alphabet position, de-interleaved to ranks, and must
    * reproduce the encode ranks for every station (decode_ok) — plus
    * the prefix-locality property that makes geohash a join/index key:
    * stations sharing a 4-char prefix sit in the same ~0.35°×0.17°
    * cell, so per-prefix counts equal q201-style grid counts. Pure
    * map-side integer/string ops; one rollup.
    */
  def q281Geohash(s: SparkSession, dir: String): DataFrame = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    val st = Tables
      .supplier(s, dir)
      .select(col("s_suppkey").as("sk"))
      .withColumn("lat", expr("((sk * 2654435761) % 120000000) - 60000000"))
      .withColumn("lon", expr("((sk * 2246822519) % 360000000) - 180000000"))
      // 20-bit ranks: exact integer multiply-then-div
      .withColumn("lonr", expr("((lon + 180000000) * 1048576) div 360000001"))
      .withColumn("latr", expr("((lat + 90000000) * 1048576) div 180000001"))
    // interleave: bit (2j+1) = lon bit j, bit (2j) = lat bit j
    val inter = (0 until 20)
      .map(j =>
        expr(s"(((lonr div ${1L << j}) % 2) * ${1L << (2 * j + 1)}) + " +
          s"(((latr div ${1L << j}) % 2) * ${1L << (2 * j)})"))
      .reduce(_ + _)
    val hashed = st
      .withColumn("z40", inter)
      .withColumn(
        "gh",
        concat((0 until 8).map(k =>
          expr(s"substr('$alpha', CAST((z40 div ${1L << (35 - 5 * k)}) % 32 AS INT) + 1, 1)")): _*))
    // decode the STRING back: char positions → 40-bit int → ranks
    // CAST to BIGINT before the multiply: instr returns INT, and for
    // k >= 1 the 2^(35-5k) literal fits an int too, so the product
    // wraps in 32-bit (ANSI off) before the sum ever promotes — the
    // q170 widen-the-first-factor rule applies to INTs as well
    val z40back = (0 until 8)
      .map(k =>
        expr(s"(CAST(instr('$alpha', substr(gh, ${k + 1}, 1)) AS BIGINT) - 1) " +
          s"* ${1L << (35 - 5 * k)}"))
      .reduce(_ + _)
    val lonBack = (0 until 20)
      .map(j => expr(s"((__zb div ${1L << (2 * j + 1)}) % 2) * ${1L << j}"))
      .reduce(_ + _)
    val latBack = (0 until 20)
      .map(j => expr(s"((__zb div ${1L << (2 * j)}) % 2) * ${1L << j}"))
      .reduce(_ + _)
    hashed
      .withColumn("__zb", z40back)
      .withColumn("decode_ok", lonBack === col("lonr") && latBack === col("latr"))
      .groupBy(substring(col("gh"), 1, 4).as("prefix"))
      .agg(
        count(lit(1)).as("n_stations"),
        countDistinct(col("gh")).as("n_hashes"),
        (sum(when(col("decode_ok"), 1L).otherwise(0L)) === count(lit(1))).as("all_decode_ok"),
        min(col("gh")).as("min_gh"),
        max(col("gh")).as("max_gh"),
        sum(col("sk")).as("sk_sum"))
      .orderBy(col("prefix"))
  }

  val q281Oracle: String = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    val inter = (0 until 20)
      .map(j =>
        s"(((lonr // ${1L << j}) % 2) * ${1L << (2 * j + 1)}) + " +
          s"(((latr // ${1L << j}) % 2) * ${1L << (2 * j)})")
      .mkString(" + ")
    val chars = (0 until 8)
      .map(k => s"substr('$alpha', CAST((z40 // ${1L << (35 - 5 * k)}) % 32 AS INT) + 1, 1)")
      .mkString(" || ")
    val zback = (0 until 8)
      .map(k => s"(strpos('$alpha', substr(gh, ${k + 1}, 1)) - 1) * ${1L << (35 - 5 * k)}")
      .mkString(" + ")
    val lonBack = (0 until 20)
      .map(j => s"((zb // ${1L << (2 * j + 1)}) % 2) * ${1L << j}")
      .mkString(" + ")
    val latBack = (0 until 20)
      .map(j => s"((zb // ${1L << (2 * j)}) % 2) * ${1L << j}")
      .mkString(" + ")
    s"""WITH st AS (
       |  SELECT s_suppkey AS sk,
       |    ((s_suppkey * 2654435761) % 120000000) - 60000000 AS lat,
       |    ((s_suppkey * 2246822519) % 360000000) - 180000000 AS lon
       |  FROM supplier),
       |ranks AS (
       |  SELECT sk,
       |    ((lon + 180000000) * 1048576) // 360000001 AS lonr,
       |    ((lat + 90000000) * 1048576) // 180000001 AS latr
       |  FROM st),
       |zed AS (SELECT sk, lonr, latr, $inter AS z40 FROM ranks),
       |gh8 AS (SELECT sk, lonr, latr, $chars AS gh FROM zed),
       |back AS (SELECT sk, lonr, latr, gh, $zback AS zb FROM gh8),
       |dec AS (
       |  SELECT sk, gh,
       |    ($lonBack) = lonr AND ($latBack) = latr AS decode_ok
       |  FROM back)
       |SELECT substr(gh, 1, 4) AS prefix,
       |  CAST(COUNT(*) AS BIGINT) AS n_stations,
       |  CAST(COUNT(DISTINCT gh) AS BIGINT) AS n_hashes,
       |  SUM(CASE WHEN decode_ok THEN 1 ELSE 0 END) = COUNT(*) AS all_decode_ok,
       |  MIN(gh) AS min_gh,
       |  MAX(gh) AS max_gh,
       |  CAST(SUM(sk) AS BIGINT) AS sk_sum
       |FROM dec
       |GROUP BY prefix
       |ORDER BY prefix""".stripMargin
  }

  // ---------------------------------------------------------------- q282
  /** MARKOV STATIONARY DISTRIBUTION of the event-type transition chain
    * — the PageRank-without-links view of user behavior (Kemeny–Snell
    * finite Markov chains): per-user event sequences give a transition
    * count matrix M (lag window, the q98 transitions shape), and the
    * stationary mass is approximated by six power-iteration rounds
    * v·P, all in EXACT SCALED-INTEGER arithmetic: v starts at 10^12/n
    * and each term contributes (v_i · M_ij) div rowsum_i — integer
    * multiply-then-floor-div, the q201 exact-integer discipline, so no
    * float ever enters and both engines replay bit-identically. The
    * heavy work is ONE shuffle (the lag window + pair count over all
    * events); the 6 iteration rounds run on the |event types|-row state
    * frame against the broadcast matrix — bounded model state, the
    * 100 TB shape (at scale M is tiny regardless of corpus size).
    */
  def q282MarkovStationary(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = ev
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev").as("i"), col("event_type").as("j"))
      .agg(count(lit(1)).as("cnt"))
    val rowsum = trans.groupBy(col("i")).agg(sum(col("cnt")).as("rs"))
    val m = broadcast(trans.join(rowsum, Seq("i")))
    val states = ev.select(col("event_type").as("i")).distinct()
    val nStates = states.agg(count(lit(1)).as("n"))
    var v = states
      .crossJoin(broadcast(nStates))
      .select(col("i"), expr("1000000000000 div n").as("v"))
    for (_ <- 1 to 6) {
      v = v
        .join(m, Seq("i"))
        .select(col("j"), expr("(v * cnt) div rs").as("contrib"))
        .groupBy(col("j"))
        .agg(sum(col("contrib")).as("v"))
        .withColumnRenamed("j", "i")
    }
    val emp = trans.groupBy(col("j")).agg(sum(col("cnt")).as("n_in")).withColumnRenamed("j", "i")
    v.join(rowsum, Seq("i"))
      .join(emp, Seq("i"))
      .select(
        col("i").as("event_type"),
        col("v").as("pi_scaled"),
        col("rs").as("n_out"),
        col("n_in"))
      .orderBy(col("event_type"))
  }

  val q282Oracle: String = {
    val iters = (1 to 6)
      .map { t =>
        s"""v$t AS (
           |  SELECT m.j AS i, CAST(SUM((v${t - 1}.v * m.cnt) // rs.rs) AS BIGINT) AS v
           |  FROM v${t - 1} JOIN m ON m.i = v${t - 1}.i JOIN rs ON rs.i = v${t - 1}.i
           |  GROUP BY m.j)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH seq AS (
       |  SELECT event_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |m AS (
       |  SELECT prev AS i, event_type AS j, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
       |rs AS (SELECT i, CAST(SUM(cnt) AS BIGINT) AS rs FROM m GROUP BY i),
       |states AS (SELECT DISTINCT event_type AS i FROM events),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM states),
       |v0 AS (SELECT i, 1000000000000 // n.n AS v FROM states, n),
       |$iters,
       |emp AS (SELECT j AS i, CAST(SUM(cnt) AS BIGINT) AS n_in FROM m GROUP BY j)
       |SELECT v6.i AS event_type, v6.v AS pi_scaled, rs.rs AS n_out, emp.n_in
       |FROM v6 JOIN rs ON rs.i = v6.i JOIN emp ON emp.i = v6.i
       |ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------- q283
  /** BORŮVKA MINIMUM SPANNING FOREST (ops/Boruvka — per-component
    * min-incident-edge rounds + large-star/small-star contraction, the
    * O(log n)-round parallel MST) over the undirected block graph with
    * md5-derived 48-bit edge weights. Selection minimizes the TOTAL
    * ORDER (w, src, dst), so the forest is the unique
    * lexicographic-Kruskal MSF — and the oracle is GROUND TRUTH, not a
    * replay: the cut/cycle property says an edge is in that MSF iff
    * its endpoints are NOT connected by strictly-smaller edges, which
    * the oracle checks per edge with a recursive closure over the
    * lighter-edge subgraph (the q277 ground-truth posture). Rolled up
    * per 30-block bucket with the forest law |E| = |V| − |components|
    * pinned as a column.
    */
  private def weightedBlockGraph(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.customer(s, dir).select(col("c_custkey").as("k"))
    keys
      .withColumn("d", explode(array(lit(1L), lit(2L))))
      .withColumn("v", col("k") + col("d"))
      .where(expr("(k div 10) = (v div 10)"))
      .join(keys.withColumnRenamed("k", "v"), Seq("v"), "left_semi")
      .select(col("k").as("src"), col("v").as("dst"))
      .withColumn(
        "w",
        expr("CAST(conv(substr(md5(concat(CAST(src AS STRING), '-', CAST(dst AS STRING))), 1, 12), 16, 10) AS BIGINT)"))
  }

  private val WeightedBlockGraphSql: String =
    """SELECT cand.k AS src, cand.v AS dst,
      |  CAST(('0x' || substr(md5(cand.k || '-' || cand.v), 1, 12)) AS BIGINT) AS w
      |FROM (SELECT k.c_custkey AS k, k.c_custkey + d.d AS v
      |      FROM customer k, (SELECT unnest([1, 2]) AS d) d
      |      WHERE (k.c_custkey // 10) = ((k.c_custkey + d.d) // 10)) cand
      |JOIN customer k2 ON k2.c_custkey = cand.v""".stripMargin

  def q283BoruvkaMsf(s: SparkSession, dir: String): DataFrame = {
    val msf = graft.ops.Boruvka.forest(weightedBlockGraph(s, dir), rounds = 4)
    val keys = Tables.customer(s, dir).select(col("c_custkey").as("k"))
    val nodeRoll = keys
      .groupBy(expr("(k div 10) div 30").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"), countDistinct(expr("k div 10")).as("n_blocks"))
    val edgeRoll = msf
      .groupBy(expr("(src div 10) div 30").as("bucket"))
      .agg(count(lit(1)).as("n_edges"), sum(col("w")).as("w_sum"))
    nodeRoll
      .join(edgeRoll, Seq("bucket"), "left")
      .select(
        col("bucket"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        coalesce(col("w_sum"), lit(0L)).as("w_sum"),
        col("n_blocks"),
        col("n_nodes"),
        (coalesce(col("n_edges"), lit(0L)) === col("n_nodes") - col("n_blocks")).as("tree_ok"))
      .orderBy(col("bucket"))
  }

  val q283Oracle: String =
    s"""WITH RECURSIVE e AS (
       |$WeightedBlockGraphSql
       |), eid AS (
       |  SELECT row_number() OVER (ORDER BY w, src, dst) AS rk, src, dst, w FROM e
       |), reach(rk, node) AS (
       |  SELECT rk, src FROM eid
       |  UNION
       |  SELECT r.rk, CASE WHEN f.src = r.node THEN f.dst ELSE f.src END
       |  FROM reach r JOIN eid f
       |    ON f.rk < r.rk AND (f.src = r.node OR f.dst = r.node)
       |), msf AS (
       |  SELECT ed.src, ed.dst, ed.w FROM eid ed
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM reach r WHERE r.rk = ed.rk AND r.node = ed.dst)
       |), noderoll AS (
       |  SELECT (c_custkey // 10) // 30 AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |    CAST(COUNT(DISTINCT c_custkey // 10) AS BIGINT) AS n_blocks
       |  FROM customer GROUP BY 1
       |), edgeroll AS (
       |  SELECT (src // 10) // 30 AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS n_edges,
       |    CAST(SUM(w) AS BIGINT) AS w_sum
       |  FROM msf GROUP BY 1)
       |SELECT n.bucket,
       |  COALESCE(e2.n_edges, 0) AS n_edges,
       |  COALESCE(e2.w_sum, 0) AS w_sum,
       |  n.n_blocks, n.n_nodes,
       |  COALESCE(e2.n_edges, 0) = n.n_nodes - n.n_blocks AS tree_ok
       |FROM noderoll n LEFT JOIN edgeroll e2 ON e2.bucket = n.bucket
       |ORDER BY n.bucket""".stripMargin

  // ---------------------------------------------------------------- q284
  /** TEMPORAL (TIME-RESPECTING) REACHABILITY (ops/Temporal —
    * earliest-arrival relaxation under strictly-increasing edge times,
    * Holme–Saramäki semantics) on the directed block graph with
    * deterministic edge times t = (7·src + 13·dst) mod 12, seeded at
    * the min node of every 4th block. Static reachability would flood
    * each seeded block; the temporal constraint prunes paths whose
    * next edge fires too early, so reached-counts measure genuine
    * time-respecting influence. The oracle is GROUND TRUTH: a
    * recursive (node, time) closure — every temporally-valid arrival —
    * min-folded per node, proving the 12-round DP fixpoint exact on
    * this graph (path length ≤ |time domain| because times strictly
    * increase). Seeds carry arrival −1 by contract and are counted in
    * arrival_sum as such.
    */
  def q284TemporalReach(s: SparkSession, dir: String): DataFrame = {
    val e = directedBlockGraph(s, dir)
      .withColumn("t", expr("(src * 7 + dst * 13) % 12"))
    val seeds = Tables
      .customer(s, dir)
      .groupBy(expr("c_custkey div 10").as("blk"))
      .agg(min(col("c_custkey")).as("node"))
      .where(col("blk") % 4 === 0)
      .select(col("node"))
    val arr = graft.ops.Temporal.earliestArrival(e, seeds, rounds = 12)
    Tables
      .customer(s, dir)
      .select(col("c_custkey").as("node"))
      .join(arr, Seq("node"), "left")
      .groupBy(expr("node div 500").as("bucket"))
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(when(col("arrival").isNotNull, 1L).otherwise(0L)).as("n_reached"),
        coalesce(sum(col("arrival")), lit(0L)).as("arrival_sum"),
        coalesce(max(col("arrival")), lit(-99L)).as("max_arrival"))
      .orderBy(col("bucket"))
  }

  val q284Oracle: String =
    s"""WITH RECURSIVE e AS (
       |  SELECT src, dst, (src * 7 + dst * 13) % 12 AS t FROM (
       |$DirectedBlockGraphSql
       |  )
       |), seeds AS (
       |  SELECT MIN(c_custkey) AS node FROM customer
       |  GROUP BY c_custkey // 10 HAVING (c_custkey // 10) % 4 = 0
       |), reach(node, at_t) AS (
       |  SELECT node, CAST(-1 AS BIGINT) FROM seeds
       |  UNION
       |  SELECT e.dst, CAST(e.t AS BIGINT) FROM reach r
       |  JOIN e ON e.src = r.node AND e.t > r.at_t
       |), arr AS (
       |  SELECT node, MIN(at_t) AS arrival FROM reach GROUP BY node)
       |SELECT c.c_custkey // 500 AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  CAST(SUM(CASE WHEN a.arrival IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_reached,
       |  CAST(COALESCE(SUM(a.arrival), 0) AS BIGINT) AS arrival_sum,
       |  CAST(COALESCE(MAX(a.arrival), -99) AS BIGINT) AS max_arrival
       |FROM customer c LEFT JOIN arr a ON a.node = c.c_custkey
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q285
  /** DETERMINISTIC RANDOM-WALK CORPUS (ops/Walks — the DeepWalk/
    * node2vec input generator with md5-replayable choices): 8-step
    * walks from every even block's min node over the directed block
    * graph, each step taking the out-neighbor minimizing
    * md5(node:step:dst) — pseudo-random transition, bit-identical
    * replay (the q221 seeded-sampling posture). The argmin is encoded
    * as min(md5 ‖ zero-padded dst) so Spark's aggregate and the SQL
    * replay share ONE string total order. Visit statistics rolled up
    * per 500-key bucket: corpus size, walk endpoints, distinct nodes
    * touched, distinct walkers through the bucket.
    */
  def q285RandomWalks(s: SparkSession, dir: String): DataFrame = {
    val starts = Tables
      .customer(s, dir)
      .groupBy(expr("c_custkey div 10").as("blk"))
      .agg(min(col("c_custkey")).as("node"))
      .where(col("blk") % 2 === 0)
      .select(col("node"))
    val corpus =
      graft.ops.Walks.deterministicWalks(directedBlockGraph(s, dir), starts, steps = 8)
    corpus
      .groupBy(expr("node div 500").as("bucket"))
      .agg(
        count(lit(1)).as("n_visits"),
        sum(when(col("step") === 8, 1L).otherwise(0L)).as("n_ends"),
        countDistinct(col("node")).as("n_distinct_nodes"),
        countDistinct(col("walker")).as("n_walkers"))
      .orderBy(col("bucket"))
  }

  val q285Oracle: String = {
    val steps = (1 to 8)
      .map { t =>
        s"""w$t AS (
           |  SELECT w.walker, COALESCE(c.nxt, w.node) AS node
           |  FROM w${t - 1} w LEFT JOIN (
           |    SELECT w2.walker,
           |      CAST(substr(MIN(md5(w2.node || ':' || $t || ':' || e.dst) ||
           |        lpad(CAST(e.dst AS VARCHAR), 14, '0')), 33, 14) AS BIGINT) AS nxt
           |    FROM w${t - 1} w2 JOIN e ON e.src = w2.node
           |    GROUP BY w2.walker) c ON c.walker = w.walker)""".stripMargin
      }
      .mkString(",\n")
    val corpus = (0 to 8)
      .map(t => s"SELECT walker, $t AS step, node FROM w$t")
      .mkString("\n  UNION ALL ")
    s"""WITH e AS (
       |$DirectedBlockGraphSql
       |), starts AS (
       |  SELECT MIN(c_custkey) AS node FROM customer
       |  GROUP BY c_custkey // 10 HAVING (c_custkey // 10) % 2 = 0
       |), w0 AS (SELECT node AS walker, node FROM starts),
       |$steps,
       |corpus AS (
       |  $corpus)
       |SELECT node // 500 AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_visits,
       |  CAST(SUM(CASE WHEN step = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends,
       |  CAST(COUNT(DISTINCT node) AS BIGINT) AS n_distinct_nodes,
       |  CAST(COUNT(DISTINCT walker) AS BIGINT) AS n_walkers
       |FROM corpus
       |GROUP BY 1
       |ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q286
  /** CONTENT-DEFINED CHUNKING + CHUNK-LEVEL DEDUP (ops/Cdc — the
    * LBFS/rsync boundary rule: a chunk closes after position p iff
    * md5 of the 8-char window ending at p hash-selects mod 32).
    * Insertion-stable boundaries make REGION-level duplication visible
    * across documents — the dedup granularity between whole-doc
    * fingerprints (q23) and shingle spans (q80). Per-source rollup:
    * chunk counts, distinct chunk identities, duplicated-chunk ppm,
    * and the exact-cover law Σ chunk_len = Σ length(text) pinned as a
    * column (every byte in exactly one chunk). Position explode is
    * map-side; the only shuffle is the per-doc boundary window — keyed
    * by doc, never global.
    */
  def q286CdcChunking(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val ch = graft.ops.Cdc.chunks(docs, "doc_id", "text", w = 8, modulus = 32)
    val bySrc = ch
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_chunks"),
        countDistinct(col("chunk_hash")).as("n_distinct"),
        sum(col("chunk_len")).as("len_sum"),
        max(col("chunk_len")).as("max_len"),
        countDistinct(col("doc_id")).as("n_docs"))
    val txt = docs.groupBy(col("source")).agg(sum(length(col("text"))).as("text_len"))
    bySrc
      .join(txt, Seq("source"))
      .withColumn("dup_ppm", expr("((n_chunks - n_distinct) * 1000000) div n_chunks"))
      .withColumn("len_ok", col("len_sum") === col("text_len"))
      .orderBy(col("source"))
  }

  val q286Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) >= 1),
      |pos AS (SELECT doc_id, unnest(generate_series(8, n)) AS p FROM d),
      |b AS (
      |  SELECT pos.doc_id, pos.p FROM pos JOIN d USING (doc_id)
      |  WHERE CAST(('0x' || substr(md5(substr(d.text, pos.p - 7, 8)), 1, 8)) AS BIGINT) % 32 = 0),
      |wt AS (SELECT doc_id, p FROM b UNION SELECT doc_id, n FROM d),
      |sp AS (
      |  SELECT doc_id, p,
      |    COALESCE(lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 1, 1) AS start
      |  FROM wt),
      |ch AS (
      |  SELECT sp.doc_id, sp.start, sp.p - sp.start + 1 AS chunk_len,
      |    md5(substr(d.text, sp.start, sp.p - sp.start + 1)) AS chunk_hash
      |  FROM sp JOIN d USING (doc_id)),
      |roll AS (
      |  SELECT doc.source,
      |    CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |    CAST(COUNT(DISTINCT chunk_hash) AS BIGINT) AS n_distinct,
      |    CAST(SUM(chunk_len) AS BIGINT) AS len_sum,
      |    CAST(MAX(chunk_len) AS BIGINT) AS max_len,
      |    CAST(COUNT(DISTINCT ch.doc_id) AS BIGINT) AS n_docs
      |  FROM ch JOIN documents doc USING (doc_id) GROUP BY 1),
      |txt AS (
      |  SELECT source, CAST(SUM(length(text)) AS BIGINT) AS text_len
      |  FROM documents GROUP BY 1)
      |SELECT roll.source, n_chunks, n_distinct, len_sum, max_len, n_docs, text_len,
      |  ((n_chunks - n_distinct) * 1000000) // n_chunks AS dup_ppm,
      |  len_sum = text_len AS len_ok
      |FROM roll JOIN txt USING (source)
      |ORDER BY roll.source""".stripMargin

  // ---------------------------------------------------------------- q287
  /** POINT-IN-POLYGON via ray casting (the even–odd crossing rule,
    * Shimrat CACM'62 / Franklin's PNPOLY) in EXACT INTEGER arithmetic:
    * the half-open edge gate (y1 > py) ≠ (y2 > py) plus the
    * cross-multiplied intersection test (px−x1)(y2−y1) ⋚ (py−y1)(x2−x1)
    * — division-free, so both engines evaluate the identical int64
    * predicate and parity is bit-stable (the q201 exact-geometry
    * discipline, extended from radius circles to arbitrary, including
    * CONCAVE, polygons — the geofencing primitive a spatial pipeline
    * needs beyond distance joins). Points are md5-free deterministic
    * customer projections; the 12-row edge table is broadcast, so the
    * plan is one map-side fan-out (|points|·|edges| rows, edges
    * constant) + one (point, polygon) parity aggregate — no shuffle
    * grows with polygon count, the 100 TB shape for a fixed fence set.
    */
  private val PolygonEdges: Seq[(Long, Long, Long, Long, Long)] = {
    val polys = Seq(
      1L -> Seq((100L, 100L), (800L, 150L), (400L, 700L)),
      2L -> Seq((200L, 200L), (900L, 250L), (500L, 500L), (850L, 800L), (150L, 750L)),
      3L -> Seq((50L, 400L), (950L, 420L), (930L, 900L), (60L, 880L))
    )
    polys.flatMap { case (pid, vs) =>
      vs.indices.map { i =>
        val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.size)
        (pid, x1, y1, x2, y2)
      }
    }
  }

  /** The shared crossing predicate — one SQL text evaluated verbatim by
    * both engines over columns (px, py, x1, y1, x2, y2). */
  private val CrossingSql: String =
    """CASE WHEN (y1 > py) <> (y2 > py) THEN
      |  CASE WHEN y2 > y1
      |    THEN (CASE WHEN (px - x1) * (y2 - y1) < (py - y1) * (x2 - x1) THEN 1 ELSE 0 END)
      |    ELSE (CASE WHEN (px - x1) * (y2 - y1) > (py - y1) * (x2 - x1) THEN 1 ELSE 0 END)
      |  END
      |ELSE 0 END""".stripMargin

  def q287PointInPolygon(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = PolygonEdges.toDF("poly_id", "x1", "y1", "x2", "y2")
    val pts = Tables
      .customer(s, dir)
      .select(
        col("c_custkey").as("k"),
        expr("(c_custkey * 37) % 1000").as("px"),
        expr("(c_custkey * 73) % 1000").as("py"))
    val parity = pts
      .crossJoin(broadcast(edges))
      .withColumn("cr", expr(CrossingSql))
      .groupBy(col("poly_id"), col("k"))
      .agg(sum(col("cr")).as("crossings"))
      .withColumn("inside", col("crossings") % 2 === 1)
    parity
      .groupBy(col("poly_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(when(col("inside"), 1L).otherwise(0L)).as("n_inside"),
        sum(when(col("inside"), col("k")).otherwise(0L)).as("inside_idsum"))
      .withColumn("inside_ppm", expr("(n_inside * 1000000) div n_points"))
      .orderBy(col("poly_id"))
  }

  val q287Oracle: String = {
    val edgeRows = PolygonEdges
      .map { case (pid, x1, y1, x2, y2) => s"($pid, $x1, $y1, $x2, $y2)" }
      .mkString(",\n    ")
    s"""WITH edges(poly_id, x1, y1, x2, y2) AS (VALUES
       |    $edgeRows),
       |pts AS (
       |  SELECT c_custkey AS k, (c_custkey * 37) % 1000 AS px,
       |         (c_custkey * 73) % 1000 AS py
       |  FROM customer),
       |parity AS (
       |  SELECT poly_id, k, SUM(
       |$CrossingSql
       |  ) AS crossings
       |  FROM pts CROSS JOIN edges
       |  GROUP BY 1, 2)
       |SELECT CAST(poly_id AS BIGINT) AS poly_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_points,
       |  CAST(SUM(CASE WHEN crossings % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
       |  CAST(SUM(CASE WHEN crossings % 2 = 1 THEN k ELSE 0 END) AS BIGINT) AS inside_idsum,
       |  (CAST(SUM(CASE WHEN crossings % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
       |    // CAST(COUNT(*) AS BIGINT) AS inside_ppm
       |FROM parity
       |GROUP BY poly_id
       |ORDER BY poly_id""".stripMargin
  }

  // ---------------------------------------------------------------- q288
  /** RESOURCE-ALLOCATION LINK PREDICTION (Zhou–Lü–Zhang EPJ B 2009 —
    * the exact-rational sibling of Adamic–Adar: common-neighbor score
    * Σ 1/deg(z) instead of Σ 1/log deg(z), chosen because 1/deg is
    * replayable as scaled-integer division while log is transcendental)
    * over the bipartite customer–part graph (parts scale WITH the
    * corpus — per-part degree stays ~30 at every SF, unlike suppliers
    * whose fixed small count makes every posting a hub). Candidate
    * pairs are generated by the INVERTED POSTINGS self-join keyed on
    * the shared part — never |C|², and the q112 df-cap discipline
    * bounds the hot posting: parts with more than 30 distinct buyers
    * are excluded from SCORING (a hub shared by everyone carries ~zero
    * link-prediction signal anyway — the TF-IDF argument in graph
    * form), making candidate volume Σ min(deg,30)² ≤ 30·|E|, linear in
    * edges. One shuffle on the part key, one on the pair key;
    * top-50 by the (score, pair) total order via TakeOrderedAndProject.
    */
  def q288LinkPrediction(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey").as("c"))
      .join(
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey").as("p")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("c"), col("p"))
      .distinct()
    val deg = e.groupBy(col("p")).agg(count(lit(1)).as("deg"))
    val small = e.join(deg.where(col("deg") <= 30), Seq("p"))
    small
      .select(col("p"), col("c").as("ca"), col("deg"))
      .join(small.select(col("p"), col("c").as("cb")), Seq("p"))
      .where(col("ca") < col("cb"))
      .groupBy(col("ca"), col("cb"))
      .agg(
        count(lit(1)).as("n_common"),
        sum(expr("1000000000000 div deg")).as("ra_score"))
      .orderBy(col("ra_score").desc, col("ca"), col("cb"))
      .limit(50)
  }

  val q288Oracle: String =
    """WITH e AS (
      |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY p),
      |small AS (SELECT e.c, e.p, deg.deg FROM e JOIN deg USING (p) WHERE deg.deg <= 30)
      |SELECT a.c AS ca, b.c AS cb,
      |  CAST(COUNT(*) AS BIGINT) AS n_common,
      |  CAST(SUM(1000000000000 // a.deg) AS BIGINT) AS ra_score
      |FROM small a JOIN small b ON a.p = b.p AND a.c < b.c
      |GROUP BY 1, 2
      |ORDER BY ra_score DESC, ca, cb
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q289
  /** PERSONALIZED PAGERANK with restart (Jeh–Widom WWW'03 — random
    * walk that teleports back to the SEED set, the node-proximity
    * measure behind recommendation candidate generation and Pregel-PPR)
    * on the directed block graph, in exact scaled-integer arithmetic:
    * seed mass 10^12, per-round share = v div outdeg at the edge,
    * damped inflow = (Σ shares · 85) div 100, teleport re-adds
    * 0.15·10^12 at each seed — every operation integer
    * multiply-then-floor-div, so six rounds replay bit-identically in
    * the unrolled-CTE oracle (q282's discipline, plus teleport and
    * direction). Dangling-node mass leaks by design (strictly-damped
    * PPR); what remains after 6 rounds measures genuine seed proximity.
    * Per round: one src-equi join + one dst-keyed aggregate, lineage
    * cut per round; the rollup buckets mass per 500-key range.
    */
  def q289Ppr(s: SparkSession, dir: String): DataFrame = {
    val e = directedBlockGraph(s, dir)
    val od = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val seeds = Tables
      .customer(s, dir)
      .groupBy(expr("c_custkey div 10").as("blk"))
      .agg(min(col("c_custkey")).as("node"))
      .where(col("blk") % 5 === 0)
      .select(col("node"))
    var v = seeds.withColumn("v", lit(1000000000000L))
    for (_ <- 1 to 6) {
      val inflow = e
        .join(v.withColumnRenamed("node", "src"), Seq("src"))
        .join(od, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("v div od")).as("inflow"))
      v = graft.ops.Checkpoints.cut(
        inflow
          .select(col("node"), expr("(inflow * 85) div 100").as("va"))
          .unionByName(seeds.select(col("node"), lit(150000000000L).as("va")))
          .groupBy(col("node"))
          .agg(sum(col("va")).as("v")))
    }
    v.groupBy(expr("node div 500").as("bucket"))
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(col("v")).as("v_sum"),
        max(col("v")).as("v_max"))
      .orderBy(col("bucket"))
  }

  val q289Oracle: String = {
    val rounds = (1 to 6)
      .map { t =>
        s"""v$t AS MATERIALIZED (
           |  SELECT node, CAST(SUM(va) AS BIGINT) AS v FROM (
           |    SELECT inflow.node, (inflow.infl * 85) // 100 AS va FROM (
           |      SELECT e.dst AS node, CAST(SUM(v${t - 1}.v // od.od) AS BIGINT) AS infl
           |      FROM v${t - 1}
           |      JOIN e ON e.src = v${t - 1}.node
           |      JOIN od ON od.src = v${t - 1}.node
           |      GROUP BY e.dst) inflow
           |    UNION ALL
           |    SELECT node, CAST(150000000000 AS BIGINT) AS va FROM seeds)
           |  GROUP BY node)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |$DirectedBlockGraphSql
       |), od AS MATERIALIZED (
       |  SELECT src, CAST(COUNT(*) AS BIGINT) AS od FROM e GROUP BY src),
       |seeds AS MATERIALIZED (
       |  SELECT MIN(c_custkey) AS node FROM customer
       |  GROUP BY c_custkey // 10 HAVING (c_custkey // 10) % 5 = 0),
       |v0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS v FROM seeds),
       |$rounds
       |SELECT node // 500 AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  CAST(SUM(v) AS BIGINT) AS v_sum,
       |  CAST(MAX(v) AS BIGINT) AS v_max
       |FROM v6
       |GROUP BY 1
       |ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q290
  /** LARGEST-REMAINDER (Hamilton) STRATIFIED ALLOCATION — split a fixed
    * sample budget N across strata proportional to population, the
    * apportionment rule a training-data pipeline uses to draw a
    * source-balanced subsample with an EXACT total (naive rounding
    * misses N by up to |strata|/2). base = ⌊N·cnt/total⌋ leaves
    * N − Σbase seats; the strata with the largest division REMAINDERS
    * (ties broken by the stratum key — fully deterministic) each get
    * one. Two laws are pinned as columns: Σ alloc = N exactly, and the
    * quota property |alloc·total − N·cnt| < total (each stratum within
    * one seat of its exact share — cross-multiplied, division-free).
    * The stratum frame is ≤ |nations|·|segments| rows regardless of
    * corpus size — bounded model state, so the global windows here are
    * the 100 TB plan too.
    */
  def q290Allocation(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = 10000L
    val strata = Tables
      .customer(s, dir)
      .groupBy(col("c_nationkey").cast("long").as("nation"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("cnt"))
    val all = Window.partitionBy(lit(0))
    val byRem = Window
      .partitionBy(lit(0))
      .orderBy(col("rem").desc, col("nation"), col("segment"))
    strata
      .withColumn("total", sum(col("cnt")).over(all))
      .withColumn("base", expr(s"($n * cnt) div total"))
      .withColumn("rem", expr(s"($n * cnt) % total"))
      .withColumn("extra", lit(n) - sum(col("base")).over(all))
      .withColumn("rk", row_number().over(byRem))
      .withColumn("alloc", col("base") + when(col("rk") <= col("extra"), 1L).otherwise(0L))
      .withColumn("sum_ok", sum(col("alloc")).over(all) === n)
      .withColumn("quota_ok", abs(col("alloc") * col("total") - lit(n) * col("cnt")) < col("total"))
      .select(
        col("nation"), col("segment"), col("cnt"), col("base"), col("rem"),
        col("alloc"), col("sum_ok"), col("quota_ok"))
      .orderBy(col("nation"), col("segment"))
  }

  val q290Oracle: String =
    """WITH strata AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM customer GROUP BY 1, 2),
      |w AS (
      |  SELECT nation, segment, cnt,
      |    CAST(SUM(cnt) OVER () AS BIGINT) AS total,
      |    CAST((10000 * cnt) // CAST(SUM(cnt) OVER () AS BIGINT) AS BIGINT) AS base,
      |    CAST((10000 * cnt) % CAST(SUM(cnt) OVER () AS BIGINT) AS BIGINT) AS rem
      |  FROM strata),
      |r AS (
      |  SELECT *,
      |    CAST(10000 - SUM(base) OVER () AS BIGINT) AS extra,
      |    ROW_NUMBER() OVER (ORDER BY rem DESC, nation, segment) AS rk
      |  FROM w),
      |a AS (
      |  SELECT nation, segment, cnt, total, base, rem,
      |    CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT) AS alloc
      |  FROM r)
      |SELECT nation, segment, cnt, base, rem, alloc,
      |  CAST(SUM(alloc) OVER () AS BIGINT) = 10000 AS sum_ok,
      |  ABS(alloc * total - 10000 * cnt) < total AS quota_ok
      |FROM a
      |ORDER BY nation, segment""".stripMargin

  // ---------------------------------------------------------------- q291
  /** DECISION-STUMP TRAINING (the 1R / single-split learner — Holte
    * ML'93 measured it within a few points of full trees; also the weak
    * learner inside AdaBoost): per order-status group, learn the best
    * single threshold on the price axis for predicting URGENT priority.
    * The search is EXHAUSTIVE yet one-pass: bucket the feature
    * (⌊price/1000⌋ — floor() then cast, never the q212 double→int cast
    * trap), build the per-(group, bucket) class histogram, and the
    * ordered prefix sums give BOTH direction rules' error counts at
    * every threshold simultaneously — err≤(t) = FP + FN =
    * negCum(t) + (posTot − posCum(t)), err>(t) its mirror. The argmin
    * over (err, dir, t) is a min-struct fold, deterministic under ties.
    * Histogram size is bounded by the price domain (~600 buckets per
    * group) regardless of row count — the per-group window is bounded
    * model state, the 100 TB shape; the corpus-sized work is ONE
    * scan + one hash aggregate. The oracle RE-TRAINS the stump from
    * scratch (q128's re-train posture, not literal replay).
    */
  def q291DecisionStump(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables
      .orders(s, dir)
      .select(
        col("o_orderstatus").as("status"),
        expr("CAST(floor(o_totalprice / 1000) AS BIGINT)").as("bucket"),
        when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L).as("pos"))
    val hist = o
      .groupBy(col("status"), col("bucket"))
      .agg(sum(col("pos")).as("pos_cnt"), sum(lit(1L) - col("pos")).as("neg_cnt"))
    val byBucket = Window
      .partitionBy(col("status"))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("status"))
    val scored = hist
      .withColumn("pos_cum", sum(col("pos_cnt")).over(byBucket))
      .withColumn("neg_cum", sum(col("neg_cnt")).over(byBucket))
      .withColumn("pos_tot", sum(col("pos_cnt")).over(tot))
      .withColumn("neg_tot", sum(col("neg_cnt")).over(tot))
      .withColumn("err_le", col("neg_cum") + col("pos_tot") - col("pos_cum"))
      .withColumn("err_gt", col("pos_cum") + col("neg_tot") - col("neg_cum"))
    val cand = scored
      .select(col("status"), (col("pos_tot") + col("neg_tot")).as("n_total"),
        struct(col("err_le").as("err"), lit(0L).as("dir"), col("bucket")).as("c"))
      .unionByName(scored.select(
        col("status"), (col("pos_tot") + col("neg_tot")).as("n_total"),
        struct(col("err_gt").as("err"), lit(1L).as("dir"), col("bucket")).as("c")))
    cand
      .groupBy(col("status"))
      .agg(max(col("n_total")).as("n_total"), min(col("c")).as("best"))
      .select(
        col("status"),
        col("n_total"),
        col("best.err").as("best_err"),
        col("best.dir").as("best_dir"),
        col("best.bucket").as("best_threshold"))
      .withColumn("acc_ppm", expr("((n_total - best_err) * 1000000) div n_total"))
      .orderBy(col("status"))
  }

  val q291Oracle: String =
    """WITH o AS (
      |  SELECT o_orderstatus AS status,
      |    CAST(floor(o_totalprice / 1000) AS BIGINT) AS bucket,
      |    CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS pos
      |  FROM orders),
      |hist AS (
      |  SELECT status, bucket,
      |    CAST(SUM(pos) AS BIGINT) AS pos_cnt,
      |    CAST(SUM(1 - pos) AS BIGINT) AS neg_cnt
      |  FROM o GROUP BY 1, 2),
      |scored AS (
      |  SELECT status, bucket,
      |    SUM(pos_cnt) OVER (PARTITION BY status ORDER BY bucket
      |      ROWS UNBOUNDED PRECEDING) AS pos_cum,
      |    SUM(neg_cnt) OVER (PARTITION BY status ORDER BY bucket
      |      ROWS UNBOUNDED PRECEDING) AS neg_cum,
      |    SUM(pos_cnt) OVER (PARTITION BY status) AS pos_tot,
      |    SUM(neg_cnt) OVER (PARTITION BY status) AS neg_tot
      |  FROM hist),
      |cand AS (
      |  SELECT status, pos_tot + neg_tot AS n_total,
      |    neg_cum + pos_tot - pos_cum AS err, 0 AS dir, bucket FROM scored
      |  UNION ALL
      |  SELECT status, pos_tot + neg_tot AS n_total,
      |    pos_cum + neg_tot - neg_cum AS err, 1 AS dir, bucket FROM scored),
      |best AS (
      |  SELECT status, n_total, err, dir, bucket,
      |    ROW_NUMBER() OVER (PARTITION BY status ORDER BY err, dir, bucket) AS rk
      |  FROM cand)
      |SELECT status, CAST(n_total AS BIGINT) AS n_total,
      |  CAST(err AS BIGINT) AS best_err,
      |  CAST(dir AS BIGINT) AS best_dir,
      |  CAST(bucket AS BIGINT) AS best_threshold,
      |  CAST(((n_total - err) * 1000000) // n_total AS BIGINT) AS acc_ppm
      |FROM best WHERE rk = 1
      |ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q292
  /** SINGLE-LINK CLUSTERING VIA THE MINIMUM SPANNING FOREST — the
    * dendrogram identity behind SLINK/HAC: cutting the MSF at threshold
    * τ yields EXACTLY the connected components of the τ-thresholded
    * graph (an MSF edge < τ connects them; any non-MSF edge < τ closes
    * a cycle whose MSF path is all < that edge). At 100 TB this is the
    * whole point of [[graft.ops.Boruvka]]: cluster at ANY τ from the
    * n−1-edge forest instead of re-closing the full edge set per
    * threshold. One [[graft.ops.Boruvka.forestWithLabels]] pass over
    * the tau-thresholded edges yields the thresholded MSF AND its
    * cluster labels together (by the cut property that forest is
    * exactly the full-graph MSF's < tau edge subset - the dendrogram
    * cut); the forest law |edges| = |clustered nodes| - |clusters| is
    * pinned per bucket, and the ORACLE is ground truth - it recomputes
    * the tau-thresholded closure recursively and must agree on every
    * per-bucket label sum (the q283 posture: the law checks the
    * algorithm, never replays it).
    */
  def q292SingleLink(s: SparkSession, dir: String): DataFrame = {
    val tau = 140737488355328L // 2^47: ~half of the 48-bit weight space
    val g = weightedBlockGraph(s, dir).where(col("w") < tau)
    val (msf, lab) = graft.ops.Boruvka.forestWithLabels(g, rounds = 4)
    val viaMsf = lab.select(col("node"), col("comp").as("cluster"))
    val edgeRoll = msf
      .groupBy(expr("(src div 10) div 30").as("bucket"))
      .agg(count(lit(1)).as("n_forest_edges"))
    val keys = Tables.customer(s, dir).select(col("c_custkey").as("node"))
    keys
      .join(viaMsf, Seq("node"), "left")
      .groupBy(expr("(node div 10) div 30").as("bucket"))
      .agg(
        count(lit(1)).as("n_nodes"),
        countDistinct(col("cluster")).as("n_multi_clusters"),
        sum(when(col("cluster").isNull, 1L).otherwise(0L)).as("n_singletons"),
        coalesce(sum(col("cluster")), lit(0L)).as("label_sum"))
      .join(edgeRoll, Seq("bucket"), "left")
      .select(
        col("bucket"), col("n_nodes"), col("n_multi_clusters"), col("n_singletons"),
        col("label_sum"),
        coalesce(col("n_forest_edges"), lit(0L)).as("n_forest_edges"))
      .withColumn(
        "forest_ok",
        col("n_forest_edges") ===
          col("n_nodes") - col("n_singletons") - col("n_multi_clusters"))
      .orderBy(col("bucket"))
  }

  val q292Oracle: String =
    s"""WITH RECURSIVE g AS (
       |$WeightedBlockGraphSql
       |), thr AS (
       |  SELECT src, dst FROM g WHERE w < 140737488355328
       |), sym AS (
       |  SELECT src, dst FROM thr UNION ALL SELECT dst, src FROM thr
       |), reach(id, comp) AS (
       |  SELECT DISTINCT src, src FROM sym
       |  UNION
       |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.id
       |), lab AS (
       |  SELECT id AS node, MIN(comp) AS cluster FROM reach GROUP BY id)
       |SELECT (c.c_custkey // 10) // 30 AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  CAST(COUNT(DISTINCT lab.cluster) AS BIGINT) AS n_multi_clusters,
       |  CAST(SUM(CASE WHEN lab.cluster IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
       |  CAST(COALESCE(SUM(lab.cluster), 0) AS BIGINT) AS label_sum,
       |  CAST(COUNT(lab.cluster) - COUNT(DISTINCT lab.cluster) AS BIGINT) AS n_forest_edges,
       |  TRUE AS forest_ok
       |FROM customer c LEFT JOIN lab ON lab.node = c.c_custkey
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q293
  /** RAKE KEYWORD EXTRACTION (Rose et al. 2010 — Rapid Automatic
    * Keyword Extraction): candidate phrases are the maximal runs of
    * content words between stopword/delimiter boundaries; each word
    * scores deg(w)/freq(w) where deg(w) = Σ |phrase| over phrases
    * containing w (co-occurrence degree including self) and freq(w) its
    * occurrence count; a phrase scores the sum of its words' scores.
    * The division is the repo's exact scaled-integer form
    * (deg·10⁶ div freq), so ranks replay bit-identically. The pipeline
    * is map-side regex (stopword → '#', split, trim — NO per-row UDF) +
    * one word-keyed shuffle for scores + one join back + one
    * phrase-keyed aggregate: identical-phrase instances share one score
    * by construction, recovered exactly as Σ div n_instances. Top-20 by
    * (score, phrase) total order.
    */
  def q293Rake(s: SparkSession, dir: String): DataFrame = {
    val stop = "\\b(a|the|key|value)\\b"
    val docs = Tables.documents(s, dir)
    val phrases = docs
      .select(explode(split(regexp_replace(lower(col("text")), stop, "#"), "#")).as("rawp"))
      .select(trim(regexp_replace(col("rawp"), " +", " ")).as("phrase"))
      .where(length(col("phrase")) > 0)
    val byPhrase = phrases
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_instances"))
      .withColumn("words", split(col("phrase"), " "))
      .withColumn("plen", size(col("words")).cast("long"))
    byPhrase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wordStats = byPhrase
      .select(col("plen"), col("n_instances"), explode(col("words")).as("word"))
      .groupBy(col("word"))
      .agg(
        sum(col("plen") * col("n_instances")).as("deg"),
        sum(col("n_instances")).as("freq"))
      .withColumn("wscore", expr("(deg * 1000000) div freq"))
    byPhrase
      .select(col("phrase"), col("n_instances"), explode(col("words")).as("word"))
      .join(wordStats.select(col("word"), col("wscore")), Seq("word"))
      .groupBy(col("phrase"))
      .agg(max(col("n_instances")).as("n_instances"), sum(col("wscore")).as("score"))
      .select(col("phrase"), col("n_instances"), col("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(20)
  }

  val q293Oracle: String =
    """WITH phrases AS (
      |  SELECT trim(regexp_replace(p, ' +', ' ')) AS phrase
      |  FROM (SELECT unnest(regexp_split_to_array(
      |          regexp_replace(lower(text), '\b(a|the|key|value)\b', '#', 'g'),
      |          '#')) AS p
      |        FROM documents)
      |  WHERE length(trim(regexp_replace(p, ' +', ' '))) > 0),
      |by_phrase AS (
      |  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_instances,
      |    string_split(phrase, ' ') AS words,
      |    CAST(length(string_split(phrase, ' ')) AS BIGINT) AS plen
      |  FROM phrases GROUP BY phrase),
      |word_stats AS (
      |  SELECT word,
      |    CAST(SUM(plen * n_instances) AS BIGINT) AS deg,
      |    CAST(SUM(n_instances) AS BIGINT) AS freq
      |  FROM (SELECT plen, n_instances, unnest(words) AS word FROM by_phrase)
      |  GROUP BY word),
      |scored AS (
      |  SELECT bp.phrase, bp.n_instances,
      |    CAST(SUM((ws.deg * 1000000) // ws.freq) AS BIGINT) AS score
      |  FROM (SELECT phrase, n_instances, unnest(words) AS word FROM by_phrase) bp
      |  JOIN word_stats ws USING (word)
      |  GROUP BY 1, 2)
      |SELECT phrase, n_instances, score
      |FROM scored
      |ORDER BY score DESC, phrase
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q294
  /** L-DIVERSITY AND T-CLOSENESS AUDIT (Machanavajjhala et al. ICDE'06;
    * Li et al. ICDE'07) — the privacy checks BEYOND q237's k-anonymity:
    * a QI class can be large (k-anonymous) yet reveal everything
    * because its SENSITIVE values are homogeneous. QI = (user bucket,
    * ISO weekday); sensitive = event_type. Per class: distinct-l
    * (number of distinct sensitive values) and t-closeness as the EXACT
    * scaled-integer L1 distance Σ|class_share − global_share| between
    * the class's sensitive distribution and the global one — both
    * cross-multiplied to ppm (|cnt·10⁶ div n_class − gcnt·10⁶ div
    * n_total|), division-free ordering inside the class rollup. The
    * report aggregates per weekday: worst (min) l, rows in classes
    * failing l ≥ 3, and the worst (max) L1 ppm — the table a privacy
    * review reads before release.
    */
  def q294LDiversity(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .select(
        expr("user_id div 100").as("ub"),
        expr("((dayofweek(ts) + 5) % 7) + 1").as("wd"),
        col("event_type"))
    val cell = ev
      .groupBy(col("ub"), col("wd"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val cls = cell
      .groupBy(col("ub"), col("wd"))
      .agg(sum(col("cnt")).as("n_class"), count(lit(1)).as("l"))
    val glob = ev
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("gcnt"))
      .crossJoin(broadcast(ev.agg(count(lit(1)).as("n_total"))))
    val l1 = cell
      .join(cls, Seq("ub", "wd"))
      .join(broadcast(glob), Seq("event_type"))
      .groupBy(col("ub"), col("wd"))
      .agg(sum(abs(
        expr("(cnt * 1000000) div n_class") - expr("(gcnt * 1000000) div n_total")))
        .as("l1_ppm"))
    cls
      .join(l1, Seq("ub", "wd"))
      .groupBy(col("wd"))
      .agg(
        count(lit(1)).as("n_classes"),
        min(col("l")).as("worst_l"),
        sum(when(col("l") < 3, col("n_class")).otherwise(0L)).as("rows_failing_l3"),
        max(col("l1_ppm")).as("worst_l1_ppm"),
        sum(col("n_class")).as("n_rows"))
      .orderBy(col("wd"))
  }

  val q294Oracle: String =
    """WITH ev AS (
      |  SELECT user_id // 100 AS ub, isodow(ts) AS wd, event_type FROM events),
      |cell AS (
      |  SELECT ub, wd, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM ev GROUP BY 1, 2, 3),
      |cls AS (
      |  SELECT ub, wd, CAST(SUM(cnt) AS BIGINT) AS n_class,
      |    CAST(COUNT(*) AS BIGINT) AS l
      |  FROM cell GROUP BY 1, 2),
      |gstats AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS gcnt,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ev) AS n_total
      |  FROM ev GROUP BY 1),
      |l1 AS (
      |  SELECT ub, wd,
      |    CAST(SUM(ABS((cnt * 1000000) // n_class - (gcnt * 1000000) // n_total))
      |      AS BIGINT) AS l1_ppm
      |  FROM cell JOIN cls USING (ub, wd) JOIN gstats USING (event_type)
      |  GROUP BY 1, 2)
      |SELECT cls.wd,
      |  CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(MIN(l) AS BIGINT) AS worst_l,
      |  CAST(SUM(CASE WHEN l < 3 THEN n_class ELSE 0 END) AS BIGINT) AS rows_failing_l3,
      |  CAST(MAX(l1_ppm) AS BIGINT) AS worst_l1_ppm,
      |  CAST(SUM(n_class) AS BIGINT) AS n_rows
      |FROM cls JOIN l1 USING (ub, wd)
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q295
  /** Z-ORDER RANGE PRUNING CERTIFICATE — q208 measured that z-layout
    * touches fewer files; this query certifies the operation that
    * EXPLOITS it: translating a coordinate rectangle into the minimal
    * set of Z-VALUE INTERVALS (BIGMIN-style quadtree descent: recurse
    * the curve's quadrants, emit a cell fully inside the rectangle as
    * one closed interval, descend on partial overlap, merge adjacent) —
    * the plan a z-clustered table's zone-map pruning runs at 100 TB.
    * The interval set is a PURE FUNCTION of the rectangle (bounded:
    * O(bits) cells per rectangle side, data-independent), generated
    * once in Scala and embedded as literals in BOTH engines; the
    * certificate law — z ∈ ⋃ intervals ⟺ (x, y) ∈ rectangle, i.e. the
    * cover is exact, no false positives and no misses — is measured
    * over every point and pinned as count columns that must be zero.
    */
  private[graft] def zCoverIntervals(
      xlo: Long, xhi: Long, ylo: Long, yhi: Long, bits: Int): Seq[(Long, Long)] = {
    def rec(cx: Long, cy: Long, level: Int, zbase: Long): Seq[(Long, Long)] = {
      val sz = 1L << level
      val (cxhi, cyhi) = (cx + sz - 1, cy + sz - 1)
      if (cx > xhi || cxhi < xlo || cy > yhi || cyhi < ylo) Seq.empty
      else if (cx >= xlo && cxhi <= xhi && cy >= ylo && cyhi <= yhi)
        Seq((zbase, zbase + (1L << (2 * level)) - 1))
      else
        (0 until 4).flatMap { c =>
          val h = sz / 2
          rec(
            cx + (c & 1).toLong * h,
            cy + (c >> 1).toLong * h,
            level - 1,
            zbase + c.toLong * (1L << (2 * (level - 1))))
        }
    }
    rec(0L, 0L, bits, 0L)
      .sortBy(_._1)
      .foldLeft(Vector.empty[(Long, Long)]) { case (acc, (lo, hi)) =>
        acc.lastOption match {
          case Some((plo, phi)) if phi + 1 == lo => acc.init :+ ((plo, hi))
          case _                                 => acc :+ ((lo, hi))
        }
      }
  }

  private val ZRect = (40L, 180L, 60L, 200L)
  private val ZIntervals: Seq[(Long, Long)] =
    zCoverIntervals(ZRect._1, ZRect._2, ZRect._3, ZRect._4, bits = 8)

  def q295ZRangePruning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (xlo, xhi, ylo, yhi) = ZRect
    val iv = ZIntervals.toDF("lo", "hi")
    val pts = Tables
      .customer(s, dir)
      .select(
        col("c_custkey").as("k"),
        expr("(c_custkey * 37) % 256").as("x"),
        expr("(c_custkey * 73) % 256").as("y"))
      .withColumn(
        "z",
        graft.ops.Layout.zValue(Seq((col("x"), 0L, 255L), (col("y"), 0L, 255L)), 8))
    val flagged = pts
      .join(broadcast(iv), col("z") >= col("lo") && col("z") <= col("hi"), "left")
      .withColumn("in_z", col("lo").isNotNull)
      .withColumn(
        "in_rect",
        col("x") >= xlo && col("x") <= xhi && col("y") >= ylo && col("y") <= yhi)
    flagged
      .agg(
        count(lit(1)).as("n_points"),
        sum(when(col("in_rect"), 1L).otherwise(0L)).as("n_in_rect"),
        sum(when(col("in_z"), 1L).otherwise(0L)).as("n_in_z"),
        sum(when(col("in_z") =!= col("in_rect"), 1L).otherwise(0L)).as("n_mismatch"),
        sum(when(col("in_rect"), col("k")).otherwise(0L)).as("in_idsum"))
      .withColumn("n_intervals", lit(ZIntervals.size.toLong))
      .withColumn("span_sum", lit(ZIntervals.map { case (l, h) => h - l + 1 }.sum))
      .withColumn("domain", lit(65536L))
  }

  val q295Oracle: String = {
    val ivRows = ZIntervals.map { case (l, h) => s"($l, $h)" }.mkString(",\n    ")
    val (xlo, xhi, ylo, yhi) = ZRect
    val zSql = graft.ops.Layout.zValueSql(Seq(("x", 0L, 255L), ("y", 0L, 255L)), 8)
    s"""WITH iv(lo, hi) AS (VALUES
       |    $ivRows),
       |pts AS (
       |  SELECT c_custkey AS k, (c_custkey * 37) % 256 AS x,
       |         (c_custkey * 73) % 256 AS y
       |  FROM customer),
       |pz AS (SELECT k, x, y, $zSql AS z FROM pts),
       |flagged AS (
       |  SELECT pz.k, pz.x, pz.y,
       |    EXISTS (SELECT 1 FROM iv WHERE pz.z >= iv.lo AND pz.z <= iv.hi) AS in_z,
       |    (x >= $xlo AND x <= $xhi AND y >= $ylo AND y <= $yhi) AS in_rect
       |  FROM pz)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       |  CAST(SUM(CASE WHEN in_rect THEN 1 ELSE 0 END) AS BIGINT) AS n_in_rect,
       |  CAST(SUM(CASE WHEN in_z THEN 1 ELSE 0 END) AS BIGINT) AS n_in_z,
       |  CAST(SUM(CASE WHEN in_z <> in_rect THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
       |  CAST(SUM(CASE WHEN in_rect THEN k ELSE 0 END) AS BIGINT) AS in_idsum,
       |  CAST(${ZIntervals.size} AS BIGINT) AS n_intervals,
       |  CAST(${ZIntervals.map { case (l, h) => h - l + 1 }.sum} AS BIGINT) AS span_sum,
       |  CAST(65536 AS BIGINT) AS domain
       |FROM flagged""".stripMargin
  }

  // ---------------------------------------------------------------- q296
  /** EXACT DISTRIBUTED SPEARMAN RANK CORRELATION between account
    * balance and order activity, per market segment — the
    * transcendental-free correlation (Pearson on RANKS): with ranks
    * from a TOTAL order (value, custkey — tie-broken, so both engines
    * rank identically and the d² sum is integer-exact) and no true
    * ties, ρ = 1 − 6Σd²/(n(n²−1)) in exact ppm. Ranks come from
    * [[graft.ops.Rank.rankWithin]]'s range-binned two-pass — never a
    * single global-order window task — and Σd² is staged to
    * decimal(38,0) BEFORE the ·10⁶ scaling (the q170 first-factor
    * widening: n³·10⁶ overflows int64 past n ≈ 2×10⁴). The oracle
    * replays with plain windows, certifying the distributed rank ≡ the
    * sequential definition on every group.
    */
  def q296Spearman(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val orders = Tables
      .orders(s, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    val base = c
      .select(col("c_custkey"), col("c_mktsegment").as("segment"), col("c_acctbal"))
      .join(orders, Seq("c_custkey"), "left")
      .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
    val xr = graft.ops.Rank.rankWithin(
      base, Seq("segment"), col("c_acctbal"), col("c_custkey"), "xr")
    val both = graft.ops.Rank.rankWithin(
      xr, Seq("segment"), col("n_orders"), col("c_custkey"), "yr")
    both
      .groupBy(col("segment"))
      .agg(
        count(lit(1)).as("n"),
        sum(((col("xr") - col("yr")) * (col("xr") - col("yr"))).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("d2"))
      .select(
        col("segment"),
        col("n"),
        col("d2").cast("long").as("sum_d2"),
        expr("cast(1000000 - (d2 * 6000000) div (cast(n as decimal(38,0)) * n * n - n) as bigint)")
          .as("rho_ppm"))
      .orderBy(col("segment"))
  }

  val q296Oracle: String =
    """WITH orders_per AS (
      |  SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1),
      |base AS (
      |  SELECT c.c_custkey, c.c_mktsegment AS segment, c.c_acctbal,
      |    COALESCE(op.n_orders, 0) AS n_orders
      |  FROM customer c LEFT JOIN orders_per op USING (c_custkey)),
      |ranked AS (
      |  SELECT segment,
      |    ROW_NUMBER() OVER (PARTITION BY segment ORDER BY c_acctbal, c_custkey) AS xr,
      |    ROW_NUMBER() OVER (PARTITION BY segment ORDER BY n_orders, c_custkey) AS yr
      |  FROM base),
      |agg AS (
      |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST((xr - yr) AS HUGEINT) * (xr - yr)) AS HUGEINT) AS d2
      |  FROM ranked GROUP BY 1)
      |SELECT segment, n, CAST(d2 AS BIGINT) AS sum_d2,
      |  CAST(1000000 - (d2 * 6000000) // (CAST(n AS HUGEINT) * n * n - n) AS BIGINT)
      |    AS rho_ppm
      |FROM agg
      |ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------- q297
  /** MORAN'S I SPATIAL AUTOCORRELATION (Moran 1950; the diagnostic a
    * geospatial feature pipeline runs before trusting "location
    * explains it") in EXACT INTEGER arithmetic: deviations are scaled
    * by n (d_i = n·v_i − Σv, integer), which multiplies numerator and
    * denominator by n² and cancels, so I = (n/W)·Σw d_i d_j / Σd_i²
    * needs no rational intermediate; products stage to decimal(38,0)
    * before the ·10⁶ ppm scaling (the q170 widening). The weight
    * matrix is SAME-GRID-CELL adjacency (w_ij = 1, i ≠ j), so pair
    * generation is the [[graft.ops.Geo]] shape — one equi self-join on
    * the cell key, candidate volume ∝ local density, never n². Two
    * variables measure discrimination: v1 is a pure function of
    * location (strong positive I expected), v2 a location-independent
    * residue (I ≈ 0) — both exact, same pair set, one row.
    */
  def q297MoransI(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables
      .customer(s, dir)
      .select(
        col("c_custkey").as("k"),
        expr("(c_custkey * 37) % 256").as("x"),
        expr("(c_custkey * 73) % 256").as("y"))
      .withColumn("cell", expr("(x div 16) * 100 + (y div 16)"))
      .withColumn("v1", expr("(x div 32) + (y div 32)"))
      .withColumn("v2", expr("k % 7"))
    val tot = pts.agg(
      count(lit(1)).as("n"), sum(col("v1")).as("s1"), sum(col("v2")).as("s2"))
    val d = pts
      .crossJoin(broadcast(tot))
      .select(
        col("k"), col("cell"),
        (col("n") * col("v1") - col("s1")).as("d1"),
        (col("n") * col("v2") - col("s2")).as("d2"),
        col("n"))
    val den = d.agg(
      max(col("n")).as("n"),
      sum((col("d1") * col("d1")).cast("decimal(38,0)")).as("den1"),
      sum((col("d2") * col("d2")).cast("decimal(38,0)")).as("den2"))
    val pairs = d
      .select(col("cell"), col("k"), col("d1"), col("d2"))
      .join(
        d.select(
          col("cell"), col("k").as("k2"), col("d1").as("e1"), col("d2").as("e2")),
        Seq("cell"))
      .where(col("k") =!= col("k2"))
      .agg(
        count(lit(1)).as("w_pairs"),
        sum((col("d1") * col("e1")).cast("decimal(38,0)")).as("num1"),
        sum((col("d2") * col("e2")).cast("decimal(38,0)")).as("num2"))
    pairs
      .crossJoin(broadcast(den))
      .select(
        col("n"),
        col("w_pairs"),
        col("den1").cast("long").as("sum_d1_sq"),
        col("den2").cast("long").as("sum_d2_sq"),
        expr("cast((n * num1 * 1000000) div (w_pairs * den1) as bigint)").as("i1_ppm"),
        expr("cast((n * num2 * 1000000) div (w_pairs * den2) as bigint)").as("i2_ppm"))
  }

  val q297Oracle: String =
    """WITH pts AS (
      |  SELECT c_custkey AS k,
      |    (c_custkey * 37) % 256 AS x, (c_custkey * 73) % 256 AS y
      |  FROM customer),
      |feat AS (
      |  SELECT k, (x // 16) * 100 + (y // 16) AS cell,
      |    (x // 32) + (y // 32) AS v1, k % 7 AS v2
      |  FROM pts),
      |tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(v1) AS BIGINT) AS s1, CAST(SUM(v2) AS BIGINT) AS s2
      |  FROM feat),
      |d AS (
      |  SELECT k, cell, n * v1 - s1 AS d1, n * v2 - s2 AS d2, n
      |  FROM feat, tot),
      |den AS (
      |  SELECT MAX(n) AS n,
      |    CAST(SUM(CAST(d1 AS HUGEINT) * d1) AS HUGEINT) AS den1,
      |    CAST(SUM(CAST(d2 AS HUGEINT) * d2) AS HUGEINT) AS den2
      |  FROM d),
      |pairs AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS w_pairs,
      |    CAST(SUM(CAST(a.d1 AS HUGEINT) * b.d1) AS HUGEINT) AS num1,
      |    CAST(SUM(CAST(a.d2 AS HUGEINT) * b.d2) AS HUGEINT) AS num2
      |  FROM d a JOIN d b ON a.cell = b.cell AND a.k <> b.k)
      |SELECT den.n, pairs.w_pairs,
      |  CAST(den.den1 AS BIGINT) AS sum_d1_sq,
      |  CAST(den.den2 AS BIGINT) AS sum_d2_sq,
      |  CAST((den.n * pairs.num1 * 1000000) // (pairs.w_pairs * den.den1) AS BIGINT) AS i1_ppm,
      |  CAST((den.n * pairs.num2 * 1000000) // (pairs.w_pairs * den.den2) AS BIGINT) AS i2_ppm
      |FROM pairs, den""".stripMargin

  // ---------------------------------------------------------------- q298
  /** ROBUST OUTLIER DETECTION via MEDIAN/MAD (Hampel's rule — the
    * robust sibling of z-scoring: mean and stddev are themselves
    * dragged by the outliers they're meant to find; median and Median
    * Absolute Deviation have 50% breakdown). All order statistics are
    * DISCRETE rank-selected (the q92/q97 recipe — interpolated
    * percentiles diverge cross-engine in the last ulp): per segment,
    * median = the ⌈n/2⌉-th balance-in-cents under the (value, key)
    * total order, MAD = the same statistic over |x − median|, and the
    * flag is the division-free |x − median| > 3·MAD. Two window passes
    * per segment (rank by value, then rank by deviation) + one rollup;
    * at cluster scale both become [[graft.ops.Rank.rankWithin]]'s
    * two-pass — the per-segment windows here keep the replay plain.
    */
  def q298RobustOutliers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = Tables
      .customer(s, dir)
      .select(
        col("c_custkey").as("k"),
        col("c_mktsegment").as("segment"),
        expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)").as("cents"))
    val byVal = Window.partitionBy(col("segment")).orderBy(col("cents"), col("k"))
    val seg = Window.partitionBy(col("segment"))
    val med = c
      .withColumn("rn", row_number().over(byVal))
      .withColumn("n", count(lit(1)).over(seg))
      .where(col("rn") === expr("(n + 1) div 2"))
      .select(col("segment"), col("cents").as("median"))
    val withDev = c
      .join(broadcast(med), Seq("segment"))
      .withColumn("dev", abs(col("cents") - col("median")))
    val byDev = Window.partitionBy(col("segment")).orderBy(col("dev"), col("k"))
    val mad = withDev
      .withColumn("rn", row_number().over(byDev))
      .withColumn("n", count(lit(1)).over(seg))
      .where(col("rn") === expr("(n + 1) div 2"))
      .select(col("segment"), col("dev").as("mad"))
    withDev
      .join(broadcast(mad), Seq("segment"))
      .groupBy(col("segment"))
      .agg(
        count(lit(1)).as("n"),
        max(col("median")).as("median_cents"),
        max(col("mad")).as("mad_cents"),
        sum(when(col("dev") > lit(3) * col("mad"), 1L).otherwise(0L)).as("n_outliers"),
        sum(when(col("dev") > lit(3) * col("mad"), col("k")).otherwise(0L)).as("outlier_idsum"))
      .orderBy(col("segment"))
  }

  val q298Oracle: String =
    """WITH c AS (
      |  SELECT c_custkey AS k, c_mktsegment AS segment,
      |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      |  FROM customer),
      |med AS (
      |  SELECT segment, cents AS median FROM (
      |    SELECT segment, cents,
      |      ROW_NUMBER() OVER (PARTITION BY segment ORDER BY cents, k) AS rn,
      |      COUNT(*) OVER (PARTITION BY segment) AS n
      |    FROM c)
      |  WHERE rn = (n + 1) // 2),
      |dev AS (
      |  SELECT c.k, c.segment, c.cents, ABS(c.cents - med.median) AS dev, med.median
      |  FROM c JOIN med USING (segment)),
      |mad AS (
      |  SELECT segment, dev AS mad FROM (
      |    SELECT segment, dev,
      |      ROW_NUMBER() OVER (PARTITION BY segment ORDER BY dev, k) AS rn,
      |      COUNT(*) OVER (PARTITION BY segment) AS n
      |    FROM dev)
      |  WHERE rn = (n + 1) // 2)
      |SELECT dev.segment,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MAX(dev.median) AS BIGINT) AS median_cents,
      |  CAST(MAX(mad.mad) AS BIGINT) AS mad_cents,
      |  CAST(SUM(CASE WHEN dev.dev > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST(SUM(CASE WHEN dev.dev > 3 * mad.mad THEN k ELSE 0 END) AS BIGINT) AS outlier_idsum
      |FROM dev JOIN mad USING (segment)
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q299
  /** GREEDY INTERVAL SCHEDULING (the exchange-argument classic:
    * earliest-deadline-first maximizes the count of non-overlapping
    * intervals — the capacity question "how many of this user's
    * sessions could one worker have served?"). Inherently a SEQUENTIAL
    * fold per key, so it runs as the repo's ORDERED-FOLD recipe
    * (q95/q122): collect the per-user intervals into a sorted array
    * (bounded per key — this is per-GROUP state, not corpus state) and
    * fold with the accumulator ENCODED IN THE ELEMENT TYPE so Spark's
    * aggregate() and DuckDB's list_reduce (probed: an ordered left
    * fold) run the identical lambda: acc = {cnt, e=last_end, s}, take
    * x iff x.s ≥ acc.e. Intervals are [epoch_µs, +dur) with dur a pure
    * function of event_id — exact integers end to end (ts through the
    * floor-µs bridge, never raw ns).
    */
  def q299IntervalSchedule(s: SparkSession, dir: String): DataFrame = {
    val iv = Tables
      .events(s, dir)
      .select(
        col("user_id"),
        col("event_id"),
        expr("ts_ns div 1000").as("s_us"))
      .withColumn("e_us", col("s_us") + (col("event_id") % 3600 + 60) * 1000000L)
    val folded = iv
      .select(
        col("user_id"),
        struct(
          lit(1L).as("cnt"), col("e_us").as("e"), col("s_us").as("s"),
          col("event_id").as("id")).as("item"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("item"))).as("arr"))
      .select(
        col("user_id"),
        size(col("arr")).cast("long").as("n_events"),
        expr(
          """aggregate(
            |  slice(arr, 2, size(arr) - 1), arr[0],
            |  (acc, x) -> CASE WHEN x.s >= acc.e
            |    THEN named_struct('cnt', acc.cnt + CAST(1 AS BIGINT), 'e', x.e, 's', x.s, 'id', x.id)
            |    ELSE acc END).cnt""".stripMargin).as("selected"))
    folded
      .groupBy(expr("user_id div 50").as("bucket"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"),
        sum(col("selected")).as("n_selected"),
        max(col("selected")).as("max_selected"))
      .withColumn("law_ok", col("n_selected") <= col("n_events"))
      .orderBy(col("bucket"))
  }

  val q299Oracle: String =
    """WITH RECURSIVE iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS s_us,
      |    epoch_us(ts) + (event_id % 3600 + 60) * 1000000 AS e_us
      |  FROM events),
      |idx AS (
      |  SELECT user_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY e_us, s_us, event_id) AS i,
      |    s_us, e_us
      |  FROM iv),
      |n AS (SELECT user_id, MAX(i) AS m, CAST(COUNT(*) AS BIGINT) AS n_events
      |      FROM idx GROUP BY user_id),
      |walk(user_id, i, cnt, laste) AS (
      |  SELECT user_id, i, CAST(1 AS BIGINT), e_us FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT w.user_id, w.i + 1,
      |    w.cnt + CASE WHEN x.s_us >= w.laste THEN 1 ELSE 0 END,
      |    CASE WHEN x.s_us >= w.laste THEN x.e_us ELSE w.laste END
      |  FROM walk w JOIN idx x ON x.user_id = w.user_id AND x.i = w.i + 1),
      |folded AS (
      |  SELECT w.user_id, n.n_events, w.cnt AS selected
      |  FROM walk w JOIN n ON n.user_id = w.user_id AND w.i = n.m)
      |SELECT user_id // 50 AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(n_events) AS BIGINT) AS n_events,
      |  CAST(SUM(selected) AS BIGINT) AS n_selected,
      |  CAST(MAX(selected) AS BIGINT) AS max_selected,
      |  SUM(selected) <= SUM(n_events) AS law_ok
      |FROM folded
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q300
  /** CUPED VARIANCE REDUCTION for A/B readouts (Deng et al. WSDM'13 —
    * the experimentation-platform staple: adjust the post-period
    * metric by a pre-period covariate, Y_adj = Y − θ(X − X̄), cutting
    * variance by the squared correlation without biasing the delta).
    * Assignment is the deterministic md5-parity split (the q221
    * posture); X/Y are the user's pre/post event counts around the
    * corpus midpoint. Everything is EXACT sufficient statistics
    * (q134's discipline): θ = (nΣXY − ΣXΣY)/(nΣX² − (ΣX)²) emitted in
    * ppm by cross-multiplied integer division, the variance-reduction
    * ratio r² = cov²/ (varX·varY) in ppm the same way, and the
    * adjusted means stay in exact n·n_g-scaled integer form —
    * θ's rational value is never rounded before use:
    * adj_mean_ppm = (ΣY_g·10⁶ div n_g) − (num_θ·(n·ΣX_g − n_g·ΣX)·10⁶)
    * div (den_θ·n·n_g).
    */
  def q300Cuped(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // exact integer mean: double avg of ~1e19-scale sums is summation-
    // order-dependent in the low bits, and a 1 us midpoint shift flips
    // boundary rows — stage the sum in decimal and floor-divide
    val mid = ev.agg(
      expr("cast(sum(cast(ts_ns div 1000 as decimal(38,0))) div count(1) as bigint)")
        .as("mid_us"))
    val per = ev
      .crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        sum(when(expr("ts_ns div 1000") < col("mid_us"), 1L).otherwise(0L)).as("x"),
        sum(when(expr("ts_ns div 1000") >= col("mid_us"), 1L).otherwise(0L)).as("y"))
      .withColumn("variant", expr("cast(conv(substr(md5(cast(user_id as string)), 1, 4), 16, 10) as bigint) % 2"))
    val glob = per.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val theta = glob.select(
      col("n"), col("sx"), col("sy"),
      (col("n") * col("sxy") - col("sx") * col("sy")).cast("decimal(38,0)").as("num_t"),
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("decimal(38,0)").as("den_t"),
      (col("n") * col("syy") - col("sy") * col("sy")).cast("decimal(38,0)").as("den_y"))
    per
      .groupBy(col("variant"))
      .agg(
        count(lit(1)).as("n_g"),
        sum(col("x")).as("sx_g"),
        sum(col("y")).as("sy_g"))
      .crossJoin(broadcast(theta))
      .select(
        col("variant"),
        col("n_g"),
        expr("(sy_g * 1000000) div n_g").as("mean_y_ppm"),
        expr("cast((sy_g * 1000000) div n_g - (num_t * (n * sx_g - n_g * sx) * 1000000) div (den_t * n * n_g) as bigint)")
          .as("adj_mean_y_ppm"),
        expr("cast((num_t * 1000000) div den_t as bigint)").as("theta_ppm"),
        expr("cast((num_t * num_t * 1000000) div (den_t * den_y) as bigint)").as("r2_ppm"))
      .orderBy(col("variant"))
  }

  val q300Oracle: String =
    """WITH mid AS (
      |  SELECT CAST(CAST(SUM(CAST(epoch_us(ts) AS HUGEINT)) AS HUGEINT) // COUNT(*) AS BIGINT)
      |    AS mid_us FROM events),
      |per AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN epoch_us(ts) >= mid_us THEN 1 ELSE 0 END) AS BIGINT) AS y,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS BIGINT) % 2 AS variant
      |  FROM events, mid GROUP BY user_id),
      |gsum AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM per),
      |theta AS (
      |  SELECT n, sx, sy,
      |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num_t,
      |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den_t,
      |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS den_y
      |  FROM gsum)
      |SELECT variant,
      |  CAST(COUNT(*) AS BIGINT) AS n_g,
      |  CAST((SUM(y) * 1000000) // COUNT(*) AS BIGINT) AS mean_y_ppm,
      |  CAST((SUM(y) * 1000000) // COUNT(*)
      |    - (num_t * (n * SUM(x) - COUNT(*) * sx) * 1000000) // (den_t * n * COUNT(*))
      |    AS BIGINT) AS adj_mean_y_ppm,
      |  CAST((num_t * 1000000) // den_t AS BIGINT) AS theta_ppm,
      |  CAST((num_t * num_t * 1000000) // (den_t * den_y) AS BIGINT) AS r2_ppm
      |FROM per, theta
      |GROUP BY variant, n, sx, num_t, den_t, den_y
      |ORDER BY variant""".stripMargin

  // ---------------------------------------------------------------- q301
  /** TEXTRANK KEYWORD SCORING (Mihalcea-Tarau EMNLP'04 - PageRank on
    * the word co-occurrence graph; the unsupervised keyword extractor
    * that needs no training data, the graph-flavored complement to
    * q293's RAKE). Nodes are vocabulary words, edges are ADJACENT-token
    * co-occurrences (window 2) weighted by pair count; 4 damped rounds
    * of v' = 0.15*10^12 + 0.85 * SUM_u (v_u * w_uv) div wdeg_u in exact
    * scaled-integer arithmetic (q289's teleport discipline on a word
    * graph). The corpus-sized work is ONE token scan + one pair count;
    * the iteration runs on the |vocab|-row frame against the broadcast
    * edge list - bounded model state at any corpus size. Top-10 by
    * (score, word).
    */
  def q301TextRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables
      .documents(s, dir)
      .select(col("doc_id"), posexplode(split(lower(col("text")), " ")).as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = toks
      .withColumn("prev", lag(col("word"), 1).over(byDoc))
      .where(col("prev").isNotNull && col("prev") =!= col("word"))
      .select(
        least(col("prev"), col("word")).as("a"),
        greatest(col("prev"), col("word")).as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("w"))
    val dirEdges = pairs
      .select(col("a").as("u"), col("b").as("v"), col("w"))
      .unionByName(pairs.select(col("b").as("u"), col("a").as("v"), col("w")))
    dirEdges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wdeg = dirEdges.groupBy(col("u")).agg(sum(col("w")).as("wdeg"))
    val freq = toks.groupBy(col("word")).agg(count(lit(1)).as("freq"))
    // the edge frame already owns a column named "v" (the pair target),
    // so the rank value is "vr" until the final projection
    var rank = wdeg.select(col("u").as("word"), lit(1000000000000L).as("vr"))
    for (_ <- 1 to 4) {
      val inflow = dirEdges
        .join(rank.withColumnRenamed("word", "u"), Seq("u"))
        .join(wdeg, Seq("u"))
        .groupBy(col("v").as("word"))
        .agg(sum(expr("(vr * w) div wdeg")).as("inflow"))
      // no lineage cut: the state frame is |vocab| rows and 4 rounds
      // nest linearly, so ONE final evaluation reuses the persisted
      // edge frame's exchange instead of recomputing it per round
      rank = wdeg
        .select(col("u").as("word"))
        .join(inflow, Seq("word"), "left")
        .select(
          col("word"),
          (lit(150000000000L) + expr("(coalesce(inflow, 0) * 85) div 100")).as("vr"))
    }
    rank.join(freq, Seq("word"))
      .join(wdeg.withColumnRenamed("u", "word"), Seq("word"))
      .select(col("word"), col("vr").as("score"), col("freq"), col("wdeg"))
      .orderBy(col("score").desc, col("word"))
      .limit(10)
  }

  val q301Oracle: String = {
    val rounds = (1 to 4)
      .map { t =>
        s"""v$t AS MATERIALIZED (
           |  SELECT n.word,
           |    150000000000 + (COALESCE(i.inflow, 0) * 85) // 100 AS v
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.v AS word, CAST(SUM((v${t - 1}.v * e.w) // wd.wdeg) AS BIGINT) AS inflow
           |    FROM v${t - 1}
           |    JOIN e ON e.u = v${t - 1}.word
           |    JOIN wdeg wd ON wd.u = v${t - 1}.word
           |    GROUP BY e.v) i ON i.word = n.word)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, i AS pos, words[i] AS word FROM (
       |    SELECT doc_id, string_split(lower(text), ' ') AS words,
       |      unnest(range(1, length(string_split(lower(text), ' ')) + 1)) AS i
       |    FROM documents)
       |  WHERE length(words[i]) > 0),
       |pairs AS MATERIALIZED (
       |  SELECT least(prev, word) AS a, greatest(prev, word) AS b,
       |    CAST(COUNT(*) AS BIGINT) AS w
       |  FROM (SELECT word,
       |          lag(word) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |        FROM toks)
       |  WHERE prev IS NOT NULL AND prev <> word
       |  GROUP BY 1, 2),
       |e AS MATERIALIZED (
       |  SELECT a AS u, b AS v, w FROM pairs
       |  UNION ALL SELECT b, a, w FROM pairs),
       |wdeg AS MATERIALIZED (SELECT u, CAST(SUM(w) AS BIGINT) AS wdeg FROM e GROUP BY u),
       |nodes AS MATERIALIZED (SELECT DISTINCT u AS word FROM e),
       |freq AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY word),
       |v0 AS (SELECT word, CAST(1000000000000 AS BIGINT) AS v FROM nodes),
       |$rounds
       |SELECT v4.word AS word, CAST(v4.v AS BIGINT) AS score, freq.freq, wdeg.wdeg
       |FROM v4 JOIN freq ON freq.word = v4.word JOIN wdeg ON wdeg.u = v4.word
       |ORDER BY score DESC, v4.word
       |LIMIT 10""".stripMargin
  }

  // ---------------------------------------------------------------- q302
  /** ABSORBING MARKOV CHAIN FUNNEL ANALYSIS (Kemeny-Snell fundamental-
    * matrix semantics, computed as the truncated Neumann series - the
    * "how many steps until purchase-or-error, and which one?" readout
    * behind funnel health dashboards). States are event types;
    * 'purchase' and 'error' absorb; transitions count per-user
    * consecutive pairs LEAVING transient states only. Twelve rounds of
    * the exact scaled-integer DP: expected steps v' = 10^6 +
    * SUM_j cnt_ij * v_j div rowsum_i (absorbing j contribute 0), and
    * absorption split p' = SUM_j cnt_ij * (j = purchase ? 10^12 : p_j)
    * div rowsum_i - both monotone increasing in rounds, so the
    * truncation is a documented lower bound, bit-identical in the
    * unrolled oracle. One corpus-scan shuffle (the lag window); the
    * DP runs on the <= |event types|-row state frame.
    */
  def q302AbsorbingChain(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables
      .events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .where(col("prev").isNotNull && !col("prev").isin("purchase", "error"))
      .groupBy(col("prev").as("i"), col("event_type").as("j"))
      .agg(count(lit(1)).as("cnt"))
    val rowsum = trans.groupBy(col("i")).agg(sum(col("cnt")).as("rs"))
    val m = broadcast(trans.join(rowsum, Seq("i")))
    var st = rowsum.select(col("i").as("state"), lit(0L).as("v"), lit(0L).as("p"))
    for (_ <- 1 to 12) {
      val nxt = m
        .join(
          st.select(col("state").as("jj"), col("v").as("vj"), col("p").as("pj")),
          col("j") === col("jj"), "left")
        .select(
          col("i"),
          expr("(cnt * coalesce(vj, 0)) div rs").as("vc"),
          expr("(cnt * (case when j = 'purchase' then 1000000000000 else coalesce(pj, 0) end)) div rs")
            .as("pc"))
        .groupBy(col("i"))
        .agg(sum(col("vc")).as("sv"), sum(col("pc")).as("sp"))
      // no lineage cut: |types|-row state, 12 linear rounds — a single
      // evaluation at the end reuses the broadcast transition matrix,
      // where a per-round cut re-ran the corpus lag window 12 times
      st = nxt.select(
        col("i").as("state"),
        (lit(1000000L) + col("sv")).as("v"),
        col("sp").as("p"))
    }
    st.join(rowsum.withColumnRenamed("i", "state"), Seq("state"))
      .select(
        col("state"),
        col("rs").as("n_out"),
        col("v").as("exp_steps_scaled"),
        col("p").as("p_purchase_scaled"))
      .orderBy(col("state"))
  }

  val q302Oracle: String = {
    val rounds = (1 to 12)
      .map { t =>
        s"""s$t AS MATERIALIZED (
           |  SELECT m.i AS state,
           |    1000000 + CAST(SUM((m.cnt * COALESCE(s.v, 0)) // m.rs) AS BIGINT) AS v,
           |    CAST(SUM((m.cnt * (CASE WHEN m.j = 'purchase' THEN 1000000000000
           |      ELSE COALESCE(s.p, 0) END)) // m.rs) AS BIGINT) AS p
           |  FROM m LEFT JOIN s${t - 1} s ON s.state = m.j
           |  GROUP BY m.i)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH seq AS (
       |  SELECT event_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |trans AS MATERIALIZED (
       |  SELECT prev AS i, event_type AS j, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM seq
       |  WHERE prev IS NOT NULL AND prev NOT IN ('purchase', 'error')
       |  GROUP BY 1, 2),
       |rowsum AS MATERIALIZED (SELECT i, CAST(SUM(cnt) AS BIGINT) AS rs FROM trans GROUP BY i),
       |m AS MATERIALIZED (SELECT trans.i, trans.j, trans.cnt, rowsum.rs
       |  FROM trans JOIN rowsum USING (i)),
       |s0 AS (SELECT i AS state, CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS p FROM rowsum),
       |$rounds
       |SELECT s12.state, rowsum.rs AS n_out,
       |  s12.v AS exp_steps_scaled, s12.p AS p_purchase_scaled
       |FROM s12 JOIN rowsum ON rowsum.i = s12.state
       |ORDER BY s12.state""".stripMargin
  }

  // ---------------------------------------------------------------- q303
  /** HEAPS'-LAW VOCABULARY GROWTH (Herdan-Heaps: V(n) ~ K*n^beta - the
    * type-token curve a tokenizer team reads to size a vocabulary and
    * detect corpus saturation). Ten corpus prefixes by doc_id cutoff;
    * the whole curve comes from ONE token scan: each word's FIRST
    * occurrence doc (min doc_id - new-type events) and each doc's
    * token count bucket into cutoff intervals, and the curve is the
    * running sum over the 10-row bucket frame (q223's
    * cumulative-unique-as-cumsum-of-new, generalized to the
    * vocabulary axis) - never ten rescans. Type-token ratio in exact
    * ppm per prefix.
    */
  def q303HeapsLaw(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val mx = docs.agg(max(col("doc_id")).as("m"))
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .where(length(col("word")) > 0)
      .crossJoin(broadcast(mx))
      .withColumn("k", expr("least(cast(((doc_id * 10) div (m + 1)) as bigint) + 1, 10)"))
    val newTypes = toks
      .groupBy(col("word"))
      .agg(min(col("k")).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("new_types"))
    val tokCnt = toks.groupBy(col("k")).agg(count(lit(1)).as("toks"))
    val ks = s.range(1, 11).select(col("id").as("k"))
    val byK = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ks.join(newTypes, Seq("k"), "left")
      .join(tokCnt, Seq("k"), "left")
      .select(
        col("k"),
        coalesce(col("toks"), lit(0L)).as("toks"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("tokens_cum", sum(col("toks")).over(byK))
      .withColumn("vocab_cum", sum(col("new_types")).over(byK))
      .withColumn("ttr_ppm", expr("(vocab_cum * 1000000) div tokens_cum"))
      .select(col("k"), col("tokens_cum"), col("vocab_cum"), col("new_types"), col("ttr_ppm"))
      .orderBy(col("k"))
  }

  val q303Oracle: String =
    """WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
      |toks AS (
      |  SELECT doc_id,
      |    least(((doc_id * 10) // (m + 1)) + 1, 10) AS k, word
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      |        FROM documents), mx
      |  WHERE length(word) > 0),
      |new_types AS (
      |  SELECT k, CAST(COUNT(*) AS BIGINT) AS new_types FROM (
      |    SELECT word, MIN(k) AS k FROM toks GROUP BY word)
      |  GROUP BY k),
      |tok_cnt AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS toks FROM toks GROUP BY k),
      |ks AS (SELECT unnest(range(1, 11)) AS k),
      |base AS (
      |  SELECT ks.k,
      |    COALESCE(tok_cnt.toks, 0) AS toks,
      |    COALESCE(new_types.new_types, 0) AS new_types
      |  FROM ks LEFT JOIN new_types ON new_types.k = ks.k
      |  LEFT JOIN tok_cnt ON tok_cnt.k = ks.k)
      |SELECT k,
      |  CAST(SUM(toks) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_cum,
      |  CAST(SUM(new_types) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_cum,
      |  CAST(new_types AS BIGINT) AS new_types,
      |  CAST((SUM(new_types) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) * 1000000)
      |    // SUM(toks) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ttr_ppm
      |FROM base
      |ORDER BY k""".stripMargin
}