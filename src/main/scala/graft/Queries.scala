package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  // ---------------------------------------------------------------------
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_filter" -> (q2Filter _),
    "q3_enrich" -> (q3Enrich _),
    "q4_watermark" -> (q4Watermark _),
    "q5_dedup" -> (q5Dedup _),
    "q6_latest" -> (q6Latest _),
    "q7_hourly" -> (q7Hourly _)
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1Oracle,
    "q2_filter" -> q2Oracle,
    "q3_enrich" -> q3Oracle,
    "q4_watermark" -> q4Oracle,
    "q5_dedup" -> q5Oracle,
    "q6_latest" -> q6Oracle,
    "q7_hourly" -> q7Oracle
  )
}
