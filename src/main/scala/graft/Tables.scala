package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * All tables are driver-generated star-schema parquet at
  * `/root/testdata/sf{0.001,0.01,0.1}/`. Loading goes through one place so
  * every query benefits from the same scan discipline: parquet vectorized
  * reader, column pruning and predicate pushdown happen automatically when
  * callers `.select`/`.filter` on the returned DataFrame.
  */
object Tables {

  /** Defensive hardening for sessions NOT built via graft.Sessions (e.g.
    * a harness-created vanilla session): these three confs are
    * runtime-settable and required for correct reads/oracle parity —
    * nanosAsLong (events is TIMESTAMP(NANOS) parquet), UTC session TZ,
    * ANSI off (null-on-error casts). Idempotent, cheap.
    */
  private def harden(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    harden(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts is ns-precision parquet. Spark reads it as int64 nanos
    * (legacy.parquet.nanosAsLong, see Sessions); DuckDB reads native
    * TIMESTAMP_NS. To stay bit-compatible with the oracle:
    *  - `ts_ns` (long, exact nanos) is used for every ordering /
    *    strict-comparison / dedup-key purpose — identical to comparing
    *    DuckDB's ns timestamps;
    *  - `ts` (TimestampType, truncated to micros) is used for calendar
    *    operations (date_trunc, date_format) where sub-micro precision is
    *    irrelevant.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    table(s, d, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
