package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the pay-the-shuffle-once posture for 100 TB
  * fact tables: `bucketBy(n, key)` hash-partitions rows into `n` files
  * per partition at WRITE time and records the layout in the catalog, so
  * every later equi-join or aggregation on `key` between co-bucketed
  * tables runs with NO exchange at all (Catalyst sees the matching
  * `HashPartitioning` and plans a zero-shuffle sort-merge join; `sortBy`
  * additionally pre-sorts each bucket so the merge needs no sort either).
  *
  * The repeated-join dimension/fact pattern is exactly where this pays:
  * one shuffle at ingest replaces a shuffle per query. BucketedSpec
  * asserts the exchange-free plan and result parity with the plain join.
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted parquet table registered in the
    * session catalog (location under spark.sql.warehouse.dir).
    * Idempotent across JVMs: a location left by a previous session's
    * managed table (no longer in this in-memory catalog) is cleared
    * first — otherwise CREATE TABLE fails on LOCATION_ALREADY_EXISTS.
    */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath,
      table.toLowerCase(java.util.Locale.ROOT)
    )
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Co-bucketed equi-join: both sides must be bucketed on their join
    * key with the same bucket count for the exchange-free plan.
    */
  def join(spark: SparkSession, leftTable: String, rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = read(spark, leftTable)
    val r = read(spark, rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
