package graft

import org.apache.spark.sql.SparkSession

/** Probe: can a vanilla session (no graft configs) read the ns-timestamp
  * events table after runtime conf sets? (Not part of the contract.)
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val n = Tables.events(spark, "/root/testdata/sf0.001").count()
      println(s"vanilla_session_events_count=$n")
      val e = SparkEntry.entry(spark)
      println(s"vanilla_entry_rows=${e.count()}")
    } catch {
      case ex: Throwable => println(s"vanilla_session_FAILED: ${ex.getMessage.take(150)}")
    }
    spark.stop()
  }
}
