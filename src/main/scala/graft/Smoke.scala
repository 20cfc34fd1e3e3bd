package graft

/** t1 smoke: run SparkEntry.entry and print its row count (driver asserts >0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"entry rows=$n")
    spark.stop()
  }
}
