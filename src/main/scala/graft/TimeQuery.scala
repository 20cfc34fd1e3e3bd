package graft

/** Ad-hoc single-query timer (not part of the driver contract):
  * `runMain graft.TimeQuery <sfDir> <name>[,<name>...] [reps]` — times
  * each named registry query end-to-end (plan + execute + count).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim)
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("WARN")
    // self-report the heap posture (r14): isolated-rep adjudication is
    // only comparable to a record taken under the same memory pinning,
    // so the log must say which this JVM got (see build.sbt run scope)
    println("[time] jvm_flags=" + {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
        .filter(a => a.startsWith("-Xm") || a.contains("PreTouch"))
        .mkString(" ")
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { r =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"[time] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
