package graft.tools

import graft.{Sessions, SparkEntry}

/** Diagnostic harness: run every registry query at a tiny SF with a
  * stderr marker before each, so driver-log warnings (e.g. the
  * `WARN LogicalRDD: output columns expected to be the same` spam seen
  * in BENCH_r09) can be attributed to the exact query that triggers
  * them by pairing markers with warning lines in the captured stderr.
  * Not part of the bench/verify contract — a builder-side tool.
  */
object WarnHunt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .filter(_.nonEmpty)
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        System.err.println(s"### MARKER $name")
        System.err.flush()
        try fn(spark, sfDir).count()
        catch { case t: Throwable => System.err.println(s"### ERR $name: ${t.getClass.getSimpleName}") }
      }
    System.err.println("### MARKER __done__")
    spark.stop()
  }
}
