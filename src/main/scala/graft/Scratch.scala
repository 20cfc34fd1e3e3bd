package graft

/** Dev scratch main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    Seq(
      "q28" -> Queries.q28Simhash _,
      "q32" -> Queries.q32Multimodal _,
      "q33" -> Queries.q33DedupAssign _,
      "q35" -> Queries.q35Ivf _,
      "q44" -> Queries.q44HllSketch _
    ).foreach { case (n, f) =>
      val t0 = System.nanoTime()
      val df = f(spark, dir)
      val rows = df.limit(3).collect().map(_.toString).mkString(" | ")
      println(f"SCRATCH $n time=${(System.nanoTime() - t0) / 1e9}%.2fs head=$rows")
    }
    spark.stop()
  }
}
