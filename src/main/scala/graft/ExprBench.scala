package graft

import org.apache.spark.sql.functions._

/** Micro-benchmark: builtin full-matrix `levenshtein(a,b) <= k` vs the
  * native banded `bounded_levenshtein(a,b,k) <= k` on an ER-candidate-
  * shaped corpus (string pairs of mixed lengths, most of them far
  * apart — the regime where the band bails early). Prints one JSON
  * line; both sides are forced through the same count() so only the
  * predicate differs. Counts are asserted equal before timing is
  * reported.
  */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val pairs = spark
      .range(n)
      .select(
        md5(concat(lit("a:"), col("id"))).as("a"),
        // half the pairs share a long prefix (near matches of varying
        // distance), half are unrelated full-width md5 strings
        when(col("id") % 2 === 0,
          concat(substring(md5(concat(lit("a:"), col("id"))), 1, 28),
            substring(md5(concat(lit("z:"), col("id"))), 1, 4)))
          .otherwise(md5(concat(lit("b:"), col("id")))).as("b"))
      .persist()
    pairs.count()
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val c = f; ((System.nanoTime() - t0) / 1e9, c)
    }
    // warm both paths
    pairs.where(levenshtein(col("a"), col("b")) <= 2).count()
    pairs.where(expr("bounded_levenshtein(a, b, 2) <= 2")).count()
    val (tFull, cFull) = time(pairs.where(levenshtein(col("a"), col("b")) <= 2).count())
    val (tBand, cBand) = time(pairs.where(expr("bounded_levenshtein(a, b, 2) <= 2")).count())
    require(cFull == cBand, s"predicate mismatch: $cFull vs $cBand")
    val (tFull2, _) = time(pairs.where(levenshtein(col("a"), col("b")) <= 2).count())
    val (tBand2, _) = time(pairs.where(expr("bounded_levenshtein(a, b, 2) <= 2")).count())
    println(
      s"""{"bench":"bounded_levenshtein","n":$n,"matches":$cFull,""" +
        s""""full_s":[$tFull,$tFull2],"banded_s":[$tBand,$tBand2],""" +
        s""""speedup":${(tFull + tFull2) / (tBand + tBand2)}}""")
    spark.stop()
  }
}
