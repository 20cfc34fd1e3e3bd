package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class BoundedLevenshteinSpec extends SparkSpec {
  import spark.implicits._

  private def full(s: String, t: String): Int = {
    val dp = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to s.length; j <- 1 to t.length)
      dp(i)(j) = math.min(
        math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    dp(s.length)(t.length)
  }

  private def banded(s: String, t: String, k: Int): Int =
    BoundedLevenshtein.banded(UTF8String.fromString(s), UTF8String.fromString(t), k)

  test("banded equals min(full DP, k+1) on random pairs for k = 0..3") {
    val rnd = new scala.util.Random(17)
    val alpha = "abcde"
    def word() = (0 until rnd.nextInt(12)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 2000) {
      val (s, t) = (word(), word())
      for (k <- 0 to 3)
        assert(banded(s, t, k) === math.min(full(s, t), k + 1), s"'$s' vs '$t' k=$k")
    }
  }

  test("edges: empty strings, equal strings, unicode, length-gap bail") {
    assert(banded("", "", 2) === 0)
    assert(banded("", "ab", 2) === 2)
    assert(banded("", "abc", 2) === 3) // gap 3 > k → sentinel k+1
    assert(banded("katze", "katze", 1) === 0)
    assert(banded("käse", "kāse", 1) === 1)
    assert(banded("abcdefgh", "a", 2) === 3)
  }

  test("astral-plane code points count as ONE edit (builtin parity)") {
    // '😀' is one code point but two UTF-16 units — a UTF-16 charAt DP
    // would score these 2 and diverge from Spark's builtin levenshtein
    assert(banded("😀", "x", 2) === 1)
    assert(banded("😀", "", 2) === 1)
    assert(banded("a😀b", "ab", 2) === 1)
    assert(banded("😀", "😁", 2) === 1) // 😀 vs 😁: substitution, not pair-swap
    assert(banded("😀😀😀", "", 2) === 3) // gap bail in code points
    // builtin parity sweep over mixed ASCII/astral words
    val rnd = new scala.util.Random(31)
    val alpha = Seq("a", "b", "😀", "😁", "é", "中")
    def word() = (0 until rnd.nextInt(8)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = (1 to 800).map(_ => (word(), word())).toDF("a", "b")
    val diff = pairs
      .withColumn("d1", least(levenshtein($"a", $"b"), lit(3)))
      .withColumn("d2", expr("bounded_levenshtein(a, b, 2)"))
      .where($"d1" =!= $"d2")
      .count()
    assert(diff === 0)
  }

  test("SQL surface inside whole-stage codegen matches the builtin predicate") {
    val rnd = new scala.util.Random(23)
    val alpha = "abcdef"
    def word() = (0 until (3 + rnd.nextInt(9))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = (1 to 3000).map(_ => (word(), word())).toDF("a", "b")
    val viaBuiltin = pairs.where(levenshtein($"a", $"b") <= 2).count()
    val viaBounded = pairs.where(expr("bounded_levenshtein(a, b, 2) <= 2")).count()
    assert(viaBounded === viaBuiltin)
    // and the distances themselves agree in the <= k regime
    val diff = pairs
      .withColumn("d1", levenshtein($"a", $"b"))
      .withColumn("d2", expr("bounded_levenshtein(a, b, 2)"))
      .where($"d1" <= 2 && $"d1" =!= $"d2")
      .count()
    assert(diff === 0)
  }
}
