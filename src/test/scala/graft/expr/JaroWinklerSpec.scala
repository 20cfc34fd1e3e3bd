package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation over code-point sequences — the textbook
    * Jaro + conditional (boost threshold 0.7) Winkler form the native
    * expression must reproduce (and which DuckDB's
    * jaro_winkler_similarity was probed to match on 3000 random pairs,
    * save both-empty → 0.0).
    */
  private def ref(a: String, b: String): Double = {
    val s = a.codePoints().toArray
    val u = b.codePoints().toArray
    val (n, m) = (s.length, u.length)
    if (n == 0 || m == 0) return 0.0
    if (s.sameElements(u)) return 1.0
    val window = math.max(n, m) / 2 - 1
    val ma = Array.fill(n)(false)
    val mb = Array.fill(m)(false)
    var matches = 0
    for (i <- 0 until n) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, m)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!mb(j) && s(i) == u(j)) { ma(i) = true; mb(j) = true; matches += 1; done = true }
        j += 1
      }
    }
    if (matches == 0) return 0.0
    var (t, k) = (0, 0)
    for (i <- 0 until n if ma(i)) {
      while (!mb(k)) k += 1
      if (s(i) != u(k)) t += 1
      k += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - t / 2) / mm) / 3.0
    var p = 0
    while (p < math.min(4, math.min(n, m)) && s(p) == u(p)) p += 1
    if (jaro > 0.7) jaro + p * 0.1 * (1.0 - jaro) else jaro
  }

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
  }

  test("edges: empties, 1-char window, boost threshold") {
    assert(jw("", "") === 0.0) // the DuckDB both-empty edge
    assert(jw("", "a") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("a", "a") === 1.0)
    assert(jw("a", "b") === 0.0) // window = -1: no matches possible
    // jaro below 0.7 must NOT receive the prefix bonus even with a
    // shared 4-prefix: construct a long mostly-different pair
    val a = "abcdzzzzzzzzzzzz"
    val b = "abcdqqqqqqqqqqqq"
    val j = jw(a, b)
    assert(j === ref(a, b))
    assert(j <= 0.7 + 1e-9 || j > 0.7) // consistency with ref either way
  }

  test("reference parity on 5000 random pairs (ASCII fast path)") {
    val rnd = new scala.util.Random(23)
    val alpha = "abcdef"
    def word() = (0 until rnd.nextInt(10)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 5000) {
      val (x, y) = (word(), word())
      assert(jw(x, y) === ref(x, y), s"'$x' vs '$y'")
    }
  }

  test("reference parity on unicode / astral-plane pairs (code-point path)") {
    val rnd = new scala.util.Random(41)
    val alpha = Seq("a", "b", "😀", "😁", "é", "中", "ß")
    def word() = (0 until rnd.nextInt(8)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 2000) {
      val (x, y) = (word(), word())
      assert(jw(x, y) === ref(x, y), s"'$x' vs '$y'")
    }
    // one code point ≠ two UTF-16 units: 😀 vs 😁 share no code point
    assert(jw("😀", "😁") === 0.0)
  }

  test("SQL registration + codegen path agree with direct eval") {
    val rnd = new scala.util.Random(59)
    val alpha = "abcde"
    def word() = (0 until rnd.nextInt(10)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = (1 to 500).map(_ => (word(), word()))
    val viaSql = pairs.toDF("a", "b")
      .withColumn("jw", expr("jaro_winkler(a, b)"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    viaSql.foreach { case (x, y, v) => assert(v === jw(x, y), s"'$x' vs '$y'") }
    // null-in-null-out
    val nulls = spark.sql(
      "SELECT jaro_winkler(CAST(NULL AS STRING), 'a') AS v1, " +
        "jaro_winkler('a', CAST(NULL AS STRING)) AS v2")
      .collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }
}
