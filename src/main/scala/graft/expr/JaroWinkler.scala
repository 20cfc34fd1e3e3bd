package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity —
  * `jaro_winkler(a, b)` ∈ [0, 1], the prefix-boosted edit similarity
  * (Winkler 1990) that entity-resolution scoring uses for short name
  * fields where Levenshtein's unit costs are too coarse.
  *
  * Exact variant notes (pinned by JaroWinklerSpec, chosen for
  * DuckDB-oracle parity — probed over 3000 random string pairs):
  *  - Jaro match window is max(|a|, |b|)/2 − 1 (can be negative for
  *    1-char strings → zero matches);
  *  - the Winkler prefix bonus (scale 0.1, prefix capped at 4) applies
  *    only when jaro > 0.7 (the classic boost threshold);
  *  - BOTH inputs empty → 0.0 (the reference-implementation edge,
  *    diverging from the "two empty strings are identical" reading);
  *    equal non-empty strings → 1.0 without running the DP.
  *
  * Comparison is over UNICODE CODE POINTS (the BoundedLevenshtein
  * discipline): a supplementary-plane character is one unit. Pure-ASCII
  * inputs (byte count == char count) run directly over the UTF8String
  * bytes — no String materialization; the only allocations are the two
  * boolean match flags arrays.
  *
  * Codegen emits a static call into [[JaroWinkler.similarity]] — the
  * expression stays inside whole-stage codegen.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"${ev.value} = graft.expr.JaroWinkler$$.MODULE$$.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  private val BoostThreshold = 0.7
  private val PrefixScale = 0.1
  private val MaxPrefix = 4

  def similarity(a: UTF8String, b: UTF8String): Double = {
    val n = a.numChars()
    val m = b.numChars()
    if (n == 0 || m == 0) return 0.0 // both-empty included: the DuckDB edge
    if (a.equals(b)) return 1.0
    if (n == a.numBytes() && m == b.numBytes()) jwAscii(a, b, n, m)
    else jwCp(codePoints(a.toString, n), codePoints(b.toString, m))
  }

  /** ASCII fast path: bytes ARE code points; compare in place. */
  private def jwAscii(a: UTF8String, b: UTF8String, n: Int, m: Int): Double = {
    val window = math.max(n, m) / 2 - 1
    val ma = new Array[Boolean](n)
    val mb = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, m)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!mb(j) && a.getByte(i) == b.getByte(j)) {
          ma(i) = true; mb(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < n) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) t += 1
        k += 1
      }
      i += 1
    }
    var prefix = 0
    val pMax = math.min(MaxPrefix, math.min(n, m))
    while (prefix < pMax && a.getByte(prefix) == b.getByte(prefix)) prefix += 1
    finish(matches, t / 2, n, m, prefix)
  }

  /** General path over pre-decoded code-point arrays. */
  private def jwCp(s: Array[Int], u: Array[Int]): Double = {
    val n = s.length
    val m = u.length
    val window = math.max(n, m) / 2 - 1
    val ma = new Array[Boolean](n)
    val mb = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, m)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!mb(j) && s(i) == u(j)) {
          ma(i) = true; mb(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < n) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (s(i) != u(k)) t += 1
        k += 1
      }
      i += 1
    }
    var prefix = 0
    val pMax = math.min(MaxPrefix, math.min(n, m))
    while (prefix < pMax && s(prefix) == u(prefix)) prefix += 1
    finish(matches, t / 2, n, m, prefix)
  }

  /** Shared scoring tail — the arithmetic ORDER here is the cross-engine
    * contract: (m/l1 + m/l2 + (m−t)/m) / 3, then the conditional
    * Winkler boost j + p·0.1·(1−j).
    */
  private def finish(matches: Int, transpositions: Int, n: Int, m: Int, prefix: Int): Double = {
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - transpositions) / mm) / 3.0
    if (jaro > BoostThreshold) jaro + prefix * PrefixScale * (1.0 - jaro)
    else jaro
  }

  private def codePoints(s: String, n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var ci = 0
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(ci)
      out(i) = cp
      ci += Character.charCount(cp)
      i += 1
    }
    out
  }
}
