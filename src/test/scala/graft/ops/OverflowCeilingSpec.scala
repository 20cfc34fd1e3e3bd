package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OVERFLOW-CEILING PROOF for the scaled-integer iterative queries
  * (closes the r10 ADVICE loop on the 85b1b8e widening of
  * q282/q289/q301/q302/q307): the power-iteration mass term
  * `v · cnt` sits on the 10¹² grid, so a transition cell past
  * ~9.2 M counts pushes the product over Long.MaxValue (9.22·10¹⁸).
  * Spark's non-ANSI long arithmetic WRAPS silently there, while the
  * DuckDB oracle computes the same term in HUGEINT (exact) — the
  * registry queries stage the first factor to decimal(38,0) so both
  * engines stay exact.
  *
  * This spec synthesizes a 3-state chain whose largest cell is 12 M
  * counts — PAST the ceiling — and pins two facts the sf0.01/sf0.1
  * correctness runs cannot reach (their cells top out far below 9.2 M):
  *
  *   1. the widened expression (the exact string q282 uses) replays
  *      SIX power-iteration rounds bit-identically to exact BigInt
  *      arithmetic — the same result HUGEINT gives, since both are
  *      exact integer semantics with floor division on positives;
  *   2. the UN-widened long form diverges on the same data — the
  *      synthesized cells genuinely cross the ceiling, so the test
  *      would catch a regression that quietly drops the widening.
  */
class OverflowCeilingSpec extends SparkSpec {

  private val V0 = 1000000000000L // the 10^12 mass grid q282 uses

  // (i, j, cnt): the (a,b) cell is 30M — with the uniform start
  // v(a) = 10¹²/3, the very first round's product v(a)·cnt(a,b) =
  // 3.33·10¹¹ × 3·10⁷ = 10¹⁹ > Long.MaxValue (9.22·10¹⁸), i.e. the
  // synthesized chain crosses the ceiling in round 1 (the in-registry
  // corpora top out far below it). Asymmetric back-transitions keep
  // the rounds from collapsing to a fixpoint.
  private val cells: Seq[(String, String, Long)] = Seq(
    ("a", "b", 30000000L),
    ("a", "c", 5L),
    ("b", "a", 9500000L),
    ("b", "c", 3L),
    ("c", "a", 7L),
    ("c", "b", 2L)
  )

  /** Exact BigInt replay of six v·P rounds with floor division —
    * HUGEINT semantics (all terms positive, so BigInt / == floor). */
  private def bigIntReference(): Map[String, BigInt] = {
    val rs: Map[String, BigInt] =
      cells.groupBy(_._1).map { case (i, cs) => i -> BigInt(cs.map(_._3).sum) }
    var v: Map[String, BigInt] =
      Seq("a", "b", "c").map(i => i -> BigInt(V0 / 3)).toMap
    for (_ <- 1 to 6) {
      val next = scala.collection.mutable.Map.empty[String, BigInt].withDefaultValue(BigInt(0))
      for ((i, j, cnt) <- cells; vi <- v.get(i))
        next(j) += (vi * cnt) / rs(i)
      v = next.toMap
    }
    v
  }

  private def chain(widened: Boolean): DataFrame = {
    import spark.implicits._
    val m = broadcast(
      cells
        .toDF("i", "j", "cnt")
        .join(
          cells.toDF("i", "j", "cnt").groupBy("i").agg(sum("cnt").as("rs")),
          Seq("i")))
    var v = Seq("a", "b", "c").toDF("i").select(col("i"), lit(V0 / 3).as("v"))
    val contrib =
      if (widened) "(cast(v as decimal(38,0)) * cnt) div rs" // the q282 form
      else "(v * cnt) div rs" // the pre-85b1b8e long form: wraps silently
    for (_ <- 1 to 6) {
      v = v
        .join(m, Seq("i"))
        .select(col("j"), expr(contrib).as("contrib"))
        .groupBy(col("j"))
        .agg(sum(col("contrib")).as("v"))
        .withColumnRenamed("j", "i")
    }
    v
  }

  test("widened q282 power-iteration form is exact past the int64 v*cnt ceiling") {
    val ref = bigIntReference()
    // `div` (integral divide) returns LONG: the decimal staging covers
    // the PRODUCT, and the quotient is ≤ v ≤ 10¹² — the q282 design
    val got = chain(widened = true)
      .collect()
      .map(r => r.getString(0) -> BigInt(r.getLong(1)))
      .toMap
    assert(got.keySet == ref.keySet)
    for ((k, expected) <- ref)
      assert(got(k) == expected, s"state $k: got ${got(k)}, exact $expected")
    // sanity: the data really crosses the ceiling — the largest
    // first-round product exceeds Long.MaxValue
    val maxProduct = BigInt(V0 / 3) * 30000000L
    assert(maxProduct > BigInt(Long.MaxValue))
  }

  test("un-widened long form wraps on the same data (ceiling is load-bearing)") {
    val ref = bigIntReference()
    val wrapped = chain(widened = false)
      .collect()
      .map(r => r.getString(0) -> BigInt(r.getLong(1)))
      .toMap
    // at least one state must diverge — otherwise the synthesized data
    // never crossed the ceiling and test 1 proves nothing
    assert(
      ref.exists { case (k, v) => wrapped(k) != v },
      "long-form replay matched exact arithmetic — ceiling not crossed")
  }
}
