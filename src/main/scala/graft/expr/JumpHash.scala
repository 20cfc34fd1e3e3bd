package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: JUMP CONSISTENT HASH —
  * `jump_hash(key, num_buckets)` (Lamping & Veach, "A Fast, Minimal
  * Memory, Consistent Hash Algorithm", arXiv:1406.2294). The shard
  * router you want at 100 TB: O(ln n) time, ZERO memory (no ring, no
  * lookup table to broadcast), perfectly balanced, and MINIMAL — when
  * the bucket count grows n → n+1, a key either keeps its bucket or
  * moves to the NEW bucket n, never between old buckets, so a
  * resharding job touches exactly the ~1/(n+1) fraction that must
  * move (q267 certifies this law relationally; complements the
  * rendezvous router in ops/Rendezvous, which trades O(n) work per
  * key for weighted buckets).
  *
  * Arithmetic contract (what the DuckDB recursive-CTE replay pins):
  *  - the key state is the paper's uint64 LCG `k = k·2862933555777941757
  *    + 1` — Long wrap-around IS the mod-2⁶⁴ the oracle spells as
  *    HUGEINT `% 2^64`;
  *  - the jump is `j = trunc((b+1) · (2³¹ / double((k >>> 33) + 1)))`
  *    — one IEEE divide + one multiply, both correctly rounded on any
  *    engine, then truncation toward zero (DuckDB: trunc(), NEVER a
  *    bare BIGINT cast — that rounds);
  *  - keys are treated as unsigned; callers feed non-negative ids
  *    (the replay's HUGEINT state has no sign bit to reinterpret);
  *  - num_buckets < 1 → null.
  *
  * Codegen emits a static call into [[JumpHash.bucket]] — stays inside
  * whole-stage codegen; no allocation at all.
  */
case class JumpHash(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "jump_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, int), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(key: Any, n: Any): Any = {
    val buckets = n.asInstanceOf[Int]
    if (buckets < 1) null else JumpHash.bucket(key.asInstanceOf[Long], buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (k, n) => s"""
        |if ($n < 1) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = graft.expr.JumpHash$$.MODULE$$.bucket($k, $n);
        |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JumpHash {

  private final val Lcg = 2862933555777941757L
  private final val TwoPow31 = 2147483648.0

  def bucket(key0: Long, numBuckets: Int): Int = {
    var key = key0
    var b = -1L
    var j = 0L
    while (j < numBuckets) {
      b = j
      key = key * Lcg + 1L
      j = ((b + 1L) * (TwoPow31 / (((key >>> 33) + 1L).toDouble))).toLong
    }
    b.toInt
  }
}
