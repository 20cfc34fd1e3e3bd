package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter primitives shared by the aggregate (build) and the
  * membership expression (probe). Kirsch–Mitzenmacher double hashing:
  * position j = h1 + j·h2 (mod m) gives k independent-enough probes from
  * two xxhash64 calls per value. Static methods here are called from
  * generated code (Scala top-level objects emit static forwarders).
  */
object Bloom {

  /** Canonical 64-bit hash of a value (matches HllSketch's typing). */
  def hash64(v: Any): Long = v match {
    case null => 0L
    case l: java.lang.Long => XXH64.hashLong(l, 77L)
    case i: java.lang.Integer => XXH64.hashLong(i.toLong, 77L)
    case s: UTF8String => XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 77L)
    case d: java.lang.Double => XXH64.hashLong(java.lang.Double.doubleToLongBits(d), 77L)
    case other => XXH64.hashLong(other.hashCode().toLong, 77L)
  }

  private def h2of(h1: Long): Long = XXH64.hashLong(h1, 0x9E3779B97F4A7C15L) | 1L

  def set(bits: Array[Byte], h1: Long, k: Int): Unit = {
    val m = bits.length.toLong * 8L
    val h2 = h2of(h1)
    var j = 0
    while (j < k) {
      val pos = java.lang.Math.floorMod(h1 + j.toLong * h2, m)
      bits((pos >>> 3).toInt) = (bits((pos >>> 3).toInt) | (1 << (pos & 7L).toInt)).toByte
      j += 1
    }
  }

  def mightContainHashed(bits: Array[Byte], h1: Long, k: Int): Boolean = {
    val m = bits.length.toLong * 8L
    val h2 = h2of(h1)
    var j = 0
    while (j < k) {
      val pos = java.lang.Math.floorMod(h1 + j.toLong * h2, m)
      if ((bits((pos >>> 3).toInt) & (1 << (pos & 7L).toInt)) == 0) return false
      j += 1
    }
    true
  }

  // typed entry points for generated code (no boxing in the hot path)
  def mightContainLong(bits: Array[Byte], v: Long, k: Int): Boolean =
    mightContainHashed(bits, XXH64.hashLong(v, 77L), k)
  def mightContainUTF8(bits: Array[Byte], s: UTF8String, k: Int): Boolean =
    mightContainHashed(
      bits, XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 77L), k)
}

/** Bloom-filter build aggregate: OR-mergeable fixed-size bitset in the
  * aggregation buffer (BinaryType output), the same constant-state shape
  * as [[HllSketch]] — a 100 TB group costs the same 2^log2bits bits as a
  * small one, partials merge with a byte-wise OR.
  *
  * Sizing rule: false-positive rate ≈ (1 − e^(−k·n/m))^k; for 1% use
  * m ≈ 10·n bits with k = 7. The 2^20-bit (128 KiB) default holds ~100k
  * keys at 1% — size log2bits for YOUR dimension cardinality, the
  * filter is broadcast once per query.
  */
case class BloomSketch(
    child: Expression,
    log2bits: Int = 20,
    k: Int = 7,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Byte]] {

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << (log2bits - 3))

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Bloom.set(buffer, Bloom.hash64(v), k)
    buffer
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Membership probe: `might_contain(bloom, value)` — false means the
  * value is DEFINITELY absent (safe to drop pre-shuffle), true means
  * probably present (the exact join downstream removes false positives).
  * Codegen'd via static calls into [[Bloom]]; `k` must match the build
  * side.
  */
case class BloomMightContain(left: Expression, right: Expression, k: Int = 7)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain"

  override def nullSafeEval(bloom: Any, value: Any): Any =
    Bloom.mightContainHashed(bloom.asInstanceOf[Array[Byte]], Bloom.hash64(value), k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (bf, v) => {
        import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
        val call = right.dataType match {
          case LongType => s"graft.expr.Bloom.mightContainLong($bf, $v, $k)"
          case IntegerType => s"graft.expr.Bloom.mightContainLong($bf, (long)$v, $k)"
          case StringType => s"graft.expr.Bloom.mightContainUTF8($bf, $v, $k)"
          case _ => s"graft.expr.Bloom.mightContainHashed($bf, graft.expr.Bloom.hash64((Object)$v), $k)"
        }
        s"${ev.value} = $call;"
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
