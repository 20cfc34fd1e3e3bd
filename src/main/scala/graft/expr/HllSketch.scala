package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch as a TypedImperativeAggregate —
  * the mutable-buffer aggregate form (the same machinery Spark's own
  * approx_count_distinct uses): a 2^p-byte register array lives in the
  * aggregation buffer, updates are branch-free per row, merges are
  * element-wise max, so partial aggregation and shuffle costs are
  * CONSTANT (4 KB at p=12) regardless of group size — the sketch shape
  * that makes distinct counts affordable at 100 TB.
  *
  * Standard HLL estimator (Flajolet et al.): alpha·m²/Σ2^-M[j] with
  * linear-counting correction for the small range. Deterministic
  * (xxhash64, no randomness).
  */
case class HllSketch(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private def hash(v: Any): Long = v match {
    case null => 0L
    case l: Long => XXH64.hashLong(l, 42L)
    case i: Int => XXH64.hashLong(i.toLong, 42L)
    case s: UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
    case d: Double => XXH64.hashLong(java.lang.Double.doubleToLongBits(d), 42L)
    case other => XXH64.hashLong(other.hashCode().toLong, 42L)
  }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash(v)
      val idx = (h >>> (64 - p)).toInt
      val rest = h << p
      val rank = (if (rest == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > (buffer(idx) & 0xff)) buffer(idx) = rank.toByte
    }
    buffer
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buffer: Array[Byte]): Any = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = buffer(i) & 0xff
      sum += 1.0 / (1L << r)
      if (r == 0) zeros += 1
      i += 1
    }
    var est = alpha * m * m / sum
    if (est <= 2.5 * m && zeros > 0) {
      est = m * math.log(m.toDouble / zeros) // linear counting
    }
    math.round(est)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** The SAME HLL sketch exposing its raw REGISTER ARRAY instead of the
  * estimate — the form that lets a QUERY certify mergeability:
  * registers(A ∪ B) must equal the element-wise max of registers(A)
  * and registers(B) (exactly the `merge` this aggregate runs across
  * partitions, lifted to a relational law — q263). Shares the hash,
  * update and merge of [[HllSketch]] verbatim; eval materializes the
  * 2^p bytes as an int array.
  */
case class HllRegisters(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 1 << p
  private val inner = HllSketch(child, p)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)
  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] =
    inner.update(buffer, input)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)

  override def eval(buffer: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buffer(i) & 0xff; i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_registers"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
