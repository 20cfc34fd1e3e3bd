package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items state: at most `k` (item, counter) pairs.
  *
  * Stream update is the classic algorithm (increment if tracked, insert
  * if room, otherwise decrement every counter and drop zeros); merge is
  * the mergeable-summaries form (Agarwal et al., PODS '12): sum the two
  * counter sets, then subtract the (k+1)-th largest counter from all and
  * drop the non-positive — the result is again ≤ k counters and the
  * combined error stays ≤ n/(k+1).
  *
  * Guarantees (deterministic, independent of partitioning/merge order):
  *   - estimate ≤ true frequency ≤ estimate + n/(k+1)  (underestimates)
  *   - every item with true frequency > n/(k+1) is retained
  *   - if the number of distinct items never exceeds k, no decrement
  *     ever fires and every estimate is EXACT — which is what lets the
  *     registry query oracle it against a plain GROUP BY count
  * The retained-set CONTENT below the guarantee line may vary with merge
  * order (like any MG implementation); callers needing cross-run stable
  * output stay in the exact regime or compare only guaranteed items.
  */
final class MGBuffer(val k: Int) extends Serializable {
  val counts = new java.util.HashMap[String, java.lang.Long]()

  def add(t: String): Unit = {
    val cur = counts.get(t)
    if (cur != null) counts.put(t, cur + 1L)
    else if (counts.size < k) counts.put(t, 1L)
    else {
      // full and untracked: decrement all, drop zeros (amortized O(1)
      // per stream item — each decrement pays back k prior increments)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def absorb(other: MGBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest counter, drop non-positive
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - (k + 1)) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= sub) eit.remove() else e.setValue(e.getValue - sub)
      }
    }
  }

  def serialized: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(k)
    out.writeInt(counts.size)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed UTF-8, NOT writeUTF: writeUTF throws on items
      // over 65535 encoded bytes (a raw document text used as the item)
      val bytes = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }
}

object MGBuffer {
  def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new MGBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      b.counts.put(new String(bytes, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    b
  }
}

/** `heavy_hitters(item, k)` — Misra–Gries frequent-items aggregate over
  * a string column; returns map<string,bigint> of ≤ k retained items and
  * their (under-)estimated counts. State is ≤ k counters regardless of
  * group size — constant shuffle bytes per group, the property that
  * makes corpus-wide token/domain/URL frequency tracking affordable at
  * 100 TB where an exact GROUP BY item would shuffle the full item
  * universe. `k` must be a foldable positive int (analysis-time check,
  * same manual pattern as [[TDigestQuantile]] — ExpectsInputTypes is
  * private[sql]). Registered for SQL by [[GraftExtensions]].
  */
case class MisraGries(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[MGBuffer] {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string item column, got ${child.dataType.catalogString}")
    } else if (
      !kExpr.foldable ||
      !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType)
    ) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName counter budget k must be a constant integer")
    } else {
      kExpr.eval(InternalRow.empty) match {
        case null => TypeCheckResult.TypeCheckFailure(s"$prettyName k must not be null")
        case v: Number if v.longValue() >= 1 && v.longValue() <= 1000000 =>
          TypeCheckResult.TypeCheckSuccess
        case v =>
          TypeCheckResult.TypeCheckFailure(s"$prettyName k must be in [1, 1e6], got $v")
      }
    }
  }

  private lazy val k: Int =
    kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buffer: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
    a.absorb(b)
    a
  }

  override def eval(buffer: MGBuffer): Any = {
    val n = buffer.counts.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var i = 0
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = e.getValue.longValue()
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(buffer: MGBuffer): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): MGBuffer = MGBuffer.deserialize(bytes)

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def prettyName: String = "heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
