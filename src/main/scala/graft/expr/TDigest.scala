package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable t-digest state (Dunning's merging-digest form): a sorted
  * array of (mean, weight) centroids merged under the k₁ scale
  * function k(q) = δ/2π · asin(2q−1) — a centroid may absorb its right
  * neighbor while it spans < 1 unit of k — plus a small unmerged-point
  * buffer folded in by a single sorted merge pass when full. k₁'s
  * derivative blows up at q→0,1, so centroids near the median absorb
  * many points while tail centroids stay tiny — that is what makes
  * tail quantiles (p99 and beyond) accurate from ≤ δ centroids while
  * an equi-width histogram would need unbounded bins.
  *
  * State is ≤ ~δ centroids regardless of group size (≈ 6.4 KB
  * serialized at the SQL-registered default δ=200) — the same
  * constant-shuffle-cost story as [[HllSketch]], which is what makes
  * per-group percentile monitoring affordable at 100 TB (the exact
  * `percentile` aggregate buffers EVERY value per group).
  */
final class TDigestBuffer(val compression: Double) extends Serializable {
  var means: Array[Double] = Array.emptyDoubleArray
  var weights: Array[Double] = Array.emptyDoubleArray
  private val cap = math.max(32, (4 * compression).toInt)
  private var bufM: Array[Double] = new Array[Double](cap)
  private var bufW: Array[Double] = new Array[Double](cap)
  private var bufN: Int = 0

  def add(x: Double, w: Double): Unit = {
    if (bufN == cap) compress()
    bufM(bufN) = x
    bufW(bufN) = w
    bufN += 1
  }

  def absorb(other: TDigestBuffer): Unit = {
    other.compress()
    var i = 0
    while (i < other.means.length) {
      add(other.means(i), other.weights(i))
      i += 1
    }
  }

  /** k₁ scale function: equal k-spacing allocates quantile resolution
    * as asin'(2q−1) — dense at the tails, coarse at the median. A
    * centroid is allowed to span at most 1 unit of k, which caps the
    * centroid count at ~δ by construction.
    */
  private def k1(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  /** Fold the point buffer into the centroid array: sort everything by
    * mean, then sweep left-to-right absorbing while the open centroid's
    * quantile span stays under 1 unit of the k₁ scale function.
    */
  def compress(): Unit = {
    if (bufN == 0) return
    val total = means.length + bufN
    val m = java.util.Arrays.copyOf(means, total)
    val w = java.util.Arrays.copyOf(weights, total)
    System.arraycopy(bufM, 0, m, means.length, bufN)
    System.arraycopy(bufW, 0, w, means.length, bufN)
    val idx = Array.range(0, total)
    // sort indices by mean (primitive sort on a packed key would be
    // faster but total ≤ ~5δ, far off any hot path)
    val sorted = idx.sortBy(m(_))
    var totalW = 0.0
    var j = 0
    while (j < total) { totalW += w(j); j += 1 }
    val outM = new Array[Double](total)
    val outW = new Array[Double](total)
    var outN = 0
    var cumBefore = 0.0 // total weight strictly before the open centroid
    var kLeft = k1(0.0) // k at the open centroid's left quantile edge
    sorted.foreach { k =>
      val xm = m(k)
      val xw = w(k)
      if (outN == 0) {
        outM(0) = xm; outW(0) = xw; outN = 1
      } else {
        val cw = outW(outN - 1)
        val qRight = (cumBefore + cw + xw) / totalW
        if (k1(qRight) - kLeft <= 1.0) {
          val nw = cw + xw
          outM(outN - 1) += (xm - outM(outN - 1)) * xw / nw
          outW(outN - 1) = nw
        } else {
          cumBefore += cw
          kLeft = k1(cumBefore / totalW)
          outM(outN) = xm; outW(outN) = xw; outN += 1
        }
      }
    }
    means = java.util.Arrays.copyOf(outM, outN)
    weights = java.util.Arrays.copyOf(outW, outN)
    bufN = 0
  }

  /** Quantile estimate: centroid i's mean is pinned at the midpoint of
    * its weight span; linear interpolation between adjacent midpoints,
    * clamped to the extreme means at the tails.
    */
  def quantile(q: Double): Double = {
    compress()
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    var totalW = 0.0
    var i = 0
    while (i < n) { totalW += weights(i); i += 1 }
    val target = q * totalW
    var cum = 0.0
    var prevMid = 0.0
    i = 0
    while (i < n) {
      val mid = cum + weights(i) / 2
      if (target < mid) {
        if (i == 0) return means(0)
        val frac = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + (means(i) - means(i - 1)) * frac
      }
      prevMid = mid
      cum += weights(i)
      i += 1
    }
    means(n - 1)
  }

  def serialized: Array[Byte] = {
    compress()
    val bb = java.nio.ByteBuffer.allocate(12 + 16 * means.length)
    bb.putDouble(compression)
    bb.putInt(means.length)
    var i = 0
    while (i < means.length) {
      bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1
    }
    bb.array()
  }
}

object TDigestBuffer {
  def deserialize(bytes: Array[Byte]): TDigestBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = new TDigestBuffer(bb.getDouble)
    val n = bb.getInt
    d.means = new Array[Double](n)
    d.weights = new Array[Double](n)
    var i = 0
    while (i < n) {
      d.means(i) = bb.getDouble; d.weights(i) = bb.getDouble; i += 1
    }
    d
  }
}

/** `tdigest_quantile(value, q)` — approximate percentile from O(δ)
  * aggregation state (see [[TDigestBuffer]]). `q` must be a foldable
  * probability in [0, 1]; both requirements are enforced at analysis
  * time (checkInputDataTypes), not discovered as executor-side
  * failures. Registered for SQL by [[GraftExtensions]].
  */
case class TDigestQuantile(
    child: Expression,
    qExpr: Expression,
    compression: Double = 200.0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TDigestBuffer] {

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case n: Number => n.doubleValue()
    case decimal: org.apache.spark.sql.types.Decimal => decimal.toDouble
    case other =>
      // unreachable after checkInputDataTypes; fail loudly, never skip
      throw new IllegalStateException(s"tdigest_quantile: non-numeric value $other")
  }

  // manual input check (ExpectsInputTypes' AbstractDataType is
  // private[sql] in Spark 4, so the trait can't be implemented from an
  // external package — the CosineSimilarity pattern)
  override def checkInputDataTypes(): TypeCheckResult = {
    val numeric = Seq(child.dataType, qExpr.dataType).forall {
      case _: NumericType => true
      case _ => false
    }
    if (!numeric) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires numeric (value, probability) arguments, got " +
          s"${child.dataType.catalogString} and ${qExpr.dataType.catalogString}")
    } else if (!qExpr.foldable) {
      TypeCheckResult.TypeCheckFailure(
        "tdigest_quantile probability must be a constant (foldable) expression")
    } else {
      qExpr.eval(InternalRow.empty) match {
        case null =>
          TypeCheckResult.TypeCheckFailure("tdigest_quantile probability must not be null")
        case v =>
          val d = toDouble(v)
          if (d >= 0.0 && d <= 1.0) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"tdigest_quantile probability must be in [0, 1], got $d")
      }
    }
  }

  private lazy val q: Double = toDouble(qExpr.eval(InternalRow.empty))

  override def createAggregationBuffer(): TDigestBuffer = new TDigestBuffer(compression)

  override def update(buffer: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(toDouble(v), 1.0)
    buffer
  }

  override def merge(a: TDigestBuffer, b: TDigestBuffer): TDigestBuffer = {
    a.absorb(b)
    a
  }

  override def eval(buffer: TDigestBuffer): Any = {
    val r = buffer.quantile(q)
    if (java.lang.Double.isNaN(r)) null else r
  }

  override def serialize(buffer: TDigestBuffer): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): TDigestBuffer = TDigestBuffer.deserialize(bytes)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child, qExpr)
  override def prettyName: String = "tdigest_quantile"

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), qExpr = newChildren(1))
}
