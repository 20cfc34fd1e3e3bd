package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate kernel shared by interpreted eval and generated code. The
  * Deflater is ThreadLocal-reused: per-row construction costs more than
  * the compression itself on short documents. BEST_SPEED, nowrap —
  * the signal needs relative compressibility, not good compression.
  */
object DeflateKernel {
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
  }
  private val sink = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  /** compressed bytes / raw bytes (empty input → 1.0). Deterministic for
    * a fixed zlib (the JDK bundles its own), independent of row order.
    */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    var out = 0L
    val buf = sink.get()
    while (!d.finished()) out += d.deflate(buf)
    out.toDouble / raw.length.toDouble
  }
}

/** `deflate_ratio(text)` — compressed-size / raw-size of the UTF-8 text,
  * the compressibility quality signal from the published corpus-filter
  * stacks (boilerplate and template spam compress far better than
  * natural prose, catching repetition that token-level heuristics miss).
  * Map-side, zero shuffle; whole-stage codegen via a ThreadLocal-reused
  * deflate kernel (the loop body is one virtual call, not an allocation).
  * Registered for SQL by [[GraftExtensions]].
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    DeflateKernel.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // call the kernel singleton through its MODULE$ field — a compile-time
    // constant in the generated Java, so nothing rides the task closure
    // (addReferenceObj would serialize the kernel, whose ThreadLocals
    // aren't serializable)
    defineCodeGen(ctx, ev, c => s"graft.expr.DeflateKernel$$.MODULE$$.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
