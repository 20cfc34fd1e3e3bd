package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * The composed form (`zip_with` + `aggregate`, graft.ops.Similarity)
  * is correct but higher-order functions run interpreted — each row
  * allocates lambda frames and boxes elements. This expression is a tight
  * primitive loop with full whole-stage codegen (`doGenCode`), the form
  * SURVEY.md §2.10 reserves for exactly this hot path.
  *
  * Semantics match the composed form bit-for-bit: sequential fold over
  * the element order, products and norms accumulated in double.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // manual input check (ExpectsInputTypes' AbstractDataType is
  // private[sql] in Spark 4, so the trait can't be implemented from an
  // external package)
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left.dataType, right.dataType).forall {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  // Guard rails (result is null, matching the composed form's null on
  // mismatched zip_with lengths, and preventing NaN from poisoning
  // top-k ordering — Spark sorts NaN above every double):
  //  - mismatched vector lengths → null (dimension bugs surface)
  //  - zero-norm input → null (0/0 would be NaN)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xf = x.getFloat(i).toDouble
      val yf = y.getFloat(i).toDouble
      dot += xf * yf
      na += xf * xf
      nb += yf * yf
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        // Locals MUST come from ctx.freshName: with two non-nullable
        // children nullSafeExec emits no scoping braces, so two
        // cosine_sim calls in one generated scope would otherwise
        // redeclare `n`/`dot`/... — a Janino CompileException that Spark
        // silently absorbs as interpreted fallback.
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val i = ctx.freshName("i")
        val xf = ctx.freshName("xf")
        val yf = ctx.freshName("yf")
        s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double $xf = $a.getFloat($i);
        |    double $yf = $b.getFloat($i);
        |    $dot += $xf * $yf; $na += $xf * $xf; $nb += $yf * $yf;
        |  }
        |  if ($na == 0.0 || $nb == 0.0) {
        |    ${ev.isNull} = true;
        |  } else {
        |    ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
        |  }
        |}
        |""".stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
