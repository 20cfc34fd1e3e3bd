package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the PQ hot path (round 5).
  *
  * graft.ops.Pq originally composed per-subspace argmin encoding and
  * ADC scoring from `zip_with`/`aggregate` higher-order functions
  * against a nested codebook literal. Correct, but HOFs run
  * INTERPRETED — and these are the two expressions q94 evaluates
  * n×m×ksub (encode) and n_q×n×m (scoring) times: the profiler put
  * ~2.5 s of q94's ~5.8 s inside those lambda frames at sf0.1.
  * These expressions are the tight-loop `doGenCode` forms (the
  * CosineSimilarity pattern); the codebook travels as ONE reference
  * object instead of a plan literal.
  *
  * Bit-exactness contract (the q94 generated oracle replays this
  * arithmetic in SQL, so it is pinned by the driver's hash): the loops
  * reproduce the HOF forms' accumulation orders exactly —
  *  - encode: dist(s, c) = Σ_j ((v[s·dsub+j] − w_j)²) accumulated
  *    left-to-right from 0.0; argmin by (dist, code) under the same
  *    NaN-totality as Spark's struct array_min (Double.compare);
  *  - score: Σ_s (Σ_j v[s·dsub+j]·w_j) — both folds left-to-right
  *    from 0.0.
  */
private[graft] object PqCodec {
  /** (m, ksub, dsub) of a dense codebook, with shape validation. */
  def shape(cb: Array[Array[Array[Double]]]): (Int, Int, Int) = {
    require(cb.nonEmpty && cb.head.nonEmpty && cb.head.head.nonEmpty, "empty codebook")
    val (m, ksub, dsub) = (cb.length, cb.head.length, cb.head.head.length)
    require(cb.forall(s => s.length == ksub && s.forall(_.length == dsub)), "ragged codebook")
    (m, ksub, dsub)
  }
}

/** codes(v): per-subspace nearest-codeword ids for an array<double>
  * vector — array<int> of length m. Null on a dimension mismatch
  * (the composed form's null-poisoning made the same bug surface as
  * null rows).
  */
case class PqEncodeCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val (m, ksub, dsub) = PqCodec.shape(codebooks)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = 0.0
      var c = 0
      while (c < ksub) {
        val w = codebooks(s)(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val x = v.getDouble(s * dsub + j) - w(j)
          d += x * x
          j += 1
        }
        if (c == 0 || java.lang.Double.compare(d, bestD) < 0) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(
      ctx,
      ev,
      v => {
        val codes = ctx.freshName("codes")
        val s = ctx.freshName("s")
        val c = ctx.freshName("c")
        val j = ctx.freshName("j")
        val w = ctx.freshName("w")
        val d = ctx.freshName("d")
        val x = ctx.freshName("x")
        val best = ctx.freshName("best")
        val bestD = ctx.freshName("bestD")
        s"""
        |if ($v.numElements() != ${m * dsub}) {
        |  ${ev.isNull} = true;
        |} else {
        |  int[] $codes = new int[$m];
        |  for (int $s = 0; $s < $m; $s++) {
        |    int $best = 0; double $bestD = 0.0;
        |    for (int $c = 0; $c < $ksub; $c++) {
        |      double[] $w = $cbRef[$s][$c];
        |      double $d = 0.0;
        |      for (int $j = 0; $j < $dsub; $j++) {
        |        double $x = $v.getDouble($s * $dsub + $j) - $w[$j];
        |        $d += $x * $x;
        |      }
        |      if ($c == 0 || Double.compare($d, $bestD) < 0) { $bestD = $d; $best = $c; }
        |    }
        |    $codes[$s] = $best;
        |  }
        |  ${ev.value} =
        |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
        |}
        |""".stripMargin
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** score(q, codes): ADC similarity — Σ_s dot(q_sub_s, codeword(code_s)).
  * Null on dimension mismatch or an out-of-range code (instead of a
  * task-killing ArrayIndexOutOfBounds on corrupt input).
  */
case class PqAdcScore(
    left: Expression,
    right: Expression,
    codebooks: Array[Array[Array[Double]]]
) extends BinaryExpression {

  private val (m, ksub, dsub) = PqCodec.shape(codebooks)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<int>), got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub || codes.numElements() != m) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub) return null
      val w = codebooks(s)(c)
      var d = 0.0
      var j = 0
      while (j < dsub) {
        d += v.getDouble(s * dsub + j) * w(j)
        j += 1
      }
      acc += d
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val acc = ctx.freshName("acc")
        val s = ctx.freshName("s")
        val c = ctx.freshName("c")
        val j = ctx.freshName("j")
        val w = ctx.freshName("w")
        val d = ctx.freshName("d")
        val bad = ctx.freshName("bad")
        s"""
        |if ($a.numElements() != ${m * dsub} || $b.numElements() != $m) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $acc = 0.0;
        |  boolean $bad = false;
        |  for (int $s = 0; $s < $m && !$bad; $s++) {
        |    int $c = $b.getInt($s);
        |    if ($c < 0 || $c >= $ksub) { $bad = true; break; }
        |    double[] $w = $cbRef[$s][$c];
        |    double $d = 0.0;
        |    for (int $j = 0; $j < $dsub; $j++) {
        |      $d += $a.getDouble($s * $dsub + $j) * $w[$j];
        |    }
        |    $acc += $d;
        |  }
        |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
        |}
        |""".stripMargin
      }
    )
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}
