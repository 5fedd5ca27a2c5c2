package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused native vector kernels (SURVEY.md §4 custom work #2).
  *
  * The composed higher-order-function forms
  * (`aggregate(zip_with(...))`) are NOT whole-stage-codegen'd — every
  * distance evaluation walks an interpreted expression tree per
  * element, which measured ~1 ms per 64-dim distance and dominated the
  * kNN/similarity benchmarks. These expressions generate a tight Java
  * loop over the raw `ArrayData` instead, while keeping BIT-IDENTICAL
  * semantics to the HOF form (same left-to-right double-precision
  * fold, same null propagation, so the DuckDB oracles and the HOF
  * mirrors in [[graft.functions.VectorFunctions]] agree to the last
  * ulp — asserted by VectorExpressionsSpec).
  *
  * Accepted element types: float or double arrays (dims are data, not
  * schema — SURVEY.md §1.3); floats widen exactly to double.
  */
abstract class VectorBinaryFold extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected final def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected final def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @inline protected final def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected final def genGet(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** Σ aᵢ·bᵢ, left fold in double. Null on length mismatch or null
  * element — matching `aggregate(zip_with(...))`. */
case class VectorDot(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (lf, rf) = (leftIsFloat, rightIsFloat)
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, lf) * elem(b, i, rf)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, acc, bad) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("acc"), ctx.freshName("bad"))
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += ${genGet(a, i, leftIsFloat)} * ${genGet(b, i, rightIsFloat)};
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)², left fold in double (squared L2). */
case class VectorL2Sq(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "vector_l2sq"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (lf, rf) = (leftIsFloat, rightIsFloat)
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = elem(a, i, lf) - elem(b, i, rf)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, acc, bad, d) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("acc"), ctx.freshName("bad"), ctx.freshName("d"))
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $d = ${genGet(a, i, leftIsFloat)} - ${genGet(b, i, rightIsFloat)};
         |    $acc += $d * $d;
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in ONE pass (dot, ‖a‖², ‖b‖² accumulated
  * together); 0.0 for zero-norm inputs, matching the HOF form's
  * `when(nn === 0, 0)` guard. Each accumulator is an independent
  * left fold, so the sums equal the three-pass HOF form bit-for-bit. */
case class VectorCosine(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "vector_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (lf, rf) = (leftIsFloat, rightIsFloat)
    var dab = 0.0
    var daa = 0.0
    var dbb = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, lf)
      val y = elem(b, i, rf)
      dab += x * y
      daa += x * x
      dbb += y * y
      i += 1
    }
    val nn = math.sqrt(daa) * math.sqrt(dbb)
    if (nn == 0.0) 0.0 else dab / nn
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, bad) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("bad"))
      val (dab, daa, dbb) = (ctx.freshName("dab"), ctx.freshName("daa"), ctx.freshName("dbb"))
      val (x, y, nn) = (ctx.freshName("x"), ctx.freshName("y"), ctx.freshName("nn"))
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dab = 0.0; double $daa = 0.0; double $dbb = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $x = ${genGet(a, i, leftIsFloat)};
         |    double $y = ${genGet(b, i, rightIsFloat)};
         |    $dab += $x * $y; $daa += $x * $x; $dbb += $y * $y;
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else {
         |    double $nn = java.lang.Math.sqrt($daa) * java.lang.Math.sqrt($dbb);
         |    ${ev.value} = ($nn == 0.0) ? 0.0 : $dab / $nn;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorCosine =
    copy(left = newLeft, right = newRight)
}
