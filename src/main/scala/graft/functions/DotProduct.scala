package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared helpers for the fused array kernels below: element accessors
  * for array<float> / array<double> children (floats widen to double,
  * exactly like the `x.cast("double")` the higher-order formulations
  * applied per element — but without materializing a cast array). */
private[functions] object ArrayKernel {
  def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }
  def get(t: DataType, a: ArrayData, i: Int): Double = t match {
    case ArrayType(FloatType, _) => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }
  def genGet(t: DataType, a: String, i: String): String = t match {
    case ArrayType(FloatType, _) => s"((double) $a.getFloat($i))"
    case _ => s"$a.getDouble($i)"
  }
}

/** Dot product of two numeric arrays as a NATIVE codegen expression —
  * the hot kernel of every cosine in the ANN / embedding-dedup family.
  *
  * The higher-order-function formulation
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` materializes an
  * intermediate array PER ROW and dispatches a lambda per element; on
  * the within-cell pair join (millions of candidate pairs × vector
  * dimension) that allocation + dispatch dominates the arithmetic.
  * This expression is one allocation-free fused loop over the two
  * `ArrayData`, inlined into whole-stage codegen.
  *
  * Semantics: sum over a(i) * b(i), left to right (the same FP
  * association as the chain it replaces); a null ELEMENT on either side
  * makes the result null, and so does a LENGTH mismatch — `zip_with`
  * pads the shorter array with nulls, so the chain this replaces
  * returned null for dimension-mismatched embeddings rather than a
  * plausible-looking prefix cosine that would mask corrupt data. Norms
  * need no second kernel: |a| = sqrt(dot(a, a)). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult =
    if (ArrayKernel.isNumericArray(left.dataType) &&
        ArrayKernel.isNumericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<double|float> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  // null element => null result, signalled in-band (the boxed path)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += ArrayKernel.get(left.dataType, a, i) *
        ArrayKernel.get(right.dataType, b, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |double $dot = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $dot += ${ArrayKernel.genGet(left.dataType, a, s"$i")} *
         |    ${ArrayKernel.genGet(right.dataType, b, s"$i")};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Centered dot product sum_i (x_i - mu_i) * q_i as ONE fused loop —
  * the PCA projection/whitening kernel. Algebraically x.q - mu.q, but
  * evaluated in exactly the per-element association of the
  * zip_with(center) -> zip_with(scale) -> aggregate chain it replaces,
  * so every oracle value (and the DuckDB twin that mirrors that
  * arithmetic) is bit-identical. */
case class CenteredDotExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "centered_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(c =>
        ArrayKernel.isNumericArray(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs three array<double|float> inputs")

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val xv = first.eval(input)
    if (xv == null) return null
    val mv = second.eval(input)
    if (mv == null) return null
    val qv = third.eval(input)
    if (qv == null) return null
    val x = xv.asInstanceOf[ArrayData]
    val m = mv.asInstanceOf[ArrayData]
    val q = qv.asInstanceOf[ArrayData]
    val n = x.numElements()
    // zip_with semantics: mismatched lengths pad with null => null result
    if (n != m.numElements() || n != q.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || m.isNullAt(i) || q.isNullAt(i)) return null
      acc += (ArrayKernel.get(first.dataType, x, i) -
        ArrayKernel.get(second.dataType, m, i)) *
        ArrayKernel.get(third.dataType, q, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, m, q) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |if ($n != $m.numElements() || $n != $q.numElements()) {
         |  ${ev.isNull} = true;
         |} else for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $m.isNullAt($i) || $q.isNullAt($i)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $acc += (${ArrayKernel.genGet(first.dataType, x, s"$i")} -
         |    ${ArrayKernel.genGet(second.dataType, m, s"$i")}) *
         |    ${ArrayKernel.genGet(third.dataType, q, s"$i")};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CenteredDotExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DotProduct {
  /** Allocation-free dot product over two array<double|float> columns. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

object CenteredDot {
  /** Allocation-free sum_i (x_i - mu_i) * q_i. */
  def apply(x: Column, mu: Column, q: Column): Column =
    GraftSqlBridge.column(CenteredDotExpr(GraftSqlBridge.expression(x),
      GraftSqlBridge.expression(mu), GraftSqlBridge.expression(q)))
}
