package graft

import graft.functions.{CenteredDot, DotProduct}
import org.apache.spark.sql.functions._

/** Unit coverage for the native array kernels (DotProductExpr /
  * CenteredDotExpr) — value equivalence with the higher-order-function
  * formulations they replaced, float widening, and null semantics. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct matches the zip_with/aggregate formulation bit-for-bit") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2, 0.3), Array(-7.5, 2.25, 9.125)),
      (Array.empty[Double], Array.empty[Double])
    ).toDF("a", "b")
    val rows = df.select(
      DotProduct(col("a"), col("b")).as("fused"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), _ + _).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("DotProduct widens float arrays in-loop") {
    val df = Seq((Array(1.5f, 2.5f), Array(2.0, 4.0))).toDF("f", "d")
    val got = df.select(DotProduct(col("f"), col("d"))).head().getDouble(0)
    assert(got == 1.5f.toDouble * 2.0 + 2.5f.toDouble * 4.0)
  }

  test("DotProduct propagates null arrays and null elements") {
    val df = Seq(
      (Some(Seq[java.lang.Double](1.0, 2.0)), None: Option[Seq[java.lang.Double]]),
      (Some(Seq[java.lang.Double](1.0, null)), Some(Seq[java.lang.Double](3.0, 4.0)))
    ).toDF("a", "b")
    val rows = df.select(DotProduct(col("a"), col("b"))).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("mismatched array lengths yield null (zip_with pad semantics)") {
    // zip_with pads the shorter side with nulls, so the higher-order
    // chains these kernels replaced returned null for dimension-
    // mismatched embeddings — a prefix dot would silently mask corrupt
    // data. Interpreted AND codegen paths must agree.
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0)),
      (Array(1.0), Array.empty[Double])
    ).toDF("a", "b")
    val fused = df.select(
      DotProduct(col("a"), col("b")).as("d"),
      CenteredDot(col("a"), col("b"), col("a")).as("c"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), _ + _).as("hof")).collect()
    fused.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1), r.toString)
      assert(r.isNullAt(2), "zip_with reference semantics changed?")
    }
    // interpreted path (eval): same verdict
    import graft.functions.DotProductExpr
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit2 = Literal.create(ArrayData.toArrayData(Array(1.0, 2.0)),
      ArrayType(DoubleType))
    val lit3 = Literal.create(ArrayData.toArrayData(Array(1.0, 2.0, 3.0)),
      ArrayType(DoubleType))
    assert(DotProductExpr(lit2, lit3).eval(null) == null)
    assert(DotProductExpr(lit2, lit2).eval(null) == 5.0)
  }

  test("CenteredDot equals the centered zip_with chain bit-for-bit") {
    val mu = Array(0.5, -1.5, 2.0)
    val q = Array(0.25, 4.0, -3.5)
    val df = Seq(Array(1.0, 2.0, 3.0), Array(-0.125, 0.0, 7.75)).toDF("x")
    val muC = array(mu.map(lit): _*)
    val qC = array(q.map(lit): _*)
    val rows = df.select(
      CenteredDot(col("x"), muC, qC).as("fused"),
      aggregate(zip_with(zip_with(col("x"), muC, (x, m) => x - m), qC,
        (c, w) => c * w), lit(0.0), _ + _).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("the kernels stay inside whole-stage codegen (no ScalaUDF)") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val plan = df.select(DotProduct(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.toLowerCase.contains("dot_product"), plan)
  }
}
