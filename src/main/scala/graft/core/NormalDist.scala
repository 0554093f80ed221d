package graft.core

import org.apache.commons.math3.special.Erf
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** Native Catalyst `erf` expression (codegen'd, stays inside
  * WholeStageCodegen) — Spark has no built-in erf; the reference computes
  * normal pdf/cdf for probit/IMR/Heckman row-wise in Rust
  * (`oaxaca_blinder/src/math/probit.rs:25-81`, `heckman.rs:57-76`).
  */
case class ErfExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = Erf.erf(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.commons.math3.special.Erf.erf($c)")
  override protected def withNewChildInternal(c: Expression): ErfExpr = copy(child = c)
  override def prettyName: String = "graft_erf"
}

/** Normal pdf / cdf / inverse-cdf, both as Column expressions (pure
  * `functions._` arithmetic + the ErfExpr kernel) and as driver scalars. */
object NormalDist {

  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Idempotently register graft SQL functions on this session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (registered.add(System.identityHashCode(classic).toString)) {
      val reg = classic.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_erf",
        exprs => ErfExpr(exprs.head), "built-in")
      val _ = reg.lookupFunction(FunctionIdentifier("graft_erf")) // warm check
    }
  }

  def erfCol(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_erf", c.cast("double"))
  }

  private val Sqrt2 = math.sqrt(2.0)
  private[graft] val InvSqrt2Pi = 1.0 / math.sqrt(2.0 * math.Pi)

  /** φ(z) in the exact association order of [[pdfCol]]'s codegen
    * (`exp((z*z)*-0.5)` — [[pdf]] computes `exp(-0.5*z*z)`, which can
    * differ in the last ulp): for scalar replays of Column plans. */
  def pdfColOrder(z: Double): Double = InvSqrt2Pi * math.exp(z * z * -0.5)

  /** Φ(z) as a Column. */
  def cdfCol(spark: SparkSession, z: Column): Column =
    lit(0.5) * (lit(1.0) + erfCol(spark, z / lit(Sqrt2)))

  /** φ(z) as a Column. */
  def pdfCol(z: Column): Column =
    lit(InvSqrt2Pi) * exp(z * z * lit(-0.5))

  // ---- driver scalars ----
  def pdf(z: Double): Double = InvSqrt2Pi * math.exp(-0.5 * z * z)
  def cdf(z: Double): Double = 0.5 * (1.0 + Erf.erf(z / Sqrt2))

  /** Φ⁻¹(p) (for prediction-interval z-scores,
    * `engine/src/analysis.rs:477-530`). */
  def inverseCdf(p: Double): Double =
    new org.apache.commons.math3.distribution.NormalDistribution(null, 0.0, 1.0)
      .inverseCumulativeProbability(p)
}
