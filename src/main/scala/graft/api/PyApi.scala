package graft.api

import graft.decompose._
import graft.equity.{Equity, EquityConfig, OptimizeResult}
import graft.estimators.{Akm, AkmResult, Matching}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** py4j-friendly facade backing `python/graft.py` — S9 parity with the
  * reference's pyo3 bindings (`oaxaca_blinder/src/python.rs:193-276`):
  * `OaxacaBlinder(df, ...).fit() / fit_quantile(q) / optimize_budget(b)`.
  *
  * Everything here is shaped for py4j: flat signatures (no Scala
  * default args, Options, or ADTs), `java.util.List` parameters (the
  * gateway auto-converts Python lists), nullable Strings for optional
  * columns, and handle classes whose zero-arg methods Python calls
  * directly. The heavy lifting stays in the library — this file only
  * adapts. PySpark DataFrames cross the bridge as their `_jdf` and come
  * back wrapped by the Python side.
  */
object PyApi {

  private def policy(name: String): RefCoefficients =
    name.toLowerCase match {
      case "group_a" | "groupa" | "a" => RefCoefficients.GroupA
      case "group_b" | "groupb" | "b" => RefCoefficients.GroupB
      case "pooled" | "neumark" => RefCoefficients.Pooled
      case "cotton" => RefCoefficients.Cotton
      case other => throw new IllegalArgumentException(
        s"unknown ref_coefficients '$other' " +
          "(expected group_a | group_b | pooled | cotton)")
    }

  private def cfg(outcome: String, group: String, reference: String,
      predictors: java.util.List[String],
      categorical: java.util.List[String], refPolicy: String,
      bootstrapReps: Int, weights: String, selectionOutcome: String,
      selectionPredictors: java.util.List[String],
      seed: Long): OaxacaConfig =
    OaxacaConfig(outcome, group, reference,
      predictors = predictors.asScala.toSeq,
      categorical = categorical.asScala.toSeq,
      weights = Option(weights),
      refCoefficients = policy(refPolicy),
      bootstrapReps = bootstrapReps,
      seed = seed,
      selectionOutcome = Option(selectionOutcome),
      selectionPredictors = selectionPredictors.asScala.toSeq)

  /** Mean decomposition (python: `OaxacaBlinder(...).fit()`). */
  def fit(df: DataFrame, outcome: String, group: String, reference: String,
      predictors: java.util.List[String],
      categorical: java.util.List[String], refPolicy: String,
      bootstrapReps: Int, weights: String, selectionOutcome: String,
      selectionPredictors: java.util.List[String], seed: Long): PyResults =
    new PyResults(Oaxaca.run(df, cfg(outcome, group, reference, predictors,
      categorical, refPolicy, bootstrapReps, weights, selectionOutcome,
      selectionPredictors, seed)), df.sparkSession)

  /** RIF quantile decomposition (python: `fit_quantile(q)`). */
  def fitQuantile(df: DataFrame, outcome: String, group: String,
      reference: String, predictors: java.util.List[String],
      categorical: java.util.List[String], refPolicy: String,
      bootstrapReps: Int, weights: String, seed: Long,
      tau: Double): PyResults =
    new PyResults(RifDecomposer.decomposeQuantile(df,
      cfg(outcome, group, reference, predictors, categorical, refPolicy,
        bootstrapReps, weights, null,
        java.util.Collections.emptyList[String](), seed), tau),
      df.sparkSession)

  /** DFL reweighting (python: `run_dfl`; the reference's
    * `run_dfl_from_csv` reads a path — here any DataFrame works, so
    * `spark.read.csv(path)` covers the CSV case). */
  def runDfl(df: DataFrame, outcome: String, group: String,
      reference: String, predictors: java.util.List[String]): PyDfl =
    new PyDfl(Dfl.run(df, outcome, group, reference,
      predictors.asScala.toSeq))

  /** AKM two-way fixed effects (python: `estimate_akm`). */
  def estimateAkm(df: DataFrame, outcome: String, workerCol: String,
      firmCol: String, controls: java.util.List[String], tolerance: Double,
      maxIters: Int): PyAkm =
    new PyAkm(Akm.run(df, outcome, workerCol, firmCol,
      controls.asScala.toSeq, tolerance, maxIters))

  /** k-NN matching (python: `match_units`); method is one of
    * euclidean | mahalanobis | propensity. */
  def matchUnits(df: DataFrame, treatmentCol: String,
      covariates: java.util.List[String], k: Int, method: String,
      idCol: String): DataFrame = {
    val m = method.toLowerCase match {
      case "euclidean" => Matching.Euclidean
      case "mahalanobis" => Matching.Mahalanobis
      case "propensity" | "psm" => Matching.Propensity
      case other => throw new IllegalArgumentException(
        s"unknown matching method '$other' " +
          "(expected euclidean | mahalanobis | propensity)")
    }
    Matching.run(df, treatmentCol, covariates.asScala.toSeq, k, m, idCol)
  }

  /** Budgeted pay-equity optimization (python: `optimize_budget(b)`). */
  def optimizeBudget(df: DataFrame, outcome: String, group: String,
      reference: String, predictors: java.util.List[String],
      categorical: java.util.List[String], budget: Double,
      idCol: String): PyOptimize =
    new PyOptimize(Equity.optimize(df,
      EquityConfig(outcome, group, reference,
        predictors = predictors.asScala.toSeq,
        categorical = categorical.asScala.toSeq,
        budget = budget), idCol))
}

/** Decomposition results handle (python: `OaxacaResults`). */
class PyResults(res: OaxacaResults, spark: SparkSession) {
  def totalGap(): Double = res.totalGap
  def nA(): Long = res.nA
  def nB(): Long = res.nB
  def aggregateDf(): DataFrame = res.aggregateDf(spark)
  def detailedDf(): DataFrame = res.detailedDf(spark)
  def toJson(): String = Export.toJson(res)
  def summary(): String = Export.summary(res)
  def interpret(): String = Export.interpret(res)
  def svgBar(): String = Export.toSvgBar(res)
}

/** DFL results handle (python: `DflResult`): the 100-point outcome
  * grid with the two observed densities and the counterfactual. */
class PyDfl(res: DflResult) {
  def grid(): Array[Double] = res.grid
  def densityA(): Array[Double] = res.densityA
  def densityB(): Array[Double] = res.densityB
  def densityBCounterfactual(): Array[Double] = res.densityBCounterfactual
  def logitConverged(): Boolean = res.logitConverged
}

/** AKM results handle (python: `AkmResult`). */
class PyAkm(res: AkmResult) {
  def beta(): Array[Double] = res.beta.toArray
  def controlNames(): java.util.List[String] = res.controlNames.asJava
  def workerEffects(): DataFrame = res.workerEffects
  def firmEffects(): DataFrame = res.firmEffects
  def r2(): Double = res.r2
  def nObs(): Long = res.nObs
}

/** Optimization results handle (python: `BudgetResult`). */
class PyOptimize(res: OptimizeResult) {
  def adjustments(): DataFrame = res.adjustments
  def totalCost(): Double = res.metrics.totalCost
  def originalGap(): Double = res.metrics.originalGap
  def newGap(): Double = res.metrics.newGap
  def originalUnexplainedGap(): Double = res.metrics.originalUnexplainedGap
  def newUnexplainedGap(): Double = res.metrics.newUnexplainedGap
  def requiredBudget(): Double = res.metrics.requiredBudget
}
