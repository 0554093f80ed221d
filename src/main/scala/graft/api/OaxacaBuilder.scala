package graft.api

import graft.core.InvalidGroupVariable
import graft.decompose._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** R-style formula (`oaxaca_blinder/src/formula.rs:12-61`):
  * "outcome ~ a + b + C(cat)" (factor(...) also accepted). */
final case class Formula(
    outcome: String,
    predictors: Seq[String],
    categoricalPredictors: Seq[String])

object Formula {
  def parse(s: String): Formula = {
    val parts = s.split('~')
    if (parts.length != 2)
      throw InvalidGroupVariable(
        s"Invalid formula format. Expected 'outcome ~ predictors', got '$s'")
    val outcome = parts(0).trim
    if (outcome.isEmpty)
      throw InvalidGroupVariable("Outcome variable is missing")
    var preds = Vector.empty[String]
    var cats = Vector.empty[String]
    parts(1).split('+').map(_.trim).filter(_.nonEmpty).foreach { term =>
      if (term.startsWith("C(") && term.endsWith(")"))
        cats :+= term.substring(2, term.length - 1).trim
      else if (term.startsWith("factor(") && term.endsWith(")"))
        cats :+= term.substring(7, term.length - 1).trim
      else preds :+= term
    }
    if (preds.isEmpty && cats.isEmpty)
      throw InvalidGroupVariable("No predictors specified")
    Formula(outcome, preds, cats)
  }
}

/** Fluent builder mirroring the reference's user-facing API
  * (`oaxaca_blinder/src/builder.rs:165-246`): configure, then `run()`
  * for the mean decomposition, `decomposeQuantile(tau)` for the RIF
  * path, or `runQuantile()` for Machado-Mata. */
final class OaxacaBuilder private (df: DataFrame, private var cfg: OaxacaConfig) {

  def predictors(ps: String*): OaxacaBuilder = { cfg = cfg.copy(predictors = ps); this }
  def categoricalPredictors(ps: String*): OaxacaBuilder = { cfg = cfg.copy(categorical = ps); this }
  def normalize(ps: String*): OaxacaBuilder = { cfg = cfg.copy(normalize = ps); this }
  def weights(w: String): OaxacaBuilder = { cfg = cfg.copy(weights = Some(w)); this }
  def bootstrapReps(n: Int): OaxacaBuilder = { cfg = cfg.copy(bootstrapReps = n); this }
  def seed(s: Long): OaxacaBuilder = { cfg = cfg.copy(seed = s); this }
  def referenceCoefficients(rc: RefCoefficients): OaxacaBuilder = { cfg = cfg.copy(refCoefficients = rc); this }
  def heckmanSelection(outcome: String, predictors: String*): OaxacaBuilder = {
    cfg = cfg.copy(selectionOutcome = Some(outcome), selectionPredictors = predictors)
    this
  }
  def formula(f: String): OaxacaBuilder = {
    val parsed = Formula.parse(f)
    cfg = cfg.copy(outcome = parsed.outcome, predictors = parsed.predictors,
      categorical = parsed.categoricalPredictors)
    this
  }

  def config: OaxacaConfig = cfg

  def run(): OaxacaResults = Oaxaca.run(df, cfg)
  def decomposeQuantile(tau: Double): OaxacaResults =
    RifDecomposer.decomposeQuantile(df, cfg, tau)
  def runQuantile(quantiles: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9),
      simulations: Int = 200, mmReps: Int = 20): MmResults =
    MachadoMata.run(df, MmConfig(cfg.outcome, cfg.group, cfg.reference,
      cfg.predictors, cfg.categorical, quantiles, simulations, mmReps, cfg.seed))
}

object OaxacaBuilder {
  def apply(df: DataFrame, outcome: String, group: String,
      reference: String): OaxacaBuilder =
    new OaxacaBuilder(df, OaxacaConfig(outcome, group, reference))

  /** CSV ingest (S1): header + schema inference, as the reference CLI
    * (`oaxaca_blinder/src/main.rs:162-165`). */
  def fromCsv(spark: SparkSession, path: String, outcome: String,
      group: String, reference: String): OaxacaBuilder =
    apply(spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path), outcome, group, reference)
}
