package graft.decompose

import graft.core._
import graft.estimators.{Kde, Logit}
import graft.prep.Prep
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DiNardo–Fortin–Lemieux reweighting (D14,
  * `oaxaca_blinder/src/dfl.rs:34-195`): pooled logit of P(groupA | x),
  * counterfactual weight psi(x) = (p/(1-p)) * (P(B)/P(A)) with p clamped
  * to [1e-4, 0.9999] for group-B rows, then Gaussian KDEs of the outcome
  * on a 100-point grid: group A, group B, and reweighted group B
  * (counterfactual, using group B's Silverman bandwidth).
  */
final case class DflResult(
    grid: Array[Double],
    densityA: Array[Double],
    densityB: Array[Double],
    densityBCounterfactual: Array[Double],
    logitConverged: Boolean)

object Dfl {

  val GridSize = 100

  def run(df0: DataFrame, outcome: String, group: String, reference: String,
      predictors: Seq[String]): DflResult = {
    // string predictors are dummy-expanded drop-first (sorted levels),
    // numeric predictors cast to double (`dfl.rs:76-105`)
    val stringPreds = predictors.filter(p =>
      df0.schema(p).dataType == org.apache.spark.sql.types.StringType)
    val numericPreds = predictors.filterNot(stringPreds.contains)
    val (dummied, infos) = Prep.oneHot(df0, stringPreds)
    // the prepared frame feeds the logit IRLS iterations, group counts,
    // min/max, two Silverman passes and three KDE passes — persist it once
    val df = Prep.withIntercept(dummied)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val xCols = Prep.InterceptCol +: (numericPreds ++ infos.flatMap(_.dummyCols))

    val levels = Prep.groupLevels(df, group)
    if (!levels.contains(reference))
      throw InvalidGroupVariable(s"Reference level '$reference' not found")
    val levelA = levels.filter(_ != reference).headOption.getOrElse(
      throw InvalidGroupVariable("Need two group levels for DFL"))

    val g = col(group).cast("string")
    val target = when(g === lit(levelA), 1.0).otherwise(0.0)
    val withTarget = df.withColumn("__dfl_target__", target)

    val fit = Logit.fit(withTarget, "__dfl_target__", xCols,
      maxIter = 100, tol = 1e-6)

    val counts = df.groupBy(g.as("g")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nA = counts.getOrElse(levelA, 0L).toDouble
    val nB = counts.getOrElse(reference, 0L).toDouble
    val ratioMarginal = nB / nA

    val y = col(outcome).cast("double")
    val mm = df.agg(min(y).as("mn"), max(y).as("mx")).head()
    val minVal = mm.getDouble(0)
    val maxVal = mm.getDouble(1)
    val step = (maxVal - minVal) / GridSize.toDouble
    val grid = Array.tabulate(GridSize)(i => minVal + i * step)

    val dfA = df.filter(g === lit(levelA))
    val dfB = df.filter(g === lit(reference))
    val p = least(greatest(fit.probCol(xCols), lit(1e-4)), lit(0.9999))
    val dfBw = dfB.withColumn("__dfl_w__",
      (p / (lit(1.0) - p)) * lit(ratioMarginal))

    val bwA = Kde.silverman(dfA, outcome)
    val bwB = Kde.silverman(dfB, outcome)

    DflResult(
      grid = grid,
      densityA = Kde.onGrid(dfA, outcome, None, grid, bwA),
      densityB = Kde.onGrid(dfB, outcome, None, grid, bwB),
      densityBCounterfactual = Kde.onGrid(dfBw, outcome, Some("__dfl_w__"), grid, bwB),
      logitConverged = fit.converged)
    } finally { df.unpersist(); () }
  }
}
