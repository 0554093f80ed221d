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

  /** `logitMaxIter`/`logitTol` pin the reweighting logit's iteration
    * count (tol = 0.0 forces exactly maxIter iterations) — the oracle
    * query q_dfl_newton3 uses 3 pinned iterations so the whole pipeline
    * is closed-form; production callers keep the convergence defaults. */
  def run(df0: DataFrame, outcome: String, group: String, reference: String,
      predictors: Seq[String], logitMaxIter: Int = 100,
      logitTol: Double = 1e-6): DflResult = {
    // string predictors are dummy-expanded drop-first (sorted levels),
    // numeric predictors cast to double (`dfl.rs:76-105`)
    val stringPreds = predictors.filter(p =>
      df0.schema(p).dataType == org.apache.spark.sql.types.StringType)
    val numericPreds = predictors.filterNot(stringPreds.contains)
    val (dummied, infos) = Prep.oneHot(df0, stringPreds)
    val xCols = Prep.InterceptCol +: (numericPreds ++ infos.flatMap(_.dummyCols))
    // the prepared frame feeds the logit IRLS iterations, group stats,
    // the Silverman passes and the KDE pass — persist ONE narrow
    // projection (outcome, group, design), not the full source width:
    // the cache write is what you pay per row
    // NOT persisted (r15): the four consumers (silverman stats, grouped
    // rank-pick, IRLS design build — which persists its own compact
    // RDD — and the KDE grid pass) each re-run a narrow column-pruned
    // parquet scan + cheap dummy/intercept projections; the
    // MEMORY_AND_DISK write of the row-format copy sat on the critical
    // path and cost more than the three extra scans it saved, at bench
    // scale and at 100 TB alike (same bytes re-read either way, minus
    // the write).
    val df = Prep.withIntercept(dummied)
      .select((outcome +: group +: xCols).distinct.map(col): _*)
    try {

    // group counts, outcome range AND both groups' Silverman stats in
    // ONE grouped pass + ONE grouped rank-pick (previously a global
    // aggregate plus a per-group stats aggregate + rank-pick each).
    // Runs FIRST: its stats keys are the distinct group levels, so the
    // separate groupLevels distinct job is erased too.
    val g = col(group).cast("string")
    val y = col(outcome).cast("double")
    val (bws, extras) = Kde.silvermanGrouped(df, outcome, g,
      extraAggs = Seq(count(lit(1)), min(y), max(y)))
    // sort by UTF-8 bytes (Spark's binary collation), not JVM UTF-16
    // code units: the two orders differ for supplementary-plane
    // characters, and level choice must match Prep.groupLevels' Spark
    // orderBy exactly
    val levels = extras.keys.filter(_ != null).toSeq.sortWith { (x, y) =>
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n && a(i) == b(i)) i += 1
      if (i < n) (a(i) & 0xFF) < (b(i) & 0xFF) else a.length < b.length
    }
    if (!levels.contains(reference))
      throw InvalidGroupVariable(s"Reference level '$reference' not found")
    val levelA = levels.filter(_ != reference).headOption.getOrElse(
      throw InvalidGroupVariable("Need two group levels for DFL"))

    val target = when(g === lit(levelA), 1.0).otherwise(0.0)
    val withTarget = df.withColumn("__dfl_target__", target)

    val fit = Logit.fit(withTarget, "__dfl_target__", xCols,
      maxIter = logitMaxIter, tol = logitTol)
    val nA = extras(levelA)(0).asInstanceOf[Long].toDouble
    val nB = extras(reference)(0).asInstanceOf[Long].toDouble
    val ratioMarginal = nB / nA
    // global outcome range = fold of the per-group ranges (every row
    // belongs to exactly one group key, null level included)
    val mins = extras.values.map(_(1)).collect { case d: java.lang.Double => d.doubleValue }
    val maxs = extras.values.map(_(2)).collect { case d: java.lang.Double => d.doubleValue }
    val minVal = mins.min
    val maxVal = maxs.max
    val step = (maxVal - minVal) / GridSize.toDouble
    val grid = Array.tabulate(GridSize)(i => minVal + i * step)

    val p = least(greatest(fit.probCol(xCols), lit(1e-4)), lit(0.9999))

    val bwA = bws(levelA)
    val bwB = bws(reference)

    // all three densities in ONE scan: per-density weight columns that
    // are 0 outside the density's subset
    val isA = g === lit(levelA)
    val isB = g === lit(reference)
    val psi = (p / (lit(1.0) - p)) * lit(ratioMarginal)
    // fan out ONLY the KDE input: the grid pass is ~200 exp calls per
    // row (single-task death on a 1-partition cache), while the same
    // persisted frame also feeds ~30 cheap IRLS Gram scans that a
    // 64-partition fan-out measurably slows (task-launch overhead per
    // iteration) — so the shuffle happens once, here, not on the cache
    val dens = Kde.onGridMulti(Prep.fanOut(df), outcome,
      Seq(when(isA, 1.0).otherwise(0.0),
        when(isB, 1.0).otherwise(0.0),
        when(isB, psi).otherwise(0.0)),
      grid, Seq(bwA, bwB, bwB))

    DflResult(
      grid = grid,
      densityA = dens(0),
      densityB = dens(1),
      densityBCounterfactual = dens(2),
      logitConverged = fit.converged)
    }
  }
}
