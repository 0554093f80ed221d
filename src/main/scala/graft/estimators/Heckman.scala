package graft.estimators

import breeze.linalg.DenseVector
import graft.core._
import graft.prep.Prep
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heckman two-step selection correction
  * (`oaxaca_blinder/src/heckman.rs:38-108`):
  * (1) probit of the selection outcome on [intercept, Z] over all group
  * rows; (2) inverse Mills ratio lambda = phi(z'g)/Phi(z'g) (0 when
  * Phi < 1e-10) on the selected rows; (3) OLS of the outcome on
  * [X, lambda] over the selected rows. Also returns the selection-side
  * means and delta = mean(-lambda (lambda + z'g)) used by the detailed
  * selection decomposition (`builder.rs:477-534`).
  */
final case class HeckmanFit(
    gamma: DenseVector[Double],          // selection (probit) coefficients
    beta: DenseVector[Double],           // outcome coefficients, IMR last
    imrCoeff: Double,
    imrMean: Double,
    imrDelta: Double,
    xMeans: DenseVector[Double],         // selected-row X means, IMR mean last
    zMeans: DenseVector[Double],         // all-row selection X means
    nSelected: Long,
    n: Long,
    probitConverged: Boolean,
    swSelected: Double,                  // selected-row weight sum (= nSelected unweighted)
    swAll: Double)                       // full-group weight sum (= n unweighted)

object Heckman {

  val ImrCol = "__ob_imr__"

  /** `df` = one cleaned group; xCols/selXCols must include the intercept
    * column (first). `wCol` resamples/weights every stage (None mirrors
    * the reference exactly). `probitMaxIter`/`probitTol` pin the
    * selection probit's iteration count (tol = 0.0 forces exactly
    * maxIter iterations — the q_heckman_newton3 oracle); production
    * callers keep the convergence defaults. */
  def fit(df: DataFrame, outcome: String, xCols: Seq[String],
      selectionOutcome: String, selXCols: Seq[String],
      wCol: Option[String] = None, probitMaxIter: Int = 100,
      probitTol: Double = 1e-6): HeckmanFit = {
    val spark = df.sparkSession
    val probit = Probit.fit(df, selectionOutcome, selXCols,
      maxIter = probitMaxIter, tol = probitTol, wCol = wCol)
    val gamma = probit.beta

    val zg = Ols.predictionCol(selXCols, gamma)
    val phi = NormalDist.pdfCol(zg)
    val bigPhi = NormalDist.cdfCol(spark, zg)
    val imr = when(bigPhi < 1e-10, 0.0).otherwise(phi / bigPhi)

    val deltaCol = "__ob_delta__"
    val selected = df
      .filter(col(selectionOutcome).cast("double") === 1.0)
      .withColumn(ImrCol, imr)
      .withColumn(deltaCol, -col(ImrCol) * (col(ImrCol) + zg))

    // ONE Gram pass serves the outcome OLS AND every selected-row
    // aggregate: with the intercept first, X'X row 0 is the weighted
    // column-sum vector, so appending the per-row delta term
    // -imr*(imr + z'g) as one extra design column makes its sum (and
    // the means, sw, n) fall out of the same pass the OLS needs anyway
    // — the former dedicated means/delta aggregation was a second full
    // scan of the selected rows.
    val augCols = xCols :+ ImrCol
    val kA = augCols.size
    val gramFull = Gram.compute(selected, outcome, augCols :+ deltaCol, wCol)
    val gramA = GramResult(kA,
      breeze.linalg.DenseMatrix.tabulate(kA, kA)((i, j) => gramFull.xtx(i, j)),
      DenseVector.tabulate(kA)(i => gramFull.xty(i)),
      gramFull.sw, gramFull.swy, gramFull.swyy, gramFull.n, gramFull.minW)
    val fit = Ols.fromGram(gramA, augCols)
    val swSel = gramFull.sw
    val xMeans = gramA.xMeans
    val imrDelta = gramFull.xtx(0, kA) / swSel
    val nSel = gramFull.n

    val w = wCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    val zAggs = selXCols.map(c => sum(col(c).cast("double") * w).as(s"m_$c")) ++
      Seq(sum(w).as("sw"), count(lit(1)).as("n"))
    val zRow = df.agg(zAggs.head, zAggs.tail: _*).head()
    val swAll = zRow.getDouble(selXCols.size)
    val zMeans = DenseVector.tabulate(selXCols.size)(i => zRow.getDouble(i) / swAll)

    HeckmanFit(gamma, fit.beta, fit.beta(augCols.size - 1),
      xMeans(augCols.size - 1), imrDelta, xMeans, zMeans,
      nSel, zRow.getLong(selXCols.size + 1), probit.converged, swSel, swAll)
  }
}
