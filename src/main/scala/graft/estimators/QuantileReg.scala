package graft.estimators

import breeze.linalg.{norm, DenseMatrix, DenseVector}
import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Quantile regression (E5). The reference solves the pinball-loss LP
  * with an interior-point solver on one machine
  * (`oaxaca_blinder/src/math/quantile_regression.rs:22-129`); an LP has
  * no distributed analog, so this engine uses iteratively reweighted
  * least squares on the smoothed pinball loss — each iteration is one
  * Gram pass (distributed path) or one k x k solve (driver path used by
  * Machado-Mata's hundreds of per-tau fits), converging to the LP
  * solution as the smoothing epsilon shrinks.
  */
object QuantileReg {

  private val Eps = 1e-6
  private val Tol = 1e-8
  private val MaxIter = 100

  /** Driver-side IRLS on materialized arrays (rows x k). */
  def fitLocal(x: Array[Array[Double]], y: Array[Double], tau: Double)
      : DenseVector[Double] = {
    val n = y.length
    val k = x(0).length
    require(tau > 0.0 && tau < 1.0, "Tau must be between 0 and 1.")
    if (n <= k) throw InsufficientData(s"QR needs n > k (n=$n, k=$k)")

    def wlsSolve(w: Array[Double]): DenseVector[Double] = {
      val xtx = DenseMatrix.zeros[Double](k, k)
      val xty = DenseVector.zeros[Double](k)
      var i = 0
      while (i < n) {
        val wi = w(i)
        val xi = x(i)
        var a = 0
        while (a < k) {
          val wxa = wi * xi(a)
          var b = a
          while (b < k) { xtx(a, b) += wxa * xi(b); b += 1 }
          xty(a) += wxa * y(i)
          a += 1
        }
        i += 1
      }
      var a = 0
      while (a < k) {
        var b = a + 1
        while (b < k) { xtx(b, a) = xtx(a, b); b += 1 }
        a += 1
      }
      LinAlg.ridgeSolve(xtx, xty, 1e-10 * (breeze.linalg.trace(xtx) / k + 1.0))
    }

    var beta = wlsSolve(Array.fill(n)(1.0)) // OLS start
    var iter = 0
    var done = false
    while (iter < MaxIter && !done) {
      iter += 1
      val w = new Array[Double](n)
      var i = 0
      while (i < n) {
        var r = y(i)
        val xi = x(i)
        var a = 0
        while (a < k) { r -= xi(a) * beta(a); a += 1 }
        val c = if (r > 0) tau else 1.0 - tau
        w(i) = c / math.max(math.abs(r), Eps)
        i += 1
      }
      val nb = wlsSolve(w)
      if (norm(nb - beta) < Tol) done = true
      beta = nb
    }
    beta
  }

  /** Distributed IRLS: one Gram pass per iteration; the 100 TB path for
    * a single-tau fit. */
  def fit(df: DataFrame, yCol: String, xCols: Seq[String], tau: Double,
      maxIter: Int = 50, tol: Double = 1e-8): DenseVector[Double] =
    fitMany(df, yCol, xCols, Seq(tau), maxIter, tol).head

  /** Several taus over ONE cached projection of the data. */
  def fitMany(df: DataFrame, yCol: String, xCols: Seq[String],
      taus: Seq[Double], maxIter: Int = 50,
      tol: Double = 1e-8): Seq[DenseVector[Double]] = {
    taus.foreach(t => require(t > 0.0 && t < 1.0, "Tau must be between 0 and 1."))
    val proj = df.select((col(yCol).cast("double").as(yCol) +:
      xCols.map(c => col(c).cast("double").as(c))): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val k = xCols.size
      val olsBeta = {
        val g = Gram.compute(proj, yCol, xCols)
        LinAlg.solveLeastSquares(g.xtx, g.xty)
      }
      taus.map { tau =>
        var beta = olsBeta
        var iter = 0
        var done = false
        while (iter < maxIter && !done) {
          iter += 1
          val r = col(yCol) - Ols.predictionCol(xCols, beta)
          val c = when(r > 0.0, tau).otherwise(1.0 - tau)
          val w = c / greatest(abs(r), lit(Eps))
          val g = Gram.compute(proj.withColumn("__w__", w), yCol, xCols, Some("__w__"))
          val nb = LinAlg.ridgeSolve(g.xtx, g.xty,
            1e-10 * (breeze.linalg.trace(g.xtx) / k + 1.0))
          if (norm(nb - beta) < tol) done = true
          beta = nb
        }
        beta
      }
    } finally { proj.unpersist() }
  }
}
