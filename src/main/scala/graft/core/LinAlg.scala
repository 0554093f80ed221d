package graft.core

import breeze.linalg.{DenseMatrix, DenseVector, cholesky, inv}

/** Driver-side dense linear algebra on k×k systems (k = number of model
  * columns, always small). All N-dimensional reductions happen in Spark
  * (see [[Gram]]); only coefficient-space math lands here.
  *
  * Solves mirror the reference's numerics: Cholesky with a
  * positive-definiteness check (`oaxaca_blinder/src/math/ols.rs:94-115`),
  * ridge-regularized fallback for near-singular Hessians
  * (`matching/logistic.rs:87-91`, `probit.rs:118-122`).
  */
object LinAlg {

  /** Solve A x = b for symmetric positive-definite A via Cholesky.
    * Throws [[SingularMatrix]] when A is not PD (multicollinearity). */
  def cholSolve(a: DenseMatrix[Double], b: DenseVector[Double]): DenseVector[Double] = {
    val l =
      try cholesky(a)
      catch {
        case e: Exception =>
          throw SingularMatrix(
            s"Matrix is not positive definite (multicollinear predictors?): ${e.getMessage}")
      }
    // forward substitution L z = b
    val k = b.length
    val z = DenseVector.zeros[Double](k)
    var i = 0
    while (i < k) {
      var s = b(i)
      var j = 0
      while (j < i) { s -= l(i, j) * z(j); j += 1 }
      if (l(i, i) == 0.0) throw SingularMatrix("Zero pivot in Cholesky solve")
      z(i) = s / l(i, i)
      i += 1
    }
    // back substitution L' x = z
    val x = DenseVector.zeros[Double](k)
    i = k - 1
    while (i >= 0) {
      var s = z(i)
      var j = i + 1
      while (j < k) { s -= l(j, i) * x(j); j += 1 }
      x(i) = s / l(i, i)
      i -= 1
    }
    x
  }

  /** Solve with a small ridge added to the diagonal (IRLS stabilizer). */
  def ridgeSolve(a: DenseMatrix[Double], b: DenseVector[Double], ridge: Double): DenseVector[Double] = {
    val aa = a.copy
    var i = 0
    while (i < aa.rows) { aa(i, i) += ridge; i += 1 }
    cholSolve(aa, b)
  }

  /** Inverse of a symmetric PD matrix (for vcov = sigma^2 (X'X)^-1). */
  def symInverse(a: DenseMatrix[Double]): DenseMatrix[Double] =
    try inv(a)
    catch {
      case e: Exception => throw SingularMatrix(s"Matrix inversion failed: ${e.getMessage}")
    }

  /** Least squares via normal equations with tiny-ridge fallback:
    * used where the reference falls back to SVD least squares
    * (`engine/src/analysis.rs:434-460`). */
  def solveLeastSquares(a: DenseMatrix[Double], b: DenseVector[Double]): DenseVector[Double] =
    try cholSolve(a, b)
    catch { case _: SingularMatrix => ridgeSolve(a, b, 1e-8 * (breeze.linalg.trace(a) / a.rows + 1.0)) }

  def dot(a: DenseVector[Double], b: DenseVector[Double]): Double = a dot b
}
