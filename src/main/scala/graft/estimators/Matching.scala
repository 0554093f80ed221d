package graft.estimators

import breeze.linalg.{cholesky, DenseMatrix}
import graft.core._
import graft.prep.Prep
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-NN matching engine (E14-E16,
  * `oaxaca_blinder/src/matching/engine.rs`):
  * for each treated row find the k nearest control rows (squared
  * Euclidean, optionally in the Mahalanobis-whitened space, or on a
  * propensity score); each matched control accrues weight 1/k, treated
  * rows get weight 1, unmatched controls 0.
  *
  * Two physical paths:
  * - exact: crossJoin + per-treated top-k window — oracle-comparable,
  *   O(T*C), for test scale;
  * - lsh: `BucketedRandomProjectionLSH` approxSimilarityJoin + the same
  *   window — the 100 TB path (bucketed candidate generation instead of
  *   the reference's in-memory k-d tree).
  */
object Matching {

  sealed trait Method
  case object Euclidean extends Method
  case object Mahalanobis extends Method
  case object Propensity extends Method

  /** Returns df + "__match_weight__". `idCol` must uniquely identify
    * rows (the reference's orig_index). `logitMaxIter`/`logitTol` pin
    * the propensity logit's iteration count (Propensity method only;
    * tol = 0.0 forces exactly maxIter iterations — the
    * q_matching_psm_newton3 oracle); production callers keep the
    * convergence defaults. */
  def run(df: DataFrame, treatmentCol: String, covariates: Seq[String],
      k: Int, method: Method = Euclidean, idCol: String,
      exact: Boolean = true, lshBucketLength: Double = 1.0,
      logitMaxIter: Int = 100, logitTol: Double = 1e-6): DataFrame = {
    require(k > 0, "k must be positive")
    val treatedFlag = col(treatmentCol).cast("double") === 1.0
    val controlFlag = col(treatmentCol).cast("double") === 0.0

    val (space, spaceCols) = method match {
      case Propensity =>
        val withIntercept = Prep.withIntercept(df)
        val xCols = Prep.InterceptCol +: covariates
        val fit = Logit.fit(withIntercept, treatmentCol, xCols,
          maxIter = logitMaxIter, tol = logitTol)
        (withIntercept.withColumn("__ps__", fit.probCol(xCols))
          .drop(Prep.InterceptCol), Seq("__ps__"))
      case Euclidean => (df, covariates)
      case Mahalanobis =>
        val controls = df.filter(controlFlag)
        val g = Gram.compute(Prep.withIntercept(controls), covariates.head,
          Prep.InterceptCol +: covariates)
        // covariance of control X: (X'X - n xbar xbar') / (n - 1)
        val n = g.n
        if (n < 2) throw DiagnosticError(
          "Not enough data points to calculate covariance")
        val kk = covariates.size
        val cov = DenseMatrix.zeros[Double](kk, kk)
        for (i <- 0 until kk; j <- 0 until kk)
          cov(i, j) = (g.xtx(i + 1, j + 1) -
            g.xtx(0, i + 1) * g.xtx(0, j + 1) / n) / (n - 1.0)
        val invCov = LinAlg.symInverse(cov)
        val l = try cholesky(invCov) catch {
          case e: Exception =>
            throw DiagnosticError("Cholesky decomposition failed: " + e.getMessage)
        }
        // whitened coordinates: z_j = sum_i x_i * L(i, j)  (X * L)
        var out = df
        val zCols = covariates.indices.map(j => s"__mz${j}__")
        covariates.indices.foreach { j =>
          out = out.withColumn(zCols(j),
            covariates.zipWithIndex.map { case (c, i) =>
              col(c).cast("double") * lit(l(i, j))
            }.reduce(_ + _))
        }
        (out, zCols)
    }

    val treated = space.filter(treatedFlag)
      .select((col(idCol).as("__tid__") +:
        spaceCols.map(c => col(c).cast("double").as(s"t_$c"))): _*)
    val control = space.filter(controlFlag)
      .select((col(idCol).as("__cid__") +:
        spaceCols.map(c => col(c).cast("double").as(s"c_$c"))): _*)

    val dist2 = spaceCols.map(c =>
      pow(col(s"t_$c") - col(s"c_$c"), 2)).reduce(_ + _)

    val pairs =
      if (exact) treated.crossJoin(control).withColumn("__d2__", dist2)
      else {
        // LSH candidate generation, then exact re-rank of candidates
        val tv = treated.withColumn("__feat__",
          array_to_vector(array(spaceCols.map(c => col(s"t_$c")): _*)))
        val cv = control.withColumn("__feat__",
          array_to_vector(array(spaceCols.map(c => col(s"c_$c")): _*)))
        val lsh = new BucketedRandomProjectionLSH()
          .setBucketLength(lshBucketLength).setNumHashTables(3)
          .setInputCol("__feat__").setOutputCol("__hashes__").setSeed(42L)
        val model = lsh.fit(cv)
        model.approxSimilarityJoin(tv, cv, Double.MaxValue, "__lsh_d__")
          .select(col("datasetA.__tid__").as("__tid__"),
            col("datasetB.__cid__").as("__cid__"),
            (col("__lsh_d__") * col("__lsh_d__")).as("__d2__"))
      }

    val ranked = pairs.withColumn("__rn__",
      row_number().over(Window.partitionBy(col("__tid__"))
        .orderBy(col("__d2__"), col("__cid__"))))
      .filter(col("__rn__") <= k)

    val controlWeights = ranked.groupBy(col("__cid__"))
      .agg((count(lit(1)) / lit(k.toDouble)).as("__cw__"))

    df.join(controlWeights, col(idCol) === col("__cid__"), "left")
      .withColumn("__match_weight__",
        when(treatedFlag, 1.0)
          .otherwise(coalesce(col("__cw__"), lit(0.0))))
      .drop("__cid__", "__cw__")
  }
}
