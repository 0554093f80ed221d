package graft.estimators

import graft.core._
import graft.prep.Prep
import org.apache.spark.sql.DataFrame

/** Variance inflation factors (`oaxaca_blinder/src/math/diagnostics.rs:29-109`):
  * regress each predictor on the others (+ intercept); VIF = 1/(1-R^2),
  * infinity on a perfect fit. */
object Vif {

  def compute(df: DataFrame, predictors: Seq[String]): Seq[(String, Double)] = {
    if (predictors.size < 2)
      throw DiagnosticError("VIF requires at least 2 predictors")
    val prepared = Prep.withIntercept(Prep.clean(df, predictors))
    predictors.map { p =>
      val others = Prep.InterceptCol +: predictors.filterNot(_ == p)
      val vif =
        try {
          val fit = Ols.fit(prepared, p, others)
          val r2 = fit.r2
          if (r2 >= 1.0 - 1e-12) Double.PositiveInfinity else 1.0 / (1.0 - r2)
        } catch { case _: SingularMatrix => Double.PositiveInfinity }
      p -> vif
    }
  }
}
