package graft.estimators

import graft.core.Gram
import graft.prep.Prep
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group OLS fits in ONE scan via Gram lanes: the distributed
  * equivalent of the reference fitting each group's matrix separately
  * (`oaxaca_blinder/src/estimation.rs:54-56`). */
object GroupedOls {

  /** Fit y ~ xCols (which must include the intercept column if wanted)
    * separately for every level of groupCol, one data pass total.
    * Returns (sorted level, fit) pairs. */
  def fit(df: DataFrame, yCol: String, xCols: Seq[String], groupCol: String,
      wCol: Option[String] = None): Seq[(String, OlsFit)] = {
    val levels = Prep.groupLevels(df, groupCol)
    val lane = levels.zipWithIndex.foldLeft(lit(-1)) { case (acc, (l, i)) =>
      when(col(groupCol).cast("string") === lit(l), i).otherwise(acc)
    }
    val grams = Gram.computeGrouped(df, yCol, xCols, wCol, lane, levels.size,
      reps = 0, seed = 0L)
    levels.zipWithIndex.map { case (l, i) =>
      l -> Ols.fromGram(grams(i)(0), xCols)
    }
  }
}
