package graft.decompose

import graft.estimators.Rif
import graft.prep.Prep
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RIF-regression quantile decomposition (D11,
  * `oaxaca_blinder/src/builder.rs:711-757`): clean, split, RIF-transform
  * the outcome within each group, recombine, then run the standard mean
  * decomposition on the transformed outcome with the same configuration.
  */
object RifDecomposer {

  def decomposeQuantile(df: DataFrame, cfg: OaxacaConfig, tau: Double)
      : OaxacaResults = {
    val modelCols = (cfg.outcome +: cfg.group +: cfg.predictors) ++
      cfg.categorical ++ cfg.weights.toSeq
    val cleaned = Prep.clean(df, modelCols.distinct)
    // the >= 2-levels / reference-exists validation is its own distinct
    // job, independent of the RIF passes — overlap them (guide §2.6);
    // an invalid group still raises the same InvalidGroupVariable, just
    // after the concurrent transform work instead of before it
    val (transformed, _) = graft.core.Jobs.par2(
      Rif.transformPerGroup(cleaned, cfg.outcome, cfg.group, tau),
      Prep.splitGroups(cleaned, cfg.group, cfg.reference))._1
    val replaced = transformed
      .withColumn(cfg.outcome, col("__rif__"))
      .drop("__rif__")
    Oaxaca.run(replaced, cfg)
  }
}
