package graft.api

import graft.decompose._
import graft.equity.{Equity, EquityConfig, OptimizeResult}
import graft.estimators.{Akm, AkmResult, Matching}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** py4j-friendly facade backing `python/graft.py` — S9 parity with the
  * reference's pyo3 bindings (`oaxaca_blinder/src/python.rs:193-276`):
  * `OaxacaBlinder(df, ...).fit() / fit_quantile(q) / optimize_budget(b)`.
  *
  * Everything here is shaped for py4j: flat signatures (no Scala
  * default args, Options, or ADTs), `java.util.List` parameters (the
  * gateway auto-converts Python lists), nullable Strings for optional
  * columns, and handle classes whose zero-arg methods Python calls
  * directly. The heavy lifting stays in the library — this file only
  * adapts. PySpark DataFrames cross the bridge as their `_jdf` and come
  * back wrapped by the Python side.
  */
object PyApi {

  private def policy(name: String): RefCoefficients =
    name.toLowerCase match {
      case "group_a" | "groupa" | "a" => RefCoefficients.GroupA
      case "group_b" | "groupb" | "b" => RefCoefficients.GroupB
      case "pooled" | "neumark" => RefCoefficients.Pooled
      case "cotton" => RefCoefficients.Cotton
      case other => throw new IllegalArgumentException(
        s"unknown ref_coefficients '$other' " +
          "(expected group_a | group_b | pooled | cotton)")
    }

  private def cfg(outcome: String, group: String, reference: String,
      predictors: java.util.List[String],
      categorical: java.util.List[String], refPolicy: String,
      bootstrapReps: Int, weights: String, selectionOutcome: String,
      selectionPredictors: java.util.List[String],
      seed: Long): OaxacaConfig =
    OaxacaConfig(outcome, group, reference,
      predictors = predictors.asScala.toSeq,
      categorical = categorical.asScala.toSeq,
      weights = Option(weights),
      refCoefficients = policy(refPolicy),
      bootstrapReps = bootstrapReps,
      seed = seed,
      selectionOutcome = Option(selectionOutcome),
      selectionPredictors = selectionPredictors.asScala.toSeq)

  /** Mean decomposition (python: `OaxacaBlinder(...).fit()`). */
  def fit(df: DataFrame, outcome: String, group: String, reference: String,
      predictors: java.util.List[String],
      categorical: java.util.List[String], refPolicy: String,
      bootstrapReps: Int, weights: String, selectionOutcome: String,
      selectionPredictors: java.util.List[String], seed: Long): PyResults =
    new PyResults(Oaxaca.run(df, cfg(outcome, group, reference, predictors,
      categorical, refPolicy, bootstrapReps, weights, selectionOutcome,
      selectionPredictors, seed)), df.sparkSession)

  /** RIF quantile decomposition (python: `fit_quantile(q)`). */
  def fitQuantile(df: DataFrame, outcome: String, group: String,
      reference: String, predictors: java.util.List[String],
      categorical: java.util.List[String], refPolicy: String,
      bootstrapReps: Int, weights: String, seed: Long,
      tau: Double): PyResults =
    new PyResults(RifDecomposer.decomposeQuantile(df,
      cfg(outcome, group, reference, predictors, categorical, refPolicy,
        bootstrapReps, weights, null,
        java.util.Collections.emptyList[String](), seed), tau),
      df.sparkSession)

  /** DFL reweighting (python: `run_dfl`; the reference's
    * `run_dfl_from_csv` reads a path — here any DataFrame works, so
    * `spark.read.csv(path)` covers the CSV case). */
  def runDfl(df: DataFrame, outcome: String, group: String,
      reference: String, predictors: java.util.List[String]): PyDfl =
    new PyDfl(Dfl.run(df, outcome, group, reference,
      predictors.asScala.toSeq))

  /** AKM two-way fixed effects (python: `estimate_akm`). */
  def estimateAkm(df: DataFrame, outcome: String, workerCol: String,
      firmCol: String, controls: java.util.List[String], tolerance: Double,
      maxIters: Int): PyAkm =
    new PyAkm(Akm.run(df, outcome, workerCol, firmCol,
      controls.asScala.toSeq, tolerance, maxIters))

  /** k-NN matching (python: `match_units`); method is one of
    * euclidean | mahalanobis | propensity. */
  def matchUnits(df: DataFrame, treatmentCol: String,
      covariates: java.util.List[String], k: Int, method: String,
      idCol: String): DataFrame = {
    val m = method.toLowerCase match {
      case "euclidean" => Matching.Euclidean
      case "mahalanobis" => Matching.Mahalanobis
      case "propensity" | "psm" => Matching.Propensity
      case other => throw new IllegalArgumentException(
        s"unknown matching method '$other' " +
          "(expected euclidean | mahalanobis | propensity)")
    }
    Matching.run(df, treatmentCol, covariates.asScala.toSeq, k, m, idCol)
  }

  /** Budgeted pay-equity optimization (python: `optimize_budget(b)`). */
  def optimizeBudget(df: DataFrame, outcome: String, group: String,
      reference: String, predictors: java.util.List[String],
      categorical: java.util.List[String], budget: Double,
      idCol: String): PyOptimize =
    new PyOptimize(Equity.optimize(df,
      EquityConfig(outcome, group, reference,
        predictors = predictors.asScala.toSeq,
        categorical = categorical.asScala.toSeq,
        budget = budget), idCol))

  // ----- LLM-pipeline extension operators (python: module functions) -----
  // The ext/ package is the engine's first-class extension mandate; these
  // flat py4j adapters make dedup / ANN / sampling / packing / decontam
  // reachable from `python/graft.py` with the same shapes the Scala API
  // returns (pair lists, cluster maps, filtered corpora).

  /** Exact duplicate groups (python: `exact_duplicates`). */
  def exactDuplicates(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.ext.Dedup.exactDuplicates(df, idCol, textCol)

  /** Corpus minus exact duplicates, keeping the smallest id per content
    * (python: `drop_exact_duplicates`). */
  def dropExactDuplicates(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.ext.Dedup.dropExactDuplicates(df, idCol, textCol)

  /** MinHash-LSH near-dup candidate pairs verified with exact Jaccard
    * (python: `minhash_lsh_pairs`). */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int,
      threshold: Double): DataFrame =
    graft.ext.Dedup.minhashLshPairs(df, idCol, textCol, shingleN,
      numHashes, bands, threshold)

  /** SimHash pairs within a Hamming budget (python: `simhash_pairs`). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, bits: Int): DataFrame =
    graft.ext.Dedup.simhashPairs(df, idCol, textCol, maxHamming, bits)

  /** Exact n-gram Jaccard pairs (python: `jaccard_pairs`);
    * maxShingleDf <= 0 means no hot-shingle cap. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShingleDf: Long): DataFrame =
    graft.ext.Dedup.ngramJaccardPairs(df, idCol, textCol, n, threshold,
      if (maxShingleDf > 0) Some(maxShingleDf) else None)

  /** Exact embedding-cosine near-dup pairs (python:
    * `embedding_neardup_pairs`). */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBlocks: Int): DataFrame =
    graft.ext.Dedup.embeddingNearDupPairs(df, idCol, vecCol, threshold,
      nBlocks)

  /** Near-dup clusters from any (id_a, id_b) pair list (python:
    * `assign_clusters`): appends cluster_id + is_canonical. */
  def assignClusters(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame =
    graft.ext.Cluster.assignClusters(docs, idCol, pairs)

  /** Brute-force exact cosine top-k (python: `ann_topk`). */
  def annTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame =
    graft.ext.Ann.bruteForceTopK(queries, corpus, idCol, vecCol, k)

  /** IVF (KMeans-cell) approximate top-k (python: `ann_ivf_topk`);
    * nCells <= 0 sizes the cell count from the corpus. */
  def annIvfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int, nProbe: Int,
      seed: Long): DataFrame = {
    val cells = if (nCells > 0) nCells
      else graft.ext.Ann.defaultNCells(corpus.count())
    graft.ext.Ann.ivfTopK(queries, corpus, idCol, vecCol, k, cells,
      nProbe, seed)
  }

  /** Per-stratum Bernoulli hash sampling (python: `stratified_sample`). */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: java.util.Map[String, Double], defaultFraction: Double,
      salt: String): DataFrame =
    graft.ext.Sampling.stratifiedHashSample(df, idCol, strataCol,
      fractions.asScala.toMap.map { case (k, v) => k -> (v: Double) },
      defaultFraction, salt)

  /** Per-stratum top-k by a score column (python: `topk_by_score`). */
  def topKByScore(df: DataFrame, idCol: String, strataCol: String,
      scoreCol: String, k: Int, shards: Int): DataFrame =
    graft.ext.Sampling.topKByScore(df, idCol, strataCol,
      org.apache.spark.sql.functions.col(scoreCol), k, shards)

  /** Token-budget sampling (python: `token_budget_sample`). */
  def tokenBudgetSample(df: DataFrame, idCol: String, strataCol: String,
      textCol: String, budget: Long, buckets: Int): DataFrame =
    graft.ext.Sampling.tokenBudgetSample(df, idCol, strataCol, textCol,
      budget, buckets)

  /** Sequence packing spans (python: `seq_pack`). */
  def seqPack(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, numShards: Int): DataFrame =
    graft.ext.SeqPack.pack(df, idCol, textCol, maxTokens, numShards)

  /** Benchmark-contamination flags (python: `flag_contaminated`). */
  def flagContaminated(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int): DataFrame =
    graft.ext.Decontam.flagContaminated(corpus, idCol, textCol, bench,
      benchIdCol, benchTextCol, n)

  /** Corpus minus benchmark-contaminated docs (python:
    * `remove_contaminated`). */
  def removeContaminated(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int): DataFrame =
    graft.ext.Decontam.removeContaminated(corpus, idCol, textCol, bench,
      benchIdCol, benchTextCol, n)
}

/** Decomposition results handle (python: `OaxacaResults`). */
class PyResults(res: OaxacaResults, spark: SparkSession) {
  def totalGap(): Double = res.totalGap
  def nA(): Long = res.nA
  def nB(): Long = res.nB
  def aggregateDf(): DataFrame = res.aggregateDf(spark)
  def detailedDf(): DataFrame = res.detailedDf(spark)
  def toJson(): String = Export.toJson(res)
  def summary(): String = Export.summary(res)
  def interpret(): String = Export.interpret(res)
  def svgBar(): String = Export.toSvgBar(res)
}

/** DFL results handle (python: `DflResult`): the 100-point outcome
  * grid with the two observed densities and the counterfactual. */
class PyDfl(res: DflResult) {
  def grid(): Array[Double] = res.grid
  def densityA(): Array[Double] = res.densityA
  def densityB(): Array[Double] = res.densityB
  def densityBCounterfactual(): Array[Double] = res.densityBCounterfactual
  def logitConverged(): Boolean = res.logitConverged
}

/** AKM results handle (python: `AkmResult`). */
class PyAkm(res: AkmResult) {
  def beta(): Array[Double] = res.beta.toArray
  def controlNames(): java.util.List[String] = res.controlNames.asJava
  def workerEffects(): DataFrame = res.workerEffects
  def firmEffects(): DataFrame = res.firmEffects
  def r2(): Double = res.r2
  def nObs(): Long = res.nObs
}

/** Optimization results handle (python: `BudgetResult`). */
class PyOptimize(res: OptimizeResult) {
  def adjustments(): DataFrame = res.adjustments
  def totalCost(): Double = res.metrics.totalCost
  def originalGap(): Double = res.metrics.originalGap
  def newGap(): Double = res.metrics.newGap
  def originalUnexplainedGap(): Double = res.metrics.originalUnexplainedGap
  def newUnexplainedGap(): Double = res.metrics.newUnexplainedGap
  def requiredBudget(): Double = res.metrics.requiredBudget
}
