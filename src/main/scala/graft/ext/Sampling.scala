package graft.ext

import graft.core.OperatorCaches
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data mixing: rebalance
  * a corpus across strata (source, language, domain) without RNG state,
  * so the same inputs always select the same rows on any cluster, any
  * partitioning, any retry — a requirement for reproducible data
  * recipes at 100 TB (a seeded `rand()` changes with partitioning; a
  * content hash never does).
  *
  * Both operators key on [[TextAnalysis.hash56]] of the row id — a
  * uniform 56-bit integer reproducible in ANSI SQL, so sampled
  * MEMBERSHIP (not just counts) is oracle-checkable.
  */
object Sampling {

  private val Million = 1000000L

  /** Per-stratum Bernoulli sampling at per-stratum rates: keeps a row
    * iff `hash56(salt || id) % 1e6 < rate(stratum) * 1e6`. Unlisted
    * strata use `defaultFraction`. Pure filter — no shuffle, no RNG; at
    * any scale this is a codegen'd predicate evaluated at the scan. */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double,
      salt: String = "graft"): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f =>
      f >= 0.0 && f <= 1.0), "sampling fractions must be in [0, 1]")
    val rate = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (k, f)) => when(col(strataCol) === lit(k), lit(f)).otherwise(acc)
    }
    val ticket = pmod(
      TextAnalysis.hash56(concat(lit(salt), lit(":"), col(idCol).cast("string"))),
      lit(Million))
    df.filter(ticket < (rate * Million).cast("long"))
  }

  /** Per-stratum top-k filter: the k best rows per stratum by a score
    * column, ties broken by ascending id — the standard quality gate of
    * a training-data recipe ("keep the 10k best docs per domain").
    * Callers should pass an already-rounded score when cross-engine
    * reproducibility matters (the ordering is then rounding-stable).
    *
    * With `shards > 1` the rank runs two-phase: top-k within each of
    * the row's hash shards (parallelism = strata x shards), then top-k
    * over the <= k x shards survivors — same result as the direct
    * window (each shard forwards every row that could make the global
    * top k), but a 10^9-row stratum never funnels through one sort
    * task. At 100 TB call sites should size shards so k x shards stays
    * small relative to a partition. */
  def topKByScore(df: DataFrame, idCol: String, strataCol: String,
      scoreCol: Column, k: Int, shards: Int = 1): DataFrame = {
    require(k > 0, "k must be positive")
    require(shards > 0, "shards must be positive")
    def rank(in: DataFrame, parts: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(parts: _*)
        .orderBy(scoreCol.desc, col(idCol).asc)
      in.withColumn("__rk__", row_number().over(w))
        .filter(col("__rk__") <= k)
        .drop("__rk__")
    }
    if (shards <= 1) rank(df, Seq(col(strataCol)))
    else {
      val sharded = df.withColumn("__shard__",
        pmod(TextAnalysis.hash56(col(idCol).cast("string")), lit(shards)))
      val survivors = rank(sharded, Seq(col(strataCol), col("__shard__")))
        .drop("__shard__")
      rank(survivors, Seq(col(strataCol)))
    }
  }

  /** Per-stratum token-budget downsampling: within each stratum, rows
    * are ordered by (hash56(id), id) — a deterministic uniform shuffle —
    * and the maximal prefix whose running token total stays within
    * `budget` is kept (docs are kept whole; the first doc that would
    * cross the budget, and everything after it, is dropped).
    *
    * The per-stratum prefix sum is two-level so no stratum funnels
    * through one task: hash56 is uniform by construction, so its top
    * bits give order-preserving equal-width buckets with no quantile
    * probe (cf. `Windows.exclusivePrefixSum`, which must probe because
    * its keys are arbitrary). Local window parallelism is
    * strata x `buckets`; the bucket-offset table (strata x buckets
    * rows) is the only tiny frame, joined back broadcast. */
  def tokenBudgetSample(df: DataFrame, idCol: String, strataCol: String,
      textCol: String, budget: Long, buckets: Int = 32): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two (top-bits bucketing)")
    val shift = 56 - Integer.numberOfTrailingZeros(buckets)
    // Materialize the tokenized frame: BOTH the local prefix window and
    // the offsets aggregate consume it, and tokenCount is a full pass
    // over the text bytes — without the cache the corpus is scanned and
    // tokenized twice (invisible at test SF, a second 100 TB pass at
    // scale). MEMORY_AND_DISK via OperatorCaches, so a later operator
    // call frees these blocks (and an evicted block recomputes instead
    // of failing).
    OperatorCaches.supersede()
    val in = OperatorCaches.register(df
      .withColumn("__h__", TextAnalysis.hash56(col(idCol).cast("string")))
      .withColumn("__nt__",
        TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("__b__", shiftright(col("__h__"), shift)))
    val local = Window.partitionBy(col(strataCol), col("__b__"))
      .orderBy(col("__h__").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = in.withColumn("__local__", sum(col("__nt__")).over(local))
    // exclusive per-stratum offset of each bucket = running total of all
    // PRIOR buckets' token sums (tiny: strata x buckets rows)
    val offsets = in.groupBy(col(strataCol), col("__b__"))
      .agg(sum(col("__nt__")).as("__bt__"))
      .withColumn("__off__", coalesce(
        sum(col("__bt__")).over(Window.partitionBy(col(strataCol))
          .orderBy(col("__b__").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(strataCol), col("__b__"), col("__off__"))
    withLocal.join(broadcast(offsets), Seq(strataCol, "__b__"))
      .filter(col("__off__") + col("__local__") <= lit(budget))
      .drop("__h__", "__nt__", "__b__", "__local__", "__off__")
  }
}
