package graft.ext

import graft.core.OperatorCaches
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram language model scoring — the classic LLM-pipeline
  * quality filter (CCNet-style): train token statistics on the corpus
  * itself (or a reference corpus), then score every document by its
  * per-token negative log-likelihood; documents with perplexity far
  * from the corpus norm (boilerplate, gibberish, lists) are filtered.
  *
  * Scale shape: counting is two hash aggregations over exploded
  * token/bigram streams and scoring is two equi-joins on n-gram keys —
  * everything shuffles on content keys, nothing funnels through one
  * task. Hot keys (stopwords) are exactly the skew AQE's skew-join
  * handles; the count tables are far smaller than the corpus (vocab,
  * not tokens). The (id, token-array) projection is materialized once
  * via [[graft.core.OperatorCaches]], so each text is regex-split
  * exactly once per call no matter how many streams derive from it.
  */
object LangModel {

  private def toks(textCol: Column): Column =
    array_remove(split(textCol, "\\s+"), "")

  /** (w1, w2) adjacent-pair structs from a token-array column — the
    * array zipped with itself shifted by one; pure codegen. */
  private def bigrams(arr: Column): Column =
    transform(slice(arr, lit(2), size(arr) - 1),
      (x, i) => struct(element_at(arr, i + 1).as("w1"), x.as("w2")))

  /** Per-document bigram negative log-likelihood under an add-`k`
    * smoothed bigram model trained on `train` (default: the corpus
    * itself; pass a reference corpus for CCNet-style filtering):
    *
    *   P(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k * V)
    *
    * with V the training vocabulary size. Returns one row per document
    * with at least one bigram: `(idCol, n_bigrams, avg_nll, ppl)`
    * where avg_nll is the mean -ln P over the document's bigrams and
    * ppl = exp(avg_nll). N-grams unseen in training fall back to the
    * smoothing floor (counts coalesce to 0 through the left joins). */
  def bigramScore(df: DataFrame, idCol: String, textCol: String,
      train: Option[DataFrame] = None, k: Double = 1.0): DataFrame = {
    require(k > 0.0, "smoothing k must be positive")
    OperatorCaches.supersede()
    val arr = OperatorCaches.register(
      df.select(col(idCol), toks(col(textCol)).as("__toks__")))

    // training streams: from the cached corpus arrays unless a separate
    // reference corpus is supplied
    val trainArr = train.map(t => t.select(toks(col(textCol)).as("__toks__")))
      .getOrElse(arr.select(col("__toks__")))
    val uni = trainArr.select(explode(col("__toks__")).as("__w__"))
      .groupBy(col("__w__")).agg(count(lit(1)).as("__cu__"))
    val biCnt = trainArr.filter(size(col("__toks__")) >= 2)
      .select(explode(bigrams(col("__toks__"))).as("__bg__"))
      .select(col("__bg__.w1").as("__w1__"), col("__bg__.w2").as("__w2__"))
      .groupBy(col("__w1__"), col("__w2__")).agg(count(lit(1)).as("__cb__"))
    // vocabulary size: one scalar to the driver (the uni table's row
    // count — vocab-sized aggregate, not a corpus pass)
    val vocab = uni.count().toDouble

    val bi = arr.filter(size(col("__toks__")) >= 2)
      .select(col(idCol), explode(bigrams(col("__toks__"))).as("__bg__"))
      .select(col(idCol), col("__bg__.w1").as("__w1__"),
        col("__bg__.w2").as("__w2__"))

    val nll = log((coalesce(col("__cu__"), lit(0L)).cast("double") +
      lit(k) * lit(vocab)) /
      (coalesce(col("__cb__"), lit(0L)).cast("double") + lit(k)))
    bi.join(biCnt, Seq("__w1__", "__w2__"), "left")
      .join(uni.withColumnRenamed("__w__", "__w1__"), Seq("__w1__"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(nll).as("avg_nll"))
      .withColumn("ppl", exp(col("avg_nll")))
  }
}
