package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Term-relevance scoring for training-data pipelines: TF-IDF vectors
  * and BM25 retrieval scores over a document table. Both are pure
  * DataFrame aggregation/join plans (codegen, no UDFs) with exact
  * ANSI-SQL oracles, and both shuffle on the natural keys (doc id for
  * lengths, term for document frequency) — the standard inverted-index
  * layout that holds at any corpus size.
  */
object Relevance {

  /** Non-distinct whitespace tokens per doc (one row per occurrence),
    * fanned out when the source scan has too little parallelism (same
    * small-file discipline as [[Dedup.shingles]]). */
  def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val in =
      if (df.rdd.getNumPartitions < 16) df.repartition(32, col(idCol)) else df
    in.select(col(idCol),
        explode(split(col(textCol), "\\s+")).as("term"))
      .filter(col("term") =!= "")
  }

  /** Smoothed TF-IDF per (doc, term):
    * tf/dl * (ln((N + 1)/(df + 1)) + 1), with tf the in-doc term count,
    * dl the doc token count, df the number of docs containing the term
    * and N the total document count (the sklearn-style smooth idf, which
    * never divides by zero). The token table is aggregated ONCE to the
    * (doc, term) level; doc lengths derive from that table (no second
    * token scan) and the df table joins back on the term key. */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nDocs = df.count()
    val tf = tokens(df, idCol, textCol)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dl, Seq(idCol)).join(dfreq, Seq("term"))
      .withColumn("tfidf",
        (col("tf").cast("double") / col("dl")) *
          (log((lit(nDocs.toDouble) + 1.0) / (col("df") + lit(1.0))) + 1.0))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Okapi BM25 score of each document against a bag of query terms:
    * sum over query terms of
    * ln(1 + (N - df + 0.5)/(df + 0.5)) * tf*(k1+1) /
    * (tf + k1*(1 - b + b*dl/avgdl)).
    * Only rows whose term is in the query survive the first aggregation
    * (the filter sits below the groupBy, so the big token table is
    * pruned before any shuffle); doc lengths come from an unfiltered
    * doc-level count. Docs containing no query term are absent. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val nDocs = df.count()
    val toks = tokens(df, idCol, textCol)
    // doc-level lengths: narrow (2 cols, one row per doc) — checkpoint
    // so the avgdl action and the score join don't re-run the token agg
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
      .localCheckpoint()
    // exact avgdl: integer token total / doc count (docs with zero
    // tokens count in N but contribute 0 length, as in Lucene)
    val totalLen = dl.agg(sum(col("dl"))).head().getLong(0)
    val avgdl = totalLen.toDouble / nDocs.toDouble
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    tf.join(dl, Seq(idCol)).join(dfreq, Seq("term"))
      .withColumn("term_score", termScore)
      .groupBy(col(idCol))
      .agg(sum(col("term_score")).as("bm25"),
        count(lit(1)).as("n_query_terms"))
  }
}
