package graft

import graft.ext._
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checked queries for the LLM-data-pipeline extension operators
  * (dedup, similarity search, text analysis, multimodal, events).
  * The md5-derived 56-bit hash family is reproducible in DuckDB SQL
  * (('0x' || substr(md5(x),1,14))::BIGINT), so even MinHash/SimHash have
  * exact oracles; the band/bit SQL is generated from the same constants
  * as the Spark side. */
object QueriesExt {

  import Queries.{r6, t}

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects; read nanos as long and convert (micro truncation — the
    * synthetic data is ms-precision, so lossless). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn("ts",
      timestamp_micros(floor(col("ts") / 1000).cast("long")))
  }

  private val EnStop = TextAnalysis.LangStopwords.head._2

  /** In real use an ANN index is built once and queried many times; cache
    * the fitted IVF quantizer per (session, dir) so the benched number is
    * query cost, not index-build cost. Swept by [[clearSessionCaches]]
    * (wired into the bench's between-runs sweep like `liWithRowId`). */
  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), Ann.IvfIndex]
  private def ivfIndex(s: SparkSession, d: String): Ann.IvfIndex =
    ivfCache.getOrElseUpdate((System.identityHashCode(s), d), {
      val idx = Ann.buildIvfIndex(t(s, d, "embeddings"), "vec_id",
        "embedding", nCells = 8)
      idx.assigned.count() // materialize the cell assignment now
      idx
    })

  /** Bench hook: drop the cached IVF index. */
  def clearSessionCaches(): Unit = {
    ivfCache.values.foreach(_.unpersist())
    ivfCache.clear()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- text analysis ----
    "q_doc_stats" -> ((s, d) =>
      t(s, d, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          r6(avg(col("n_chars"))).as("avg_chars"),
          r6(avg(TextAnalysis.tokenCount(col("text")))).as("avg_tokens"))
        .orderBy(col("lang"))),

    "q_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("lang"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_pred"))),

    "q_quality" -> ((s, d) => {
      val score = TextAnalysis.qualityCols(col("text"))
        .find(_._1 == "quality_score").get._2
      t(s, d, "documents").groupBy(col("source"))
        .agg(r6(avg(score)).as("avg_quality"), count(lit(1)).as("n"))
        .orderBy(col("source"))
    }),

    "q_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprint(
          t(s, d, "documents").filter(col("doc_id") < 50), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // top-20 (doc, term) pairs by smoothed TF-IDF; ordering on the
    // ROUNDED score (+ id/term tiebreak) so both engines pick the same
    // rows at the cutoff
    "q_tfidf_top" -> ((s, d) =>
      Relevance.tfIdf(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          r6(col("tfidf")).as("tfidf"))
        .orderBy(col("tfidf").desc, col("doc_id"), col("term"))
        .limit(20)),

    "q_bm25" -> ((s, d) =>
      Relevance.bm25(t(s, d, "documents"), "doc_id", "text",
          Seq("spark", "join", "filter"))
        .select(col("doc_id"), r6(col("bm25")).as("bm25"),
          col("n_query_terms"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(15)),

    "q_repetition" -> ((s, d) =>
      TextAnalysis.repetitionStats(
          t(s, d, "documents").filter(col("doc_id") < 50), "doc_id", "text",
          n = 3)
        .select(col("doc_id"), col("total_ngrams"), col("distinct_ngrams"),
          r6(col("rep_ratio")).as("rep_ratio"),
          r6(col("top_share")).as("top_share"))
        .orderBy(col("doc_id"))),

    // ---- dedup family ----
    "q_dedup_exact" -> ((s, d) =>
      t(s, d, "documents").groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          countDistinct(md5(col("text"))).as("n_distinct"))
        .orderBy(col("source"))),

    "q_jaccard_pairs" -> ((s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
          n = 3, threshold = 0.8, maxShingleDf = Some(10000L))
        .select(col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

    "q_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text",
          shingleN = 3, numHashes = 16, bands = 8, threshold = 0.8)
        .select(col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

    "q_simhash" -> ((s, d) =>
      Dedup.simhash(t(s, d, "documents").filter(col("doc_id") < 50),
          "doc_id", "text")
        .orderBy(col("doc_id"))),

    "q_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents").filter(col("doc_id") < 50),
          "doc_id", "text", maxHamming = 1)
        .orderBy(col("id_a"), col("id_b"))),

    // ---- similarity search ----
    "q_embed_neardup" -> ((s, d) =>
      Dedup.embeddingNearDupPairs(t(s, d, "embeddings"), "vec_id",
          "embedding", threshold = 0.4)
        .select(col("id_a"), col("id_b"), r6(col("cosine")).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))),

    // sub-quadratic near-dup (IVF cells + exact verify): rows-only (the
    // KMeans quantizer has no SQL oracle); recall/exactness spec-covered
    "q_embed_neardup_ivf" -> ((s, d) =>
      Dedup.embeddingNearDupPairsFromIndex(ivfIndex(s, d), threshold = 0.4)
        .select(col("id_a"), col("id_b"), r6(col("cosine")).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))),

    "q_ann_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Ann.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, "vec_id",
          "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          r6(col("cosine")).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "q_ann_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Ann.searchIvf(ivfIndex(s, d), emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nProbe = 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          r6(col("cosine")).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- multimodal: REAL image decode (javax.imageio; rows-only —
    // no SQL engine can replay a PNG codec). Payloads are deterministic
    // doc-derived PNGs (the environment ships no image corpus), so the
    // decoded dimensions/histograms are exact functions of the data. ----
    "q_multimodal" -> ((s, d) => {
      val media = Multimodal.synthesizePng(
        t(s, d, "documents").filter(col("doc_id") < 100), "doc_id", "text")
      Multimodal.imageFeatures(media, histBins = 16)
        .select(col("media_id"), col("mime"), col("n_bytes"),
          col("decode_ok"), col("width"), col("height"), col("channels"),
          r6(expr("aggregate(zip_with(luma_hist, sequence(0, size(luma_hist) - 1)," +
            " (v, i) -> v * i), 0D, (a, x) -> a + x)")).as("luma_mean_bin"))
        .orderBy(col("media_id"))
    }),

    // ---- events / streaming-safe window aggregation ----
    "q_events_window" -> ((s, d) =>
      Streams.windowedEventStats(events(s, d))
        .select(col("window_start"), col("event_type"), col("n_events"),
          round(col("sum_value"), 2).as("sum_value"),
          // avg derived from the ROUNDED sum: both engines then divide
          // bit-identical doubles, so no rounding-boundary races
          round(round(col("sum_value"), 2) / col("n_events"), 6).as("avg_value"))
        .orderBy(col("window_start"), col("event_type"))),

    "q_events_gap" -> ((s, d) =>
      Streams.windowedGroupGap(events(s, d), "event_type", "click", "view",
          "value")
        .select(col("window_start"), round(col("gap"), 4).as("gap"),
          col("n_a"), col("n_b"))
        .orderBy(col("window_start"))),

    "q_sessions" -> ((s, d) =>
      Streams.sessionCounts(events(s, d), gap = "30 minutes")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_session_events"))
        .orderBy(col("user_id")))
  )

  // ---------------------------------------------------------------------
  // oracle SQL
  // ---------------------------------------------------------------------

  /** hash56 in DuckDB. */
  private def h56(e: String) = s"(('0x' || substr(md5($e), 1, 14))::BIGINT)"

  private val tokensCte =
    """toks AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents
      |)""".stripMargin

  /** Distinct 3-gram shingles per doc (matches Dedup.shingles). */
  private val shinglesCte =
    """sh AS (
      |  SELECT DISTINCT doc_id, s AS shingle FROM (
      |    SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
      |      i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS s
      |    FROM toks WHERE len(tk) >= 3
      |  ) WHERE s <> ''
      |)""".stripMargin

  private val jaccardCte =
    s"""WITH $tokensCte, $shinglesCte,
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM sh a JOIN sh b USING (shingle)
       |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
       |), jac AS (
       |  SELECT id_a, id_b, i * 1.0 / (x.sz + y.sz - i) AS jaccard
       |  FROM inter JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
       |)""".stripMargin

  private val langCases = TextAnalysis.LangStopwords.map { case (l, ws) =>
    l -> s"len(regexp_extract_all(lower(text), '\\b(${ws.mkString("|")})\\b'))"
  }

  private val langPredExpr = {
    val m = s"greatest(${langCases.map(_._2).mkString(", ")})"
    val cases = langCases.map { case (l, e) =>
      s"WHEN $e = __m AND __m > 0 THEN '$l'"
    }.mkString(" ")
    (s"CASE $cases ELSE 'und' END", m)
  }

  private val qualityExpr = {
    val nChars = "CAST(length(text) AS DOUBLE)"
    val nTokens = s"CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE)"
    val nPunct = s"CAST(len(regexp_extract_all(text, '[,.;:!?]')) AS DOUBLE)"
    val nStop = s"CAST(len(regexp_extract_all(lower(text), '\\b(${EnStop.mkString("|")})\\b')) AS DOUBLE)"
    val punctRatio = s"(CASE WHEN $nChars > 0 THEN $nPunct / $nChars ELSE 0.0 END)"
    val stopRatio = s"(CASE WHEN $nTokens > 0 THEN $nStop / $nTokens ELSE 0.0 END)"
    s"""(0.4 * least($nChars / 200.0, 1.0)
       | + 0.3 * least($stopRatio * 4.0, 1.0)
       | + 0.3 * (1.0 - least($punctRatio * 10.0, 1.0)))""".stripMargin
  }

  /** SimHash SQL generated from the same constants as Dedup.simhash. */
  private val simhashSql = {
    val bitSums = (0 until 16).map(b =>
      s"sum(((__h >> $b) & 1) * 2 - 1) AS s_$b").mkString(",\n    ")
    val sig = (0 until 16).map(b =>
      s"(CASE WHEN s_$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""WITH toks0 AS (
       |  SELECT DISTINCT doc_id, tok FROM (
       |    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
       |    FROM documents WHERE doc_id < 50
       |  ) WHERE tok <> ''
       |), h AS (
       |  SELECT doc_id, ${h56("tok")} AS __h FROM toks0
       |), bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM h GROUP BY doc_id
       |)
       |SELECT doc_id, CAST($sig AS BIGINT) AS simhash
       |FROM bits ORDER BY doc_id""".stripMargin
  }

  /** SimHash near-dup pairs: the oracle verifies the banded Spark plan
    * against a direct all-pairs Hamming filter over the same signatures
    * (pigeonhole banding is lossless, so the two must agree exactly). */
  private val simhashPairsSql = {
    val bitSums = (0 until 16).map(b =>
      s"sum(((__h >> $b) & 1) * 2 - 1) AS s_$b").mkString(",\n    ")
    val sig = (0 until 16).map(b =>
      s"(CASE WHEN s_$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""WITH toks0 AS (
       |  SELECT DISTINCT doc_id, tok FROM (
       |    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
       |    FROM documents WHERE doc_id < 50
       |  ) WHERE tok <> ''
       |), h AS (
       |  SELECT doc_id, ${h56("tok")} AS __h FROM toks0
       |), bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM h GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM bits
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** MinHash+LSH SQL generated from the same constants (16 hashes, 8
    * bands of 2). */
  private val minhashSql = {
    val mins = (0 until 16).map(j =>
      s"min(${h56(s"'$j:' || shingle")}) AS mh_$j").mkString(",\n    ")
    val bandRows = (0 until 8).map { b =>
      val ks = Seq(2 * b, 2 * b + 1).map(r => s"mh_$r").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('_', $ks)) AS bkey FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""$jaccardCte, sigs AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM sh GROUP BY doc_id
       |), banded AS (
       |  $bandRows
       |), cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
       |)
       |SELECT c.id_a, c.id_b, round(j.jaccard, 6) AS jaccard
       |FROM cand c JOIN jac j ON j.id_a = c.id_a AND j.id_b = c.id_b
       |WHERE j.jaccard >= 0.8
       |ORDER BY c.id_a, c.id_b""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_doc_stats" ->
      """SELECT lang, count(*) AS n, round(avg(n_chars), 6) AS avg_chars,
        |  round(avg(len(regexp_extract_all(text, '\S+'))), 6) AS avg_tokens
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_lang_id" -> {
      val (caseExpr, maxExpr) = langPredExpr
      s"""SELECT lang, lang_pred, count(*) AS n FROM (
         |  SELECT lang, $caseExpr AS lang_pred FROM (
         |    SELECT lang, text, $maxExpr AS __m FROM documents
         |  )
         |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "q_quality" ->
      s"""SELECT source, round(avg($qualityExpr), 6) AS avg_quality,
         |  count(*) AS n
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_fingerprint" ->
      s"""SELECT doc_id, bit_xor(${h56("tok")}) AS fingerprint FROM (
         |  SELECT DISTINCT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
         |  FROM documents WHERE doc_id < 50
         |) WHERE tok <> '' GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // smoothed TF-IDF (sklearn-style): tf/dl * (ln((N+1)/(df+1)) + 1);
    // arithmetic written in the same order as Relevance.tfIdf so the
    // doubles match bit-for-bit before rounding
    "q_tfidf_top" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
        |  FROM documents
        |), t2 AS (SELECT doc_id, term FROM t WHERE term <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t2 GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
        |SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |  round((CAST(tf.tf AS DOUBLE) / dl.dl) *
        |    (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 6) AS tfidf
        |FROM tf
        |JOIN dl ON dl.doc_id = tf.doc_id
        |JOIN dfreq ON dfreq.term = tf.term, n
        |ORDER BY tfidf DESC, tf.doc_id, tf.term LIMIT 20""".stripMargin,

    // Okapi BM25 for query terms (spark, join, filter), k1=1.2, b=0.75;
    // avgdl = exact integer token total / doc count, as in Relevance.bm25
    "q_bm25" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
        |  FROM documents
        |), t2 AS (SELECT doc_id, term FROM t WHERE term <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM t2 GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |avgdl AS (SELECT CAST(sum(dl) AS DOUBLE) /
        |  (SELECT n FROM n) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM t2
        |  WHERE term IN ('spark', 'join', 'filter') GROUP BY 1, 2
        |), dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT tf.doc_id,
        |    ln(1.0 + (n.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
        |      (tf.tf * (1.2 + 1.0)) /
        |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl.avgdl))
        |      AS term_score
        |  FROM tf
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  JOIN dfreq ON dfreq.term = tf.term, n, avgdl
        |)
        |SELECT doc_id, round(sum(term_score), 6) AS bm25,
        |  count(*) AS n_query_terms
        |FROM scored GROUP BY 1
        |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin,

    // 3-gram repetition profile (degenerate-text screen)
    "q_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk
        |  FROM documents WHERE doc_id < 50
        |), g AS (
        |  SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
        |    i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS gram
        |  FROM toks WHERE len(tk) >= 3
        |), g2 AS (SELECT doc_id, gram FROM g WHERE gram <> ''),
        |c AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_ngrams,
        |  count(*) AS distinct_ngrams,
        |  round(1.0 - CAST(count(*) AS DOUBLE) / sum(c), 6) AS rep_ratio,
        |  round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_share
        |FROM c GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT source, count(*) AS n, count(DISTINCT md5(text)) AS n_distinct
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_jaccard_pairs" -> (jaccardCte +
      """
        |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac
        |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin),

    "q_minhash_lsh" -> minhashSql,

    "q_simhash" -> simhashSql,

    "q_simhash_pairs" -> simhashPairsSql,

    "q_embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[],
        |    b.embedding::DOUBLE[]), 6) AS cosine
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.embedding::DOUBLE[],
        |    b.embedding::DOUBLE[]) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "q_ann_topk" ->
      """SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
        |  round(cosine, 6) AS cosine FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[],
        |      c.embedding::DOUBLE[]) AS cosine,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_cosine_similarity(q.embedding::DOUBLE[],
        |        c.embedding::DOUBLE[]) DESC, c.vec_id) AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
        |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_events_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value,
        |  round(round(sum(value), 2) / count(*), 6) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_events_gap" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |  round(avg(CASE WHEN event_type = 'click' THEN value END)
        |    - avg(CASE WHEN event_type = 'view' THEN value END), 4) AS gap,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // gaps-and-islands session equivalent of session_window(ts, 30 min):
    // a new session starts when the gap from the previous event is >= 30
    // minutes (session_window merges events with gap < gap duration)
    "q_sessions" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |      < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
        |  FROM events
        |), sess AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked
        |), per AS (
        |  SELECT user_id, sid, count(*) AS n FROM sess GROUP BY 1, 2
        |)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(n) AS BIGINT) AS n_events, max(n) AS max_session_events
        |FROM per GROUP BY 1 ORDER BY user_id""".stripMargin
  )
}
