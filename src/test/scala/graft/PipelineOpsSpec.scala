package graft

import graft.ext.{AsOf, Cluster, Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Connected-components dedup clustering, as-of join, deterministic
  * sampling, and PII redaction — the round-7 pipeline operators. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference 56-bit hash (same construction as TextAnalysis.hash56). */
  private def h56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(14), 16)
  }

  private def ccMap(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = pairs.toDF("id_a", "id_b")
    Cluster.connectedComponents(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connectedComponents: path + island") {
    val got = ccMap(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: long chain converges in O(log n) rounds") {
    val n = 200L
    val got = ccMap((0L until n - 1).map(i => (i, i + 1)))
    assert(got.size == n)
    assert(got.values.forall(_ == 0L))
  }

  test("connectedComponents matches union-find on a random graph") {
    val rng = new scala.util.Random(11)
    val n = 60
    val edges = Seq.fill(80)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // local union-find reference
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = nodes.map { v =>
      val root = find(v.toInt)
      val minInComp = nodes.filter(u => find(u.toInt) == root).min
      v -> minInComp
    }.toMap
    assert(ccMap(edges) == want)
  }

  test("connectedComponents: distributed star rounds match the driver fast path") {
    // small inputs route through the bounded driver union-find; force
    // the large-star/small-star loop (driverEdgeCap = 0) and assert the
    // two routes reach the identical fixpoint — the at-scale path must
    // stay correct even though test-sized inputs never take it
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(120)((rng.nextInt(80).toLong, rng.nextInt(80).toLong))
      .filter { case (a, b) => a != b } ++ Seq((200L, 201L))
    val df = edges.toDF("id_a", "id_b")
    val fast = Cluster.connectedComponents(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Cluster.connectedComponents(df, driverEdgeCap = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == fast)
  }

  test("assignClusters: canonical per component, singletons kept") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((2L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Cluster.assignClusters(docs, "doc_id", pairs)
      .select("doc_id", "cluster_id", "is_canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 1L, true), (2L, 2L, true), (3L, 3L, true),
      (4L, 4L, true), (5L, 2L, false), (6L, 2L, false)))
    val kept = Cluster.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
  }

  private def ts(ms: Long) = new Timestamp(ms)

  test("asof join: inclusive backward match, ties, nulls, tolerance") {
    val clicks = Seq(
      (1L, "u1", ts(1000), 10.0), // after v@500 -> 5.0
      (2L, "u1", ts(2000), 20.0), // exactly at v@2000 -> inclusive 7.0
      (3L, "u1", ts(300), 30.0),  // before any view -> null
      (4L, "u2", ts(5000), 40.0)  // other key: only u2's view
    ).toDF("event_id", "user_id", "ts", "value")
    val views = Seq(
      ("u1", ts(500), 5.0),
      ("u1", ts(2000), 7.0),
      ("u2", ts(4000), 9.0),
      ("u2", ts(100), 1.0)
    ).toDF("user_id", "ts", "view_value")
    val got = AsOf.joinBackward(clicks, views, Seq("user_id"), "ts", "ts",
        payload = Seq("view_value"))
      .select("event_id", "view_value_asof").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(1L -> Some(5.0), 2L -> Some(7.0), 3L -> None,
      4L -> Some(9.0)))

    // tolerance: u2's match is 1s back; a 0.5s tolerance nulls it
    val tol = AsOf.joinBackward(clicks, views, Seq("user_id"), "ts", "ts",
        payload = Seq("view_value"), toleranceSec = Some(0.5))
      .select("event_id", "view_value_asof").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(tol(4L) && tol(3L) && !tol(2L))
  }

  test("asof join: equal-time right rows resolved by tiebreak") {
    val left = Seq((1L, "k", ts(1000))).toDF("lid", "key", "ts")
    val right = Seq((10L, "k", ts(1000), 1.0), (20L, "k", ts(1000), 2.0))
      .toDF("rid", "key", "ts", "v")
    val got = AsOf.joinBackward(left, right, Seq("key"), "ts", "ts",
        payload = Seq("v"), tiebreak = Some("rid"))
      .select("v_asof").as[Double].collect()
    assert(got.toSeq == Seq(2.0)) // largest tiebreak wins
  }

  test("stratified hash sample: exact membership, rate, determinism") {
    val docs = (0L until 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val kept = Sampling.stratifiedHashSample(docs, "doc_id", "source",
        Map("a" -> 0.5, "b" -> 0.0), defaultFraction = 1.0)
      .select("doc_id").as[Long].collect().toSet
    // exact expected membership from the reference hash
    val want = (0L until 400L).filter(i => i % 2 == 0 &&
      math.floorMod(h56(s"graft:$i"), 1000000L) < 500000L).toSet
    assert(kept == want)
    assert(want.size > 70 && want.size < 130) // ~Binomial(200, .5)
    // unlisted stratum uses the default
    val all = Sampling.stratifiedHashSample(docs, "doc_id", "source",
      Map("a" -> 0.0), defaultFraction = 1.0)
    assert(all.count() == 200) // all of b, none of a
  }

  test("token budget sample: maximal in-budget prefix, bucket-invariant") {
    val docs = (0L until 100L)
      .map(i => (i, "s" + (i % 3), ("tok " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "source", "text")
    // local reference: per stratum, order by (h56(id), id), keep the
    // maximal prefix with cumulative token count <= 40
    val rows = (0L until 100L).map { i =>
      (i, "s" + (i % 3), (i % 7 + 1).toInt, h56(i.toString))
    }
    val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
      var cum = 0L
      rs.sortBy(r => (r._4, r._1)).takeWhile { r =>
        cum += r._3; cum <= 40
      }.map(_._1)
    }.toSet
    for (buckets <- Seq(1, 4, 32)) {
      val kept = Sampling.tokenBudgetSample(docs, "doc_id", "source",
          "text", budget = 40, buckets = buckets)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == want, s"buckets=$buckets")
    }
    // degenerate budgets
    assert(Sampling.tokenBudgetSample(docs, "doc_id", "source", "text",
      budget = 0).count() == 0)
    assert(Sampling.tokenBudgetSample(docs, "doc_id", "source", "text",
      budget = 1000000).count() == 100)
  }

  test("interval join matches brute force, inclusive boundaries") {
    val rng = new scala.util.Random(3)
    val base = 1700000000000000L // µs
    val left = (0 until 60).map(i =>
      (i.toLong, "k" + rng.nextInt(4), ts(base / 1000 + rng.nextInt(100000))))
      .toDF("lid", "key", "t")
    val right = (0 until 80).map(i =>
      (i.toLong + 1000, "k" + rng.nextInt(4),
        ts(base / 1000 + rng.nextInt(100000)), rng.nextDouble()))
      .toDF("rid", "key", "t2", "v")
    // window [-7s, 13s] — negative lo, not bucket-aligned
    val got = ext.RangeJoin.intervalJoin(left, right, Seq("key"), "t", "t2",
        -7.0, 13.0, payload = Seq("rid", "v"))
      .select("lid", "rid_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = left.as("l").join(right.as("r"), expr(
        """l.key = r.key AND
          |unix_micros(r.t2) >= unix_micros(l.t) - 7000000 AND
          |unix_micros(r.t2) <= unix_micros(l.t) + 13000000""".stripMargin))
      .select(col("l.lid"), col("r.rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want)

    // exact boundary inclusivity: right rows AT lo and AT hi match, one
    // µs outside does not
    val l1 = Seq((1L, "k", ts(1000000))).toDF("lid", "key", "t")
    val r1 = Seq((1L, "k", ts(1000000 - 7000)), (2L, "k", ts(1000000 + 13000)),
        (3L, "k", ts(1000000 - 7001)), (4L, "k", ts(1000000 + 13001)))
      .toDF("rid", "key", "t2")
    val hits = ext.RangeJoin.intervalJoin(l1, r1, Seq("key"), "t", "t2",
        -7.0, 13.0, payload = Seq("rid"))
      .select("rid_r").as[Long].collect().toSet
    assert(hits == Set(1L, 2L))
  }

  test("interval join: degenerate lo == hi window and pre-epoch timestamps") {
    // lo == hi is the exact-offset join: right exactly `lo` after left,
    // each qualifying pair exactly once (the two exploded bucket ids
    // coincide and must be deduped before the join)
    val l1 = Seq((1L, "k", ts(1000000)), (2L, "k", ts(2000000)))
      .toDF("lid", "key", "t")
    val r1 = Seq((1L, "k", ts(1000000 + 5000)), (2L, "k", ts(1000000 + 5001)),
        (3L, "k", ts(2000000 + 5000)))
      .toDF("rid", "key", "t2")
    val exact = ext.RangeJoin.intervalJoin(l1, r1, Seq("key"), "t", "t2",
        5.0, 5.0, payload = Seq("rid"))
      .select("lid", "rid_r").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.sorted.toSeq == Seq((1L, 1L), (2L, 3L)))

    // pre-epoch timestamps: truncating `div` collapses bucket ids near
    // the epoch — pairs must still match brute force with no duplicates
    val rng = new scala.util.Random(9)
    val left = (0 until 50).map(i =>
      (i.toLong, "k" + rng.nextInt(3), ts(rng.nextInt(120000) - 60000L)))
      .toDF("lid", "key", "t")
    val right = (0 until 60).map(i =>
      (i.toLong, "k" + rng.nextInt(3), ts(rng.nextInt(120000) - 60000L)))
      .toDF("rid", "key", "t2")
    val gotAll = ext.RangeJoin.intervalJoin(left, right, Seq("key"), "t",
        "t2", -11.0, 4.0, payload = Seq("rid"))
      .select("lid", "rid_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotAll.size == gotAll.toSet.size, "duplicate pairs emitted")
    val want = left.as("l").join(right.as("r"), expr(
        """l.key = r.key AND
          |unix_micros(r.t2) >= unix_micros(l.t) - 11000000 AND
          |unix_micros(r.t2) <= unix_micros(l.t) + 4000000""".stripMargin))
      .select(col("l.lid"), col("r.rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && gotAll.toSet == want)
  }

  test("topKByScore: ties by id, sharded == direct") {
    val docs = (0L until 90L)
      .map(i => (i, "s" + (i % 3), (i % 9).toDouble)) // many score ties
      .toDF("doc_id", "source", "score")
    def kept(shards: Int) = Sampling.topKByScore(docs, "doc_id", "source",
        col("score"), k = 7, shards = shards)
      .select("doc_id").as[Long].collect().toSet
    val direct = kept(1)
    // local reference: per stratum, top 7 by (score desc, id asc)
    val want = (0L until 90L).map(i => (i, "s" + (i % 3), (i % 9).toDouble))
      .groupBy(_._2).values.flatMap { rs =>
        rs.sortBy(r => (-r._3, r._1)).take(7).map(_._1)
      }.toSet
    assert(direct == want)
    assert(kept(4) == direct && kept(16) == direct)
  }

  test("end-to-end corpus recipe: dedup -> cluster -> gate -> sample -> budget -> redact") {
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val n0 = docs.count()

    // 1. exact dedup, then near-dup clustering over jaccard pairs
    val exact = Dedup.dropExactDuplicates(docs, "doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(exact, "doc_id", "text",
      n = 3, threshold = 0.8)
    val canonical = Cluster.dropNearDuplicates(exact, "doc_id", pairs)
    // 2. keep the 15 best docs per source by quality
    val score = TextAnalysis.qualityCols(col("text"))
      .find(_._1 == "quality_score").get._2
    val gated = Sampling.topKByScore(canonical.withColumn("q", score),
      "doc_id", "source", col("q"), k = 15, shards = 2)
    // 3. 50% hash sample, then a 300-token budget per source
    val sampled = Sampling.stratifiedHashSample(gated, "doc_id", "source",
      Map.empty, defaultFraction = 0.5)
    val budgeted = Sampling.tokenBudgetSample(sampled, "doc_id", "source",
      "text", budget = 300)
    // 4. redact
    val fin = budgeted.withColumn("text", TextAnalysis.redactPii(col("text")))

    val counts = Seq(exact, canonical, gated, sampled, budgeted, fin)
      .map(_.count())
    // each stage only ever drops rows; redaction drops none
    assert((n0 +: counts).sliding(2).forall(w => w(1) <= w(0)))
    assert(counts(5) == counts(4))
    assert(counts.last > 0)
    // the budget binds per stratum
    val overBudget = budgeted
      .groupBy(col("source"))
      .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("t"))
      .filter(col("t") > 300).count()
    assert(overBudget == 0)
    // deterministic end to end: the same recipe yields the same ids
    val ids1 = fin.select("doc_id").as[Long].collect().toSet
    val fin2 = Sampling.tokenBudgetSample(
      Sampling.stratifiedHashSample(gated, "doc_id", "source",
        Map.empty, defaultFraction = 0.5),
      "doc_id", "source", "text", budget = 300)
    assert(fin2.select("doc_id").as[Long].collect().toSet == ids1)
  }

  test("pii redaction: categories, counts, clean text untouched") {
    val df = Seq(
      (1L, "mail bob.smith+x@ex-corp.co.uk now"),
      (2L, "call 555-123-4567 or 555-000-1111"),
      (3L, "host 10.0.255.7 down"),
      (4L, "clean text with @ lone at-sign and 12-34 numbers"),
      (5L, "multi a@b.co 1.2.3.4 555-111-2222")
    ).toDF("id", "text")
    val cnts = TextAnalysis.piiCounts(col("text"))
    val got = df.select(Seq(col("id"),
        TextAnalysis.redactPii(col("text")).as("red")) ++
        cnts.map { case (n, c) => c.cast("int").as(n) }: _*)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(got(1L) == ("mail [EMAIL] now", 1, 0, 0))
    assert(got(2L) == ("call [PHONE] or [PHONE]", 0, 2, 0))
    assert(got(3L) == ("host [IP] down", 0, 0, 1))
    assert(got(4L) == ("clean text with @ lone at-sign and 12-34 numbers",
      0, 0, 0))
    assert(got(5L) == ("multi [EMAIL] [IP] [PHONE]", 1, 1, 1))
  }
}
