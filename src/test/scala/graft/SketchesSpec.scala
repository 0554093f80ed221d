package graft

import graft.ext.Sketches
import org.apache.spark.sql.functions._

/** Count-min sketch: overcount-only estimates, exact mergeability over
  * corpus shards, partition-independence, and the wide-grid exactness
  * that makes the q_countmin oracle's estimates meaningful. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Long, n: Int) = {
    val rng = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    (0 until n).map { i =>
      (i.toLong, Seq.fill(3 + rng.nextInt(20))(
        vocab(rng.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("estimates never undercount; wide grids are exact; totals add up") {
    val df = corpus(3L, 300)
    val exact = df.select(explode(split(col("text"), "\\s+")).as("t"))
      .filter(col("t") =!= "").groupBy(col("t")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val narrow = Sketches.countMinTokens(df, "text", depth = 3, width = 8)
    exact.foreach { case (t, n) =>
      assert(narrow.estimate(t) >= n, s"undercount for $t")
    }
    assert(narrow.total == exact.values.sum)
    assert(narrow.cells.forall(_.sum == narrow.total))
    // 10-token vocabulary in a 4096-wide grid: an all-rows collision
    // would need the same partner in every row — estimates are exact
    val wide = Sketches.countMinTokens(df, "text", depth = 4, width = 4096)
    exact.foreach { case (t, n) => assert(wide.estimate(t) == n) }
  }

  test("sketches over disjoint shards merge to the whole-corpus sketch") {
    val df = corpus(11L, 400)
    val a = df.filter(col("doc_id") < 150)
    val b = df.filter(col("doc_id") >= 150)
    val whole = Sketches.countMinTokens(df, "text")
    val merged = Sketches.countMinTokens(a, "text")
      .merge(Sketches.countMinTokens(b, "text"))
    assert(merged.total == whole.total)
    (0 until whole.depth).foreach { r =>
      assert(merged.cells(r).toSeq == whole.cells(r).toSeq, s"row $r")
    }
    // shape/seed mismatches refuse to merge
    val other = Sketches.countMinTokens(df, "text", seed = 9L)
    intercept[IllegalArgumentException] { whole.merge(other) }
  }

  test("linear counter: estimate tracks exact cardinality; OR-merge; saturation errors") {
    val rng = new scala.util.Random(41L)
    val vocabA = (0 until 150).map(i => s"worda$i")
    val vocabB = (0 until 150).map(i => s"wordb$i")
    val df = (0 until 400).map { i =>
      val vocab = if (i % 2 == 0) vocabA else vocabB
      (i.toLong, if (i % 2 == 0) "A" else "B",
        Seq.fill(12)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "g", "text")
    val counters = Sketches.linearCountTokens(df, "text", "g", m = 4096)
    val exact = df.select(col("g"),
        explode(split(col("text"), "\\s+")).as("t"))
      .groupBy(col("g")).agg(countDistinct(col("t")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      val est = counters(g).estimate
      // load factor ~150/4096: linear counting is accurate to a few %
      assert(math.abs(est - n) / n < 0.05, s"$g: est $est vs exact $n")
      assert(counters(g).occupied <= n)
    }
    // partition-invariance (bitwise OR commutes)
    val again = Sketches.linearCountTokens(df.repartition(9), "text", "g",
      m = 4096)
    counters.foreach { case (g, c) =>
      assert(c.bits.toSeq == again(g).bits.toSeq)
    }
    // disjoint-shard OR-merge reproduces the whole-corpus bitmap: group
    // "A" docs split across two frames
    val a1 = df.filter(col("g") === "A" && col("doc_id") < 200)
    val a2 = df.filter(col("g") === "A" && col("doc_id") >= 200)
    val merged = Sketches.linearCountTokens(a1, "text", "g")("A")
      .merge(Sketches.linearCountTokens(a2, "text", "g")("A"))
    assert(merged.bits.toSeq ==
      Sketches.linearCountTokens(df.filter(col("g") === "A"), "text", "g")("A").bits.toSeq)
    // saturation: a fully-set bitmap has no empty bits to correct from
    val full = Sketches.LinearCounter(64, 7L, Array(-1L))
    intercept[IllegalArgumentException] { full.estimate }
  }

  test("bloom: no false negatives; driver and column tests agree; FPR sane; OR-merge") {
    val members = (0 until 300).map(i => s"member$i")
    val nonMembers = (0 until 2000).map(i => s"other$i")
    val bloom = Sketches.bloomOf(members.toDF("item"), "item",
      m = 8192, k = 4)
    // every inserted item tests positive (the defining guarantee)
    members.foreach(x => assert(bloom.mightContain(x), x))
    // FPR at this load (kn/m = 0.146): (1 - e^-0.146)^4 ~ 3.4e-4 —
    // allow 100x headroom before calling it broken
    val fp = nonMembers.count(bloom.mightContain)
    assert(fp <= 60, s"$fp false positives of ${nonMembers.size}")
    // the codegen column test agrees with the driver test, row by row
    val all = (members ++ nonMembers).toDF("item")
    val colHits = all.select(col("item"),
        bloom.mightContainCol(col("item")).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    (members ++ nonMembers).foreach { x =>
      assert(colHits(x) == bloom.mightContain(x), x)
    }
    // disjoint inserts OR-merge to the union's bitmap
    val m1 = Sketches.bloomOf(members.take(150).toDF("item"), "item",
      m = 8192, k = 4)
    val m2 = Sketches.bloomOf(members.drop(150).toDF("item"), "item",
      m = 8192, k = 4)
    assert(m1.merge(m2).bits.toSeq == bloom.bits.toSeq)
  }

  test("the grid is identical on any partitioning (integer counts commute)") {
    val df = corpus(29L, 250)
    val one = Sketches.countMinTokens(df, "text")
    val many = Sketches.countMinTokens(df.repartition(13), "text")
    (0 until one.depth).foreach { r =>
      assert(one.cells(r).toSeq == many.cells(r).toSeq)
    }
  }

  test("Bloom.sizeFor hits the target false-positive rate") {
    import graft.ext.Sketches
    // textbook check: 1000 members at 1% -> m ~ 9585 bits, k ~ 7
    val (m, k) = Sketches.Bloom.sizeFor(1000L, 0.01)
    assert(m % 64 == 0 && m >= 9585 && m <= 9664, s"m=$m")
    assert(k == 7, s"k=$k")
    // measured FP on disjoint probes stays near the target
    val spark = TestSpark.spark
    import spark.implicits._
    val bloom = Sketches.bloomOf(
      (0 until 1000).map(i => s"member-$i").toDF("item"), "item", m, k)
    val fp = (0 until 2000).count(i => bloom.mightContain(s"probe-$i"))
    assert(fp <= 60, s"fp=$fp of 2000 (expected ~20 at 1%)")
    // members always pass
    assert((0 until 1000).forall(i => bloom.mightContain(s"member-$i")))
    // monotone: tighter rate -> bigger filter, never below one word
    assert(Sketches.Bloom.sizeFor(1000L, 0.001)._1 > m)
    assert(Sketches.Bloom.sizeFor(1L, 0.5)._1 == 64)
  }
}
