package graft

import graft.decompose._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY §5 tier-2: decomposition identities must hold to 1e-9 for ANY
  * generated data (ScalaCheck generators over random two-group
  * datasets, sampled across seeds). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val datasetGen: Gen[Seq[(Double, Double, Double, String)]] = for {
    n <- Gen.choose(20, 60)
    seed <- Gen.choose(0L, 1000000L)
  } yield {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val g = if (i % 2 == 0) "A" else "B"
      val x1 = rng.nextDouble() * 10
      val x2 = rng.nextGaussian() * 3
      val y = (if (g == "A") 4.0 else 1.0) + 1.2 * x1 - 0.7 * x2 +
        rng.nextGaussian()
      (y, x1, x2, g)
    }
  }

  test("connected components match union-find on generated graphs") {
    (1 to 6).foreach { trial =>
      val rng = new scala.util.Random(trial * 7919L)
      val n = 20 + rng.nextInt(60)
      val m = rng.nextInt(3 * n)
      val edges = Seq.fill(m)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = nodes.map { v =>
          val r = find(v.toInt)
          v -> nodes.filter(u => find(u.toInt) == r).min
        }.toMap
        val got = graft.ext.Cluster
          .connectedComponents(edges.toDF("id_a", "id_b")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"trial $trial (n=$n m=$m)")
      }
    }
  }

  test("as-of and interval joins match brute force on generated events") {
    (1 to 4).foreach { trial =>
      val rng = new scala.util.Random(trial * 104729L)
      val keys = Array("a", "b", "c")
      def gen(n: Int) = (0 until n).map { i =>
        (i.toLong, keys(rng.nextInt(3)),
          new java.sql.Timestamp(1000000L + rng.nextInt(5000).toLong),
          rng.nextDouble())
      }
      val lefts = gen(40)
      val rights = gen(50)
      val leftDf = lefts.toDF("id", "k", "t", "v")
      val rightDf = rights.toDF("id", "k", "t", "v")

      val asofGot = graft.ext.AsOf.joinBackward(leftDf, rightDf, Seq("k"),
          "t", "t", Seq("v"), tiebreak = Some("id")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
      val asofWant = lefts.map { l =>
        val m = rights.filter(r => r._2 == l._2 &&
            !r._3.after(l._3))
          .sortBy(r => (r._3.getTime, r._1)).lastOption
        l._1 -> m.map(_._4)
      }.toMap
      assert(asofGot == asofWant, s"as-of trial $trial")

      val (lo, hi) = (-1.5, 2.0)
      val rjGot = graft.ext.RangeJoin.intervalJoin(leftDf, rightDf,
          Seq("k"), "t", "t", lo, hi, payload = Seq("id")).collect()
        .map(r => (r.getLong(0), r.getLong(5))).toSet
      val rjWant = (for {
        l <- lefts
        r <- rights
        if r._2 == l._2
        d = r._3.getTime - l._3.getTime
        if d >= (lo * 1000).toLong && d <= (hi * 1000).toLong
      } yield (l._1, r._1)).toSet
      assert(rjGot == rjWant, s"interval trial $trial")
    }
  }

  test("distributed type-7 quantiles equal the exact percentile aggregate, any ties/skew") {
    import org.apache.spark.sql.functions._
    (1 to 4).foreach { trial =>
      val rng = new scala.util.Random(trial * 15485863L)
      val nGroups = 1 + rng.nextInt(4)
      val rows = (0 until 500 + rng.nextInt(1500)).map { _ =>
        val g = s"g${rng.nextInt(nGroups)}"
        // heavy ties (quantized), occasional extreme magnitudes
        val v = if (rng.nextInt(10) == 0) rng.nextDouble() * 1e7
          else math.floor(rng.nextDouble() * 40) / 4.0
        (g, v)
      }
      val df = rows.toDF("g", "v")
      val taus = Seq(0.01, 0.25, 0.5, 0.9, 0.99)
      val got = graft.core.Windows.quantilesType7Grouped(
        df, col("g"), col("v"), taus)
      val want = df.groupBy(col("g"))
        .agg(expr(s"percentile(v, array(${taus.mkString("D,")}D))").as("qs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(got.keySet == want.keySet, s"trial $trial")
      want.foreach { case (g, qs) =>
        taus.zip(qs).foreach { case (t, q) =>
          val rel = math.max(1.0, math.abs(q))
          assert(math.abs(got(g)._2(t) - q) / rel < 1e-12,
            s"trial $trial $g tau=$t: ${got(g)._2(t)} vs $q")
        }
      }
    }
  }

  test("JL projection is linear: scaling and adding inputs scales and adds outputs") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(31L)
    val d = 24
    def vec() = Array.fill(d)((rng.nextGaussian()).toFloat)
    val a = vec(); val b = vec()
    val sum = a.zip(b).map { case (x, y) => x + y }
    val scaled = a.map(x => 2.5f * x)
    val df = Seq((0L, a), (1L, b), (2L, sum), (3L, scaled))
      .toDF("vec_id", "embedding")
    val out = graft.ext.Embeddings.jlProject(df, "embedding", k = 6, seed = 9L)
      .select(col("vec_id") +: (0 until 6).map(j => col(s"jl_$j")): _*)
      .collect().map(r => r.getLong(0) ->
        (1 to 6).map(r.getDouble).toArray).toMap
    (0 until 6).foreach { j =>
      assert(math.abs(out(2L)(j) - (out(0L)(j) + out(1L)(j))) < 1e-5)
      assert(math.abs(out(3L)(j) - 2.5 * out(0L)(j)) < 1e-5)
    }
  }

  test("explained + unexplained == total and three-fold sums to total, any data, all policies") {
    (1 to 8).foreach { trial =>
      val rows = datasetGen(Gen.Parameters.default, Seed(trial.toLong)).get
      val df = rows.toDF("y", "x1", "x2", "g")
      for (policy <- Seq(RefCoefficients.GroupA, RefCoefficients.GroupB,
        RefCoefficients.Pooled, RefCoefficients.Cotton)) {
        val res = Oaxaca.run(df, OaxacaConfig("y", "g", "B",
          predictors = Seq("x1", "x2"), bootstrapReps = 0,
          refCoefficients = policy))
        val explained = res.twoFold.find(_.name == "explained").get.estimate
        val unexplained = res.twoFold.find(_.name == "unexplained").get.estimate
        assert(math.abs(explained + unexplained - res.totalGap) < 1e-9,
          s"trial $trial $policy two-fold identity")
        assert(math.abs(res.threeFold.map(_.estimate).sum - res.totalGap) < 1e-9,
          s"trial $trial $policy three-fold identity")
      }
    }
  }
}
