package graft

import graft.decompose._
import graft.estimators.{Kde, Logit, Rif}
import graft.prep.Prep
import org.apache.spark.sql.functions.{avg, col}

/** RIF quantile decomposition, DFL and logit: mirrors
  * `oaxaca_blinder/tests/rif_test.rs`, `features_test.rs:74-89` and the
  * statsmodels-checked golden in `math/logit.rs:126-146`. */
class QuantileSpec extends SparkSpec {
  import spark.implicits._

  test("logit matches statsmodels golden values (logit.rs)") {
    val xs = Seq(-5.0, -4.0, -3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    val ys = Seq(0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    val df = Prep.withIntercept(ys.zip(xs).toDF("y", "x"))
    val fit = Logit.fit(df, "y", Seq(Prep.InterceptCol, "x"))
    assert(fit.converged)
    assert(math.abs(fit.beta(0) - 0.6533055) < 1e-4)
    assert(math.abs(fit.beta(1) - 1.3046124) < 1e-4)
  }

  test("logit honors max iterations") {
    val xs = Seq(-5.0, -4.0, -3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    val ys = Seq(0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    val df = Prep.withIntercept(ys.zip(xs).toDF("y", "x"))
    val fit = Logit.fit(df, "y", Seq(Prep.InterceptCol, "x"), maxIter = 1)
    assert(!fit.converged && fit.iterations == 1)
  }

  test("RIF q90 decomposition: higher-variance group wins the upper tail") {
    val rows =
      (0 until 100).map(i => (20.0 + (i % 5), "F", 12.0 + (i % 4))) ++
      (0 until 100).map(i => (15.0 + (i % 15), "M", 12.0 + (i % 4)))
    val df = rows.toDF("wage", "group", "education")
    val res = RifDecomposer.decomposeQuantile(df,
      OaxacaConfig("wage", "group", "F", predictors = Seq("education"),
        bootstrapReps = 10), tau = 0.9)
    assert(res.totalGap > 0.0, s"q90 gap ${res.totalGap}")
    val explained = res.twoFold.find(_.name == "explained").get.estimate
    val unexplained = res.twoFold.find(_.name == "unexplained").get.estimate
    assert(math.abs(explained + unexplained - res.totalGap) < 1e-9)
  }

  test("RIF transform matches the rif.rs formula on a known vector") {
    // single group, known quantile: y = 1..9, tau = 0.5 -> q = 5 (type 7)
    val df = (1 to 9).map(i => (i.toDouble, "G")).toDF("y", "g")
    val (out, info) = Rif.transformPerGroup(df, "y", "g", 0.5)
    assert(info.size == 1)
    val gi = info.head
    assert(gi.qTau == 5.0)
    // hand-check density: bw from rif.rs (std of 1..9 = 2.7386..,
    // iqr idx ceil(.25*9)=3 -> sorted[2]=3, ceil(.75*9)=7 -> sorted[6]=7)
    val std = math.sqrt((1 to 9).map(v => math.pow(v - 5.0, 2)).sum / 8.0)
    val iqr = 7.0 - 3.0
    val spread = math.min(std, iqr / 1.34)
    val bw = 0.9 * spread * math.pow(9.0, -0.2)
    assert(math.abs(gi.bandwidth - bw) < 1e-12)
    val dens = (1 to 9).map { v =>
      val u = (5.0 - v) / bw
      math.exp(-0.5 * u * u) / math.sqrt(2 * math.Pi)
    }.sum / (9 * bw)
    assert(math.abs(gi.density - dens) < 1e-12)
    val rifs = out.select("y", "__rif__").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(rifs(3.0) - (5.0 + (0.5 - 1.0) / dens)) < 1e-9)
    assert(math.abs(rifs(9.0) - (5.0 + 0.5 / dens)) < 1e-9)
  }

  test("RIF singleton/tiny groups: passthrough and closed-form mean agree") {
    // n < 2 groups take the y-passthrough in the output column; meanRif
    // must report the same thing (qTau = the single value), NOT the
    // closed form over the floored density (which would be wildly off).
    val df = Seq((7.25, "solo"), (1.0, "big"), (2.0, "big"), (3.0, "big"),
      (4.0, "big"), (5.0, "big")).toDF("y", "g")
    val (out, info) = Rif.transformPerGroup(df, "y", "g", 0.5)
    val solo = info.find(_.level == "solo").get
    assert(solo.n == 1L)
    assert(solo.qTau == 7.25)
    assert(solo.meanRif(0.5) == 7.25) // == the passthrough group mean
    val soloOut = out.filter(col("g") === "solo")
      .select("__rif__").head().getDouble(0)
    assert(soloOut == 7.25, "n=1 passthrough changed")
    // and for a real group the closed form still equals avg(__rif__)
    val big = info.find(_.level == "big").get
    val avgRif = out.filter(col("g") === "big")
      .agg(avg(col("__rif__"))).head().getDouble(0)
    assert(math.abs(big.meanRif(0.5) - avgRif) < 1e-9,
      s"closed form ${big.meanRif(0.5)} vs avg $avgRif")
  }

  test("DFL produces 100-point grid and three densities (features_test.rs)") {
    val rng = new scala.util.Random(3)
    val rows = (0 until 500).map { i =>
      val g = if (i % 2 == 0) "M" else "F"
      val edu = 10.0 + rng.nextInt(8)
      val wage = (if (g == "M") 12.0 else 10.0) + 0.8 * edu + rng.nextGaussian()
      (wage, g, edu)
    }
    val df = rows.toDF("wage", "gender", "education")
    val res = Dfl.run(df, "wage", "gender", "F", Seq("education"))
    assert(res.grid.length == 100)
    assert(res.densityA.length == 100)
    assert(res.densityB.length == 100)
    assert(res.densityBCounterfactual.length == 100)
    // densities integrate to ~1 over the grid (step * sum)
    val step = res.grid(1) - res.grid(0)
    val massA = res.densityA.sum * step
    assert(massA > 0.8 && massA < 1.1, s"mass $massA")
    assert(res.logitConverged)
  }

  test("valuesAtRanksGrouped: exact order statistics under ties, many groups, any boundaries") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(5)
    // heavy ties: values quantized to 0.1 steps over [0, 5)
    val rows = (0 until 5000).map { i =>
      (s"g${i % 7}", math.floor(rng.nextDouble() * 50) / 10.0)
    }
    val df = rows.toDF("g", "v")
    val byG = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).sorted.toIndexedSeq
    }
    val wanted = byG.map { case (g, vs) =>
      g -> Set(0L, vs.size / 3L, vs.size - 1L)
    }
    val got = graft.core.Windows.valuesAtRanksGrouped(
      df, col("g"), col("v"), wanted)
    wanted.foreach { case (g, rs) =>
      rs.foreach(r => assert(got(g)(r) == byG(g)(r.toInt), s"$g rank $r"))
    }
    // precomputed boundaries only balance buckets — coarse, duplicated,
    // or even empty boundary sets must not change any returned value
    val got2 = graft.core.Windows.valuesAtRanksGrouped(
      df, col("g"), col("v"), wanted, Some(Array(1.0, 1.0, 3.7)))
    assert(got2 == got)
    val got3 = graft.core.Windows.valuesAtRanksGrouped(
      df, col("g"), col("v"), wanted, Some(Array.empty[Double]))
    assert(got3 == got)
  }

  test("quantilesType7Grouped matches the exact percentile aggregate + extra lanes") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(11)
    val rows = (0 until 4000).map(i => (s"g${i % 3}", rng.nextDouble() * 100))
    val df = rows.toDF("g", "v")
    val taus = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val got = graft.core.Windows.quantilesType7Grouped(df, col("g"), col("v"),
      taus, Seq(stddev_samp(col("v")), count(lit(1))))
    // reference: Spark's exact percentile (single-task, fine in a test)
    val want = df.groupBy(col("g"))
      .agg(expr(s"percentile(v, array(${taus.mkString("D,")}D))").as("qs"),
        stddev_samp(col("v")).as("sd"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getDouble(2), r.getLong(3))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (g, (qs, sd, n)) =>
      val (gn, gq, extras) = got(g)
      assert(gn == n)
      assert(extras(1) == n)
      assert(math.abs(extras(0).asInstanceOf[Double] - sd) < 1e-9)
      taus.zip(qs).foreach { case (t, q) =>
        assert(math.abs(gq(t) - q) < 1e-9, s"$g tau=$t: ${gq(t)} vs $q")
      }
    }
    // single-value group: every tau reports the value; n == 0 (all-null)
    // groups are omitted
    val tiny = Seq(("a", Some(7.0)), ("b", None), ("b", None))
      .toDF("g", "v")
    val gt = graft.core.Windows.quantilesType7Grouped(tiny, col("g"),
      col("v"), Seq(0.0, 0.5, 1.0))
    assert(gt.keySet == Set("a"))
    assert(gt("a")._2.values.toSet == Set(7.0))
  }

  test("KDE on grid matches a hand-computed density (kde.rs)") {
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val grid = Array(2.0)
    val bw = 1.0
    val d = Kde.onGrid(df, "v", None, grid, bw)
    val expected = Seq(1.0, 2.0, 3.0).map { x =>
      math.exp(-0.5 * (2.0 - x) * (2.0 - x)) / math.sqrt(2 * math.Pi)
    }.sum / 3.0
    assert(math.abs(d(0) - expected) < 1e-12)
  }
}
