package graft

import graft.decompose._
import graft.estimators.{Heckman, Probit}
import graft.prep.Prep

/** Probit + Heckman selection: mirrors `math/probit.rs:174-244` and the
  * F5 DGP of `tests/heckman_test.rs:1-74`. */
class HeckmanSpec extends SparkSpec {
  import spark.implicits._

  test("probit recovers a known latent model") {
    val rng = new scala.util.Random(42)
    val n = 4000
    val rows = (0 until n).map { _ =>
      val x = rng.nextGaussian()
      val latent = 0.5 + 1.2 * x + rng.nextGaussian()
      (if (latent > 0) 1.0 else 0.0, x)
    }
    val df = Prep.withIntercept(rows.toDF("y", "x"))
    val fit = Probit.fit(df, "y", Seq(Prep.InterceptCol, "x"))
    assert(fit.converged)
    assert(math.abs(fit.beta(0) - 0.5) < 0.1, s"icept ${fit.beta(0)}")
    assert(math.abs(fit.beta(1) - 1.2) < 0.1, s"slope ${fit.beta(1)}")
    // standard errors from Fisher information are finite and small
    assert(math.sqrt(fit.vcov(1, 1)) < 0.1)
  }

  test("Heckman two-step: IMR appears and correction moves the slope (F5)") {
    val rng = new scala.util.Random(42)
    val n = 2000
    val rho = 0.8
    val rows = (0 until n).map { _ =>
      val z = rng.nextGaussian()
      val x = z + 0.5 * rng.nextGaussian()
      val u = rng.nextGaussian()
      val e = rho * u + math.sqrt(1 - rho * rho) * rng.nextGaussian()
      val s = if (0.5 * z + u > 0) 1.0 else 0.0
      val y = 1.0 + 2.0 * x + e
      val grp = if (rng.nextBoolean()) "A" else "B"
      (if (s == 1.0) Some(y) else None, x, z, s, grp)
    }
    val df = rows.toDF("outcome", "x", "z", "selection", "group")
    // direct two-step on the selected-only frame mirrors the reference's
    // post-clean behavior; here keep selection rows via a 0-filled outcome
    val filled = df.na.fill(0.0, Seq("outcome"))
    val prepared = Prep.withIntercept(filled)
    val fit = Heckman.fit(prepared.filter($"group" === "A"), "outcome",
      Seq(Prep.InterceptCol, "x"), "selection", Seq(Prep.InterceptCol, "z"))
    assert(fit.probitConverged)
    // selection eq: gamma_z ~ 0.5 (probit on true selection)
    assert(math.abs(fit.gamma(1) - 0.5) < 0.15, s"gamma ${fit.gamma(1)}")
    assert(fit.nSelected < fit.n)

    // full decomposition path: IMR present in detailed components
    val res = Oaxaca.run(df, OaxacaConfig("outcome", "group", "B",
      predictors = Seq("x"), bootstrapReps = 0,
      selectionOutcome = Some("selection"), selectionPredictors = Seq("z")))
    assert(res.names.last == "IMR")
    assert(res.detailedExplained.exists(_.name == "IMR"))
    assert(res.detailedSelection.exists(_.name == "z"))
    // two-fold identity still holds against X-mean-based total
    val explained = res.twoFold.find(_.name == "explained").get.estimate
    val unexplained = res.twoFold.find(_.name == "unexplained").get.estimate
    val total = (res.point.xaMean dot res.point.betaA) -
      (res.point.xbMean dot res.point.betaB)
    assert(math.abs(explained + unexplained - total) < 1e-9)
  }

  test("batched Heckman bootstrap equals the sequential path") {
    val rng = new scala.util.Random(23)
    val rows = (0 until 600).map { _ =>
      val z = rng.nextGaussian()
      val x = z + 0.5 * rng.nextGaussian()
      val u = rng.nextGaussian()
      val s = if (0.4 * z + u > 0) 1.0 else 0.0
      val y = 1.0 + 2.0 * x + 0.8 * u + 0.6 * rng.nextGaussian()
      val grp = if (rng.nextBoolean()) "A" else "B"
      (if (s == 1.0) Some(y) else None, x, z, s, grp)
    }
    val df = rows.toDF("outcome", "x", "z", "selection", "group")
    val cfg = OaxacaConfig("outcome", "group", "B", predictors = Seq("x"),
      bootstrapReps = 4, seed = 9L,
      selectionOutcome = Some("selection"), selectionPredictors = Seq("z"))
    val batched = Oaxaca.run(df, cfg.copy(heckmanBatched = true))
    val seq = Oaxaca.run(df, cfg.copy(heckmanBatched = false))
    // same Poisson weights + same math -> same point estimates and SEs
    // (tolerances absorb IRLS stopping-path and summation-order noise)
    assert(math.abs(batched.totalGap - seq.totalGap) < 1e-9)
    batched.twoFold.zip(seq.twoFold).foreach { case (b, s) =>
      assert(math.abs(b.estimate - s.estimate) < 1e-6, s"${b.name} estimate")
      assert(math.abs(b.stdErr - s.stdErr) < 1e-4, s"${b.name} se b=${b.stdErr} s=${s.stdErr}")
    }
    assert(batched.detailedSelection.map(_.name) == seq.detailedSelection.map(_.name))
    batched.detailedSelection.zip(seq.detailedSelection).foreach { case (b, s) =>
      assert(math.abs(b.estimate - s.estimate) < 1e-6, s"sel ${b.name}")
    }
  }

  test("Heckman bootstrap reps produce finite SEs") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 800).map { _ =>
      val z = rng.nextGaussian()
      val x = z + 0.5 * rng.nextGaussian()
      val u = rng.nextGaussian()
      val s = if (0.4 * z + u > 0) 1.0 else 0.0
      val y = 1.0 + 2.0 * x + 0.8 * u + 0.6 * rng.nextGaussian()
      val grp = if (rng.nextBoolean()) "A" else "B"
      (if (s == 1.0) Some(y) else None, x, z, s, grp)
    }
    val df = rows.toDF("outcome", "x", "z", "selection", "group")
    val res = Oaxaca.run(df, OaxacaConfig("outcome", "group", "B",
      predictors = Seq("x"), bootstrapReps = 3, seed = 5L,
      selectionOutcome = Some("selection"), selectionPredictors = Seq("z")))
    val exp = res.twoFold.find(_.name == "explained").get
    assert(!exp.stdErr.isNaN && exp.stdErr > 0.0)
  }
}
