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
