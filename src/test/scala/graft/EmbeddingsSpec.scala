package graft

import graft.ext.Embeddings
import org.apache.spark.sql.functions._

/** PCA / whitening over embedding columns: exact covariance algebra,
  * planted-direction recovery, decorrelation, and the pinned-iteration
  * reproducibility the q_pca_power3 oracle relies on. */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(rows: Seq[Array[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")

  test("meanAndCovariance matches hand-computed algebra (dim 2)") {
    val df = vecDf(Seq(Array(1f, 2f), Array(3f, 2f), Array(5f, 8f)))
    val (n, mean, cov) = Embeddings.meanAndCovariance(df, "embedding")
    assert(n == 3)
    assert(mean.toSeq == Seq(3.0, 4.0))
    // population covariance: xs (1,3,5) var 8/3; ys (2,2,8) var 8;
    // cross: ((1-3)(2-4) + 0 + (5-3)(8-4))/3 = 4
    assert(math.abs(cov(0)(0) - 8.0 / 3.0) < 1e-12)
    assert(math.abs(cov(1)(1) - 8.0) < 1e-12)
    assert(math.abs(cov(0)(1) - 4.0) < 1e-12)
    assert(cov(0)(1) == cov(1)(0))
  }

  test("power iteration recovers a planted principal direction") {
    val d = 16
    val rng = new scala.util.Random(7)
    val u = Array.tabulate(d)(i => math.sin(i + 1.0))
    val uNorm = math.sqrt(u.map(x => x * x).sum)
    val uHat = u.map(_ / uNorm)
    // x = a * uHat + small isotropic noise, a ~ N-ish with sd 3
    val rows = (0 until 600).map { _ =>
      val a = rng.nextGaussian() * 3.0
      Array.tabulate(d)(i =>
        (a * uHat(i) + rng.nextGaussian() * 0.05).toFloat)
    }
    val m = Embeddings.fitPca(vecDf(rows), "embedding", k = 1, iters = 40)
    val dot = math.abs(m.components(0).zip(uHat).map { case (a, b) => a * b }.sum)
    assert(dot > 0.999, s"alignment $dot")
    assert(m.eigenvalues(0) > 6.0 && m.eigenvalues(0) < 12.0,
      s"eigenvalue ${m.eigenvalues(0)}")
  }

  test("top-2 components orthogonal; projections decorrelated; whitening unit-variance") {
    val emb = spark.read.parquet(sf("sf0.01/embeddings.parquet"))
    val m = Embeddings.fitPca(emb, "embedding", k = 2, iters = 150)
    val q0 = m.components(0)
    val q1 = m.components(1)
    assert(math.abs(q0.zip(q1).map { case (a, b) => a * b }.sum) < 1e-6)
    assert(m.eigenvalues(0) >= m.eigenvalues(1) && m.eigenvalues(1) > 0.0)
    val proj = Embeddings.project(emb, m, "embedding")
    val r = proj.agg(
      avg(col("pc_0")).as("m0"), avg(col("pc_1")).as("m1"),
      avg(col("pc_0") * col("pc_0")).as("v0"),
      avg(col("pc_1") * col("pc_1")).as("v1"),
      avg(col("pc_0") * col("pc_1")).as("c01")).head()
    // centered projections: mean 0, variance = eigenvalue, decorrelated
    assert(math.abs(r.getDouble(0)) < 1e-9 && math.abs(r.getDouble(1)) < 1e-9)
    assert(math.abs(r.getDouble(2) - m.eigenvalues(0)) < 1e-6)
    assert(math.abs(r.getDouble(3) - m.eigenvalues(1)) < 1e-6)
    // cross-covariance residue scales with how far a flat spectrum
    // leaves the iterate from the true eigenvector — bound it relative
    // to the component variances, not at machine precision
    assert(math.abs(r.getDouble(4)) <
      1e-2 * math.sqrt(m.eigenvalues(0) * m.eigenvalues(1)))
    val w = Embeddings.whiten(emb, m, "embedding")
    val rw = w.agg(avg(col("w_0") * col("w_0")).as("v0"),
      avg(col("w_1") * col("w_1")).as("v1")).head()
    assert(math.abs(rw.getDouble(0) - 1.0) < 1e-4)
    assert(math.abs(rw.getDouble(1) - 1.0) < 1e-4)
  }

  test("pinned power iteration is reproducible across partitionings") {
    val emb = spark.read.parquet(sf("sf0.01/embeddings.parquet"))
    val a = Embeddings.fitPca(emb, "embedding", k = 1, iters = 3)
    val b = Embeddings.fitPca(emb.repartition(13), "embedding", k = 1, iters = 3)
    a.components(0).zip(b.components(0)).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9)
    }
    assert(math.abs(a.eigenvalues(0) - b.eigenvalues(0)) < 1e-9)
    assert(a.n == b.n && a.n == 500)
  }

  test("JL sign projection roughly preserves pairwise distances, deterministically") {
    val emb = spark.read.parquet(sf("sf0.01/embeddings.parquet"))
      .filter(col("vec_id") < 60)
    val k = 16
    val out = Embeddings.jlProject(emb, "embedding", k = k, seed = 42L)
      .select(col("vec_id") +:
        (0 until k).map(j => col(s"jl_$j")): _*)
      .collect().map(r => r.getLong(0) ->
        (1 until k + 1).map(r.getDouble).toArray).toMap
    val orig = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // JL with k=16 preserves squared distances in expectation; check the
    // AVERAGE distortion over many pairs is near 1 (per-pair spread is
    // wide at small k — that's inherent, not a bug)
    val ids = orig.keys.toSeq.sorted
    val ratios = for {
      a <- ids; b <- ids if a < b
      da = d2(orig(a), orig(b)) if da > 1e-12
    } yield d2(out(a), out(b)) / da
    val meanRatio = ratios.sum / ratios.size
    assert(meanRatio > 0.7 && meanRatio < 1.3, s"mean distortion $meanRatio")
    // deterministic: same seed twice, any partitioning
    val again = Embeddings.jlProject(emb.repartition(7), "embedding",
        k = k, seed = 42L)
      .select(col("vec_id") +: (0 until k).map(j => col(s"jl_$j")): _*)
      .collect().map(r => r.getLong(0) ->
        (1 until k + 1).map(r.getDouble).toArray).toMap
    ids.foreach { id =>
      assert(out(id).toSeq == again(id).toSeq, s"vec $id differs")
    }
    // a different seed gives a different matrix
    val m1 = Embeddings.jlSignMatrix(64, 4, 42L)
    val m2 = Embeddings.jlSignMatrix(64, 4, 43L)
    assert(m1.flatten.toSeq != m2.flatten.toSeq)
  }

  test("ragged embedding dimensions are a hard error") {
    val df = vecDf(Seq(Array(1f, 2f), Array(1f, 2f, 3f)))
    val e = intercept[Exception] {
      Embeddings.meanAndCovariance(df, "embedding")
    }
    assert(e.getMessage.contains("ragged embedding"))
  }
}
