package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions SQL surface: every registered function
  * must resolve and agree bit-for-bit with its Column-API twin. */
class ExtensionsSpec extends SparkSpec {

  private lazy val ext: SparkSession = {
    // getOrCreate returns the existing default session and IGNORES
    // withExtensions, so clear active/default first: a new session is
    // then built on the shared SparkContext with the extensions applied.
    // The shared session is restored as default for the other suites.
    val base = spark
    base.sparkContext // force base session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("extension functions resolve from plain SQL") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox and the lazy dog",
      "mail a@b.co or call 555-123-4567",
      "der schnelle braune fuchs und der hund").toDF("text")
    // the base session does NOT have the functions; the extended one does
    assertThrows[Exception](spark.sql("SELECT graft_hash56('x')").collect())
    ext.sql("CREATE OR REPLACE TEMP VIEW t AS SELECT * FROM VALUES " +
      "('the quick brown fox and the lazy dog')," +
      "('mail a@b.co or call 555-123-4567')," +
      "('der schnelle braune fuchs und der hund') AS v(text)")
    val got = ext.sql(
      """SELECT graft_hash56(text) AS h, graft_token_count(text) AS n,
        |  graft_lang_id(text) AS lang, graft_quality(text) AS q,
        |  graft_redact_pii(text) AS red,
        |  graft_erf(0.5) AS e, poisson_draw(xxhash64(text), 42L) AS p
        |FROM t ORDER BY h""".stripMargin).collect()
    assert(got.length == 3)

    // bit-identical to the Column API on the same rows
    val want = df.select(
        TextAnalysis.hash56(col("text")).as("h"),
        TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.langId(col("text")).as("lang"),
        TextAnalysis.qualityCols(col("text"))
          .find(_._1 == "quality_score").get._2.as("q"),
        TextAnalysis.redactPii(col("text")).as("red"),
        graft.functions.PoissonDraw(xxhash64(col("text")), lit(42L)).as("p"))
      .orderBy(col("h")).collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      assert(g.getInt(1) == w.getInt(1))
      assert(g.getString(2) == w.getString(2))
      assert(g.getDouble(3) == w.getDouble(3))
      assert(g.getString(4) == w.getString(4))
      assert(math.abs(g.getDouble(5) -
        org.apache.commons.math3.special.Erf.erf(0.5)) < 1e-15)
      assert(g.getDouble(6) == w.getDouble(5))
    }
    // redaction actually fired on the PII row
    assert(got.exists(_.getString(4).contains("[EMAIL]")))
    assert(got.exists(_.getString(4).contains("[PHONE]")))
  }
}
