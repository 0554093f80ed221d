package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Measurement probe for the round-15 candidate-stream cut: mirrors the
  * production k=2 pair-key pipeline (hashed-shingle ingest) and times
  * three candidate-generation variants against each other at a given
  * scale, with row counts at every stage:
  *
  *   A. production r14: key join -> length filter -> groupBy(min bound)
  *      -> positional filter;
  *   B. A + the per-row positional bound applied BEFORE the groupBy
  *      (each shared key's bound is individually valid, so a failing
  *      row proves its pair non-qualifying — dropping it early shrinks
  *      the aggregation input; pairs kept via other rows go to exact
  *      verification, which rejects them: output unchanged);
  *   C. B + length-class banding inside the join key: the b side
  *      replicates each key row at {cls, cls-1} and joins small-side
  *      cls == large-side clsKey with a size-order tiebreak, so
  *      length-incompatible pairs never materialize.
  *
  * Decides the round-15 plan from receipts instead of guesses. */
object LenClassProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val t = 0.8
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = timed("shingles hashed ckpt") {
      graft.ext.Dedup.shingles(docs, "doc_id", "text", 3)
        .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
        .localCheckpoint()
    }
    val dfTab = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__fdf__"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("__fdf__"), col("shingle"))
    val wsz = Window.partitionBy(col("doc_id"))
    val pref = timed("prefixIndex(k=2) ckpt") {
      sh.join(dfTab, "shingle")
        .withColumn("__rk__", row_number().over(w))
        .withColumn("__sz__", count(lit(1)).over(wsz))
        .filter(col("__rk__") <= col("__sz__")
          - ceil(lit(t) * col("__sz__") - lit(1e-9)) + lit(2))
        .localCheckpoint()
    }
    println(s"PROBE prefix rows ${pref.count()}")

    val x = pref.select(col("doc_id"), col("shingle").as("__s1__"),
      col("__rk__").as("__rk1__"), col("__sz__"))
    val y = pref.select(col("doc_id"), col("shingle").as("__s2__"),
      col("__rk__").as("__rk2__"))
    val smallMax = (1.0 / t + 1e-9).toLong
    val singles = pref.filter(col("__sz__") <= smallMax)
      .filter(col("__rk__") <= col("__sz__")
        - ceil(lit(t) * col("__sz__") - lit(1e-9)) + lit(1))
      .select(col("doc_id"),
        xxhash64(lit("1"), col("shingle")).as("__key__"), col("__sz__"),
        col("__rk__").as("__rk1__"), col("__rk__").as("__rk2__"))
    val keys = timed("pair keys ckpt") {
      x.join(y, Seq("doc_id")).filter(col("__rk1__") < col("__rk2__"))
        .select(col("doc_id"),
          xxhash64(lit("2"), col("__s1__"), col("__s2__")).as("__key__"),
          col("__sz__"), col("__rk1__"), col("__rk2__"))
        .unionByName(singles)
        .localCheckpoint()
    }
    println(s"PROBE key rows ${keys.count()}")

    def sideA = keys.select(col("doc_id").as("id_a"), col("__key__"),
      col("__sz__").as("sz_a"), col("__rk1__").as("ra1"), col("__rk2__").as("ra2"))
    def sideB = keys.select(col("doc_id").as("id_b"), col("__key__"),
      col("__sz__").as("sz_b"), col("__rk1__").as("rb1"), col("__rk2__").as("rb2"))
    val bound =
      lit(2) + least(col("ra1") - lit(1), col("rb1") - lit(1)) +
        least(col("ra2") - col("ra1") - lit(1), col("rb2") - col("rb1") - lit(1)) +
        least(col("sz_a") - col("ra2"), col("sz_b") - col("rb2"))
    val lenOk = least(col("sz_a"), col("sz_b")) >=
      lit(t) * greatest(col("sz_a"), col("sz_b")) - lit(1e-9)
    val rowBoundOk = bound >=
      lit(t / (1.0 + t)) * (col("sz_a") + col("sz_b")) - lit(1e-9)
    val pairBoundOk = col("__ub__") >=
      lit(t / (1.0 + t)) * (col("__sza__") + col("__szb__")) - lit(1e-9)

    // stage counts (one pass: conditional counts over the raw join)
    val joined = sideA.join(sideB, "__key__").filter(col("id_a") < col("id_b"))
    val counts = timed("stage counts (one join pass)") {
      joined.agg(count(lit(1)).as("raw"),
        count(when(lenOk, 1)).as("len"),
        count(when(lenOk && rowBoundOk, 1)).as("lenrow")).head()
    }
    println(s"PROBE raw=${counts.getLong(0)} postLen=${counts.getLong(1)} " +
      s"postLenRowBound=${counts.getLong(2)}")

    // A: production r14
    val candA = timed("A: len -> groupBy -> posfilter") {
      joined.filter(lenOk)
        .groupBy(col("id_a"), col("id_b"))
        .agg(min(bound).as("__ub__"),
          first(col("sz_a")).as("__sza__"), first(col("sz_b")).as("__szb__"))
        .filter(pairBoundOk)
        .select(col("id_a"), col("id_b")).localCheckpoint()
    }
    println(s"PROBE A candidates ${candA.count()}")

    // B: + per-row bound before the groupBy
    val candB = timed("B: len+rowbound -> groupBy -> posflt") {
      joined.filter(lenOk && rowBoundOk)
        .groupBy(col("id_a"), col("id_b"))
        .agg(min(bound).as("__ub__"),
          first(col("sz_a")).as("__sza__"), first(col("sz_b")).as("__szb__"))
        .filter(pairBoundOk)
        .select(col("id_a"), col("id_b")).localCheckpoint()
    }
    println(s"PROBE B candidates ${candB.count()}")

    // C: class-banded join (small side at cls; large side at {cls, cls-1})
    val lw = math.log(1.0 / t)
    val cls = floor(log(col("__sz__")) / lw).cast("long")
    val small = keys.select(col("doc_id").as("id_s"),
      xxhash64(col("__key__"), cls).as("__ck__"),
      col("__sz__").as("sz_s"), col("__rk1__").as("rs1"), col("__rk2__").as("rs2"))
    val large = Seq(cls, cls - 1).map { c =>
      keys.select(col("doc_id").as("id_l"),
        xxhash64(col("__key__"), c).as("__ck__"),
        col("__sz__").as("sz_l"), col("__rk1__").as("rl1"), col("__rk2__").as("rl2"))
    }.reduce(_ unionByName _)
    val boundC =
      lit(2) + least(col("rs1") - lit(1), col("rl1") - lit(1)) +
        least(col("rs2") - col("rs1") - lit(1), col("rl2") - col("rl1") - lit(1)) +
        least(col("sz_s") - col("rs2"), col("sz_l") - col("rl2"))
    val candC = timed("C: class-banded join -> groupBy") {
      small.join(large, "__ck__")
        .filter(col("sz_s") < col("sz_l") ||
          (col("sz_s") === col("sz_l") && col("id_s") < col("id_l")))
        .filter(least(col("sz_s"), col("sz_l")) >=
          lit(t) * greatest(col("sz_s"), col("sz_l")) - lit(1e-9))
        .filter(boundC >=
          lit(t / (1.0 + t)) * (col("sz_s") + col("sz_l")) - lit(1e-9))
        .select(least(col("id_s"), col("id_l")).as("id_a"),
          greatest(col("id_s"), col("id_l")).as("id_b"),
          boundC.as("__b__"), col("sz_s"), col("sz_l"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(min(col("__b__")).as("__ub__"),
          first(col("sz_s")).as("__sza__"), first(col("sz_l")).as("__szb__"))
        .filter(pairBoundOk)
        .select(col("id_a"), col("id_b")).localCheckpoint()
    }
    println(s"PROBE C candidates ${candC.count()}")
    spark.stop()
  }
}
