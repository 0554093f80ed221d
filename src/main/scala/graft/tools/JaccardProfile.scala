package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for the exact-Jaccard dedup path: times each
  * physical stage separately at a given scale so optimization targets
  * the measured bottleneck instead of the assumed one. Not part of the
  * query surface; run with
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.JaccardProfile`. */
object JaccardProfile {
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
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = timed("docs.count")(docs.count())
    println(s"PROFILE nDocs $nDocs")

    val sh = timed("shingles.localCheckpoint") {
      graft.ext.Dedup.shingles(docs, "doc_id", "text", 3).localCheckpoint()
    }
    val nSh = timed("sh.count")(sh.count())
    println(s"PROFILE shingle rows $nSh")

    val dfTab = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__fdf__"))
    val histo = timed("fdf histogram") {
      dfTab.groupBy(col("__fdf__")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    }
    val vocab = histo.map(_._2).sum
    val mass = histo.map { case (d, c) => c.toDouble * d * (d - 1) / 2 }.sum
    val massUnder10k = histo.filter(_._1 <= 10000)
      .map { case (d, c) => c.toDouble * d * (d - 1) / 2 }.sum
    println(s"PROFILE vocab $vocab maxDf ${histo.lastOption.map(_._1)} " +
      f"fullMass $mass%.3e massUnderExplicitCap $massUnder10k%.3e")

    val setBytes = timed("setBytesEstimate") {
      val r = sh.agg(count(lit(1)), sum(length(col("shingle")))).collect()(0)
      2L * (8L * r.getLong(0) + r.getLong(1))
    }
    println(s"PROFILE setBytesEst $setBytes")

    // prefix index (threshold 0.8 = the q_jaccard_pairs config), k=2
    val pref = timed("prefixIndex.localCheckpoint") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("__fdf__"), col("shingle"))
      val wsz = Window.partitionBy(col("doc_id"))
      sh.join(dfTab, "shingle")
        .withColumn("__rk__", row_number().over(w))
        .withColumn("__sz__", count(lit(1)).over(wsz))
        .filter(col("__rk__") <= col("__sz__")
          - ceil(lit(0.8) * col("__sz__") - lit(1e-9)) + lit(2))
        .localCheckpoint()
    }
    val nPref = timed("pref.count")(pref.count())
    println(s"PROFILE prefix rows $nPref")

    val keys = timed("pair keys.localCheckpoint") {
      val x = pref.select(col("doc_id"), col("shingle").as("__s1__"),
        col("__rk__").as("__rk1__"), col("__sz__"))
      val y = pref.select(col("doc_id"), col("shingle").as("__s2__"),
        col("__rk__").as("__rk2__"))
      x.join(y, Seq("doc_id")).filter(col("__rk1__") < col("__rk2__"))
        .select(col("doc_id"),
          xxhash64(lit("2"), col("__s1__"), col("__s2__")).as("__key__"),
          col("__sz__"), col("__rk1__"), col("__rk2__"))
        .localCheckpoint()
    }
    val nKeys = timed("keys.count")(keys.count())
    println(s"PROFILE key rows $nKeys")

    val keyHisto = timed("key df histogram") {
      keys.groupBy(col("__key__")).agg(count(lit(1)).as("__pdf__"))
        .groupBy(col("__pdf__")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    }
    val keyMass = keyHisto.map { case (d, c) => c.toDouble * d * (d - 1) / 2 }.sum
    println(f"PROFILE keyMass $keyMass%.3e (full $mass%.3e)")

    val a = keys.select(col("doc_id").as("id_a"), col("__key__"),
      col("__sz__").as("sz_a"), col("__rk1__").as("ra1"), col("__rk2__").as("ra2"))
    val b = keys.select(col("doc_id").as("id_b"), col("__key__"),
      col("__sz__").as("sz_b"), col("__rk1__").as("rb1"), col("__rk2__").as("rb2"))
    val bound = lit(2) + least(col("ra1") - lit(1), col("rb1") - lit(1)) +
      least(col("ra2") - col("ra1") - lit(1), col("rb2") - col("rb1") - lit(1)) +
      least(col("sz_a") - col("ra2"), col("sz_b") - col("rb2"))
    val cand = a.join(b, "__key__")
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("sz_a"), col("sz_b")) >=
        lit(0.8) * greatest(col("sz_a"), col("sz_b")) - lit(1e-9))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(bound).as("__ub__"),
        first(col("sz_a")).as("__sza__"), first(col("sz_b")).as("__szb__"))
    val candCk = timed("candidate gen+agg ckpt")(cand.localCheckpoint())
    val nCandAll = candCk.count()
    val survivors = candCk.filter(col("__ub__") >=
      lit(0.8 / 1.8) * (col("__sza__") + col("__szb__")) - lit(1e-9))
      .select(col("id_a"), col("id_b"))
    val nCandPos = survivors.count()
    println(s"PROFILE candidates prePositional $nCandAll postPositional $nCandPos")

    val candIds = survivors
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
    val setTab = timed("setTab build (semi-joined)") {
      sh.join(candIds, Seq("doc_id"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("shingle"))).as("__set__"))
        .localCheckpoint()
    }
    println(s"PROFILE setTab docs ${setTab.count()}")
    val nOut = timed("verify joins + threshold") {
      survivors
        .join(setTab.select(col("doc_id").as("id_a"), col("__set__").as("__sa__")), "id_a")
        .join(setTab.select(col("doc_id").as("id_b"), col("__set__").as("__sb__")), "id_b")
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("__sa__"), col("__sb__"))).cast("long").as("inter"),
          size(col("__sa__")).cast("long").as("sz_a"),
          size(col("__sb__")).cast("long").as("sz_b"))
        .withColumn("jaccard",
          col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
        .filter(col("jaccard") >= 0.8).count()
    }
    println(s"PROFILE output pairs $nOut")
    spark.stop()
  }
}
