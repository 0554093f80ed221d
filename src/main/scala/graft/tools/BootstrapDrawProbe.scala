package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B for q_bootstrap8's weight lanes: 8 independent md5 draws
  * (one hash56 per rep) vs a Carter-Wegman pair (2 base hash56 draws +
  * affine combos) — the minhash r10 trick applied to bootstrap weights.
  * Times the full Gram pass either way (r14 receipt). */
object BootstrapDrawProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.prep.Prep
    import graft.core.Gram
    val li0 = Prep.withIntercept(
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_extendedprice", "l_quantity", "l_linestatus")
        .repartition(64)).localCheckpoint()
    val xCols = Seq(Prep.InterceptCol, "l_quantity")
    val key = concat(
      round(col("l_extendedprice") * 100, 0).cast("long").cast("string"), lit(":"),
      col("l_quantity").cast("long").cast("string"), lit(":"),
      col("l_linestatus"))
    val poissonCdf: Seq[Double] = {
      var term = math.exp(-1.0)
      var cum = 0.0
      (0 to 6).map { k =>
        if (k > 0) term /= k
        cum += term
        cum
      }
    }
    def poisson(u: Column): Column =
      poissonCdf.tail.zipWithIndex.foldLeft(
        when(u < lit(poissonCdf.head), 0.0)) {
        case (acc, (thr, i)) => acc.when(u < lit(thr), (i + 1).toDouble)
      }.otherwise(poissonCdf.size.toDouble)
    val wCols = (1 to 8).map(r => s"__bw_$r")
    val laneOf = when(col("l_linestatus") === "O", 0).otherwise(1)
    def gramWith(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      Gram.computeGrouped(df, "l_extendedprice", xCols, None, laneOf,
        nLanes = 2, reps = 0, seed = 0L, repWeightCols = wCols)
      (System.nanoTime() - t0) / 1e9
    }
    val indep = wCols.zipWithIndex.foldLeft(li0) { case (df, (c, i)) =>
      val u = pmod(graft.ext.TextAnalysis.hash56(
          concat(key, lit(s":${i + 1}"))), lit(1000000L))
        .cast("double") / 1000000.0
      df.withColumn(c, poisson(u))
    }
    val mod = 1L << 56
    val cw0 = li0
      .withColumn("__h1__", graft.ext.TextAnalysis.hash56(concat(lit("a:"), key)))
      .withColumn("__h2__", graft.ext.TextAnalysis.hash56(concat(lit("b:"), key)))
    val cw = wCols.zipWithIndex.foldLeft(cw0) { case (df, (c, i)) =>
      val u = pmod(col("__h1__") + lit((i + 1).toLong) * col("__h2__"), lit(mod))
        .cast("double") / mod.toDouble
      df.withColumn(c, poisson(u))
    }
    for (round <- 1 to 3) {
      val tI = gramWith(indep)
      val tC = gramWith(cw)
      println(f"DRAWAB round=$round indep8md5=$tI%.2f s cw2md5=$tC%.2f s")
    }
    spark.stop()
  }
}
