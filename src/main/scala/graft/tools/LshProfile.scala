package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-off stage profiler for minhashLshPairs: times signatures,
  * banding, candidate join, and verify separately, and counts banded
  * candidates + docs touched — the numbers behind the q_minhash_lsh
  * scale reading. */
object LshProfile {
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
    val sh = timed("shingles ckpt") {
      graft.ext.Dedup.shingles(docs, "doc_id", "text", 3).localCheckpoint()
    }
    val sigs = timed("minhash signatures ckpt") {
      graft.ext.Dedup.minhashSignatures(sh, "doc_id", 16).localCheckpoint()
    }
    println(s"PROFILE sig rows ${sigs.count()}")
    val banded = (0 until 8).map { b =>
      val slice = (0 until 2).map(r => col(s"mh_${b * 2 + r}"))
      sigs.select(col("doc_id"), lit(b).as("band"),
        md5(concat_ws("_", slice: _*)).as("bkey"))
    }.reduce(_ unionByName _)
    val cand = timed("band self-join + distinct ckpt") {
      banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct().localCheckpoint()
    }
    val nCand = cand.count()
    val nDocs = cand.select(explode(array(col("id_a"), col("id_b"))))
      .distinct().count()
    println(s"PROFILE banded candidates $nCand over $nDocs docs")
    val shHashed = sh.select(col("doc_id"),
      xxhash64(col("shingle")).as("shingle"))
    val setTab = timed("setTab build (hashed, full)") {
      shHashed.groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("shingle"))).as("__set__"))
        .localCheckpoint()
    }
    val nOut = timed("verify joins + threshold") {
      cand
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
