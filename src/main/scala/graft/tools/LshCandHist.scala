package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: Jaccard histogram of the banded LSH candidate stream —
  * decides whether steeper banding (fewer low-J candidates) can cut the
  * verify cost or the candidate mass IS near-threshold structure. */
object LshCandHist {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = graft.ext.Dedup.shingles(docs, "doc_id", "text", 3).localCheckpoint()
    val sigs = graft.ext.Dedup.minhashSignatures(sh, "doc_id", 16).localCheckpoint()
    val banded = (0 until 8).map { b =>
      val slice = (0 until 2).map(r => col(s"mh_${b * 2 + r}"))
      sigs.select(col("doc_id"), lit(b).as("band"),
        md5(concat_ws("_", slice: _*)).as("bkey"))
    }.reduce(_ unionByName _)
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct().localCheckpoint()
    val shH = sh.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    val setTab = shH.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("shingle"))).as("__set__"))
      .localCheckpoint()
    val j = cand
      .join(setTab.select(col("doc_id").as("id_a"), col("__set__").as("__sa__")), "id_a")
      .join(setTab.select(col("doc_id").as("id_b"), col("__set__").as("__sb__")), "id_b")
      .select((size(array_intersect(col("__sa__"), col("__sb__"))).cast("double") /
        (size(col("__sa__")) + size(col("__sb__")) -
          size(array_intersect(col("__sa__"), col("__sb__"))))).as("j"))
    j.select(floor(col("j") * 10).cast("int").as("bin"))
      .groupBy("bin").count().orderBy("bin")
      .collect().foreach(r => println(s"HIST bin=${r.getInt(0)} n=${r.getLong(1)}"))
    spark.stop()
  }
}
