package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B: the LSH verify JOIN with vs without the length
  * prefilter, over a pre-checkpointed set table — isolates exactly the
  * cost the filter can change (r14 receipt). */
object LshLenProbe {
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
    val sizes = sh.groupBy(col("doc_id"))
      .agg(count_distinct(col("shingle")).as("__lsz__")).localCheckpoint()
    def verify(c: org.apache.spark.sql.DataFrame): Long =
      c.join(setTab.select(col("doc_id").as("id_a"), col("__set__").as("__sa__")), "id_a")
        .join(setTab.select(col("doc_id").as("id_b"), col("__set__").as("__sb__")), "id_b")
        .select((size(array_intersect(col("__sa__"), col("__sb__"))).cast("double") /
          (size(col("__sa__")) + size(col("__sb__")) -
            size(array_intersect(col("__sa__"), col("__sb__"))))).as("j"))
        .filter(col("j") >= 0.8).count()
    def lenFiltered: org.apache.spark.sql.DataFrame =
      cand
        .join(sizes.select(col("doc_id").as("id_a"), col("__lsz__").as("__la__")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("__lsz__").as("__lb__")), "id_b")
        .filter(least(col("__la__"), col("__lb__")) >=
          lit(0.8) * greatest(col("__la__"), col("__lb__")) - lit(1e-9))
        .select(col("id_a"), col("id_b"))
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val nPlain = verify(cand)
      val tPlain = (System.nanoTime() - t0) / 1e9
      System.gc()
      val t1 = System.nanoTime()
      val nFilt = verify(lenFiltered)
      val tFilt = (System.nanoTime() - t1) / 1e9
      System.gc()
      println(f"LENAB round=$round plainJoin=$tPlain%.2f s ($nPlain) filteredJoin=$tFilt%.2f s ($nFilt)")
    }
    spark.stop()
  }
}
