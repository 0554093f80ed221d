package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profiler for q_dedup_clusters' stages beyond the pair list:
  * times the jaccard pipeline, then connectedComponents and
  * assignClusters separately over the materialized pairs. */
object ClusterProfile {
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
    val pairs = timed("ngramJaccardPairs ckpt") {
      graft.ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleDf = Some(10000L))
        .select(col("id_a"), col("id_b")).localCheckpoint()
    }
    println(s"PROFILE pairs ${pairs.count()}")
    val cc = timed("connectedComponents") {
      val c = graft.ext.Cluster.connectedComponents(pairs)
      println(s"PROFILE cc rows ${c.count()}")
      c
    }
    timed("assignClusters join+count") {
      graft.ext.Cluster.assignClusters(docs, "doc_id", pairs).count()
    }
    timed("assignClusters orderBy+count") {
      graft.ext.Cluster.assignClusters(docs, "doc_id", pairs)
        .select(col("doc_id"), col("cluster_id"),
          col("is_canonical").cast("int").as("is_canonical"))
        .orderBy(col("doc_id")).count()
    }
    spark.stop()
  }
}
