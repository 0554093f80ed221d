package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the q_jaccard_pairs configuration with the default two-join
  * verify vs the opt-in single-broadcast kernel
  * (`spark.graft.dedup.verifyKernel`), same JVM, joins first. */
object VerifyKernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(): Long =
      graft.ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleDf = Some(10000L)).count()
    for (kernel <- Seq(false, true, false, true)) {
      spark.conf.set("spark.graft.dedup.verifyKernel", kernel.toString)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val t0 = System.nanoTime()
      val n = run()
      println(f"[kernel-probe] kernel=$kernel pairs=$n " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
