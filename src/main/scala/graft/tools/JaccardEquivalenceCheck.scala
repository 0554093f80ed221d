package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end losslessness receipt for the exact-Jaccard plan choice on
  * REAL corpus data: runs the q_jaccard_pairs configuration twice —
  * once forced onto the direct inverted-index path (the exact
  * baseline), once forced onto the prefix/pair-key path — and compares
  * the full result sets including jaccard values. PASS means the
  * cost-based path choice is invisible in the results at this scale.
  * `SPARK_GRAFT_SF_DIR` picks the corpus (default sf0.1). */
object JaccardEquivalenceCheck {
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
    def run(): Map[(Long, Long), Double] =
      graft.ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.8, maxShingleDf = Some(10000L))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
    val t0 = System.nanoTime()
    val direct = try {
      spark.conf.set("spark.graft.dedup.directPathMaxPairs",
        Long.MaxValue.toString)
      run()
    } finally spark.conf.unset("spark.graft.dedup.directPathMaxPairs")
    val t1 = System.nanoTime()
    val prefix = try {
      spark.conf.set("spark.graft.dedup.directPathMaxPairs", "0")
      run()
    } finally spark.conf.unset("spark.graft.dedup.directPathMaxPairs")
    val t2 = System.nanoTime()
    println(f"[jaccard-eq] direct: ${direct.size} pairs in ${(t1 - t0) / 1e9}%.1f s; " +
      f"prefix: ${prefix.size} pairs in ${(t2 - t1) / 1e9}%.1f s")
    val onlyD = direct.keySet -- prefix.keySet
    val onlyP = prefix.keySet -- direct.keySet
    val diffVal = direct.keySet.intersect(prefix.keySet)
      .filter(k => direct(k) != prefix(k))
    if (onlyD.isEmpty && onlyP.isEmpty && diffVal.isEmpty)
      println(s"[jaccard-eq] PASS: ${direct.size} pairs byte-identical " +
        s"across paths ($sfDir)")
    else {
      println(s"[jaccard-eq] FAIL: onlyDirect=${onlyD.size} " +
        s"onlyPrefix=${onlyP.size} valueDiffs=${diffVal.size}")
      (onlyD.take(5) ++ onlyP.take(5) ++ diffVal.take(5)).foreach(println)
      sys.exit(1)
    }
    spark.stop()
  }
}
