package graft.tools

import org.apache.spark.sql.SparkSession

/** End-to-end A/B of the LSH length-filter lane (r15 adjudication of
  * the r14 sf0.1 +16% finding): times `minhashLshPairs` with the lane
  * on vs off, alternating, min-of-N per side, in one JVM.
  * `SPARK_GRAFT_SF_DIR` picks the corpus. */
object LshLenAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    @volatile var tag = ""
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(j.jobId) = (j.time, j.stageInfos.headOption.map(_.name).getOrElse("?"))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, desc) =>
          if (tag.nonEmpty) println(
            f"[job $tag ${j.jobId}%3d] ${(j.time - t0) / 1000.0}%7.3f s  ${desc.take(70)}")
        }
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(flag: Boolean): (Double, Long) = {
      spark.conf.set("spark.graft.dedup.lshLenFilter", flag.toString)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val t0 = System.nanoTime()
      val n = graft.ext.Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 8, threshold = 0.8).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    run(true); run(false) // warm both plan shapes
    val on = collection.mutable.ArrayBuffer.empty[Double]
    val off = collection.mutable.ArrayBuffer.empty[Double]
    var nOn = 0L; var nOff = 0L
    for (i <- 1 to reps) {
      tag = if (i == reps) "ON " else ""
      val (tOn, a) = run(true); on += tOn; nOn = a
      tag = if (i == reps) "OFF" else ""
      val (tOff, b) = run(false); off += tOff; nOff = b
    }
    tag = ""
    Thread.sleep(400)
    println(f"[lsh-ab] $sfDir rows on=$nOn off=$nOff " +
      f"(must match: filter is lossless)")
    println(f"[lsh-ab] lane ON : min ${on.min}%.3f s  all ${on.map(t => f"$t%.2f").mkString(",")}")
    println(f"[lsh-ab] lane OFF: min ${off.min}%.3f s  all ${off.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
