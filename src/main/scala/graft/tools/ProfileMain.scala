package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiler: run one harness query with a job-level timing listener.
  * Usage: runMain graft.tools.ProfileMain <queryName> <sfDir> [reps]
  * Prints one line per Spark job (duration, first stage name) so the
  * per-phase cost of a multi-pass query is visible without the UI. */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    @volatile var enabled = false
    @volatile var lastEnd = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (enabled) {
          // driver "think time" since the previous job ended: planning /
          // codegen / driver algebra — the between-jobs gap that job
          // durations alone never show
          val gap = if (lastEnd > 0) (j.time - lastEnd) / 1000.0 else 0.0
          val label = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
          val desc = label.map(_ + " | ").getOrElse("") +
            j.stageInfos.map(_.name).distinct.mkString(" | ")
          starts(j.jobId) = (j.time, f"gap ${gap}%6.3f | " + desc)
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, desc) =>
          lastEnd = j.time
          if (enabled) println(
            f"[job ${j.jobId}%3d] ${(j.time - t0) / 1000.0}%7.3f s  ${desc.take(240)}")
        }
    })
    val fn = graft.SparkEntry.queries(name)
    for (r <- 1 to reps) {
      graft.Queries.clearSessionCaches()
      graft.QueriesExt.clearSessionCaches()
      spark.catalog.clearCache()
      enabled = r == reps // only print the warm rep
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).collect().length
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== rep $r: $name $dt%.3f s ($n rows)")
      Thread.sleep(300) // drain listener events
    }
    spark.stop()
  }
}
