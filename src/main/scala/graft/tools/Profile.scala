package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch phase profiler (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    if (args.headOption.contains("rowid")) {
      import org.apache.spark.sql.functions._
      val tieBreaks = Seq("l_linenumber", "l_extendedprice",
        "l_quantity", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate").map(col)
      def build(slim: Boolean): Double = {
        val raw = spark.read.parquet(s"$d/lineitem.parquet")
        val in = if (slim) raw.select((col("l_orderkey") +: tieBreaks): _*) else raw
        val t0 = System.nanoTime()
        val out = graft.core.Windows.exclusivePrefixSum(in,
            col("l_orderkey"), ascending = true, tieBreaks, lit(1.0), "__rk__")
          .withColumn("row_id", (col("__rk__") + 1).cast("long")).drop("__rk__")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count()
        val dt = (System.nanoTime() - t0) / 1e9
        out.unpersist(blocking = true)
        dt
      }
      def buildHash(): Double = {
        val raw = spark.read.parquet(s"$d/lineitem.parquet")
        val in = raw.select((col("l_orderkey") +: tieBreaks): _*)
        val t0 = System.nanoTime()
        val canon = concat_ws(":",
          col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string"),
          round(col("l_extendedprice") * 100, 0).cast("long").cast("string"),
          col("l_quantity").cast("long").cast("string"),
          round(col("l_discount") * 100, 0).cast("long").cast("string"),
          round(col("l_tax") * 100, 0).cast("long").cast("string"),
          col("l_returnflag"), col("l_linestatus"),
          col("l_shipdate").cast("string"))
        val h = graft.ext.TextAnalysis.hash56(canon)
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__h__"))
          .orderBy((col("l_orderkey") +: tieBreaks): _*)
        val out = in.withColumn("__h__", h)
          .withColumn("row_id",
            concat(col("__h__").cast("string"), lit("-"),
              row_number().over(w).cast("string")))
          .drop("__h__")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count()
        val dt = (System.nanoTime() - t0) / 1e9
        out.unpersist(blocking = true)
        dt
      }
      build(slim = true); buildHash() // warm JIT both paths
      val slim = (1 to 5).map(_ => build(slim = true))
      val hsh = (1 to 5).map(_ => buildHash())
      println(f"[profile] rowid slim min=${slim.min}%.3f all=${slim.map(x => f"$x%.2f").mkString(",")}")
      println(f"[profile] rowid hash min=${hsh.min}%.3f all=${hsh.map(x => f"$x%.2f").mkString(",")}")
    } else if (args.headOption.contains("phases")) {
      import graft.equity._
      import org.apache.spark.sql.functions._
      val cfg = EquityConfig("l_extendedprice", "l_linestatus", "F",
        predictors = Seq("l_quantity"))
      for (rep <- 1 to 3) {
        graft.Queries.clearSessionCaches()
        graft.QueriesExt.clearSessionCaches()
        spark.catalog.clearCache()
        val li = time(s"rowId rep$rep") {
          val raw = spark.read.parquet(s"$d/lineitem.parquet")
          val tieBreaks = Seq("l_linenumber", "l_extendedprice",
            "l_quantity", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate").map(col)
          val out = graft.core.Windows.exclusivePrefixSum(raw,
              col("l_orderkey"), ascending = true, tieBreaks, lit(1.0), "__rk__")
            .withColumn("row_id", (col("__rk__") + 1).cast("long")).drop("__rk__")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          out.count(); out
        }
        val (p, lanes) = time(s"prepareAndGram rep$rep") {
          Equity.prepareAndGram(li, cfg)
        }
        val opt = time(s"optimizePrepared rep$rep") {
          Equity.optimizePrepared(p.dummied, p.xCols, p.names, p.split, lanes,
            cfg.copy(budget = 0.0), "row_id")
        }
        time(s"frontier-sweep-total rep$rep") {
          Frontier.compute(li, cfg, "row_id", steps = 4, paymentScale = Some(6))
        }
        time(s"adjustments-consume rep$rep") {
          opt.adjustmentsUnsorted.filter(col("adjustment") > 1e-9).count()
        }
        li.unpersist()
      }
    } else {
      val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
      val taskCount = new java.util.concurrent.atomic.AtomicInteger(0)
      val runTime = new java.util.concurrent.atomic.AtomicLong(0L)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobCount.incrementAndGet()
            taskCount.addAndGet(j.stageInfos.map(_.numTasks).sum)
          }
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            if (t.taskMetrics != null)
              runTime.addAndGet(t.taskMetrics.executorRunTime)
          }
        })
      val names = if (args.nonEmpty) args.toSeq else Seq("q_frontier")
      for (n <- names; rep <- 1 to 3) {
        graft.Queries.clearSessionCaches()
        graft.QueriesExt.clearSessionCaches()
        spark.catalog.clearCache()
        jobCount.set(0); taskCount.set(0); runTime.set(0L)
        time(s"$n rep$rep") {
          val df = graft.SparkEntry.queries(n)(spark, d)
          df.collect().length
        }
        Thread.sleep(300)
        println(s"[profile]   $n rep$rep jobs=${jobCount.get} tasks=${taskCount.get} taskTimeS=${runTime.get / 1000.0}")
      }
    }
    spark.stop()
  }
}
