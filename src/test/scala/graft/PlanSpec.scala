package graft

import graft.core.Gram
import graft.prep.Prep
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the efficiency properties that matter at
  * 100 TB must be visible in the plan at any scale — column pruning to
  * the scan, filter pushdown, broadcast joins for small dimensions. */
class PlanSpec extends SparkSpec {

  private def li = spark.read.parquet(sf("sf0.001/lineitem.parquet"))

  private def scanSchema(df: org.apache.spark.sql.DataFrame): String = {
    val plans = df.queryExecution.executedPlan.collectLeaves()
    plans.map(_.toString).mkString("\n")
  }

  test("Gram pass prunes the scan to the model columns") {
    val prepared = Prep.withIntercept(li)
    // build the projection Gram would aggregate and check its plan
    val proj = prepared.select(
      col("l_extendedprice").cast("double"), lit(1.0), lit(0).cast("int"),
      lit(0L), col(Prep.InterceptCol).cast("double"),
      col("l_quantity").cast("double"))
    val leaves = scanSchema(proj)
    assert(leaves.contains("l_extendedprice") && leaves.contains("l_quantity"))
    assert(!leaves.contains("l_comment") && !leaves.contains("l_shipdate"),
      s"scan reads pruned columns:\n$leaves")
    assert(!leaves.contains("l_returnflag"),
      "scan should not read unused string columns")
  }

  test("group filter is pushed down to the parquet scan") {
    val f = li.filter(col("l_linestatus") === "F")
      .select(col("l_extendedprice"))
    val leaves = scanSchema(f)
    assert(leaves.contains("PushedFilters: [IsNotNull(l_linestatus), EqualTo(l_linestatus,F)]")
      || leaves.contains("EqualTo(l_linestatus,F)"),
      s"filter not pushed:\n$leaves")
  }

  test("small-dimension join is planned as a broadcast join") {
    val orders = spark.read.parquet(sf("sf0.001/orders.parquet"))
    val cust = spark.read.parquet(sf("sf0.001/customer.parquet"))
    val joined = orders.join(broadcast(cust),
      orders("o_custkey") === cust("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(sum(col("o_totalprice")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("aggregations stay inside whole-stage codegen") {
    val agg = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")), avg(col("l_extendedprice")))
    agg.collect() // materialize so AQE finalizes the plan
    val plan = agg.queryExecution.executedPlan.toString
    // whole-stage-codegen stages render as "*(n) Operator" in the tree
    assert(plan.contains("*(1)"), s"no codegen:\n$plan")
  }

  test("decomposition end-to-end reads only model columns from parquet") {
    // spy on the optimized plan of the Gram projection used by Oaxaca
    val dummied = Prep.withIntercept(li)
    val g = Gram.computeGrouped(dummied, "l_extendedprice",
      Seq(Prep.InterceptCol, "l_quantity"), None,
      when(col("l_linestatus") === "O", 0).otherwise(1), 2, 0, 0L)
    assert(g(0)(0).n > 0 && g(1)(0).n > 0) // executes fine
  }

  test("equity allocation windows are bucket-partitioned, never global") {
    // an unpartitioned Window collapses to ONE task — the canonical
    // 100 TB scale-killer; the greedy allocation must route every window
    // through the value-bucketed prefix sum
    val df = SparkEntry.queries("q_equity_optimize")(spark, sf("sf0.001"))
    df.collect() // finalize the adaptive plan
    def windows(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
      val here = p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      // AQE and query stages hide their inner plans from collect
      val nested = p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          windows(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          windows(q.plan)
      }.flatten
      here ++ nested
    }
    val ws = windows(df.queryExecution.executedPlan)
    assert(ws.nonEmpty, "expected a window in the allocation plan")
    ws.foreach(w =>
      assert(w.partitionSpec.nonEmpty, s"global (unpartitioned) window:\n$w"))
  }

  test("as-of join plans as ONE shuffle (keyed window over the union)") {
    import spark.implicits._
    val left = Seq((1L, "u", new java.sql.Timestamp(1000), 1.0))
      .toDF("id", "k", "t", "v")
    val right = Seq((2L, "u", new java.sql.Timestamp(500), 2.0))
      .toDF("id", "k", "t", "w")
    val joined = graft.ext.AsOf.joinBackward(left, right, Seq("k"), "t", "t",
      payload = Seq("w"))
    joined.collect()
    // AQE's toString prints the plan twice (Final + Initial) — count
    // shuffles in the final section only
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  test("interval join is an equi-join, never a nested-loop/cartesian") {
    val ev = QueriesExt.events(spark, sf("sf0.001"))
    val a = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val b = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("ts2"), col("value"))
    val j = graft.ext.RangeJoin.intervalJoin(a, b, Seq("user_id"),
      "ts", "ts2", 0.0, 14400.0, payload = Seq("value"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join degenerated to a non-equi join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi join found:\n$plan")
  }

  test("stratified hash sample is a pure pruned-scan filter (no shuffle)") {
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val kept = graft.ext.Sampling.stratifiedHashSample(docs, "doc_id",
      "source", Map("src0" -> 0.5), defaultFraction = 0.25)
      .select(col("doc_id"), col("source"))
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling shuffled:\n$plan")
    val leaves = scanSchema(kept)
    assert(!leaves.contains("text"),
      s"sampling scan reads the text column it never uses:\n$leaves")
  }

  test("token-budget sampling tokenizes the corpus once (cached projection)") {
    // the tokenized frame feeds BOTH the local prefix window and the
    // bucket-offset aggregate — without the materialization the corpus
    // is scanned (and the text tokenized) twice
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val kept = graft.ext.Sampling.tokenBudgetSample(docs, "doc_id",
      "source", "text", budget = 5000)
    kept.collect()
    val plan = kept.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // both consumers must read the cache; every FileScan printed must
    // belong to a cached relation's definition (printed once per cache
    // read), never to an uncached second corpus scan
    val cacheReads = "InMemoryTableScan".r.findAllIn(plan).length
    assert(cacheReads == 2,
      s"expected 2 cache reads (window + offsets), got $cacheReads:\n$plan")
    val fileScans = "FileScan parquet".r.findAllIn(plan).length
    val cachedDefs = "InMemoryRelation".r.findAllIn(plan).length
    assert(fileScans == cachedDefs,
      s"uncached parquet scan in plan ($fileScans scans, $cachedDefs cached):\n$plan")
  }

  test("bucketed tables join with no exchange and no sort") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed")
      .toString
    val orders = spark.read.parquet(sf("sf0.001/orders.parquet"))
      .select(col("o_orderkey"), col("o_totalprice"))
    val liSlim = li.select(col("l_orderkey"), col("l_extendedprice"))
    graft.sources.Bucketed.writeBucketed(orders, "b_orders",
      s"$dir/orders", Seq("o_orderkey"), numBuckets = 4)
    graft.sources.Bucketed.writeBucketed(liSlim, "b_lineitem",
      s"$dir/lineitem", Seq("l_orderkey"), numBuckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the merge-join path (a broadcast would hide the property
      // under test: bucketed co-location eliminating the shuffle)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice")), first(col("o_totalprice")))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), s"not a merge join:\n$plan")
      val joinSection = plan.split("SortMergeJoin")(1)
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"scan did not use buckets:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("sequence packing windows are shard-partitioned, never global") {
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val packed = graft.ext.SeqPack.pack(docs, "doc_id", "text",
      maxTokens = 64, numShards = 4)
    packed.collect()
    def windows(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
      val here = p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      val nested = p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          windows(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          windows(q.plan)
      }.flatten
      here ++ nested
    }
    val ws = windows(packed.queryExecution.executedPlan)
    assert(ws.nonEmpty, "expected the packing prefix-sum window")
    ws.foreach(w =>
      assert(w.partitionSpec.nonEmpty, s"global (unpartitioned) window:\n$w"))
  }

  test("LM scoring joins on n-gram keys, never a cartesian, no UDFs") {
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val scored = graft.ext.LangModel.bigramScore(docs, "doc_id", "text")
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"LM scoring degenerated to a non-equi join:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF in plan:\n$plan")
  }

  test("quality-classifier scoring is codegen, not ScalaUDFs") {
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val qScore = graft.ext.TextAnalysis.qualityCols(col("text"))
      .find(_._1 == "quality_score").get._2
    val (scored, _, _) = graft.ext.QualityClassifier.score(
      docs, col("source") === "src0", Seq("__f__" -> qScore),
      maxIter = 2, tol = 0.0)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF in plan:\n$plan")
  }

  test("decontamination broadcast-joins the benchmark; corpus unshuffled") {
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val bench = docs.limit(5).select(col("doc_id").as("bench_id"),
      col("text"))
    val flags = graft.ext.Decontam.flagContaminated(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 3)
    flags.collect()
    val plan = flags.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus side was shuffled for the join:\n$plan")
  }

  test("PCA projection is a codegen expression over a pruned scan") {
    val emb = spark.read.parquet(sf("sf0.01/embeddings.parquet"))
    val m = graft.ext.Embeddings.fitPca(emb, "embedding", k = 1, iters = 3)
    val proj = graft.ext.Embeddings.project(emb, m, "embedding")
      .select(col("vec_id"), col("pc_0"))
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF in plan:\n$plan")
    assert(!plan.contains("Exchange"),
      s"projection is per-row, must not shuffle:\n$plan")
    val leaves = scanSchema(proj)
    assert(leaves.contains("embedding") && !leaves.contains("label"),
      s"scan reads pruned columns:\n$leaves")
  }

  test("IVF search is codegen over the live index (no ScalaUDF)") {
    // the BUILD necessarily carries the array_to_vector UDF (VectorUDT
    // has no codegen constructor) — but that runs once; the per-query
    // SEARCH path (probe ranking, cell join, cosine re-rank) must stay
    // whole-stage-codegen with the index read from cache
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    val idx = graft.ext.Ann.buildIvfIndex(emb, "vec_id", "embedding",
      nCells = 4)
    try {
      idx.assigned.count() // materialize: search must hit the cache
      val res = graft.ext.Ann.searchIvf(idx, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 3, nProbe = 2)
      res.collect()
      val plan = res.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
        s"search did not read the cached index:\n$plan")
      assert(!plan.contains("ScalaUDF"), s"ScalaUDF in search plan:\n$plan")
    } finally idx.unpersist()
  }

  test("IVF index fans out a narrow source so searches parallelize") {
    // the quantizer fit, the cell assignment, and every search over the
    // cached index inherit the cached frame's partitioning — a one-file
    // source (1-2 scan partitions) would serialize all of them onto one
    // task; buildIvfIndex must fan the corpus out to a fixed count first
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    val idx = graft.ext.Ann.buildIvfIndex(emb, "vec_id", "embedding",
      nCells = 4)
    try {
      idx.assigned.count() // materialize the cache (AQE finalizes layout)
      assert(idx.assigned.rdd.getNumPartitions >= 8,
        s"cached IVF index has ${idx.assigned.rdd.getNumPartitions} " +
          "partitions; searches over it would serialize")
    } finally idx.unpersist()
  }

  test("Poisson bootstrap weights are codegen expressions, not ScalaUDFs") {
    // the Heckman bootstrap weight column (and anything else) must not
    // introduce a ScalaUDF codegen fence into the scan pipeline
    val hashCol = xxhash64(col("l_extendedprice"), col("l_quantity"))
    val withW = li.withColumn("__bw_1",
      graft.functions.PoissonDraw(hashCol, lit(43L)))
    val plan = withW.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF in plan:\n$plan")
    assert(plan.toLowerCase.contains("poisson_draw"),
      s"poisson_draw expression missing:\n$plan")
    // draws agree bit-for-bit with the Gram kernel's in-JVM chain
    val rows = withW.select(col("l_extendedprice").cast("double"),
      col("l_quantity").cast("double"), col("__bw_1")).limit(200).collect()
    rows.foreach { r =>
      // xxhash64(a, b) folds left: hash(b, seed = hash(a, seed = 42))
      val h1 = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        r.getDouble(0), org.apache.spark.sql.types.DoubleType, 42L)
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        r.getDouble(1), org.apache.spark.sql.types.DoubleType, h1)
      assert(r.getDouble(2) == Gram.poisson1(Gram.mix(h, 43L)))
    }
  }
}
