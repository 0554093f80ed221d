package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline and
  * an IVF (inverted-file) variant — KMeans coarse quantizer, search only
  * the `nprobe` closest cells — as the scale path (cuts the candidate
  * set by ~nCells/nprobe at 100 TB).
  */
object Ann {

  /** Deterministic id-hash blocking of an embedding table:
    * (blockId, array of (id, vector, L2 norm) sorted by id). The building
    * block of the exact distributed kernels ([[bruteForceTopK]],
    * [[Dedup.embeddingNearDupPairs]]): block contents depend only on ids,
    * never on partition layout, and each block is one task's working set
    * (size ~n/nBlocks — pick nBlocks so a block fits in executor memory). */
  private[ext] def vectorBlocks(df: DataFrame, idCol: String, vecCol: String,
      nBlocks: Int): org.apache.spark.rdd.RDD[(Int, Array[(Long, Array[Double], Double)])] = {
    require(nBlocks >= 1, "nBlocks must be >= 1")
    val proj = df.select(col(idCol).cast("long"),
      transform(col(vecCol), x => x.cast("double")))
    proj.rdd.map { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Double](1).toArray
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      (java.lang.Math.floorMod(id, nBlocks.toLong).toInt, (id, v, math.sqrt(s)))
    }.groupByKey(nBlocks).mapValues(_.toArray.sortBy(_._1))
  }

  /** Exact top-k by cosine, fully distributed: the corpus is id-hash
    * blocked ([[vectorBlocks]]), each (query partition, corpus block)
    * task keeps a per-query top-k in a tight loop, and the bounded
    * partial top-k lists (k rows per query per block) merge with
    * reduceByKey. Nothing is collected to the driver and the result is
    * exact with a deterministic (cosine desc, id asc) tie-break at any
    * block count. O(|Q|*|C|) flops — the IVF path ([[ivfTopK]]) is the
    * sub-linear candidate generator when that product is too big.
    *
    * `idCol` must be unique on BOTH sides: the reduceByKey merge keys on
    * the query id, so duplicate query ids would be merged into one top-k
    * list instead of getting independent ranked lists (and duplicate
    * corpus ids would be indistinguishable in the output). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nBlocks: Int = 16): DataFrame = {
    val spark = queries.sparkSession
    val cBlocks = vectorBlocks(corpus, idCol, vecCol, nBlocks)
    val qChunks = queries.select(col(idCol).cast("long"),
        transform(col(vecCol), x => x.cast("double")))
      .rdd.mapPartitions { it =>
        val a = it.map { r =>
          val v = r.getSeq[Double](1).toArray
          var s = 0.0
          var i = 0
          while (i < v.length) { s += v(i) * v(i); i += 1 }
          (r.getLong(0), v, math.sqrt(s))
        }.toArray
        if (a.isEmpty) Iterator.empty else Iterator(a)
      }
    val topOrd: Ordering[(Double, Long)] = Ordering.by(t => (-t._1, t._2))
    def mergeK(a: Array[(Double, Long)], b: Array[(Double, Long)]) =
      (a ++ b).sorted(topOrd).take(k)
    val partial = qChunks.cartesian(cBlocks).flatMap { case (qs, (_, block)) =>
      qs.iterator.map { case (qid, qv, qn) =>
        // (cosine desc, id asc) top-k within this block
        val best = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(topOrd)
        var ci = 0
        while (ci < block.length) {
          val (cid, cv, cn) = block(ci)
          if (cid != qid) {
            var dot = 0.0
            var i = 0
            while (i < qv.length) { dot += qv(i) * cv(i); i += 1 }
            val cos = dot / (qn * cn)
            if (best.size < k) best.enqueue((cos, cid))
            else {
              val worst = best.head
              if (cos > worst._1 || (cos == worst._1 && cid < worst._2)) {
                best.dequeue(); best.enqueue((cos, cid))
              }
            }
          }
          ci += 1
        }
        (qid, best.toArray.sorted(topOrd))
      }
    }
    val rows = partial.reduceByKey(mergeK).flatMap { case (qid, top) =>
      top.iterator.zipWithIndex.map { case ((cos, cid), i) =>
        org.apache.spark.sql.Row(qid, i + 1, cid, cos)
      }
    }
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("neighbor_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cosine", org.apache.spark.sql.types.DoubleType))))
  }

  /** A fitted IVF index: corpus vectors assigned to KMeans cells (cached
    * DataFrame) plus the (tiny) cell-center table. Build ONCE per corpus,
    * search many times — the quantizer fit is the expensive step and is
    * independent of the queries. */
  final case class IvfIndex(assigned: DataFrame, centers: DataFrame) {
    def unpersist(): Unit = { assigned.unpersist(false); () }
  }

  /** Corpus-sized cell count: n / targetCellSize, floored at `minCells`.
    * A FIXED nCells is a scale bug twice over for within-cell pair work:
    * per-cell cost is (n/c)^2 * c = n^2/c (holding c constant while the
    * corpus grows 10x makes near-dup screening up to 100x slower —
    * measured 28.9x on the 8-cell q_embed_neardup_ivf), and c is also
    * the JOIN KEY CARDINALITY, so c below the executor-core count caps
    * the pair join's parallelism at c tasks. Scaling c with n keeps
    * cells at a constant population: within-cell pair work is then
    * n * targetCellSize, linear in the corpus, over n/targetCellSize
    * parallel keys. The single-level KMeans quantizer is the right tool
    * up to ~10^5 cells; beyond that (10^8+ vectors) swap in a two-level
    * coarse quantizer (cluster a sample into sqrt(c) super-cells, then
    * sub-cluster within) — the cell-count FORMULA stays the same. */
  def defaultNCells(n: Long, targetCellSize: Long = 500L,
      minCells: Int = 8): Int =
    math.max(minCells.toLong, n / targetCellSize)
      .min(Int.MaxValue.toLong).toInt

  /** Fit the coarse quantizer and assign every corpus vector to a cell.
    * `maxIter` caps the KMeans fit (the expensive, corpus-scan-per-
    * iteration step): a coarse quantizer only has to partition the space
    * roughly — probe order and the exact re-rank absorb residual cell
    * imperfection — so a tight cap trades invisible recall for a
    * several-scan cheaper build.
    *
    * The fit trains on a SAMPLE once the corpus exceeds
    * `fitPointsPerCell * nCells` vectors (the FAISS-style regime:
    * centroid quality saturates around ~100-250 training points per cell,
    * while fit cost is points * nCells * iters — training on all of a
    * 10^9-vector corpus would be quadratic-ish as nCells scales with n).
    * The sample is CONTENT-KEYED (md5 of the id, same family as the
    * dedup hashes), not `df.sample`: Spark's sample draws per-partition,
    * so its membership would change with partition layout and break the
    * cross-thread-count determinism audit. Cell ASSIGNMENT still covers
    * every vector. `fitPointsPerCell <= 0` disables sampling. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, seed: Long = 42L, maxIter: Int = 8,
      fitPointsPerCell: Int = 200): IvfIndex = {
    // The fit iterations and the full-corpus cell assignment are
    // CPU-dense vector arithmetic; when the source arrives in fewer
    // partitions than the cluster has cores (one parquet file at test
    // scale; a coalesced upstream at any scale), every build job runs
    // nearly serial. One up-front fan-out shuffle buys parallelism for
    // every downstream pass (fit iterations, assignment, searches over
    // the cached index). The shuffle moves the RAW (id, float-vector)
    // rows — repartitioning after the double/ml-vector conversions
    // would push twice the bytes through the exchange and serialize the
    // conversion work itself. The fan-out count is FIXED (not
    // defaultParallelism): KMeans centers depend on the partition
    // layout, and a thread-count-dependent layout would break the
    // cross-parallelism determinism audit — round-robin from the same
    // source layout to the same count is deterministic.
    // corpus-sized (via nCells = n / targetCellSize), clamped to [8, 64]:
    // a tiny corpus must not shatter into 64 partitions of task overhead,
    // and the count stays a pure function of the DATA (never of the
    // thread count), keeping the audit green
    val fanOut = math.min(64, math.max(8, nCells))
    val raw0 = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__vec__"))
    val raw = if (raw0.rdd.getNumPartitions < fanOut) raw0.repartition(fanOut)
      else raw0
    // `__nv__`: the vector norm, computed ONCE at build — every search
    // and pair screening over the index then pays one dot product per
    // candidate instead of three
    val cv = raw.select(col("neighbor_id"),
      transform(col("__vec__"), x => x.cast("double")).as("cv"),
      array_to_vector(col("__vec__")).as("__feat__"))
      .withColumn("__nv__",
        sqrt(graft.functions.DotProduct(col("cv"), col("cv"))))
    val train =
      if (fitPointsPerCell <= 0) cv
      else {
        val want = fitPointsPerCell.toLong * nCells
        val n = cv.count()
        if (n <= want) cv
        else {
          // keep ~want rows: id hashed into n/want strata, stratum 0 kept
          val strata = math.max(2L, n / want)
          cv.filter(pmod(graft.ext.TextAnalysis.hash56(
            col("neighbor_id").cast("string")), lit(strata)) === 0L)
        }
      }
    val km = new KMeans().setK(nCells).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__feat__").setPredictionCol("__cell__")
    val model = km.fit(train)
    val assigned = model.transform(cv).select(
      col("neighbor_id"), col("cv"), col("__nv__"), col("__cell__")).cache()
    val centers = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.toSeq)
    }.toSeq
    val centersDf = corpus.sparkSession.createDataFrame(centers)
      .toDF("__cell__", "center")
    IvfIndex(assigned, centersDf)
  }

  /** Search a fitted IVF index: only the nProbe closest cells per query
    * are scanned. Same schema as [[bruteForceTopK]]; recall < 1 by
    * construction. */
  def searchIvf(index: IvfIndex, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int): DataFrame = {
    // query norm computed ONCE per query row, reused across every probe
    // ranking and every candidate in the re-rank
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
      .withColumn("__qn__",
        sqrt(graft.functions.DotProduct(col("qv"), col("qv"))))
    // nprobe closest cells per query (centers table is tiny)
    val qCells = q.crossJoin(broadcast(index.centers))
      .withColumn("cdist", graft.functions.DotProduct(col("qv"), col("center"))
        / (col("__qn__") * sqrt(graft.functions.DotProduct(col("center"), col("center")))))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist").desc, col("__cell__"))))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("__qn__"), col("__cell__"))

    qCells.join(index.assigned, "__cell__")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Dedup.cosineWithNormsCol(
        col("qv"), col("cv"), col("__qn__"), col("__nv__")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** IVF top-k, building a throwaway index: assign corpus vectors to
    * KMeans cells, then search only the nprobe closest cells per query.
    * Prefer [[buildIvfIndex]] + [[searchIvf]] when issuing more than one
    * query batch against the same corpus. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int, nProbe: Int,
      seed: Long = 42L): DataFrame =
    searchIvf(buildIvfIndex(corpus, idCol, vecCol, nCells, seed),
      queries, idCol, vecCol, k, nProbe)

  /** Sign-grid coarse quantizer cell id: bit j is set iff dimension j of
    * the vector is positive (first `bits` dimensions; 2^bits cells).
    * Unlike the KMeans quantizer this is data-INDEPENDENT — it ignores
    * the corpus distribution, so the KMeans IVF stays the production
    * default — but it is a pure integer expression both engines compute
    * identically, which makes the whole IVF search shape (assign cells,
    * probe the closest cells, exact re-rank inside) SQL-replayable
    * end-to-end. */
  def gridCell(vec: Column, bits: Int): Column =
    (0 until bits).map { j =>
      when(element_at(vec, j + 1).cast("double") > 0.0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF top-k over the sign-grid quantizer: per query, probe the
    * `nProbe` NON-EMPTY cells closest by Hamming distance to the query's
    * own cell (ties by cell id), then exact cosine top-k among their
    * members — the same probe-then-rerank shape as [[searchIvf]], with
    * cell geometry that an ANSI-SQL oracle can replay exactly (the
    * q_ann_ivf_grid row). Recall < 1 by construction, identically in
    * both engines. */
  def gridTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int, nProbe: Int): DataFrame = {
    require(bits >= 1 && bits <= 62, "bits must be in [1, 62]")
    val corp = corpus.select(col(idCol).cast("long").as("neighbor_id"),
        transform(col(vecCol), x => x.cast("double")).as("cv"),
        gridCell(col(vecCol), bits).as("__cell__"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        transform(col(vecCol), x => x.cast("double")).as("qv"),
        gridCell(col(vecCol), bits).as("__qcell__"))
    // non-empty cells only (tiny: <= 2^bits rows), broadcast to rank
    // probe order per query without touching the corpus
    val cells = corp.select(col("__cell__")).distinct()
    val probed = q.crossJoin(broadcast(cells))
      .withColumn("__ham__",
        bit_count(col("__qcell__").bitwiseXOR(col("__cell__"))))
      .withColumn("__crank__", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__ham__").asc, col("__cell__").asc)))
      .filter(col("__crank__") <= nProbe)
      .select(col("query_id"), col("qv"), col("__cell__"))
    probed.join(corp, "__cell__")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Dedup.cosineCol(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
