package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ordered prefix sums.
  *
  * A plain `Window.orderBy(...)` with no partition key collapses to ONE
  * task in Spark — fine at test scale, fatal at 100 TB. This helper
  * computes the same exclusive running sum by bucketing on the VALUE of
  * the ordering key (boundaries from one approxQuantile pass, frozen as
  * literals), then per-bucket windows plus a bucket-count-sized offset
  * table. Because the bucket of a row is a pure function of its key —
  * not of partition ids or range-sampling seeds — re-executions of the
  * returned plan are always self-consistent and deterministic.
  */
object Windows {

  /** Upper bound on the (group, bucket) metadata tuples
    * [[valuesAtRanksGrouped]] may collect to the driver — ~2M tuples is
    * ~100 MB of boxed driver state, far above any decomposition workload
    * (2-3 groups) and low enough that a runaway group-dense caller fails
    * fast instead of OOMing the driver mid-collect. */
  val MaxDriverGroupBucketTuples: Long = 2000000L

  /** Interleaved point/range bucket id over frozen boundaries:
    * boundary VALUES get their own exact-match (odd) buckets, strict
    * ranges between them the even buckets. `approxQuantile` boundaries
    * are actual data values, so when the probe collapses (tie-dense /
    * near-constant keys) the mass sits ON the surviving boundaries —
    * point buckets capture exactly those heavy tie runs, and every
    * range bucket is bounded by the probe spacing (more mass between
    * two adjacent distinct boundaries would have yielded another
    * distinct boundary). Monotone in `v` by construction: v strictly
    * between b_{j-1} and b_j -> 2j, v == b_j -> 2j + 1. Computed by a
    * native binary-search expression: a 31-boundary when-chain fold is
    * O(k) per row and big enough to fall off the compiled codegen path
    * (measured 2-3x on the whole quantile family). */
  private def pointRangeBucket(v: Column, boundaries: Array[Double]): Column =
    if (boundaries.isEmpty) lit(0)
    else graft.functions.BucketIndex(v, boundaries)

  /** Adds `outCol` = sum of `value` over all rows strictly before the
    * current row in the global ordering (exclusive prefix sum).
    *
    * Tie-dense keys (e.g. a uniform adjustment amount, an outcome
    * dominated by one value) collapse the boundary probe's distinct set,
    * which would funnel ALL tied rows into one bucket = one window task
    * at scale — exactly the failure this machinery exists to prevent.
    * The point/range bucket split isolates each heavy tied value in its
    * own (odd) bucket, and point buckets are then SUB-bucketed on
    * quantile boundaries of the first tie-break: within a point bucket
    * the key is constant, and the sub id is monotone in the tie-break,
    * so ordering by (bucket, sub, key, ties) IS the global (key, ties)
    * order and every prefix stays bit-identical — no tie run ever sorts
    * in a single task. The tie probe is only paid when the key probe
    * actually collapsed (and skipped when no tie-break is castable).
    *
    * @param keyCol    numeric primary ordering column
    * @param ascending ordering direction of keyCol
    * @param tieBreaks extra columns making the ordering total
    */
  /** The bucketed front half of [[exclusivePrefixSum]] — split out so
    * specs can assert the effective (bucket, sub) split on tie-dense
    * keys, not just the plan shape. */
  private[graft] def prefixBucketed(df: DataFrame, keyCol: Column,
      ascending: Boolean, tieBreaks: Seq[Column], value: Column,
      numBuckets: Int = 0,
      boundariesOverride: Option[Array[Double]] = None): DataFrame = {
    val buckets = if (numBuckets > 0) numBuckets
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // monotone bucket id (negated key for descending order so bucket
    // order == global order)
    val signedKey = if (ascending) keyCol.cast("double")
      else -keyCol.cast("double")
    val keyed = df.withColumn("__pfx_key__", signedKey)
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    // boundariesOverride: callers that already run an aggregate over the
    // same rows can ride the boundary probe on it as a percentile_approx
    // lane (see Equity.optimizePrepared) and pass the result here — one
    // job fewer, and ANY monotone boundary set is correct (buckets only
    // set parallelism; the prefix order is (key, ties) either way).
    // Boundaries in the SIGNED key space, pre-normalized by the caller.
    val boundaries = boundariesOverride.getOrElse {
      if (probes.isEmpty) Array.empty[Double]
      else graft.functions.BucketIndexExpr.normalize(
        keyed.stat.approxQuantile("__pfx_key__", probes, 0.001))
    }
    // null keys -> bucket 0, matching the old when-fold (whose null
    // comparisons all evaluated false); callers order/filter null keys
    // upstream
    val bucket =
      coalesce(pointRangeBucket(col("__pfx_key__"), boundaries), lit(0))
    // sub-split point buckets when the key probe collapsed: distinct
    // boundaries < min(8, buckets/4) means ONE tied value may hold an
    // O(n) share of the rows
    val collapsed = probes.nonEmpty &&
      boundaries.length < math.min(8, math.max(buckets / 4, 2))
    val tieBoundaries: Array[Double] =
      if (!collapsed || tieBreaks.isEmpty) Array.empty
      else {
        // a non-numeric tie-break casts to all-null -> no usable probe;
        // fall back to unsplit point buckets (correct, just coarser)
        val t = keyed.withColumn("__pfx_tie__",
          tieBreaks.head.cast("double"))
        scala.util.Try(
          graft.functions.BucketIndexExpr.normalize(
            t.stat.approxQuantile("__pfx_tie__", probes, 0.001)
              .filterNot(_.isNaN))
        ).getOrElse(Array.empty)
      }
    val sub =
      if (tieBoundaries.isEmpty) lit(0)
      else when(bucket % 2 === 1, // point buckets only; ranges keep 0
        // null tie-breaks -> sub 0: asc ordering puts nulls first, and
        // sub 0 is the first sub, so the global order stays consistent
        coalesce(graft.functions.BucketIndex(
          tieBreaks.head.cast("double"), tieBoundaries), lit(0)))
        .otherwise(lit(0))
    keyed.withColumn("__bucket__", bucket)
      .withColumn("__sub__", sub)
      .withColumn("__val__", value)
  }

  def exclusivePrefixSum(df: DataFrame, keyCol: Column, ascending: Boolean,
      tieBreaks: Seq[Column], value: Column, outCol: String,
      numBuckets: Int = 0,
      boundariesOverride: Option[Array[Double]] = None): DataFrame = {
    val ordering = (if (ascending) keyCol.asc else keyCol.desc) +:
      tieBreaks.map(_.asc)
    val bucketed = prefixBucketed(df, keyCol, ascending, tieBreaks, value,
      numBuckets, boundariesOverride)
    val local = Window.partitionBy(col("__bucket__"), col("__sub__"))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = bucketed.withColumn("__local_prefix__",
      coalesce(sum(col("__val__")).over(local), lit(0.0)))
    // (bucket, sub) totals: <= ~3 * numBuckets rows; deterministic
    // (value-derived), so re-executions stay self-consistent
    val totals = Jobs.labeled(df.sparkSession, "prefix-sum: bucket totals") {
      bucketed.groupBy(col("__bucket__"), col("__sub__"))
        .agg(sum(col("__val__")).as("__tot__"))
        .collect()
    }.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    var offsets = Map.empty[(Int, Int), Double]
    var acc = 0.0
    totals.keys.toSeq.sorted.foreach { k =>
      offsets += k -> acc
      acc += totals(k)
    }
    val offCol = offsets.foldLeft(lit(0.0)) { case (c, ((b, s), off)) =>
      when(col("__bucket__") === lit(b) && col("__sub__") === lit(s),
        lit(off)).otherwise(c)
    }
    withLocal.withColumn(outCol, col("__local_prefix__") + offCol)
      .drop("__pfx_key__", "__bucket__", "__sub__", "__val__",
        "__local_prefix__")
  }

  /** Values of `value` (nulls dropped) at the given 0-based global sort
    * ranks — WITHOUT a global sort: the single-group case of
    * [[valuesAtRanksGrouped]]. Rows tied on the value get arbitrary
    * consecutive ranks, which is immaterial here: tied rows share the
    * value, so value-at-rank is well-defined. */
  def valuesAtRanks(df: DataFrame, value: Column,
      ranks: Set[Long]): Map[Long, Double] = {
    if (ranks.isEmpty) return Map.empty
    valuesAtRanksGrouped(df.select(lit("_").as("__g__"), value.as("__v__")),
      col("__g__"), col("__v__"), Map("_" -> ranks))
      .getOrElse("_", Map.empty)
  }

  /** Per-group R type-7 (linearly interpolated) sample quantiles at the
    * given taus, plus caller-supplied per-group aggregate lanes, WITHOUT
    * the exact `percentile` aggregate — that aggregate buffers every
    * value of a group inside one task, which dies at 100 TB. Shape:
    * ONE grouped stats pass (per-group n + the extra lanes, pure-codegen
    * HashAggregate) + the rank-pick's own `approxQuantile` boundary
    * probe + ONE grouped value-bucketed rank-pick
    * for the bracketing order statistics of every (group, tau), then
    * driver interpolation `(hi-pos)*vLo + (pos-lo)*vHi` — identical
    * arithmetic to Spark's `percentile` and DuckDB's `quantile_cont`.
    * Returns per group: (non-null value count, tau -> quantile, the
    * extra aggregate values in argument order). Groups with n == 0 are
    * omitted; n == 1 reports the single value at every tau. */
  def quantilesType7Grouped(df: DataFrame, group: Column, value: Column,
      taus: Seq[Double], extraAggs: Seq[Column] = Nil)
      : Map[String, (Long, Map[Double, Double], Seq[Any])] = {
    require(taus.nonEmpty && taus.forall(t => t >= 0.0 && t <= 1.0),
      "taus must be within [0, 1]")
    // the stats pass runs over the ORIGINAL frame (extraAggs may
    // reference any of its columns) with the group/value expressions
    // tagged on. Counts and extras stay a pure-codegen HashAggregate —
    // folding the rank-pick's boundary probe in as a percentile_approx
    // lane (the Rif idiom) measured SLOWER here: the imperative sketch
    // forces the whole aggregation onto the ObjectHashAggregate path,
    // costing more than the dedicated approxQuantile job it saves.
    val base = df.withColumn("__g__", group.cast("string"))
      .withColumn("__v__", value.cast("double"))
    val aggLanes = count(col("__v__")).as("__n__") +:
      extraAggs.zipWithIndex.map { case (c, i) => c.as(s"__a${i}__") }
    val rows = base.groupBy(col("__g__"))
      .agg(aggLanes.head, aggLanes.tail: _*)
      .collect()
    val perGroup = rows.filter(!_.isNullAt(0))
      .map(r => r.getString(0) ->
        (r.getLong(1), extraAggs.indices.map(i => r.get(2 + i))))
      .toMap
    val wanted = perGroup.collect { case (g, (n, _)) if n >= 1 =>
      g -> taus.flatMap { t =>
        val pos = (n - 1).toDouble * t
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.toSet
    }
    val ranked = valuesAtRanksGrouped(base, col("__g__"), col("__v__"),
      wanted)
    perGroup.collect { case (g, (n, extras)) if n >= 1 =>
      val vals = ranked(g)
      val qs = taus.map { t =>
        val pos = (n - 1).toDouble * t
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val vLo = vals(lo)
        t -> (if (lo == hi) vLo else (hi - pos) * vLo + (pos - lo) * vals(hi))
      }.toMap
      g -> (n, qs, extras)
    }
  }

  /** Per-GROUP values at 0-based within-group sort ranks, for every
    * group in ONE set of passes (quantile probe, per-(group, bucket)
    * counts, pruned per-(group, bucket) window) instead of the three
    * passes a per-group loop would cost per group. Bucket boundaries
    * come from one LOW-PRECISION quantile probe over ALL groups — the
    * boundaries only balance bucket sizes, never touch the result, so
    * neither per-group boundaries nor tight probe accuracy is needed.
    * Only the (group, bucket) pairs whose rank range actually contains
    * a requested rank reach the sort: for k requested ranks the window
    * sorts at most k buckets' worth of rows (~k/buckets of the data),
    * not the whole frame. The window partitions by (group, bucket), so
    * no group's rows ever collapse into one task.
    *
    * DRIVER-MEMORY CONTRACT: the per-(group, bucket) count metadata is
    * collected to the driver, O(|ranksByGroup| x 2*shufflePartitions)
    * tuples (the input is filtered to the REQUESTED groups first, so
    * the frame's own group cardinality never matters). Callers already
    * hold a driver-side map per requested group, so the collect adds a
    * small constant factor — but a caller fanning out to ~10^6 groups
    * at 200 shuffle partitions would put ~4x10^8 tuples on the driver.
    * [[MaxDriverGroupBucketTuples]] bounds the driver route: past it
    * the call switches to [[valuesAtRanksGroupedDense]], which keeps
    * the offset metadata distributed end to end (the returned result
    * map is O(requested ranks) either way — that size is the caller's
    * own ask). Decompositions use 2-3 groups and stay on the
    * driver-algebra route; `maxDriverTuples` exists so specs can force
    * the dense route at any size. */
  def valuesAtRanksGrouped(df: DataFrame, group: Column, value: Column,
      ranksByGroup: Map[String, Set[Long]],
      precomputedBoundaries: Option[Array[Double]] = None,
      maxDriverTuples: Long = MaxDriverGroupBucketTuples)
      : Map[String, Map[Long, Double]] = {
    val want = ranksByGroup.collect {
      case (g, rs) if g != null && rs.nonEmpty => g -> rs.map(math.max(_, 0L))
    }
    if (want.isEmpty) return Map.empty
    val spark = df.sparkSession
    import spark.implicits._
    // Bucket count scales with the REQUESTED rank count, not just the
    // shuffle-partition count: each wanted rank keeps at most one range
    // bucket (~n/buckets rows) alive through the final window sort, so
    // at `buckets = 2 * partitions` a 10-rank ask on one group sorts
    // ~10/64 of the whole frame (sf10 receipt: the window job is 4.8 s
    // of q_quantile_t7's 8.6 s; the probe is 0.6 s). 16 buckets per
    // wanted rank caps the kept fraction at ~1/16 regardless of rank
    // count, while the 1024 ceiling bounds probe size and the driver's
    // (group, bucket) metadata. Boundaries remain purely a load-balance
    // choice — the rank-pick is exact at ANY bucketing, so results are
    // bit-identical across bucket counts.
    val totalWanted = want.valuesIterator.map(_.size).sum
    val nBucketsBase = math.min(1024L,
      math.max(spark.sessionState.conf.numShufflePartitions.toLong,
        16L * totalWanted))
    val nBuckets2 = 2L * nBucketsBase
    val vals0 = df
      .select(group.cast("string").as("__g__"), value.cast("double").as("__v__"))
      .na.drop()
    // a 10^5-literal isin would blow up codegen/analysis; group-dense
    // calls restrict via a semi-join instead
    val vals =
      if (want.size <= 1000)
        vals0.filter(col("__g__").isin(want.keys.toSeq: _*))
      else
        vals0.join(broadcastableGroups(spark, want.keys), Seq("__g__"),
          "left_semi")
    val buckets = nBucketsBase.toInt
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    // callers that already ran an aggregation over the frame can fold the
    // boundary probe into it (percentile_approx lane) and skip this job
    val boundaries = precomputedBoundaries match {
      case Some(b) => graft.functions.BucketIndexExpr.normalize(b)
      case None =>
        if (probes.isEmpty) Array.empty[Double]
        else graft.functions.BucketIndexExpr.normalize(
          vals.stat.approxQuantile("__v__", probes, 0.01))
    }
    if (want.size.toLong * nBuckets2 > maxDriverTuples)
      return valuesAtRanksGroupedDense(spark, vals, boundaries, want)
    // interleaved point/range buckets (see pointRangeBucket): a rank
    // that falls inside a POINT bucket needs no sort at all — every row
    // there shares the boundary value, so the answer IS that value,
    // resolved on the driver below. Only thin RANGE buckets (bounded by
    // the probe spacing) ever reach the window, so a (near-)constant
    // value column — which collapses the probe's distinct set — can no
    // longer funnel all rows into one single-task sort: its heavy tied
    // values short-circuit driver-side instead.
    val bucket = pointRangeBucket(col("__v__"), boundaries)
    val bucketed = vals.withColumn("__bucket__", bucket)
    // per-(group, bucket) counts: <= groups * buckets rows, deterministic
    // (value-derived buckets), so re-executions stay self-consistent
    val totals = Jobs.labeled(spark, "rank-pick: per-(group,bucket) counts") {
      bucketed.groupBy(col("__g__"), col("__bucket__"))
        .agg(count(lit(1)).as("__n__"))
        .collect()
    }.map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val offsets: Map[(String, Int), Long] =
      totals.keys.groupBy(_._1).flatMap { case (g, ks) =>
        var acc = 0L
        ks.map(_._2).toSeq.sorted.map { b =>
          val entry = (g, b) -> acc
          acc += totals((g, b))
          entry
        }
      }
    // resolve ranks landing in point buckets straight from the boundary
    // value; only the rest need the distributed rank-pick
    val pointHits: Map[String, Map[Long, Double]] = offsets.toSeq.collect {
      case ((g, b), off) if b % 2 == 1 =>
        want(g).filter(r => r >= off && r < off + totals((g, b)))
          .map(r => (g, r, boundaries((b - 1) / 2)))
    }.flatten.groupBy(_._1)
      .map { case (g, hs) => g -> hs.map(h => h._2 -> h._3).toMap }
    val remaining: Map[String, Set[Long]] = want.map { case (g, rs) =>
      g -> (rs -- pointHits.getOrElse(g, Map.empty).keySet)
    }.filter(_._2.nonEmpty)
    if (remaining.isEmpty) return pointHits
    // prune to the RANGE buckets whose [offset, offset + n) range holds
    // a still-unresolved rank for SOME group — everything else never
    // needs sorting. The prune predicate references __bucket__ exactly
    // once (a plain isin): a per-(group, bucket) OR-chain here re-inlines
    // the bucket when-fold once per term below the exchange and measured
    // ~10x slower than the whole window it guards.
    val keptBuckets = offsets.collect {
      case ((g, b), off)
        if b % 2 == 0 && remaining.getOrElse(g, Set.empty)
          .exists(r => r >= off && r < off + totals((g, b))) => b
    }.toSet
    val keepBucket =
      col("__bucket__").isin(keptBuckets.toSeq.map(_.asInstanceOf[Any]): _*)
    // rank offsets for EVERY (group, bucket) pair that survives the
    // bucket prune — a surviving row's rank must be exact even when its
    // own (group, bucket) wasn't the hit target, or the final rank
    // filter could select an impostor row. For the COMMON case (a few
    // groups x a few kept buckets — every decomposition caller) the
    // offsets and the requested ranks inline as flat when-chains /
    // OR-predicates over the POST-window columns: the two broadcast
    // LocalRelation joins they replace cost two extra AQE stage rounds
    // plus their planning (~0.3 s of driver gap per call at test scale,
    // pure fixed cost at any scale). A high-cardinality call (grouped
    // fits over thousands of levels) would generate an enormous
    // Catalyst expression that way (codegen 64KB method fallback, slow
    // analysis), so past 64 entries the attachments stay BROADCAST
    // joins. Both routes see the identical window input (the offset
    // attachment can never drop a row: every surviving (group, bucket)
    // has an offsets entry), so ranks — and results — are bit-identical.
    // The isin bucket prune stays a plain filter so it still pushes
    // toward the scan.
    val offEntries = offsets.toSeq
      .collect { case ((g, b), off) if keptBuckets(b) => (g, b, off.toDouble) }
    val wantEntries = remaining.iterator
      .flatMap { case (g, rs) => rs.map(r => (g, r.toDouble)) }.toSeq
    val local = Window.partitionBy(col("__g__"), col("__bucket__"))
      .orderBy(col("__v__").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val localRank = coalesce(sum(lit(1.0)).over(local), lit(0.0))
    val picked =
      if (offEntries.size + wantEntries.size <= 64) {
        val offCol = offEntries.foldLeft(lit(null).cast("double")) {
          case (acc, (g, b, off)) =>
            when(col("__g__") === lit(g) && col("__bucket__") === lit(b),
              lit(off)).otherwise(acc)
        }
        val wantPred = wantEntries.map { case (g, r) =>
          col("__g__") === lit(g) && col("__rk__") === lit(r)
        }.reduce(_ || _)
        bucketed.filter(keepBucket)
          .withColumn("__rk__", localRank + offCol)
          .filter(wantPred)
      } else {
        val offDf = offEntries.toDF("__g__", "__bucket__", "__off__")
        val wantDf = wantEntries.toDF("__g__", "__rk__")
        bucketed.filter(keepBucket)
          .join(broadcast(offDf), Seq("__g__", "__bucket__"))
          .withColumn("__rk__", localRank + col("__off__"))
          .join(broadcast(wantDf), Seq("__g__", "__rk__"))
      }
    val windowed = Jobs.labeled(spark, "rank-pick: windowed pick") {
      picked
        .select(col("__g__"), col("__rk__"), col("__v__"))
        .collect()
    }
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => r.getDouble(1).toLong -> r.getDouble(2)).toMap
      }
    // merge driver-resolved point-bucket answers with the windowed ones
    (windowed.keySet ++ pointHits.keySet).iterator.map { g =>
      g -> (windowed.getOrElse(g, Map.empty) ++
        pointHits.getOrElse(g, Map.empty))
    }.toMap
  }

  /** The requested group names as a DataFrame (partitioned, not a
    * LocalRelation literal list). */
  private def broadcastableGroups(spark: org.apache.spark.sql.SparkSession,
      groups: Iterable[String]): DataFrame = {
    import spark.implicits._
    spark.sparkContext.parallelize(groups.toSeq,
      math.max(1, spark.sparkContext.defaultParallelism)).toDF("__g__")
  }

  /** Group-dense rank-pick: the same bucketed algorithm as
    * [[valuesAtRanksGrouped]] with every piece of per-(group, bucket)
    * metadata kept DISTRIBUTED — cumulative offsets via a per-group
    * window over the (group, bucket) count table (at most
    * 2*shufflePartitions rows per group, so no skew), rank-to-bucket
    * location via an equi-join on the group plus the offset-range
    * predicate, point buckets resolved by a broadcast join against the
    * boundary values, and range buckets by a per-(group, bucket)
    * `row_number` window on the semi-joined rows. Only the RESULT
    * (one row per requested rank — the size of the caller's own input
    * map) is ever collected. */
  private def valuesAtRanksGroupedDense(
      spark: org.apache.spark.sql.SparkSession, vals: DataFrame,
      boundaries: Array[Double], want: Map[String, Set[Long]])
      : Map[String, Map[Long, Double]] = {
    import spark.implicits._
    val bucket = pointRangeBucket(col("__v__"), boundaries)
    // read twice (count table + the final window); keep the lineage flat
    val bucketed = vals.withColumn("__bucket__", bucket).localCheckpoint()
    val totals = bucketed.groupBy(col("__g__"), col("__bucket__"))
      .agg(count(lit(1)).as("__n__"))
    val wOff = Window.partitionBy(col("__g__")).orderBy(col("__bucket__"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = totals.withColumn("__off__",
      coalesce(sum(col("__n__")).over(wOff), lit(0L)))
    val ranksDf = spark.sparkContext.parallelize(
        want.iterator.flatMap { case (g, rs) =>
          rs.iterator.map(r => (g, r))
        }.toSeq,
        math.max(1, spark.sparkContext.defaultParallelism))
      .toDF("__g__", "__r__")
    // each rank falls in exactly one bucket's [off, off + n) span;
    // ranks past the group's total row count simply never match (the
    // same omission semantics as the driver route)
    val located = ranksDf.join(offs, Seq("__g__"))
      .filter(col("__r__") >= col("__off__") &&
        col("__r__") < col("__off__") + col("__n__"))
      .select(col("__g__"), col("__r__"), col("__bucket__"), col("__off__"))
      .localCheckpoint()
    val boundaryVals = boundaries.zipWithIndex
      .map { case (v, i) => (2 * i + 1, v) }.toSeq
      .toDF("__bucket__", "__pv__")
    val pointRows = located.filter(col("__bucket__") % 2 === 1)
      .join(broadcast(boundaryVals), Seq("__bucket__"))
      .select(col("__g__"), col("__r__"), col("__pv__").as("__v__"))
    val targets = located.filter(col("__bucket__") % 2 === 0)
      .select(col("__g__"), col("__bucket__"), col("__r__"),
        (col("__r__") - col("__off__")).as("__lr__"))
    val keep = targets.select(col("__g__"), col("__bucket__")).distinct()
    val local = Window.partitionBy(col("__g__"), col("__bucket__"))
      .orderBy(col("__v__").asc)
    val rangeRows = bucketed
      .join(keep, Seq("__g__", "__bucket__"), "left_semi")
      .withColumn("__lr__", row_number().over(local).cast("long") - lit(1L))
      .join(targets, Seq("__g__", "__bucket__", "__lr__"))
      .select(col("__g__"), col("__r__"), col("__v__"))
    pointRows.unionByName(rangeRows).collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
      }
  }
}
