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

  /** Adds `outCol` = sum of `value` over all rows strictly before the
    * current row in the global ordering (exclusive prefix sum).
    *
    * @param keyCol    numeric primary ordering column
    * @param ascending ordering direction of keyCol
    * @param tieBreaks extra columns making the ordering total
    */
  def exclusivePrefixSum(df: DataFrame, keyCol: Column, ascending: Boolean,
      tieBreaks: Seq[Column], value: Column, outCol: String,
      numBuckets: Int = 0): DataFrame = {
    val buckets = if (numBuckets > 0) numBuckets
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // monotone bucket id: count of frozen boundaries <= key (negated for
    // descending order so bucket order == global order)
    val signedKey = if (ascending) keyCol.cast("double")
      else -keyCol.cast("double")
    val keyed = df.withColumn("__pfx_key__", signedKey)
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val boundaries =
      if (probes.isEmpty) Array.empty[Double]
      else keyed.stat.approxQuantile("__pfx_key__", probes, 0.001)
        .distinct.sorted
    val bucket = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__pfx_key__") > lit(b), 1).otherwise(0)
    }
    val ordering = (if (ascending) keyCol.asc else keyCol.desc) +:
      tieBreaks.map(_.asc)
    val bucketed = keyed.withColumn("__bucket__", bucket)
      .withColumn("__val__", value)
    val local = Window.partitionBy(col("__bucket__")).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = bucketed.withColumn("__local_prefix__",
      coalesce(sum(col("__val__")).over(local), lit(0.0)))
    // bucket totals: <= numBuckets rows; deterministic (value-derived)
    val totals = bucketed.groupBy(col("__bucket__"))
      .agg(sum(col("__val__")).as("__tot__"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    var offsets = Map.empty[Int, Double]
    var acc = 0.0
    totals.keys.toSeq.sorted.foreach { b =>
      offsets += b -> acc
      acc += totals(b)
    }
    val offCol = offsets.foldLeft(lit(0.0)) { case (c, (b, off)) =>
      when(col("__bucket__") === lit(b), lit(off)).otherwise(c)
    }
    withLocal.withColumn(outCol, col("__local_prefix__") + offCol)
      .drop("__pfx_key__", "__bucket__", "__val__", "__local_prefix__")
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
    * no group's rows ever collapse into one task. */
  def valuesAtRanksGrouped(df: DataFrame, group: Column, value: Column,
      ranksByGroup: Map[String, Set[Long]],
      precomputedBoundaries: Option[Array[Double]] = None)
      : Map[String, Map[Long, Double]] = {
    val want = ranksByGroup.collect {
      case (g, rs) if g != null && rs.nonEmpty => g -> rs.map(math.max(_, 0L))
    }
    if (want.isEmpty) return Map.empty
    val vals = df
      .select(group.cast("string").as("__g__"), value.cast("double").as("__v__"))
      .filter(col("__g__").isin(want.keys.toSeq: _*))
      .na.drop()
    val buckets = df.sparkSession.sessionState.conf.numShufflePartitions
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    // callers that already ran an aggregation over the frame can fold the
    // boundary probe into it (percentile_approx lane) and skip this job
    val boundaries = precomputedBoundaries match {
      case Some(b) => b.distinct.sorted
      case None =>
        if (probes.isEmpty) Array.empty[Double]
        else vals.stat.approxQuantile("__v__", probes, 0.01).distinct.sorted
    }
    val bucket = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__v__") > lit(b), 1).otherwise(0)
    }
    val bucketed = vals.withColumn("__bucket__", bucket)
    // per-(group, bucket) counts: <= groups * buckets rows, deterministic
    // (value-derived buckets), so re-executions stay self-consistent
    val totals = bucketed.groupBy(col("__g__"), col("__bucket__"))
      .agg(count(lit(1)).as("__n__"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val offsets: Map[(String, Int), Long] =
      totals.keys.groupBy(_._1).flatMap { case (g, ks) =>
        var acc = 0L
        ks.map(_._2).toSeq.sorted.map { b =>
          val entry = (g, b) -> acc
          acc += totals((g, b))
          entry
        }
      }
    // prune to the buckets whose [offset, offset + n) range holds a
    // requested rank for SOME group — everything else never needs
    // sorting. The prune predicate references __bucket__ exactly once
    // (a plain isin): a per-(group, bucket) OR-chain here re-inlines the
    // bucket when-fold once per term below the exchange and measured
    // ~10x slower than the whole window it guards.
    val keptBuckets = offsets.collect {
      case ((g, b), off)
        if want(g).exists(r => r >= off && r < off + totals((g, b))) => b
    }.toSet
    val keepBucket =
      col("__bucket__").isin(keptBuckets.toSeq.map(_.asInstanceOf[Any]): _*)
    // rank offsets for EVERY (group, bucket) pair that survives the
    // bucket prune — a surviving row's rank must be exact even when its
    // own (group, bucket) wasn't the hit target, or the final rank
    // filter could select an impostor row. The offsets (and below, the
    // requested ranks) attach via tiny BROADCAST-joined frames, not
    // inlined when-chains: a high-cardinality group map would otherwise
    // generate an enormous Catalyst expression (codegen 64KB method
    // fallback, slow analysis). The isin bucket prune stays a plain
    // filter so it still pushes toward the scan.
    import df.sparkSession.implicits._
    val offDf = offsets.iterator
      .collect { case ((g, b), off) if keptBuckets(b) => (g, b, off.toDouble) }
      .toSeq.toDF("__g__", "__bucket__", "__off__")
    val local = Window.partitionBy(col("__g__"), col("__bucket__"))
      .orderBy(col("__v__").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = bucketed.filter(keepBucket)
      .join(broadcast(offDf), Seq("__g__", "__bucket__"))
      .withColumn("__rk__",
        coalesce(sum(lit(1.0)).over(local), lit(0.0)) + col("__off__"))
    val wantDf = want.iterator
      .flatMap { case (g, rs) => rs.map(r => (g, r.toDouble)) }
      .toSeq.toDF("__g__", "__rk__")
    ranked.join(broadcast(wantDf), Seq("__g__", "__rk__"))
      .select(col("__g__"), col("__rk__"), col("__v__"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => r.getDouble(1).toLong -> r.getDouble(2)).toMap
      }
  }
}
