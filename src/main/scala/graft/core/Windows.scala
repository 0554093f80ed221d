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
    * ranks — WITHOUT a global sort. Ranks come from the value-bucketed
    * exclusive prefix COUNT above, so the plan is three parallel passes
    * (quantile probe, bucket totals, filtered per-bucket window) and only
    * the requested rows reach the driver. A `sort + zipWithIndex`
    * rank-pick executes its global sort twice (zipWithIndex's count job,
    * then the extract job); this runs nothing twice. Rows tied on the
    * value get arbitrary consecutive ranks, which is immaterial here:
    * tied rows share the value, so value-at-rank is well-defined. */
  def valuesAtRanks(df: DataFrame, value: Column,
      ranks: Set[Long]): Map[Long, Double] = {
    val wanted = ranks.map(math.max(_, 0L))
    if (wanted.isEmpty) return Map.empty
    val vals = df.select(value.cast("double").as("__v__")).na.drop()
    val ranked = exclusivePrefixSum(vals, col("__v__"), ascending = true,
      Nil, lit(1.0), "__rk__")
    ranked.filter(col("__rk__").isin(wanted.toSeq.map(_.toDouble): _*))
      .select(col("__rk__"), col("__v__"))
      .collect().map(r => r.getDouble(0).toLong -> r.getDouble(1)).toMap
  }
}
