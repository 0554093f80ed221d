package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ordered prefix sums.
  *
  * A plain `Window.orderBy(...)` with no partition key collapses to ONE
  * task in Spark — fine at test scale, fatal at 100 TB. This helper
  * computes the same exclusive running sum with a range repartition +
  * per-partition window + a tiny (numPartitions-sized) driver-side offset
  * table, so every stage stays parallel.
  */
object Windows {

  /** Adds `outCol` = sum of `value` over all rows strictly before the
    * current row in the global `orderCols` ordering (exclusive prefix
    * sum). `orderCols` must be a total order (add tie-break keys). */
  def exclusivePrefixSum(df: DataFrame, orderCols: Seq[Column], value: Column,
      outCol: String, numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid__", spark_partition_id())
      .withColumn("__val__", value)
    val local = Window.partitionBy(col("__pid__")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = ranged.withColumn("__local_prefix__",
      coalesce(sum(col("__val__")).over(local), lit(0.0)))
    // partition totals: numPartitions rows -> driver -> broadcast map
    val totals = withLocal.groupBy(col("__pid__"))
      .agg(sum(col("__val__")).as("__tot__"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // pid -> sum of totals of all earlier pids (range partitions are
    // ordered, so pid order == global order)
    var offsets = Map.empty[Int, Double]
    var acc = 0.0
    totals.keys.toSeq.sorted.foreach { pid =>
      offsets += pid -> acc
      acc += totals(pid)
    }
    val offCol = offsets.foldLeft(lit(0.0)) { case (c, (pid, off)) =>
      when(col("__pid__") === lit(pid), lit(off)).otherwise(c)
    }
    withLocal
      .withColumn(outCol, col("__local_prefix__") + offCol)
      .drop("__pid__", "__val__", "__local_prefix__")
  }
}
