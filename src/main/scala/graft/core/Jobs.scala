package graft.core

import org.apache.spark.sql.SparkSession

/** Job labeling (guide §1.5): multi-pass operators set a description per
  * phase so the UI / job-level profilers attribute cost to the phase, not
  * to an anonymous AQE stage-materialization callsite. Descriptions are
  * thread-local and AQE's stage futures capture them, so concurrent
  * actions from different threads stay correctly labeled. */
object Jobs {
  def labeled[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(null)
  }
}
