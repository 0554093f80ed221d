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

  /** Run two INDEPENDENT action chains concurrently (guide §2.6 —
    * overlap independent jobs: Spark happily runs several jobs at once;
    * actions are only sequential because driver code calls them
    * sequentially). `b` runs on a helper thread, `a` on the caller's;
    * exceptions from `b` rethrow unwrapped so callers see the same
    * error types the sequential code produced. Only use when the two
    * computations share no mutable state — each side's own jobs,
    * partitioning and accumulation order are untouched, so results are
    * bit-identical to running them back to back. */
  def par2[A, B](a: => A, b: => B): (A, B) = {
    val fb = new java.util.concurrent.FutureTask(
      new java.util.concurrent.Callable[B] { def call(): B = b })
    val t = new Thread(fb, "graft-par2")
    t.setDaemon(true)
    t.start()
    val ra = a
    val rb =
      try fb.get()
      catch {
        case e: java.util.concurrent.ExecutionException => throw e.getCause
      }
    (ra, rb)
  }
}
