package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: all (left, right) pairs sharing `keys` with
  * `rightTime` inside `[leftTime + lo, leftTime + hi]` — the batch
  * counterpart of Structured Streaming's stream-stream interval join,
  * which Spark SQL has no efficient batch operator for (a naive
  * `JOIN ON key AND t BETWEEN ...` plans as an equi-join on key with
  * the range as a post-filter, materializing the full quadratic per-key
  * candidate set first).
  *
  * Implemented as a bucketed equi-join: time is binned at the window
  * width, every left row's window then spans exactly two adjacent
  * buckets, so the left side is duplicated into those two (key, bucket)
  * rows and joined equi on (keys..., bucket) with an exact range filter
  * behind it. At 100 TB the shuffle key is (key, bucket) — a hot key's
  * rows still spread over time buckets, and the join degenerates to
  * quadratic only where the data truly is quadratic (same key, same
  * window). Cost is a constant 2x duplication of the (narrower) left
  * side, independent of window occupancy.
  */
object RangeJoin {

  /** Inner interval join. Returns every left row paired with every
    * matching right row; `rightTime` and each `payload` column arrive
    * suffixed. `loSec <= hiSec`, either may be negative (window reaching
    * back in time); `loSec == hiSec` is the degenerate exact-offset join
    * (right exactly `loSec` after left). Pre-epoch timestamps are safe:
    * bucket ids use truncating integer division, under which every
    * bucket still spans at least the window width, so a left row's
    * window touches at most two bucket ids — when they coincide (near
    * the epoch, or in the degenerate window) the duplicate is dropped
    * before the explode. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, loSec: Double, hiSec: Double,
      payload: Seq[String], suffix: String = "_r"): DataFrame = {
    require(hiSec >= loSec, "interval join window must have hi >= lo")
    val loUs = math.round(loSec * 1e6)
    val hiUs = math.round(hiSec * 1e6)
    val wUs = math.max(hiUs - loUs, 1L)
    // integer `div` for the bucket ids — double division rounds at the
    // bucket boundary (same 1-ulp hazard as the events() µs conversion)
    val l = left
      .withColumn("__lt__", unix_micros(col(leftTime).cast("timestamp")))
      .withColumn("__bkt__", explode(array_distinct(array(
        expr(s"(__lt__ + $loUs) div $wUs"),
        expr(s"(__lt__ + $hiUs) div $wUs")))))
    val r = right.select(
      keys.map(col) ++ Seq(
        unix_micros(col(rightTime).cast("timestamp")).as("__rt__"),
        struct(col(rightTime).cast("timestamp").as("__rts__") +:
          payload.map(col): _*).as("__p__")): _*)
      .withColumn("__bkt__", expr(s"__rt__ div $wUs"))
    val joined = l.join(r, keys :+ "__bkt__")
      .filter(col("__rt__") >= col("__lt__") + lit(loUs) &&
        col("__rt__") <= col("__lt__") + lit(hiUs))
      // the left row's (<= 2) bucket ids are DISTINCT after
      // array_distinct, and a right row carries exactly one bucket id,
      // so each qualifying pair is produced exactly once — no dedup
      .drop("__bkt__", "__lt__", "__rt__")
    val outCols = left.columns.map(col) ++
      (("__rts__", rightTime + suffix) +:
        payload.map(p => (p, p + suffix))).map { case (f, out) =>
        col(s"__p__.$f").as(out)
      }
    joined.select(outCols: _*)
  }
}
