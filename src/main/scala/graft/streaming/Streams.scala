package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-ready event aggregations. The reference engine
  * is batch-only (SURVEY §1.1), so these are engine extensions: each
  * transform is written against an unbounded-safe subset of operations
  * (event-time tumbling windows + watermarks, no global sorts), so the
  * SAME function runs over a batch DataFrame (driver oracle checks) or a
  * readStream source (see StreamingSpec).
  */
object Streams {

  /** Tumbling-window counts and value stats by event type. On a
    * streaming input, append mode with the given watermark; on a batch
    * input, identical results. */
  def windowedEventStats(events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "2 hours", streaming: Boolean = false): DataFrame = {
    val src = if (streaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        avg(col("value")).as("avg_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("avg_value"))
  }

  /** Streaming analog of the D8 total gap: per event-time window, the
    * difference in mean value between two levels of a group column.
    * Conditional aggregates are append-safe, so the same decomposition
    * headline metric runs continuously over a stream. */
  def windowedGroupGap(events: DataFrame, groupCol: String, levelA: String,
      levelB: String, valueCol: String, windowLength: String = "1 hour",
      watermark: String = "2 hours", streaming: Boolean = false): DataFrame = {
    val src = if (streaming) events.withWatermark("ts", watermark) else events
    val g = col(groupCol).cast("string")
    val v = col(valueCol).cast("double")
    src.groupBy(window(col("ts"), windowLength).as("w"))
      .agg(
        avg(when(g === levelA, v)).as("mean_a"),
        avg(when(g === levelB, v)).as("mean_b"),
        sum(when(g === levelA, 1L).otherwise(0L)).as("n_a"),
        sum(when(g === levelB, 1L).otherwise(0L)).as("n_b"))
      .select(col("w.start").as("window_start"),
        (col("mean_a") - col("mean_b")).as("gap"),
        col("mean_a"), col("mean_b"), col("n_a"), col("n_b"))
  }

  /** Per-user session counts with a fixed gap encoded as a tumbling
    * session-window approximation (session_window is also available on
    * streams; this variant stays append-safe). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      streaming: Boolean = false): DataFrame = {
    val src = if (streaming) events.withWatermark("ts", "2 hours") else events
    src.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("user_id"), col("n_events"))
  }

  /** Streaming exact dedup for continuous ingestion: keep the first
    * record per key, with state bounded by the event-time watermark —
    * `dropDuplicatesWithinWatermark` keeps a key's state only until the
    * watermark passes its event time, so the state store cannot grow
    * without bound (the unbounded-state `dropDuplicates` is the batch
    * path). `keyCols` is typically a content hash (e.g. md5(text), the
    * exact-dedup key of [[graft.ext.Dedup.exactDuplicates]]); `tsCol`
    * must be the event-time column. Duplicates arriving later than the
    * watermark delay are NOT caught — that is the documented tradeoff
    * that bounds state at 100 TB/day ingest. */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", watermark: String = "2 hours",
      streaming: Boolean = true): DataFrame =
    if (streaming)
      events.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)
}
