package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Tagged input event for [[Streams.streamingAsOf]]: side 0 = right
  * (reference) stream, side 1 = left (probe) stream. `tsMs` is event
  * time in epoch millis; `tiebreak` disambiguates equal-time right
  * events (largest wins, matching [[graft.ext.AsOf.joinBackward]]). */
case class AsOfEvent(key: String, tsMs: Long, side: Int, tiebreak: Long,
  value: Double)

/** One probe event with its as-of match (None = no right event at or
  * before it was retained). */
case class AsOfJoined(key: String, tsMs: Long, value: Double,
  matchTsMs: Option[Long], matchValue: Option[Double])

/** Per-key state: retained right events, newest-first. */
case class AsOfBuffer(rights: List[(Long, Long, Double)])

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

  /** Streaming backward as-of enrichment: every left (side 1) event is
    * emitted with the most recent right (side 0) event at-or-before it
    * on the same key — continuous feature alignment, the streaming
    * counterpart of [[graft.ext.AsOf.joinBackward]] (which it equals
    * exactly on in-order input; a golden spec pins this).
    *
    * Custom state via `flatMapGroupsWithState`: per key, the retained
    * right events (newest-first). Each micro-batch's events are
    * processed in (ts, side, tiebreak) order, so a right event AT a
    * left event's timestamp matches (inclusive <=) and equal-time
    * rights resolve to the largest tiebreak — batch semantics.
    *
    * State is bounded: rights older than `lookbackMs` below the current
    * event-time watermark are evicted, except the single newest right,
    * which stays forever (it remains the valid match for every future
    * left event — one record per key, the same bound as any keyed
    * aggregation). Define a watermark on the event-time column upstream
    * or state never shrinks past one retained buffer. The documented
    * streaming caveat: a right event arriving in a LATER micro-batch
    * than a left event it should have matched cannot retro-match it —
    * disorder is only absorbed within a micro-batch (plus the buffer),
    * the standard watermark tradeoff. */
  def streamingAsOf(events: Dataset[AsOfEvent],
      lookbackMs: Long = 3600000L): Dataset[AsOfJoined] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfBuffer, AsOfJoined](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[AsOfEvent], state: GroupState[AsOfBuffer]) =>
          var rights = state.getOption.map(_.rights).getOrElse(Nil)
          val out = List.newBuilder[AsOfJoined]
          it.toSeq.sortBy(e => (e.tsMs, e.side, e.tiebreak)).foreach { e =>
            if (e.side == 0) {
              // splice into the (already newest-first) buffer instead of
              // re-sorting it per insert: the batch is processed in
              // ascending event order, so the prefix of strictly-newer
              // entries is almost always empty and the insert is O(1);
              // an out-of-order right pays only its displacement
              val entry = (e.tsMs, e.tiebreak, e.value)
              val (newer, older) = rights.span(r =>
                r._1 > e.tsMs || (r._1 == e.tsMs && r._2 > e.tiebreak))
              rights = newer ::: (entry :: older)
            } else {
              val m = rights.find(_._1 <= e.tsMs)
              out += AsOfJoined(key, e.tsMs, e.value, m.map(_._1), m.map(_._3))
            }
          }
          // batch mode / no-watermark streams have no watermark to read:
          // retain everything (bounded by the input itself)
          val horizon =
            try state.getCurrentWatermarkMs() - lookbackMs
            catch { case _: UnsupportedOperationException => Long.MinValue }
          val kept = rights match {
            case newest :: rest => newest :: rest.filter(_._1 >= horizon)
            case Nil => Nil
          }
          if (kept.nonEmpty) state.update(AsOfBuffer(kept)) else state.remove()
          out.result().iterator
      }
  }
}
