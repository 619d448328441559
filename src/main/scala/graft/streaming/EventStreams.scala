package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Event-stream processing. Every transform is written against an
  * unbounded-friendly plan shape: the same function runs over a batch
  * DataFrame (for the DuckDB oracle) and a readStream DataFrame (tested
  * with the file source in scalatest). Watermarks bound state; windowed
  * aggregation is the one-shuffle partial/final pattern.
  */
object EventStreams {

  private val Dec = DecimalType(18, 2)

  /** value summed exactly as integer cents (round(v*100), the fixed-point
    * convention of StarQueries.cents): aggregation-order independent,
    * codegen'd long arithmetic instead of decimal buffers, and the final
    * /100.0 is correctly rounded — bit-matching the oracle. */
  private def sumCents(c: org.apache.spark.sql.Column) =
    sum(round(c * lit(100)).cast(LongType)) / lit(100.0)

  /** Tumbling 15-minute windows per event_type: count + exact sum.
    * Batch and streaming share this plan; on a stream, apply
    * withWatermark before calling. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sumCents(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming variant with a watermark bounding window state. */
  def tumblingCountsStream(events: DataFrame): DataFrame =
    tumblingCounts(events.withWatermark("ts", "30 minutes"))

  /** Sliding (hopping) windows: 15-minute windows every 5 minutes, so
    * each event contributes to exactly 3 windows. window() replicates
    * the event to its windows BEFORE the shuffle — the per-window state
    * is an agg buffer (map-side combined), not an event list, and the
    * streaming watermark closes windows whose end has passed. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "15 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sumCents(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming variant with a watermark bounding open-window state. */
  def slidingCountsStream(events: DataFrame): DataFrame =
    slidingCounts(events.withWatermark("ts", "30 minutes"))

  /** Windowed data-quality monitor — the quality_constraints idea as a
    * continuous check: per 15-minute tumbling window, violation counts
    * for negative values, out-of-domain event types, and null user ids.
    * The harness events are clean, so violations are PLANTED
    * deterministically from event_id arithmetic (identically in the
    * oracle — same device as text_pii): the counters exercised are the
    * real ones. State per open window is four longs; the watermark (in
    * [[qualityMonitorStream]]) bounds how many stay open. */
  def qualityMonitor(events: DataFrame): DataFrame = {
    val okTypes = Seq("click", "view", "purchase", "signup", "error")
    val tainted = events
      .withColumn("v",
        when(col("event_id") % 7 === 0, col("value") - lit(500.0))
          .otherwise(col("value")))
      .withColumn("et",
        when(col("event_id") % 13 === 0, concat(lit("bad_"), col("event_type")))
          .otherwise(col("event_type")))
      .withColumn("uid",
        when(col("event_id") % 11 === 0, lit(null).cast(LongType))
          .otherwise(col("user_id")))
    tainted
      .groupBy(window(col("ts"), "15 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("v") < 0, 1L).otherwise(0L)).as("n_neg_value"),
        sum(when(!col("et").isin(okTypes: _*), 1L).otherwise(0L))
          .as("n_bad_type"),
        sum(when(col("uid").isNull, 1L).otherwise(0L)).as("n_null_user"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("n_events"), col("n_neg_value"), col("n_bad_type"),
        col("n_null_user"))
  }

  /** Streaming variant: the same plan with a watermark — the batch
    * oracle (events_quality_window) certifies the counters, the
    * MemoryStream spec certifies the incremental execution. */
  def qualityMonitorStream(events: DataFrame): DataFrame =
    qualityMonitor(events.withWatermark("ts", "30 minutes"))

  /** Gap-based sessionization (30-minute inactivity) via window functions —
    * the batch formulation, ANSI-expressible for the oracle. */
  /** Epoch seconds for TIMESTAMP and TIMESTAMP_NTZ alike (NTZ cannot cast
    * straight to a number; via TIMESTAMP it can, and with a UTC session
    * the value is unchanged). */
  private def epochSec(c: org.apache.spark.sql.Column) =
    c.cast("timestamp").cast(LongType)

  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          epochSec(col("ts")) - epochSec(col("prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        (epochSec(max(col("ts"))) - epochSec(min(col("ts")))).as("duration_sec"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Streaming exact dedup: drop events whose dedup key was already seen,
    * with the watermark bounding the key state (keys older than the
    * watermark are evicted — the unbounded-state-safe formulation of
    * dropDuplicates on a stream). Works identically on a batch frame. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Click attribution: each click joined to the same user's views in
    * the preceding `windowMinutes` (inclusive interval join). The plan
    * shape runs identically as a batch range join and as a
    * stream-stream join; for streams both sides need a watermark first
    * (see clickAttributionStream). */
  def clickAttribution(clicks: DataFrame, views: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("ts").as("c_ts"))
    val v = views.select(col("user_id").as("v_user"),
      col("event_id").as("view_id"), col("ts").as("v_ts"))
    c.join(v,
      col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
  }

  /** Streaming variant: watermarks on both sides bound the join state to
    * the interval width (Spark evicts buffered rows older than
    * watermark - window). */
  def clickAttributionStream(events: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val wm = s"${windowMinutes * 2} minutes"
    val clicks = events.filter(col("event_type") === "click").withWatermark("ts", wm)
    val views = events.filter(col("event_type") === "view").withWatermark("ts", wm)
    clickAttribution(clicks, views, windowMinutes)
  }

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionOut(user_id: Long, session_start: Long, n_events: Long,
      duration_sec: Long)
  // not `private`: the state encoder's generated serializer needs
  // bytecode-level access to the accessors
  final case class SessionState(start: Long, lastTs: Long, n: Long)

  final case class TransitionOut(user_id: Long, from_type: String, to_type: String)
  // not `private`: state encoder access, same as SessionState.
  // `tsMicros` is epoch MICROseconds — the corpus timestamps are
  // micro-precision, so this is full fidelity, unlike the ms-truncated
  // getTime a previous revision stored (which made the straggler
  // comparison disagree with the sort for same-millisecond events).
  final case class LastEvent(tsMicros: Long, eventId: Long, etype: String)

  /** THE event order: epoch micros + event_id — one definition shared by
    * every intra-batch sort and the cross-batch straggler comparison, so
    * the keys cannot drift apart (they did once: a sort gained sub-ms
    * precision the state comparison lacked). Matches the batch
    * formulations' ORDER BY (ts, event_id) exactly at the corpus's
    * micro-precision. */
  private def evMicros(e: Ev): Long =
    e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
  private def evOrderKey(e: Ev): (Long, Long) = (evMicros(e), e.event_id)

  /** Streaming event-type transitions: per incoming event, emit the
    * (previous type -> this type) pair for its user — the incremental
    * form of the events_transitions batch lag window. State is ONE small
    * record per user (the last event seen), i.e. bounded by user
    * cardinality, not stream length; a count aggregation downstream
    * maintains the live Markov transition matrix. Batch-equivalent for
    * in-order delivery per user: the micro-batch sort (full Timestamp
    * precision + event_id — the same total order as the batch lag
    * window) handles intra-batch disorder, and a CROSS-batch straggler
    * older than the stored state is DROPPED rather than emitted as a
    * time-reversed transition the batch form would never produce (the
    * stored (ts, event_id) exists precisely for this comparison; the
    * alternatives — emitting it out of order or regressing state — both
    * corrupt the downstream matrix). */
  def transitionsStream(events: Dataset[Ev]): Dataset[TransitionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[LastEvent]) => {
          val sorted = evs.toSeq.sortBy(evOrderKey)
          var last = state.getOption
          val out = Seq.newBuilder[TransitionOut]
          sorted.foreach { e =>
            val m = evMicros(e)
            // SAME key as the sort — state comparison and sort order
            // must agree or in-order events get misclassified
            val inOrder = last.forall(l =>
              l.tsMicros < m || (l.tsMicros == m && l.eventId < e.event_id))
            if (inOrder) {
              last.foreach(l => out += TransitionOut(userId, l.etype, e.event_type))
              last = Some(LastEvent(m, e.event_id, e.event_type))
            } // else: cross-batch straggler — drop, keep the newer state
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }

  /** Streaming sessionization with explicit state
    * (flatMapGroupsWithState + event-time timeout): emits a session when
    * the inactivity gap elapses. The custom-state capability lock —
    * semantics mirror sessionize() for in-order events. */
  def sessionizeStream(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) => {
          if (evs.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start, s.n, (s.lastTs - s.start) / 1000))
          } else {
            val sorted = evs.toSeq.sortBy(evOrderKey)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // cross-batch straggler inside the current session's span:
                // count it, but NEVER regress lastTs — moving it backwards
                // would shrink the timeout and close the session early
                // (the time-reversed analogue of the transitions fix)
                case Some(s) if t < s.lastTs =>
                  if (t >= s.start) cur = Some(s.copy(n = s.n + 1))
                // else: predates the open session entirely — the batch
                // form would have merged it into an earlier, already-
                // emitted session; unrecoverable in append mode, drop
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(s.copy(lastTs = t, n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.start, s.n, (s.lastTs - s.start) / 1000)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.reverseIterator
          }
        })
  }
}
