package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over an event stream shaped like the
  * `events` table (`user_id, ts, event_type`): watermarked windowed
  * aggregation and stateful sessionization — the streaming versions of
  * the batch `q_events_hourly` / `q_events_sessions` queries.
  *
  * Scale design: both operators shuffle once on their natural key
  * (window/event key; user_id), and state is bounded by the watermark
  * — late data beyond it is dropped and its state evicted, so state
  * stores stay O(active keys) regardless of stream length.
  */
object EventStreams {

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  case class Session(user_id: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, n_events: Long)

  // public: the state encoder's generated code constructs instances
  case class SessionState(startMs: Long, endMs: Long, n: Long)

  /** Tumbling hourly counts per event type with a 1-hour watermark —
    * `readStream → withWatermark → groupBy(window) → writeStream`. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))

  /** Watermarked streaming dedup — `dropDuplicatesWithinWatermark`
    * keyed on the event identity (user, type, minute). State holds one
    * entry per distinct key seen inside the watermark horizon and is
    * evicted as the watermark advances, so it stays O(recent keys) on
    * an unbounded stream — the streaming twin of exact dedup. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withColumn("minute", date_trunc("minute", col("ts")))
      .withWatermark("minute", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "minute")

  /** Stream-stream attribution join: each purchase matches the same
    * user's clicks in the preceding hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so Spark can
    * evict join state once the watermark passes — without the interval
    * bound, stream-stream join state grows forever. One shuffle per
    * side, on the join key. */
  def attribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(clicks,
        col("c_user") === col("user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("purchase_ts"), col("click_ts"))
  }

  /** SLIDING hourly counts: each event lands in every 1-hour window
    * that covers it (15-min slide ⇒ 4 windows per event). Same
    * watermark eviction as the tumbling variant; state is 4× the
    * active-window count, still bounded. Batch twin:
    * `q_events_sliding`. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Stream-static enrichment join: the event stream joins a customer
    * dimension loaded as a STATIC DataFrame. Stateless — no watermark
    * and no join state, because the static side is simply re-planned
    * (and with `broadcast`, re-shipped) each micro-batch, which is
    * also what makes a slowly-changing dimension pick up updates
    * between batches. The stream side never shuffles: the dim hashes
    * into every task. Batch twin: `q_events_enrich`. */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(broadcast(customers),
        events("user_id") === customers("c_custkey"))
      .select(events("user_id"), col("ts"), col("event_type"),
        col("c_mktsegment"))

  /** Gap-based sessionization via flatMapGroupsWithState: events of a
    * user belong to one session while gaps stay under `gap`; a session
    * closes (and is emitted downstream, append mode) when the
    * watermark passes its end + gap. State per user is three longs. */
  def sessionize(events: Dataset[Event],
      gap: java.time.Duration): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gap.toMillis

    def fn(userId: Long, evs: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      def toSession(s: SessionState) = Session(userId,
        new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n)
      if (state.hasTimedOut) {
        val out = state.getOption.map(toSession).iterator
        state.remove()
        return out
      }
      // fold this batch's events (in ts order) into sessions; emit the
      // ones already closed by a later event, keep the open one
      val sorted = evs.toSeq.sortBy(_.ts.getTime)
      var cur = state.getOption
      val closed = Seq.newBuilder[Session]
      for (e <- sorted) {
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.endMs <= gapMs =>
            cur = Some(s.copy(endMs = math.max(s.endMs, t), n = s.n + 1))
          case Some(s) =>
            closed += toSession(s)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp(s.endMs + gapMs)
        case None => ()
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
