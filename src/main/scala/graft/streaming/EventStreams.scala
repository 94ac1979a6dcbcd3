package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming transforms over the `events` schema
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference is batch-on-a-timer (reference `src/main.rs:388-411`), so
  * streaming is pure extension layer — but the operators are the streaming
  * twins of declared batch queries (q31 tumbling, q33 session), built so the
  * SAME aggregation logic runs incrementally:
  *  - watermarks bound state: late rows beyond the watermark are dropped and
  *    closed windows are evicted, so state size is O(open windows), not
  *    O(history) — the property that lets the query run forever at scale;
  *  - `session_window` + watermark gives merge-on-overlap sessionization
  *    with eviction;
  *  - [[sessionizeStateful]] shows the custom-state escape hatch
  *    (`flatMapGroupsWithState` with event-time timeout) for session logic
  *    the built-in can't express (e.g. emitting per-session features).
  *
  * All transforms are readStream/writeStream-agnostic: they take the input
  * DataFrame (batch or streaming) so tests drive them from MemoryStream and
  * production from any source.
  */
object EventStreams {

  /** Tumbling 1-hour counts with a 2-hour watermark (streaming twin of
    * q31_window_tumbling). Append-mode capable: windows finalize once the
    * watermark passes window end.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .withColumn("cents", floor(col("value") * 100))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_cents"))

  /** Sliding 1-hour windows every 15 minutes (each event lands in 4
    * windows — Spark plans this as an Expand, state is 4× tumbling).
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Session windows with a 2-hour gap (streaming twin of
    * q33_session_window).
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .withColumn("cents", floor(col("value") * 100))
      .groupBy(session_window(col("ts"), "2 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_cents"))

  /** Streaming exact deduplication (the streaming twin of batch
    * `q40_dedup_exact`): drop rows repeating a content digest, with the
    * dedup state BOUNDED by the watermark — `dropDuplicatesWithinWatermark`
    * evicts digests once the watermark passes them, so state is O(rows per
    * watermark horizon), not O(stream history). This is the only shape
    * that lets an ingest-dedup stage run forever at 100 TB/day; the
    * digest is computed map-side exactly like the batch pipeline's.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .withColumn("digest",
        md5(concat_ws("|", col("user_id"), col("event_type"), col("value"))))
      .dropDuplicatesWithinWatermark("digest")

  /** Stream-stream INTERVAL join: attribute each purchase to the same
    * user's clicks within the preceding hour. Both sides are unbounded
    * streams, so each buffers rows in join state; the watermark plus the
    * two-sided time-range predicate are what let Spark evict that state
    * (clicks older than watermark − 1 h can never match a future
    * purchase) — without them the state grows with the stream. Inner
    * matches emit immediately in append mode; the batch as-of twin is
    * `ops.AsOf` (latest-one semantics vs. all-in-window here).
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select("purchase_id", "user_id", "p_ts", "click_id", "c_ts")
  }

  /** Stream-STATIC enrichment join: decorate each streamed event with a
    * slowly-changing dimension (user → nation/segment). Stateless — the
    * static side is re-planned per micro-batch (so dimension updates are
    * picked up between batches) and broadcast when small, exactly the
    * dimension-enrichment every event pipeline runs before sinking. No
    * watermark needed: nothing is buffered across batches.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(start: Long, last: Long, n: Long)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** Custom-state sessionization: one `SessionState` per user, sessions
    * emitted when the event-time watermark passes last-event + gap
    * (EventTimeTimeout). State is O(active users) — the bound that makes
    * arbitrary stateful logic safe on an unbounded stream.
    */
  def sessionizeStateful(events: Dataset[Event],
                         gapMs: Long = 2 * 3600 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, rows: Iterator[Event],
           state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(
          Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n))
      } else {
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var cur = state.getOption
        val closed = Seq.newBuilder[Session]
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last < gapMs =>
              cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
            case Some(s) =>
              closed += Session(userId, new Timestamp(s.start),
                new Timestamp(s.last), s.n)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
