package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import EventStreams.Event

/** Streaming semantics under test with MemoryStream: incremental window
  * aggregation, watermark-driven late-data drop, and custom-state
  * sessionization with event-time timeout.
  */
class EventStreamsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private def ev(id: Long, t: Timestamp, user: Long = 1L,
                 typ: String = "click", v: Double = 1.0): Event =
    Event(id, t, user, typ, v)

  private def runAll(q: StreamingQuery): Unit = {
    q.processAllAvailable()
  }

  test("tumbling window aggregates incrementally and drops late data") {
    val spark2 = spark
    import spark2.implicits._
    val input = MemoryStream[Event](spark2)
    val q = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      // batch 1: two events in hour 10, one in hour 11
      input.addData(ev(1, ts(10, 5)), ev(2, ts(10, 40)), ev(3, ts(11, 10)))
      runAll(q)
      // watermark = max(ts) - 2h = 09:10 → nothing finalized yet (append)
      assert(spark.table("tumbling").count() === 0)

      // batch 2: advance event time to 14:00 → watermark 12:00 closes
      // hours 10 and 11
      input.addData(ev(4, ts(14)))
      runAll(q)
      // one more empty batch lets the state-store emit settle
      input.addData(ev(5, ts(14, 1)))
      runAll(q)
      val closed = spark.table("tumbling")
        .select("window_start", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(closed(ts(10)) === 2L)
      assert(closed(ts(11)) === 1L)

      // batch 3: a LATE row for hour 10 (behind the 12:00 watermark) must
      // be dropped — the closed window's count must not change
      input.addData(ev(6, ts(10, 50)), ev(7, ts(14, 30)))
      runAll(q)
      val after = spark.table("tumbling")
        .select("window_start", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(after(ts(10)) === 2L, "late row behind watermark must be dropped")
    } finally q.stop()
  }

  test("stateful sessionization emits sessions on event-time timeout") {
    val spark2 = spark
    import spark2.implicits._
    val input = MemoryStream[Event](spark2)
    val q = EventStreams.sessionizeStateful(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 10:00 and 10:30 (one session);
      // user 2: event at 10:15
      input.addData(ev(1, ts(10), 1), ev(2, ts(10, 30), 1), ev(3, ts(10, 15), 2))
      runAll(q)
      assert(spark.table("sessions").count() === 0)

      // advance watermark far past last+gap (12:30): both sessions time out
      input.addData(ev(4, ts(20), 3))
      runAll(q)
      input.addData(ev(5, ts(20, 1), 3))
      runAll(q)
      val rows = spark.table("sessions")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3))).toSet
      assert(rows.contains((1L, ts(10), ts(10, 30), 2L)))
      assert(rows.contains((2L, ts(10, 15), ts(10, 15), 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated digests and keeps distinct rows") {
    val spark2 = spark
    import spark2.implicits._
    val input = MemoryStream[Event](spark2)
    val q = EventStreams.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      // rows 1 and 2 share (user, type, value) → one digest survives;
      // row 3 differs in value → kept
      input.addData(ev(1, ts(10), 1, "click", 5.0), ev(2, ts(10, 30), 1, "click", 5.0),
        ev(3, ts(10, 40), 1, "click", 7.0))
      runAll(q)
      assert(spark.table("dedup").count() === 2)

      // same digest again within the watermark horizon → still suppressed
      input.addData(ev(4, ts(11), 1, "click", 5.0))
      runAll(q)
      assert(spark.table("dedup").count() === 2)
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks within the hour before a purchase") {
    val spark2 = spark
    import spark2.implicits._
    val input = MemoryStream[Event](spark2)
    val q = EventStreams.purchaseAttribution(input.toDF())
      .writeStream.format("memory").queryName("attribution")
      .outputMode("append").start()
    try {
      input.addData(
        ev(1, ts(8), 1, "click"),       // 2.5h before purchase → outside window
        ev(2, ts(10), 1, "click"),      // 30min before → match
        ev(3, ts(10, 15), 1, "click"),  // 15min before → match
        ev(4, ts(10, 30), 1, "purchase"),
        ev(5, ts(10, 20), 2, "click"),  // other user → no match
        ev(6, ts(11), 3, "purchase"))   // no clicks for user 3
      runAll(q)
      val rows = spark.table("attribution")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((4L, 2L), (4L, 3L)))
    } finally q.stop()
  }

  test("in-batch gap split: events farther apart than the gap form two sessions") {
    val spark2 = spark
    import spark2.implicits._
    val input = MemoryStream[Event](spark2)
    val q = EventStreams.sessionizeStateful(input.toDS())
      .writeStream.format("memory").queryName("sessions2")
      .outputMode("append").start()
    try {
      // 08:00 and 11:00 are 3h apart (> 2h gap) → first session closes
      // immediately within the batch
      input.addData(ev(1, ts(8), 7), ev(2, ts(11), 7))
      runAll(q)
      val rows = spark.table("sessions2")
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq === Seq((7L, 1L)))
    } finally q.stop()
  }

  test("q214's trailing-window state model matches the real stream-stream join state") {
    // The q214/q236 claim, executed: q214 budgets stream-state as "rows
    // whose event time is inside the trailing watermark window of the
    // running max event time". Here the q236-shaped join (clicks within
    // the hour before a purchase, 2h watermarks) runs for real on a
    // MemoryStream, and StreamingQueryProgress.stateOperators is
    // asserted against that model with EXACT bounds:
    //  - purchases retained  iff p_ts >= wm       (all earlier clicks arrived)
    //  - clicks retained     iff c_ts >= wm - 1h  (may match a purchase 1h later)
    // evaluated at the two watermarks that bracket the final batch (state
    // cleanup in batch N uses the watermark computed after batch N-1).
    val spark2 = spark
    import spark2.implicits._
    val input = MemoryStream[Event](spark2)
    val q = EventStreams.purchaseAttribution(input.toDF())
      .writeStream.format("memory").queryName("statebudget")
      .outputMode("append").start()
    def mk(i: Int) = ev(i.toLong,
      new Timestamp(ts(8).getTime + i * 30000L), (i % 3).toLong,
      if (i % 2 == 0) "click" else "purchase")
    def wmMs(p: org.apache.spark.sql.streaming.StreamingQueryProgress): Long =
      java.time.Instant.parse(p.eventTime.get("watermark")).toEpochMilli
    try {
      input.addData((0 until 180).map(mk): _*)
      runAll(q)
      input.addData((180 until 240).map(mk): _*)
      runAll(q)
      // sentinel at i=400 (11:20): advances the watermark to 09:20 —
      // INSIDE the bulk, so the eviction frontier splits it nontrivially
      input.addData(mk(400))
      runAll(q)
      // the next batch RUNS the eviction at that watermark; its progress
      // reports the watermark it evicted WITH
      input.addData(mk(401))
      runAll(q)
      val prog = q.lastProgress
      val observed = prog.stateOperators.apply(0).numRowsTotal
      val wmUsed = wmMs(prog)
      assert(wmUsed > ts(8).getTime, "sentinel must have advanced the watermark")
      assert(wmUsed < mk(239).ts.getTime, "frontier must split the bulk")

      val all = ((0 until 240) ++ Seq(400, 401)).map(mk)
      def model(wm: Long): Long =
        all.count(e => e.event_type == "purchase" && e.ts.getTime >= wm) +
          all.count(e => e.event_type == "click" && e.ts.getTime >= wm - 3600000L)
      // boundary rows (ts exactly AT a frontier) may fall either side of
      // Spark's internal </<= choice — the one exactness caveat
      val boundary = all.count(e =>
        (e.event_type == "purchase" && e.ts.getTime == wmUsed) ||
        (e.event_type == "click" && e.ts.getTime == wmUsed - 3600000L))
      assert(observed <= model(wmUsed) && observed >= model(wmUsed) - boundary,
        s"state $observed outside [${model(wmUsed) - boundary}, ${model(wmUsed)}] " +
        s"(wmUsed=$wmUsed, boundary=$boundary)")
      println(s"[q214-validate] observed=$observed model=${model(wmUsed)} " +
        s"boundary=$boundary wmUsed=$wmUsed")
    } finally q.stop()
  }

  test("stream-static enrichment joins the broadcast dimension per micro-batch") {
    val spark2 = spark
    import spark2.implicits._
    val dim = Seq((1L, "fr"), (2L, "de")).toDF("user_id", "nation")
    val input = MemoryStream[Event](spark2)
    val q = EventStreams.enrichWithDim(input.toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      // user 3 has no dim row — left join must keep it with a null nation
      input.addData(ev(1, ts(10), user = 1L), ev(2, ts(10, 5), user = 3L))
      runAll(q)
      val got = spark.table("enriched")
        .select("event_id", "nation").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got === Map(1L -> Some("fr"), 2L -> None))
    } finally q.stop()
  }
}
