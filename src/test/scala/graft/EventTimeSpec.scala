package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventTimeStreams

/** Event-time semantics: batch operators are oracle-gated (x13-x15 in
  * EventTimeQueries); this spec covers the STREAMING side — watermarked
  * tumbling windows with late-data drop — and the RangeJoin bucket
  * arithmetic edges.
  */
class EventTimeSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("streaming tumbling window: watermark drops late rows, append emits finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = EventTimeStreams.tumblingAgg(
      in.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", "value", windowLen = "5 minutes",
      watermarkDelay = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("etw")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two in [10:00,10:05), one in [10:05,10:10)
      in.addData((ts("10:00"), "click", 1.0), (ts("10:01"), "click", 2.5),
        (ts("10:06"), "click", 4.0))
      q.processAllAvailable() // watermark -> 09:56; nothing finalized
      // batch 2: 10:30 advances watermark to 10:20; 09:00 is LATE (beyond
      // watermark) and must be dropped — were it accepted, its window
      // [09:00,09:05) would finalize below and appear in the sink
      in.addData((ts("10:30"), "click", 8.0), (ts("09:00"), "click", 100.0))
      q.processAllAvailable() // emits windows ending <= 10:20
      // batch 3: advance watermark past 10:35 to flush [10:30,10:35)
      in.addData((ts("10:50"), "click", 16.0))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("etw")
      .select($"window_start".cast("string"), $"cnt", $"amount_cents")
      .as[(String, Long, Long)].collect()
      .map { case (w, c, a) => w -> ((c, a)) }.toMap
    assert(out.get("2024-01-01 10:00:00").contains((2L, 350L)))
    assert(out.get("2024-01-01 10:05:00").contains((1L, 400L)))
    assert(out.get("2024-01-01 10:30:00").contains((1L, 800L)))
    assert(!out.keys.exists(_.startsWith("2024-01-01 09:")),
      "late row beyond the watermark must be dropped")
  }

  test("streaming hopping window: each event lands in size/slide overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = EventTimeStreams.hoppingAgg(
      in.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", "value", windowLen = "10 minutes",
      slide = "5 minutes", watermarkDelay = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("ehop")
      .outputMode(OutputMode.Append()).start()
    try {
      // 10:06 belongs to [10:00,10:10) and [10:05,10:15)
      in.addData((ts("10:06"), "click", 2.0), (ts("10:02"), "click", 1.0))
      q.processAllAvailable()
      in.addData((ts("11:00"), "click", 8.0)) // flush via watermark
      q.processAllAvailable()
      in.addData((ts("11:30"), "click", 4.0))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("ehop")
      .select($"window_start".cast("string"), $"cnt", $"amount_cents")
      .as[(String, Long, Long)].collect()
      .map { case (w, c, a) => w -> ((c, a)) }.toMap
    // 10:02 -> [09:55,10:05)+[10:00,10:10); 10:06 -> [10:00,10:10)+[10:05,10:15)
    assert(out.get("2024-01-01 09:55:00").contains((1L, 100L)))
    assert(out.get("2024-01-01 10:00:00").contains((2L, 300L)))
    assert(out.get("2024-01-01 10:05:00").contains((1L, 200L)))
  }

  test("stream-stream interval join: matches inside the window, evicts outside") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val signups = MemoryStream[(Long, Timestamp, String)]
    val joined = EventTimeStreams.intervalJoin(
      clicks.toDF().toDF("c_uid", "c_ts", "c_id"),
      signups.toDF().toDF("s_uid", "s_ts", "s_id"),
      "c_uid", "s_uid", "c_ts", "s_ts",
      watermarkDelay = "5 minutes", within = "30 minutes")
    val q = joined.select($"c_id", $"s_id").writeStream.format("memory")
      .queryName("ssj").outputMode(OutputMode.Append()).start()
    try {
      // signup at 10:10 inside click@10:00's +30min window; 11:00 outside
      clicks.addData((1L, ts("10:00"), "c1"), (2L, ts("10:00"), "c2"))
      signups.addData((1L, ts("10:10"), "s1"), (2L, ts("11:00"), "s2"))
      q.processAllAvailable()
      // a later signup for user 1 still inside the window, across batches
      signups.addData((1L, ts("10:25"), "s3"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("ssj").as[(String, String)].collect().toSet
    assert(out === Set(("c1", "s1"), ("c1", "s3")))
  }

  test("streaming dedup: duplicates within the watermark horizon dropped, expired keys re-emit") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val deduped = EventTimeStreams.streamingDedup(
      in.toDF().toDF("ts", "key", "value"),
      keyCols = Seq("key"), tsCol = "ts", watermarkDelay = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdd")
      .outputMode(OutputMode.Append()).start()
    try {
      // first occurrence emitted; in-horizon duplicate dropped
      in.addData((ts("10:00"), "a", 1.0), (ts("10:01"), "a", 2.0),
        (ts("10:00"), "b", 3.0))
      q.processAllAvailable()
      // same batch-to-batch: still within horizon -> dropped
      in.addData((ts("10:02"), "a", 4.0))
      q.processAllAvailable()
      // advance watermark far past a's expiry (10:00 + 10min)
      in.addData((ts("11:00"), "c", 5.0))
      q.processAllAvailable()
      // a's state expired: re-emitted (the documented horizon contract)
      in.addData((ts("11:05"), "a", 6.0))
      q.processAllAvailable()
    } finally q.stop()
    val vals = spark.table("sdd").select($"key", $"value")
      .as[(String, Double)].collect().sorted.toSeq
    assert(vals === Seq(("a", 1.0), ("a", 6.0), ("b", 3.0), ("c", 5.0)))
  }

  test("streaming gap sessionization: explicit close on gap, timeout close on watermark") {
    import EventTimeStreams.{ClosedSession, SessionEvent}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val sessions = EventTimeStreams.gapSessions(in.toDS(),
      gapMs = 30 * 60 * 1000, watermarkDelay = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 10 min apart (one session); user 2: one event
      in.addData(SessionEvent(1, ts("10:00"), 100),
        SessionEvent(1, ts("10:10"), 200), SessionEvent(2, ts("10:05"), 50))
      q.processAllAvailable()
      // 12:00 for user 1 is >30min past 10:10: closes [10:00,10:10]
      // explicitly and opens a new session. Watermark -> 11:50, past
      // user 2's 10:05+30min: user 2 times out NEXT batch.
      in.addData(SessionEvent(1, ts("12:00"), 400))
      q.processAllAvailable()
      // any batch triggers the pending user-2 timeout
      in.addData(SessionEvent(99, ts("12:01"), 1))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("sess").as[ClosedSession].collect()
      .map(c => (c.userId, c.sessionStart.toString, c.sessionEnd.toString,
        c.cnt, c.amountCents)).toSet
    assert(out === Set(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L, 300L),
      (2L, "2024-01-01 10:05:00.0", "2024-01-01 10:05:00.0", 1L, 50L)))
  }

  test("streaming gap sessionization: batch-internal gap splits sessions in event-time order") {
    import EventTimeStreams.{ClosedSession, SessionEvent}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val sessions = EventTimeStreams.gapSessions(in.toDS(),
      gapMs = 30 * 60 * 1000, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess2")
      .outputMode(OutputMode.Append()).start()
    try {
      // one batch, out of order: sessions [09:00,09:10] and [11:00]
      in.addData(SessionEvent(7, ts("11:00"), 8), SessionEvent(7, ts("09:00"), 1),
        SessionEvent(7, ts("09:10"), 2))
      q.processAllAvailable()
      // watermark (11:00 after batch 1) passes 09:10+30min on the next
      // batch: the early session times out; 11:15 keeps the watermark
      // below 11:00+gap so [11:00] stays open (even through the engine's
      // no-data timeout batch)
      in.addData(SessionEvent(8, ts("11:15"), 1))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sess2").as[ClosedSession].collect()
      .map(c => (c.sessionStart.toString, c.cnt, c.amountCents)).toSet
    // only the FIRST session closes (the 11:00 one stays open in state)
    assert(out === Set(("2024-01-01 09:00:00.0", 2L, 3L)))
  }

  test("streaming gap sessionization: a late event bridges two open sessions") {
    import EventTimeStreams.{ClosedSession, SessionEvent}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val sessions = EventTimeStreams.gapSessions(in.toDS(),
      gapMs = 30 * 60 * 1000, watermarkDelay = "2 hours")
    val q = sessions.writeStream.format("memory").queryName("sess3")
      .outputMode(OutputMode.Append()).start()
    try {
      // 09:00 and 10:00 are >30min apart: two OPEN sessions
      in.addData(SessionEvent(5, ts("09:00"), 1), SessionEvent(5, ts("10:00"), 4))
      q.processAllAvailable()
      // 09:30 arrives late (inside the 2h watermark): within 30min of
      // BOTH — must merge them into one [09:00,10:00] session, which is
      // exactly why observing 10:00 must not close [09:00,09:00]
      in.addData(SessionEvent(5, ts("09:30"), 2))
      q.processAllAvailable()
      // advance the watermark past 10:30 to flush the merged session
      in.addData(SessionEvent(9, ts("13:00"), 1))
      q.processAllAvailable()
      in.addData(SessionEvent(9, ts("13:30"), 1))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sess3").as[ClosedSession].collect()
      .filter(_.userId == 5)
      .map(c => (c.sessionStart.toString, c.sessionEnd.toString,
        c.cnt, c.amountCents)).toSet
    assert(out === Set(("2024-01-01 09:00:00.0", "2024-01-01 10:00:00.0", 3L, 7L)))
  }

  test("streaming windowed approx-distinct: sketch state, once-per-window, late drop") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val out = EventTimeStreams.tumblingApproxDistinct(
      in.toDS().toDF("ts", "k", "uid"), "ts", "k", "uid",
      windowLen = "1 hour", watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("adist")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [10:00, 11:00): key a sees users 1,2,2,3 (3 distinct,
      // spread across two batches — the sketch must MERGE); key b sees 1
      in.addData((ts("10:05"), "a", 1L), (ts("10:10"), "a", 2L),
        (ts("10:20"), "b", 1L))
      q.processAllAvailable()
      in.addData((ts("10:30"), "a", 2L), (ts("10:40"), "a", 3L))
      q.processAllAvailable()
      assert(spark.table("adist").count() === 0,
        "append mode: nothing before the watermark closes the window")
      // advance watermark past 11:00; a late 10:50 row must then drop
      in.addData((ts("11:30"), "z", 9L))
      q.processAllAvailable()
      in.addData((ts("10:50"), "a", 4L), (ts("11:40"), "z", 9L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("adist")
      .select("k", "approx_distinct").as[(String, Long)].collect().toMap
    // HLL++ is exact at these cardinalities
    assert(got === Map("a" -> 3L, "b" -> 1L),
      s"late user 4 must not inflate the closed window, got $got")
  }

  test("streaming funnel: out-of-order completion, window-close finality, at-most-once") {
    import EventTimeStreams.{FunnelCompletion, FunnelEvent}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val out = EventTimeStreams.funnelCompletions(in.toDS(), nStages = 3,
      windowMs = 60 * 60 * 1000, watermarkDelay = "30 minutes")
    val q = out.writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 completes in order; user 2's VIEW arrives in a LATER
      // batch than its click+purchase (out-of-order, inside the
      // watermark); user 3 never clicks. Batch-1 max ts stays 10:20 so
      // the 30-min watermark (09:50) admits the stragglers.
      in.addData(
        FunnelEvent(1, ts("10:00"), 0), FunnelEvent(1, ts("10:10"), 1),
        FunnelEvent(2, ts("10:10"), 1), FunnelEvent(2, ts("10:20"), 2),
        FunnelEvent(3, ts("10:00"), 0), FunnelEvent(3, ts("10:05"), 2))
      q.processAllAvailable()
      in.addData(FunnelEvent(1, ts("10:20"), 2), FunnelEvent(2, ts("10:00"), 0))
      q.processAllAvailable()
      assert(spark.table("funnel").count() === 0,
        "nothing may emit before a chain's window closes at the watermark")
      // advance the watermark past 11:30 (> every first view + window)
      in.addData(FunnelEvent(99, ts("12:30"), 0))
      q.processAllAvailable()
      in.addData(FunnelEvent(99, ts("12:31"), 0))
      q.processAllAvailable()
      // at-most-once: a SECOND complete chain for user 1 must not emit
      in.addData(FunnelEvent(1, ts("13:00"), 0), FunnelEvent(1, ts("13:10"), 1),
        FunnelEvent(1, ts("13:20"), 2), FunnelEvent(99, ts("15:30"), 0))
      q.processAllAvailable()
      in.addData(FunnelEvent(99, ts("15:31"), 0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("funnel").as[FunnelCompletion].collect()
      .map(c => c.userId -> c.stageTs.map(_.toString)).toMap
    assert(got.keySet === Set(1L, 2L), s"exactly users 1 and 2 complete, got $got")
    assert(got(1L) === Seq("2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0",
      "2024-01-01 10:20:00.0"))
    assert(got(2L) === Seq("2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0",
      "2024-01-01 10:20:00.0"),
      "the late-arriving view must head user 2's chain")
    assert(spark.table("funnel").count() === 2, "at most one completion per user")
  }

  test("streaming funnel: a later chain finalizes only after earlier views fail closed") {
    import EventTimeStreams.{FunnelCompletion, FunnelEvent}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val out = EventTimeStreams.funnelCompletions(in.toDS(), nStages = 3,
      windowMs = 60 * 60 * 1000, watermarkDelay = "30 minutes")
    val q = out.writeStream.format("memory").queryName("funnel2")
      .outputMode(OutputMode.Append()).start()
    try {
      // the 10:00 view's window [10:00, 11:00] closes EMPTY of clicks
      // (the first click is 11:10); the 10:30 view's window reaches
      // 11:30 and completes — the emitted chain must head at 10:30
      in.addData(FunnelEvent(4, ts("10:00"), 0), FunnelEvent(4, ts("10:30"), 0),
        FunnelEvent(4, ts("11:10"), 1), FunnelEvent(4, ts("11:20"), 2))
      q.processAllAvailable()
      in.addData(FunnelEvent(99, ts("13:00"), 0))
      q.processAllAvailable()
      in.addData(FunnelEvent(99, ts("13:01"), 0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel2").as[FunnelCompletion].collect()
      .map(c => c.userId -> c.stageTs.map(_.toString)).toMap
    assert(got === Map(4L -> Seq("2024-01-01 10:30:00.0",
      "2024-01-01 11:10:00.0", "2024-01-01 11:20:00.0")),
      "the chain must head at the earliest COMPLETING view (10:30), not 10:00")
  }

  test("RangeJoin: boundary inclusion/exclusion and bucket-spanning intervals") {
    import graft.operators.RangeJoin
    val probe = Seq((1L, 0L), (2L, 99L), (3L, 100L), (4L, 250L), (5L, 399L), (6L, 400L))
      .toDF("a", "t")
    val intervals = Seq((10L, 100L, 400L)).toDF("b", "start", "end") // [100, 400)
    val joined = RangeJoin.pointInInterval(probe, "t", intervals, "start", "end",
        bucketWidth = 64) // interval spans buckets 1..6: no pair duplicated
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(joined === Set((3L, 10L), (4L, 10L), (5L, 10L)))
  }

  test("streaming heavy hitters: bounded MG state, event-time-final emission, late drop") {
    import EventTimeStreams.{HHEvent, WindowHeavyHitter}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[HHEvent]
    val out = EventTimeStreams.tumblingHeavyHitters(
      in.toDS(), windowMs = 10 * 60 * 1000, k = 3,
      watermarkDelay = "5 minutes")
    val q = out.writeStream.format("memory").queryName("shh")
      .outputMode(OutputMode.Append()).start()
    def rows() = spark.table("shh")
      .as[WindowHeavyHitter].collect().toSeq
    try {
      // window [10:00, 10:10): hot item h (5 of 9 events) + 4 cold
      // singletons, split across two batches — MG state must merge
      in.addData(HHEvent(ts("10:00"), "h"), HHEvent(ts("10:01"), "h"),
        HHEvent(ts("10:02"), "c1"), HHEvent(ts("10:03"), "h"),
        HHEvent(ts("10:04"), "c2"))
      q.processAllAvailable()
      in.addData(HHEvent(ts("10:05"), "h"), HHEvent(ts("10:06"), "c3"),
        HHEvent(ts("10:07"), "h"), HHEvent(ts("10:08"), "c4"))
      q.processAllAvailable()
      assert(rows().isEmpty, "no emission before the watermark closes the window")
      // advance the watermark past 10:10 + 5min -> window finalizes once
      in.addData(HHEvent(ts("10:30"), "z"))
      q.processAllAvailable()
      val closed = rows()
      assert(closed.nonEmpty && closed.forall(_.windowStart === ts("10:00")))
      assert(closed.map(_.item).size <= 3, "at most k counters survive")
      val h = closed.find(_.item === "h")
      // freq(h) = 5/9 > N/(k+1) = 2.25 -> the MG recall guarantee
      assert(h.isDefined, s"hot item must survive, got $closed")
      assert(h.get.mgCount >= 5 - 9 / 4 && h.get.mgCount <= 5)
      assert(h.get.processed === 9)
      // a late event for the closed window drops; no re-emission
      in.addData(HHEvent(ts("10:05"), "h"))
      q.processAllAvailable()
      assert(rows().count(_.windowStart === ts("10:00")) === closed.size)
    } finally q.stop()
  }
}
