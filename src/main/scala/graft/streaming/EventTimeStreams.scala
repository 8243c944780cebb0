package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Event-time streaming aggregation (SURVEY §7.4 extension: the
  * reference has no event-time semantics — its queues are arrival-order
  * only — but a training-data pipeline aggregating petabyte event logs
  * needs watermarked windows).
  *
  * Pure plan builders over a streaming DataFrame: state is bounded by
  * the watermark (Spark drops window state older than it), so the
  * streaming aggregation runs indefinitely at constant memory per
  * (window, key) — the 100 TB posture for unbounded inputs.
  */
object EventTimeStreams {

  /** Tumbling event-time window aggregation with late-data drop:
    * count + sum(integer cents) per (window, key). Append-mode sinks
    * emit each window once, when the watermark passes its end.
    */
  def tumblingAgg(events: DataFrame, tsCol: String, keyCol: String,
                  valueCol: String, windowLen: String,
                  watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col(valueCol) * 100).cast("long")).as("amount_cents"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("cnt"), col("amount_cents"))

  /** Hopping (sliding) event-time window aggregation — the streaming
    * twin of x45: each event contributes to windowLen/slide overlapping
    * windows (Spark's window() expands them; state per open window is
    * evicted as the watermark passes). Same append-mode once-per-window
    * emission contract as [[tumblingAgg]].
    */
  def hoppingAgg(events: DataFrame, tsCol: String, keyCol: String,
                 valueCol: String, windowLen: String, slide: String,
                 watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col(valueCol) * 100).cast("long")).as("amount_cents"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("cnt"), col("amount_cents"))

  /** Tumbling-window approximate distinct count — the x17 sketch inside
    * watermarked streaming state: per (window, key), an HLL++ sketch of
    * the id column accumulates across micro-batches and emits once when
    * the watermark closes the window. The state per open window is the
    * FIXED-SIZE sketch (kilobytes at rsd=0.01), not the id set — the
    * difference between "distinct users per hour" surviving a
    * billion-user stream and OOMing on it.
    */
  def tumblingApproxDistinct(events: DataFrame, tsCol: String, keyCol: String,
                             idCol: String, windowLen: String,
                             watermarkDelay: String,
                             rsd: Double = 0.01): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(approx_count_distinct(col(idCol), rsd).as("approx_distinct"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("approx_distinct"))

  /** Watermarked stream-stream interval join — the streaming twin of the
    * batch range join (x13): left events matched to right events on an
    * equi key with the right timestamp inside
    * [left ts, left ts + within). Both sides buffer state; the time
    * bound plus the watermarks lets Spark EVICT buffered rows once they
    * can no longer match (unbounded two-sided state otherwise — the
    * difference between a demo and something that survives an infinite
    * stream). Column names must be disjoint across the two inputs (the
    * usual stream-stream join requirement).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   watermarkDelay: String, within: String): DataFrame =
    left.withWatermark(leftTs, watermarkDelay)
      .join(right.withWatermark(rightTs, watermarkDelay),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) < col(leftTs) + expr(s"INTERVAL $within"))

  /** Streaming exact dedup — the streaming twin of the batch x01
    * operator: the first row per key is emitted, later duplicates are
    * dropped while the key's state lives. State is bounded by the
    * watermark (dropDuplicatesWithinWatermark expires a key once the
    * watermark passes its event time + delay), so unlike a raw
    * dropDuplicates stream the state store cannot grow without bound —
    * the 100 TB posture for infinite streams. The contract is
    * "exactly-once within the watermark horizon": a duplicate arriving
    * after its key expired is re-emitted, which is the correct trade on
    * unbounded input (callers pick the horizon).
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String], tsCol: String,
                     watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** One event on the session stream. Money rides as integer cents (the
    * engine's hashed-surface convention).
    */
  case class SessionEvent(userId: Long, ts: java.sql.Timestamp, valueCents: Long)

  /** One open session (epoch millis — Spark's GroupState timeout clock). */
  case class SessionState(start: Long, last: Long, cnt: Long, cents: Long)

  /** Per-user state: ALL open sessions inside the watermark horizon.
    * More than one exists exactly when events arrive out of order with
    * silences between them — a later-arriving event may still BRIDGE
    * two of them into one.
    */
  case class OpenSessions(open: Seq[SessionState])

  /** A closed session, emitted exactly once. */
  case class ClosedSession(userId: Long, sessionStart: java.sql.Timestamp,
                           sessionEnd: java.sql.Timestamp, cnt: Long,
                           amountCents: Long)

  /** Streaming inactivity-gap sessionization — the streaming twin of the
    * batch x15 operator, as `flatMapGroupsWithState` custom state.
    *
    * Each incoming event merges every open session within `gapMs` of it
    * (at most its two neighbors — merging THROUGH an event is how two
    * sessions bridge when the connecting event arrives late). A session
    * closes ONLY when the event-time watermark passes last+gap
    * (EventTimeTimeout or an expiry sweep while processing events):
    * at that point no event that could extend or bridge it can still
    * arrive, so emission is correct under ANY within-watermark disorder
    * — closing on the mere observation of a later event would be wrong,
    * since a bridging event may still come.
    *
    * State per key is the open-session list — bounded by the number of
    * gap-separated bursts inside one watermark horizon, independent of
    * stream length; sessions of USERS WHO LEFT still close via timeout,
    * which no pure windowed aggregation expresses.
    */
  /** One event on the funnel stream: `stage` is the 0-based index into
    * the funnel's ordered stage list (0 = view, 1 = click, ... in the
    * x68 shape).
    */
  case class FunnelEvent(userId: Long, ts: java.sql.Timestamp, stage: Int)

  /** Per-user funnel state: whether a completion was already emitted,
    * and the undecided event buffer as (epochMs, stage) pairs — bounded
    * by windowMs + the watermark horizon (see pruning below).
    */
  case class FunnelState(done: Boolean, buf: Seq[(Long, Int)])

  /** An emitted funnel completion: the per-stage event times of the
    * EARLIEST-STARTING chain, finalized at its window close.
    */
  case class FunnelCompletion(userId: Long, stageTs: Seq[java.sql.Timestamp])

  /** Streaming ordered-funnel detection — the streaming twin of the
    * batch x68 operator: emit (at most once per user) the stage
    * timestamps of the earliest-starting chain stage0 < stage1 < ... <
    * stage(n-1), all within `windowMs` of the chain's first event.
    *
    * Determinism under disorder: a chain is emitted only when the
    * watermark passes firstTs + window — at that point every event that
    * could belong to the chain's window has either arrived or is
    * late-dropped, so the decision is FINAL regardless of arrival
    * order (emitting on first sight would let arrival order pick which
    * chain wins). A view whose window closed without completing is
    * discarded, and the buffer keeps only events at or after the
    * earliest still-viable view — per-user state is bounded by
    * window + watermark horizon. Users who complete keep one tiny
    * done-marker row (dimension-sized state, the price of
    * exactly-once-per-user emission).
    */
  def funnelCompletions(events: Dataset[FunnelEvent], nStages: Int,
                        windowMs: Long,
                        watermarkDelay: String): Dataset[FunnelCompletion] = {
    require(nStages >= 1, s"nStages must be >= 1, got $nStages")
    import events.sparkSession.implicits._
    // earliest-starting decidable chain over a time-sorted buffer:
    // for each view in order, greedily chain the earliest later event
    // of each next stage inside the view's window
    def chainFrom(buf: Seq[(Long, Int)]): Option[Seq[Long]] =
      buf.iterator.filter(_._2 == 0).map(_._1).map { v =>
        var t = v
        var ok = true
        val out = Seq.newBuilder[Long]
        out += v
        (1 until nStages).foreach { s =>
          if (ok) buf.find(e => e._2 == s && e._1 > t && e._1 <= v + windowMs) match {
            case Some(e) => t = e._1; out += e._1
            case None => ok = false
          }
        }
        if (ok) Some(out.result()) else None
      }.collectFirst { case Some(c) => c }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelCompletion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, evs, state) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(FunnelState(done = false, Nil))
          if (st0.done) { state.update(st0); Iterator.empty }
          else {
            // same explicit late-drop as gapSessions
            val buf = (st0.buf ++ evs.filter(_.ts.getTime >= wm)
                .map(e => (e.ts.getTime, e.stage)))
              .sortBy(identity)
            chainFrom(buf) match {
              case Some(ts) if ts.head + windowMs <= wm =>
                // window closed -> no within-watermark event can change it
                state.update(FunnelState(done = true, Nil))
                Iterator.single(FunnelCompletion(uid,
                  ts.map(new java.sql.Timestamp(_))))
              case _ =>
                // keep (a) everything from the earliest view whose
                // window is still open — it may yet head a chain (or
                // already completed and awaits its close) — and (b)
                // later-stage events above the watermark, which can
                // still serve a FUTURE view (any such view has
                // v >= wm, so servers need t > wm); everything else can
                // never participate again
                val viableView = buf.iterator
                  .filter(e => e._2 == 0 && e._1 + windowMs > wm)
                  .map(_._1).nextOption()
                val buf2 = buf.filter(e =>
                  viableView.exists(e._1 >= _) || (e._2 > 0 && e._1 > wm))
                if (buf2.isEmpty) { state.remove(); Iterator.empty }
                else {
                  state.update(FunnelState(done = false, buf2))
                  // wake at the earliest decision point: the open view's
                  // window close, or (no view) when the last buffered
                  // server ages out under the advancing watermark
                  val decideAt = viableView.map(_ + windowMs)
                    .getOrElse(buf2.map(_._1).max)
                  state.setTimeoutTimestamp(math.max(decideAt + 1, wm + 1))
                  Iterator.empty
                }
            }
          }
      }
  }

  /** One keyed occurrence on the heavy-hitter stream. */
  case class HHEvent(ts: java.sql.Timestamp, item: String)

  /** Misra-Gries summary for one window: at most k counters, plus the
    * number of in-window events folded in (the error bound's N).
    */
  case class MGSummary(counters: Map[String, Long], processed: Long)

  /** One surviving counter of a CLOSED window, emitted exactly once.
    * `mgCount` is the Misra-Gries counter: true_count − processed/(k+1)
    * <= mgCount <= true_count, so every item with frequency above
    * processed/(k+1) is guaranteed present.
    */
  case class WindowHeavyHitter(windowStart: java.sql.Timestamp, item: String,
                               mgCount: Long, processed: Long)

  /** Streaming windowed heavy hitters — the streaming twin of the batch
    * x26 frequent-items sketch, as `flatMapGroupsWithState` custom
    * state: per tumbling window, a Misra-Gries summary of AT MOST k
    * counters (an arriving item increments its counter, claims a free
    * slot, or decrements everyone — the classic frequent algorithm), so
    * per-window state is FIXED-SIZE no matter how many distinct items
    * the window saw. Results emit ONLY when the event-time watermark
    * closes the window (event-time-final, like [[funnelCompletions]]):
    * arrival order never changes emission TIMING, and the Misra-Gries
    * recall guarantee (any item above processed/(k+1) survives) holds
    * under every fold order — but the exact surviving counter VALUES
    * are fold-order dependent, as in any MG implementation; consumers
    * read mgCount as a bound, not a count. Late events behind the
    * watermark drop explicitly; state removes on emission, so total
    * state is k counters × open windows inside the horizon.
    */
  def tumblingHeavyHitters(events: Dataset[HHEvent], windowMs: Long, k: Int,
                           watermarkDelay: String): Dataset[WindowHeavyHitter] = {
    require(windowMs > 0 && k >= 1, "windowMs > 0, k >= 1")
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(e => math.floorDiv(e.ts.getTime, windowMs) * windowMs)
      .flatMapGroupsWithState[MGSummary, WindowHeavyHitter](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (winStart, evs, state) =>
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            s.counters.toSeq.sortBy { case (item, c) => (-c, item) }
              .map { case (item, c) =>
                WindowHeavyHitter(new java.sql.Timestamp(winStart), item, c,
                  s.processed)
              }.iterator
          } else {
            var s = state.getOption.getOrElse(MGSummary(Map.empty, 0L))
            // events behind the watermark drop HERE, explicitly (the
            // engine's own late filtering is an implementation detail)
            evs.filter(_.ts.getTime >= wm).foreach { e =>
              val counters = s.counters.get(e.item) match {
                case Some(c) => s.counters.updated(e.item, c + 1)
                case None if s.counters.size < k => s.counters.updated(e.item, 1L)
                case None => s.counters.collect {
                  case (i, c) if c > 1 => i -> (c - 1)
                }
              }
              s = MGSummary(counters, s.processed + 1)
            }
            if (s.processed > 0) {
              state.update(s)
              // the window is decided once the watermark passes its end
              state.setTimeoutTimestamp(math.max(winStart + windowMs, wm + 1))
            }
            Iterator.empty
          }
      }
  }

  def gapSessions(events: Dataset[SessionEvent], gapMs: Long,
                  watermarkDelay: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    def closed(uid: Long, s: SessionState) = ClosedSession(uid,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
      s.cnt, s.cents)
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSessions, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, evs, state) =>
          val wm = state.getCurrentWatermarkMs()
          // fold events: each merges itself plus every session in reach.
          // Events older than the watermark drop HERE, explicitly: the
          // engine's own late filtering for flatMapGroupsWithState is an
          // implementation detail, and an unfiltered late event would
          // otherwise open a pre-watermark session that the expiry
          // partition below emits in the same call — a zombie session.
          val open = evs.filter(_.ts.getTime >= wm)
            .foldLeft(state.getOption.map(_.open).getOrElse(Nil)) {
            (open, e) =>
              val t = e.ts.getTime
              val (reach, rest) = open.partition(s =>
                t >= s.start - gapMs && t <= s.last + gapMs)
              reach.foldLeft(SessionState(t, t, 1, e.valueCents)) { (a, s) =>
                SessionState(math.min(a.start, s.start), math.max(a.last, s.last),
                  a.cnt + s.cnt, a.cents + s.cents)
              } +: rest
          }
          // a session with last+gap < wm can neither be extended nor
          // bridged by any future event (all have ts >= wm): close it
          val (expired, alive) = open.partition(_.last + gapMs < wm)
          if (alive.isEmpty) state.remove()
          else {
            state.update(OpenSessions(alive))
            // earliest possible close, clamped strictly past the watermark
            state.setTimeoutTimestamp(
              math.max(alive.map(_.last + gapMs).min, wm + 1))
          }
          expired.sortBy(_.start).map(closed(uid, _)).iterator
      }
  }
}
