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

  /** Per-user open-session state (epoch millis — Spark's GroupState
    * timeout clock).
    */
  case class SessionState(start: Long, last: Long, cnt: Long, cents: Long)

  /** A closed session, emitted exactly once. */
  case class ClosedSession(userId: Long, sessionStart: java.sql.Timestamp,
                           sessionEnd: java.sql.Timestamp, cnt: Long,
                           amountCents: Long)

  /** Streaming inactivity-gap sessionization — the streaming twin of the
    * batch x15 operator, as `flatMapGroupsWithState` custom state: a
    * session closes when a >gap silence follows it, either observed (a
    * later event arrives past the gap) or inferred (the event-time
    * watermark passes last+gap, via EventTimeTimeout — so sessions of
    * USERS WHO LEFT still close, which no pure windowed aggregation
    * expresses).
    *
    * State per key is one fixed-size SessionState, dropped on close:
    * memory is O(active users), independent of stream length — the
    * unbounded-input posture. Emission is append-mode (each closed
    * session exactly once); within a micro-batch, events are folded in
    * event-time order so batch boundaries never change the result.
    */
  def gapSessions(events: Dataset[SessionEvent], gapMs: Long,
                  watermarkDelay: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    def closed(uid: Long, s: SessionState) = ClosedSession(uid,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
      s.cnt, s.cents)
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, evs, state) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no further events: the
            // session provably cannot be extended (late data is gone)
            val s = state.get
            state.remove()
            Iterator.single(closed(uid, s))
          } else {
            val out = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t),
                    s.cnt + 1, s.cents + e.valueCents))
                case other =>
                  other.foreach(s => out += closed(uid, s))
                  cur = Some(SessionState(t, t, 1, e.valueCents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the timeout must sit strictly past the current watermark
              // (Spark rejects stale timestamps); a session whose close
              // time the watermark already passed times out next batch
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }
}
