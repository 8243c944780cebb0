package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time extension operators over the `events` table (SURVEY §7.4):
  * generic range join, tumbling-window aggregation, inactivity-gap
  * sessionization. These generalize the reference's order-dependent
  * marker sessionization (OP-37) to event time — the operators a
  * training-data pipeline runs over petabyte event logs.
  *
  * Time arithmetic goes through `Tables.epochNs` — an exact 64-bit
  * epoch-nano long however the parquet writer typed `ts` (nanos-as-long
  * or TIMESTAMP_NTZ micros) — and stays integral via the `div` division:
  * double math would corrupt nanos above 2^53. Money aggregates leave
  * the hashed surface as integer cents (the q37 lesson).
  */
object EventTimeQueries {
  type Q = (SparkSession, String) => DataFrame

  private val HourNs = 3600000000000L
  private val HalfHourNs = 1800000000000L
  private val DayNs = 86400000000000L

  private def cents(c: String): Column =
    sum(round(col(c) * 100).cast("long"))

  val queries: Map[String, Q] = Map(
    // Generic range join, no equi key: every event (of a bounded probe
    // set) against every signup's 30-minute follow-on window — executed
    // as a bucket equi-join (RangeJoin), never a cross product.
    "x13_range_join" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val tsNs = Tables.epochNs(e, "ts")
      val probe = e.filter(col("user_id") < 200)
        .select(col("event_id").as("a"), tsNs.as("t"))
      val intervals = e.filter(col("event_type") === "signup" && col("user_id") < 50)
        .select(col("event_id").as("b"), tsNs.as("start"),
          (tsNs + HalfHourNs).as("end"))
      RangeJoin.pointInInterval(probe, "t", intervals, "start", "end",
          bucketWidth = HalfHourNs)
        .select(col("a"), col("b"))
        .orderBy(col("a"), col("b"))
    }),

    // Tumbling event-time window: hourly buckets per event type. The
    // bucket is a pure projection of ts, so this is ONE hash aggregate —
    // the shuffle is (bucket, type), which scales with time span, not
    // input size.
    "x14_tumbling_window" -> ((s, d) => {
      val e = Tables(s, d, "events")
      e.groupBy(
          call_function("div", Tables.epochNs(e, "ts"), lit(HourNs)).as("hour_bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), cents("value").as("amount_cents"))
        .orderBy(col("hour_bucket"), col("event_type"))
    }),

    // As-of join: each click enriched with the user's latest signup at
    // or before it (union+window — one shuffle, see AsOfJoin). ts stays
    // off the output (nanos-long vs timestamp on the hashed surface).
    "x25_asof_join" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val probe = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val build = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("signup_id"))
      AsOfJoin.backward(probe, build, "user_id", "ts")
        .select(col("event_id"), col("user_id"), col("signup_id"))
        .orderBy(col("event_id"))
    }),

    // Inactivity-gap sessionization: a >30min silence starts a new
    // session. Windows are partitioned per user — event-time order
    // within a user, never a global sort.
    "x15_session_gap" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gap = col("ts_ns") - lag(col("ts_ns"), 1).over(wOrd)
      e.withColumn("ts_ns", Tables.epochNs(e, "ts"))
        .withColumn("new_sess", when(gap > HalfHourNs, 1).otherwise(0))
        .withColumn("sess", sum(col("new_sess")).over(wCum))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("cnt"), cents("value").as("amount_cents"),
          min(col("event_id")).as("first_event"))
        .orderBy(col("user_id"), col("sess"))
    }),

    // Hopping (sliding) event-time window: 1-hour windows every 30
    // minutes — each event lands in exactly size/slide = 2 windows,
    // materialized by a 2-way explode of slide ids (the window-id
    // arithmetic stays in exact nanos longs). One hash aggregate on
    // (window, type); input amplification is the fixed ×2 of the
    // overlap factor, never data-dependent.
    "x45_hopping_window" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val slideId = call_function("div", Tables.epochNs(e, "ts"), lit(HalfHourNs))
      e.select(col("event_type"), col("value"),
          explode(array(slideId - 1, slideId)).as("w"))
        .groupBy(col("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), cents("value").as("amount_cents"))
        .orderBy(col("w"), col("event_type"))
    }),

    // SCD type-2 interval materialization: each user's event_type as a
    // slowly-changing dimension with [valid_from, valid_to) nano
    // intervals via lead() — the warehouse history-table build. Per-user
    // windows only (shuffle on user_id), open intervals carry null.
    "x67_scd2_intervals" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from"), col("event_id"))
      e.select(col("user_id"), col("event_id"), col("event_type"),
          Tables.epochNs(e, "ts").as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    }),

    // Ordered funnel (view -> click -> purchase): stage k's first
    // timestamp is the MIN event strictly after stage k-1 — three
    // bounded per-user aggregates chained by user-keyed joins; no
    // sequence scan, no window over the whole log. funnel_stage counts
    // completed stages (the product-analytics conversion funnel).
    "x68_funnel_stages" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val t = e.select(col("user_id"), col("event_type"),
        Tables.epochNs(e, "ts").as("t"))
      def firstAfter(typ: String, prev: DataFrame, prevCol: String, out: String) =
        t.filter(col("event_type") === typ)
          .join(prev, Seq("user_id"))
          .filter(col("t") > col(prevCol))
          .groupBy(col("user_id")).agg(min(col("t")).as(out))
      val v = t.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("t")).as("v"))
      val c = firstAfter("click", v, "v", "c")
      val p = firstAfter("purchase", c.select(col("user_id"), col("c")), "c", "p")
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("v"), col("c"), col("p"),
          (lit(1) + col("c").isNotNull.cast("int") +
            col("p").isNotNull.cast("int")).as("funnel_stage"))
        .orderBy(col("user_id"))
    }),

    // Daily cohort retention: users bucketed by first-seen day, counted
    // distinct per (cohort_day, day_offset) — the retention matrix.
    // Two bounded aggregates (per-user min, then per-cell distinct);
    // shuffles scale with users and days, never raw events.
    "x69_retention_cohorts" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val day = call_function("div", Tables.epochNs(e, "ts"), lit(DayNs))
      val act = e.select(col("user_id"), day.as("day")).distinct()
      val cohort = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      act.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // Daily active users with week-over-week growth: one distinct-user
    // aggregate per day bucket (shuffle scales with the time span, not
    // input size), then a CALENDAR self-join on day_bucket - 7 — a
    // row-based lag(7) would silently compare against an older day
    // whenever the log has an empty day. Both relations are
    // dimension-sized (one row per day). Growth is null for the first
    // week or after a gap (null propagates identically through both
    // engines' division).
    "x89_dau_wow" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val day = call_function("div", Tables.epochNs(e, "ts"), lit(DayNs))
      val dau = e.groupBy(day.as("day_bucket"))
        .agg(count_distinct(col("user_id")).as("dau"))
      val prev = dau.select((col("day_bucket") + 7).as("day_bucket"),
        col("dau").as("dau_prev7"))
      dau.join(prev, Seq("day_bucket"), "left")
        .select(col("day_bucket"), col("dau"),
          round(col("dau").cast("double") / col("dau_prev7") - 1.0, 6)
            .as("wow_growth"))
        .orderBy(col("day_bucket"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "x13_range_join" ->
      """SELECT e.event_id AS a, s.event_id AS b
        |FROM events e JOIN events s
        |  ON s.event_type = 'signup' AND s.user_id < 50 AND e.user_id < 200
        | AND epoch_ns(e.ts) >= epoch_ns(s.ts)
        | AND epoch_ns(e.ts) < epoch_ns(s.ts) + 1800000000000
        |ORDER BY a, b""".stripMargin,
    "x14_tumbling_window" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS amount_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x25_asof_join" ->
      """WITH probe AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
        |), build AS (
        |  SELECT user_id, ts, max(event_id) AS signup_id FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id, ts
        |)
        |SELECT p.event_id, p.user_id, b.signup_id
        |FROM probe p ASOF LEFT JOIN build b
        |  ON p.user_id = b.user_id AND p.ts >= b.ts
        |ORDER BY p.event_id""".stripMargin,

    "x15_session_gap" ->
      """SELECT user_id, CAST(sess AS BIGINT) AS sess, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS amount_cents,
        |  min(event_id) AS first_event
        |FROM (
        |  SELECT *, sum(CASE WHEN gap IS NOT NULL AND gap > 1800000000000
        |                     THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM (SELECT *, epoch_ns(ts) - lag(epoch_ns(ts))
        |          OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |        FROM events)
        |) GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin,

    "x45_hopping_window" ->
      """SELECT w, event_type, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS amount_cents
        |FROM (
        |  SELECT event_type, value,
        |    (epoch_ns(ts) // 1800000000000) + o.off AS w
        |  FROM events, (VALUES (-1), (0)) AS o(off)
        |)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x67_scd2_intervals" ->
      """SELECT user_id, event_id, event_type,
        |  epoch_ns(ts) AS valid_from,
        |  lead(epoch_ns(ts)) OVER (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts), event_id) AS valid_to
        |FROM events
        |ORDER BY user_id, valid_from, event_id""".stripMargin,

    "x68_funnel_stages" ->
      """WITH t AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS t FROM events
        |), v AS (
        |  SELECT user_id, min(t) AS v FROM t WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT t.user_id, min(t.t) AS c FROM t JOIN v USING (user_id)
        |  WHERE t.event_type = 'click' AND t.t > v.v GROUP BY 1
        |), p AS (
        |  SELECT t.user_id, min(t.t) AS p FROM t JOIN c USING (user_id)
        |  WHERE t.event_type = 'purchase' AND t.t > c.c GROUP BY 1
        |)
        |SELECT v.user_id, v.v, c.c, p.p,
        |  CAST(1 + CAST(c.c IS NOT NULL AS INT) + CAST(p.p IS NOT NULL AS INT) AS INT)
        |    AS funnel_stage
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "x69_retention_cohorts" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events
        |), cohort AS (
        |  SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1
        |)
        |SELECT cohort.cohort_day, act.day - cohort.cohort_day AS day_offset,
        |  CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_users
        |FROM act JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x89_dau_wow" ->
      """WITH dau AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day_bucket,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM events GROUP BY 1
        |)
        |SELECT d.day_bucket, d.dau,
        |  round(CAST(d.dau AS DOUBLE) / p.dau - 1.0, 6) AS wow_growth
        |FROM dau d LEFT JOIN dau p ON p.day_bucket = d.day_bucket - 7
        |ORDER BY d.day_bucket""".stripMargin
  )
}
