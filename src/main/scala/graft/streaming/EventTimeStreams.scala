package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
