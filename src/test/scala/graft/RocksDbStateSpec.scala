package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventTimeStreams

/** The 100 TB state posture for streaming: the same sessionizer runs
  * unchanged on the RocksDB state store provider (state spills to local
  * disk instead of living on the JVM heap — the configuration a
  * billion-key session stream needs). The provider is a per-query conf
  * read at start, so this suite flips it, runs the x15-twin end to end,
  * and asserts output parity with the default (HDFS-backed in-memory)
  * provider used by every other streaming spec.
  */
class RocksDbStateSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(hm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hm:00")

  test("gap sessionization is provider-agnostic: RocksDB == default state store") {
    import EventTimeStreams.{ClosedSession, SessionEvent}
    implicit val sqlCtx = spark.sqlContext

    def run(queryName: String): Set[(Long, String, String, Long, Long)] = {
      val in = MemoryStream[SessionEvent]
      val q = EventTimeStreams.gapSessions(in.toDS(),
          gapMs = 30 * 60 * 1000, watermarkDelay = "10 minutes")
        .writeStream.format("memory").queryName(queryName)
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(SessionEvent(1, ts("10:00"), 100),
          SessionEvent(1, ts("10:10"), 200), SessionEvent(2, ts("10:05"), 50))
        q.processAllAvailable()
        in.addData(SessionEvent(1, ts("12:00"), 400))
        q.processAllAvailable()
        in.addData(SessionEvent(99, ts("12:01"), 1))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(queryName).as[ClosedSession].collect()
        .map(c => (c.userId, c.sessionStart.toString, c.sessionEnd.toString,
          c.cnt, c.amountCents)).toSet
    }

    val default = run("sess_default")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rocks =
      try run("sess_rocksdb")
      finally prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    assert(rocks === default)
    assert(rocks === Set(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L, 300L),
      (2L, "2024-01-01 10:05:00.0", "2024-01-01 10:05:00.0", 1L, 50L)))
  }
}
