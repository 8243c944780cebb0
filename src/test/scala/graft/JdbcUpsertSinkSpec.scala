package graft

import java.sql.DriverManager
import graft.sinks.JdbcUpsertSink

/** OP-11/12 JDBC sink against embedded Derby (the offline stand-in for
  * the reference's Postgres): 500-row chunking, last-writer-wins on key
  * conflict, idempotent re-runs, empty-write guard.
  */
class JdbcUpsertSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withTable[A](ddl: String, name: String)(f: => A): A = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try { st.execute(s"DROP TABLE $name") } catch { case _: java.sql.SQLException => }
      st.execute(ddl)
      st.close()
    } finally conn.close()
    f
  }

  test("upsert chunks, updates on conflict, idempotent re-run (OP-11)") {
    withTable("CREATE TABLE rel (id VARCHAR(32) PRIMARY KEY, yr INT, title VARCHAR(64))", "rel") {
      // 1200 rows -> 3 chunks of <=500 per partition
      val batch = (1 to 1200).map(i => (s"id_$i", 2024, s"t$i")).toDF("id", "yr", "title")
      JdbcUpsertSink.upsert(batch, url, "rel", "id", chunkSize = 500)

      def state: Map[String, (Int, String)] = {
        val conn = DriverManager.getConnection(url)
        try {
          val rs = conn.createStatement().executeQuery("SELECT id, yr, title FROM rel")
          val m = scala.collection.mutable.Map[String, (Int, String)]()
          while (rs.next()) m += rs.getString(1) -> ((rs.getInt(2), rs.getString(3)))
          m.toMap
        } finally conn.close()
      }

      assert(state.size === 1200)
      assert(state("id_7") === ((2024, "t7")))

      // conflicting keys update, new keys insert; re-run is a no-op
      val upd = Seq(("id_7", 2025, "T7v2"), ("id_2000", 2025, "new")).toDF("id", "yr", "title")
      JdbcUpsertSink.upsert(upd, url, "rel", "id")
      JdbcUpsertSink.upsert(upd, url, "rel", "id") // idempotent
      val s2 = state
      assert(s2.size === 1201)
      assert(s2("id_7") === ((2025, "T7v2")))
      assert(s2("id_2000") === ((2025, "new")))

      // batch-internal duplicate keys: deterministic keep-last
      val dup = Seq(("id_9", 1111, "a"), ("id_9", 2222, "b")).toDF("id", "yr", "title")
      JdbcUpsertSink.upsert(dup, url, "rel", "id")
      assert(state("id_9") === ((2222, "b"))) // keep-last = max desc order

      // the reference raises on empty bulk writes (OP-15)
      intercept[IllegalArgumentException] {
        JdbcUpsertSink.upsert(batch.limit(0), url, "rel", "id")
      }
    }
  }

  test("insert appends in chunks without conflict handling (OP-12)") {
    withTable("CREATE TABLE alloc (nca VARCHAR(32), amt DOUBLE)", "alloc") {
      val rows = (1 to 700).map(i => (s"n$i", i * 1.5)).toDF("nca", "amt")
      JdbcUpsertSink.insert(rows, url, "alloc", chunkSize = 500)
      JdbcUpsertSink.insert(rows.limit(10), url, "alloc")
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery("SELECT count(*) FROM alloc")
        rs.next()
        assert(rs.getInt(1) === 710)
      } finally conn.close()
    }
  }
}
