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

  test("a null key fails the upsert loudly instead of duplicating on replay") {
    withTable("CREATE TABLE reln (id VARCHAR(32), yr INT)", "reln") {
      // UPDATE ... WHERE id = NULL matches nothing, so a null-key row
      // would INSERT again on every replay — the sink must refuse it
      val batch = Seq((Some("a"), 1), (None, 2)).toDF("id", "yr")
      val e = intercept[org.apache.spark.SparkException] {
        JdbcUpsertSink.upsert(batch, url, "reln", "id")
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("null id")), messages(e).mkString("\n"))
    }
  }

  test("GenericDialect resolves SUCCESS_NO_INFO batch results per-row") {
    // Derby reports real update counts, so the -2 path never fires
    // naturally: proxy the connection so the UPDATE batch claims
    // SUCCESS_NO_INFO for every row, forcing the per-row fallback. The
    // actual writes still hit real Derby — correctness is end-to-end.
    import java.lang.reflect.{InvocationHandler, Method, Proxy => JProxy}
    import java.sql.{Connection, PreparedStatement, Statement}

    def noInfoStatement(real: PreparedStatement): PreparedStatement =
      JProxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[PreparedStatement]),
        new InvocationHandler {
          def invoke(p: AnyRef, m: Method, a: Array[AnyRef]): AnyRef = {
            val r = m.invoke(real, a: _*)
            if (m.getName == "executeBatch")
              Array.fill(r.asInstanceOf[Array[Int]].length)(Statement.SUCCESS_NO_INFO)
            else r
          }
        }).asInstanceOf[PreparedStatement]

    def noInfoConnection(real: Connection): Connection =
      JProxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[Connection]),
        new InvocationHandler {
          def invoke(p: AnyRef, m: Method, a: Array[AnyRef]): AnyRef = {
            val r = m.invoke(real, a: _*)
            if (m.getName == "prepareStatement" &&
                a(0).asInstanceOf[String].startsWith("UPDATE"))
              noInfoStatement(r.asInstanceOf[PreparedStatement])
            else r
          }
        }).asInstanceOf[Connection]

    withTable("CREATE TABLE rel2 (id VARCHAR(32) PRIMARY KEY, yr INT, title VARCHAR(64))", "rel2") {
      val conn = DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val st = conn.createStatement()
        st.execute("INSERT INTO rel2 VALUES ('a', 2024, 'old')")
        st.close()
        val schema = Seq(("x", 1, "y")).toDF("id", "yr", "title").schema
        val chunk = Seq(
          org.apache.spark.sql.Row("a", 2025, "updated"), // existing -> UPDATE
          org.apache.spark.sql.Row("b", 2025, "fresh"))   // new -> INSERT
        JdbcUpsertSink.GenericDialect.writeChunk(
          noInfoConnection(conn), "rel2", schema, "id", chunk)
        conn.commit()

        val rs = conn.createStatement()
          .executeQuery("SELECT id, yr, title FROM rel2 ORDER BY id")
        val out = Iterator.continually(rs)
          .takeWhile(_.next())
          .map(r => (r.getString(1), r.getInt(2), r.getString(3))).toList
        // a "all -2" batch must neither drop the new row (treated as
        // hit) nor double-insert the existing one (treated as miss)
        assert(out === List(("a", 2025, "updated"), ("b", 2025, "fresh")))
        conn.commit() // close the read txn (autoCommit is off)
      } finally conn.close()
    }
  }

  test("streamUpsert: micro-batches land exactly-once-effective in the DB") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    withTable("CREATE TABLE srel (id VARCHAR(32) PRIMARY KEY, yr INT)", "srel") {
      val in = MemoryStream[(String, Int)]
      val q = JdbcUpsertSink.streamUpsert(
        in.toDF().toDF("id", "yr"), url, "srel", "id").start()
      try {
        in.addData(("a", 2024), ("b", 2024))
        q.processAllAvailable()
        // conflicting key updates, new key inserts — across micro-batches
        in.addData(("a", 2025), ("c", 2025))
        q.processAllAvailable()
      } finally q.stop()

      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement()
          .executeQuery("SELECT id, yr FROM srel ORDER BY id")
        val out = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getString(1), r.getInt(2))).toList
        assert(out === List(("a", 2025), ("b", 2024), ("c", 2025)))
      } finally conn.close()
    }
  }

  test("upsert on a key-only table degrades to insert-if-absent") {
    withTable("CREATE TABLE members (id VARCHAR(32) PRIMARY KEY)", "members") {
      // an empty SET list is a syntax error in both dialect SQL shapes;
      // the degenerate schema must still upsert idempotently
      JdbcUpsertSink.upsert(Seq("a", "b", "c").toDF("id"), url, "members", "id")
      JdbcUpsertSink.upsert(Seq("b", "c", "d").toDF("id"), url, "members", "id")
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery("SELECT id FROM members")
        val got = scala.collection.mutable.Set[String]()
        while (rs.next()) got += rs.getString(1)
        assert(got === Set("a", "b", "c", "d"))
      } finally conn.close()
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
