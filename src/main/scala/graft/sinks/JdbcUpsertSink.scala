package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** OP-11/12 reference-parity JDBC sink: chunked bulk upsert / insert
  * against a relational database (the reference's ACTUAL sink —
  * supabase_repository.py:45-71: rows written in chunks of
  * DB_BULK_SIZE=500 as `UPSERT ... ON CONFLICT(key)`; the bucketed
  * parquet [[TableStore]] is the offline analog of the same semantics).
  *
  * Distributed writer: each partition opens one connection and writes
  * `chunkSize`-row statement batches inside per-chunk transactions. The
  * write is idempotent (key-conflict rows update in place), so the
  * streaming at-least-once retry model (OP-61) stays exactly-once-
  * effective, and batch-internal duplicate keys resolve keep-last
  * before the write — the reference's later-chunk-wins.
  *
  * SQL is dialect-pluggable: [[PostgresDialect]] emits the reference's
  * native `INSERT ... ON CONFLICT (key) DO UPDATE` (one round trip per
  * chunk); [[GenericDialect]] expresses the same last-writer-wins as
  * UPDATE-then-INSERT-the-misses, which any JDBC database (including
  * the offline test harness's embedded Derby) accepts.
  */
object JdbcUpsertSink {

  /** Builds + executes the upsert statement(s) for one chunk. */
  trait Dialect extends Serializable {
    def writeChunk(conn: Connection, table: String, schema: StructType,
                   key: String, chunk: Seq[Row]): Unit
  }

  private def bind(ps: PreparedStatement, row: Row, cols: Seq[Int]): Unit =
    cols.zipWithIndex.foreach { case (c, i) => ps.setObject(i + 1, row.get(c)) }

  /** Key-only table (no non-key columns): an upsert degrades to
    * insert-if-absent — probe existing keys, insert the misses. Both
    * dialect SQL shapes are invalid with an empty SET list, so this
    * shared portable path handles the degenerate schema.
    */
  private def keyOnlyChunk(conn: Connection, table: String, key: String,
                           keyIdx: Int, chunk: Seq[Row]): Unit = {
    val probe = conn.prepareStatement(s"SELECT 1 FROM $table WHERE $key = ?")
    val ins = conn.prepareStatement(s"INSERT INTO $table ($key) VALUES (?)")
    try {
      chunk.foreach { r =>
        probe.setObject(1, r.get(keyIdx))
        val rs = probe.executeQuery()
        val exists = try rs.next() finally rs.close()
        if (!exists) { ins.setObject(1, r.get(keyIdx)); ins.addBatch() }
      }
      ins.executeBatch()
    } finally { probe.close(); ins.close() }
  }

  /** Portable upsert: batched UPDATE, then batched INSERT of the rows
    * the UPDATE missed. Two round trips per chunk, any SQL database.
    */
  object GenericDialect extends Dialect {
    override def writeChunk(conn: Connection, table: String, schema: StructType,
                            key: String, chunk: Seq[Row]): Unit = {
      val cols = schema.fieldNames.toSeq
      val keyIdx = schema.fieldIndex(key)
      val nonKey = cols.indices.filterNot(_ == keyIdx)
      if (nonKey.isEmpty) { keyOnlyChunk(conn, table, key, keyIdx, chunk); return }
      val upd = conn.prepareStatement(
        s"UPDATE $table SET ${nonKey.map(i => s"${cols(i)} = ?").mkString(", ")} " +
          s"WHERE $key = ?")
      try {
        chunk.foreach { r => bind(upd, r, nonKey :+ keyIdx); upd.addBatch() }
        val updated = upd.executeBatch()
        // drivers may return SUCCESS_NO_INFO (-2) per batch entry (Oracle
        // always; MySQL with rewritten batches) — treating that as "hit"
        // would silently drop every brand-new row. Resolve unknowns with
        // a per-row update whose count is authoritative.
        val misses = chunk.zip(updated).flatMap {
          case (r, 0) => Some(r)
          case (r, c) if c < 0 =>
            bind(upd, r, nonKey :+ keyIdx)
            if (upd.executeUpdate() == 0) Some(r) else None
          case _ => None
        }
        if (misses.nonEmpty) {
          val ins = conn.prepareStatement(
            s"INSERT INTO $table (${cols.mkString(", ")}) " +
              s"VALUES (${cols.map(_ => "?").mkString(", ")})")
          try {
            misses.foreach { r => bind(ins, r, cols.indices); ins.addBatch() }
            ins.executeBatch()
          } finally ins.close()
        }
      } finally upd.close()
    }
  }

  /** The reference's statement shape (supabase -> Postgres): one
    * `INSERT ... ON CONFLICT (key) DO UPDATE SET c = EXCLUDED.c` batch
    * per chunk.
    */
  object PostgresDialect extends Dialect {
    override def writeChunk(conn: Connection, table: String, schema: StructType,
                            key: String, chunk: Seq[Row]): Unit = {
      val cols = schema.fieldNames.toSeq
      val nonKey = cols.filterNot(_ == key)
      // key-only table: nothing to update on conflict — DO NOTHING is
      // the valid degenerate form (an empty SET list is a syntax error)
      val onConflict =
        if (nonKey.isEmpty) s"ON CONFLICT ($key) DO NOTHING"
        else s"ON CONFLICT ($key) DO UPDATE SET " +
          nonKey.map(c => s"$c = EXCLUDED.$c").mkString(", ")
      val ps = conn.prepareStatement(
        s"INSERT INTO $table (${cols.mkString(", ")}) " +
          s"VALUES (${cols.map(_ => "?").mkString(", ")}) " + onConflict)
      try {
        chunk.foreach { r => bind(ps, r, cols.indices); ps.addBatch() }
        ps.executeBatch()
      } finally ps.close()
    }
  }

  /** OP-11: chunked bulk upsert. Empty input raises
    * (supabase_repository.py:55-57).
    */
  def upsert(batch: DataFrame, url: String, table: String, key: String,
             chunkSize: Int = 500, dialect: Dialect = GenericDialect): Unit = {
    TableStore.requireNonEmpty(batch, s"jdbc upsert into $table")
    val deduped = TableStore.dedupeKeepLast(batch, key)
    val schema = deduped.schema
    val ki = schema.fieldIndex(key)
    deduped.foreachPartition { rows0: Iterator[Row] =>
      // a null key can never match `WHERE key = ?` / `ON CONFLICT`, so
      // the row would re-INSERT on every replay — refuse loudly instead
      // of quietly growing duplicates
      val rows = rows0.map { r =>
        if (r.isNullAt(ki)) throw new IllegalArgumentException(
          s"jdbc upsert into $table: null $key cannot upsert idempotently")
        r
      }
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          try {
            rows.grouped(chunkSize).foreach { chunk =>
              dialect.writeChunk(conn, table, schema, key, chunk)
              conn.commit()
            }
          } catch {
            case e: Throwable =>
              // explicit rollback of the trailing partial chunk:
              // close-with-open-transaction is driver-defined and an
              // implicit COMMIT on some (e.g. Oracle)
              try conn.rollback() catch { case _: java.sql.SQLException => }
              throw e
          }
        } finally conn.close()
      }
    }
  }

  /** OP-12: chunked append-only bulk insert (allocations,
    * supabase_repository.py:67-71).
    */
  /** Streaming load stage in the reference's actual topology: each
    * micro-batch upserts into the relational sink via foreachBatch
    * (handlers/worker.py ends every message in a supabase bulk upsert).
    * At-least-once delivery composes with the upsert's idempotence into
    * exactly-once-effective rows — a replayed micro-batch re-applies
    * the same key-conflict updates. Empty micro-batches are skipped
    * (the reference's empty-write guard raises; an idle stream tick is
    * not an error).
    *
    * Returns the configured writer; callers pick trigger/checkpoint and
    * call start().
    */
  def streamUpsert(stream: DataFrame, url: String, table: String, key: String,
                   chunkSize: Int = 500, dialect: Dialect = GenericDialect)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) upsert(batch, url, table, key, chunkSize, dialect)
    }

  def insert(batch: DataFrame, url: String, table: String,
             chunkSize: Int = 500): Unit = {
    TableStore.requireNonEmpty(batch, s"jdbc insert into $table")
    val schema = batch.schema
    val cols = schema.fieldNames.toSeq
    batch.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(
            s"INSERT INTO $table (${cols.mkString(", ")}) " +
              s"VALUES (${cols.map(_ => "?").mkString(", ")})")
          try {
            rows.grouped(chunkSize).foreach { chunk =>
              chunk.foreach { r => bind(ps, r, cols.indices); ps.addBatch() }
              ps.executeBatch()
            }
            // ONE commit per partition: append-only rows have no key to
            // make a replay idempotent, so a task retry after per-chunk
            // commits would duplicate every committed chunk. A failure
            // anywhere in the partition now rolls the whole partition
            // back and the retry starts clean. (The window between this
            // commit and task-success reporting remains — inherent to
            // keyless JDBC sinks; the keyed upsert has no such window.)
            conn.commit()
          } catch {
            case e: Throwable =>
              // EXPLICIT rollback: relying on close() to discard the
              // open transaction is driver-defined — an implicit COMMIT
              // on some drivers (e.g. Oracle), which would persist the
              // uncommitted chunks and double them on task retry
              try conn.rollback() catch { case _: java.sql.SQLException => }
              throw e
          } finally ps.close()
        } finally conn.close()
      }
    }
  }
}
