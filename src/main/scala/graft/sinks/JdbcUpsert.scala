package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, SQLException}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Keyed-idempotent batched JDBC upsert — the S13/S14 export sink, mirroring
  * the reference's `BatchedStatements` (batched_statements.rs:30-107:
  * batch-size flush, UPDATE-then-INSERT-on-miss per transaction, deadlock
  * retry with backoff) and its keyed statements for the `records` /
  * `predictions` tables (importer/mod.rs:558-616).
  *
  * Differences forced by portability (the reference is MySQL-only):
  * `INSERT IGNORE` becomes UPDATE → executeBatch counts → INSERT only the
  * missed keys, and a duplicate-key violation on INSERT (a concurrent writer
  * won the race) retries the batch like a deadlock, which converges because
  * the retry's UPDATE then matches. SQLSTATE 40001 (serialization/deadlock —
  * MySQL 1213's standard code) retries with backoff exactly as the
  * reference does.
  *
  * Scale shape: one connection + transaction per PARTITION (not per row),
  * `batchSize` statements per round-trip; executors write in parallel and
  * the keyed statements make replays idempotent, so a retried Spark task
  * cannot duplicate rows — the same exactly-once-ish contract as ST5.
  */
object JdbcUpsert {

  final case class Config(
      url: String,
      table: String,
      keyCols: Seq[String],
      valueCols: Seq[String],
      batchSize: Int = 1000, // MAX_BATCH_SIZE, batched_statements.rs:15
      maxRetries: Int = 5,
      retryDelayMs: Long = 200, // reference sleeps 5 s; tests shouldn't
      driver: Option[String] = None,
      properties: Map[String, String] = Map.empty)

  /** Upsert every row of `df` (all key + value columns must be JDBC-scalar:
    * numeric/string/date/timestamp — project curves to JSON first). */
  def upsert(df: DataFrame, cfg: Config): Unit = {
    val schema = df.schema
    val cols = cfg.keyCols ++ cfg.valueCols
    val missing = cols.filterNot(c => schema.fieldNames.contains(c))
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    df.select(cols.head, cols.tail: _*).foreachPartition { rows: Iterator[Row] =>
      writePartition(rows, cfg)
    }
  }

  private def sqlOf(cfg: Config): (String, String) = {
    val update = s"UPDATE ${cfg.table} SET " +
      cfg.valueCols.map(c => s"$c = ?").mkString(", ") +
      " WHERE " + cfg.keyCols.map(c => s"$c = ?").mkString(" AND ")
    val insert = s"INSERT INTO ${cfg.table} (" +
      (cfg.keyCols ++ cfg.valueCols).mkString(", ") + ") VALUES (" +
      (cfg.keyCols ++ cfg.valueCols).map(_ => "?").mkString(", ") + ")"
    (update, insert)
  }

  private def writePartition(rows: Iterator[Row], cfg: Config): Unit = {
    cfg.driver.foreach(Class.forName)
    val props = new java.util.Properties()
    cfg.properties.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = DriverManager.getConnection(cfg.url, props)
    try {
      conn.setAutoCommit(false)
      rows.grouped(cfg.batchSize).foreach(batch => writeBatch(conn, batch, cfg, 0))
    } finally conn.close()
  }

  /** One transaction per batch; SQLSTATE 40001 (deadlock) and 23xxx
    * (duplicate key lost to a concurrent inserter) roll back and retry. */
  private def writeBatch(conn: Connection, batch: Seq[Row], cfg: Config,
                         attempt: Int): Unit = {
    val (updateSql, insertSql) = sqlOf(cfg)
    try {
      val upd = conn.prepareStatement(updateSql)
      try {
        batch.foreach { r =>
          var i = 1
          cfg.valueCols.foreach { c => upd.setObject(i, jdbcValue(r, c)); i += 1 }
          cfg.keyCols.foreach { c => upd.setObject(i, jdbcValue(r, c)); i += 1 }
          upd.addBatch()
        }
        val updated = upd.executeBatch()
        val missed = batch.zip(updated).collect { case (r, 0) => r }
        if (missed.nonEmpty) {
          val ins = conn.prepareStatement(insertSql)
          try {
            missed.foreach { r =>
              var i = 1
              (cfg.keyCols ++ cfg.valueCols).foreach { c =>
                ins.setObject(i, jdbcValue(r, c)); i += 1
              }
              ins.addBatch()
            }
            ins.executeBatch()
          } finally ins.close()
        }
        conn.commit()
      } finally upd.close()
    } catch {
      case e: SQLException if retriable(e) && attempt < cfg.maxRetries =>
        conn.rollback()
        Thread.sleep(cfg.retryDelayMs * (attempt + 1))
        writeBatch(conn, batch, cfg, attempt + 1)
      case e: Throwable =>
        try conn.rollback() catch { case _: SQLException => () }
        throw e
    }
  }

  private def retriable(e: SQLException): Boolean = {
    val state = Option(e.getSQLState).getOrElse("")
    state == "40001" || state.startsWith("23") ||
      // executeBatch failures arrive wrapped in BatchUpdateException whose
      // cause carries the state
      Option(e.getNextException).exists(n =>
        Option(n.getSQLState).exists(s => s == "40001" || s.startsWith("23")))
  }

  private def jdbcValue(r: Row, col: String): AnyRef = {
    val v = r.getAs[Any](col)
    if (v == null) null else v.asInstanceOf[AnyRef]
  }
}
