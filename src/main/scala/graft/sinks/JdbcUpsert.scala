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
  * missed keys; a duplicate-key violation on that INSERT means the key
  * exists after all (concurrent writer, or a driver counting CHANGED rows
  * rather than matched ones) and is ignored per row — the reference's
  * INSERT IGNORE, not a retry. SQLSTATE 40001 (serialization/deadlock —
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

  /** One transaction per batch; SQLSTATE 40001 (deadlock) rolls back and
    * retries with backoff. A duplicate key on the INSERT leg is NOT a
    * retry: it means the key exists — either a concurrent writer won the
    * race, or the driver reported 0 for an UPDATE that matched but changed
    * nothing (MySQL `useAffectedRows`) — so those rows fall back to the
    * reference's INSERT-IGNORE semantics (leave the stored row). Retrying
    * the whole batch would loop without progress on the changed-rows case. */
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
        // drivers may report SUCCESS_NO_INFO (-2, e.g. Oracle): re-run those
        // rows singly for exact counts — classifying them as "updated" would
        // silently skip the INSERT leg and lose the rows
        val counts = batch.zip(updated).map {
          case (r, java.sql.Statement.SUCCESS_NO_INFO) =>
            var i = 1
            cfg.valueCols.foreach { c => upd.setObject(i, jdbcValue(r, c)); i += 1 }
            cfg.keyCols.foreach { c => upd.setObject(i, jdbcValue(r, c)); i += 1 }
            (r, upd.executeUpdate())
          case p => p
        }
        val missed = counts.collect { case (r, 0) => r }
        if (missed.nonEmpty) insertIgnore(conn, missed, insertSql, cfg)
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

  /** Batched INSERT of the update-missed rows; on a duplicate key the
    * partial batch rolls back to a savepoint and the rows re-run one by
    * one, swallowing per-row duplicates (the reference's `INSERT IGNORE`,
    * importer/mod.rs:579-616 via batched_statements.rs). */
  private def insertIgnore(conn: Connection, missed: Seq[Row],
                           insertSql: String, cfg: Config): Unit = {
    def bind(ins: PreparedStatement, r: Row): Unit = {
      var i = 1
      (cfg.keyCols ++ cfg.valueCols).foreach { c =>
        ins.setObject(i, jdbcValue(r, c)); i += 1
      }
    }
    val ins = conn.prepareStatement(insertSql)
    try {
      val sp = conn.setSavepoint()
      try {
        missed.foreach { r => bind(ins, r); ins.addBatch() }
        ins.executeBatch()
      } catch {
        case e: SQLException if dupKey(e) =>
          conn.rollback(sp) // undo the half-applied batch; the UPDATEs stay
          missed.foreach { r =>
            val rowSp = conn.setSavepoint()
            try { bind(ins, r); ins.executeUpdate() }
            catch { case e2: SQLException if dupKey(e2) => conn.rollback(rowSp) }
          }
      }
    } finally ins.close()
  }

  private def stateOf(e: SQLException): Seq[String] =
    (Option(e.getSQLState) ++
      // executeBatch failures arrive wrapped in BatchUpdateException whose
      // chained exception carries the state
      Option(e.getNextException).flatMap(n => Option(n.getSQLState))).toSeq

  // ONLY the duplicate-key states: 23505 (standard/Postgres/Derby) and
  // 23000 (MySQL collapses all integrity violations there). Matching the
  // whole 23 class would swallow FK/NOT NULL/CHECK violations on engines
  // that distinguish them — rows would vanish while the job reports success.
  private def dupKey(e: SQLException): Boolean =
    stateOf(e).exists(s => s == "23505" || s == "23000")

  // SQLSTATE 40001 is the standard serialization-failure code (MySQL maps
  // ER_LOCK_DEADLOCK onto it); some drivers surface only the vendor code,
  // so error 1213 — the exact number the reference retries on
  // (batched_statements.rs:59-107) — is accepted as the deadlock signature too
  private def retriable(e: SQLException): Boolean =
    stateOf(e).contains("40001") || e.getErrorCode == 1213 ||
      Option(e.getNextException).exists(_.getErrorCode == 1213)

  private def jdbcValue(r: Row, col: String): AnyRef = {
    val v = r.getAs[Any](col)
    if (v == null) null else v.asInstanceOf[AnyRef]
  }
}
