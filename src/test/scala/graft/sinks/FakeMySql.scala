package graft.sinks

import java.lang.reflect.Proxy
import java.sql.{Connection, DriverManager, PreparedStatement, SQLException, Savepoint}
import scala.collection.mutable

/** An in-memory JDBC driver with MYSQL SEMANTICS, for exercising the
  * dialect-dependent branches of [[JdbcUpsert]] that embedded Derby cannot
  * reach (no MySQL/H2 jar exists on the offline classpath):
  *
  *  - UPDATE batch counts report CHANGED rows, not matched rows (MySQL
  *    without CLIENT_FOUND_ROWS): a matched-but-identical row counts 0 and
  *    must fall through the sink's INSERT→duplicate→ignore path;
  *  - optional `SUCCESS_NO_INFO` (-2) batch results (the Oracle-style
  *    driver behavior) forcing the per-row re-execution path;
  *  - injectable deadlocks as MySQL raises them — vendor error 1213 with
  *    SQLSTATE 40001, or (some driver configs) the bare vendor code;
  *  - duplicate keys as MySQL reports them — SQLSTATE 23000 / error 1062.
  *
  * Transactions are real: each connection works on an overlay of its
  * CHANGED keys with read-committed fall-through, `commit` publishes the
  * delta row-by-row (so two concurrent writers merge instead of one
  * clobbering the other's table), `rollback` discards it, savepoints
  * restore mid-transaction state (so the sink's half-applied-INSERT-batch
  * rollback is genuinely verified). Interfaces are implemented via dynamic
  * proxies — only the methods the sink calls exist.
  */
object FakeMySql {
  val Url = "jdbc:fakemysql:mem"

  // table -> (key tuple -> value tuple); keyArity fixed at table creation
  private val global = mutable.Map[String, Map[Seq[Any], Seq[Any]]]()
  private val keyArity = mutable.Map[String, Int]()

  val deadlocksToInject = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var deadlockAsVendorCodeOnly = false
  @volatile var successNoInfo = false

  def reset(): Unit = synchronized {
    global.clear(); keyArity.clear()
    deadlocksToInject.set(0); deadlockAsVendorCodeOnly = false; successNoInfo = false
  }
  def createTable(name: String, keys: Int): Unit = synchronized {
    global(name) = Map.empty; keyArity(name) = keys
  }
  def seed(name: String, rows: Map[Seq[Any], Seq[Any]]): Unit = synchronized {
    global(name) = global(name) ++ rows
  }
  def rows(name: String): Map[Seq[Any], Seq[Any]] = synchronized { global(name) }
  private def committed(name: String, key: Seq[Any]): Option[Seq[Any]] =
    synchronized { global.getOrElse(name, Map.empty).get(key) }
  // row-level publish (InnoDB-style): only the transaction's CHANGED keys
  // merge into the committed state, atomically — two concurrent writers on
  // disjoint keys both keep their rows (a whole-table swap would lose the
  // other writer's committed updates)
  private def publish(txn: Map[String, Map[Seq[Any], Seq[Any]]]): Unit =
    synchronized { txn.foreach { case (n, delta) =>
      global(n) = global.getOrElse(n, Map.empty) ++ delta } }
  private def keysOf(name: String): Int = synchronized { keyArity(name) }

  DriverManager.registerDriver(new java.sql.Driver {
    def connect(url: String, info: java.util.Properties): Connection =
      if (acceptsURL(url)) newConnection() else null
    def acceptsURL(url: String): Boolean = url.startsWith("jdbc:fakemysql:")
    def getMajorVersion = 1
    def getMinorVersion = 0
    def getPropertyInfo(u: String, p: java.util.Properties) = Array.empty
    def jdbcCompliant() = false
    def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException
  })
  /** Touching the object runs the registration above. */
  def ensureRegistered(): Unit = ()

  private def deadlock(): SQLException =
    if (deadlockAsVendorCodeOnly)
      new SQLException("Deadlock found when trying to get lock", null, 1213)
    else
      new SQLException("Deadlock found when trying to get lock; " +
        "try restarting transaction", "40001", 1213)
  private def dup(key: Seq[Any]): SQLException =
    new SQLException(s"Duplicate entry '${key.mkString("-")}' for key 'PRIMARY'",
      "23000", 1062)

  private final class FakeSavepoint(val snap: Map[String, Map[Seq[Any], Seq[Any]]])
      extends Savepoint {
    def getSavepointId = 0
    def getSavepointName = "sp"
  }

  private final class ConnState {
    // overlay of CHANGED keys only (immutable maps, so savepoints are free
    // snapshots); reads fall through to the CURRENT committed state —
    // read-committed visibility, like MySQL's locking reads for
    // UPDATE/INSERT. Simplification vs real InnoDB: two uncommitted INSERTs
    // of the same new key don't block each other, the later commit wins —
    // the per-key outcome is still "exactly one writer's value".
    var txn: Map[String, Map[Seq[Any], Seq[Any]]] = Map.empty
    def read(name: String, key: Seq[Any]): Option[Seq[Any]] =
      txn.getOrElse(name, Map.empty).get(key).orElse(committed(name, key))
    def write(name: String, key: Seq[Any], vals: Seq[Any]): Unit =
      txn += name -> txn.getOrElse(name, Map.empty).updated(key, vals)
    def commit(): Unit = { publish(txn); txn = Map.empty }
    def rollbackAll(): Unit = txn = Map.empty
  }

  private val UpdateRe =
    "UPDATE (\\S+) SET (.+) WHERE (.+)".r
  private val InsertRe =
    "INSERT INTO (\\S+) \\((.+)\\) VALUES.*".r

  private def newConnection(): Connection = {
    val st = new ConnState
    Proxy.newProxyInstance(classOf[Connection].getClassLoader,
      Array(classOf[Connection]),
      (proxy, m, args) => m.getName match {
        case "setAutoCommit" | "close" | "clearWarnings" => null
        case "getAutoCommit" => java.lang.Boolean.FALSE
        case "isClosed" => java.lang.Boolean.FALSE
        case "prepareStatement" => newStatement(st, args(0).asInstanceOf[String])
        case "commit" => st.commit(); null
        case "rollback" if args == null || args.isEmpty => st.rollbackAll(); null
        case "rollback" =>
          st.txn = args(0).asInstanceOf[FakeSavepoint].snap; null
        case "setSavepoint" => new FakeSavepoint(st.txn)
        case "releaseSavepoint" => null
        case "toString" => "FakeMySqlConnection"
        case "hashCode" => Int.box(System.identityHashCode(st))
        case "equals" => Boolean.box(proxy eq args(0).asInstanceOf[AnyRef])
        case other => throw new UnsupportedOperationException(s"Connection.$other")
      }).asInstanceOf[Connection]
  }

  private def newStatement(st: ConnState, sql: String): PreparedStatement = {
    val params = mutable.Map[Int, Any]()
    val batch = mutable.Buffer[Seq[Any]]()
    def paramRow(): Seq[Any] =
      (1 to (if (params.isEmpty) 0 else params.keys.max)).map(params.getOrElse(_, null))

    // MySQL affected-rows: 1 only when the stored value actually CHANGES
    def runUpdate(table: String, nSet: Int, row: Seq[Any]): Int = {
      val (vals, key) = row.splitAt(nSet)
      st.read(table, key) match {
        case Some(existing) if existing == vals => 0
        case Some(_) => st.write(table, key, vals); 1
        case None => 0
      }
    }
    def runInsert(table: String, row: Seq[Any]): Int = {
      val (key, vals) = row.splitAt(keysOf(table))
      if (st.read(table, key).isDefined) throw dup(key)
      st.write(table, key, vals); 1
    }
    def runOne(row: Seq[Any]): Int = sql match {
      case UpdateRe(table, setPart, _) =>
        runUpdate(table, setPart.split(",").length, row)
      case InsertRe(table, _) => runInsert(table, row)
      case _ => throw new SQLException(s"unsupported SQL: $sql")
    }

    Proxy.newProxyInstance(classOf[PreparedStatement].getClassLoader,
      Array(classOf[PreparedStatement]),
      (proxy, m, args) => m.getName match {
        case "setObject" =>
          params(args(0).asInstanceOf[Integer].intValue()) = args(1); null
        case "addBatch" =>
          batch += paramRow(); params.clear(); null
        case "clearParameters" => params.clear(); null
        case "clearBatch" => batch.clear(); null
        case "executeBatch" =>
          val isUpdate = sql.startsWith("UPDATE")
          if (isUpdate && deadlocksToInject.get() > 0) {
            deadlocksToInject.decrementAndGet()
            throw deadlock()
          }
          val rows = batch.toSeq; batch.clear()
          val counts = new Array[Int](rows.size)
          rows.zipWithIndex.foreach { case (r, i) =>
            try counts(i) = runOne(r)
            catch { case e: SQLException =>
              // half-applied batch, MySQL-style report
              throw new java.sql.BatchUpdateException(
                e.getMessage, e.getSQLState, e.getErrorCode,
                counts.take(i), e)
            }
          }
          if (isUpdate && successNoInfo)
            Array.fill(rows.size)(java.sql.Statement.SUCCESS_NO_INFO)
          else counts
        case "executeUpdate" =>
          val row = paramRow(); params.clear()
          Int.box(runOne(row))
        case "close" => null
        case "toString" => s"FakeMySqlStatement($sql)"
        case "hashCode" => Int.box(System.identityHashCode(batch))
        case "equals" => Boolean.box(proxy eq args(0).asInstanceOf[AnyRef])
        case other => throw new UnsupportedOperationException(s"PreparedStatement.$other")
      }).asInstanceOf[PreparedStatement]
  }
}
