package graft.sinks

import java.sql.DriverManager
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Integration test against embedded Derby (on the Spark unmanaged
  * classpath) — proves the S13/S14 JDBC export contract: batched keyed
  * upsert, replay idempotence, last-writer-wins across batches. */
class JdbcUpsertSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val url = "jdbc:derby:memory:graft_upsert;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def queryAll(): Map[(String, Int), (Int, String)] = withConn { c =>
    val rs = c.createStatement().executeQuery(
      "SELECT trip_id, stop_sequence, delay, src FROM records_sink")
    val b = Map.newBuilder[(String, Int), (Int, String)]
    while (rs.next())
      b += (rs.getString(1), rs.getInt(2)) -> ((rs.getInt(3), rs.getString(4)))
    b.result()
  }

  test("batched upsert: insert, update, replay idempotence, LWW (S13/S14)") {
    import spark.implicits._
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    withConn { c =>
      c.createStatement().execute(
        """CREATE TABLE records_sink (
             trip_id VARCHAR(32) NOT NULL,
             stop_sequence INT NOT NULL,
             delay INT,
             src VARCHAR(32),
             PRIMARY KEY (trip_id, stop_sequence))""")
    }
    val cfg = JdbcUpsert.Config(url, "records_sink",
      keyCols = Seq("trip_id", "stop_sequence"),
      valueCols = Seq("delay", "src"),
      batchSize = 3, // force several batches per partition
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))

    // batch 1: 10 fresh rows across 4 partitions
    val b1 = (1 to 10).map(i => (s"T${i % 3}", i, i * 10, "b1"))
      .toDF("trip_id", "stop_sequence", "delay", "src")
    JdbcUpsert.upsert(b1, cfg)
    assert(queryAll().size == 10, "all rows inserted")
    assert(queryAll()(("T1", 1)) == ((10, "b1")))

    // batch 2: 5 overlapping keys with new values + 3 new keys
    val b2 = ((1 to 5).map(i => (s"T${i % 3}", i, i * 100, "b2"))
      ++ (11 to 13).map(i => (s"T${i % 3}", i, i * 10, "b2")))
      .toDF("trip_id", "stop_sequence", "delay", "src")
    JdbcUpsert.upsert(b2, cfg)
    val after2 = queryAll()
    assert(after2.size == 13, "3 new rows, 5 updated in place")
    assert(after2(("T1", 1)) == ((100, "b2")), "overlapping key took batch-2 value (LWW)")
    assert(after2(("T0", 6)) == ((60, "b1")), "untouched key keeps batch-1 value")

    // replay batch 2 (task retry / at-least-once upstream): no duplicates,
    // same final state
    JdbcUpsert.upsert(b2, cfg)
    assert(queryAll() == after2, "replay is idempotent")

    // streaming micro-batch path: duplicate keys inside one batch reduce to
    // the newest time_of_recording before hitting JDBC (W2)
    val dup = Seq(
      ("T8", 1, 111, "old", java.sql.Timestamp.valueOf("2024-01-01 08:00:00")),
      ("T8", 1, 222, "new", java.sql.Timestamp.valueOf("2024-01-01 09:00:00")))
      .toDF("trip_id", "stop_sequence", "delay", "src", "time_of_recording")
    graft.streaming.StreamingImport.upsertBatchJdbc(dup, cfg)
    assert(queryAll()(("T8", 1)) == ((222, "new")), "newest recording wins in-batch")

    // null value column round-trips
    val b3 = Seq(("T9", 99, null.asInstanceOf[Integer], "b3"))
      .toDF("trip_id", "stop_sequence", "delay", "src")
    JdbcUpsert.upsert(b3, cfg)
    assert(withConn { c =>
      val rs = c.createStatement().executeQuery(
        "SELECT delay FROM records_sink WHERE trip_id = 'T9'")
      rs.next(); rs.getObject(1) == null
    })
  }

  // ---- MySQL-semantics branches via the in-memory FakeMySql driver ----
  // (no MySQL/H2 jar exists on the offline classpath; the fake implements
  // the DIALECT behaviors Derby cannot produce — changed-row counts,
  // SUCCESS_NO_INFO, 1213 deadlocks, 23000 duplicates)

  private def mysqlCfg(maxRetries: Int = 5) = JdbcUpsert.Config(
    FakeMySql.Url, "mysql_sink",
    keyCols = Seq("trip_id", "stop_sequence"),
    valueCols = Seq("delay", "src"),
    maxRetries = maxRetries, retryDelayMs = 1)

  private def mysqlFixture(): Unit = {
    FakeMySql.ensureRegistered()
    FakeMySql.reset()
    FakeMySql.createTable("mysql_sink", keys = 2)
    FakeMySql.seed("mysql_sink", Map(
      Seq[Any]("T1", 1) -> Seq[Any](10, "old"),   // will arrive UNCHANGED
      Seq[Any]("T2", 2) -> Seq[Any](20, "keep"))) // will arrive changed
  }

  // row order matters: the first missed row is NEW, so the INSERT batch
  // half-applies before hitting the duplicate — exercising the savepoint
  // rollback + per-row INSERT-IGNORE re-run, not just the throw
  private def mysqlBatch = {
    import spark.implicits._
    Seq(
      ("T0", 0, 5, "ins1"),  // new → UPDATE count 0 → INSERT leg
      ("T1", 1, 10, "old"),  // matched but IDENTICAL → changed-rows count 0 → dup on INSERT → ignored
      ("T2", 2, 99, "new2"), // matched and changed → UPDATE count 1
      ("T4", 4, 40, "ins2")) // new → INSERT leg, after the duplicate
      .toDF("trip_id", "stop_sequence", "delay", "src").coalesce(1)
  }
  private val mysqlExpected = Map(
    Seq[Any]("T0", 0) -> Seq[Any](5, "ins1"),
    Seq[Any]("T1", 1) -> Seq[Any](10, "old"),
    Seq[Any]("T2", 2) -> Seq[Any](99, "new2"),
    Seq[Any]("T4", 4) -> Seq[Any](40, "ins2"))

  test("MySQL semantics: changed-row counts route unchanged rows through INSERT IGNORE") {
    mysqlFixture()
    JdbcUpsert.upsert(mysqlBatch, mysqlCfg())
    assert(FakeMySql.rows("mysql_sink") == mysqlExpected)
  }

  test("MySQL semantics: SUCCESS_NO_INFO batches re-run per row for exact counts") {
    mysqlFixture()
    FakeMySql.successNoInfo = true
    JdbcUpsert.upsert(mysqlBatch, mysqlCfg())
    assert(FakeMySql.rows("mysql_sink") == mysqlExpected)
  }

  test("MySQL semantics: 1213/40001 deadlocks retry with backoff and converge") {
    mysqlFixture()
    FakeMySql.deadlocksToInject.set(2)
    JdbcUpsert.upsert(mysqlBatch, mysqlCfg())
    assert(FakeMySql.deadlocksToInject.get() == 0, "both deadlocks consumed")
    assert(FakeMySql.rows("mysql_sink") == mysqlExpected)
  }

  test("MySQL semantics: bare vendor code 1213 (no SQLSTATE) still retries") {
    mysqlFixture()
    FakeMySql.deadlockAsVendorCodeOnly = true
    FakeMySql.deadlocksToInject.set(1)
    JdbcUpsert.upsert(mysqlBatch, mysqlCfg())
    assert(FakeMySql.rows("mysql_sink") == mysqlExpected)
  }

  test("MySQL semantics: deadlock past maxRetries surfaces the SQLException") {
    mysqlFixture()
    FakeMySql.deadlocksToInject.set(99)
    val e = intercept[Exception](JdbcUpsert.upsert(mysqlBatch, mysqlCfg(maxRetries = 2)))
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists {
      case s: java.sql.SQLException => s.getErrorCode == 1213
      case _ => false
    }, s"expected a 1213 SQLException in the cause chain, got $e")
  }

  // ---- concurrent writers: the retry/convergence contract under REAL
  // interleaving, not single-threaded replay ----

  private def inThreads(bodies: (() => Unit)*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = bodies.zipWithIndex.map { case (b, i) =>
      val t = new Thread(() => try b() catch { case e: Throwable => errs.add(e) },
        s"upsert-writer-$i")
      t.start(); t
    }
    ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"writer thread failed: ${errs.peek()}")
  }

  test("concurrent overlapping writers with injected deadlocks converge per key (FakeMySql)") {
    import spark.implicits._
    FakeMySql.ensureRegistered()
    FakeMySql.reset()
    FakeMySql.createTable("mysql_conc", keys = 1)
    // both writers hit the SAME 100 keys with different values; four
    // deadlocks land on whichever writer's batches come first and must be
    // retried away under the real interleaving
    FakeMySql.deadlocksToInject.set(4)
    val cfg = JdbcUpsert.Config(FakeMySql.Url, "mysql_conc",
      keyCols = Seq("k"), valueCols = Seq("src"),
      batchSize = 16, maxRetries = 8, retryDelayMs = 1)
    def df(writer: String) = (0 until 100).map(k => (f"K$k%03d", writer))
      .toDF("k", "src").repartition(4)
    inThreads(
      () => JdbcUpsert.upsert(df("A"), cfg),
      () => JdbcUpsert.upsert(df("B"), cfg))
    assert(FakeMySql.deadlocksToInject.get() == 0, "all injected deadlocks consumed")
    val rows = FakeMySql.rows("mysql_conc")
    assert(rows.size == 100, s"every key present exactly once, got ${rows.size}")
    assert(rows.values.forall(v => v == Seq("A") || v == Seq("B")),
      s"each key holds exactly one writer's value: ${rows.values.toSet}")
    // a later deterministic pass is a clean last writer over every key
    JdbcUpsert.upsert(df("C"), cfg)
    assert(FakeMySql.rows("mysql_conc").values.forall(_ == Seq("C")),
      "the final writer wins every key")
  }

  test("concurrent overlapping writers converge on Derby (real row locks)") {
    import spark.implicits._
    // real lock interleaving on a real engine: blocked UPDATEs, INSERT
    // races resolved by the sink's per-row INSERT-IGNORE leg, and any
    // genuine 40001 deadlock retried. Short waits keep a detected
    // deadlock from stalling the suite.
    System.setProperty("derby.locks.deadlockTimeout", "1")
    System.setProperty("derby.locks.waitTimeout", "30")
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    withConn { c =>
      c.createStatement().execute(
        """CREATE TABLE conc_sink (
             k VARCHAR(16) NOT NULL PRIMARY KEY,
             src VARCHAR(16))""")
    }
    val cfg = JdbcUpsert.Config(url, "conc_sink",
      keyCols = Seq("k"), valueCols = Seq("src"),
      batchSize = 8, maxRetries = 8, retryDelayMs = 5,
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))
    def df(writer: String) = (0 until 60).map(k => (f"K$k%03d", writer))
      .toDF("k", "src").repartition(3)
    inThreads(
      () => JdbcUpsert.upsert(df("A"), cfg),
      () => JdbcUpsert.upsert(df("B"), cfg))
    val stored = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT k, src FROM conc_sink")
      val b = Map.newBuilder[String, String]
      while (rs.next()) b += rs.getString(1) -> rs.getString(2)
      b.result()
    }
    assert(stored.size == 60, s"every key present exactly once, got ${stored.size}")
    assert(stored.values.forall(v => v == "A" || v == "B"),
      s"each key holds one writer's value: ${stored.values.toSet}")
    JdbcUpsert.upsert(df("C"), cfg)
    val after = withConn { c =>
      val rs = c.createStatement().executeQuery(
        "SELECT COUNT(*) FROM conc_sink WHERE src = 'C'")
      rs.next(); rs.getInt(1)
    }
    assert(after == 60, "the final writer wins every key")
  }
}
