package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.gtfs._

/** VERDICT r13 #2: a writer that crashes with retirement manifests pending
  * leaves retired files holding disk — and every reader paying manifest
  * parsing + explicit-file listing — until the next fold happens to run.
  * Both long-running writer entry points now clear the backlog at startup:
  * the automatic mode in its recovery block (grace-aged — another process's
  * in-flight reader keeps its window across this writer's restart), batch
  * mode at `runBatch` entry (whole — the graceMs = 0 contract says batch
  * mode owns every reader). */
class StartupGcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val (schedDir, stagingRt) = GtfsFixtures.create()
  lazy val schedule: GtfsSchedule = GtfsSchedule.load(spark, schedDir)

  private val keyCols = Seq("source", "trip_id", "trip_start_date")

  private def df(rows: (String, String, String, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.map { case (s, t, d, p, q) =>
      (s, t, java.sql.Date.valueOf(d), p, q)
    }.toDF("source", "trip_id", "trip_start_date", "payload", "seq")
  }

  /** Renames every pending manifest so its embedded commit timestamp is
    * `ageMs` in the past — the shape a crashed writer's backlog has by the
    * time a replacement starts. */
  private def ageManifests(tableDir: String, ageMs: Long): Unit = {
    val gc = new java.io.File(s"$tableDir/_gc")
    gc.listFiles().filter(_.getName.startsWith("retire-")).foreach { f =>
      val aged = f.getName.replaceFirst("retire-\\d+",
        s"retire-${System.currentTimeMillis() - ageMs}")
      assert(f.renameTo(new java.io.File(gc, aged)))
    }
  }

  test("automatic-mode startup clears a crashed writer's grace-expired backlog before any trigger") {
    import spark.implicits._
    val base = Files.createTempDirectory("startup_gc_auto").toString
    val rtDir = Files.createDirectories(java.nio.file.Paths.get(base, "rt")).toString
    val recordsDir = s"$base/records"
    val predictionsDir = s"$base/predictions"
    // the crashed writer's table: a fold left a pending manifest, then the
    // process died — no GC ever ran, the retired file still holds disk
    LwwTable.append(df(("test", "T1", "2024-01-01", "old", 1L)), recordsDir,
      keyCols, col("seq"))
    LwwTable.compact(spark, recordsDir, keyCols, col("seq"), graceMs = 0L)
    LwwTable.append(df(("test", "T1", "2024-01-01", "new", 2L)), recordsDir,
      keyCols, col("seq"))
    LwwTable.compact(spark, recordsDir, keyCols, col("seq"), graceMs = 600000L)
    assert(LwwTable.pendingRetirements(spark, recordsDir))
    ageManifests(recordsDir, ageMs = LwwTable.DefaultGraceMs + 100000L)
    // idleConfirmMs is LARGE: the idle-branch fold (which also GCs) cannot
    // fire before the assertions below — only the construction-time
    // recovery GC can have cleared the backlog
    val auto = AutomaticImport.start(spark, rtDir, schedule, "test",
      recordsDir, predictionsDir, s"$base/ckpt",
      spark.emptyDataset[SpecificCurveRow], spark.emptyDataset[DefaultCurveRow],
      triggerInterval = "500 milliseconds",
      idlePollMs = 200L, idleConfirmMs = 120000L)
    try {
      assert(!LwwTable.pendingRetirements(spark, recordsDir),
        "the recovery block cleared the grace-expired backlog at startup")
      assert(spark.read.parquet(recordsDir).count() == 1,
        "the retired duplicates are physically gone — plain key-unique base")
      assert(RecordsTable.read(spark, recordsDir)
        .select("payload").head().getString(0) == "new")
    } finally auto.stop()
    // stop() released the writer leases: a later writer acquires freely
    WriterLease.acquire(spark, recordsDir).release()
  }

  test("runBatch clears a crashed previous run's backlog at entry and exits with none") {
    val recordsDir = Files.createTempDirectory("startup_gc_batch").toString + "/records"
    val ckpt = Files.createTempDirectory("startup_gc_ckpt").toString
    StreamingImport.runBatch(spark, rtDir = stagingRt, schedule, "test",
      recordsDir, ckpt)
    val rows = spark.read.parquet(recordsDir).count()
    assert(rows > 0)
    // a fold that committed its manifest but died before GC (age is
    // irrelevant at runBatch entry — batch mode owns every reader, so the
    // whole backlog clears regardless of grace)
    val one = RecordsTable.read(spark, recordsDir).limit(1)
    RecordsTable.append(one, recordsDir)
    RecordsTable.compact(spark, recordsDir, graceMs = 600000L)
    assert(LwwTable.pendingRetirements(spark, recordsDir))
    StreamingImport.runBatch(spark, rtDir = stagingRt, schedule, "test",
      recordsDir, ckpt)
    assert(!LwwTable.pendingRetirements(spark, recordsDir),
      "runBatch leaves no pending retirements")
    assert(LwwTable.deltaFileCount(spark, recordsDir) == 0)
    assert(spark.read.parquet(recordsDir).count() == rows,
      "the re-run converged to the same physical row set")
  }
}
