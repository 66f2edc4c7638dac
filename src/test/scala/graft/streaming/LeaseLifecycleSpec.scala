package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gtfs._

/** Lease lifecycle hardening around the automatic mode (ADVICE r14):
  * a constructor that fails AFTER acquiring a lease must not leave it
  * blocking a replacement writer until ttl expiry, and a TRANSIENT
  * heartbeat failure (an FS hiccup, setTimes racing a takeover's claim)
  * must not kill the backfill loop thread while the stream keeps running
  * — that mode would ingest forever with no folds, no cleanup, no
  * heartbeats, and the lease would expire under a live writer. */
class LeaseLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val (schedDir, _) = GtfsFixtures.create()
  lazy val schedule: GtfsSchedule = GtfsSchedule.load(spark, schedDir)

  private def waitFor(cond: => Boolean, what: String,
      timeoutMs: Long = 60000L): Unit = {
    val dl = System.nanoTime() + timeoutMs * 1000000L
    while (!cond && System.nanoTime() < dl) Thread.sleep(100)
    assert(cond, s"timed out waiting for $what")
  }

  test("a constructor failure past the first acquire releases it — no lease blocks with no writer running") {
    import spark.implicits._
    val base = Files.createTempDirectory("lease_ctor").toString
    val rtDir = Files.createDirectories(java.nio.file.Paths.get(base, "rt")).toString
    val recordsDir = s"$base/records"
    val predictionsDir = s"$base/predictions"
    // a FOREIGN writer holds the predictions table: the second acquire in
    // the constructor must refuse — and the already-acquired records lease
    // must be released on the way out, not left to ttl/shutdown-hook
    val gc = new java.io.File(s"$predictionsDir/_gc"); gc.mkdirs()
    Files.write(new java.io.File(gc, WriterLease.LeaseFileName).toPath,
      s"foreign-${java.util.UUID.randomUUID()}\n600000\n".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](
      AutomaticImport.start(spark, rtDir, schedule, "test",
        recordsDir, predictionsDir, s"$base/ckpt",
        spark.emptyDataset[SpecificCurveRow], spark.emptyDataset[DefaultCurveRow],
        triggerInterval = "500 milliseconds",
        idlePollMs = 200L, idleConfirmMs = 120000L))
    assert(e.getMessage.contains("another writer process holds the lease"))
    assert(!new java.io.File(
      s"$recordsDir/_gc/${WriterLease.LeaseFileName}").exists(),
      "the records lease acquired before the failure is released, not leaked")
    // a replacement writer on recordsDir starts instantly
    WriterLease.acquire(spark, recordsDir).release()
  }

  test("a query-start failure AFTER both acquires releases both leases (whole-startup guard)") {
    // ADVICE r15: the release-on-failure used to live inside individual
    // constructor initializers — a throw from the streaming query's own
    // startup (or any later construction step) still leaked both leases to
    // the shutdown hook or ttl. The factories now run acquire → start →
    // construct under ONE guard. Injected by a nonexistent rt directory:
    // the stream source's path check throws at query start, after both
    // leases are held.
    import spark.implicits._
    val base = Files.createTempDirectory("lease_qstart").toString
    val recordsDir = s"$base/records"
    val predictionsDir = s"$base/predictions"
    intercept[Exception](
      AutomaticImport.start(spark, s"$base/does_not_exist", schedule, "test",
        recordsDir, predictionsDir, s"$base/ckpt",
        spark.emptyDataset[SpecificCurveRow], spark.emptyDataset[DefaultCurveRow],
        triggerInterval = "500 milliseconds",
        idlePollMs = 200L, idleConfirmMs = 120000L))
    for (d <- Seq(recordsDir, predictionsDir))
      assert(!new java.io.File(s"$d/_gc/${WriterLease.LeaseFileName}").exists(),
        s"the lease on $d is released when the query fails to start")
    // replacement writers start instantly on both tables
    for (d <- Seq(recordsDir, predictionsDir))
      WriterLease.acquire(spark, d).release()
  }

  test("a transient heartbeat failure is retried — the loop survives and later heartbeats land") {
    import spark.implicits._
    val base = Files.createTempDirectory("lease_hb").toString
    val rtDir = Files.createDirectories(java.nio.file.Paths.get(base, "rt")).toString
    val recordsDir = s"$base/records"
    val predictionsDir = s"$base/predictions"
    val failures = new AtomicInteger(0)
    // the seam fires inside renew(), between the ownership check and the
    // mtime bump — throwing here surfaces to the heartbeat exactly like a
    // transient setTimes/read IO error would. Set BEFORE start so the
    // loop's fast pre-idle iterations (idlePollMs cadence) hit it; the
    // short idleConfirmMs keeps heartbeats flowing once the stream idles
    // (the loop heartbeats once per iteration).
    WriterLease.renewRaceHook = _ => {
      failures.incrementAndGet()
      throw new java.io.IOException("transient FS hiccup (injected)")
    }
    val auto = AutomaticImport.start(spark, rtDir, schedule, "test",
      recordsDir, predictionsDir, s"$base/ckpt",
      spark.emptyDataset[SpecificCurveRow], spark.emptyDataset[DefaultCurveRow],
      triggerInterval = "500 milliseconds",
      idlePollMs = 100L, idleConfirmMs = 2000L)
    try {
      try {
        waitFor(failures.get() >= 3, "several heartbeat failures")
        assert(auto.query.isActive,
          "the mode must not stop on transient heartbeat errors")
      } finally WriterLease.renewRaceHook = _ => ()
      // the loop thread is still alive: subsequent heartbeats succeed and
      // keep bumping the lease mtime
      val leaseFile = new java.io.File(
        s"$recordsDir/_gc/${WriterLease.LeaseFileName}")
      assert(leaseFile.exists())
      val m0 = leaseFile.lastModified()
      waitFor(leaseFile.lastModified() > m0,
        "a post-recovery heartbeat bumping the lease mtime")
      assert(auto.query.isActive)
    } finally {
      WriterLease.renewRaceHook = _ => ()
      auto.stop()
    }
  }
}
