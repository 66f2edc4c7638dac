package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.gtfs._

/** Busy/idle rehearsal of the composed `automatic` mode (the reference's
  * main deployment loop, importer/mod.rs:295-344): realtime ingestion and
  * ST4 idle backfill alternate in ONE process — backfill advances only
  * while the stream is idle, the high-water mark moves monotonically, and
  * realtime processing resumes the moment files arrive. */
class AutomaticImportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val (schedDir, stagingRt) = GtfsFixtures.create()
  lazy val schedule: GtfsSchedule = GtfsSchedule.load(spark, schedDir)

  private def ms(nanos: Long): Long = nanos / 1000000L

  test("automatic mode: idle backfill + rt ingest alternate; hwm monotonic; backfill never runs against a backlog") {
    import spark.implicits._
    val base = Files.createTempDirectory("automatic").toString
    val rtDir = Files.createDirectories(java.nio.file.Paths.get(base, "rt")).toString
    val recordsDir = s"$base/records"
    val predictionsDir = s"$base/predictions"

    // curve tables from the staged batch import (cached: every ST4 batch
    // joins them, every rt trigger's fallback could too)
    val staged = Importer.importDirectory(spark, stagingRt, schedule, "test").cache()
    val sc = CurveAnalysis.specificCurves(spark, staged, schedule).cache()
    val dc = CurveAnalysis.defaultCurves(spark, staged, schedule).cache()
    sc.count(); dc.count()

    // injected clock: 2024-02-01 12:00 UTC — the fixture calendar runs all
    // of 2024, so the 7d12h buffer holds ~37 future trips
    val clock = new AtomicLong(
      java.time.LocalDateTime.of(2024, 2, 1, 12, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC))

    // idle progress events must flow quickly for the idle gate
    val prevNoData = spark.conf.get(
      "spark.sql.streaming.noDataProgressEventInterval", "10000ms")
    spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "1000ms")
    val auto = AutomaticImport.start(spark, rtDir, schedule, "test",
      recordsDir, predictionsDir, s"$base/ckpt", sc, dc,
      nowEpochSecs = () => clock.get(),
      triggerInterval = "500 milliseconds",
      idlePollMs = 200L, idleConfirmMs = 1200L,
      bufferFullBackoffSecs = 600L,
      maxFilesPerTrigger = 1,
      performCleanup = true) // the reference's --cleanup, proven in phase C
    try {
      // ---- phase A: empty rt dir → the idle branch backfills ----
      val deadlineA = System.nanoTime() + 120L * 1000000000L
      while (!auto.backfillEvents.exists(_.bufferFull)
          && System.nanoTime() < deadlineA) Thread.sleep(300)
      val phaseA = auto.backfillEvents
      assert(phaseA.exists(e => !e.bufferFull && e.tripCount > 0),
        s"idle phase must commit at least one trip-bearing ST4 batch: $phaseA")
      assert(phaseA.exists(_.bufferFull),
        s"the exhausted buffer must back off (PREDICTION_FULL_TIMEOUT): $phaseA")
      // hwm advances monotonically across the committed events
      val hwms = phaseA.filterNot(_.bufferFull).map(_.toHwm)
      assert(hwms == hwms.sorted && auto.highWaterMark == hwms.max,
        s"high-water mark must be monotonic: $hwms")
      assert(phaseA.filterNot(_.bufferFull)
        .forall(e => e.toHwm >= e.fromHwm), "no event may regress the mark")
      val schedRows = PredictionsTable.read(spark, predictionsDir)
        .filter(col("origin_type") === Codes.OriginSchedule)
      assert(schedRows.count() > 0, "schedule-origin predictions landed")
      // RAW base ∪ delta for the absence check: a realtime row hiding
      // un-compacted in the delta tree must fail it, not sit behind a
      // base-only read
      assert(LwwTable.readRaw(spark, predictionsDir)
        .filter(col("origin_type") === Codes.OriginRealtime).count() == 0,
        "no realtime rows before any rt file exists")

      // ---- phase B: a sustained rt backlog suppresses the backfill ----
      val pbs = new java.io.File(stagingRt).listFiles()
        .filter(_.getName.endsWith(".pb")).sortBy(_.getName).take(8)
      assert(pbs.length == 8, "fixture sanity")
      pbs.foreach(f => Files.copy(f.toPath,
        java.nio.file.Paths.get(rtDir, f.getName),
        StandardCopyOption.COPY_ATTRIBUTES))
      // drain = the stream has ingested all 8 files (1 per trigger) and
      // reports idle again. Progress is accumulated by batchId:
      // recentProgress is a ROLLING window (default 100 entries), so
      // summing it directly undercounts once data batches + 1 s no-data
      // events exceed the cap on a slow machine.
      val seenBatches = scala.collection.mutable.HashMap.empty[Long, Long]
      def ingested(): Long = {
        auto.query.recentProgress.foreach(p =>
          seenBatches(p.batchId) =
            math.max(seenBatches.getOrElse(p.batchId, 0L), p.numInputRows))
        seenBatches.values.sum
      }
      // Wait until the source has SEEN the backlog, then reopen the buffer:
      // phase A ended in a buffer-full back-off, and with the injected
      // clock frozen, `now >= backoffUntil` alone would suppress every
      // backfill decision — the "no decision during the backlog" assertion
      // below would hold vacuously even if busy detection were broken. With
      // the buffer OPEN and the back-off expired, the ONLY suppressor left
      // is the idle gate, which is the property under test.
      val seenDl = System.nanoTime() + 60L * 1000000000L
      while (!(auto.query.status.isDataAvailable || ingested() >= 1)
          && System.nanoTime() < seenDl) Thread.sleep(100)
      clock.addAndGet(86400L) // a day passes: buffer reopens, back-off over
      val tOpen = System.nanoTime()
      val deadlineB = System.nanoTime() + 180L * 1000000000L
      while ((ingested() < 8 || auto.query.status.isDataAvailable)
          && System.nanoTime() < deadlineB) Thread.sleep(300)
      val tDrain = System.nanoTime()
      assert(ingested() >= 8, s"rt backlog must drain, ingested=${ingested()}")
      assert(ms(tDrain - tOpen) > 4000,
        "rehearsal sanity: the open-buffer backlog window must be long enough " +
          s"to catch a backfill decision (got ${ms(tDrain - tOpen)} ms); raise the file count")
      // records + realtime predictions landed (the rt half worked)
      val recCount = RecordsTable.read(spark, recordsDir).count()
      assert(recCount > 0, "rt records upserted")
      assert(PredictionsTable.read(spark, predictionsDir)
        .filter(col("origin_type") === Codes.OriginRealtime).count() > 0,
        "realtime-origin predictions from the changed vehicles")
      // NO backfill decision inside the open-buffer backlog window. From
      // tOpen the source has already seen the backlog (waited for above),
      // the buffer is open and the back-off expired — a decision here can
      // only mean the idle gate fired against pending rt work. Margins: a
      // small lead for a decision already past its backoff check at the
      // clock advance, and 1.5 s at the end for the drain poll's
      // observation lag.
      val busyLo = tOpen + 500L * 1000000L
      val busyHi = tDrain - 1500L * 1000000L
      val inBusy = auto.backfillEvents
        .filter(e => e.decidedAtNanos > busyLo && e.decidedAtNanos < busyHi)
      assert(inBusy.isEmpty,
        s"backfill decided against a pending rt backlog: $inBusy")

      // ---- phase C: idle again + open buffer → backfill resumes ----
      clock.addAndGet(86400L) // another day: yet more buffer room
      val before = auto.backfillEvents.size
      val deadlineC = System.nanoTime() + 120L * 1000000000L
      while (!auto.backfillEvents.drop(before).exists(e =>
          !e.bufferFull && e.tripCount > 0 && e.decidedAtNanos > tDrain)
          && System.nanoTime() < deadlineC) Thread.sleep(300)
      val resumed = auto.backfillEvents.drop(before)
        .filter(e => !e.bufferFull && e.tripCount > 0 && e.decidedAtNanos > tDrain)
      assert(resumed.nonEmpty, "backfill must resume once the stream is idle " +
        s"and the buffer reopens: ${auto.backfillEvents}")
      assert(resumed.head.fromHwm >= hwms.max, "resumed from the advanced mark")

      // cleanup wiring (--cleanup): the rt files' January trips are months
      // before the injected clock, so the idle iteration that just resumed
      // must also have dropped their outdated prediction partitions, while
      // every future (backfilled) partition survives
      val deadlineD = System.nanoTime() + 60L * 1000000000L
      def janParts(): Array[java.io.File] = {
        val d = new java.io.File(s"$predictionsDir/source=test")
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("trip_start_date=2024-01-"))
      }
      while (janParts().nonEmpty && System.nanoTime() < deadlineD)
        Thread.sleep(300)
      assert(janParts().isEmpty,
        "outdated realtime-prediction partitions deleted by the loop's cleanup")
      assert(PredictionsTable.read(spark, predictionsDir)
        .filter(col("origin_type") === Codes.OriginSchedule).count() > 0,
        "future schedule-origin partitions survive the cleanup")
    } finally {
      auto.stop()
      spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", prevNoData)
    }

    // ---- restart: the mark recovers from the predictions table ----
    // (the reference re-derives it from the DB each iteration,
    // scheduled_predictions_importer.rs:81; recovery = the A15 max over
    // schedule-origin trip starts)
    val recovered = AutomaticImport.recoverHighWaterMark(spark, predictionsDir, "test")
    assert(recovered > 0 && recovered <= auto.highWaterMark,
      s"recovered mark $recovered must be a committed trip start ≤ ${auto.highWaterMark}")
    val keyCols = StreamingImport.PredictionKeyCols
    // the RESOLVED view is the restart-facing table; compact first so the
    // physical-uniqueness assertion exercises the fold, not just the window
    // (graceMs = 0: offline maintenance — the raw dir reads below must see
    // a physically clean base)
    PredictionsTable.compact(spark, predictionsDir, graceMs = 0L)
    val preA = spark.read.parquet(predictionsDir)
    val preCount = preA.count()
    assert(preA.select(keyCols.map(col): _*).distinct().count() == preCount,
      "compacted upsert key is unique before restart")
    // a restarted process re-advancing from the recovered mark must not
    // duplicate or shrink the stored predictions (idempotent re-cover of
    // the trailing window)
    ScheduledPredictions.advance(spark, schedule, "test", sc, dc,
      recovered, clock.get()).foreach { b =>
      if (b.tripCount > 0)
        StreamingImport.upsertTable(
          b.predictions.withColumn("refresh_seq",
            org.apache.spark.sql.functions.lit(AutomaticImport.BackfillSeq)),
          predictionsDir, keyCols, col("refresh_seq"))
    }
    PredictionsTable.compact(spark, predictionsDir, graceMs = 0L)
    val post = spark.read.parquet(predictionsDir)
    assert(post.count() >= preCount, "restart advance never shrinks the table")
    assert(post.select(keyCols.map(col): _*).distinct().count() == post.count(),
      "upsert key stays unique after the restart advance + compaction")
    staged.unpersist(); sc.unpersist(); dc.unpersist()
  }

  private val predCols = Seq("source", "trip_id", "trip_start_date",
    "trip_start_time", "stop_sequence", "event_type", "origin_type",
    "refresh_seq", "schedule_file_name")

  private def predRow(src: String, trip: String, origin: Int, seq: Long,
                      sched: String) =
    (src, trip, java.sql.Date.valueOf("2024-05-01"), 28800, 1, 1, origin,
      seq, sched)

  test("legacy constant-tier (-1) backfill rows normalize to the clock-tier floor") {
    import spark.implicits._
    val dir = Files.createTempDirectory("legacy_seq").toString + "/predictions"
    val keyCols = StreamingImport.PredictionKeyCols
    StreamingImport.upsertTable(
      Seq(predRow("a", "T1", Codes.OriginSchedule, AutomaticImport.BackfillSeq, "old_name"),
        predRow("a", "T2", Codes.OriginRealtime, 7L, "old_name"),
        predRow("b", "T3", Codes.OriginSchedule, AutomaticImport.BackfillSeq, "b_sched"))
        .toDF(predCols: _*), dir, keyCols, col("refresh_seq"))
    // an old-build table IS a compacted base (the delta layout postdates the
    // legacy tier), so fold the seed before the base-only normalization
    PredictionsTable.compact(spark, dir)
    // ADVICE r9 (medium): -1 outranks every clock-tier backfillSeq value,
    // so after a schedule rename (startFromStore -> startFromDirs upgrade)
    // the re-predicted rows would LOSE the LWW to the legacy rows and the
    // stale-schedule delete could then drop a still-valid trip entirely
    val n = AutomaticImport.normalizeLegacyBackfillSeq(spark, dir, "a")
    assert(n == 1, s"one legacy row of source a rewritten, got $n")
    // LIVE rows (the normalization retires the old base files through the
    // grace discipline; the rewritten rows enter as delta)
    val after = LwwTable.readRaw(spark, dir)
    assert(after.filter(col("trip_id") === "T1").head().getAs[Long]("refresh_seq")
      == AutomaticImport.backfillSeq(0L), "legacy row floored to the tier minimum")
    assert(after.filter(col("trip_id") === "T2").head().getAs[Long]("refresh_seq")
      == 7L, "realtime row rides along unchanged")
    assert(after.filter(col("trip_id") === "T3").head().getAs[Long]("refresh_seq")
      == AutomaticImport.BackfillSeq, "other source's partitions untouched")
    // a post-upgrade re-prediction under the new schedule name now WINS
    StreamingImport.upsertTable(
      Seq(predRow("a", "T1", Codes.OriginSchedule,
        AutomaticImport.backfillSeq(1700000000L), "new_name")).toDF(predCols: _*),
      dir, keyCols, AutomaticImport.backfillOrdering("new_name"))
    val t1 = PredictionsTable.read(spark, dir, Some("new_name"))
      .filter(col("trip_id") === "T1").collect()
    assert(t1.length == 1 && t1.head.getAs[String]("schedule_file_name") == "new_name",
      "clock-tier re-prediction beats the normalized legacy row")
    // steady state: the probe finds nothing and no partition is rewritten
    assert(AutomaticImport.normalizeLegacyBackfillSeq(spark, dir, "a") == 0L)
  }

  test("backfill sequence ties break toward the current schedule version") {
    import spark.implicits._
    val dir = Files.createTempDirectory("seq_tie").toString + "/predictions"
    val keyCols = StreamingImport.PredictionKeyCols
    val seq = AutomaticImport.backfillSeq(1700000000L)
    // a swap detected in the SAME epoch second as the old version's last
    // committed batch (injected clocks that do not advance): identical
    // refresh_seq, different schedule_file_name — ordering by the sequence
    // alone would leave the pick to shuffle order, and the stale delete
    // could then remove whichever row happened to win
    StreamingImport.upsertTable(
      Seq(predRow("a", "T1", Codes.OriginSchedule, seq, "v1")).toDF(predCols: _*),
      dir, keyCols, AutomaticImport.backfillOrdering("v1"))
    StreamingImport.upsertTable(
      Seq(predRow("a", "T1", Codes.OriginSchedule, seq, "v2")).toDF(predCols: _*),
      dir, keyCols, AutomaticImport.backfillOrdering("v2"))
    def t1Rows() = PredictionsTable.read(spark, dir, Some("v2"))
      .filter(col("trip_id") === "T1").collect()
    val t1 = t1Rows()
    assert(t1.length == 1 && t1.head.getAs[String]("schedule_file_name") == "v2",
      s"current version wins the tie deterministically: ${t1.toSeq}")
    // the physical fold must collapse the tie exactly as the readers do —
    // a compaction ordered without the version preference could keep the
    // v1 row and let the stale delete remove the surviving prediction
    PredictionsTable.compact(spark, dir, Some("v2"))
    val t1c = t1Rows()
    assert(t1c.length == 1 && t1c.head.getAs[String]("schedule_file_name") == "v2",
      s"compaction collapses the tie toward the current version: ${t1c.toSeq}")
    // realtime rows decide on the first field alone: a backfill write never
    // displaces a realtime row even when the version preference favors it
    StreamingImport.upsertTable(
      Seq(predRow("a", "T9", Codes.OriginRealtime, 3L, "v1")).toDF(predCols: _*),
      dir, keyCols, col("refresh_seq"))
    StreamingImport.upsertTable(
      Seq(predRow("a", "T9", Codes.OriginSchedule, seq, "v2")).toDF(predCols: _*),
      dir, keyCols, AutomaticImport.backfillOrdering("v2"))
    val t9 = PredictionsTable.read(spark, dir, Some("v2"))
      .filter(col("trip_id") === "T9").collect()
    assert(t9.length == 1 && t9.head.getAs[Int]("origin_type") == Codes.OriginRealtime,
      "realtime tier still outranks the whole backfill tier")
  }
}
