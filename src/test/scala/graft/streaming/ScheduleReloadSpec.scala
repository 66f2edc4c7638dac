package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.gtfs._

/** Mid-run schedule-drop rehearsal of the hot-reloading automatic mode
  * (VERDICT r8 #1): the reference re-scans `dir/schedule` every 5 s and
  * reloads a changed schedule through its mtime FileCache
  * (importer/mod.rs:361-460, main.rs:321-393) — so a GTFS version published
  * while the loop runs takes effect without a restart, old-dated rt files
  * keep their old schedule (J6), the backfill re-predicts the buffer window
  * with the new version, and the old version's schedule-origin rows inside
  * the re-predicted window are deleted (`delete_outdated_predictions`,
  * scheduled_predictions_importer.rs:234-265). */
class ScheduleReloadSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Polls `cond`, treating a read-side AnalysisException as "not yet": a
    * concurrent upsert creates the table directory (staging files) before
    * any data file commits, and spark.read.parquet on it throws
    * UNABLE_TO_INFER_SCHEMA until the first commit lands. */
  private def await(timeoutSecs: Long)(cond: => Boolean): Boolean = {
    // a read that raced a concurrent SWAP of a non-LWW tree (the schedule
    // directory, a curve store overwrite): the LWW tables themselves are
    // race-free under the retirement/grace discipline, but the schedule
    // tree is replaced by rename and a footer read can still lose a file
    // between plan and scan there
    def raced(t: Throwable, depth: Int = 0): Boolean = t match {
      case null => false
      case _ if depth >= 16 => false
      case _: java.io.FileNotFoundException => true
      case e => (Option(e.getMessage).exists(_.contains("FAILED_READ_FILE"))
        || raced(e.getCause, depth + 1))
    }
    def softCond: Boolean =
      try cond
      catch {
        // UNABLE_TO_INFER_SCHEMA before the first commit lands
        case _: org.apache.spark.sql.AnalysisException => false
        case e: org.apache.spark.SparkException if raced(e) => false
        // a listed directory deleted (stale-schedule retirement / cleanup)
        // before the scan opened it
        case _: java.io.IOException => false
      }
    val dl = System.nanoTime() + timeoutSecs * 1000000000L
    // capture the last evaluation — re-evaluating after the loop could
    // catch a DIFFERENT (mid-swap) snapshot and report false for a
    // condition that was just observed true
    var ok = softCond
    while (!ok && System.nanoTime() < dl) { Thread.sleep(300); ok = softCond }
    ok
  }

  test("a schedule version dropped mid-run takes effect without restart") {
    val base = Files.createTempDirectory("hotreload")
    val schedParent = base.resolve("schedule"); Files.createDirectories(schedParent)
    val v1Dir = schedParent.resolve("2024-01-01"); Files.createDirectories(v1Dir)
    FixtureGen.writeSchedule(v1Dir)
    val stagingRt = base.resolve("staging"); Files.createDirectories(stagingRt)
    FixtureGen.writeRtFiles(stagingRt)
    val rtDir = Files.createDirectories(base.resolve("rt")).toString
    val recordsDir = s"$base/records"
    val predictionsDir = s"$base/predictions"

    // curve STORE from a batch pass against v1 (the automatic mode's input)
    val schedule1 = GtfsSchedule.load(spark, v1Dir.toString)
    val staged = Importer.importDirectory(spark, stagingRt.toString, schedule1, "test").cache()
    val sc = CurveAnalysis.specificCurves(spark, staged, schedule1).cache()
    val dc = CurveAnalysis.defaultCurves(spark, staged, schedule1).cache()
    CurveStore.saveSpecific(sc, s"$base/curves/specific")
    CurveStore.saveDefault(dc, s"$base/curves/default")
    staged.unpersist(); sc.unpersist(); dc.unpersist(); schedule1.unpersist()

    def copyRt(name: String): Unit = Files.copy(stagingRt.resolve(name),
      Paths.get(rtDir, name), StandardCopyOption.COPY_ATTRIBUTES)

    // injected clock: 2024-02-01 12:00 UTC
    val clock = new AtomicLong(
      java.time.LocalDateTime.of(2024, 2, 1, 12, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC))
    val prevNoData = spark.conf.get(
      "spark.sql.streaming.noDataProgressEventInterval", "10000ms")
    spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "1000ms")
    // the FULL deployment in one process: the monitor serves the LIVE
    // tables while the importer writes them — schedule through its own
    // ScheduleCache over the same tree, predictions re-read per request (a
    // pinned DataFrame's file-index snapshot would point at deleted files
    // after the first dynamic partition overwrite), races retried once.
    // Started BEFORE the importer so a server-construction failure cannot
    // leak a running streaming query outside the try/finally below.
    val monCache = new ScheduleCache(spark, schedParent.toString)
    val monitor = new graft.serving.MonitorServer(spark,
      () => monCache.newest().map(_._2),
      () => PredictionsTable.read(spark, predictionsDir,
        monCache.newest().map(_._1)), scheduleTtlMs = 0L)
    val monPort = monitor.start()
    val http = java.net.http.HttpClient.newHttpClient()
    def page(path: String): java.net.http.HttpResponse[String] =
      http.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$monPort$path")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
    val auto = AutomaticImport.startFromDirs(spark, rtDir, schedParent.toString,
      "test", recordsDir, predictionsDir, s"$base/ckpt",
      s"$base/curves/specific", s"$base/curves/default",
      nowEpochSecs = () => clock.get(),
      triggerInterval = "500 milliseconds",
      idlePollMs = 200L, idleConfirmMs = 1200L,
      bufferFullBackoffSecs = 600L,
      maxFilesPerTrigger = 1)
    try {
      def records() = RecordsTable.read(spark, recordsDir)
      def predictions() = PredictionsTable.read(spark, predictionsDir,
        Some("2024-02-15")) // resolved view; v2 is current from phase 2 on,
                            // and before the swap no key ties on the version
      def schedOrigin(name: String) = predictions()
        .filter(col("origin_type") === Codes.OriginSchedule
          && col("schedule_file_name") === name)

      // ---- phase 1: rt under v1 + one committed v1 backfill batch ----
      copyRt("2024-01-05-feed.pb")
      assert(await(120)(new java.io.File(recordsDir).exists()
          && records().filter(col("trip_start_date") === "2024-01-05").count() > 0),
        "v1-era rt file ingested")
      assert(await(60)(records().filter(col("trip_start_date") === "2024-01-05")
        .select("schedule_file_name").distinct().collect().map(_.getString(0)).toSeq
        == Seq("2024-01-01")), "v1-era records carry the v1 version name (J6)")
      assert(await(120)(auto.backfillEvents.exists(e => !e.bufferFull && e.tripCount > 0)),
        s"v1 backfill must commit: ${auto.backfillEvents}")
      val hwmV1 = auto.highWaterMark
      // await, not a one-shot count: the stream/backfill concurrently
      // dynamic-overwrites these partitions, and a read mid-swap sees an
      // empty directory listing
      assert(hwmV1 > 0 && await(60)(schedOrigin("2024-01-01").count() > 0),
        "v1 schedule-origin predictions landed")
      val rtPredsBefore = predictions()
        .filter(col("origin_type") === Codes.OriginRealtime).count()
      // the live monitor serves from the table the importer just wrote and
      // keeps writing (fresh per-request read + the bounded race retry),
      // and resolves trips against the CURRENT schedule (v1: T1 departs
      // Stop 1 at 08:00)
      assert(await(60) {
        val r = page("/02.02.24%2008:00/Stop%202/")
        r.statusCode() == 200 && r.body().contains("<h1>Stop 2</h1>")
      }, "live stop page serves while the importer runs")
      assert(await(60)(page(
        "/02.02.24%2008:00/Stop%201/Bus%2010%20nach%20Downtown%20um%2008:00/")
        .statusCode() == 200), "v1 descriptor resolves on the live monitor")

      // ---- phase 2: drop v2 ATOMICALLY mid-run; mixed-date rt backlog ----
      val tmpV2 = Files.createDirectories(base.resolve("incoming_v2"))
      FixtureGen.writeSchedule(tmpV2, version = 2)
      Files.move(tmpV2, schedParent.resolve("2024-02-15"),
        StandardCopyOption.ATOMIC_MOVE)
      copyRt("2024-02-20-feed.pb") // dated after v2 -> joins v2
      copyRt("2024-01-10-feed.pb") // old-dated -> KEEPS v1
      assert(await(120)(new java.io.File(recordsDir).exists()
          && records().filter(col("trip_start_date") === "2024-02-20").count() > 0
          && records().filter(col("trip_start_date") === "2024-01-10").count() > 0),
        "both rt files of the mixed-date backlog ingested")
      assert(await(60)(records().filter(col("trip_start_date") === "2024-02-20")
        .select("schedule_file_name").distinct().collect().map(_.getString(0)).toSeq
        == Seq("2024-02-15")), "post-drop file joins the NEW version without restart")
      assert(await(60)(records().filter(col("trip_start_date") === "2024-01-10")
        .select("schedule_file_name").distinct().collect().map(_.getString(0)).toSeq
        == Seq("2024-01-01")), "old-dated file still joins the OLD version (J6 as-of)")
      // v2 content actually used: T1's stop 10 arrival shifted +60s
      assert(await(60)(records().filter(col("trip_start_date") === "2024-02-20"
          && col("trip_id") === "T1" && col("stop_sequence") === 10)
        .select("arrival_secs").head().getInt(0) == 8 * 3600 + 60),
        "v2's shifted stop_times joined")
      // ADVICE r9: a POST-swap file whose payload reports a PRE-swap service
      // date (late uploads, replayed feeds). J6 keys on the FILE date, so
      // the decode uses v2 — and the predict side must follow the DECODE's
      // version (resolved by name from the records), not re-derive it from
      // the service date, or records and predictions would disagree on
      // schedule_file_name for the very same rows
      Files.copy(stagingRt.resolve("2024-01-12-feed.pb"),
        Paths.get(rtDir, "2024-02-21-feed.pb"), StandardCopyOption.COPY_ATTRIBUTES)
      assert(await(120)(records()
          .filter(col("trip_start_date") === "2024-01-12").count() > 0),
        "mixed-date file ingested")
      assert(await(60)(records().filter(col("trip_start_date") === "2024-01-12")
        .select("schedule_file_name").distinct().collect().map(_.getString(0)).toSeq
        == Seq("2024-02-15")),
        "file-date as-of: post-swap file with a pre-swap service date decodes under v2")
      assert(await(120)({
        val names = predictions()
          .filter(col("origin_type") === Codes.OriginRealtime
            && col("trip_start_date") === "2024-01-12")
          .select("schedule_file_name").distinct().collect().map(_.getString(0)).toSeq
        names.nonEmpty && names == Seq("2024-02-15")
      }), "realtime predictions carry the DECODE's version for the same rows")

      // ---- phase 3: idle again -> backfill re-predicts under v2 ----
      clock.addAndGet(86400L) // reopen the buffer / expire the back-off
      assert(await(180)(schedOrigin("2024-02-15").count() > 0),
        "backfill switched to the new version without restart")
      // the renamed duplicate trip exists only in v2
      assert(await(120)(schedOrigin("2024-02-15")
          .filter(col("trip_id") === "T1b2").count() > 0),
        "v2-only trip (renamed T1b2) predicted")
      // reference delete_outdated_predictions: v1 rows inside the window v2
      // has re-predicted are retired batch by batch
      assert(await(180)({
        val start = org.apache.spark.sql.functions.unix_timestamp(
          GtfsTime.dateAndTime(col("trip_start_date"), col("trip_start_time")))
        // RAW base ∪ delta: the stale rows must be PHYSICALLY retired, not
        // merely lose the resolved view
        LwwTable.readRaw(spark, predictionsDir)
          .filter(col("origin_type") === Codes.OriginSchedule
            && col("schedule_file_name") === "2024-01-01"
            && start <= auto.highWaterMark).count() == 0
      }), "stale v1 schedule-origin rows below the v2 mark are deleted")
      // realtime rows are NEVER touched by the stale-schedule delete
      assert(await(60)(predictions()
        .filter(col("origin_type") === Codes.OriginRealtime).count() >= rtPredsBefore),
        "realtime-origin predictions survive the swap")
      // per-version mark discipline: committed marks advance monotonically
      // WITHIN each schedule version (the reference recovers per filename;
      // the v2 swap legitimately restarts the mark below v1's last — a
      // global sort would flag exactly the re-predict-the-buffer behavior
      // the swap exists for, and does when v1 commits more than one batch)
      auto.backfillEvents.filterNot(_.bufferFull).filter(_.toHwm > 0)
        .groupBy(_.scheduleFileName).foreach { case (v, evs) =>
          val marks = evs.map(_.toHwm)
          assert(marks == marks.sorted,
            s"marks advance monotonically within version $v: $marks")
        }
      // key uniqueness across the whole swap (duplicate-trip cleanup worked)
      assert(await(60)({
        val all = predictions()
        all.count() > 0 && all.select(StreamingImport.PredictionKeyCols.map(col): _*)
          .distinct().count() == all.count()
      }), "resolved view unique on the upsert key after the swap")
      // the monitor picked up v2 WITHOUT restart, in the same process as
      // the importer that swapped: T1's departure shifted to 08:01 under
      // v2, so the new descriptor resolves and the superseded one stops
      assert(await(60)(page(
        "/02.02.24%2008:00/Stop%201/Bus%2010%20nach%20Downtown%20um%2008:01/")
        .statusCode() == 200), "monitor serves v2 trip resolution after the swap")
      assert(page(
        "/02.02.24%2008:00/Stop%201/Bus%2010%20nach%20Downtown%20um%2008:00/")
        .statusCode() == 500, "superseded v1 departure no longer resolves")
    } finally {
      monitor.stop(); monCache.close()
      auto.stop()
      spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", prevNoData)
    }
  }

  test("steady state: the as-of path plans exactly like the pinned-schedule decode") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val base = Files.createTempDirectory("asofplan")
    val rtDir = base.resolve("rt"); Files.createDirectories(rtDir)
    FixtureGen.writeRtFiles(rtDir)
    val schedParent = base.resolve("schedule")
    val v1Dir = Files.createDirectories(schedParent.resolve("2024-01-01"))
    FixtureGen.writeSchedule(v1Dir)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pb").load(rtDir.toString)
    val rt = Importer.decodeRtFiles(spark, bin)
    val schedule = GtfsSchedule.load(spark, v1Dir.toString)
    // the single-version steady state must cost ONE extra bounded driver
    // collect and an isin filter — never an extra distributed exchange —
    // over the r8 pinned-schedule plan (SCALE.md: hot-reload's per-trigger
    // price is namenode metadata, not shuffle)
    def shuffles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size
    val pinned = StreamingImport.recordsStream(spark, rt, schedule, "test")
    val asOf = StreamingImport.recordsStreamAsOf(spark, rt,
      new ScheduleCache(spark, schedParent.toString), "test")
    assert(shuffles(asOf) == shuffles(pinned),
      s"as-of adds no exchange: ${shuffles(asOf)} vs ${shuffles(pinned)}")
    // and produces the same records modulo the version-name column, which
    // the as-of path stamps with the real directory name
    val a = asOf.drop("schedule_file_name").collect().map(_.toString).sorted.toSeq
    val p = pinned.drop("schedule_file_name").collect().map(_.toString).sorted.toSeq
    assert(a == p, "same records as the pinned decode in the steady state")
    schedule.unpersist()
  }

  test("no schedule data: the batch degrades to a schema-correct empty, not a dead query") {
    val base = Files.createTempDirectory("nosched")
    val rtDir = base.resolve("rt"); Files.createDirectories(rtDir)
    FixtureGen.writeRtFiles(rtDir)
    val emptyParent = Files.createTempDirectory("nosched_sched")
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pb").load(rtDir.toString)
    val rt = Importer.decodeRtFiles(spark, bin)
    assert(rt.count() > 0, "precondition: rt rows decoded")
    // the reference logs and retries the next scan (mod.rs:372-374); the
    // streaming wrapper must therefore return an EMPTY records batch the
    // upsert can consume, never throw into the query thread
    val ckpt = Files.createTempDirectory("nosched_ckpt").toString
    val recs = StreamingImport.recordsStreamAsOf(spark, rt,
      new ScheduleCache(spark, emptyParent.toString), "test",
      skippedLog = Some(StreamingImport.skippedLogDir(ckpt)))
    assert(recs.count() == 0)
    // the batch's files are recoverable BY NAME through the reader
    val skipped = StreamingImport.skippedFiles(spark, ckpt).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(skipped.nonEmpty && skipped.forall(_._1 == "no_schedule_data"),
      s"all skips recorded with the outage reason: ${skipped.toSeq}")
    assert(skipped.exists(_._2.endsWith("-feed.pb")),
      s"file names round-trip through the TSV: ${skipped.toSeq}")
    // reader is schema-correct while nothing was ever skipped
    assert(StreamingImport.skippedFiles(spark,
      Files.createTempDirectory("nosched_empty").toString).count() == 0)
    // schema matches the real decode (so upsertBatch/refresh stay legal)
    val v1Dir = Files.createDirectories(base.resolve("sched/2024-01-01"))
    FixtureGen.writeSchedule(v1Dir)
    val real = Importer.recordsFromRt(spark, rt,
      GtfsSchedule.load(spark, v1Dir.toString), "test", dedupe = false)
    assert(recs.schema.map(f => (f.name, f.dataType))
      == real.schema.map(f => (f.name, f.dataType)),
      s"records schema preserved: ${recs.schema} vs ${real.schema}")
  }

  test("the whole schedule tree vanishing mid-run degrades and recovers") {
    val base = Files.createTempDirectory("treegone")
    val schedParent = base.resolve("schedule"); Files.createDirectories(schedParent)
    val v1Dir = schedParent.resolve("2024-01-01"); Files.createDirectories(v1Dir)
    FixtureGen.writeSchedule(v1Dir)
    val stagingRt = base.resolve("staging"); Files.createDirectories(stagingRt)
    FixtureGen.writeRtFiles(stagingRt)
    val rtDir = Files.createDirectories(base.resolve("rt")).toString
    val recordsDir = s"$base/records"

    val schedule1 = GtfsSchedule.load(spark, v1Dir.toString)
    val staged = Importer.importDirectory(spark, stagingRt.toString, schedule1, "test").cache()
    val sc = CurveAnalysis.specificCurves(spark, staged, schedule1).cache()
    val dc = CurveAnalysis.defaultCurves(spark, staged, schedule1).cache()
    CurveStore.saveSpecific(sc, s"$base/curves/specific")
    CurveStore.saveDefault(dc, s"$base/curves/default")
    staged.unpersist(); sc.unpersist(); dc.unpersist(); schedule1.unpersist()

    def copyRt(name: String): Unit = Files.copy(stagingRt.resolve(name),
      Paths.get(rtDir, name), StandardCopyOption.COPY_ATTRIBUTES)

    val clock = new AtomicLong(
      java.time.LocalDateTime.of(2024, 2, 1, 12, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC))
    val prevNoData = spark.conf.get(
      "spark.sql.streaming.noDataProgressEventInterval", "10000ms")
    spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "1000ms")
    val auto = AutomaticImport.startFromDirs(spark, rtDir, schedParent.toString,
      "test", recordsDir, s"$base/predictions", s"$base/ckpt",
      s"$base/curves/specific", s"$base/curves/default",
      nowEpochSecs = () => clock.get(),
      triggerInterval = "500 milliseconds",
      idlePollMs = 200L, idleConfirmMs = 1200L,
      bufferFullBackoffSecs = 600L,
      maxFilesPerTrigger = 1)
    try {
      def records() = RecordsTable.read(spark, recordsDir)

      // ---- phase 1: healthy ingest + one committed backfill under v1 ----
      copyRt("2024-01-05-feed.pb")
      assert(await(120)(new java.io.File(recordsDir).exists()
          && records().filter(col("trip_start_date") === "2024-01-05").count() > 0),
        "v1-era rt file ingested")
      assert(await(120)(auto.backfillEvents.exists(e => !e.bufferFull && e.tripCount > 0)),
        "a v1 backfill batch committed")

      // ---- phase 2: the ENTIRE schedule tree vanishes mid-run ----
      val away = base.resolve("away")
      Files.move(schedParent, away, StandardCopyOption.ATOMIC_MOVE)
      copyRt("2024-01-10-feed.pb") // consumed during the outage
      // the decode degrades (mod.rs:372-374 logs and retries) and the
      // batch's files land by NAME in the recoverable skip log — never a
      // dead query (VERDICT r9 #2: decode and predict must degrade alike)
      val skipDir = new java.io.File(
        StreamingImport.skippedLogDir(s"$base/ckpt"))
      assert(await(120)(skipDir.isDirectory && skipDir.listFiles().exists { f =>
        val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        txt.contains("no_schedule_data") && txt.contains("2024-01-10-feed.pb")
      }), "outage-era rt file recorded in the skip log by name")
      // the idle backfill skips its iterations the same way: give it a few
      // confirm cycles and require both halves still alive
      Thread.sleep(3000)
      assert(auto.query.isActive, "streaming query survives the outage")
      assert(records().filter(col("trip_start_date") === "2024-01-10").count() == 0,
        "no records fabricated without a schedule")

      // ---- phase 3: the tree returns; both halves recover ----
      Files.move(away, schedParent, StandardCopyOption.ATOMIC_MOVE)
      val committedBefore = auto.backfillEventCount
      copyRt("2024-01-15-feed.pb")
      assert(await(120)(records()
          .filter(col("trip_start_date") === "2024-01-15").count() > 0),
        "post-recovery rt file ingested")
      assert(await(60)(records().filter(col("trip_start_date") === "2024-01-15")
        .select("schedule_file_name").distinct().collect().map(_.getString(0)).toSeq
        == Seq("2024-01-01")), "recovered decode joins the restored version")
      // VERDICT r10 #2 — the outage-era file's rows LAND IN RECORDS with NO
      // operator action: the recovery sweep (idle branch or the next data
      // trigger) copies the skip-logged 2024-01-10 file back into the rt
      // dir under a fresh dated name and the stream ingests the copy
      assert(await(180)(records()
          .filter(col("trip_start_date") === "2024-01-10").count() > 0),
        "outage-era file auto-requeued and ingested after recovery")
      // exactly-once at the records level: the served rows equal ONE direct
      // deduped decode of that file — a double-copy (crashed sweep) or the
      // original name reappearing would only add LWW-collapsed duplicates
      val day10 = records().filter(col("trip_start_date") === "2024-01-10")
      val expected10 = {
        val bin = spark.read.format("binaryFile")
          .load(stagingRt.resolve("2024-01-10-feed.pb").toString)
        val sched = GtfsSchedule.load(spark,
          schedParent.resolve("2024-01-01").toString)
        try Importer.recordsFromRt(spark,
          Importer.decodeRtFiles(spark, bin), sched, "test").count()
        finally sched.unpersist()
      }
      assert(day10.count() == expected10,
        s"exactly the one file's deduped rows after the requeue")
      // the log entry is consumed (retagged), so the sweep never re-fires
      assert(await(60)(StreamingImport.skippedFiles(spark, s"$base/ckpt")
        .filter(col("reason") === "requeued:no_schedule_data"
          && col("file_name") === "2024-01-10-feed.pb").count() == 1),
        "skip-log entry retagged requeued: after the sweep")
      clock.addAndGet(86400L) // expire any buffer-full back-off
      assert(await(180)(auto.backfillEventCount > committedBefore),
        "the idle backfill resumes after the tree returns")
      assert(auto.query.isActive, "query active end to end")
    } finally {
      auto.stop()
      spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", prevNoData)
    }
  }

  test("stop() under an in-flight backfill leaves the predictions table consistent") {
    val base = Files.createTempDirectory("stopmid")
    val schedParent = base.resolve("schedule"); Files.createDirectories(schedParent)
    val v1Dir = schedParent.resolve("2024-01-01"); Files.createDirectories(v1Dir)
    FixtureGen.writeSchedule(v1Dir)
    val stagingRt = base.resolve("staging"); Files.createDirectories(stagingRt)
    FixtureGen.writeRtFiles(stagingRt)
    val rtDir = Files.createDirectories(base.resolve("rt")).toString
    val schedule1 = GtfsSchedule.load(spark, v1Dir.toString)
    val staged = Importer.importDirectory(spark, stagingRt.toString, schedule1, "test").cache()
    val sc = CurveAnalysis.specificCurves(spark, staged, schedule1).cache()
    val dc = CurveAnalysis.defaultCurves(spark, staged, schedule1).cache()
    CurveStore.saveSpecific(sc, s"$base/curves/specific")
    CurveStore.saveDefault(dc, s"$base/curves/default")
    staged.unpersist(); sc.unpersist(); dc.unpersist(); schedule1.unpersist()

    val clock = new AtomicLong(
      java.time.LocalDateTime.of(2024, 2, 1, 12, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC))
    val prevNoData = spark.conf.get(
      "spark.sql.streaming.noDataProgressEventInterval", "10000ms")
    spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "1000ms")
    val predictionsDir = s"$base/predictions"
    val auto = AutomaticImport.startFromDirs(spark, rtDir, schedParent.toString,
      "test", s"$base/records", predictionsDir, s"$base/ckpt",
      s"$base/curves/specific", s"$base/curves/default",
      nowEpochSecs = () => clock.get(),
      triggerInterval = "500 milliseconds",
      idlePollMs = 200L, idleConfirmMs = 1200L,
      bufferFullBackoffSecs = 600L)
    try {
      // wait for the FIRST committed batch, then stop immediately — with
      // skipConfirm the loop is already deciding/running the next iteration,
      // so stop() lands against in-flight backfill work (interrupt-or-join
      // under the gate, never mid-partition-swap)
      val dl = System.nanoTime() + 120L * 1000000000L
      while (!auto.backfillEvents.exists(e => !e.bufferFull && e.tripCount > 0)
          && System.nanoTime() < dl) Thread.sleep(50)
      assert(auto.backfillEvents.nonEmpty, "a backfill iteration must have run")
    } finally {
      auto.stop()
      spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", prevNoData)
    }
    assert(!auto.query.isActive, "stream closed")
    // table consistent: readable, unique on the upsert key after a fold
    // (stop() may land between an append and the idle branch's compaction),
    // recovery works. graceMs = 0: the stream is stopped, this is offline
    // maintenance — physical fold, no pending retirements left behind
    PredictionsTable.compact(spark, predictionsDir, Some("2024-01-01"),
      graceMs = 0L)
    val all = spark.read.parquet(predictionsDir)
    assert(all.count() > 0)
    assert(all.select(StreamingImport.PredictionKeyCols.map(col): _*)
      .distinct().count() == all.count(), "no half-merged partition")
    val rec = AutomaticImport.recoverHighWaterMark(spark, predictionsDir, "test",
      Some("2024-01-01"))
    assert(rec > 0 && rec <= auto.highWaterMark, "mark recoverable after stop")
    // stop() is idempotent
    auto.stop()
  }
}
