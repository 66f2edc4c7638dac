package graft.gtfs

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DirectorySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("J6 as-of assignment: newest schedule <= rt date; old/invalid handled") {
    val a = Directory.assignSchedules(
      rtFiles = Seq("/x/2024-01-05T08.pb", "/x/2024-01-20T08.pb",
        "/x/2023-12-01T08.pb", "/x/nodate.pb"),
      scheduleFiles = Seq("/s/2024-01-01", "/s/2024-01-15", "/s/badname"))
    val by = a.bySchedule.toMap
    assert(by("/s/2024-01-01") == Seq("/x/2024-01-05T08.pb"))
    assert(by("/s/2024-01-15") == Seq("/x/2024-01-20T08.pb"))
    assert(a.skipped == Seq("/x/2023-12-01T08.pb"), "older than all schedules")
    // undated RT is archivable; an undated SCHEDULE must be reported
    // separately (importTree leaves it in place instead of moving schedule
    // data to failed/)
    assert(a.invalid == Seq("/x/nodate.pb"))
    assert(a.invalidSchedules == Seq("/s/badname"))
  }

  test("newest-schedule pick is by PARSED date, not string order") {
    // lexicographic max over full paths would pick b-2024-05-01 here
    assert(Directory.newestDatedDir(Seq(
      "/s/b-2024-05-01", "/s/a-2024-06-01", "/s/current")).contains("/s/a-2024-06-01"))
    assert(Directory.newestDatedDir(Seq("/s/current", "/s/latest")).isEmpty)
    assert(Directory.newestDatedDir(Nil).isEmpty)
    // date tie: deterministic (path max among the tied)
    assert(Directory.newestDatedDir(Seq(
      "/s/a-2024-06-01", "/s/b-2024-06-01")).contains("/s/b-2024-06-01"))
    // a dated ANCESTOR (dated baseDir) must not date undated children:
    // with full-path parsing every entry would inherit 2024-09-01, all
    // would tie, and 'current' could win the lexicographic tiebreak — the
    // exact failure the parsed-date pick was added to prevent
    assert(Directory.newestDatedDir(Seq(
      "/data/2024-09-01/schedule/current",
      "/data/2024-09-01/schedule/2024-05-01")).contains(
      "/data/2024-09-01/schedule/2024-05-01"))
    assert(Directory.newestDatedDir(Seq(
      "/data/2024-09-01/schedule/current")).isEmpty)
  }

  test("assignSchedules parses dates from basenames, not ancestor directories") {
    // under a dated baseDir, an undated schedule dir and an undated rt file
    // must still be reported invalid — full-path parsing would date both
    // from the ancestor and silently group them
    val a = Directory.assignSchedules(
      rtFiles = Seq("/data/2024-09-01/rt/2024-09-05T08.pb",
        "/data/2024-09-01/rt/nodate.pb"),
      scheduleFiles = Seq("/data/2024-09-01/schedule/2024-09-01",
        "/data/2024-09-01/schedule/current"))
    assert(a.bySchedule.toMap.apply("/data/2024-09-01/schedule/2024-09-01")
      == Seq("/data/2024-09-01/rt/2024-09-05T08.pb"))
    assert(a.invalid == Seq("/data/2024-09-01/rt/nodate.pb"))
    assert(a.invalidSchedules == Seq("/data/2024-09-01/schedule/current"))
  }

  test("A15 recovery scopes to (source, schedule_file_name) like the reference WHERE clause") {
    // two sources share one predictions table; source B's mark is far ahead.
    // An unscoped max would recover B's mark for A and silently skip every
    // window A has not predicted yet (scheduled_predictions_importer.rs:304-336).
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("pred_sources").toString + "/predictions"
    val cols = Seq("source", "trip_id", "trip_start_date", "trip_start_time",
      "stop_sequence", "event_type", "origin_type", "refresh_seq",
      "schedule_file_name")
    def row(src: String, date: String, trip: String, sched: String) =
      (src, trip, java.sql.Date.valueOf(date), 28800, 1, 1,
        Codes.OriginSchedule, -1L, sched)
    graft.streaming.StreamingImport.upsertTable(
      Seq(row("a", "2024-01-10", "T1", "a_schedule"),
        row("a", "2024-01-12", "T2", "a_schedule"),
        row("b", "2024-03-01", "T3", "b_schedule")).toDF(cols: _*),
      dir, keyCols = Seq("source", "trip_id"), newestBy = col("refresh_seq"))
    def epoch(d: String) = java.time.LocalDate.parse(d).toEpochDay * 86400 + 28800
    val recA = graft.streaming.AutomaticImport.recoverHighWaterMark(spark, dir, "a")
    val recB = graft.streaming.AutomaticImport.recoverHighWaterMark(spark, dir, "b")
    assert(recA == epoch("2024-01-12"), s"source a's own mark, got $recA")
    assert(recB == epoch("2024-03-01"), s"source b's own mark, got $recB")
    assert(graft.streaming.AutomaticImport.recoverHighWaterMark(
      spark, dir, "missing") == 0L, "unknown source starts from scratch")
    // schedule-version scoping: a NEW schedule file restarts the mark
    assert(graft.streaming.AutomaticImport.recoverHighWaterMark(
      spark, dir, "a", Some("a_schedule")) == epoch("2024-01-12"))
    assert(graft.streaming.AutomaticImport.recoverHighWaterMark(
      spark, dir, "a", Some("a_schedule_v2")) == 0L,
      "marks written from an older schedule version do not count")
  }

  test("importTree: grouped import + archive moves (S4/S5)") {
    val base = Files.createTempDirectory("tree").toString
    val schedDir = s"$base/schedule/2024-01-01"
    new java.io.File(schedDir).mkdirs()
    FixtureGen.writeSchedule(java.nio.file.Paths.get(schedDir))
    new java.io.File(s"$base/rt").mkdirs()
    FixtureGen.writeRtFiles(java.nio.file.Paths.get(s"$base/rt"))
    // one junk file without a date
    Files.write(java.nio.file.Paths.get(s"$base/rt/junk.pb"), Array[Byte](1, 2))

    val (recsOpt, stats) = Directory.importTree(spark, base, "tree")
    assert(recsOpt.isDefined)
    assert(recsOpt.get.count() == 241)
    assert(stats.map(_._2).sum == 61, "61 dated rt files imported")
    assert(new java.io.File(s"$base/imported").listFiles().length == 61)
    assert(new java.io.File(s"$base/failed").listFiles().map(_.getName).toSeq == Seq("junk.pb"))
    assert(new java.io.File(s"$base/rt").listFiles().isEmpty)
  }

  test("ImportCli.run: tree import -> curves -> predictions, dated schedule wins") {
    val base = Files.createTempDirectory("clitree").toString
    val schedDir = s"$base/schedule/2024-01-01"
    new java.io.File(schedDir).mkdirs()
    FixtureGen.writeSchedule(java.nio.file.Paths.get(schedDir))
    // decoy: an undated schedule directory sorts lexicographically AFTER the
    // dated one ("current" > "2024-…") and is empty, so picking it would blow
    // up GtfsSchedule.load — the regression this test pins down
    new java.io.File(s"$base/schedule/current").mkdirs()
    new java.io.File(s"$base/rt").mkdirs()
    FixtureGen.writeRtFiles(java.nio.file.Paths.get(s"$base/rt"))

    graft.ImportCli.run(spark, base, "cli", "2024-01-15")

    assert(spark.read.parquet(s"$base/records").count() == 241)
    assert(spark.read.parquet(s"$base/curves/specific").count() > 0)
    assert(spark.read.parquet(s"$base/curves/default").count() > 0)
    assert(spark.read.parquet(s"$base/predictions").count() > 0)
    // the undated directory was left in place, not archived or consumed
    assert(new java.io.File(s"$base/schedule/current").isDirectory)
  }

  test("ImportCli automatic: store-backed composed mode over the analysed tree") {
    // batch pass first (the reference's prerequisite: `automatic` runs off
    // an existing analysis), then the composed mode on the SAME tree:
    // idle → store-backed ST4 backfill into stream/predictions; a file
    // landing in rt/ → streaming ingest into stream/records
    val base = Files.createTempDirectory("cliauto").toString
    val schedDir = s"$base/schedule/2024-01-01"
    new java.io.File(schedDir).mkdirs()
    FixtureGen.writeSchedule(java.nio.file.Paths.get(schedDir))
    new java.io.File(s"$base/rt").mkdirs()
    FixtureGen.writeRtFiles(java.nio.file.Paths.get(s"$base/rt"))
    graft.ImportCli.run(spark, base, "cli", "2024-01-15")
    assert(new java.io.File(s"$base/rt").listFiles().isEmpty, "batch pass archived rt")

    val prevNoData = spark.conf.get(
      "spark.sql.streaming.noDataProgressEventInterval", "10000ms")
    spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "1000ms")
    val auto = graft.ImportCli.runAutomatic(spark, base, "cli",
      Some("2024-01-15"), triggerInterval = "500 milliseconds",
      idlePollMs = 200L, idleConfirmMs = 1200L)
    try {
      val dl1 = System.nanoTime() + 120L * 1000000000L
      while (!auto.backfillEvents.exists(e => !e.bufferFull && e.tripCount > 0)
          && System.nanoTime() < dl1) Thread.sleep(300)
      assert(auto.backfillEvents.exists(e => !e.bufferFull && e.tripCount > 0),
        s"no store-backed backfill committed: ${auto.backfillEvents}")
      assert(PredictionsTable.read(spark, s"$base/stream/predictions")
        .filter(org.apache.spark.sql.functions.col("origin_type")
          === Codes.OriginSchedule).count() > 0)
      // a new rt file resumes ingestion (copied from the batch archive)
      val archived = new java.io.File(s"$base/imported").listFiles()
        .filter(_.getName.endsWith(".pb")).minBy(_.getName)
      Files.copy(archived.toPath,
        java.nio.file.Paths.get(s"$base/rt", archived.getName))
      val dl2 = System.nanoTime() + 120L * 1000000000L
      def recs(): Long =
        try RecordsTable.read(spark, s"$base/stream/records").count()
        catch { case _: Exception => 0L } // table not written yet
      while (recs() == 0 && System.nanoTime() < dl2) Thread.sleep(300)
      assert(recs() > 0, "rt ingestion resumed into stream/records")
    } finally {
      auto.stop()
      spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", prevNoData)
    }
  }

  test("S15 table cleanup: outdated date partitions deleted, boundary + null kept") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a predictions-shaped table across old / boundary / future / null
    // date partitions, written through the streaming upsert layout
    val dir = Files.createTempDirectory("pred_cleanup").toString + "/predictions"
    def row(date: java.sql.Date, trip: String) =
      ("cli", trip, date, 28800, 1, 1, 0L)
    val cols = Seq("source", "trip_id", "trip_start_date", "trip_start_time",
      "stop_sequence", "event_type", "refresh_seq")
    val now = java.time.LocalDate.parse("2024-03-01").toEpochDay * 86400 + 12 * 3600
    val rows = Seq(
      row(java.sql.Date.valueOf("2024-01-15"), "OLD"),      // far outdated
      row(java.sql.Date.valueOf("2024-02-28"), "BOUNDARY"), // < 48h before now: kept
      row(java.sql.Date.valueOf("2024-03-03"), "FUTURE"),   // kept
      row(null.asInstanceOf[java.sql.Date], "NULLDATE"))    // kept, always
    graft.streaming.StreamingImport.upsertTable(rows.toDF(cols: _*), dir,
      keyCols = Seq("source", "trip_id"), newestBy = col("refresh_seq"))

    val deleted = Directory.cleanupOutdatedPredictionsTable(spark, dir, "cli", now)
    assert(deleted.size == 1 && deleted.head.contains("trip_start_date=2024-01-15"),
      s"exactly the outdated partition goes: $deleted")
    val remaining = LwwTable.readRaw(spark, dir).select("trip_id")
      .collect().map(_.getString(0)).toSet
    assert(remaining == Set("BOUNDARY", "FUTURE", "NULLDATE"),
      s"boundary, future and null-date rows survive: $remaining")
    // idempotent: nothing more to delete, table still readable
    assert(Directory.cleanupOutdatedPredictionsTable(spark, dir, "cli", now).isEmpty)
    // a different source's partitions are untouched (reference DELETE is
    // per source)
    assert(Directory.cleanupOutdatedPredictionsTable(spark, dir, "other", now).isEmpty)
  }

  test("S15 robustness: cleanup that empties the WHOLE table leaves it readable as absent") {
    // expired calendar + quiet feed for a few days: every date partition
    // ends up outdated and the cleanup deletes them ALL, leaving the table
    // root with only metadata (_SUCCESS, empty source= dir). Readers must
    // treat that as "table absent" — spark.read.parquet on it throws
    // "unable to infer schema", which would kill the streaming query and
    // then block the next AutomaticImport startup in recoverHighWaterMark.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("pred_cleanup_all").toString + "/predictions"
    val cols = Seq("source", "trip_id", "trip_start_date", "trip_start_time",
      "stop_sequence", "event_type", "origin_type", "refresh_seq")
    def rows(date: String, trip: String, seq: Long) =
      ("cli", trip, java.sql.Date.valueOf(date), 28800, 1, 1,
        Codes.OriginSchedule, seq)
    graft.streaming.StreamingImport.upsertTable(
      Seq(rows("2024-01-10", "A", 0L), rows("2024-01-11", "B", 0L)).toDF(cols: _*),
      dir, keyCols = Seq("source", "trip_id"), newestBy = col("refresh_seq"))
    // exercise BOTH trees: fold one write into the base, append another to
    // the delta — the cleanup must prune outdated partitions from each.
    // graceMs = 0 (offline fold): under grace the consumed delta files stay
    // physically present awaiting GC, and the count below would include
    // their directories
    LwwTable.compact(spark, dir, Seq("source", "trip_id"), col("refresh_seq"),
      graceMs = 0L)
    graft.streaming.StreamingImport.upsertTable(
      Seq(rows("2024-01-11", "B", 1L)).toDF(cols: _*),
      dir, keyCols = Seq("source", "trip_id"), newestBy = col("refresh_seq"))
    assert(LwwTable.hasData(spark, dir))

    // months later: both partitions outdated → all deleted (the 01-11
    // partition exists in base AND delta → both directories pruned)
    val now = java.time.LocalDate.parse("2024-03-01").toEpochDay * 86400 + 12 * 3600
    val deleted = Directory.cleanupOutdatedPredictionsTable(spark, dir, "cli", now)
    assert(deleted.size == 3, s"every outdated partition directory goes: $deleted")
    assert(deleted.exists(_.contains("_delta/")),
      s"the delta twin was pruned too: $deleted")
    assert(!LwwTable.hasData(spark, dir), "root exists but holds no data")

    // an uncommitted part file inside a killed writer's staging tree is NOT
    // data (and the hidden subtree is never descended into)
    val staging = new java.io.File(s"$dir/.spark-staging-dead/source=cli")
    staging.mkdirs()
    java.nio.file.Files.write(staging.toPath.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3))
    assert(!LwwTable.hasData(spark, dir), "staging files are not data")

    // every reader of the upsert-maintained table survives the state:
    assert(graft.streaming.AutomaticImport.recoverHighWaterMark(spark, dir, "cli") == 0L)
    assert(Directory.cleanupOutdatedPredictionsTable(spark, dir, "cli", now).isEmpty)
    // and the next upsert re-seeds the table from scratch
    graft.streaming.StreamingImport.upsertTable(
      Seq(rows("2024-03-02", "C", 1L)).toDF(cols: _*),
      dir, keyCols = Seq("source", "trip_id"), newestBy = col("refresh_seq"))
    assert(LwwTable.read(spark, dir, Seq("source", "trip_id"), col("refresh_seq"))
      .select("trip_id").head().getString(0) == "C")
  }

  test("--cleanup without automatic is rejected, not silently dropped") {
    // the flag used to be filtered out of the positional args and ignored;
    // a batch user would believe the outdated-prediction delete ran
    val e = intercept[IllegalArgumentException](
      graft.ImportCli.main(Array("--cleanup", "/nonexistent")))
    assert(e.getMessage.contains("--cleanup"))
  }

  test("X2: filename datetime regex with X1 date-midnight fallback") {
    assert(Directory.dateTimeFromFilename("feed-2024-03-04T08:15:30.pb")
      .contains(java.time.LocalDateTime.of(2024, 3, 4, 8, 15, 30)))
    assert(Directory.dateTimeFromFilename("2024-03-04-feed.pb")
      .contains(java.time.LocalDateTime.of(2024, 3, 4, 0, 0, 0)))
    assert(Directory.dateTimeFromFilename("nodate.pb").isEmpty)
  }

  test("A1 rt-file half: per-day count and byte size from the listing") {
    val dir = Files.createTempDirectory("rtstats")
    FixtureGen.writeRtFiles(dir)
    val stats = Directory.rtFileStats(spark, dir.toString).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats.size == FixtureGen.Days, "one bucket per fixture day")
    assert(stats("2024-01-01")._1 == 2, "day 0 has the newer second feed file")
    assert(stats("2024-01-02")._1 == 1)
    val expectedSize = new java.io.File(dir.toString).listFiles()
      .filter(f => f.getName.startsWith("2024-01-02") && f.getName.endsWith(".pb"))
      .map(_.length).sum
    assert(stats("2024-01-02")._2 == expectedSize, "byte size equals fs metadata")
  }

  test("service calendar: weekday flags and calendar_dates exceptions") {
    val (schedDir, _) = GtfsFixtures.create()
    val schedule = GtfsSchedule.load(spark, schedDir)
    // fixture calendar: service WD runs every day of 2024
    val trips = ServiceCalendar.tripsForDate(spark, schedule, "2024-03-04")
    assert(trips.count() == 5)
    // outside the calendar range → nothing
    assert(ServiceCalendar.tripsForDate(spark, schedule, "2025-06-01").count() == 0)
  }

  test("S15/ST3: outdated-prediction cleanup and live-window filter") {
    val (schedDir, rtDir) = GtfsFixtures.create()
    val schedule = GtfsSchedule.load(spark, schedDir)
    val records = Importer.importDirectory(spark, rtDir, schedule, "t")
    val sc = CurveAnalysis.specificCurves(spark, records, schedule)
    val dc = CurveAnalysis.defaultCurves(spark, records, schedule)
    val preds = Predictor.batchPredict(spark, schedule, "2024-03-04", "t", sc, dc).cache()
    val n = preds.count()
    assert(n > 0)
    // "now" = noon on the service day → all trips (starting 07:00-23:30 that
    // day) are within [now-12h, now+7.5d]
    val noon = java.time.LocalDate.parse("2024-03-04").toEpochDay * 86400 + 12 * 3600
    assert(Directory.cleanupOutdatedPredictions(preds, noon).count() == n)
    assert(Directory.predictionWindowFilter(preds, noon).count() == n)
    // "now" = ten days later → every prediction is outdated
    val later = noon + 10 * 86400
    assert(Directory.cleanupOutdatedPredictions(preds, later).count() == 0)
    // "now" = ten days earlier → outside the 7.5 d buffer
    assert(Directory.predictionWindowFilter(preds, noon - 10 * 86400).count() == 0)
  }

  test("ST4: high-water-mark backfill advances in >=6min/>=1000-trip batches") {
    val (schedDir, rtDir) = GtfsFixtures.create()
    val schedule = GtfsSchedule.load(spark, schedDir)
    val records = Importer.importDirectory(spark, rtDir, schedule, "t")
    val sc = CurveAnalysis.specificCurves(spark, records, schedule)
    val dc = CurveAnalysis.defaultCurves(spark, records, schedule)
    val now = java.time.LocalDate.parse("2024-03-04").toEpochDay * 86400 // midnight
    val batch = ScheduledPredictions.advance(spark, schedule, "t", sc, dc,
      highWaterMark = 0L, nowEpochSecs = now)
    assert(batch.isDefined)
    val b = batch.get
    assert(b.newHighWaterMark > now, "mark advanced")
    assert(b.tripCount > 0, "fixture has only 5 trips/day -> window extends")
    assert(b.predictions.count() > 0)
    // buffer full → None (20-min backoff signal)
    val full = ScheduledPredictions.advance(spark, schedule, "t", sc, dc,
      highWaterMark = now + ScheduledPredictions.BufferSecs + 1, nowEpochSecs = now)
    assert(full.isEmpty)
  }

  test("ST4: batch boundary recurrence — time arm, trip arm, buffer jump") {
    import spark.implicits._
    // 3000 starts 1 s apart (the 1000th lands 1000 s > 360 s after each
    // window start → the TRIP arm binds: exact 1000-trip windows), then a
    // gap, then 3 sparse stragglers
    val dense = (1L to 3000L).map(100000L + _)
    val sparse = Seq(200000L, 250000L, 300000L)
    val starts = (dense ++ sparse).toDF("start_epoch")
    val from0 = 100000L
    val bufEnd = 400000L
    val bs = ScheduledPredictions.batchBoundaries(starts, "start_epoch",
      from0, bufEnd, maxBatches = 10)
    assert(bs(0) == ((1, 100000L, 101000L, 1000L)))
    assert(bs(1) == ((2, 101000L, 102000L, 1000L)))
    assert(bs(2) == ((3, 102000L, 103000L, 1000L)))
    // fewer than 1000 remain → end = last available start
    assert(bs(3) == ((4, 103000L, 300000L, 3L)))
    // nothing left → the mark jumps to the buffer end with zero trips
    assert(bs(4) == ((5, 300000L, 400000L, 0L)))
    assert(bs.length == 5)

    // time arm: 100 starts all inside one second → end = from + 360 (the
    // ≥6 min minimum), not the last trip's instant
    val burst = (1L to 100L).map(_ => 500001L).toDF("start_epoch")
    val tb = ScheduledPredictions.batchBoundaries(burst, "start_epoch",
      500000L, 600000L, maxBatches = 3)
    assert(tb(0) == ((1, 500000L, 500360L, 100L)))
    assert(tb(1) == ((2, 500360L, 600000L, 0L)))

    // collectCap = 0 forces the distributed per-batch path — both paths
    // must run the identical recurrence
    for ((df, f0, bend) <- Seq((starts, from0, bufEnd), (burst, 500000L, 600000L))) {
      val fast = ScheduledPredictions.batchBoundaries(df, "start_epoch", f0, bend, 10)
      val slow = ScheduledPredictions.batchBoundaries(df, "start_epoch", f0, bend, 10,
        collectCap = 0)
      assert(fast == slow, s"collected fold vs per-batch jobs: $fast vs $slow")
    }
  }

  test("S19: ping listener rate-limits to one call per interval") {
    var pings = 0
    val l = new PingListener(() => pings += 1, minIntervalMs = 60000L)
    (1 to 5).foreach(_ => l.onQueryProgress(null))
    assert(pings == 1, "five rapid progress events -> one ping")
  }
}
