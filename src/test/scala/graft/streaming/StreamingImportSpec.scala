package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.gtfs._

class StreamingImportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val (schedDir, rtDir) = GtfsFixtures.create()
  lazy val schedule: GtfsSchedule = GtfsSchedule.load(spark, schedDir)

  test("streaming ingest over the rt directory equals the batch import") {
    val recordsDir = Files.createTempDirectory("records_stream").toString + "/records"
    val ckpt = Files.createTempDirectory("ckpt").toString
    val q = StreamingImport.start(spark, rtDir, schedule, "test",
      recordsDir, ckpt, automatic = false)
    q.awaitTermination(120000)

    // the resolved LWW view (base ∪ delta): an AvailableNow run ends with
    // its micro-batches in the delta tree (compaction is the idle branch's
    // / size backstop's job, neither of which fires here)
    val streamed = RecordsTable.read(spark, recordsDir)
    val batch = Importer.importDirectory(spark, rtDir, schedule, "test")
    assert(streamed.count() == batch.count(),
      "streamed upsert result equals batch import")
    // last-writer-wins held across micro-batches
    val d0 = streamed
      .filter("trip_start_date = '2024-01-01' AND stop_sequence = 10")
      .select("delay_arrival").head()
    assert(d0.getInt(0) == 444)
  }

  test("a finished batch run leaves the delta folded (the reference's `import batch`)") {
    // VERDICT r11 #2: the reference's batch mode exits with the store fully
    // upserted (importer/mod.rs:295-359); runBatch folds the delta at
    // stream end, so the next reader pays a plain pruned scan — no
    // resolution window, and `_delta/` is empty
    val recordsDir = Files.createTempDirectory("records_runbatch").toString + "/records"
    val ckpt = Files.createTempDirectory("ckpt_runbatch").toString
    StreamingImport.runBatch(spark, rtDir, schedule, "test", recordsDir, ckpt)
    assert(LwwTable.deltaFileCount(spark, recordsDir) == 0,
      "the stream-end fold emptied the delta tree")
    val streamed = RecordsTable.read(spark, recordsDir)
    // plan guard: the post-batch read takes the steady-state short-circuit
    val windows = streamed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.size
    assert(windows == 0, "a finished batch run's table reads without the LWW window")
    val batch = Importer.importDirectory(spark, rtDir, schedule, "test")
    assert(streamed.count() == batch.count(),
      "folded batch-run result equals the batch import")
  }

  test("a transient schedule loss in the PREDICT phase logs only the predict reason") {
    // VERDICT r11 #4 / ADVICE r10 #1: records committed in phase 1, so a
    // race during the prediction refresh must surface ONLY as
    // `schedule_read_race_predict` — re-marking the files with the ingest
    // reason would over-report lost ingest in the operator artifact
    import spark.implicits._
    val base = Files.createTempDirectory("predict_race").toString
    val recordsDir = base + "/records"
    val predsDir = base + "/preds"
    val logDir = base + "/skiplog"
    val schedParent = base + "/schedule"
    val rt = Seq(
      RtRow("2024-01-15-feed.pb", 100L, "T1", None, Some("20240115"),
        Some("08:00:00"), Some(1), None, Some(5), Some(6)),
      RtRow("2024-01-15-feed2.pb", 160L, "T1", None, Some("20240115"),
        Some("08:00:00"), Some(2), None, Some(7), Some(8))).toDS()
    val recs = Seq(
      ("test", "r1", 1L, "T1", java.sql.Date.valueOf("2024-01-15"), 28800, 1,
        java.sql.Timestamp.valueOf("2024-01-15 08:01:40"), "sched_v1"))
      .toDF("source", "route_id", "route_variant", "trip_id",
        "trip_start_date", "trip_start_time", "stop_sequence",
        "time_of_recording", "schedule_file_name")
    StreamingImport.refreshBatch(spark, "test", recordsDir, predsDir,
      predict = (_, _, _) => throw new java.io.FileNotFoundException(
        s"$schedParent/2024-01-01_gtfs/trips.txt vanished mid-refresh"),
      decode = _ => recs,
      batch = rt, refreshSeq = 0L,
      skippedLog = Some(logDir),
      transientLoss = StreamingImport.scheduleReadRace(schedParent))
    // phase 1 committed: the records survived the phase-2 race
    assert(RecordsTable.read(spark, recordsDir).count() == 1,
      "records committed before the predict-phase race")
    val entries = SkipLog.entries(spark, logDir)
    assert(entries.nonEmpty && entries.forall(_._1 == "schedule_read_race_predict"),
      s"only the predict-phase reason is logged, got: $entries")
    assert(entries.map(_._2).toSet ==
      Set("2024-01-15-feed.pb", "2024-01-15-feed2.pb"),
      "every file of the batch is recorded once under the predict reason")
  }

  test("partitioned upsert is replay-idempotent (ST5: foreachBatch retries)") {
    import spark.implicits._
    // a failed micro-batch is re-executed by the engine from the same
    // offsets — the upsert must produce the identical table when the same
    // batch is applied twice, and an out-of-order replay of an OLDER batch
    // must not regress newer stored rows
    val dir = Files.createTempDirectory("upsert_replay").toString + "/t"
    val cols = Seq("source", "route_id", "route_variant", "trip_id",
      "trip_start_date", "trip_start_time", "stop_sequence", "time_of_recording")
    def batch(rec: Long) = Seq(
      ("test", "r1", 1L, "A", java.sql.Date.valueOf("2024-01-01"), 100, 1, rec),
      ("test", "r1", 1L, "A", java.sql.Date.valueOf("2024-01-01"), 100, 2, rec))
      .toDF(cols: _*)
    def table() = RecordsTable.read(spark, dir)
    StreamingImport.upsertBatch(batch(10L), dir)
    StreamingImport.upsertBatch(batch(20L), dir)
    val after = table().orderBy("stop_sequence").collect()
    // replay the NEWEST batch (the common retry) → identical table
    StreamingImport.upsertBatch(batch(20L), dir)
    val replayed = table().orderBy("stop_sequence").collect()
    assert(replayed.toSeq == after.toSeq, "same-batch replay must be a no-op")
    // replay an OLDER batch (offset rewind) → LWW keeps the newer rows
    StreamingImport.upsertBatch(batch(10L), dir)
    val rewound = table().orderBy("stop_sequence").collect()
    assert(rewound.toSeq == after.toSeq, "older-batch replay must not regress")
    // ...and the invariants survive a physical fold of the delta tree
    RecordsTable.compact(spark, dir)
    assert(table().orderBy("stop_sequence").collect().toSeq == after.toSeq,
      "compaction preserves the resolved view")
  }

  test("partitioned upsert keeps stored rows whose trip_start_date is null") {
    import spark.implicits._
    // TripDescriptor.start_date is optional → null-date rows are legal.
    // Plain `===` against a null literal never matches, so without the
    // null-safe predicate the merge would skip the stored null-partition
    // rows while dynamic overwrite still replaces their directory —
    // silently erasing batch 1's rows on batch 2.
    val dir = Files.createTempDirectory("upsert_null").toString + "/t"
    def row(trip: String, rec: Long) =
      ("test", "r1", 1L, trip, null.asInstanceOf[java.sql.Date], 100, 1, rec)
    val cols = Seq("source", "route_id", "route_variant", "trip_id",
      "trip_start_date", "trip_start_time", "stop_sequence", "time_of_recording")
    StreamingImport.upsertBatch(Seq(row("A", 10L)).toDF(cols: _*), dir)
    StreamingImport.upsertBatch(Seq(row("B", 20L)).toDF(cols: _*), dir)
    // fold between the appends: the compaction's null-safe partition
    // predicate is the code path the old write-time merge exercised here
    RecordsTable.compact(spark, dir)
    val stored = RecordsTable.read(spark, dir)
    assert(stored.count() == 2, "batch 2 must merge with, not erase, batch 1")
    // and LWW still applies within the null partition (across base + delta)
    StreamingImport.upsertBatch(Seq(row("A", 30L)).toDF(cols: _*), dir)
    val a = RecordsTable.read(spark, dir).filter("trip_id = 'A'").collect()
    assert(a.length == 1 && a.head.getAs[Long]("time_of_recording") == 30L)
    RecordsTable.compact(spark, dir)
    val a2 = RecordsTable.read(spark, dir).filter("trip_id = 'A'").collect()
    assert(a2.length == 1 && a2.head.getAs[Long]("time_of_recording") == 30L)
  }

  test("streaming exact dedup drops within-watermark duplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val deduped = StreamingDedup.exactStream(
      mem.toDS().toDF("doc_id", "text", "ts"), watermark = "30 minutes")
    val sink = deduped.writeStream.format("memory")
      .queryName("dedup_stream_test").outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("dedup_ckpt").toString)
      .start()
    mem.addData((1L, "alpha beta", ts(0)), (2L, "gamma delta", ts(1)))
    sink.processAllAvailable()
    // batch 2: one duplicate text (different id), one new
    mem.addData((3L, "alpha beta", ts(5)), (4L, "epsilon", ts(6)))
    sink.processAllAvailable()
    sink.stop()
    val out = spark.table("dedup_stream_test")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.map(_._2).sorted.toSeq == Seq("alpha beta", "epsilon", "gamma delta"),
      "one row per distinct text")
    assert(out.exists(_ == (1L, "alpha beta")) && !out.exists(_ == (3L, "alpha beta")),
      "the FIRST occurrence survives")
  }

  test("streaming exact dedup: a copy arriving beyond the watermark re-emits") {
    // the WITHIN-watermark contract: state for a text expires once the
    // watermark passes its event time, so a much-later recrawl is emitted
    // again (bounded state means bounded memory, not global dedup)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val deduped = StreamingDedup.exactStream(
      mem.toDS().toDF("doc_id", "text", "ts"), watermark = "30 minutes")
    val sink = deduped.writeStream.format("memory")
      .queryName("dedup_stream_late").outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("dedup_ckpt2").toString)
      .start()
    mem.addData((1L, "alpha", ts(1)))
    sink.processAllAvailable()
    // advance the watermark far past ts(1) + 30 min
    mem.addData((2L, "advance", ts(10)))
    sink.processAllAvailable()
    // same text, event time well past the expired state
    mem.addData((3L, "alpha", ts(11)))
    sink.processAllAvailable()
    sink.stop()
    val texts = spark.table("dedup_stream_late")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(texts.count(_._2 == "alpha") == 2,
      s"expired state re-emits the text: $texts")
  }

  test("watermarked windowed delay stats: late data beyond the watermark is dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RtRow]
    val stats = StreamingImport.windowedDelayStats(
      StreamingImport.recordsStream(spark, mem.toDS(), schedule, "test"),
      lateness = "1 hour")
    val q = stats.writeStream.format("memory").queryName("win_stats")
      .outputMode("append").start()

    def rt(rec: Long, delay: Int): RtRow =
      RtRow("f.pb", rec, "T1", Some("R1"), Some("20240110"), Some("08:00:00"),
        Some(10), Some("S1"), Some(delay), Some(delay))

    val h0 = 1704880800L // 2024-01-10 10:00:00 UTC
    mem.addData(rt(h0 + 60, 120), rt(h0 + 120, 240))
    q.processAllAvailable()
    // advance event time far beyond h0 + watermark → closes the h0 window
    mem.addData(rt(h0 + 4 * 3600, 60))
    q.processAllAvailable()
    // this event is older than (maxEventTime - 1h) → must be dropped
    mem.addData(rt(h0 + 90, 999))
    q.processAllAvailable()
    mem.addData(rt(h0 + 6 * 3600, 60)) // close remaining windows
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_stats").collect()
      .map(r => r.getAs[java.sql.Timestamp]("bucket_start").toInstant.getEpochSecond ->
        (r.getAs[Long]("n"), r.getAs[Double]("avg_delay_arrival"))).toMap
    assert(rows(h0) == (2L, 180.0),
      s"h0 window has the two on-time events only (late 999 dropped): $rows")
  }

  test("stateful basis dedup emits one request per changed basis") {
    import spark.implicits._
    // two micro-batches via MemoryStream: same vehicle, same basis twice,
    // then a new basis
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RtRow]
    val schedule = this.schedule
    val recs = StreamingImport.recordsStream(spark,
      mem.toDS(), schedule, "test")
    val requests = StreamingImport.predictionRequests(spark, recs,
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = requests.writeStream
      .format("memory").queryName("pred_requests")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

    def rt(seq: Int, delay: Int, rec: Long): RtRow =
      RtRow("f.pb", rec, "T1", Some("R1"), Some("20240110"), Some("08:00:00"),
        Some(seq), Some(s"S${seq / 10}"), Some(delay), Some(delay))

    mem.addData(rt(20, 60, 1000L))
    q.processAllAvailable()
    mem.addData(rt(20, 60, 2000L)) // unchanged basis → suppressed
    q.processAllAvailable()
    mem.addData(rt(30, 120, 3000L)) // new basis → emitted
    q.processAllAvailable()
    // a late batch of OLDER rows (delayed file copy) must not regress the
    // stored stop-30 basis or re-fire a stale request
    mem.addData(rt(20, 90, 1500L))
    q.processAllAvailable()
    mem.addData(rt(40, 30, 4000L)) // state kept stop 30 → 40 still advances
    q.processAllAvailable()
    q.stop()

    val out = spark.table("pred_requests")
      .select("basis_stop_sequence", "basis_delay_departure").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(out == Seq((20, 60), (30, 120), (40, 30)),
      s"one request per distinct basis, stale batches suppressed, got $out")
  }

  test("ST2 batch form matches the streaming form under event-ordered delivery") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the batch form replays micro-batches in EVENT order; feed the
    // streaming form the same order (one batch per instant) and the two
    // must emit identical (stop, delay, last_seen) request sequences
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RtRow]
    val recs = StreamingImport.recordsStream(spark, mem.toDS(), schedule, "test")
    val requests = StreamingImport.predictionRequests(spark, recs,
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = requests.writeStream
      .format("memory").queryName("pred_requests_eq")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    def rt(seq: Int, delay: Int, rec: Long): RtRow =
      RtRow("f.pb", rec, "T1", Some("R1"), Some("20240110"), Some("08:00:00"),
        Some(seq), Some(s"S${seq / 10}"), Some(delay), Some(delay))
    val feed = Seq((20, 60, 1000L), (20, 90, 1500L), (30, 120, 2000L),
      (25, 999, 2500L), (40, 30, 3000L))
    feed.foreach { case (s, d, r) => mem.addData(rt(s, d, r)); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("pred_requests_eq")
      .select("basis_stop_sequence", "basis_delay_departure", "time_of_recording")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sortBy(_._3).toSeq

    val static = feed.toDF("stop_sequence", "delay_departure", "ts")
      .withColumn("trip_id", lit("T1"))
      .withColumn("trip_start_date", to_date(lit("2024-01-10")))
      .withColumn("trip_start_time", lit(28800))
      .withColumn("route_id", lit("R1"))
      .withColumn("route_variant", lit(1L))
      .withColumn("time_of_recording", timestamp_seconds(col("ts")))
    val batch = StreamingImport.predictionRequestsBatch(static)
      .select("stop_sequence", "delay_departure", "last_seen")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sortBy(_._3).toSeq
    assert(streamed == batch && batch.nonEmpty,
      s"streaming $streamed must equal batch replay $batch")
  }

  test("ST2 batch form: event-ordered replay of the request state machine") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("T1", 20, 60, 1000L),  // first basis → emit
      ("T1", 20, 90, 1500L),  // same stop, newer, delay changed → emit
      ("T1", 20, 60, 2000L),  // delay flips back → emit again
      ("T1", 30, 120, 3000L), // stop advances → emit
      ("T1", 25, 999, 3500L), // REGRESSION (lower stop) → suppressed
      ("T1", 40, 30, 4000L),  // advances past the kept stop-30 basis → emit
      ("T2", 10, 5, 1000L))   // independent vehicle
    val df = rows.toDF("trip_id", "stop_sequence", "delay_departure", "ts")
      .withColumn("trip_start_date", to_date(lit("2024-01-10")))
      .withColumn("trip_start_time", lit(28800))
      .withColumn("route_id", lit("R1"))
      .withColumn("route_variant", lit(7L))
      .withColumn("time_of_recording", timestamp_seconds(col("ts")))
    val out = StreamingImport.predictionRequestsBatch(df)
      .orderBy("trip_id", "last_seen")
      .select("trip_id", "stop_sequence", "delay_departure", "last_seen")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    assert(out == Seq(
      ("T1", 20, 60, 1000L), ("T1", 20, 90, 1500L), ("T1", 20, 60, 2000L),
      ("T1", 30, 120, 3000L), ("T1", 40, 30, 4000L),
      ("T2", 10, 5, 1000L)), s"got $out")
  }

  test("ST2 batch form: same-instant route_variant tie resolves deterministically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a feed anomaly keys one vehicle by TWO route_variants at the same
    // recording instant: the replay must collapse to one row per
    // (vehicle, instant) via the max struct — a wider group key would tie
    // the window rows and make emission shuffle-order dependent
    val rows = Seq(
      ("T1", 20, 60, 7L, "R1", 1000L),
      ("T1", 25, 60, 9L, "R2", 1000L), // same instant, higher stop, other variant
      ("T1", 30, 80, 7L, "R1", 2000L))
    val df = rows
      .toDF("trip_id", "stop_sequence", "delay_departure", "route_variant",
        "route_id", "ts")
      .withColumn("trip_start_date", to_date(lit("2024-01-10")))
      .withColumn("trip_start_time", lit(28800))
      .withColumn("time_of_recording", timestamp_seconds(col("ts")))
    val out = StreamingImport.predictionRequestsBatch(df)
      .orderBy("last_seen")
      .select("stop_sequence", "delay_departure", "route_variant", "route_id",
        "last_seen")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSeq
    // instant 1000: max struct picks (25, 60, 9, R2); instant 2000 advances
    assert(out == Seq((25, 60, 9L, "R2", 1000L), (30, 80, 7L, "R1", 2000L)),
      s"got $out")
  }

  test("streaming prediction refresh converges to the batch realtime path") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("predrefresh").toString
    val batchRecs = Importer.importDirectory(spark, rtDir, schedule, "test").cache()
    val sc = CurveAnalysis.specificCurves(spark, batchRecs, schedule).cache()
    val dc = CurveAnalysis.defaultCurves(spark, batchRecs, schedule).cache()
    sc.count(); dc.count()

    // small trigger size → several micro-batches → the per-date refresh and
    // the refresh_seq last-writer-wins both get exercised
    val q = StreamingImport.startPredictionRefresh(spark, rtDir, schedule,
      "test", base + "/records", base + "/predictions", base + "/ckpt", sc, dc,
      automatic = false, maxFilesPerTrigger = 16)
    q.awaitTermination(300000)

    val streamed = PredictionsTable.read(spark, base + "/predictions")
    assert(streamed.count() > 0, "refresh produced predictions")
    assert(streamed.select("origin_type").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(Codes.OriginRealtime))

    // final state for one date ≡ the batch realtime prediction on the full
    // records table: each vehicle's rows come from the last batch that
    // TOUCHED it (changed-vehicle narrowing), computed from its full
    // stored history at that point — and a vehicle's basis only moves in
    // batches that touch it, so the per-vehicle result equals the
    // full-table batch computation
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("trip_start_date") === "2024-01-15")
      .select(col("trip_id"), col("stop_sequence"), col("event_type"),
        col("precision_type"), to_json(col("prediction_curve")).as("curve"))
    val batchPreds = Predictor.batchPredictRealtime(spark, schedule, batchRecs,
      "2024-01-15", "test", sc, dc)
    assert(canon(streamed).except(canon(batchPreds)).count() == 0
      && canon(batchPreds).except(canon(streamed)).count() == 0,
      "streamed refresh ≡ batch realtime prediction")
  }

  test("pinned-schedule refresh arms the deferred predictions size backstop") {
    import org.apache.spark.sql.functions._
    // regression pin: deferring the per-group backstop to a
    // currentVersion-ordered run left the pinned-schedule variants with
    // () => None, so the backstop never fired there and a never-idle
    // stream's predictions delta grew one file per trigger unboundedly
    val base = Files.createTempDirectory("predbackstop").toString
    val batchRecs = Importer.importDirectory(spark, rtDir, schedule, "test").cache()
    val sc = CurveAnalysis.specificCurves(spark, batchRecs, schedule).cache()
    val dc = CurveAnalysis.defaultCurves(spark, batchRecs, schedule).cache()
    sc.count(); dc.count()
    val predsDir = base + "/predictions"
    // one real prediction row re-appended past the size bound: every file
    // lands in the same (source, date) partition, so when the stream's
    // trigger completes the delta holds 60+ mergeable files
    val seed = Predictor.batchPredictRealtime(spark, schedule, batchRecs,
      "2024-01-15", "test", sc, dc).limit(1)
      .withColumn("refresh_seq", lit(0L)).cache()
    (1 to LwwTable.DefaultMaxDeltaFiles + 1).foreach { _ =>
      StreamingImport.upsertTable(seed, predsDir,
        keyCols = PredictionsTable.KeyCols,
        newestBy = PredictionsTable.ordering(None), mergeBackstop = false)
    }
    seed.unpersist()
    assert(LwwTable.deltaFileCount(spark, predsDir)
      > LwwTable.DefaultMaxDeltaFiles, "seeded past the bound")
    val q = StreamingImport.startPredictionRefresh(spark, rtDir, schedule,
      "test", base + "/records", predsDir, base + "/ckpt", sc, dc,
      automatic = false, maxFilesPerTrigger = 256)
    q.awaitTermination(300000)
    // the deferred backstop fired under the variant's pinned version name:
    // the over-bound delta collapsed to one merged file per partition
    val n = LwwTable.deltaFileCount(spark, predsDir)
    assert(n > 0 && n < LwwTable.DefaultMaxDeltaFiles,
      s"backstop merged the seeded delta (left $n files)")
    assert(LwwTable.deltaWorthFolding(spark, predsDir, Int.MaxValue),
      "a merged- file marks the paid merge for the idle fold policy")
  }

  test("refresh restarted with a FRESH checkpoint supersedes a previous incarnation's rows (ST5)") {
    import org.apache.spark.sql.functions._
    // a redeploy that clears the checkpoint restarts batch ids at 0; bare
    // ids would lose the predictions LWW to every row the previous
    // incarnation wrote (stale predictions served until ids caught up).
    // Seed the table with DOCTORED rows carrying refresh_seq = 99, then
    // run a fresh-checkpoint refresh: the recomputed rows must win.
    val base = Files.createTempDirectory("predrefresh_restart").toString
    val batchRecs = Importer.importDirectory(spark, rtDir, schedule, "test").cache()
    val sc = CurveAnalysis.specificCurves(spark, batchRecs, schedule).cache()
    val dc = CurveAnalysis.defaultCurves(spark, batchRecs, schedule).cache()
    sc.count(); dc.count()

    val truth = Predictor.batchPredictRealtime(spark, schedule, batchRecs,
      "2024-01-15", "test", sc, dc)
    val doctored = truth
      .withColumn("prediction_min", col("prediction_min") + expr("INTERVAL 1 HOUR"))
      .withColumn("prediction_max", col("prediction_max") + expr("INTERVAL 1 HOUR"))
      .withColumn("sample_size", lit(-1))
      .withColumn("refresh_seq", lit(99L))
    StreamingImport.upsertTable(doctored, base + "/predictions",
      keyCols = StreamingImport.PredictionKeyCols, newestBy = col("refresh_seq"))
    assert(PredictionsTable.read(spark, base + "/predictions")
      .filter(col("sample_size") === -1).count() > 0, "doctored seed in place")

    val q = StreamingImport.startPredictionRefresh(spark, rtDir, schedule,
      "test", base + "/records", base + "/predictions", base + "/ckpt_fresh",
      sc, dc, automatic = false, maxFilesPerTrigger = 64)
    q.awaitTermination(300000)

    val stored = PredictionsTable.read(spark, base + "/predictions")
    assert(stored.filter(col("sample_size") === -1
        && col("trip_start_date") === "2024-01-15").count() == 0,
      "every doctored 2024-01-15 row was superseded by the fresh run")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("trip_start_date") === "2024-01-15")
      .select(col("trip_id"), col("stop_sequence"), col("event_type"),
        col("prediction_min"), to_json(col("prediction_curve")).as("curve"))
    assert(canon(stored).except(canon(truth)).count() == 0
      && canon(truth).except(canon(stored)).count() == 0,
      "restarted refresh state ≡ the batch realtime computation")
    batchRecs.unpersist(); sc.unpersist(); dc.unpersist()
  }

  test("store-backed prediction refresh (CurveCache) converges to the batch path") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("predrefresh_store").toString
    val batchRecs = Importer.importDirectory(spark, rtDir, schedule, "test").cache()
    val sc = CurveAnalysis.specificCurves(spark, batchRecs, schedule)
    val dc = CurveAnalysis.defaultCurves(spark, batchRecs, schedule)
    CurveStore.saveSpecific(sc, base + "/curves/specific")
    CurveStore.saveDefault(dc, base + "/curves/default")

    val q = StreamingImport.startPredictionRefreshFromStore(spark, rtDir,
      schedule, "test", base + "/records", base + "/predictions",
      base + "/ckpt", base + "/curves/specific", base + "/curves/default",
      automatic = false, maxFilesPerTrigger = 16)
    q.awaitTermination(300000)

    val streamed = PredictionsTable.read(spark, base + "/predictions")
    assert(streamed.count() > 0, "store-backed refresh produced predictions")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("trip_start_date") === "2024-01-15")
      .select(col("trip_id"), col("stop_sequence"), col("event_type"),
        col("precision_type"), to_json(col("prediction_curve")).as("curve"))
    val batchPreds = Predictor.batchPredictRealtime(spark, schedule, batchRecs,
      "2024-01-15", "test", sc, dc)
    assert(canon(streamed).except(canon(batchPreds)).count() == 0
      && canon(batchPreds).except(canon(streamed)).count() == 0,
      "store-backed streamed refresh ≡ batch realtime prediction")
  }

  test("scheduleReadRace classifies only schedule-tree file losses") {
    val race = StreamingImport.scheduleReadRace("/data/gtfs/schedule") _
    // the decode's CSV scan raced a version deletion (top-level message)
    assert(race(new org.apache.spark.SparkException(
      "[FAILED_READ_FILE.FILE_NOT_EXIST] Encountered error while reading " +
        "file file:///data/gtfs/schedule/2024-01-01/stops.txt.")))
    // same, nested as a cause chain (foreachBatch wrapping)
    assert(race(new RuntimeException("foreach batch sink failed",
      new org.apache.spark.SparkException("task failed",
        new java.io.FileNotFoundException(
          "File file:/data/gtfs/schedule/2024-01-01/calendar.txt does not exist")))))
    // a missing TABLE file is NOT schedule loss — must fail the batch
    assert(!race(new org.apache.spark.SparkException(
      "[FAILED_READ_FILE.FILE_NOT_EXIST] file:///data/stream/records/part-0.parquet")))
    // scheme-qualified parent normalizes to the same path
    assert(StreamingImport.scheduleReadRace("file:/data/gtfs/schedule")(
      new org.apache.spark.SparkException(
        "[FAILED_READ_FILE] file:///data/gtfs/schedule/2024-02-15/trips.txt gone")))
    // unrelated failures never classify
    assert(!race(new IllegalStateException("boom")))
    assert(!race(new InterruptedException()))
  }
}
