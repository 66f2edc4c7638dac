package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.gtfs._

/** A change to one vehicle's prediction basis: re-predict from `stopSequence`
  * onward using `delayDeparture` (ST2 output; per_schedule_importer.rs:320-366
  * then drives one Predictor call per later stop × event type). */
final case class PredictionRequest(
    trip_id: String, trip_start_date: String, trip_start_time: Int,
    route_id: String, route_variant: Long,
    basis_stop_sequence: Int, basis_delay_departure: Int,
    time_of_recording: Long)

private final case class PredictionBasis(stopSequence: Int, delayDeparture: Int,
                                         lastSeen: Long)

/** Streaming ingest (SURVEY.md §2.8, §3.1): the batch plan of
  * [[graft.gtfs.Importer]] wrapped in Structured Streaming.
  *
  *  - ST1: `readStream(binaryFile)` over the rt directory; micro-batch
  *    trigger (5 s in `automatic` mode, AvailableNow for `batch` mode);
  *  - ST3: watermark on time_of_recording + 12 h past-trip guard (F10);
  *  - W2/ST5: last-writer-wins upsert per micro-batch in `foreachBatch` —
  *    idempotent under replays because the key dedup keeps the newest
  *    time_of_recording regardless of arrival order;
  *  - ST2: per-vehicle `flatMapGroupsWithState` that suppresses re-prediction
  *    while a vehicle's (stop_sequence, delay) basis is unchanged, with a
  *    12 h state TTL (per_schedule_importer.rs:266-313, importer/mod.rs:200-221).
  */
object StreamingImport {

  /** The fixed schema of the binaryFile source (required for streaming). */
  private val BinaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))

  /** Decoded streaming RT rows from a directory of .pb files. */
  def rtStream(spark: SparkSession, rtDir: String, maxFilesPerTrigger: Int = 16): Dataset[RtRow] = {
    val bin = spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", "*.pb")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(rtDir)
    Importer.decodeRtFiles(spark, bin)
  }

  /** records rows for one micro-batch (same joins as the batch path, minus
    * the cross-batch dedup, which [[upsertBatch]] applies on write). */
  def recordsStream(spark: SparkSession, rt: Dataset[RtRow],
                    schedule: GtfsSchedule, source: String): DataFrame =
    Importer.recordsFromRt(spark, rt, schedule, source, dedupe = false)

  /** [[recordsStream]] with the reference's J6 per-file schedule assignment
    * INSIDE the streaming path (importer/mod.rs:361-460): each rt file of
    * the micro-batch joins the newest schedule dated ≤ the file's own date,
    * resolved against the CURRENT directory listing — so a schedule version
    * dropped mid-run takes effect from the next batch (the reference
    * re-scans `dir/schedule` every 5 s), while a late-arriving old-dated
    * file still joins the schedule that was current on its day. Files with
    * no parseable date, or older than every schedule, are logged and
    * skipped (the reference moves them to `failed/` / skips them,
    * mod.rs:385-406 — the streaming checkpoint already owns the files, so
    * no archive move happens here).
    *
    * Driver cost per batch: one distinct-file-names collect (bounded by
    * maxFilesPerTrigger) + one schedule-directory listing; each schedule
    * group then runs the unchanged distributed decode+join plan. With the
    * steady-state single group this is the same plan as [[recordsStream]]
    * plus one bounded collect.
    *
    * Every file this batch SKIPS (unparseable date, older than any
    * schedule, or the whole tree empty) is appended by name + reason to a
    * TSV under `skippedLog` — the streaming counterpart of the reference
    * moving failed files to `failed/` (mod.rs:385-398): the checkpoint has
    * already consumed the file, so the recoverable artifact is its NAME
    * (an operator re-queues the listed files under fresh names). Steady
    * state writes nothing. */
  def recordsStreamAsOf(spark: SparkSession, rt: Dataset[RtRow],
                        schedules: graft.gtfs.ScheduleCache,
                        source: String,
                        skippedLog: Option[String] = None): DataFrame = {
    // bounded by the trigger's file cap — same driver-state assumption as
    // the refresh loop's dates collect
    val files = rt.select(col("file_name")).distinct()
      .collect().map(_.getString(0)).sorted
    var dirs = schedules.datedDirs()
    // an empty FIRST listing may be a blip (the tree mid-replace, an FS
    // hiccup): the reference retries the next 5 s scan without consuming
    // its files (mod.rs:372-374), but here the checkpoint already owns this
    // batch — so CONFIRM by re-listing before degrading, and only a
    // tree that stays empty across the confirms loses the batch (each file
    // then recorded to the skip log, recoverable by name)
    var confirms = 0
    while (dirs.isEmpty && confirms < 2) {
      Thread.sleep(250L); dirs = schedules.datedDirs(); confirms += 1
    }
    if (dirs.isEmpty) {
      // a throw here would kill the streaming query permanently, turning a
      // transient outage into a restart-and-page event
      System.err.println(
        "[stream] No schedule data (but realtime data may be present); skipping batch")
      recordSkipped(spark, skippedLog,
        files.toSeq.map(("no_schedule_data", _)))
      // records schema from the REAL plan against an all-empty schedule
      // (a nonexistent dir loads every member table empty); unpersist at
      // once so the degraded state leaks no S2 cache entries per trigger
      val empty = graft.gtfs.GtfsSchedule.load(spark,
        "/graft-no-schedule-sentinel")
      val df = Importer.recordsFromRt(spark, rt.limit(0), empty, source,
        dedupe = false).limit(0)
      empty.unpersist()
      return df
    }
    val oldest = dirs.head._1
    def group(dir: String, files: Seq[String]): DataFrame =
      Importer.recordsFromRt(spark,
        rt.filter(col("file_name").isin(files: _*)),
        schedules.get(dir), source, dedupe = false,
        scheduleFileName = Some(schedules.shortName(dir)))
    val skipped = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val assigned = files.flatMap { f =>
      Directory.dateFromFilename(f) match {
        case None =>
          System.err.println(s"[stream] rt file $f has no parseable date, skipping")
          skipped += (("unparseable_date", f))
          None
        case Some(d) if d.isBefore(oldest) =>
          System.err.println(s"[stream] rt file $f is older than any schedule, skipping")
          skipped += (("predates_schedules", f))
          None
        case Some(d) =>
          // as-of pick against the ONE listing this batch took (d >= oldest,
          // so it exists): re-listing per file would cost up to
          // maxFilesPerTrigger directory scans per trigger AND could see a
          // listing that changed mid-batch — every file of a batch must be
          // assigned against the same snapshot
          Some((dirs.takeWhile(!_._1.isAfter(d)).last._2, f))
      }
    }
    recordSkipped(spark, skippedLog, skipped.toSeq)
    val grouped = assigned.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (dir, fs) => group(dir, fs.toSeq.map(_._2)) }
    // schema-correct empty batch (all files skipped / empty trigger): the
    // caller persists + upserts the result, so it must carry the records
    // schema — limit(0) over the real plan against the newest schedule
    grouped.reduceOption(_ unionByName _)
      .getOrElse(group(dirs.last._2, Seq.empty).limit(0))
  }

  /** True when `e`'s cause chain is a FILE-level read failure under
    * `scheduleParentDir`: the batch's schedule resolved against a listing
    * taken BEFORE a version was deleted/replaced, and the decode's CSV scan
    * ran AFTER — the one failure mode the listing snapshot cannot shield.
    * Deliberately narrow (the path must sit under the schedule tree):
    * a missing records/predictions parquet or any other error is NOT
    * transient schedule loss and must fail the batch normally. */
  def scheduleReadRace(scheduleParentDir: String)(e: Throwable): Boolean = {
    val parentPath =
      new org.apache.hadoop.fs.Path(scheduleParentDir).toUri.getPath
    @annotation.tailrec
    def walk(t: Throwable, depth: Int): Boolean =
      t != null && depth < 16 && {
        val m = Option(t.getMessage).getOrElse("")
        val loss = (m.contains("FAILED_READ_FILE")
          || t.isInstanceOf[java.io.FileNotFoundException]) && m.contains(parentPath)
        if (loss) true else walk(t.getCause, depth + 1)
      }
    walk(e, 0)
  }

  /** Where [[startPredictionRefreshFromDirs]] records skipped rt files,
    * relative to its checkpoint directory. */
  def skippedLogDir(checkpointDir: String): String =
    s"$checkpointDir/_graft_skipped_rt_files"

  /** The skip log as a DataFrame of `(reason, file_name)` — the
    * operator-side reader for the TSVs [[recordsStreamAsOf]] writes. The
    * checkpoint owns the original files, so re-queueing one means copying
    * it back into the rt directory under a FRESH name (the binaryFile
    * source tracks seen paths) — which [[SkipLog.requeue]] automates on
    * schedule-tree recovery. Schema-correct empty result while nothing has
    * been skipped. */
  def skippedFiles(spark: SparkSession, checkpointDir: String): DataFrame =
    SkipLog.read(spark, skippedLogDir(checkpointDir))

  /** Appends `(reason, file)` lines to a uniquely-named TSV under `dir`.
    * Driver-side Hadoop-FS write (a handful of names, no Spark job);
    * no-op when `dir` is None or `entries` is empty. BEST-EFFORT: a failure
    * writing the log itself must not propagate out of foreachBatch — this
    * sits inside the very degrade path built to survive FS trouble, and the
    * same hiccup that emptied a listing could refuse the create; the names
    * are already on stderr, so a lost log entry loses redundancy, not the
    * query. [[SkipLog.append]] owns the torn-read-safe write and the
    * directory bounding. */
  private def recordSkipped(spark: SparkSession, dir: Option[String],
                            entries: Seq[(String, String)]): Unit =
    dir.foreach(d => SkipLog.append(spark, d, entries))

  /** Idempotent last-writer-wins upsert of a micro-batch into the parquet
    * records table (the engine-internal variant of the reference's
    * UPDATE-then-INSERT-IGNORE upsert, batched_statements.rs:59-107). */
  def upsertBatch(batch: DataFrame, targetDir: String): Unit =
    upsertTable(batch, targetDir,
      keyCols = graft.gtfs.RecordsTable.KeyCols,
      newestBy = graft.gtfs.RecordsTable.ordering)

  /** Generalized keyed upsert into an [[graft.gtfs.LwwTable]]: O(batch) per
    * call, matching the reference's per-flush MySQL cost
    * (batched_statements.rs:59-107) — the batch is deduped within itself and
    * APPENDED under the table's `_delta/` tree; the cross-batch W2 merge
    * moves to read time ([[graft.gtfs.LwwTable.resolve]]), and the delta is
    * folded into the base by the automatic mode's idle branch (or the
    * size-triggered backstop here, for deployments whose stream never
    * idles). The previous shape — read-merge-overwrite of every touched
    * `(source, trip_start_date)` partition per trigger — was O(accumulated
    * partition) per 5 s trigger: fine at rehearsal density, fatal at 100×
    * where the day's partition keeps growing under the trigger.
    *
    * Replay-idempotent exactly like before: a retried batch appends the same
    * keys with the same `newestBy` values, and resolution collapses the
    * duplicates to the identical row.
    *
    * The size-triggered backstop is TIERED (VERDICT r11 #1): past ~64
    * accumulated delta files it merges delta→delta
    * ([[graft.gtfs.LwwTable.mergeDelta]] — O(working set), no base read),
    * never the full base fold, so a stream that NEVER idles has its
    * worst-case trigger bounded by delta size instead of stalling 30 s+ on
    * an O(partition) rewrite; base folds stay on the idle branch (and at
    * batch-run end, [[runBatch]]). */
  def upsertTable(batch: DataFrame, targetDir: String, keyCols: Seq[String],
                  newestBy: org.apache.spark.sql.Column,
                  mergeBackstop: Boolean = true): Unit = {
    val spark = batch.sparkSession
    graft.gtfs.LwwTable.append(batch, targetDir, keyCols, newestBy)
    // mergeBackstop=false defers the size-triggered merge to a caller that
    // can supply the COMPLETE reader ordering (a physical merge resolves
    // ties exactly like a fold, so a weaker ordering could collapse one
    // differently than the readers — LwwTable's compact contract); the
    // append itself is ordering-safe (in-batch dedup only)
    if (mergeBackstop)
      graft.gtfs.LwwTable.mergeDeltaIfOversized(spark, targetDir, keyCols, newestBy)
  }

  /** S13/S14 as a true DB export: per micro-batch, reduce to the newest row
    * per upsert key (W2 within the batch) and push through the batched keyed
    * JDBC writer — UPDATE-then-INSERT with deadlock retry, mirroring the
    * reference's MySQL sink (batched_statements.rs:40-107,
    * importer/mod.rs:558-616). Replay-idempotent: a retried batch UPDATEs
    * the same keys to the same values. */
  def upsertBatchJdbc(batch: DataFrame, cfg: graft.sinks.JdbcUpsert.Config): Unit = {
    val key = cfg.keyCols
    val w = Window.partitionBy(key.map(col): _*).orderBy(col("time_of_recording").desc)
    val reduced = batch
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    graft.sinks.JdbcUpsert.upsert(reduced, cfg)
  }

  /** ST2 stateful dedup: one [[PredictionRequest]] per vehicle whose basis
    * (highest observed stop with a departure delay) changed; state expires
    * 12 h after last activity (pass `GroupStateTimeout.NoTimeout` in tests —
    * processing-time timeouts schedule a batch every trigger, which makes
    * `processAllAvailable` block forever). */
  def predictionRequests(spark: SparkSession, records: DataFrame,
                         timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout,
                         ttl: String = "12 hours")
      : Dataset[PredictionRequest] = {
    import spark.implicits._
    val slim = records.select(
      col("trip_id"), col("trip_start_date").cast("string"),
      col("trip_start_time"), col("route_id"), col("route_variant"),
      col("stop_sequence"), col("delay_departure"),
      unix_timestamp(col("time_of_recording")).as("rec_ts"))
      .filter(col("delay_departure").isNotNull)
      .as[(String, String, Int, String, Long, Int, Int, Long)]

    slim
      .groupByKey(r => (r._1, r._2, r._3)) // VehicleIdentifier
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (key: (String, String, Int),
         rows: Iterator[(String, String, Int, String, Long, Int, Int, Long)],
         state: GroupState[PredictionBasis]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toArray
            if (batch.isEmpty) Iterator.empty
            else {
              // newest basis in this batch: highest stop_sequence, then newest recording
              val newest = batch.maxBy(r => (r._6, r._8))
              val basis = PredictionBasis(newest._6, newest._7, newest._8)
              // a late-arriving batch of OLDER rows (a delayed .pb copy) must
              // not regress the stored basis — order by (stop, recording),
              // exactly the W3 window — or a stale delay re-fires predictions
              val stored = state.getOption
              val regress = stored.exists(s =>
                basis.stopSequence < s.stopSequence ||
                  (basis.stopSequence == s.stopSequence && basis.lastSeen < s.lastSeen))
              if (!regress) state.update(basis)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
                state.setTimeoutDuration(ttl) // ST2 TTL (12 h in production)
              val unchanged = regress || stored.exists(s =>
                s.stopSequence == basis.stopSequence && s.delayDeparture == basis.delayDeparture)
              if (unchanged) Iterator.empty
              else Iterator.single(PredictionRequest(
                newest._1, newest._2, newest._3, newest._4, newest._5,
                basis.stopSequence, basis.delayDeparture, basis.lastSeen))
            }
          }
        })
  }

  /** ST2 in BATCH form: the prediction-request state machine of
    * [[predictionRequests]] replayed over a static records table, one
    * micro-batch per (vehicle, recording instant) — the reference's
    * per-file processing order (importer/mod.rs one .pb at a time). The
    * running basis is a window MAX of (stop_sequence, rec_ts, delay):
    * a late re-delivery of older rows can never advance it — exactly the
    * regression guard of the stateful form — and a request is emitted
    * whenever the basis (stop, delay) pair CHANGES. Within one instant,
    * ties on stop_sequence break by delay (deterministic where the
    * stateful form's maxBy is arrival-order-dependent; one row per file
    * means the tie never arises there). Pure window functions — one
    * shuffle on the vehicle key, no state store, any scale. */
  def predictionRequestsBatch(records: DataFrame): DataFrame = {
    val veh = Seq("trip_id", "trip_start_date", "trip_start_time")
    // the route columns ride INSIDE the max struct rather than widening the
    // group key: a vehicle keyed by two route_variant values at the same
    // recording instant (feed anomaly / mid-feed schedule swap) would
    // otherwise emit two rows tied on rec_ts in the window partition, and
    // the running max + lag would depend on shuffle arrival order — a
    // nondeterministic replay the DuckDB twin could legally resolve the
    // other way. One row per (vehicle, instant), deterministically.
    val perBatch = records
      .filter(col("delay_departure").isNotNull)
      .withColumn("rec_ts", unix_timestamp(col("time_of_recording")))
      .groupBy((veh :+ "rec_ts").map(col): _*)
      .agg(max(struct(col("stop_sequence"), col("delay_departure"),
        col("route_variant"), col("route_id"))).as("nb"))
    val w = Window.partitionBy(veh.map(col): _*).orderBy("rec_ts")
    perBatch
      .withColumn("basis",
        max(struct(col("nb.stop_sequence").as("s"), col("rec_ts").as("t"),
          col("nb.delay_departure").as("d")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev", lag(col("basis"), 1).over(w))
      .filter(col("prev").isNull
        || col("basis.s") =!= col("prev.s") || col("basis.d") =!= col("prev.d"))
      .select(col("trip_id"), col("trip_start_date"), col("trip_start_time"),
        col("nb.route_id").as("route_id"), col("nb.route_variant").as("route_variant"),
        col("basis.s").as("stop_sequence"), col("basis.d").as("delay_departure"),
        col("basis.t").as("last_seen"))
  }

  /** A1 in streaming form with event-time semantics (ST3/ST6): hourly
    * windowed count + mean of arrival delays over the record stream, with a
    * watermark that drops data arriving more than `lateness` behind the
    * observed event-time maximum. */
  def windowedDelayStats(records: DataFrame, lateness: String = "1 hour"): DataFrame =
    records
      .withWatermark("time_of_recording", lateness)
      .filter(col("delay_arrival").between(-36000, 36000)) // F1
      .groupBy(window(col("time_of_recording"), "1 hour"))
      .agg(count(lit(1)).as("n"), avg("delay_arrival").as("avg_delay_arrival"))
      .select(col("window.start").as("bucket_start"), col("n"), col("avg_delay_arrival"))

  /** Full streaming pipeline: rt files → records upsert + basis-deduped
    * prediction requests, both driven by one stream. `automatic` mode =
    * 5 s processing-time trigger (TIME_BETWEEN_DIR_SCANS, importer/mod.rs:30);
    * `batch` mode = AvailableNow (run once over the backlog, then stop). */
  def start(spark: SparkSession, rtDir: String, schedule: GtfsSchedule,
            source: String, recordsDir: String, checkpointDir: String,
            automatic: Boolean = false,
            maxFilesPerTrigger: Int = 256): org.apache.spark.sql.streaming.StreamingQuery = {
    val rt = rtStream(spark, rtDir, maxFilesPerTrigger)
    val trigger = if (automatic) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow()
    rt.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[RtRow], _: Long) =>
        // NO persist: with append's isEmpty pre-probe gone the upsert is a
        // single action (the delta write), so the decode + schedule-join
        // plan runs exactly once per trigger — caching it would only add a
        // memory-store round trip ahead of that one pass (the
        // prediction-refresh loop keeps its persist: it genuinely reuses
        // the batch across several actions)
        upsertBatch(recordsStream(spark, batch, schedule, source), recordsDir)
      }
      .start()
  }

  /** [[start]] in `batch` mode, run to COMPLETION — the reference's
    * `import batch` contract (importer/mod.rs:295-359: the run-once loop
    * exits with MySQL fully upserted): an AvailableNow pass over the
    * current backlog, then a STREAM-END FOLD of the records delta, so a
    * finished batch run leaves the compacted, key-unique base and an empty
    * `_delta/` — the next reader pays a plain pruned scan, never a
    * resolution window (an AvailableNow run otherwise ends with its last
    * appends still in the delta tree, a behavioral delta vs the reference
    * and an avoidable window on the first read — VERDICT r11 #2). The fold
    * needs no gate: batch mode owns the table for the duration (the
    * automatic mode's gated composition never uses AvailableNow). */
  def runBatch(spark: SparkSession, rtDir: String, schedule: GtfsSchedule,
               source: String, recordsDir: String, checkpointDir: String,
               maxFilesPerTrigger: Int = 256,
               timeoutMs: Long = 300000L): Unit = {
    // single-writer contract: batch mode owns the table for the run — a
    // concurrent automatic mode (or a second batch run) on the same
    // records directory fails fast here instead of interleaving folds
    val lease = graft.gtfs.WriterLease.acquire(spark, recordsDir)
    try {
      // a PREVIOUS run that crashed with retirement manifests pending left
      // retired files holding disk until its next fold (VERDICT r13 #2);
      // batch mode owns every reader (the graceMs = 0 contract below), so
      // the backlog clears whole at entry, before the first trigger
      graft.gtfs.LwwTable.gcRetired(spark, recordsDir, 0L)
      val q = start(spark, rtDir, schedule, source, recordsDir, checkpointDir,
        automatic = false, maxFilesPerTrigger = maxFilesPerTrigger)
      try
        // require, not assert: assert is elidable, and eliding it would drop
        // the awaitTermination call itself and fold a partial table
        require(q.awaitTermination(timeoutMs),
          s"batch import did not finish within ${timeoutMs} ms")
      finally if (q.isActive) q.stop()
      // graceMs = 0: batch mode owns every reader for the run's duration
      // (LwwTable's offline mode), so the fold deletes physically and the
      // table is left with NO pending retirements — "finished" means a plain
      // key-unique base an external reader can scan without any window
      graft.gtfs.RecordsTable.compact(spark, recordsDir, graceMs = 0L)
    } finally lease.release()
  }

  /** The reference importer's full realtime loop, streaming end to end
    * (per_schedule_importer.rs:266-366): each micro-batch upserts its
    * records, then RE-PREDICTS the batch's CHANGED VEHICLES from their
    * latest stored basis (the conditional curve-set path) and upserts the
    * resulting predictions — newer refreshes win via the batch id.
    * Unchanged vehicles keep their previous refresh's rows (their basis
    * has not moved, so recomputing them would produce identical values);
    * note this means the refresh does NOT self-heal a predictions
    * partition damaged out-of-band — only vehicles that appear in a later
    * batch are rewritten. The records read-back is partition-pruned to the
    * touched `(source, trip_start_date)` directories and then semi-joined
    * to the batch's vehicles, so per-trigger prediction work is O(changed
    * vehicles), and the upsert O(batch ∪ touched partitions).
    *
    * PINS `schedule` and the curve Datasets for the query's lifetime — a
    * compat/test surface: a GTFS version dropped mid-run is invisible here.
    * Production deployments use [[startPredictionRefreshFromDirs]], which
    * hot-reloads both. */
  def startPredictionRefresh(spark: SparkSession, rtDir: String,
      schedule: GtfsSchedule, source: String, recordsDir: String,
      predictionsDir: String, checkpointDir: String,
      specific: Dataset[graft.gtfs.SpecificCurveRow],
      defaults: Dataset[graft.gtfs.DefaultCurveRow],
      automatic: Boolean = false,
      maxFilesPerTrigger: Int = 256,
      triggerInterval: String = "5 seconds",
      gate: Option[java.util.concurrent.locks.Lock] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // AMORTIZE the curve tables across triggers: curves change only on
    // re-analysis (the caller hands fixed Datasets), so snapshot them ONCE
    // into an executor-resident Broadcast[Predictor] — every trigger then
    // reuses the shipped blocks through the zero-shuffle lookup path instead
    // of rebuilding a multi-hundred-MB broadcast exchange per trigger (at a
    // 5 s production trigger that is 17k rebuilds/day; the reference
    // amortizes the same data as in-memory per-route curve files,
    // src/main.rs:321-393 FileCache). Tables past the driver-map bound keep
    // the broadcast-join form, whose curve side stays distributed.
    // persist around the gate: the size count and the collect would
    // otherwise each run the caller's full curve-analysis plan — twice per
    // table — before the stream starts (tens of seconds at 80k rows,
    // minutes at scale). One evaluation per table, cached, then released;
    // short-circuited so an oversized `specific` never even counts
    // `defaults`, and bounds applied PER TABLE exactly like
    // Predictor.guarded (the authoritative driver-map check).
    val bc: Option[org.apache.spark.broadcast.Broadcast[Predictor]] = {
      def gated[T](ds: Dataset[T])(k: => Option[Predictor]): Option[Predictor] = {
        // respect a caller-managed cache: persist only what we persisted
        val owned = ds.storageLevel == org.apache.spark.storage.StorageLevel.NONE
        if (owned) ds.persist()
        try { if (ds.count() <= Predictor.MaxDriverRows) k else None }
        finally { if (owned) ds.unpersist(blocking = false) }
      }
      gated(specific) { gated(defaults) {
        Some(new Predictor(specific.collect(), defaults.collect()))
      } }.map(spark.sparkContext.broadcast(_))
    }
    refreshLoop(spark, rtDir, source, recordsDir, predictionsDir,
      checkpointDir, automatic, maxFilesPerTrigger, triggerInterval, gate,
      predict = (stored, date, _) => Some(bc match {
        case Some(b) => Predictor.batchPredictRealtimeCached(
          spark, schedule, stored, date, source, b)
        case None => Predictor.batchPredictRealtime(
          spark, schedule, stored, date, source, specific, defaults)
      }),
      decode = batch => recordsStream(spark, batch, schedule, source),
      // this variant stamps EVERY row with the same default version name
      // (anchorAndSelect's `source + "_schedule"`), so that name IS the
      // current version — without it the deferred size backstop never
      // fires here and a never-idle stream's predictions delta grows one
      // file per group per trigger unboundedly
      currentVersion = () => Some(source + "_schedule"))
  }

  /** [[startPredictionRefresh]] against an on-disk [[graft.gtfs.CurveStore]]
    * with mtime invalidation — the full FileCache parity: re-running the
    * analyser rewrites the store, and the NEXT trigger picks up the new
    * curves (one metadata listing per trigger, no data scan while
    * unchanged). Still PINS `schedule` for the query's lifetime — a
    * compat/test surface; production uses
    * [[startPredictionRefreshFromDirs]], which hot-reloads the schedule
    * too. */
  def startPredictionRefreshFromStore(spark: SparkSession, rtDir: String,
      schedule: GtfsSchedule, source: String, recordsDir: String,
      predictionsDir: String, checkpointDir: String,
      specificDir: String, defaultDir: String,
      automatic: Boolean = false,
      maxFilesPerTrigger: Int = 256,
      triggerInterval: String = "5 seconds",
      gate: Option[java.util.concurrent.locks.Lock] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val cache = new graft.gtfs.CurveCache(spark, specificDir, defaultDir)
    refreshLoop(spark, rtDir, source, recordsDir, predictionsDir,
      checkpointDir, automatic, maxFilesPerTrigger, triggerInterval, gate,
      // a store grown past the driver-map bound by a re-analysis downgrades
      // the trigger to the distributed join form (curve side stays
      // distributed, read lazily from the store) instead of killing the
      // stream on the size guard — mirroring startPredictionRefresh's gate
      predict = (stored, date, _) => Some(cache.tryGet() match {
        case Some(b) => Predictor.batchPredictRealtimeCached(
          spark, schedule, stored, date, source, b)
        case None => Predictor.batchPredictRealtime(
          spark, schedule, stored, date, source,
          graft.gtfs.CurveStore.loadSpecific(spark, specificDir),
          graft.gtfs.CurveStore.loadDefault(spark, defaultDir))
      }),
      decode = batch => recordsStream(spark, batch, schedule, source),
      // single pinned version (see startPredictionRefresh): the default
      // stamped name is the current version, which arms the size backstop
      currentVersion = () => Some(source + "_schedule"))
  }

  /** The FULLY hot-reloading refresh loop: curve store AND schedule resolve
    * per trigger. [[startPredictionRefreshFromStore]]'s mtime-invalidated
    * CurveCache, plus a [[graft.gtfs.ScheduleCache]] that (a) assigns each
    * rt file its J6 as-of schedule inside the decode
    * ([[recordsStreamAsOf]]) and (b) predicts each service date with the
    * schedule current FOR THAT DATE — so a GTFS drop mid-run takes effect on
    * the next trigger without a restart, exactly the reference's 5 s
    * re-scan + FileCache reload (importer/mod.rs:361-460,
    * main.rs:321-393). */
  def startPredictionRefreshFromDirs(spark: SparkSession, rtDir: String,
      schedules: graft.gtfs.ScheduleCache, source: String, recordsDir: String,
      predictionsDir: String, checkpointDir: String,
      specificDir: String, defaultDir: String,
      automatic: Boolean = false,
      maxFilesPerTrigger: Int = 256,
      triggerInterval: String = "5 seconds",
      gate: Option[java.util.concurrent.locks.Lock] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val cache = new graft.gtfs.CurveCache(spark, specificDir, defaultDir)
    refreshLoop(spark, rtDir, source, recordsDir, predictionsDir,
      checkpointDir, automatic, maxFilesPerTrigger, triggerInterval, gate,
      predict = (stored, date, decodedWith) => {
        // the SAME schedule the group's rows were DECODED with (the
        // reference uses the file's matched schedule for both the decode
        // and the prediction): resolve the decode's version name first;
        // as-of the service date only when that version has since been
        // removed from the tree — never re-derive from the date while the
        // decode's version is still live, or a post-swap file reporting a
        // pre-swap service date would decode against v2 but predict
        // against v1 (renamed trip_ids missing, records and predictions
        // disagreeing on schedule_file_name for the same rows)
        val resolved = decodedWith
          .flatMap(n => schedules.byName(n).map((n, _)))
          .orElse(schedules.asOf(java.time.LocalDate.parse(date)))
        resolved match {
          case None =>
            // the whole tree vanished mid-trigger: DEGRADE like the decode
            // path (the reference logs "No schedule data" and retries,
            // mod.rs:372-374) — keep the batch's records, skip this group's
            // refresh, and the query lives to pick the tree up next trigger
            System.err.println(s"[stream] no schedule version available " +
              s"for service date $date; skipping prediction refresh")
            None
          case Some((name, sched)) => Some(cache.tryGet() match {
            case Some(b) => Predictor.batchPredictRealtimeCached(
              spark, sched, stored, date, source, b, Some(name))
            case None => Predictor.batchPredictRealtime(
              spark, sched, stored, date, source,
              graft.gtfs.CurveStore.loadSpecific(spark, specificDir),
              graft.gtfs.CurveStore.loadDefault(spark, defaultDir), Some(name))
          })
        }
      },
      decode = batch => recordsStreamAsOf(spark, batch, schedules, source,
        skippedLog = Some(skippedLogDir(checkpointDir))),
      skippedLog = Some(skippedLogDir(checkpointDir)),
      transientLoss = scheduleReadRace(schedules.scheduleParentDir),
      requeueSweep = Some(() => requeueSkipped(spark, schedules,
        checkpointDir, rtDir)),
      // the deferred predictions backstop's ordering: the NEWEST version's
      // name by directory listing (one bounded listing, only when the
      // backstop actually fires) — the same resolved-name guard the idle
      // branch applies before its fold
      currentVersion = () => schedules.newestDir().map(schedules.shortName))
  }

  /** The recovery sweep shared by the refresh loop (data flowing) and the
    * automatic mode's idle branch (quiet feed): once the schedule tree is
    * non-empty again, re-queue every recoverable skip-log entry's file
    * ([[SkipLog.requeue]]) so an outage needs NO operator action — the
    * behavior the reference gets for free from never consuming a file it
    * could not process (importer/mod.rs:372-374). Steady state is one
    * `exists` probe on the log directory. */
  private[streaming] def requeueSkipped(spark: SparkSession,
      schedules: graft.gtfs.ScheduleCache, checkpointDir: String,
      rtDir: String): Unit = {
    val dir = skippedLogDir(checkpointDir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    // tree probe FIRST: during an outage the log gains a file per degraded
    // trigger (no fingerprint memo can hold), and reading its contents per
    // 5 s trigger while the filesystem is already degraded is exactly the
    // wrong moment — one directory listing answers "outage still on".
    // With the tree healthy, hasRecoverable is the memoized cheap check
    // (one bounded listing for a fully-retagged log); requeue re-derives
    // the set itself, so a race between the two only costs a read.
    if (schedules.datedDirs().isEmpty) return
    if (!SkipLog.hasRecoverable(spark, dir)) return
    val n = SkipLog.requeue(spark, dir, rtDir)
    if (n > 0)
      System.err.println(s"[stream] schedule tree recovered; re-queued " +
        s"$n outage-era rt file(s) from the skip log")
  }

  private def refreshLoop(spark: SparkSession, rtDir: String, source: String,
      recordsDir: String, predictionsDir: String, checkpointDir: String,
      automatic: Boolean, maxFilesPerTrigger: Int,
      triggerInterval: String = "5 seconds",
      gate: Option[java.util.concurrent.locks.Lock] = None,
      predict: (DataFrame, String, Option[String]) => Option[DataFrame],
      decode: Dataset[RtRow] => DataFrame,
      skippedLog: Option[String] = None,
      transientLoss: Throwable => Boolean = _ => false,
      requeueSweep: Option[() => Unit] = None,
      currentVersion: () => Option[String] = () => None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val rt = rtStream(spark, rtDir, maxFilesPerTrigger)
    val trigger = if (automatic) Trigger.ProcessingTime(triggerInterval)
                  else Trigger.AvailableNow()
    // refresh_seq must be monotonic ACROSS process incarnations, not just
    // within one checkpoint lineage: a restart with a FRESH checkpoint
    // restarts batch ids at 0, and bare ids would lose the predictions LWW
    // to every row a previous incarnation wrote (seq 57 beats seq 0) until
    // the ids caught up — silently serving stale predictions. The offset
    // lifts this run's ids past the stored maximum, resolved ONCE at the
    // first batch (one single-column max over the bounded table). It is
    // self-consistent across same-checkpoint restarts: the first replayed
    // batch B sees maxSeq = offset_old + (B-1) from its predecessors (or
    // +B if B itself half-committed, which only bumps the replay one seq
    // higher — same values, still newest), so offset_new = offset_old.
    // Within a run the offset is fixed, so an engine-level batch retry
    // reuses its seq — the ST5 replay contract is unchanged.
    val seqOffset = new java.util.concurrent.atomic.AtomicLong(-1L)
    rt.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[RtRow], batchId: Long) =>
        // the AUTOMATIC composition serializes rt batches against the idle
        // backfill (AutomaticImport): both write the same LWW tables, and
        // the idle branch's compaction + stale-delete rewrites must never
        // overlap an append or another fold on the same partition — the
        // reference runs the two phases strictly in turn in its single
        // loop (importer/mod.rs:302-330)
        gate.foreach(_.lock())
        try {
          // recovery sweep FIRST (data is flowing, so the tree is worth
          // probing): skip-logged outage files are copied back into the rt
          // dir for the NEXT trigger's listing. Best-effort — a sweep
          // failure must never take down the batch it precedes. The idle
          // loop runs the same sweep for quiet feeds (no trigger fires
          // without new data, so recovery must not depend on one).
          requeueSweep.foreach(sweep =>
            try sweep()
            catch { case scala.util.control.NonFatal(e) =>
              System.err.println(s"[stream] skip-log requeue sweep failed: $e") })
          if (seqOffset.get() < 0)
            seqOffset.set(math.max(0L,
              maxStoredRefreshSeq(spark, predictionsDir) + 1 - batchId))
          refreshBatch(spark, source, recordsDir, predictionsDir,
            predict, decode, batch, batchId + seqOffset.get(),
            skippedLog, transientLoss, currentVersion)
        } finally gate.foreach(_.unlock())
      }
      .start()
  }

  /** Greatest refresh_seq in the stored predictions table; −1 when the
    * table does not exist or holds no data files (cleanup can empty it —
    * [[graft.gtfs.Directory.tableHasData]]). One single-column scan, ONCE
    * per query start (never per trigger), over a table the automatic mode's
    * cleanup keeps bounded to the live prediction window. */
  private def maxStoredRefreshSeq(spark: SparkSession, predictionsDir: String): Long = {
    // base ∪ delta WITHOUT resolution: max(refresh_seq) is dedup-invariant
    // (an LWW loser never exceeds its winner's seq under a seq-first order)
    if (!graft.gtfs.LwwTable.hasData(spark, predictionsDir)) -1L
    else {
      val r = graft.gtfs.LwwTable.readRaw(spark, predictionsDir)
        .agg(max(col("refresh_seq"))).head()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
  }

  private[streaming] def refreshBatch(spark: SparkSession, source: String,
      recordsDir: String, predictionsDir: String,
      predict: (DataFrame, String, Option[String]) => Option[DataFrame],
      decode: Dataset[RtRow] => DataFrame,
      batch: Dataset[RtRow], refreshSeq: Long,
      skippedLog: Option[String] = None,
      transientLoss: Throwable => Boolean = _ => false,
      currentVersion: () => Option[String] = () => None): Unit = {
        // persist: the decode + schedule joins otherwise re-run for the
        // upsert's actions AND the vehicle-group collect below (~3 full
        // replays of the batch plan per trigger)
        val recs = decode(batch).persist()
        // decoded source rows only — no schedule read, so safe to collect
        // even inside the transient-loss degrade paths below
        def batchFiles(): Seq[String] = batch.select(col("file_name"))
          .distinct().collect().map(_.getString(0)).sorted.toSeq
        try {
          // PHASE 1 — decode + records upsert. A schedule version deleted
          // between the batch's listing and the decode's CSV scan surfaces
          // HERE (the one window the listing snapshot cannot shield):
          // nothing committed yet, so the files are skip-logged under the
          // recoverable ingest reason and the batch is consumed — never a
          // dead query (the reference retries its next scan, mod.rs:372-374)
          try upsertBatch(recs, recordsDir)
          catch {
            case e if transientLoss(e) =>
              System.err.println(
                s"[stream] schedule files vanished mid-decode; skipping batch: $e")
              recordSkipped(spark, skippedLog,
                batchFiles().map(("schedule_read_race", _)))
              return
          }
          // PHASE 2 — prediction refresh, caught SEPARATELY (ADVICE r10):
          // a race here lands AFTER the records committed, and logging it
          // under the phase-1 reason would over-report lost ingest. The
          // requeue of a `schedule_read_race_predict` file re-ingests
          // value-identical records (LWW) and re-fires the missed refresh.
          try refreshPredictions(spark, source, recordsDir, predictionsDir,
            predict, recs, refreshSeq, skippedLog, currentVersion)
          catch {
            case e if transientLoss(e) =>
              System.err.println("[stream] schedule files vanished during " +
                s"the prediction refresh (records committed): $e")
              recordSkipped(spark, skippedLog,
                batchFiles().map(("schedule_read_race_predict", _)))
          }
        } finally recs.unpersist()
  }

  private def refreshPredictions(spark: SparkSession, source: String,
      recordsDir: String, predictionsDir: String,
      predict: (DataFrame, String, Option[String]) => Option[DataFrame],
      recs: DataFrame, refreshSeq: Long,
      skippedLog: Option[String],
      currentVersion: () => Option[String]): Unit = {
          // each changed vehicle re-predicts with the schedule its NEWEST
          // batch row was DECODED with (the per-file as-of pick rides the
          // records' schedule_file_name column through to the predict side,
          // so the two halves can never disagree on the version). The max
          // is over (recording time, name): a vehicle whose batch spans a
          // swap (an old-dated and a new-dated file in one trigger) joins
          // exactly ONE group — two groups would upsert it twice under the
          // same refresh_seq and leave the LWW pick to shuffle order.
          // Null start dates (TripDescriptor.start_date is optional) have
          // no service day to re-predict — and getTime on a null Date
          // would kill the stream with an NPE.
          val vehSched = recs
            .filter(col("trip_start_date").isNotNull)
            .groupBy(col("trip_id"), col("trip_start_date"), col("trip_start_time"))
            .agg(max(struct(col("time_of_recording"), col("schedule_file_name"))).as("nb"))
            .select(col("trip_id"), col("trip_start_date"), col("trip_start_time"),
              col("nb.schedule_file_name").as("schedule_file_name"))
            .persist()
          try {
            // bounded by (dates × schedule versions) in ONE micro-batch —
            // steady state is exactly the former per-date loop
            val groups = vehSched
              .select(col("trip_start_date"), col("schedule_file_name"))
              .distinct().collect()
              .map(r => (r.getDate(0), Option(r.getString(1))))
              .sortBy { case (d, n) => (d.getTime, n.getOrElse("")) }
            if (groups.nonEmpty) {
              val dates = groups.map(_._1).distinct.toSeq
              // base ∪ delta RAW (the batch just appended, so its rows sit
              // in the delta tree); the W2 resolution is applied BELOW,
              // after the semi-join narrows to the changed vehicles — the
              // filters are on key columns, so dedup commutes with them and
              // the window only ever sorts O(changed vehicles) rows
              val stored = graft.gtfs.LwwTable.readRaw(spark, recordsDir)
                .filter(col("source") === source
                  && col("trip_start_date").isInCollection(dates))
              groups.foreach { case (d, schedName) =>
                // the reference re-predicts per CHANGED VEHICLE
                // (per_schedule_importer.rs:320-366), not per service date:
                // restrict the read-back to vehicles present in this batch.
                // Basis state still needs each such vehicle's FULL stored
                // history (a late batch of older rows must not regress the
                // basis), so this is a semi-join on vehicle identity, never
                // a filter to the batch's own rows. Keeps per-trigger
                // prediction work O(changed vehicles), not O(accumulated
                // day partition) — a day-long partition under a 5 s trigger
                // would otherwise be re-predicted in full thousands of
                // times per day. Unchanged vehicles keep their previous
                // refresh's rows (identical values — their basis has not
                // moved) via the refresh_seq LWW. broadcast is safe AND
                // load-bearing here: `changed` is bounded by the trigger's
                // file cap (distinct vehicle keys of ONE micro-batch — the
                // loop already persists recs and collects its groups, so
                // batch-sized driver state is an existing assumption), and
                // without the pin a conservative planner would sort-merge-
                // shuffle the whole accumulated day partition every
                // trigger — the exact O(partition) cost this narrowing
                // removes.
                val changed = vehSched
                  .filter(col("trip_start_date") <=> lit(d)
                    && col("schedule_file_name") <=> lit(schedName.orNull))
                  .select("trip_id", "trip_start_date", "trip_start_time")
                val storedChanged = graft.gtfs.LwwTable.resolve(
                  stored.join(broadcast(changed),
                    Seq("trip_id", "trip_start_date", "trip_start_time"), "left_semi"),
                  graft.gtfs.RecordsTable.KeyCols, graft.gtfs.RecordsTable.ordering)
                // a None from predict = no schedule version resolvable for
                // this group (degrade-and-skip; the FromDirs doc): records
                // are already upserted, only this refresh leg is skipped —
                // recorded as a GROUP marker so the operator artifact is
                // symmetric with the read-race degrades (the marker is not
                // a file name; the requeue sweep ignores it)
                predict(storedChanged, d.toString, schedName) match {
                  case None =>
                    recordSkipped(spark, skippedLog, Seq((
                      "no_schedule_version_predict",
                      s"date=$d version=${schedName.getOrElse("-")}")))
                  case Some(p) =>
                  // NO persist (append's isEmpty pre-probe is gone): the
                  // per-group upsert is a single action — the delta write —
                  // so the predict plan runs exactly once per group.
                  // mergeBackstop=false PER GROUP (ADVICE r11): the group's
                  // as-of name is legitimately OLDER than the newest version
                  // for late old-dated rt files, and a physical merge under
                  // it would collapse a cross-version same-second backfill
                  // tie toward the OLD version — which the stale-schedule
                  // delete then removes, permanently losing the cell. The
                  // ONE backstop below the loop uses the CURRENT version.
                  upsertTable(p.withColumn("refresh_seq", lit(refreshSeq)),
                    predictionsDir,
                    keyCols = PredictionKeyCols,
                    newestBy = graft.gtfs.PredictionsTable.ordering(schedName),
                    mergeBackstop = false)
                }
              }
              // the deferred size backstop, ONCE per trigger, under the
              // ordering the READERS use — refresh_seq with the CURRENT
              // version's tie-break (the idle branch's resolved-name guard,
              // AutomaticImport): with no version resolvable (tree outage)
              // it stays deferred, and the delta simply rides until the
              // idle fold or recovery — an open delta is a read-cost
              // concern, never a correctness one.
              currentVersion().foreach(name =>
                graft.gtfs.LwwTable.mergeDeltaIfOversized(spark,
                  predictionsDir, PredictionKeyCols,
                  graft.gtfs.PredictionsTable.ordering(Some(name))))
            }
          } finally vehSched.unpersist()
  }

  /** The predictions-table upsert key shared by the realtime refresh and the
    * idle backfill — the reference's `predictions` WHERE clause
    * (importer/mod.rs:560-578; route_id is functionally determined by
    * trip_id and stays a value column here). */
  private[streaming] val PredictionKeyCols = graft.gtfs.PredictionsTable.KeyCols
}
