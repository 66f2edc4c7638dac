package graft

import org.apache.spark.sql.SparkSession
import graft.gtfs._

/** CLI analogue of the reference's `import --record manual <dir>` +
  * `predict` subcommands (src/main.rs:231-251): scans `<dir>/rt` against
  * dated schedules in `<dir>/schedule`, imports matched groups into
  * `<dir>/records` (archiving processed files), then runs one scheduled-
  * prediction backfill batch into `<dir>/predictions`.
  *
  * Usage:
  *   sbt "runMain graft.ImportCli <baseDir> [source] [serviceDateForNow]"
  *   sbt "runMain graft.ImportCli automatic <baseDir> [source] [nowDate]"
  *
  * `automatic` is the reference's flagship deployment subcommand
  * (importer/mod.rs:295-344): the long-running composed mode — streaming rt
  * ingest + prediction refresh from the curve STORE written by a previous
  * batch pass (`<baseDir>/curves`), with ST4 idle backfill whenever the
  * stream has nothing to do. Runs until interrupted.
  */
object ImportCli {

  /** Starts the composed automatic mode off a previously-analysed tree
    * (schedule + curve store); returns the handle so tests can stop it.
    * Streaming state lives under `<baseDir>/stream` — the batch layout's
    * `<baseDir>/records` (a plain overwrite dump) is left alone. */
  def runAutomatic(spark: SparkSession, baseDir: String, source: String,
                   nowDate: Option[String],
                   triggerInterval: String = "5 seconds",
                   idlePollMs: Long = 1000L,
                   idleConfirmMs: Long = 10000L,
                   performCleanup: Boolean = false): graft.streaming.AutomaticImport = {
    val specificDir = s"$baseDir/curves/specific"
    val defaultDir = s"$baseDir/curves/default"
    require(new java.io.File(specificDir).exists() &&
      new java.io.File(defaultDir).exists(),
      s"no curve store under $baseDir/curves — run the batch pass first")
    // nowDate is a replay ANCHOR, not a frozen instant: the clock starts at
    // noon of the given date and advances in real time. A constant `now`
    // would halt backfill permanently once the buffer fills (advance → None
    // sets backoffUntil = now + backoff, which a frozen clock never
    // reaches) and freeze the --cleanup cutoff, silently degrading the
    // long-running mode to rt-only.
    val clock: () => Long = nowDate match {
      case Some(d) =>
        val anchor = java.time.LocalDate.parse(d).toEpochDay * 86400 + 12 * 3600
        val t0 = System.currentTimeMillis() / 1000
        () => anchor + (System.currentTimeMillis() / 1000 - t0)
      case None => () => System.currentTimeMillis() / 1000
    }
    // schedules hot-reload from <baseDir>/schedule: each rt file joins its
    // J6 as-of version, the backfill tracks the newest version per
    // iteration, and a GTFS drop mid-run needs no restart (the reference's
    // 5 s re-scan + FileCache, importer/mod.rs:361-460, main.rs:321-393)
    graft.streaming.AutomaticImport.startFromDirs(spark, s"$baseDir/rt",
      s"$baseDir/schedule", source, s"$baseDir/stream/records",
      s"$baseDir/stream/predictions", s"$baseDir/stream/checkpoint",
      specificDir, defaultDir, nowEpochSecs = clock,
      triggerInterval = triggerInterval, idlePollMs = idlePollMs,
      idleConfirmMs = idleConfirmMs, performCleanup = performCleanup)
  }

  /** The reference's `monitor` subcommand (main.rs:245-248: the monitor
    * runs from the SAME binary, default port 3000, static assets from
    * `web-assets/`): serves the monitor over `<baseDir>/schedule` through a
    * hot-reloading [[ScheduleCache]] and the LIVE predictions table — a
    * fresh read per request, preferring the automatic mode's
    * `<baseDir>/stream/predictions` whenever it has data and falling back
    * to the batch pass's `<baseDir>/predictions` (so a monitor started
    * before the first streaming write serves the batch dump and switches
    * over by itself). Until either table has data, dynamic pages render
    * the 500 page per request — the server itself starts and serves
    * static/search routes regardless. Returns the handle so tests can
    * stop it. */
  def runMonitor(spark: SparkSession, baseDir: String, port: Int = 3000,
                 docRoot: Option[String] = None): graft.serving.MonitorServer = {
    val schedules = new ScheduleCache(spark, s"$baseDir/schedule")
    val streamDir = s"$baseDir/stream/predictions"
    val batchDir = s"$baseDir/predictions"
    // the server owns the cache it was built around: stop() releases the
    // cached schedules' S2 blocks (no caller ever sees the cache handle)
    new graft.serving.MonitorServer(spark,
      () => schedules.newest().map(_._2),
      // the stream table serves through the resolved LWW view, fresh per
      // request: un-compacted delta appends are visible, pre-compaction
      // duplicates are not. In the steady state (delta folded) the read
      // short-circuits to the key-unique base — a pruned scan, no window,
      // and the newest() probe below is never even forced (by-name param).
      // While a delta is open, the version tie-break uses the name current
      // AT THE PROVIDER CALL; a request whose pinned schedule differs (swap
      // landing mid-request) could break a same-second backfill tie the
      // other way for that one page — self-correcting on the next request,
      // same exposure as the reference's monitor reading MySQL mid-swap.
      // The batch pass's dump is a plain overwrite (no refresh_seq, no LWW
      // layout) and reads raw, as before.
      () => if (graft.gtfs.LwwTable.hasData(spark, streamDir))
              graft.gtfs.PredictionsTable.read(spark, streamDir,
                schedules.newest().map(_._1))
            else spark.read.parquet(batchDir),
      port = port, docRoot = docRoot,
      dataRoots = Seq(s"$baseDir/schedule", streamDir, batchDir)) {
      override def stop(): Unit = { super.stop(); schedules.close() }
    }
  }

  /** The whole import→analyse→predict pass, session-agnostic so tests can
    * drive it against a shared SparkSession. */
  def run(spark: SparkSession, baseDir: String, source: String, nowDate: String): Unit = {
    // ---- import --record: directory scan → records table ----
    val (recsOpt, stats) = Directory.importTree(spark, baseDir, source)
    stats.foreach { case (sched, ok, failed) =>
      println(s"[import] schedule=$sched rt_ok=$ok rt_failed=$failed")
    }
    recsOpt match {
      case None => println("[import] no realtime files found")
      case Some(recs) =>
        recs.write.mode("overwrite").parquet(s"$baseDir/records")
        println(s"[import] records=${recs.count()} -> $baseDir/records")

        // ---- analyse: curve tables ----
        // newest DATED schedule: undated directories stay in schedule/
        // (importTree no longer archives them) and must not win a
        // lexicographic max ("current" > "2024-…")
        val schedDir = Directory.newestDatedDir(
          Option(new java.io.File(s"$baseDir/schedule").listFiles())
            .getOrElse(Array.empty).map(_.getPath).toSeq)
          .getOrElse(sys.error(s"no dated schedule directory under $baseDir/schedule"))
        val schedule = GtfsSchedule.load(spark, schedDir)
        val sc = CurveAnalysis.specificCurves(spark, recs, schedule).cache()
        val dc = CurveAnalysis.defaultCurves(spark, recs, schedule).cache()
        try {
          CurveStore.saveSpecific(sc, s"$baseDir/curves/specific")
          CurveStore.saveDefault(dc, s"$baseDir/curves/default")
          println(s"[analyse] specific=${sc.count()} default=${dc.count()} -> $baseDir/curves")

          // ---- predict: one scheduled backfill batch + cleanup ----
          val now = java.time.LocalDate.parse(nowDate).toEpochDay * 86400 + 12 * 3600
          ScheduledPredictions.advance(spark, schedule, source, sc, dc, 0L, now) match {
            case None => println("[predict] buffer full (would back off 20 min)")
            case Some(batch) =>
              val live = Directory.predictionWindowFilter(
                Directory.cleanupOutdatedPredictions(batch.predictions, now), now)
              live.write.mode("overwrite").parquet(s"$baseDir/predictions")
              println(s"[predict] trips=${batch.tripCount} rows=${live.count()} " +
                s"hwm=${batch.newHighWaterMark} -> $baseDir/predictions")
          }
        } finally {
          sc.unpersist(); dc.unpersist()
        }
    }
  }

  def main(args: Array[String]): Unit = {
    // --cleanup = the reference's per-iteration outdated-prediction delete
    // (importer/mod.rs:72: "on each run, outdated predictions shall be
    // deleted"); valid only with `automatic`
    val cleanup = args.contains("--cleanup")
    val positional = args.filterNot(_ == "--cleanup")
    val automatic = positional.headOption.contains("automatic")
    val monitor = positional.headOption.contains("monitor")
    require(!cleanup || automatic,
      "--cleanup is valid only with the automatic subcommand (the batch " +
        "pass applies the outdated-prediction filter unconditionally)")
    val rest = if (automatic || monitor) positional.drop(1) else positional
    val baseDir = rest.headOption.getOrElse(
      sys.error("usage: ImportCli [automatic [--cleanup] | monitor] <baseDir> " +
        "[source|port] [nowDate|docRoot]"))
    val source = if (rest.length > 1) rest(1) else "graft"
    val nowDate = if (rest.length > 2) Some(rest(2)) else None

    // shared session shape (GraftSession, VERDICT r16 #6): the production
    // entry point executes the same plans the bench/verify harness runs —
    // including the runtime-gated SMJ→SHJ conf that used to be harness-only
    val spark = GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      if (automatic) {
        val auto = runAutomatic(spark, baseDir, source, nowDate,
          performCleanup = cleanup)
        // graceful shutdown: interrupt must close the backfill loop and the
        // stream BETWEEN phases (stop() joins the in-flight iteration under
        // the gate) — the reference loop likewise only exits between phases.
        // The hook covers SIGINT/SIGTERM; the finally covers a normal or
        // exceptional awaitTermination return. stop() is idempotent, so the
        // hook firing after the finally is a no-op.
        val hook = sys.addShutdownHook(auto.stop())
        println(s"[automatic] running; hwm=${auto.highWaterMark} (interrupt to stop)")
        try auto.query.awaitTermination() // runs until interrupted, like the reference loop
        finally {
          auto.stop()
          hook.remove()
        }
      } else if (monitor) {
        // reference: the monitor subcommand serves until interrupted
        // (port 3000, monitor/mod.rs:103)
        val port = if (rest.length > 1) rest(1).toInt else 3000
        val docRoot = if (rest.length > 2) Some(rest(2)) else None
        val server = runMonitor(spark, baseDir, port, docRoot)
        val bound = server.start()
        val done = new java.util.concurrent.CountDownLatch(1)
        // unlike the automatic branch, the ONLY way await() returns is this
        // hook firing — i.e. shutdown is always in progress afterwards, so
        // the hook must not be removed (removeShutdownHook would throw
        // IllegalStateException on every Ctrl-C)
        sys.addShutdownHook { server.stop(); done.countDown() }
        println(s"[monitor] serving on port $bound (interrupt to stop)")
        try done.await()
        finally server.stop() // stop() is idempotent with the hook
      } else run(spark, baseDir, source,
        nowDate.getOrElse(java.time.LocalDate.now().toString))
    } finally spark.stop()
  }
}
