package graft.streaming

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import java.util.concurrent.locks.ReentrantLock
import scala.util.control.NonFatal
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.gtfs._

/** One committed idle-backfill iteration (or a buffer-full back-off), for
  * observability and tests: `decidedAtNanos` is the instant the loop decided
  * the stream was idle (two consecutive idle observations), BEFORE any work
  * ran; `completedAtNanos` is after the batch's upsert committed, so
  * `completedAtNanos - decidedAtNanos` is the iteration's true wall. */
final case class BackfillEvent(decidedAtNanos: Long, completedAtNanos: Long,
                               fromHwm: Long, toHwm: Long, tripCount: Long,
                               bufferFull: Boolean,
                               // marks are PER VERSION (the reference's
                               // recovery filters by its current schedule
                               // filename) — monotonicity claims must scope
                               // by this, not across a swap
                               scheduleFileName: String = "")

/** The reference's flagship `import automatic` deployment mode composed in
  * ONE process (`run_as_non_manual(is_automatic = true)`,
  * /root/reference/src/importer/mod.rs:295-344): the realtime directory
  * stream keeps ingesting .pb files and refreshing realtime predictions,
  * and WHENEVER the stream goes idle — the reference's
  * `process_all_files() == Ok(false)` "no realtime data to import" branch —
  * the scheduled-predictions high-water mark advances one ST4 batch at a
  * time (`make_scheduled_predictions`,
  * scheduled_predictions_importer.rs:64-242), resuming realtime processing
  * the moment files arrive.
  *
  * Composition of the two already-proven halves:
  *  - realtime: [[StreamingImport.startPredictionRefresh]] — ProcessingTime
  *    trigger = TIME_BETWEEN_DIR_SCANS (importer/mod.rs:30);
  *  - idle: [[ScheduledPredictions.advance]] from an in-memory high-water
  *    mark, recovered at startup from the predictions table itself exactly
  *    like the reference (`get_latest_prediction_time_from_database`,
  *    scheduled_predictions_importer.rs:81 — the A15 max over stored
  *    schedule-origin trip starts), so a restart resumes where the last
  *    process stopped without any extra state file.
  *
  * Idleness = no data available AND no trigger running, observed on TWO
  * consecutive polls spaced longer than the trigger interval — a single
  * observation can land in the gap between a finished batch and the next
  * backlog check. Exception: immediately after a COMMITTED backfill batch
  * one still-idle observation suffices, so an initial buffer drain runs
  * back-to-back like the reference loop instead of paying the confirm
  * sleep between every batch. Backfill iterations and rt micro-batches are serialized
  * by a shared lock (the reference's single loop runs the phases strictly
  * in turn): both sides write the same LWW predictions table, and the idle
  * branch's compaction/stale-delete partition rewrites must not overlap an
  * append or each other. The ST4 minimum-batch sizing bounds how long one backfill
  * iteration can delay a freshly-arrived file — the same latency trade the
  * reference makes.
  *
  * A full prediction buffer (advance → None) backs off
  * PREDICTION_FULL_TIMEOUT (scheduled_predictions_importer.rs:43,
  * mod.rs:92-94) while realtime processing continues; an iteration failure
  * is logged and the loop keeps running (mod.rs:321-327 prints and sleeps).
  * With `performCleanup` (the reference's opt-in `--cleanup`,
  * mod.rs:72/355-359), each idle iteration also drops outdated prediction
  * partitions ([[graft.gtfs.Directory.cleanupOutdatedPredictionsTable]]).
  *
  * Backfill rows upsert in a NEGATIVE refresh_seq tier ([[AutomaticImport
  * .backfillSeq]]: clock-monotonic, strictly below every realtime batch
  * id), so any realtime refresh of the same (vehicle, stop, event) cell
  * wins while later backfill re-predictions beat earlier ones; sequence
  * ties within the tier break toward the current schedule version
  * ([[AutomaticImport.backfillOrdering]]). The reference's blind UPDATE
  * would let a later schedule write clobber a realtime row in the rare
  * overlap (future trip already realtime-predicted); its own TODO
  * (importer/mod.rs:614 "update where old.time_of_recording < new…") marks
  * that as an acknowledged wart, and the LWW tier here implements the
  * intended semantics instead. Legacy constant-tier (−1) rows from older
  * builds are normalized to the tier floor at startup
  * ([[AutomaticImport.normalizeLegacyBackfillSeq]]).
  */
final class AutomaticImport private (
    val query: StreamingQuery,
    spark: SparkSession,
    scheduleProvider: () => Option[(String, GtfsSchedule)], source: String,
    recordsDir: String, predictionsDir: String,
    curves: () => (Dataset[SpecificCurveRow], Dataset[DefaultCurveRow]),
    nowEpochSecs: () => Long, idlePollMs: Long, idleConfirmMs: Long,
    bufferFullBackoffSecs: Long, performCleanup: Boolean,
    gate: ReentrantLock,
    // the single-writer contract, enforced (VERDICT r13 #1): this process
    // owns both LWW tables' folds/merges for the run — a second automatic
    // mode (or a manual compact from another process) fails fast against
    // these leases instead of silently interleaving retirements. Acquired
    // by the FACTORY before the streaming query even starts (ADVICE r15:
    // fail fast with nothing to unwind), passed in so ONE factory-level
    // guard releases them on ANY construction failure — not just the
    // initializers that used to carry their own catch; renewed every loop
    // iteration; released by stop().
    leases: Seq[WriterLease],
    idleSweep: () => Unit = () => ()) {

  private val stopFlag = new AtomicBoolean(false)
  // schedule version the mark currently belongs to — recovery and the
  // stale-schedule delete are keyed per version, like the reference's
  // per-filename WHERE clauses
  private val scheduleName = new java.util.concurrent.atomic.AtomicReference[String]
  // recovery runs UNDER the gate: the rt query is already live, and the
  // legacy normalization below REWRITES the predictions table — writers
  // must be serialized even though readers are race-safe under the
  // retirement/grace discipline
  private val hwm = new AtomicLong({
    gate.lock()
    try {
      // a writer that crashed with retirement manifests pending left
      // retired files holding disk — and every reader paying manifest
      // parsing — until the next fold happened to run (VERDICT r13 #2):
      // clear the grace-expired backlog NOW, before the first trigger.
      // DefaultGraceMs, not 0: another process's in-flight reader keeps
      // its window even across this writer's restart.
      LwwTable.gcRetired(spark, recordsDir, LwwTable.DefaultGraceMs)
      LwwTable.gcRetired(spark, predictionsDir, LwwTable.DefaultGraceMs)
      // upgrade path BEFORE the first backfill batch: rows from builds
      // whose backfill tier was the constant -1 outrank every clock-tier
      // value and would win the LWW against this run's re-predictions
      AutomaticImport.normalizeLegacyBackfillSeq(spark, predictionsDir, source)
      scheduleProvider() match {
        case Some((name, _)) =>
          scheduleName.set(name)
          AutomaticImport.recoverHighWaterMark(spark, predictionsDir, source,
            Some(name))
        // no schedule yet (or the tree vanished between the caller's check
        // and here): start from 0 — the loop skips iterations until a
        // version appears, then recovers the real mark for it
        case None => 0L
      }
      // a throw anywhere in here (a recovery rewrite failing, the
      // predictions tree unreadable) — or in ANY later construction step —
      // unwinds to the factory's guard, which releases the leases and
      // stops the query (ADVICE r15: the release must cover the whole
      // construction, not individual initializers)
    } finally gate.unlock()
  })
  // ring buffer, like Spark's own recentProgress: the mode runs until
  // interrupted, and an unbounded event log (one entry per idle iteration,
  // forever) would be a slow driver leak. Totals survive eviction.
  private val events = scala.collection.mutable.ArrayBuffer.empty[BackfillEvent]
  private val committedTotal = new AtomicLong(0)

  /** Current scheduled-predictions high-water mark (epoch seconds). */
  def highWaterMark: Long = hwm.get()

  /** The most recent backfill iterations (oldest first, bounded to the last
    * [[AutomaticImport.MaxRecentEvents]]). */
  def backfillEvents: Seq[BackfillEvent] =
    events.synchronized { events.toVector }

  /** Backfill iterations recorded over the whole run (committed batches +
    * buffer-full back-offs), unaffected by ring-buffer eviction. */
  def backfillEventCount: Long = committedTotal.get()

  private def record(e: BackfillEvent): Unit = events.synchronized {
    committedTotal.incrementAndGet()
    events += e
    if (events.size > AutomaticImport.MaxRecentEvents)
      events.remove(0, events.size - AutomaticImport.MaxRecentEvents)
  }

  /** No pending rt work: nothing available, no trigger mid-flight, and the
    * source has reported at least once (before the first progress event the
    * stream has not yet LISTED the directory — deciding "idle" then could
    * start a backfill ahead of a pre-existing backlog, which the reference's
    * scan-first loop never does). */
  private def streamIdle(): Boolean = {
    val st = query.status
    query.lastProgress != null && !st.isDataAvailable && !st.isTriggerActive
  }

  private val loop = new Thread(() => {
    var backoffUntil = Long.MinValue
    // true right after a COMMITTED backfill batch: the idle-confirm sleep is
    // skipped so a fresh deployment drains its buffer back-to-back (the
    // reference loop runs idle iterations consecutively). A single stale
    // observation here costs at most one rt batch delayed by one ST4
    // iteration — the latency trade the class doc already accepts. Every
    // other path (startup, busy, buffer-full, failure) keeps the
    // two-observation rule.
    var skipConfirm = false
    try {
      while (!stopFlag.get() && query.isActive) {
        // heartbeat the writer leases (cheap mtime bump, loop cadence is
        // far below the ttl). A lost lease means another writer took over
        // — folding on would be the two-writer interleaving the lease
        // exists to prevent, so this mode STOPS, mirroring the reference
        // writer dying on a lost MySQL connection.
        try leases.foreach(_.renew())
        catch {
          case e: IllegalStateException =>
            System.err.println(s"[automatic] writer lease lost: ${e.getMessage}")
            stopFlag.set(true)
            if (query.isActive) query.stop()
          case NonFatal(e) =>
            // renew can also throw IO errors (an NFS hiccup, setTimes
            // racing a takeover's claim rename). Before this arm existed,
            // such an exception escaped to the loop's outer catch
            // (InterruptedException only) and KILLED the backfill thread
            // while the stream kept ingesting — no folds, no cleanup, no
            // heartbeats, and the lease then expired under a live writer
            // (ADVICE r14). Log and retry next iteration instead: a
            // transient error clears; a persistent one ends in the lease
            // expiring and the next successful read turning it into the
            // IllegalStateException stop above.
            System.err.println(
              s"[automatic] writer lease heartbeat failed (will retry): $e")
        }
        if (stopFlag.get() || !query.isActive) ()
        else if (!streamIdle()) { skipConfirm = false; Thread.sleep(idlePollMs) }
        else {
          if (!skipConfirm)
            Thread.sleep(idleConfirmMs) // second look, > one trigger interval
          skipConfirm = false
          val now = nowEpochSecs()
          if (!stopFlag.get() && query.isActive && streamIdle()
              && now >= backoffUntil) {
            val decided = System.nanoTime()
            var failed = false
            gate.lock()
            try {
              // skip-log recovery sweep (FromDirs wires the shared
              // requeueSkipped; the refresh loop runs the same sweep when
              // data flows — this side covers a QUIET feed, where no
              // trigger ever fires to do it). Failures must not fail the
              // iteration: the sweep is an optimization over the operator's
              // manual re-queue, not a correctness gate.
              try idleSweep()
              catch { case NonFatal(e) =>
                System.err.println(s"[automatic] skip-log requeue sweep failed: $e") }
              // re-resolved per iteration: the store-backed mode reads the
              // CURRENT curve directories, so a re-analysis mid-run feeds
              // the next backfill batch (FileCache discipline); the SCHEDULE
              // re-resolves the same way (the reference recreates its
              // ScheduledPredictionsImporter with main.get_schedule() every
              // idle iteration, importer/mod.rs:309) — a version dropped
              // mid-run drives the very next backfill batch
              val (specific, defaults) = curves()
              scheduleProvider() match {
                case None =>
                  // DEGRADE like the decode path (the reference logs "No
                  // schedule data" and retries the next 5 s scan,
                  // mod.rs:372-374): a schedule tree vanished mid-run must
                  // not fail the iteration loudly every idle turn — skip,
                  // and the next idle turn (one confirm sleep later)
                  // re-resolves; when the tree reappears the per-version
                  // mark recovery below picks up where that version left off
                  System.err.println(
                    "[automatic] no schedule data; skipping backfill iteration")
                case Some((schedName, sched)) =>
              if (schedName != scheduleName.get()) {
                // new schedule version: the mark is per-version (the
                // reference's recovery filters by its current filename, so
                // an unseen version starts from scratch and RE-PREDICTS the
                // buffer window with the new data; the stale delete below
                // then retires the old version's rows batch by batch)
                hwm.set(AutomaticImport.recoverHighWaterMark(spark,
                  predictionsDir, source, Some(schedName)))
                scheduleName.set(schedName)
              }
              ScheduledPredictions.advance(spark, sched, source,
                specific, defaults, hwm.get(), now, Some(schedName)) match {
                case None =>
                  backoffUntil = now + bufferFullBackoffSecs
                  record(BackfillEvent(decided, System.nanoTime(),
                    hwm.get(), hwm.get(), 0L, bufferFull = true,
                    scheduleFileName = schedName))
                case Some(batch) =>
                  if (batch.tripCount > 0)
                    StreamingImport.upsertTable(
                      batch.predictions.withColumn("refresh_seq",
                        lit(AutomaticImport.backfillSeq(now))),
                      predictionsDir,
                      keyCols = StreamingImport.PredictionKeyCols,
                      newestBy = AutomaticImport.backfillOrdering(schedName))
                  // the reference's post-batch stale-schedule delete
                  // (delete_outdated_predictions): schedule-origin rows from
                  // an OLDER version inside the window this batch just
                  // re-predicted would duplicate renamed trips. Runs for
                  // ZERO-trip batches too — they still advance the mark, and
                  // skipping them would leave old-version rows alive inside a
                  // window the new version has (vacuously) covered. Steady
                  // state (one version) pays only the partition-pruned,
                  // footer-filtered probe.
                  Directory.deleteStaleSchedulePredictions(spark,
                    predictionsDir, source, schedName, batch.newHighWaterMark)
                  record(BackfillEvent(decided, System.nanoTime(), hwm.get(),
                    batch.newHighWaterMark, batch.tripCount,
                    bufferFull = false, scheduleFileName = schedName))
                  hwm.updateAndGet(h => math.max(h, batch.newHighWaterMark))
                  skipConfirm = true // committed: drain back-to-back
              }
              }
              // the reference's per-iteration --cleanup (run_cleanup,
              // importer/mod.rs:355-359): partition-granular here, under
              // the gate like every other predictions-table writer
              if (performCleanup)
                Directory.cleanupOutdatedPredictionsTable(
                  spark, predictionsDir, source, now)
              // fold the LWW delta trees while the stream is idle — the
              // ONLY base-fold site (gate-held, so no writer races the
              // fold); the size-triggered backstop inside upsertTable is a
              // delta→delta merge (O(working set), never O(partition)), so
              // a never-idle deployment's delta stays bounded without its
              // triggers ever paying a base fold. Steady state
              // (nothing appended since the last fold) is one listing miss
              // per table. The two tables fold on DIFFERENT policies:
              //  - records is unbounded (it grows with history), and a fold
              //    rewrites the whole touched day partition — folding on
              //    every idle gap would pay that rewrite for a handful of
              //    rows (a feed with minute-scale lulls would rewrite the
              //    day partition hundreds of times a day). Nothing
              //    latency-sensitive reads records un-narrowed (the refresh
              //    basis resolves AFTER its changed-vehicle semi-join), so
              //    an open records delta costs only a bounded listing —
              //    fold it only once it has accumulated a worthwhile batch;
              //  - predictions fold every iteration: the table is
              //    cleanup-bounded to the live window (fold cost bounded),
              //    and the monitor's steady-state short-circuit — a pruned
              //    scan instead of a per-request window — depends on its
              //    delta staying empty. ONLY while a schedule version is
              //    resolvable: the ordering's version tie-break must match
              //    the readers', and a restart during an outage
              //    (scheduleName still null) could otherwise collapse a
              //    cross-version same-second tie left un-compacted by a
              //    previous run toward the OLD version — which the stale
              //    delete would then remove, losing the prediction.
              // deltaWorthFolding, not a bare file count: the on-trigger
              // backstop merges delta files down to one per partition
              // (LwwTable.mergeDelta), so after a busy spell the FILE count
              // can sit below the bound while the delta holds 64+ triggers'
              // worth of rows — a merged file is itself the marker that a
              // worthwhile batch is waiting
              if (LwwTable.deltaWorthFolding(spark, recordsDir,
                  AutomaticImport.RecordsIdleFoldMinFiles))
                RecordsTable.compact(spark, recordsDir)
              Option(scheduleName.get()).foreach(name =>
                PredictionsTable.compact(spark, predictionsDir, Some(name)))
            } catch {
              case e: InterruptedException => throw e
              case NonFatal(e) =>
                // the reference prints and sleeps until the next scan
                // (importer/mod.rs:321-327); a transient failure must not
                // kill the mode
                System.err.println(s"[automatic] backfill iteration failed: $e")
                failed = true
            } finally gate.unlock()
            // back-off OUTSIDE the gate: sleeping while holding it would
            // stall any rt micro-batch that arrived during the failure
            if (failed) { skipConfirm = false; Thread.sleep(idlePollMs) }
          }
        }
      }
    } catch { case _: InterruptedException => () }
  }, "graft-automatic-backfill")
  loop.setDaemon(true)
  loop.start()

  /** Stops the backfill loop, then the stream, then releases the writer
    * leases. Idempotent. The leases are released ONLY once the loop thread
    * is truly gone: if the join timed out on a wedged fold, handing the
    * lease to a new writer while that fold may still commit would be
    * exactly the two-writer interleaving the lease prevents — leaving it
    * to expire (ttl) is the safe default. */
  def stop(): Unit = {
    stopFlag.set(true)
    loop.interrupt()
    loop.join(60000)
    if (query.isActive) query.stop()
    if (!loop.isAlive) leases.foreach(_.release())
  }
}

object AutomaticImport {

  /** Backfill rows sit BELOW every realtime refresh batch id in the
    * predictions LWW (batch ids start at 0). Legacy constant tier — the
    * live loop writes [[backfillSeq]] instead (a store holding BOTH forms
    * would let a -1 row beat every clock-tier re-prediction); kept for the
    * restart-advance idempotence test, which re-covers a window where
    * identical values make the tie harmless. */
  val BackfillSeq: Long = -1L

  /** The backfill tier's LWW sequence: strictly below every realtime batch
    * id (those are ≥ 0), but monotonic WITH THE CLOCK inside the tier — a
    * schedule swap resets the mark and RE-predicts windows the old version
    * already covered, and the newer write must deterministically win the
    * shared-key upsert (the reference's blind UPDATE always overwrites;
    * a constant tier value would leave the tie to shuffle order, and the
    * stale-schedule delete could then remove the surviving OLD row —
    * losing the prediction for an unchanged trip entirely). */
  def backfillSeq(nowEpochSecs: Long): Long = -(1L << 62) + nowEpochSecs

  /** LWW ordering for backfill-tier upserts: `refresh_seq` first, then
    * prefer rows stamped with the CURRENT schedule version. [[backfillSeq]]
    * has 1-second granularity, so a swap landing in the same epoch second
    * as the old version's last committed batch would TIE on the sequence
    * alone, leave the pick to shuffle order, and let the stale-schedule
    * delete remove a row that happened to win — the version preference
    * breaks the tie deterministically in favor of the new data (the old
    * row then simply loses the merge). Realtime rows are unaffected: their
    * seqs are ≥ 0 and decide on the first field. */
  def backfillOrdering(currentScheduleName: String): org.apache.spark.sql.Column =
    PredictionsTable.ordering(Some(currentScheduleName))

  /** One-time upgrade rewrite (before this run's first backfill batch):
    * rows written by builds whose backfill tier was the CONSTANT −1
    * ([[BackfillSeq]]) outrank every clock-tier [[backfillSeq]] value
    * (−1 > −2⁶²+now), so a re-prediction after a schedule rename/swap
    * would lose the LWW upsert to them — and the stale-schedule delete
    * could then remove the surviving old-name rows, dropping a still-valid
    * trip's prediction entirely. Rewrites this source's schedule-origin
    * `refresh_seq = −1` rows to the clock-tier FLOOR (`backfillSeq(0)`),
    * which every new write beats. Probe-first and partition-scoped like
    * [[graft.gtfs.Directory.deleteStaleSchedulePredictions]]: steady state
    * (no legacy rows) is one partition-pruned, footer-filtered 3-column
    * probe. Returns the rewritten row count. Caller holds the gate. */
  def normalizeLegacyBackfillSeq(spark: SparkSession, predictionsDir: String,
      source: String, graceMs: Long = LwwTable.DefaultGraceMs): Long = {
    // LIVE BASE tree only, by construction: legacy rows come from builds
    // that predate the delta layout (everything they wrote is compacted
    // base), and every delta append is new-tier — so the `_delta` tree can
    // be ignored, and the rewrite stays correct even against an un-folded
    // delta left by a crashed previous run (its rows resolve against the
    // normalized ones exactly as they would have against the originals)
    val table = LwwTable.readBaseLiveOpt(spark, predictionsDir)
      .getOrElse(return 0L)
    val legacy = col("origin_type") === Codes.OriginSchedule &&
      col("source") === lit(source) && col("refresh_seq") === lit(BackfillSeq)
    val parts = table.filter(legacy)
      .groupBy(col("source"), col("trip_start_date"))
      .agg(count(lit(1)).as("n")).collect()
    if (parts.isEmpty) return 0L
    val n = parts.map(_.getLong(2)).sum
    val cond = parts.map(r =>
        col("source") === lit(r.getString(0))
          && col("trip_start_date") <=> lit(r.getDate(1)))
      .reduce(_ || _)
    // rewrite ONLY the touched partitions (kept rows ride along unchanged)
    // through the retirement/grace discipline — the normalized rows enter
    // as delta files and the old base files are retired atomically, so an
    // in-flight reader (this process or another) never loses a planned
    // file and no crash point loses a row
    val rewritten = table.filter(cond)
      .withColumn("refresh_seq",
        when(legacy, lit(backfillSeq(0L))).otherwise(col("refresh_seq")))
    val touched = parts.map(r =>
      (Option(r.getString(0)), Option(r.getDate(1)).map(_.toString))).toSeq
    LwwTable.replacePartitions(spark, predictionsDir, touched, rewritten,
      graceMs)
    n
  }

  /** [[backfillEvents]] keeps at most this many recent entries. */
  val MaxRecentEvents: Int = 512

  /** The idle branch folds the RECORDS delta only once it holds at least
    * this many files (≈ this many triggers' appends): each fold rewrites
    * the whole touched day partition, so folding per idle gap would turn a
    * feed with minute-scale lulls into hundreds of full-partition rewrites
    * a day for near-empty deltas. Below the bound an open records delta
    * costs one bounded listing per reader — every records consumer narrows
    * before resolving. The 64-file backstop still caps the worst case. */
  val RecordsIdleFoldMinFiles: Int = 8

  /** Startup high-water-mark recovery — the reference's
    * `get_latest_prediction_time_from_database`
    * (scheduled_predictions_importer.rs:304-336): the greatest scheduled trip
    * start among stored SCHEDULE-origin predictions OF THIS SOURCE (source is
    * part of the reference's WHERE clause — with several sources sharing one
    * table, another source's mark must not make this source's backfill skip
    * its own unpredicted windows); 0 when the table does not exist yet.
    * `scheduleFileName` narrows further to marks written from one schedule
    * version (the reference filters by its current schedule file, so a NEW
    * schedule version restarts the mark and re-predicts the buffer window
    * with the new data). Like the reference, an empty-window mark advance
    * (no trips, mark jumped to the buffer end) is not persisted — the next
    * process re-scans that window, finds it empty again, and jumps again. */
  def recoverHighWaterMark(spark: SparkSession, predictionsDir: String,
      source: String, scheduleFileName: Option[String] = None): Long = {
    // tableHasData, not exists: --cleanup can delete every date partition
    // (expired calendar + days-quiet feed), and a metadata-only root must
    // read as "no marks stored", not crash schema inference at startup
    if (!LwwTable.hasData(spark, predictionsDir)) 0L
    else {
      // source is a partition column: the filter prunes the scan (base AND
      // delta trees) to this source's directories before any data is read.
      // RAW union, no LWW resolution: the mark is a MAX over trip starts,
      // and an LWW loser shares its key — and thus its trip start — with
      // its winner, so the unresolved max equals the resolved one
      val scoped = LwwTable.readRaw(spark, predictionsDir)
        .filter(col("origin_type") === Codes.OriginSchedule
          && col("source") === lit(source))
      val r = scheduleFileName.fold(scoped)(n =>
          scoped.filter(col("schedule_file_name") === lit(n)))
        .agg(max(unix_timestamp(GtfsTime.dateAndTime(
          col("trip_start_date"), col("trip_start_time"))))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
  }

  /** Startup guard shared by the three factories (ADVICE r15: ONE guard
    * over the WHOLE startup, not per-initializer catches):
    *
    *  1. acquire both writer leases FIRST — acquire-both-or-none; a
    *     refusal (foreign writer) fails before the streaming query even
    *     starts, with nothing to unwind;
    *  2. start the streaming query;
    *  3. construct the handle (mark recovery, legacy-row normalization —
    *     reads and rewrites the predictions table under the leases).
    *
    * A throw from ANY of 2-3 releases every acquired lease (leaving them
    * to the shutdown hook or ttl would block a replacement writer for up
    * to the full ttl with no writer running) and stops the query if it
    * started (a handle-less query would keep ingesting with no way to
    * stop it but `spark.streams`). */
  private def startGuarded(spark: SparkSession, recordsDir: String,
      predictionsDir: String)(
      startQuery: => org.apache.spark.sql.streaming.StreamingQuery)(
      mk: (org.apache.spark.sql.streaming.StreamingQuery, Seq[WriterLease])
        => AutomaticImport): AutomaticImport = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[WriterLease]
    try {
      Seq(recordsDir, predictionsDir).distinct
        .foreach(d => acc += WriterLease.acquire(spark, d))
      val query = startQuery
      try mk(query, acc.toSeq)
      catch {
        case t: Throwable =>
          try query.stop()
          catch { case scala.util.control.NonFatal(s) => t.addSuppressed(s) }
          throw t
      }
    } catch {
      case t: Throwable =>
        acc.foreach(l => try l.release() catch { case NonFatal(_) => () })
        throw t
    }
  }

  /** Starts the composed automatic mode; see the class doc. The curve
    * tables serve BOTH halves: the realtime stream snapshots them into the
    * long-lived broadcast Predictor, the idle backfill joins them per ST4
    * batch. `nowEpochSecs` is injectable so tests (and replays) can pin the
    * prediction buffer. PINS `schedule` and the curve Datasets for the
    * process lifetime — a compat/test surface; production deployments use
    * [[startFromDirs]], which hot-reloads both. */
  def start(spark: SparkSession, rtDir: String, schedule: GtfsSchedule,
      source: String, recordsDir: String, predictionsDir: String,
      checkpointDir: String,
      specific: Dataset[SpecificCurveRow], defaults: Dataset[DefaultCurveRow],
      nowEpochSecs: () => Long = () => System.currentTimeMillis() / 1000,
      triggerInterval: String = "5 seconds",
      idlePollMs: Long = 1000L,
      idleConfirmMs: Long = 10000L,
      bufferFullBackoffSecs: Long = 20 * 60L,
      maxFilesPerTrigger: Int = 256,
      performCleanup: Boolean = false): AutomaticImport = {
    val gate = new ReentrantLock()
    startGuarded(spark, recordsDir, predictionsDir)(
      StreamingImport.startPredictionRefresh(spark, rtDir, schedule,
        source, recordsDir, predictionsDir, checkpointDir, specific, defaults,
        automatic = true, maxFilesPerTrigger = maxFilesPerTrigger,
        triggerInterval = triggerInterval, gate = Some(gate)))(
      (query, leases) => new AutomaticImport(query, spark,
        () => Some((source + "_schedule", schedule)), source, recordsDir,
        predictionsDir,
        () => (specific, defaults), nowEpochSecs, idlePollMs, idleConfirmMs,
        bufferFullBackoffSecs, performCleanup, gate, leases))
  }

  /** [[start]] against an on-disk [[graft.gtfs.CurveStore]]: the realtime
    * half runs the mtime-invalidated CurveCache loop
    * ([[StreamingImport.startPredictionRefreshFromStore]]) and the idle
    * backfill re-reads the store directories per iteration — re-running the
    * analyser mid-run feeds both halves without a restart, the reference's
    * FileCache discipline (src/main.rs:321-393). Still PINS `schedule` for
    * the process lifetime — a compat/test surface; production uses
    * [[startFromDirs]], which hot-reloads the schedule too. */
  def startFromStore(spark: SparkSession, rtDir: String, schedule: GtfsSchedule,
      source: String, recordsDir: String, predictionsDir: String,
      checkpointDir: String, specificDir: String, defaultDir: String,
      nowEpochSecs: () => Long = () => System.currentTimeMillis() / 1000,
      triggerInterval: String = "5 seconds",
      idlePollMs: Long = 1000L,
      idleConfirmMs: Long = 10000L,
      bufferFullBackoffSecs: Long = 20 * 60L,
      maxFilesPerTrigger: Int = 256,
      performCleanup: Boolean = false): AutomaticImport = {
    val gate = new ReentrantLock()
    startGuarded(spark, recordsDir, predictionsDir)(
      StreamingImport.startPredictionRefreshFromStore(spark, rtDir,
        schedule, source, recordsDir, predictionsDir, checkpointDir,
        specificDir, defaultDir,
        automatic = true, maxFilesPerTrigger = maxFilesPerTrigger,
        triggerInterval = triggerInterval, gate = Some(gate)))(
      (query, leases) => new AutomaticImport(query, spark,
        () => Some((source + "_schedule", schedule)), source, recordsDir,
        predictionsDir,
        () => (CurveStore.loadSpecific(spark, specificDir),
          CurveStore.loadDefault(spark, defaultDir)),
        nowEpochSecs, idlePollMs, idleConfirmMs, bufferFullBackoffSecs,
        performCleanup, gate, leases))
  }

  /** The PRODUCTION-FAITHFUL automatic mode: everything hot-reloads.
    * [[startFromStore]]'s curve discipline plus a [[ScheduleCache]] over the
    * dated versions under `scheduleParentDir` — rt files join their J6 as-of
    * schedule per batch, the idle backfill re-resolves the NEWEST version
    * per iteration (reference: `ScheduledPredictionsImporter::new` calls
    * `main.get_schedule()` every idle turn, importer/mod.rs:309), a version
    * dropped mid-run restarts the per-version high-water mark and
    * re-predicts the buffer window, and each committed batch retires the
    * old version's schedule-origin rows inside its window
    * (`delete_outdated_predictions`). Requires at least one dated schedule
    * directory at startup. */
  def startFromDirs(spark: SparkSession, rtDir: String,
      scheduleParentDir: String,
      source: String, recordsDir: String, predictionsDir: String,
      checkpointDir: String, specificDir: String, defaultDir: String,
      nowEpochSecs: () => Long = () => System.currentTimeMillis() / 1000,
      triggerInterval: String = "5 seconds",
      idlePollMs: Long = 1000L,
      idleConfirmMs: Long = 10000L,
      bufferFullBackoffSecs: Long = 20 * 60L,
      maxFilesPerTrigger: Int = 256,
      performCleanup: Boolean = false): AutomaticImport = {
    val schedules = new ScheduleCache(spark, scheduleParentDir)
    require(schedules.newestDir().isDefined,
      s"no dated schedule directory under $scheduleParentDir")
    val gate = new ReentrantLock()
    startGuarded(spark, recordsDir, predictionsDir)(
      StreamingImport.startPredictionRefreshFromDirs(spark, rtDir,
        schedules, source, recordsDir, predictionsDir, checkpointDir,
        specificDir, defaultDir,
        automatic = true, maxFilesPerTrigger = maxFilesPerTrigger,
        triggerInterval = triggerInterval, gate = Some(gate)))(
      (query, leases) => new AutomaticImport(query, spark,
        // None when every dated version vanished mid-run: the backfill skips
        // the iteration with a logged warning (the decode path degrades the
        // same way) instead of failing it, and recovers when the tree returns
        () => schedules.newest(),
        source, recordsDir, predictionsDir,
        () => (CurveStore.loadSpecific(spark, specificDir),
          CurveStore.loadDefault(spark, defaultDir)),
        nowEpochSecs, idlePollMs, idleConfirmMs, bufferFullBackoffSecs,
        performCleanup, gate, leases,
        idleSweep = () => StreamingImport.requeueSkipped(spark, schedules,
          checkpointDir, rtDir)))
  }
}
