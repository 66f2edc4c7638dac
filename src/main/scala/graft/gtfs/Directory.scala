package graft.gtfs

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Directory-based ingest orchestration (S4/S5/J6, importer/mod.rs:361-460):
  * filename-dated rt files are grouped under the newest schedule whose date
  * is ≤ the file's date; files older than every schedule are skipped; files
  * without a parseable date go to `failed/`; processed files move to
  * `imported/`. File listings are tiny → the assignment is a pure driver
  * function (the heavy work — decode + joins — stays distributed).
  */
object Directory {

  private val DateRe = raw"(\d{4})-(\d{2})-(\d{2})".r // X1, src/main.rs:101-121

  /** Everything after the last '/': the reference's `short_filename`
    * (importer/mod.rs:493). Date parsing over a PATH must only see the
    * entry's own name — a dated ANCESTOR directory (a dated baseDir) would
    * otherwise date every child, including undated ones like `current`,
    * which could then tie with (and out-sort) the real dated entries.
    * Shared by the date parsers here and [[ScheduleCache.shortName]] so the
    * date-parsing and the `schedule_file_name` stamping can never
    * diverge. */
  private[gtfs] def baseName(p: String): String =
    p.substring(p.lastIndexOf('/') + 1)

  def dateFromFilename(name: String): Option[java.time.LocalDate] =
    DateRe.findFirstMatchIn(name).flatMap { m =>
      try Some(java.time.LocalDate.of(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt))
      catch { case _: Exception => None }
    }

  private val DateTimeRe = raw"(\d{4}-\d{2}-\d{2})T(\d{2}):(\d{2}):(\d{2})".r

  /** X2: filename → ISO datetime (`date_time_from_filename`,
    * analyser/mod.rs:191-199); falls back to the X1 date at midnight when
    * the name carries only a date. */
  def dateTimeFromFilename(name: String): Option[java.time.LocalDateTime] =
    DateTimeRe.findFirstMatchIn(name) match {
      case Some(m) =>
        try Some(java.time.LocalDateTime.parse(
          s"${m.group(1)}T${m.group(2)}:${m.group(3)}:${m.group(4)}"))
        catch { case _: Exception => None }
      case None => dateFromFilename(name).map(_.atStartOfDay)
    }

  /** A1's rt-file statistics half (count.rs:41-70): file count and byte
    * size per file-date bucket — the reference's `fs::metadata` loop over
    * `rt_filenames`, as a scan of the listing's (path, length) metadata
    * only (the binary content column is never touched, so nothing but the
    * file index is read). */
  def rtFileStats(spark: SparkSession, dir: String, glob: String = "*.pb"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("length"))
      .withColumn("file_name", regexp_extract(col("path"), "([^/]+)$", 1))
      .withColumn("file_ts", coalesce( // X2 with X1-midnight fallback;
        // try_to_timestamp: a non-matching regex yields '' (ANSI cast throws)
        try_to_timestamp(regexp_extract(col("file_name"),
          raw"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})", 1)),
        try_to_timestamp(regexp_extract(col("file_name"), raw"(\d{4}-\d{2}-\d{2})", 1))))
      .filter(col("file_ts").isNotNull)
      .groupBy(to_date(col("file_ts")).as("file_date"))
      .agg(count(lit(1)).as("rt_file_count"), sum(col("length")).as("rt_file_size"))

  final case class Assignment(
      bySchedule: Seq[(String, Seq[String])], // schedule file → its rt files, oldest first
      skipped: Seq[String],                   // rt older than every schedule
      invalid: Seq[String],                   // rt with no parseable date
      invalidSchedules: Seq[String])          // schedules with no parseable date

  /** J6 as-of assignment: each rt file → newest schedule with date ≤ rt date. */
  def assignSchedules(rtFiles: Seq[String], scheduleFiles: Seq[String]): Assignment = {
    // basenames only (see [[baseName]]): a date in an ancestor directory
    // must neither date an undated schedule nor rescue an undated rt file
    // from failed/
    val schedules = scheduleFiles
      .flatMap(f => dateFromFilename(baseName(f)).map(d => (f, d)))
      .sortBy(_._2.toEpochDay)
    val invalidSchedules = scheduleFiles.filter(f => dateFromFilename(baseName(f)).isEmpty)
    require(schedules.nonEmpty || rtFiles.isEmpty,
      "No schedule data (but real time data is present)")
    val oldest = schedules.headOption.map(_._2)

    val invalid = scala.collection.mutable.ArrayBuffer[String]()
    val skipped = scala.collection.mutable.ArrayBuffer[String]()
    val groups = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[String]]()
    rtFiles.sorted.foreach { rt =>
      dateFromFilename(baseName(rt)) match {
        case None => invalid += rt
        case Some(d) if oldest.exists(d.isBefore) => skipped += rt
        case Some(d) =>
          schedules.reverse.find(!_._2.isAfter(d)).foreach { case (sched, _) =>
            groups.getOrElseUpdate(sched, scala.collection.mutable.ArrayBuffer()) += rt
          }
      }
    }
    Assignment(groups.toSeq.map { case (s, fs) => (s, fs.toSeq) },
      skipped.toSeq, invalid.toSeq, invalidSchedules)
  }

  /** Newest DATED path by PARSED date (undated paths ignored): the pick the
    * reference makes with `read_dir_simple(...).last()` (src/main.rs:278-293),
    * but safe under mixed naming prefixes — `b-2024-05-01` must not beat
    * `a-2024-06-01` the way a lexicographic max would. Ties on the date fall
    * back to path order so the pick stays deterministic. The date is parsed
    * from the BASENAME only — a dated ancestor (e.g. a dated baseDir) must
    * not date its undated children (see [[baseName]]). */
  def newestDatedDir(paths: Seq[String]): Option[String] = {
    val dated = paths.flatMap(p =>
      dateFromFilename(baseName(p)).map(d => (d.toEpochDay, p)))
    if (dated.isEmpty) None else Some(dated.max._2)
  }

  /** S5: move a processed/failed file into a sibling directory. */
  def moveTo(file: String, dir: String): Unit = {
    val src = Paths.get(file)
    val target = Paths.get(dir)
    Files.createDirectories(target)
    Files.move(src, target.resolve(src.getFileName), StandardCopyOption.REPLACE_EXISTING)
  }

  /** Full directory import (`import --record manual <dir>` shape): scans
    * `dir/rt` against dated schedule directories under `dir/schedule`,
    * imports each group with its matched schedule, then archives rt files to
    * `dir/imported` (failures to `dir/failed`). Returns the unioned records.
    * A11: per-group success/failure counts are returned alongside. */
  def importTree(spark: SparkSession, baseDir: String, source: String,
                 archive: Boolean = true): (Option[DataFrame], Seq[(String, Int, Int)]) = {
    def list(sub: String): Seq[String] = {
      val d = new java.io.File(s"$baseDir/$sub")
      if (!d.exists()) Nil
      else d.listFiles().map(_.getPath).sorted.toSeq
    }
    val rt = list("rt")
    val schedules = list("schedule")
    if (rt.isEmpty) return (None, Nil)
    val assignment = assignSchedules(rt, schedules)
    // only undated RT files are archived to failed/ — an undated SCHEDULE
    // directory is skipped in place (moving schedule data out of schedule/
    // would break every later import that needed it)
    assignment.invalid.foreach(f => if (archive) moveTo(f, s"$baseDir/failed"))

    var all: Option[DataFrame] = None
    val stats = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    assignment.bySchedule.foreach { case (schedFile, rtFiles) =>
      var sched: GtfsSchedule = null // load inside the try: a corrupt
                                     // schedule is a per-group failure
      try {
        sched = GtfsSchedule.load(spark, schedFile)
        val bin = spark.read.format("binaryFile")
          .load(rtFiles: _*)
        // localCheckpoint truncates the lineage BEFORE the source files are
        // archived away — the returned DataFrame must not re-read them
        val recs = Importer.recordsFromRt(spark,
          Importer.decodeRtFiles(spark, bin), sched, source)
          .localCheckpoint(true)
        all = all.map(_.unionByName(recs)).orElse(Some(recs))
        stats += ((schedFile, rtFiles.size, 0))
        if (archive) rtFiles.foreach(f => moveTo(f, s"$baseDir/imported"))
      } catch {
        case e: Exception =>
          // surface WHY the group was quarantined (the reference eprintln!s
          // per group, importer/mod.rs:438-441) — a silent count gives the
          // operator nothing to act on when months of rt data move to failed/
          System.err.println(s"[import] group $schedFile failed: $e")
          stats += ((schedFile, 0, rtFiles.size))
          if (archive) rtFiles.foreach(f => moveTo(f, s"$baseDir/failed"))
      } finally if (sched != null) sched.unpersist()
      // ^ the group's records are checkpointed, so its S2 cache is dead — a
      // tree with months of schedule versions must not accumulate one per
      // group
    }
    (all, stats.toSeq)
  }

  /** S15: drop predictions whose trip started more than 12 h ago
    * (importer/mod.rs:174-223 run_cleanup; the parquet-table rewrite is the
    * engine-internal DELETE). */
  def cleanupOutdatedPredictions(predictions: DataFrame, nowEpochSecs: Long): DataFrame = {
    val cutoff = nowEpochSecs - 12 * 3600
    predictions.filter(
      unix_timestamp(GtfsTime.dateAndTime(col("trip_start_date"), col("trip_start_time")))
        >= cutoff)
  }

  /** S15 at TABLE level, for the long-running automatic mode: deletes whole
    * `source=<s>/trip_start_date=<d>` partition directories of the stored
    * predictions table once every trip they can possibly hold started more
    * than 12 h ago (MAX_ESTIMATED_TRIP_DURATION; the reference's
    * `run_cleanup` DELETE, importer/mod.rs:174-198). The reference deletes
    * row-exact in SQL; here the delete is PARTITION-granular — pure
    * directory metadata, no data rewrite, which is what keeps the table
    * bounded at cluster scale — conservatively keeping a date directory
    * until even a `maxTripStartSecs` past-midnight start (GTFS times may
    * exceed 24:00) would be outdated. Rows inside the boundary directory
    * linger at most two extra days and are excluded exactly at read time by
    * [[predictionWindowFilter]]. The null-date directory
    * (`__HIVE_DEFAULT_PARTITION__`) is never deleted, matching the
    * reference's SQL where a NULL date never satisfies the comparison.
    * Returns the deleted partition paths.
    *
    * Not gated on the [[LwwTable]] writer lease: the deletion targets only
    * date partitions >12 h past the live window, which no fold ever writes
    * into (appends carry current dates) — a second process running it
    * beside a live writer deletes only dead data, and a retirement
    * manifest naming a deleted file GC's as a skipped no-op. The automatic
    * mode still calls it under its gate like every predictions writer. */
  def cleanupOutdatedPredictionsTable(spark: SparkSession, predictionsDir: String,
      source: String, nowEpochSecs: Long,
      maxTripStartSecs: Long = 48 * 3600L): Seq[String] = {
    val cutoff = nowEpochSecs - 12 * 3600
    val conf = spark.sparkContext.hadoopConfiguration
    // BOTH trees of the LWW layout: an outdated date directory under
    // `_delta/` is just as dead as its base twin, and leaving it would
    // resurrect the partition at the next compaction
    Seq(s"$predictionsDir/source=$source",
        s"${LwwTable.deltaDir(predictionsDir)}/source=$source").flatMap { r =>
      val root = new org.apache.hadoop.fs.Path(r)
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { st =>
        val name = st.getPath.getName
        val value = name.stripPrefix("trip_start_date=")
        if (value == name) None // not a date partition directory
        else
          try {
            val dayEpoch = java.time.LocalDate.parse(value).toEpochDay * 86400L
            if (dayEpoch + maxTripStartSecs < cutoff) {
              fs.delete(st.getPath, true)
              Some(st.getPath.toString)
            } else None
          } catch { // __HIVE_DEFAULT_PARTITION__ and friends: keep
            case _: java.time.format.DateTimeParseException => None
          }
      }
    }
  }

  /** The reference's post-backfill stale-schedule delete
    * (`delete_outdated_predictions`, scheduled_predictions_importer.rs:
    * 234-265): after a schedule swap, SCHEDULE-origin predictions written
    * from an OLDER schedule version that sit INSIDE the window the new
    * version has already re-predicted (trip start < `endEpochSecs`) are
    * deleted — changed trip_ids would otherwise show up as duplicate trips
    * in the monitor. Realtime-origin rows are never touched.
    *
    * Scale shape: a cheap PROBE first — one scan of three columns, partition-
    * pruned to this source and filtered by parquet predicate pushdown
    * (origin_type / schedule_file_name are dictionary-encoded low-cardinality
    * columns, so untouched row groups are skipped on footer stats) — and only
    * when stale rows EXIST are their partitions rewritten, through
    * [[LwwTable.replacePartitions]]: the kept rows enter as delta files and
    * the old base files are RETIRED (atomic manifest, GC after `graceMs`),
    * so no crash point loses a row and no in-flight reader of the live
    * table loses a planned file — the same commit discipline as the fold.
    * In the steady state (no schedule change) every call is probe-only.
    * Returns the deleted row count. Callers in the automatic mode hold the
    * predictions gate. */
  def deleteStaleSchedulePredictions(spark: SparkSession, predictionsDir: String,
      source: String, currentScheduleName: String, endEpochSecs: Long,
      graceMs: Long = LwwTable.DefaultGraceMs): Long = {
    // fold the delta tree FIRST: stale rows appended by pre-swap backfill
    // batches may still sit under `_delta/`, which the partition rewrite
    // below (base-scoped by design) would otherwise miss — and after the
    // fold the whole probe-and-rewrite runs on the live base alone, exactly
    // as before the LSM layout. Callers hold the predictions gate, so no
    // append races the fold. Steady state (idle branch just compacted) is
    // one listing miss.
    PredictionsTable.compact(spark, predictionsDir, Some(currentScheduleName),
      graceMs)
    if (!LwwTable.hasData(spark, predictionsDir)) return 0L
    val startTs = unix_timestamp(
      GtfsTime.dateAndTime(col("trip_start_date"), col("trip_start_time")))
    val stale = col("origin_type") === Codes.OriginSchedule &&
      col("source") === lit(source) &&
      col("schedule_file_name") =!= lit(currentScheduleName) &&
      startTs < lit(endEpochSecs)
    // LIVE rows only (readRaw excludes files pending retirement — re-keeping
    // an already-retired row would resurrect it through the rewrite)
    val table = LwwTable.readRaw(spark, predictionsDir)
    val staleParts = table.filter(stale)
      .groupBy(col("source"), col("trip_start_date"))
      .agg(count(lit(1)).as("n")).collect()
    if (staleParts.isEmpty) return 0L
    val deleted = staleParts.map(_.getLong(2)).sum

    val cond = staleParts.map(r =>
        col("source") === lit(r.getString(0))
          && col("trip_start_date") <=> lit(r.getDate(1)))
      .reduce(_ || _)
    // coalesce the predicate: a NULL start instant makes `stale` NULL, and
    // filter(!NULL) would silently DROP that kept row during the rewrite.
    // No localCheckpoint needed anymore: the rewrite writes a temp tree and
    // renames in — it never overwrites the files the plan reads
    val kept = table.filter(cond && !coalesce(stale, lit(false)))
    val parts = staleParts.map(r =>
      (Option(r.getString(0)), Option(r.getDate(1)).map(_.toString))).toSeq
    LwwTable.replacePartitions(spark, predictionsDir, parts, kept, graceMs)
    deleted
  }

  /** True when the parquet table at `dir` holds at least one DATA file.
    * [[cleanupOutdatedPredictionsTable]] can legitimately delete EVERY date
    * partition (expired calendar + quiet feed for a few days), leaving the
    * table root with only metadata (`_SUCCESS`, empty `source=` dirs) — a
    * state `spark.read.parquet` rejects with "unable to infer schema".
    * Readers of upsert-maintained tables treat that state as "table
    * absent". Walks level by level and NEVER descends into a hidden
    * (`_`/`.`-prefixed) subtree — a killed writer's leftover
    * `.spark-staging-…` or `_temporary` tree of any size costs nothing, and
    * its uncommitted part files are not data. Short-circuits on the first
    * visible file, so the cost is O(visited directories), not O(files). */
  def tableHasData(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def probe(d: org.apache.hadoop.fs.Path): Boolean = {
      val children = fs.listStatus(d)
      children.exists(c => c.isFile && visibleName(c.getPath.getName)) ||
        children.exists(c => c.isDirectory && visibleName(c.getPath.getName)
          && probe(c.getPath))
    }
    fs.exists(p) && probe(p)
  }

  /** Hadoop's hidden-path convention, shared by every listing in the engine
    * ([[tableHasData]], the LWW delta walk, the skip log): `_`- and
    * `.`-prefixed entries are metadata/staging, never data. ONE definition
    * so the walks cannot drift. */
  private[graft] def visibleName(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** ST3: keep predictions only inside the live window
    * [now − 12 h, now + 7 d 12 h] (MAX_ESTIMATED_TRIP_DURATION and
    * PREDICTION_BUFFER_SIZE, scheduled_predictions_importer.rs:29-30). */
  def predictionWindowFilter(predictions: DataFrame, nowEpochSecs: Long): DataFrame = {
    val lo = nowEpochSecs - 12 * 3600
    val hi = nowEpochSecs + (7 * 24 + 12) * 3600
    val startTs = unix_timestamp(
      GtfsTime.dateAndTime(col("trip_start_date"), col("trip_start_time")))
    predictions.filter(startTs >= lo && startTs <= hi)
  }
}

/** S19: health-ping side channel as a StreamingQueryListener — fires the
  * supplied callback on query progress, rate-limited to once per minute
  * (importer/mod.rs:268-292). The callback is pluggable (no egress here). */
final class PingListener(ping: () => Unit, minIntervalMs: Long = 60000L)
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  @volatile private var lastPing = 0L
  override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
    val now = System.currentTimeMillis()
    if (now - lastPing >= minIntervalMs) { lastPing = now; ping() }
  }
}
