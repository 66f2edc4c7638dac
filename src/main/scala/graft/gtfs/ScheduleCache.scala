package graft.gtfs

import org.apache.spark.sql.SparkSession

/** Hot-reloading cache of the DATED schedule directories under one parent —
  * the schedule-side mirror of [[CurveCache]]'s FileCache discipline
  * (/root/reference/src/main.rs:321-393) combined with the reference's
  * per-iteration directory re-scan (importer/mod.rs:361-460): every
  * automatic-mode iteration re-lists `dir/schedule`, assigns each rt file to
  * the newest schedule dated ≤ the file (J6), and loads schedules through an
  * mtime-keyed cache — so a schedule version published MID-RUN takes effect
  * on the next trigger without a restart, and an old-dated rt file still
  * joins the schedule that was current on its day.
  *
  * Differences from the reference, deliberate:
  *  - the cache holds up to `maxLoaded` schedule versions (LRU), not one —
  *    the reference's single-slot FileCache reloads the whole GTFS zip every
  *    time a backlog alternates between two schedule versions; a mixed-date
  *    backlog here pays each load once;
  *  - invalidation fingerprints EVERY file under the version directory
  *    (full path + length + mtime, same FNV mix as [[CurveCache]]) — a
  *    schedule is a directory of CSVs here, not a single zip, so a single
  *    mtime cannot cover it. The listing is pure namenode/inode metadata.
  *
  * Eviction and reload `unpersist` the stale [[GtfsSchedule]] (S2 cache):
  * an in-flight batch still holding the old object keeps working — its
  * plans recompute from the CSVs — while the cached blocks are released.
  *
  * Producers must drop new schedule versions ATOMICALLY (write to a temp
  * directory, then rename into `dir/schedule`): the scan races a
  * half-written directory exactly like the reference's loop does with a
  * half-copied zip. A version that fails to load is reported per batch and
  * retried on the next fingerprint change, like the reference's per-group
  * quarantine (importer/mod.rs:472-487).
  */
final class ScheduleCache(spark: SparkSession, val scheduleParentDir: String,
                          maxLoaded: Int = 4) {

  require(maxLoaded >= 1, "maxLoaded must be >= 1")

  // access-ordered: the eldest entry is the least recently USED version
  private val loaded = new java.util.LinkedHashMap[String, (Long, GtfsSchedule)](
    16, 0.75f, true)

  private def fs = new org.apache.hadoop.fs.Path(scheduleParentDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Dated schedule version directories, oldest first (parsed X1 date;
    * undated entries — a `current` symlink, editor droppings — are ignored,
    * like `Directory.assignSchedules` reports them without importing).
    * One directory listing; re-run per call so a mid-run drop is seen. */
  def datedDirs(): Seq[(java.time.LocalDate, String)] = {
    val p = new org.apache.hadoop.fs.Path(scheduleParentDir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.toString)
      .flatMap(d => Directory.dateFromFilename(shortName(d)).map(dt => (dt, d)))
      .sortBy(e => (e._1.toEpochDay, e._2))
  }

  /** J6 as-of pick: newest version dated ≤ `date`; None when `date` is older
    * than every version (the reference SKIPS such rt files, mod.rs:401-406). */
  def asOfDir(date: java.time.LocalDate): Option[String] = {
    val ds = datedDirs()
    val fit = ds.filter(!_._1.isAfter(date))
    fit.lastOption.map(_._2)
  }

  /** Newest version directory by parsed date (the backfill's schedule — the
    * reference's `get_schedule_filename` newest-file pick, main.rs:278-293). */
  def newestDir(): Option[String] = datedDirs().lastOption.map(_._2)

  /** The version's bare directory name — the reference's `short_filename`
    * (everything after the last '/', importer/mod.rs:493) that lands in the
    * `schedule_file_name` column of records and predictions. */
  def shortName(dir: String): String = Directory.baseName(dir)

  /** Fingerprint of one version directory: FNV-1a over (full path, length,
    * mtime) of every file beneath it — any rewrite, added or removed file
    * changes it; metadata-only, no data read (CurveCache.storeVersion). */
  private[gtfs] def versionOf(dir: String): Long = {
    var h = 0xcbf29ce484222325L
    def mix(v: Long): Unit = { h ^= v; h *= 0x100000001b3L }
    val p = new org.apache.hadoop.fs.Path(dir)
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        mix(st.getPath.toUri.getPath.hashCode.toLong)
        mix(st.getLen)
        mix(st.getModificationTime)
      }
    }
    h
  }

  /** The loaded schedule for one version directory — cached until the
    * directory's fingerprint changes (the reference reloads on mtime change,
    * main.rs:346-390); at most [[maxLoaded]] versions stay loaded, the least
    * recently used is evicted (and its S2 cache released) past that.
    * Thread-safe; a load failure propagates to the caller (per-batch
    * quarantine, not a cache-poisoning null). */
  def get(dir: String): GtfsSchedule = synchronized {
    val v = versionOf(dir)
    Option(loaded.get(dir)) match {
      case Some((ver, sched)) if ver == v => sched
      case stale =>
        stale.foreach(_._2.unpersist())
        loaded.remove(dir)
        val sched = GtfsSchedule.load(spark, dir)
        loaded.put(dir, (v, sched))
        while (loaded.size() > maxLoaded) {
          val eldest = loaded.entrySet().iterator().next()
          eldest.getValue._2.unpersist()
          loaded.remove(eldest.getKey)
        }
        sched
    }
  }

  /** The directory [[asOf]] resolves: newest version dated ≤ `date`, else
    * the OLDEST version (pre-history fallback) — both derived from the ONE
    * listing passed in, so a concurrent version drop can never hand the
    * fallback a different view of the tree than the as-of pick. */
  private[gtfs] def asOfDirOrOldest(
      ds: Seq[(java.time.LocalDate, String)],
      date: java.time.LocalDate): Option[String] =
    ds.filter(!_._1.isAfter(date)).lastOption.orElse(ds.headOption).map(_._2)

  /** (short name, schedule) as of `date`, falling back to the OLDEST version
    * when none is dated ≤ `date` — used by the prediction refresh, where a
    * service date has to resolve to SOME schedule (records for it exist).
    * Takes ONE directory listing ([[asOfDirOrOldest]]). */
  def asOf(date: java.time.LocalDate): Option[(String, GtfsSchedule)] =
    asOfDirOrOldest(datedDirs(), date).map(d => (shortName(d), get(d)))

  /** The live version whose SHORT NAME is `name` — the reverse of
    * [[shortName]], for resolving the schedule a stored record row was
    * DECODED with (its `schedule_file_name` column); None when that version
    * has since been removed from the tree. */
  def byName(name: String): Option[GtfsSchedule] =
    datedDirs().map(_._2).find(shortName(_) == name).map(get)

  /** (short name, schedule) of the newest version; None when no dated
    * version exists yet. */
  def newest(): Option[(String, GtfsSchedule)] =
    newestDir().map(d => (shortName(d), get(d)))

  /** Release every cached schedule's S2 cache. */
  def close(): Unit = synchronized {
    val it = loaded.values().iterator()
    while (it.hasNext) it.next()._2.unpersist()
    loaded.clear()
  }
}
