package graft.gtfs

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The LSM-shaped keyed table under the streaming upsert (VERDICT r10 #1):
  * O(batch) delta appends, read-time LWW, compaction folding delta into
  * base — including the crash window between a compaction's base overwrite
  * and its delta delete, which must be invisible to readers. */
class LwwTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val keyCols = Seq("source", "trip_id", "trip_start_date")
  private val cols = Seq("source", "trip_id", "trip_start_date", "payload", "seq")

  private def df(rows: (String, String, String, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.map { case (s, t, d, p, q) =>
      (s, t, java.sql.Date.valueOf(d), p, q)
    }.toDF(cols: _*)
  }

  private def resolved(dir: String) =
    LwwTable.read(spark, dir, keyCols, col("seq"))
      .select("trip_id", "payload", "seq").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("append is O(batch): no base partition is rewritten by a later append") {
    val dir = Files.createTempDirectory("lww").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"))
    val baseFile = new java.io.File(s"$dir/source=a/trip_start_date=2024-01-01")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val mtime = baseFile.lastModified()
    val len = baseFile.length()
    // ten appends to the SAME partition: the base file must not move
    (2L to 11L).foreach(i =>
      LwwTable.append(df(("a", "T1", "2024-01-01", s"v$i", i)), dir, keyCols, col("seq")))
    assert(baseFile.lastModified() == mtime && baseFile.length() == len,
      "appends never touch the compacted base")
    assert(LwwTable.deltaFileCount(spark, dir) == 10,
      "one delta file per touched partition per append")
    assert(resolved(dir) == Set(("T1", "v11", 11L)), "read-time LWW wins")
  }

  test("an EMPTY append is invisible: no delta data file, readers unaffected") {
    // r17: append no longer pays an isEmpty pre-probe action per trigger —
    // the contract it guarded moves here: an empty batch's write leaves no
    // data file (only hidden markers), so the delta stays "empty" for every
    // listing and readers keep the no-window short-circuit
    val dir = Files.createTempDirectory("lww_empty").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    assert(LwwTable.deltaFileCount(spark, dir) == 0, "fold emptied the delta")
    LwwTable.append(df().limit(0), dir, keyCols, col("seq"))
    assert(LwwTable.deltaFileCount(spark, dir) == 0,
      "an empty append adds no delta data file")
    assert(!Directory.tableHasData(spark, LwwTable.deltaDir(dir)),
      "the delta tree still reads as data-free (hidden markers only)")
    assert(resolved(dir) == Set(("T1", "v1", 1L)), "readers see the base unchanged")
    // and on a FRESH table an empty append must not fabricate a readable table
    val fresh = Files.createTempDirectory("lww_empty2").toString + "/t"
    LwwTable.append(df().limit(0), fresh, keyCols, col("seq"))
    assert(!LwwTable.hasData(spark, fresh), "no data rows, no data files")
  }

  test("resolved view is invariant under compaction, and the fold empties the delta") {
    val dir = Files.createTempDirectory("lww2").toString + "/t"
    LwwTable.append(df(
      ("a", "T1", "2024-01-01", "old", 1L),
      ("a", "T2", "2024-01-02", "keep", 5L)), dir, keyCols, col("seq"))
    LwwTable.append(df(("a", "T1", "2024-01-01", "new", 2L)), dir, keyCols, col("seq"))
    val before = resolved(dir)
    assert(before == Set(("T1", "new", 2L), ("T2", "keep", 5L)))
    val folded = LwwTable.compact(spark, dir, keyCols, col("seq"))
    assert(folded > 0 && LwwTable.deltaFileCount(spark, dir) == 0,
      "compaction consumed every delta file")
    assert(resolved(dir) == before, "resolution unchanged by the fold")
    // base now physically unique per key
    val base = spark.read.parquet(dir)
    assert(base.count() == 2 && base.select(keyCols.map(col): _*)
      .distinct().count() == 2, "base holds exactly the winners")
    // idempotent when there is nothing to fold
    assert(LwwTable.compact(spark, dir, keyCols, col("seq")) == 0)
  }

  test("the crash window between base overwrite and delta delete is invisible") {
    // simulate: compact, then copy the winner BACK into the delta tree as if
    // the file delete had been lost — the row now exists in BOTH trees with
    // an equal ordering value and identical payload
    val dir = Files.createTempDirectory("lww3").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "w", 7L)), dir, keyCols, col("seq"))
    val deltaPart = new java.io.File(
      s"${LwwTable.deltaDir(dir)}/source=a/trip_start_date=2024-01-01")
    val deltaFile = deltaPart.listFiles().filter(_.getName.endsWith(".parquet")).head
    val stash = Files.createTempDirectory("lww3_stash").resolve(deltaFile.getName)
    Files.copy(deltaFile.toPath, stash)
    // graceMs = 0 throughout: this spec pins the OFFLINE crash semantics
    // (physical deletes — under grace the original never leaves the delta
    // in the first place, which LwwGraceSpec pins instead)
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    Files.createDirectories(deltaPart.toPath) // compaction pruned the empty dir
    Files.copy(stash, deltaPart.toPath.resolve(stash.getFileName)) // "lost delete"
    assert(resolved(dir) == Set(("T1", "w", 7L)),
      "duplicate across trees ties to the identical row")
    // the next fold reconverges to one physical copy (graceMs = 0: this
    // spec pins the OFFLINE semantics — physical deletes, no manifests)
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    assert(LwwTable.deltaFileCount(spark, dir) == 0
      && spark.read.parquet(dir).count() == 1)
  }

  test("a fold crash after the merged files land but before the retirement commits loses nothing") {
    // the widest crash window of the new commit order: every merged file is
    // already renamed into the base partition BESIDE the files it
    // supersedes, but the retirement manifest was never written — base rows
    // are duplicated (old file + merged file), the delta inputs are still
    // live, so readers stay on the resolve path and the duplicates tie to
    // identical rows; the next fold re-merges and converges. (The old
    // refuge-first swap had a window where a partition directory was
    // briefly EMPTY — this order never removes a file before its
    // replacement is visible.)
    val dir = Files.createTempDirectory("lww_commit").toString + "/t"
    LwwTable.append(df(("a", "A", "2024-01-01", "baseonly", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L) // A base-only
    LwwTable.append(df(("a", "B", "2024-01-01", "deltaonly", 2L)), dir, keyCols, col("seq"))
    // simulate the crash state by hand: copy what a finished merge would
    // have produced (the resolved union of the partition) into the base
    // under a folded- name, keep old base + delta files untouched, leave a
    // stale (hidden, ignorable) temp tree behind
    val basePart = new java.io.File(s"$dir/source=a/trip_start_date=2024-01-01")
    val merged = basePart.listFiles().filter(_.getName.endsWith(".parquet")).head
    val deltaPart = new java.io.File(
      s"${LwwTable.deltaDir(dir)}/source=a/trip_start_date=2024-01-01")
    val deltaFile = deltaPart.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.copy(merged.toPath, basePart.toPath.resolve(s"folded-crash-a-${merged.getName}"))
    Files.copy(deltaFile.toPath, basePart.toPath.resolve(s"folded-crash-b-${deltaFile.getName}"))
    val staleTmp = new java.io.File(s"$dir/_compact_tmp/source=a")
    staleTmp.mkdirs()
    // every row still visible mid-crash, duplicates tie away
    assert(resolved(dir) == Set(("A", "baseonly", 1L), ("B", "deltaonly", 2L)),
      "duplicated base rows resolve as ties while the delta is live")
    // the next fold converges: both keys in base once, delta + temp cleared
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    assert(LwwTable.deltaFileCount(spark, dir) == 0)
    assert(!new java.io.File(s"$dir/_compact_tmp").exists(),
      "the stale temp tree is overwritten and removed by the next fold")
    assert(spark.read.parquet(dir).count() == 2
      && resolved(dir) == Set(("A", "baseonly", 1L), ("B", "deltaonly", 2L)))
  }

  test("size-triggered backstop compacts when the delta outgrows the bound") {
    val dir = Files.createTempDirectory("lww4").toString + "/t"
    (1L to 4L).foreach(i =>
      LwwTable.append(df(("a", "T1", "2024-01-01", s"v$i", i)), dir, keyCols, col("seq")))
    assert(!LwwTable.compactIfOversized(spark, dir, keyCols, col("seq"),
      maxDeltaFiles = 5), "under the bound: no fold")
    assert(LwwTable.deltaFileCount(spark, dir) == 4)
    LwwTable.append(df(("a", "T1", "2024-01-01", "v5", 5L)), dir, keyCols, col("seq"))
    assert(LwwTable.compactIfOversized(spark, dir, keyCols, col("seq"),
      maxDeltaFiles = 5), "at the bound: folds")
    assert(LwwTable.deltaFileCount(spark, dir) == 0)
    assert(resolved(dir) == Set(("T1", "v5", 5L)))
  }

  test("hasData and readRaw see each tree alone; plain base readers never see _delta") {
    val dir = Files.createTempDirectory("lww5").toString + "/t"
    assert(!LwwTable.hasData(spark, dir))
    // delta only (a stream that has never idled)
    LwwTable.append(df(("a", "T1", "2024-01-01", "d", 1L)), dir, keyCols, col("seq"))
    assert(LwwTable.hasData(spark, dir) && !Directory.tableHasData(spark, dir))
    assert(LwwTable.readRaw(spark, dir).count() == 1)
    assert(resolved(dir) == Set(("T1", "d", 1L)))
    // base only after the fold; the hidden _delta root must stay invisible
    // to a plain spark.read of the table root
    LwwTable.compact(spark, dir, keyCols, col("seq"))
    LwwTable.append(df(("a", "T1", "2024-01-01", "d2", 2L)), dir, keyCols, col("seq"))
    assert(spark.read.parquet(dir).select("payload").head().getString(0) == "d",
      "base readers see only compacted data (the delta tree is _-hidden)")
    assert(resolved(dir) == Set(("T1", "d2", 2L)))
  }

  test("append dedups within the batch exactly like the old write-time merge") {
    val dir = Files.createTempDirectory("lww6").toString + "/t"
    LwwTable.append(df(
      ("a", "T1", "2024-01-01", "first", 1L),
      ("a", "T1", "2024-01-01", "second", 2L)), dir, keyCols, col("seq"))
    assert(LwwTable.readRaw(spark, dir).count() == 1,
      "one physical row per key per append")
    assert(resolved(dir) == Set(("T1", "second", 2L)))
  }

  test("steady-state reads plan WITHOUT the resolution window (plan guard)") {
    // the short-circuit is a structural claim: with the delta folded, a
    // read must be the plain pruned scan (no WindowExec, no Exchange from
    // the dedup) — the monitor's per-request cost depends on it, since its
    // stop_id semi-join cannot push below a window
    val dir = Files.createTempDirectory("lww_plan").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    // optimized LOGICAL plan: AQE wraps the physical plan in an adaptive
    // node whose final children only exist after execution
    def windows(dF: org.apache.spark.sql.DataFrame): Int =
      dF.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.size
    // delta open: the window is load-bearing
    assert(windows(LwwTable.read(spark, dir, keyCols, col("seq"))) == 1,
      "an open delta resolves through the W2 window")
    LwwTable.compact(spark, dir, keyCols, col("seq"))
    // delta folded: no window, and the by-name ordering is never forced
    var forced = false
    def ordering: org.apache.spark.sql.Column = { forced = true; col("seq") }
    val steady = LwwTable.read(spark, dir, keyCols, ordering)
    assert(windows(steady) == 0, "the steady-state read is a plain scan")
    assert(!forced, "the ordering (and any probe inside it) is never forced")
    assert(steady.count() == 1)
  }

  test("tiered merge folds the delta to one file per partition without touching base") {
    // the on-trigger backstop shape (VERDICT r11 #1): mergeDelta is
    // O(delta) — the compacted BASE file must not move, the delta must
    // come out as one file per partition, and resolution must be invariant
    val dir = Files.createTempDirectory("lww_merge").toString + "/t"
    LwwTable.append(df(("a", "T0", "2024-01-01", "base", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"))
    val baseFile = new java.io.File(s"$dir/source=a/trip_start_date=2024-01-01")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val (mtime, len) = (baseFile.lastModified(), baseFile.length())
    // 6 appends over two partitions: 3 keys per partition, newest seq wins
    (2L to 7L).foreach { i =>
      val d = if (i % 2 == 0) "2024-01-01" else "2024-01-02"
      LwwTable.append(df(("a", s"T${i % 3}", d, s"v$i", i)), dir, keyCols, col("seq"))
    }
    val before = resolved(dir)
    val merged = LwwTable.mergeDelta(spark, dir, keyCols, col("seq"))
    assert(merged == 6, "every delta file consumed")
    assert(baseFile.lastModified() == mtime && baseFile.length() == len,
      "the merge never reads or rewrites the base")
    assert(LwwTable.deltaFileCount(spark, dir) == 2,
      "one merged file per touched partition")
    assert(resolved(dir) == before, "resolution unchanged by the merge")
    assert(LwwTable.deltaWorthFolding(spark, dir, minFiles = 8),
      "a merged file marks the delta as worth folding below the file bound")
    // the idle fold after a merge converges to the key-unique base
    LwwTable.compact(spark, dir, keyCols, col("seq"))
    assert(LwwTable.deltaFileCount(spark, dir) == 0 && resolved(dir) == before)
    assert(!LwwTable.deltaWorthFolding(spark, dir, minFiles = 8))
  }

  test("a merge crash between merged-file rename and original delete is invisible") {
    // crash order: the merged file is renamed into the delta partitions
    // BEFORE the originals are deleted — simulate the window by copying an
    // original back after the merge (the "lost delete"); the duplicate
    // rows tie with identical values and resolve away, and the next merge
    // re-collapses them
    val dir = Files.createTempDirectory("lww_merge_crash").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "w", 7L)), dir, keyCols, col("seq"))
    val deltaPart = new java.io.File(
      s"${LwwTable.deltaDir(dir)}/source=a/trip_start_date=2024-01-01")
    val original = deltaPart.listFiles().filter(_.getName.endsWith(".parquet")).head
    val stash = Files.createTempDirectory("lww_mc_stash").resolve(original.getName)
    Files.copy(original.toPath, stash)
    LwwTable.append(df(("a", "T1", "2024-01-01", "w2", 8L)), dir, keyCols, col("seq"))
    LwwTable.mergeDelta(spark, dir, keyCols, col("seq"), graceMs = 0L)
    Files.copy(stash, deltaPart.toPath.resolve(stash.getFileName)) // lost delete
    assert(resolved(dir) == Set(("T1", "w2", 8L)),
      "duplicate across merge generations resolves to the winner")
    val again = LwwTable.mergeDelta(spark, dir, keyCols, col("seq"), graceMs = 0L)
    assert(again == 2 && LwwTable.deltaFileCount(spark, dir) == 1,
      "the next merge reconverges to one physical copy")
    assert(resolved(dir) == Set(("T1", "w2", 8L)))
  }

  test("size-triggered merge backstop bounds by file count and stays O(delta)") {
    val dir = Files.createTempDirectory("lww_merge_bound").toString + "/t"
    (1L to 4L).foreach(i =>
      LwwTable.append(df(("a", "T1", "2024-01-01", s"v$i", i)), dir, keyCols, col("seq")))
    assert(!LwwTable.mergeDeltaIfOversized(spark, dir, keyCols, col("seq"),
      maxDeltaFiles = 5), "under the bound: no merge")
    assert(LwwTable.deltaFileCount(spark, dir) == 4)
    LwwTable.append(df(("a", "T1", "2024-01-01", "v5", 5L)), dir, keyCols, col("seq"))
    assert(LwwTable.mergeDeltaIfOversized(spark, dir, keyCols, col("seq"),
      maxDeltaFiles = 5), "at the bound: merges")
    assert(LwwTable.deltaFileCount(spark, dir) == 1
      && resolved(dir) == Set(("T1", "v5", 5L)))
    // no base tree was ever created: the merge must not have folded to base
    assert(!Directory.tableHasData(spark, dir),
      "the merge backstop never writes the base")
  }

  test("readRaw names a base/delta schema drift instead of a generic union error") {
    val dir = Files.createTempDirectory("lww_drift").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq")) // base on the old schema
    // a future writer evolves the row type while appending to the delta
    val drifted = df(("a", "T2", "2024-01-02", "v2", 2L))
      .withColumn("extra_col", lit("x"))
    LwwTable.append(drifted, dir, keyCols, col("seq"))
    val e = intercept[IllegalStateException](LwwTable.readRaw(spark, dir))
    assert(e.getMessage.contains(dir), "the error names the table")
    assert(e.getMessage.contains("extra_col"), "the error names the drifted column")
    assert(e.getMessage.contains("delta side"), "the error says WHICH tree drifted")
  }

  test("readRaw names a TYPE-only drift, not just a missing column") {
    // a widened column (string -> int here) drifts just as fatally as a
    // renamed one: unionByName would silently coerce instead of failing
    val dir = Files.createTempDirectory("lww_type_drift").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"))
    val drifted = df(("a", "T2", "2024-01-02", "v2", 2L))
      .withColumn("payload", lit(7)) // same name, different type
    LwwTable.append(drifted, dir, keyCols, col("seq"))
    val e = intercept[IllegalStateException](LwwTable.readRaw(spark, dir))
    assert(e.getMessage.contains("payload"), "the error names the drifted column")
    assert(e.getMessage.contains("int") && e.getMessage.contains("string"),
      "the error shows both sides' types")
  }

  test("null partition values round-trip through append, resolve and compact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lww7").toString + "/t"
    def row(p: String, q: Long) = Seq(("a", "T1", null.asInstanceOf[java.sql.Date], p, q))
      .toDF(cols: _*)
    LwwTable.append(row("n1", 1L), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    LwwTable.append(row("n2", 2L), dir, keyCols, col("seq"))
    assert(resolved(dir) == Set(("T1", "n2", 2L)),
      "null-date rows merge across trees (null-safe partition predicate)")
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    assert(resolved(dir) == Set(("T1", "n2", 2L))
      && spark.read.parquet(dir).count() == 1)
  }

  test("fold trivial-moves a single-file partition over an empty base, merges the rest") {
    val dir = Files.createTempDirectory("lww_trivial").toString + "/t"
    // partition 01-01: base data exists -> must MERGE; 01-02: fresh -> MOVE
    LwwTable.append(df(("a", "T1", "2024-01-01", "old", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"))
    LwwTable.append(df(
      ("a", "T1", "2024-01-01", "new", 2L),
      ("a", "T9", "2024-01-02", "fresh", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"))
    assert(resolved(dir) == Set(("T1", "new", 2L), ("T9", "fresh", 1L)))
    assert(!new java.io.File(s"$dir/_delta").exists()
      || LwwTable.deltaFileCount(spark, dir) == 0, "delta folded away")
    // the fresh partition's base file is the RENAMED delta file (folded-
    // prefix), not a rewrite
    val freshFiles = new java.io.File(s"$dir/source=a/trip_start_date=2024-01-02")
      .listFiles().filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith("."))
    assert(freshFiles.length == 1
      && freshFiles.head.getName.startsWith("folded-"),
      s"expected one trivially-moved file, got ${freshFiles.map(_.getName).toSeq}")
  }

  test("a crash midway through the fold's trivial moves loses nothing") {
    // the trivial move's crash window is one rename per partition: simulate
    // a fold that moved partition 01-02's file into the base and died
    // before touching 01-03's — every row stays visible (one tree each),
    // and the re-fold finishes the job
    val dir = Files.createTempDirectory("lww_trivial_crash").toString + "/t"
    LwwTable.append(df(
      ("a", "T1", "2024-01-02", "moved", 1L),
      ("a", "T2", "2024-01-03", "pending", 1L)), dir, keyCols, col("seq"))
    val p02 = new java.io.File(s"$dir/_delta/source=a/trip_start_date=2024-01-02")
    val f02 = p02.listFiles().filter(f => f.isFile
      && !f.getName.startsWith("_") && !f.getName.startsWith(".")).head
    val baseDir = new java.io.File(s"$dir/source=a/trip_start_date=2024-01-02")
    assert(baseDir.mkdirs())
    assert(f02.renameTo(new java.io.File(baseDir, s"folded-crash-${f02.getName}")))
    assert(resolved(dir) == Set(("T1", "moved", 1L), ("T2", "pending", 1L)),
      "both rows visible at the crash point")
    LwwTable.compact(spark, dir, keyCols, col("seq"))
    assert(resolved(dir) == Set(("T1", "moved", 1L), ("T2", "pending", 1L))
      && LwwTable.deltaFileCount(spark, dir) == 0,
      "the re-fold finishes and empties the delta")
  }

  test("mergeDelta leaves already-single-file partitions untouched") {
    val dir = Files.createTempDirectory("lww_merge_single").toString + "/t"
    // partition 01-01 accumulates 3 delta files; 01-02 exactly one
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.append(df(("a", "T1", "2024-01-01", "v2", 2L)), dir, keyCols, col("seq"))
    LwwTable.append(df(("a", "T2", "2024-01-01", "w1", 1L)), dir, keyCols, col("seq"))
    LwwTable.append(df(("a", "T3", "2024-01-02", "x1", 1L)), dir, keyCols, col("seq"))
    def filesIn(date: String) =
      new java.io.File(s"$dir/_delta/source=a/trip_start_date=$date")
        .listFiles().filter(f => f.isFile && !f.getName.startsWith("_")
          && !f.getName.startsWith(".")).map(_.getName).toSet
    val singleBefore = filesIn("2024-01-02")
    val merged = LwwTable.mergeDelta(spark, dir, keyCols, col("seq"), graceMs = 0L)
    assert(merged == 3, "only the multi-file partition's files merged")
    assert(filesIn("2024-01-02") == singleBefore,
      "the single-file partition was not rewritten")
    assert(filesIn("2024-01-01").size == 1
      && filesIn("2024-01-01").head.startsWith(LwwTable.MergedFilePrefix))
    assert(resolved(dir) == Set(("T1", "v2", 2L), ("T2", "w1", 1L), ("T3", "x1", 1L)))
  }

  test("a null SOURCE partition survives a fold that touches it") {
    // the fold's touched-partition predicate must be null-safe on source
    // too: with a plain === the base's null-source partition is dropped
    // from the merge, then its refuged files are deleted — silent row loss
    import spark.implicits._
    val dir = Files.createTempDirectory("lww_null_src").toString + "/t"
    def row(t: String, p: String, q: Long) =
      Seq((null.asInstanceOf[String], t,
        java.sql.Date.valueOf("2024-01-01"), p, q)).toDF(cols: _*)
    LwwTable.append(row("T1", "keep", 1L), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq")) // T1 now base-only
    LwwTable.append(row("T2", "new", 2L), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"))
    assert(resolved(dir) == Set(("T1", "keep", 1L), ("T2", "new", 2L)),
      "base-only keys of the null-source partition survive the fold")
  }

  test("partitionedResolve pays ONE exchange and matches resolve exactly") {
    val d = df(
      ("a", "T1", "2024-01-01", "old", 1L),
      ("a", "T1", "2024-01-01", "new", 2L),
      ("a", "T2", "2024-01-01", "only", 3L),
      ("b", "T1", "2024-01-02", "x", 4L),
      ("b", "T1", "2024-01-02", "y", 5L))
    val out = LwwTable.partitionedResolve(d, keyCols, col("seq"))
    // the write layout's hash(PartCols) repartition must be the ONLY
    // shuffle: it already clusters every LWW key (PartCols is a subset of
    // the key), so the resolution window adds a sort, never an exchange
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
    val got = out.select(cols.map(col): _*).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3), r.getLong(4))).toSet
    val expected = LwwTable.resolve(d, keyCols, col("seq"))
      .select(cols.map(col): _*).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3), r.getLong(4))).toSet
    assert(got == expected && got == Set(
      ("a", "T1", "new", 2L), ("a", "T2", "only", 3L), ("b", "T1", "y", 5L)))
  }
}
