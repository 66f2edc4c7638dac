package graft.gtfs

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The LSM's retirement/grace discipline (VERDICT r12 #1): a fold/merge
  * never deletes a file an in-flight reader may have planned — superseded
  * files are retired by an atomic manifest, excluded from every live
  * listing at once, and physically deleted only by a GC pass after the
  * grace window. The reference gets the equivalent for free from MySQL
  * statement-level isolation (batched_statements.rs:59-107: no SELECT ever
  * observes a half-swapped B-tree). */
class LwwGraceSpec extends AnyFunSuite {

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

  private def physicalFiles(dir: String): Set[String] = {
    val root = new java.io.File(dir)
    if (!root.exists()) Set.empty
    else {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else f.listFiles().toSeq.flatMap(walk)
      walk(root).map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
  }

  test("a fold retires superseded files through the grace window; GC removes them after") {
    val dir = Files.createTempDirectory("lww_grace").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "old", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    val oldBase = physicalFiles(dir)
    LwwTable.append(df(("a", "T1", "2024-01-01", "new", 2L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 60000L)
    // the superseded base file AND the consumed delta file stay on disk for
    // in-flight readers...
    assert(oldBase.subsetOf(physicalFiles(dir)),
      "the superseded base file is still physically present")
    assert(LwwTable.pendingRetirements(spark, dir))
    // ...but every live view excludes them from the instant of the commit
    assert(resolved(dir) == Set(("T1", "new", 2L)))
    assert(LwwTable.readRaw(spark, dir).count() == 1,
      "readRaw sees live rows only, not the retired duplicates")
    assert(LwwTable.deltaFileCount(spark, dir) == 0,
      "retired delta files do not count as live")
    // GC respects the grace window...
    assert(LwwTable.gcRetired(spark, dir, 60000L) == 0,
      "nothing expires inside the grace window")
    assert(LwwTable.pendingRetirements(spark, dir))
    // ...and removes everything once it is over (graceMs = 0 ⇒ now)
    assert(LwwTable.gcRetired(spark, dir, 0L) > 0)
    assert(!LwwTable.pendingRetirements(spark, dir))
    assert(resolved(dir) == Set(("T1", "new", 2L)))
    assert(spark.read.parquet(dir).count() == 1,
      "after GC the base is physically key-unique again")
  }

  test("with pending retirements but an empty live delta, reads plan without the window") {
    val dir = Files.createTempDirectory("lww_grace_plan").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    LwwTable.append(df(("a", "T1", "2024-01-01", "v2", 2L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 60000L)
    assert(LwwTable.pendingRetirements(spark, dir))
    def windows(dF: org.apache.spark.sql.DataFrame): Int =
      dF.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.size
    var forced = false
    def ordering: org.apache.spark.sql.Column = { forced = true; col("seq") }
    val read = LwwTable.read(spark, dir, keyCols, ordering)
    assert(windows(read) == 0,
      "live base is key-unique, so no resolution window even mid-grace")
    assert(!forced, "the by-name ordering is never forced on the no-window path")
    assert(read.select("payload").head().getString(0) == "v2")
  }

  test("a snapshot planned BEFORE a fold stays scannable through the grace window") {
    val dir = Files.createTempDirectory("lww_grace_snap").toString + "/t"
    LwwTable.append(df(
      ("a", "T1", "2024-01-01", "a1", 1L),
      ("a", "T2", "2024-01-02", "a2", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    LwwTable.append(df(("a", "T1", "2024-01-01", "b1", 2L)), dir, keyCols, col("seq"))
    // the reader plans its snapshot (file listing + schema pinned here)...
    val snapshot = LwwTable.read(spark, dir, keyCols, col("seq"))
    // ...then a fold AND a later merge generation race it
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 60000L)
    LwwTable.append(df(("a", "T1", "2024-01-01", "c1", 3L)), dir, keyCols, col("seq"))
    LwwTable.append(df(("a", "T1", "2024-01-01", "d1", 4L)), dir, keyCols, col("seq"))
    LwwTable.mergeDelta(spark, dir, keyCols, col("seq"), graceMs = 60000L)
    // the pre-fold snapshot scans cleanly (its files were retired, not
    // deleted) and returns the state it planned against
    val rows = snapshot.select("trip_id", "payload").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("T1", "b1"), ("T2", "a2")),
      "the planned snapshot is consistent despite the concurrent fold")
    // a FRESH read sees the newest state
    assert(resolved(dir).map(t => (t._1, t._2)) == Set(("T1", "d1"), ("T2", "a2")))
  }

  test("replacePartitions deletes rows via the delta, retiring old base files atomically") {
    val dir = Files.createTempDirectory("lww_grace_repl").toString + "/t"
    LwwTable.append(df(
      ("a", "T1", "2024-01-01", "stale", 1L),
      ("a", "T2", "2024-01-01", "keep", 1L),
      ("a", "T3", "2024-01-02", "other", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    val before = physicalFiles(dir)
    // row-level delete of T1, partition-scoped to 2024-01-01
    val kept = LwwTable.readRaw(spark, dir)
      .filter(col("trip_start_date") === "2024-01-01" && col("trip_id") =!= "T1")
    LwwTable.replacePartitions(spark, dir,
      Seq((Some("a"), Some("2024-01-01"))), kept, graceMs = 60000L)
    assert(resolved(dir) == Set(("T2", "keep", 1L), ("T3", "other", 1L)),
      "the stale row is gone from the live view")
    assert(LwwTable.readRaw(spark, dir).filter(col("trip_id") === "T1").count() == 0,
      "readRaw (live) no longer carries the deleted row")
    assert(before.subsetOf(physicalFiles(dir)),
      "old base files persist for in-flight readers")
    // untouched partition undisturbed; the kept rows live as delta until
    // the next fold, which converges physically
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    assert(resolved(dir) == Set(("T2", "keep", 1L), ("T3", "other", 1L)))
    assert(spark.read.parquet(dir).count() == 2
      && LwwTable.deltaFileCount(spark, dir) == 0
      && !LwwTable.pendingRetirements(spark, dir))
  }

  test("mergeDeltaIfOversized reports false when the delta is latched at one file per partition") {
    // ADVICE r12: a feed spraying N distinct partitions can hold the FILE
    // count over the bound with nothing eligible to merge — the backstop
    // must say "nothing happened", not true
    val dir = Files.createTempDirectory("lww_grace_latch").toString + "/t"
    (1 to 5).foreach(i =>
      LwwTable.append(df(("a", s"T$i", s"2024-01-0$i", "v", 1L)), dir, keyCols, col("seq")))
    assert(LwwTable.deltaFileCount(spark, dir) == 5)
    assert(!LwwTable.mergeDeltaIfOversized(spark, dir, keyCols, col("seq"),
      maxDeltaFiles = 4), "over the bound but nothing eligible: reports false")
    assert(LwwTable.deltaFileCount(spark, dir) == 5, "nothing was rewritten")
    // two files land in one partition -> the backstop has real work again
    LwwTable.append(df(("a", "T1", "2024-01-01", "v2", 2L)), dir, keyCols, col("seq"))
    assert(LwwTable.mergeDeltaIfOversized(spark, dir, keyCols, col("seq"),
      maxDeltaFiles = 4), "with an eligible partition it merges and reports true")
    assert(LwwTable.deltaFileCount(spark, dir) == 5,
      "the eligible pair merged to one file; singles untouched")
  }

  test("a drifted delta file is refused by the trivial move with the named error") {
    // ADVICE r12: the trivial move installs a file into the base by rename —
    // a schema-drifted file must be refused BEFORE it pollutes the base,
    // with the same named diagnosis as readRaw's union guard
    val dir = Files.createTempDirectory("lww_grace_drift").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    // drifted single file into a FRESH partition: the trivial-move shape
    val drifted = df(("a", "T2", "2024-01-02", "v2", 2L))
      .withColumn("extra_col", lit("x"))
    LwwTable.append(drifted, dir, keyCols, col("seq"))
    val e = intercept[IllegalStateException](
      LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L))
    assert(e.getMessage.contains(dir) && e.getMessage.contains("extra_col"),
      s"names table and drifted column: ${e.getMessage}")
    // the base partition was NOT created by the refused move
    assert(!new java.io.File(s"$dir/source=a/trip_start_date=2024-01-02").exists(),
      "the drifted file was never installed")
  }

  test("GC is crash-idempotent and sweeps orphaned manifest temp files") {
    val dir = Files.createTempDirectory("lww_grace_gc").toString + "/t"
    LwwTable.append(df(
      ("a", "T1", "2024-01-01", "old1", 1L),
      ("a", "T2", "2024-01-02", "old2", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    LwwTable.append(df(
      ("a", "T1", "2024-01-01", "new1", 2L),
      ("a", "T2", "2024-01-02", "new2", 2L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 60000L)
    assert(LwwTable.pendingRetirements(spark, dir))
    // simulate a GC that crashed mid-delete: one retired base file already
    // gone, the manifest still present — the re-run must finish silently
    // (missing entries skipped), never error
    val manifest = new java.io.File(s"$dir/_gc").listFiles()
      .filter(_.getName.startsWith("retire-")).minBy(_.getName)
    val firstRel = Files.readAllLines(manifest.toPath).get(0)
    assert(new java.io.File(s"$dir/$firstRel").delete(),
      s"simulated partial GC removes $firstRel")
    assert(LwwTable.gcRetired(spark, dir, 0L) > 0, "the surviving entries GC")
    assert(!LwwTable.pendingRetirements(spark, dir))
    assert(resolved(dir) == Set(("T1", "new1", 2L), ("T2", "new2", 2L)))
    // a retire() that crashed between temp-create and rename leaves an
    // orphaned hidden .tmp- under _gc: swept once old, never when fresh
    val gcDir = new java.io.File(s"$dir/_gc"); gcDir.mkdirs()
    val orphan = new java.io.File(gcDir, ".tmp-orphan")
    Files.write(orphan.toPath, "ghost".getBytes("UTF-8"))
    LwwTable.gcRetired(spark, dir, 0L)
    assert(orphan.exists(), "a FRESH temp (a concurrent writer's) is never touched")
    assert(orphan.setLastModified(System.currentTimeMillis() - 120000L))
    LwwTable.gcRetired(spark, dir, 0L)
    assert(!orphan.exists(), "an aged orphan temp is swept")
  }

  test("an aged .tmp-folded orphan in a BASE partition dir is swept; a fresh one survives") {
    // ADVICE r14: a trivial fold crashing between its copy and the install
    // rename leaves .tmp-folded-<name> in the base partition dir. The
    // deterministic temp name only self-heals if the partition takes the
    // trivial path again — a second append first routes it through the
    // merge path, which consumes the delta file, and the temp lingered
    // forever (invisible to reads, but an unbounded-leak contradiction).
    // gcRetired's orphan sweep now covers base partition dirs too.
    val dir = Files.createTempDirectory("lww_grace_tmpfold").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "old", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    LwwTable.append(df(("a", "T1", "2024-01-01", "new", 2L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 60000L) // _gc exists
    val partDir = new java.io.File(
      s"$dir/source=a/trip_start_date=2024-01-01")
    assert(partDir.isDirectory)
    val orphan = new java.io.File(partDir, ".tmp-folded-crashed.parquet")
    Files.write(orphan.toPath, "ghost".getBytes("UTF-8"))
    LwwTable.gcRetired(spark, dir, 0L)
    assert(orphan.exists(), "a FRESH temp (an in-flight fold's copy) is never touched")
    // production shape: the crashed partition re-folds via the merge path
    // (a second append consumed the delta file), which commits a manifest
    // and re-creates _gc — the NEXT GC pass then finds the aged orphan
    LwwTable.append(df(("a", "T1", "2024-01-01", "new2", 3L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 60000L)
    assert(orphan.exists(), "still fresh relative to the fold's own GC pass")
    assert(orphan.setLastModified(System.currentTimeMillis() - 120000L))
    LwwTable.gcRetired(spark, dir, 0L)
    assert(!orphan.exists(), "the aged crash leftover is swept from the base partition")
    // the table itself is untouched by the sweep
    assert(resolved(dir) == Set(("T1", "new2", 3L)))
  }

  test("a trivial fold under grace COPIES the delta file — a planned snapshot keeps it") {
    // ADVICE r13 (high): the trivial move used to RENAME the live delta
    // file into the base, so a reader that listed it just before the fold
    // hit FileNotFoundException inside the grace window — on the common
    // shape (first fold of a new day's partition / fresh table). Under
    // grace the file must be copied and the original retired; only
    // graceMs = 0 (offline) keeps the pure rename.
    val dir = Files.createTempDirectory("lww_grace_trivial").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    val deltaFiles = physicalFiles(LwwTable.deltaDir(dir))
    assert(deltaFiles.size == 1)
    // the reader plans its snapshot against the delta-only table...
    val snapshot = LwwTable.read(spark, dir, keyCols, col("seq"))
    // ...then the fresh partition folds trivially under grace
    assert(LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 60000L) == 1)
    // the original delta file is STILL PHYSICALLY PRESENT (retired, not
    // moved) and the base holds the installed copy
    assert(deltaFiles.subsetOf(physicalFiles(LwwTable.deltaDir(dir))),
      "the live delta file a reader may have planned never moves")
    assert(LwwTable.pendingRetirements(spark, dir))
    assert(snapshot.select("payload").collect().map(_.getString(0)).toSeq
      == Seq("v1"), "the pre-fold snapshot scans cleanly")
    // live views exclude the retired original from the commit instant
    assert(resolved(dir) == Set(("T1", "v1", 1L)))
    assert(LwwTable.deltaFileCount(spark, dir) == 0)
    assert(LwwTable.readRaw(spark, dir).count() == 1)
    // no hidden temp leftovers from the copy-install
    assert(!physicalFiles(dir).exists(_.startsWith(".tmp-")),
      "the copy installs via atomic rename, no temp residue")
    // GC converges to the same physical shape the rename produced
    assert(LwwTable.gcRetired(spark, dir, 0L) > 0)
    assert(!LwwTable.pendingRetirements(spark, dir))
    assert(spark.read.parquet(dir).count() == 1)
    assert(LwwTable.deltaFileCount(spark, dir) == 0)
  }

  test("a trivial fold in OFFLINE mode (graceMs = 0) still moves by pure rename") {
    val dir = Files.createTempDirectory("lww_grace_trivoff").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    assert(LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L) == 1)
    assert(!LwwTable.pendingRetirements(spark, dir), "no manifest offline")
    assert(physicalFiles(LwwTable.deltaDir(dir)).isEmpty,
      "offline mode renames — the original is gone immediately")
    assert(resolved(dir) == Set(("T1", "v1", 1L)))
  }

  test("a mixed fold (trivial + merge partitions) commits through ONE manifest") {
    val dir = Files.createTempDirectory("lww_grace_mixed").toString + "/t"
    // partition 01-01 gets base data (merge shape); 01-02 stays fresh
    // (trivial shape)
    LwwTable.append(df(("a", "T1", "2024-01-01", "old", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    LwwTable.append(df(
      ("a", "T1", "2024-01-01", "new", 2L),
      ("a", "T2", "2024-01-02", "fresh", 2L)), dir, keyCols, col("seq"))
    val deltaBefore = physicalFiles(LwwTable.deltaDir(dir))
    assert(LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 60000L) == 2)
    // one atomic commit point for the whole fold
    val manifests = new java.io.File(s"$dir/_gc").listFiles()
      .filter(_.getName.startsWith("retire-"))
    assert(manifests.length == 1, "trivial + merge retire through one manifest")
    // every pre-fold file is still physically present for in-flight readers
    assert(deltaBefore.subsetOf(physicalFiles(LwwTable.deltaDir(dir))))
    assert(resolved(dir) == Set(("T1", "new", 2L), ("T2", "fresh", 2L)))
    assert(LwwTable.gcRetired(spark, dir, 0L) > 0)
    assert(resolved(dir) == Set(("T1", "new", 2L), ("T2", "fresh", 2L)))
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("assertScanBudget fails fast when a pending manifest outlives the budgeted slack") {
    // VERDICT r13 #5: a reader slower than the grace window gets a NAMED
    // plan-time error, not a FileNotFoundException mid-scan
    val dir = Files.createTempDirectory("lww_grace_budget").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    // no _gc at all: any sane budget passes (steady state, one exists miss)
    LwwTable.assertScanBudget(spark, dir, scanBudgetMs = 10000L, graceMs = 60000L)
    // an un-honorable budget is refused outright
    val e0 = intercept[IllegalStateException](
      LwwTable.assertScanBudget(spark, dir, scanBudgetMs = 60000L, graceMs = 60000L))
    assert(e0.getMessage.contains("can never be honored"))
    LwwTable.append(df(("a", "T1", "2024-01-01", "v2", 2L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 600000L)
    // fresh manifest, small budget: plenty of slack
    LwwTable.assertScanBudget(spark, dir, scanBudgetMs = 1000L, graceMs = 600000L)
    // age the manifest beyond graceMs - budget: the scan could lose files
    val manifest = new java.io.File(s"$dir/_gc").listFiles()
      .filter(_.getName.startsWith("retire-")).head
    val aged = manifest.getName.replaceFirst("retire-\\d+",
      s"retire-${System.currentTimeMillis() - 590000L}")
    assert(manifest.renameTo(new java.io.File(manifest.getParent, aged)))
    val e = intercept[IllegalStateException](
      LwwTable.assertScanBudget(spark, dir, scanBudgetMs = 60000L, graceMs = 600000L))
    assert(e.getMessage.contains("could lose its files to GC mid-flight"),
      s"names the hazard: ${e.getMessage}")
  }

  test("a reader racing GC tolerates a vanished manifest; a foreign entry fails named") {
    val dir = Files.createTempDirectory("lww_grace_vanish").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    // ADVICE r13: a manifest that vanishes between a reader's _gc listing
    // and its open means GC just ran — absence is the correct reading.
    // Simulate the interleaving's observable half: GC with a manifest
    // whose files are already gone must stay silent (the in-JVM list/open
    // race itself cannot be paused; the code path is shared)
    val gc = new java.io.File(s"$dir/_gc"); gc.mkdirs()
    val ghost = new java.io.File(gc, s"retire-${System.currentTimeMillis() - 60000}-ghost")
    Files.write(ghost.toPath,
      "source=a/trip_start_date=2024-01-01/no-such-file.parquet\n".getBytes("UTF-8"))
    assert(LwwTable.read(spark, dir, keyCols, col("seq")).count() == 1,
      "a manifest naming already-deleted files never breaks a read")
    assert(LwwTable.gcRetired(spark, dir, 0L) == 0, "nothing left to delete")
    assert(!ghost.exists(), "the empty manifest is dropped")
    // ADVICE r13: a manifest entry that is not two Hive leaves + a file
    // must fail NAMING the entry, not with StringIndexOutOfBounds or a
    // silently-bogus exclusion filter
    val foreign = new java.io.File(gc, s"retire-${System.currentTimeMillis()}-foreign")
    gc.mkdirs()
    Files.write(foreign.toPath, "file:/elsewhere/evil.parquet\n".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](
      LwwTable.read(spark, dir, keyCols, col("seq")).count())
    assert(e.getMessage.contains("retirement manifest entry")
      && e.getMessage.contains("file:/elsewhere/evil.parquet"),
      s"names the foreign entry: ${e.getMessage}")
    assert(foreign.delete())
  }

  test("a foreign partition directory under _delta fails naming the offending path") {
    // ADVICE r12: a hand-placed directory with an unparseable date must not
    // abort the fold with a bare IllegalArgumentException
    val dir = Files.createTempDirectory("lww_grace_foreign").toString + "/t"
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    // two files under a bogus date dir -> the merge path must parse it
    val src = new java.io.File(s"${LwwTable.deltaDir(dir)}/source=a")
    LwwTable.append(df(("a", "T1", "2024-01-01", "v2", 2L)), dir, keyCols, col("seq"))
    val real = new java.io.File(src, "trip_start_date=2024-01-01")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val bogus = new java.io.File(src, "trip_start_date=notadate")
    assert(bogus.mkdirs())
    Files.copy(real.toPath, bogus.toPath.resolve("f1-" + real.getName))
    Files.copy(real.toPath, bogus.toPath.resolve("f2-" + real.getName))
    val e = intercept[IllegalStateException](
      LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L))
    assert(e.getMessage.contains("notadate")
      && e.getMessage.contains("trip_start_date=notadate"),
      s"names the offending partition directory: ${e.getMessage}")
  }
}
