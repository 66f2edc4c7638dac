package graft.gtfs

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The schedule-side FileCache (reference main.rs:321-393 + the 5 s
  * directory re-scan of importer/mod.rs:361-460): dated versions listed
  * fresh per call, loads cached per version until the directory's
  * fingerprint changes, LRU-bounded. */
class ScheduleCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkVersion(parent: java.nio.file.Path, name: String,
                        version: Int = 1): String = {
    val d = parent.resolve(name)
    Files.createDirectories(d)
    FixtureGen.writeSchedule(d, version)
    d.toString
  }

  test("dated listing, as-of pick and newest are by PARSED date (fresh per call)") {
    val parent = Files.createTempDirectory("sched_cache")
    mkVersion(parent, "b-2024-05-01")
    mkVersion(parent, "a-2024-06-01")
    Files.createDirectories(parent.resolve("current")) // undated: ignored
    val cache = new ScheduleCache(spark, parent.toString)

    assert(cache.datedDirs().map(_._1.toString) == Seq("2024-05-01", "2024-06-01"))
    // string max would pick b-2024-05-01
    assert(cache.newestDir().exists(_.endsWith("a-2024-06-01")))
    assert(cache.asOfDir(java.time.LocalDate.parse("2024-05-15"))
      .exists(_.endsWith("b-2024-05-01")), "as-of: newest version <= date")
    assert(cache.asOfDir(java.time.LocalDate.parse("2024-04-01")).isEmpty,
      "older than every version")
    assert(cache.shortName(cache.newestDir().get) == "a-2024-06-01")

    // a version dropped AFTER construction is seen by the next call — the
    // listing is never cached (the reference re-scans every iteration)
    mkVersion(parent, "c-2024-07-01")
    assert(cache.newestDir().exists(_.endsWith("c-2024-07-01")))
    // regression (r9): the listed dirs carry a scheme ("file:/..."), and
    // GtfsSchedule.load once probed members with java.io.File — every
    // table silently loaded EMPTY (on a real cluster, any hdfs:// dir)
    assert(cache.newestDir().get.startsWith("file:"),
      "precondition: FileSystem listing is scheme-qualified")
    assert(cache.get(cache.newestDir().get).trips.count() == 5,
      "scheme-qualified schedule dir loads real rows")
    cache.close()
  }

  test("loads are cached per version, invalidated by any file change, LRU-bounded") {
    val parent = Files.createTempDirectory("sched_cache2")
    val v1 = mkVersion(parent, "2024-01-01")
    val v2 = mkVersion(parent, "2024-02-01", version = 2)
    val cache = new ScheduleCache(spark, parent.toString, maxLoaded = 2)

    val s1a = cache.get(v1)
    assert(cache.get(v1) eq s1a, "unchanged version returns the cached object")
    val s2 = cache.get(v2)
    assert(s2.trips.filter(org.apache.spark.sql.functions.col("trip_id") === "T1b2")
      .count() == 1, "version 2 content (renamed T1b2) loaded")

    // touch one file -> fingerprint changes -> reload (fresh object)
    val st = Paths.get(v1, "stop_times.txt")
    Files.setLastModifiedTime(st,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(st).toMillis + 5000))
    val s1b = cache.get(v1)
    assert(!(s1b eq s1a), "mtime change reloads the version")
    assert(cache.get(v1) eq s1b, "and the reload is cached again")
    // an ADDED file (calendar_dates dropped in later) invalidates too —
    // the fingerprint covers the whole directory, not a fixed member list
    Files.write(Paths.get(v1, "calendar_dates.txt"),
      "service_id,date,exception_type\n".getBytes("UTF-8"))
    val s1c = cache.get(v1)
    assert(!(s1c eq s1b), "added file reloads the version")
    // ... and a REMOVED file
    Files.delete(Paths.get(v1, "calendar_dates.txt"))
    assert(!(cache.get(v1) eq s1c), "removed file reloads the version")

    // LRU bound 2: loading a third version evicts the least recently USED
    // (v2 — v1 was touched last); the evicted object keeps working because
    // unpersist only drops cache blocks
    val v3 = mkVersion(parent, "2024-03-01")
    cache.get(v1) // v1 most recent
    val s3 = cache.get(v3)
    assert(s3.trips.count() == 5)
    assert(s2.trips.count() == 5, "evicted schedule still computes (S2 cache dropped only)")
    cache.close()
  }

  test("asOf falls back to the OLDEST version for a pre-history date; newest() loads") {
    val parent = Files.createTempDirectory("sched_cache3")
    mkVersion(parent, "2024-03-01")
    mkVersion(parent, "2024-04-01", version = 2)
    val cache = new ScheduleCache(spark, parent.toString)
    assert(cache.asOf(java.time.LocalDate.parse("2024-01-01"))
      .exists(_._1 == "2024-03-01"), "pre-history service date -> oldest version")
    assert(cache.asOf(java.time.LocalDate.parse("2024-03-20"))
      .exists(_._1 == "2024-03-01"))
    assert(cache.newest().exists(_._1 == "2024-04-01"))
    // byName: the reverse of shortName, for resolving a stored
    // schedule_file_name back to its live version
    assert(cache.byName("2024-03-01").exists(_.trips.count() == 5))
    assert(cache.byName("2024-99-99").isEmpty)
    val empty = new ScheduleCache(spark,
      Files.createTempDirectory("sched_cache_empty").toString)
    assert(empty.newest().isEmpty
      && empty.asOf(java.time.LocalDate.parse("2026-01-01")).isEmpty)
    cache.close()
  }

  test("asOf resolves pick AND pre-history fallback from ONE listing") {
    // both arms must read the same snapshot: a version dropped between two
    // listings could otherwise hand the fallback a dir the pick never saw.
    // Pinned two ways: (a) the pick-else-oldest helper is a pure function
    // of one listing value; (b) a counting FileSystem observes exactly one
    // parent listStatus per asOf-resolution.
    val parent = Files.createTempDirectory("sched_cache4")
    mkVersion(parent, "2024-03-01")
    mkVersion(parent, "2024-04-01", version = 2)
    val cache = new ScheduleCache(spark, parent.toString)
    val snap = cache.datedDirs()
    assert(cache.asOfDirOrOldest(snap, java.time.LocalDate.parse("2024-03-20"))
      .exists(_.endsWith("2024-03-01")), "as-of pick from the snapshot")
    assert(cache.asOfDirOrOldest(snap, java.time.LocalDate.parse("2020-01-01"))
      .exists(_.endsWith("2024-03-01")), "pre-history fallback from the SAME snapshot")
    assert(cache.asOfDirOrOldest(Nil, java.time.LocalDate.parse("2020-01-01")).isEmpty)

    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftcount.impl", classOf[CountingLocalFs].getName)
    val counted = new ScheduleCache(spark, "graftcount:" + parent)
    assert(counted.datedDirs().size == 2,
      "precondition: the counting scheme lists the same tree")
    CountingLocalFs.parentPath = parent.toString
    CountingLocalFs.parentListings.set(0)
    // pre-history date: exercises the fallback arm — the arm that used to
    // take a SECOND listing (schedule load + fingerprint only touch the
    // VERSION directory, so parent listings isolate the as-of resolution)
    val pick = counted.asOf(java.time.LocalDate.parse("2020-01-01"))
    assert(pick.exists(_._1 == "2024-03-01"))
    assert(CountingLocalFs.parentListings.get() == 1,
      s"one parent listing per asOf resolution, saw ${CountingLocalFs.parentListings.get()}")
    counted.close()
    cache.close()
  }
}

/** A local FileSystem under the `graftcount:` scheme that counts listStatus
  * calls on [[CountingLocalFs.parentPath]] — lets a spec observe how many
  * directory listings one cache operation takes. */
class CountingLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftcount:///")
  // plain FileStatus copies: the raw local statuses lazy-load permissions
  // through java.io.File(uri), which rejects the custom scheme — the cache
  // only reads path/length/mtime anyway
  private def plain(s: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(s.getLen, s.isDirectory, 1,
      s.getBlockSize, s.getModificationTime, s.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getDirDefault, "", "",
      s.getPath)
  override def getFileStatus(f: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus = plain(super.getFileStatus(f))
  override def listStatus(f: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] = {
    if (f.toUri.getPath == CountingLocalFs.parentPath)
      CountingLocalFs.parentListings.incrementAndGet()
    super.listStatus(f).map(plain)
  }
}

object CountingLocalFs {
  val parentListings = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var parentPath: String = ""
}
