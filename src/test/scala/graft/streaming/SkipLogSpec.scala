package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The bounded, auto-requeueing skip log (VERDICT r10 #2/#3): a day-long
  * outage must not leave thousands of tiny files in the checkpoint, and a
  * recovered schedule tree must get its outage-era files back without
  * operator action. */
class SkipLogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tsvCount(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))

  test("a long outage's per-trigger appends stay bounded in file count and entries") {
    val dir = Files.createTempDirectory("skiplog").toString + "/log"
    // 3× the file bound of degraded triggers, one file each
    (1 to SkipLog.MaxLogFiles * 3).foreach(i =>
      SkipLog.append(spark, dir, Seq(("no_schedule_data", f"feed-$i%05d.pb"))))
    assert(tsvCount(dir) <= SkipLog.MaxLogFiles + 1,
      s"directory stays bounded: ${tsvCount(dir)} files")
    val all = SkipLog.entries(spark, dir)
    assert(all.size == SkipLog.MaxLogFiles * 3, "no entry lost by coalescing")
    assert(all.last._2 == f"feed-${SkipLog.MaxLogFiles * 3}%05d.pb",
      "order preserved, newest last")
    // the DataFrame reader sees the same entries
    assert(SkipLog.read(spark, dir).count() == all.size)
  }

  test("the entry ring keeps only the newest MaxEntries lines") {
    val dir = Files.createTempDirectory("skiplog_ring").toString + "/log"
    val batch = (1 to SkipLog.MaxEntries + 100).map(i => ("no_schedule_data", s"f$i.pb"))
    SkipLog.append(spark, dir, batch)
    SkipLog.coalesce(spark, dir)
    val kept = SkipLog.entries(spark, dir)
    assert(kept.size == SkipLog.MaxEntries, s"ring bound holds: ${kept.size}")
    assert(kept.last._2 == s"f${SkipLog.MaxEntries + 100}.pb"
      && kept.head._2 == "f101.pb", "the OLDEST lines were evicted")
  }

  test("ring truncation evicts non-recoverable entries before recoverable ones") {
    // ADVICE r11: evicting a still-recoverable entry silently disables its
    // auto-requeue, while a retagged/terminal entry is pure history — so
    // the OLDEST recoverable entries must survive a ring overflow as long
    // as any non-recoverable entry can be evicted instead
    val dir = Files.createTempDirectory("skiplog_evict").toString + "/log"
    val oldRecoverable = (1 to 10).map(i => ("no_schedule_data", s"keep-$i.pb"))
    val filler = (1 to SkipLog.MaxEntries).map(i =>
      ("requeued:no_schedule_data", s"hist-$i.pb")) // terminal, evictable
    SkipLog.append(spark, dir, oldRecoverable ++ filler)
    SkipLog.coalesce(spark, dir)
    val kept = SkipLog.entries(spark, dir)
    assert(kept.size == SkipLog.MaxEntries, s"ring bound holds: ${kept.size}")
    val keptRecoverable = kept.filter(e => SkipLog.RecoverableReasons(e._1))
    assert(keptRecoverable.map(_._2).toSet ==
      oldRecoverable.map(_._2).toSet,
      "every recoverable entry survives although it is the OLDEST in the log")
    assert(kept.count(_._1 == "requeued:no_schedule_data")
      == SkipLog.MaxEntries - 10,
      "exactly the oldest non-recoverable history lines were evicted")
  }

  test("requeue copies recoverable files under fresh dated names and retags entries") {
    val dir = Files.createTempDirectory("skiplog_rq").toString + "/log"
    val rt = Files.createTempDirectory("skiplog_rt")
    Files.write(rt.resolve("2024-01-10-feed.pb"), Array[Byte](1, 2, 3))
    Files.write(rt.resolve("2024-01-11-feed.pb"), Array[Byte](4, 5))
    SkipLog.append(spark, dir, Seq(
      ("no_schedule_data", "2024-01-10-feed.pb"),
      ("schedule_read_race_predict", "2024-01-11-feed.pb"),
      ("no_schedule_data", "2024-01-12-gone.pb"),      // operator deleted it
      ("unparseable_date", "nodate.pb"),               // informational: never requeued
      ("no_schedule_version_predict", "date=2024-01-10 version=v1"))) // group marker
    assert(SkipLog.requeue(spark, dir, rt.toString) == 2, "two files copied")
    val copies = rt.toFile.listFiles().map(_.getName)
      .filter(n => !n.startsWith(".") && n.contains(".rq")) // .crc sidecars are hidden
    assert(copies.length == 2 && copies.forall(_.endsWith(".pb")),
      s"fresh names keep the .pb suffix for the source glob: ${copies.toSeq}")
    val c10 = copies.find(_.startsWith("2024-01-10-feed")).get
    assert(graft.gtfs.Directory.dateFromFilename(c10)
      .contains(java.time.LocalDate.parse("2024-01-10")),
      s"the fresh name keeps the ORIGINAL date as the first match: $c10")
    assert(java.nio.file.Files.readAllBytes(rt.resolve(c10)).toSeq == Seq[Byte](1, 2, 3),
      "payload byte-identical")
    val after = SkipLog.entries(spark, dir).toMap
    assert(after.get("requeued:no_schedule_data").contains("2024-01-10-feed.pb"))
    assert(after.get("requeued:schedule_read_race_predict").contains("2024-01-11-feed.pb"))
    assert(after.get("requeue_missing:no_schedule_data").contains("2024-01-12-gone.pb"),
      "a vanished original is retagged so the sweep stops retrying")
    assert(after.get("unparseable_date").contains("nodate.pb"),
      "informational entries ride along untouched")
    // idempotent: nothing recoverable remains
    assert(SkipLog.requeue(spark, dir, rt.toString) == 0)
    assert(rt.toFile.listFiles().map(_.getName)
      .count(n => !n.startsWith(".") && n.contains(".rq")) == 2,
      "no duplicate copies on the second sweep")
  }

  test("requeue on a missing or empty log is a cheap no-op") {
    val dir = Files.createTempDirectory("skiplog_none").toString + "/log"
    val rt = Files.createTempDirectory("skiplog_none_rt")
    assert(SkipLog.requeue(spark, dir, rt.toString) == 0)
    assert(SkipLog.read(spark, dir).count() == 0, "reader schema-correct on absence")
  }
}
