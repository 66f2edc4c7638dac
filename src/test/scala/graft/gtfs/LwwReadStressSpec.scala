package graft.gtfs

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r12 #1 done-criterion: bare `PredictionsTable.read` hammered
  * from separate threads while fold/merge cycles run continuously must see
  * ZERO read failures — the race that killed a planning-time footer read in
  * r12's suite (`FileNotFoundException` on a retired `_delta/` file) is
  * structurally closed by the retirement/grace discipline: no file a reader
  * can have listed is deleted inside the grace window. */
class LwwReadStressSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("reads never fail during 110 append/merge/fold cycles on a live predictions table") {
    val dir = Files.createTempDirectory("lww_stress").toString + "/predictions"
    import spark.implicits._
    val grace = 600000L // >> test duration: no GC deletion can land mid-read
    val version = "2024-01-01"
    def batch(refreshSeq: Long) =
      (0 until 6).map { k =>
        ("test", s"T$k", java.sql.Date.valueOf(s"2024-01-0${1 + k % 2}"),
          8 * 3600, k, 0, version, refreshSeq, 0.5 + k)
      }.toDF("source", "trip_id", "trip_start_date", "trip_start_time",
        "stop_sequence", "event_type", "schedule_file_name", "refresh_seq",
        "delay")

    val iterations = 110
    val ordering = PredictionsTable.ordering(Some(version))
    LwwTable.append(batch(0L), dir, PredictionsTable.KeyCols, ordering)

    val stop = new AtomicBoolean(false)
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val reads = new AtomicInteger(0)
    def reader(body: () => Unit): Thread = {
      val t = new Thread(() =>
        while (!stop.get()) {
          try { body(); reads.incrementAndGet() }
          catch { case e: Throwable => failures.add(e); stop.set(true) }
        })
      t.setDaemon(true); t.start(); t
    }
    // the exact shapes the flake hit: a bare resolved read (plans footers
    // over base ∪ delta) and a raw dedup-invariant aggregate
    val r1 = reader(() =>
      assert(PredictionsTable.read(spark, dir, Some(version)).count() == 6))
    val r2 = reader(() => {
      val m = LwwTable.readRaw(spark, dir)
        .agg(max(col("refresh_seq"))).head().getLong(0)
      assert(m >= 0L)
    })

    (1 to iterations).foreach { i =>
      LwwTable.append(batch(i.toLong), dir, PredictionsTable.KeyCols, ordering)
      if (i % 4 == 0)
        LwwTable.mergeDeltaIfOversized(spark, dir, PredictionsTable.KeyCols,
          ordering, maxDeltaFiles = 4, graceMs = grace)
      if (i % 25 == 0)
        PredictionsTable.compact(spark, dir, Some(version), graceMs = grace)
      if (failures.size() > 0) fail(s"reader died at iteration $i: ${failures.peek()}")
    }
    stop.set(true); r1.join(30000); r2.join(30000)
    assert(failures.isEmpty, s"concurrent readers must never fail: ${failures.peek()}")
    assert(reads.get() > 20, s"readers actually ran (got ${reads.get()} reads)")

    // correctness after the storm: newest refresh wins for every key
    val fin = PredictionsTable.read(spark, dir, Some(version))
      .select("trip_id", "refresh_seq").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fin == (0 until 6).map(k => (s"T$k", iterations.toLong)).toSet,
      s"resolved view is the last writer per key: $fin")
    // offline close-out: physical fold + GC leaves a clean key-unique base
    PredictionsTable.compact(spark, dir, Some(version), graceMs = 0L)
    assert(LwwTable.gcRetired(spark, dir, 0L) >= 0)
    assert(!LwwTable.pendingRetirements(spark, dir)
      && LwwTable.deltaFileCount(spark, dir) == 0)
    val base = spark.read.parquet(dir)
    assert(base.count() == 6 && base.select(
      PredictionsTable.KeyCols.map(col): _*).distinct().count() == 6)
  }
}
