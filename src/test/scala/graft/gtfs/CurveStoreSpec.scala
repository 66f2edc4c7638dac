package graft.gtfs

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 robustness contracts of the statistics store and the
  * stale-schedule delete: an EMPTY store is a legitimate state (young feed
  * whose F9 gates passed nothing; a zero-row `save*` leaves only `_SUCCESS`
  * under the partitioned root), and the reference's
  * `delete_outdated_predictions` (scheduled_predictions_importer.rs:234-265)
  * must touch exactly the old-version schedule-origin rows inside the
  * re-predicted window — nothing else. */
class CurveStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("empty curve store: save leaves _SUCCESS only, loads read zero rows, cache serves") {
    import spark.implicits._
    val base = Files.createTempDirectory("empty_store")
    val specDir = s"$base/specific"; val defDir = s"$base/default"
    CurveStore.saveSpecific(spark.emptyDataset[SpecificCurveRow], specDir)
    CurveStore.saveDefault(spark.emptyDataset[DefaultCurveRow], defDir)
    // the on-disk state under test: root exists, no data files
    assert(new java.io.File(specDir).exists())
    assert(!Directory.tableHasData(spark, specDir))
    // loads must yield empty datasets, not UNABLE_TO_INFER_SCHEMA
    assert(CurveStore.loadSpecific(spark, specDir).count() == 0)
    assert(CurveStore.loadDefault(spark, defDir).count() == 0)
    // the streaming refresh's cache path must survive it too (this killed
    // the stream mid-trigger before r9): a loadable zero-curve Predictor
    val cache = new CurveCache(spark, specDir, defDir)
    val bc = cache.tryGet()
    assert(bc.isDefined, "empty store is driver-map material (0 rows)")
    // and the merged load is empty but functional
    val p = CurveStore.loadMerged(spark, specDir, defDir)
    assert(p != null)
  }

  test("stale-schedule delete: old-version schedule rows below the mark, nothing else") {
    import spark.implicits._
    val dir = Files.createTempDirectory("staledel").toString + "/predictions"
    // full upsert-key schema (the rewrite re-enters rows through the delta,
    // whose fold resolves on PredictionsTable.KeyCols)
    def row(src: String, trip: String, date: String, time: Int, origin: Int,
            sched: String) =
      (src, trip, java.sql.Date.valueOf(date), time, 1, 1, origin, 1L, sched)
    val day = "2024-01-10"
    val cols = Seq("source", "trip_id", "trip_start_date", "trip_start_time",
      "stop_sequence", "event_type", "origin_type", "refresh_seq",
      "schedule_file_name") // time = INT service-day seconds
    val rows = Seq(
      row("a", "T1", day, 8 * 3600, Codes.OriginSchedule, "v1"),  // stale: below mark
      row("a", "T2", day, 20 * 3600, Codes.OriginSchedule, "v1"), // keep: above mark
      row("a", "T3", day, 8 * 3600, Codes.OriginSchedule, "v2"),  // keep: current version
      row("a", "T4", day, 8 * 3600, Codes.OriginRealtime, "v1"),  // keep: realtime origin
      row("b", "T5", day, 8 * 3600, Codes.OriginSchedule, "v1"),  // keep: other source
      // all-stale partition: its directory must be dropped, not rewritten
      row("a", "T6", "2024-01-09", 8 * 3600, Codes.OriginSchedule, "v1"))
      .toDF(cols: _*)
    rows.write.partitionBy("source", "trip_start_date").parquet(dir)
    // null-start row: NULL never satisfies the reference's comparison — kept
    val nullRow = Seq(("a", "T7", java.sql.Date.valueOf(day), 1, 1,
        Codes.OriginSchedule, 1L, "v1"))
      .toDF("source", "trip_id", "trip_start_date", "stop_sequence",
        "event_type", "origin_type", "refresh_seq", "schedule_file_name")
      .withColumn("trip_start_time", lit(null).cast("int"))
    nullRow.write.mode("append").partitionBy("source", "trip_start_date").parquet(dir)

    val mark = java.time.LocalDate.parse(day).toEpochDay * 86400 + 12 * 3600
    // graceMs = 0: this spec pins the OFFLINE physical semantics (raw dir
    // reads below); the grace-mode live behavior is LwwGraceSpec's job
    val deleted = Directory.deleteStaleSchedulePredictions(spark, dir, "a", "v2",
      mark, graceMs = 0L)
    assert(deleted == 2, s"exactly the two sub-mark v1 schedule rows, got $deleted")
    // the kept rows re-enter through the delta tree (replacePartitions);
    // fold so the raw BASE read below sees the converged physical state
    PredictionsTable.compact(spark, dir, Some("v2"), graceMs = 0L)

    val left = spark.read.parquet(dir)
      .select("source", "trip_start_date", "trip_start_time",
        "origin_type", "schedule_file_name")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getInt(3), r.getString(4))).toSet
    assert(left == Set(
      ("a", day, Some(20 * 3600), Codes.OriginSchedule, "v1"),
      ("a", day, Some(8 * 3600), Codes.OriginSchedule, "v2"),
      ("a", day, Some(8 * 3600), Codes.OriginRealtime, "v1"),
      ("b", day, Some(8 * 3600), Codes.OriginSchedule, "v1"),
      ("a", day, None, Codes.OriginSchedule, "v1")))
    // the all-stale partition directory is gone (no empty dir left behind)
    assert(!new java.io.File(s"$dir/source=a/trip_start_date=2024-01-09").exists())
    // steady state: same call again is probe-only and deletes nothing
    assert(Directory.deleteStaleSchedulePredictions(spark, dir, "a", "v2",
      mark, graceMs = 0L) == 0)
  }
}
