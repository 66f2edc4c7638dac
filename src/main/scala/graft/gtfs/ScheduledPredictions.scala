package graft.gtfs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Service-day resolution (`trips_for_date`,
  * scheduled_predictions_importer.rs:112-139 / journey_data.rs:406):
  * calendar weekday flags + date range, overridden by calendar_dates
  * exceptions (1 = added, 2 = removed). */
object ServiceCalendar {

  /** service_ids active on `date` (a "yyyy-MM-dd" string). */
  def activeServices(spark: SparkSession, schedule: GtfsSchedule, date: String): DataFrame = {
    val d = java.time.LocalDate.parse(date)
    val dateStr = date.replace("-", "")
    val weekdayCol = d.getDayOfWeek.toString.toLowerCase // "monday" …
    val base = schedule.calendar
      .filter(col("start_date") <= dateStr && col("end_date") >= dateStr
        && col(weekdayCol) === 1)
      .select("service_id")
    val added = schedule.calendarDates
      .filter(col("date") === dateStr && col("exception_type") === 1)
      .select("service_id")
    val removed = schedule.calendarDates
      .filter(col("date") === dateStr && col("exception_type") === 2)
      .select("service_id")
    base.union(added).distinct().except(removed)
  }

  /** Trips running on `date`, by service-id membership (semi join). */
  def tripsForDate(spark: SparkSession, schedule: GtfsSchedule, date: String): DataFrame =
    schedule.trips.join(broadcast(activeServices(spark, schedule, date)),
      Seq("service_id"), "left_semi")
}

/** ST4 idle-time backfill ("scheduled predictions",
  * scheduled_predictions_importer.rs:64-242): while no realtime files are
  * pending, advance a persisted high-water mark through the schedule in
  * batches of ≥ 6 minutes of trips AND ≥ 1000 trips, up to now + 7 d 12 h;
  * cross-midnight service days contribute via the previous day's >24 h trips
  * (SO1 union). Returns the batch plus the advanced mark, or None when the
  * buffer is full (caller backs off 20 minutes, PREDICTION_FULL_TIMEOUT). */
object ScheduledPredictions {

  val BufferSecs: Long = (7 * 24 + 12) * 3600L
  val MinBatchSecs: Long = 6 * 60L
  val MinBatchTrips: Long = 1000L

  final case class Batch(predictions: DataFrame, newHighWaterMark: Long, tripCount: Long)

  /** Trip start instants (epoch secs) for one service date, including the
    * previous service day's past-midnight starts (SO1). */
  /** `includePrevious` is set only for the FIRST day of a multi-day scan:
    * day d's >24 h trips already appear in day d's own listing (service_date
    * = d), so re-adding them as day d+1's "previous" arm would duplicate
    * them and inflate the 1000-trip window cutoff. */
  private def tripStarts(spark: SparkSession, schedule: GtfsSchedule,
                         date: String, includePrevious: Boolean = true): DataFrame = {
    val current = ServiceCalendar.tripsForDate(spark, schedule, date)
      .withColumn("service_date", lit(date))
    val withPrev = if (!includePrevious) current else {
      val prevDate = java.time.LocalDate.parse(date).minusDays(1).toString
      val previous = ServiceCalendar.tripsForDate(spark, schedule, prevDate)
        .filter(col("trip_start_time") >= 86400) // 25 h+ starts belong to prev day
        .withColumn("service_date", lit(prevDate))
      current.unionByName(previous)
    }
    withPrev
      .withColumn("start_epoch", unix_timestamp(GtfsTime.dateAndTime(
        to_date(col("service_date")), col("trip_start_time"))))
  }

  /** End instant of ONE backfill batch from `from`: the window must cover
    * ≥ [[MinBatchSecs]] of schedule time AND reach the [[MinBatchTrips]]-th
    * start (or the last available one), clipped to `bufferEnd`; None when no
    * starts remain in (from, bufferEnd] — the mark then jumps to `bufferEnd`
    * (scheduled_predictions_importer.rs:28-44 batch growth). Factored out of
    * [[advance]] so the boundary recurrence itself is driver-query testable
    * over any start-instant table. */
  private[gtfs] def batchEnd(starts: DataFrame, from: Long,
                             bufferEnd: Long): Option[Long] = {
    val epochs = starts
      .filter(col("start_epoch") > from && col("start_epoch") <= bufferEnd)
      .select("start_epoch").orderBy("start_epoch")
      .limit(math.max(MinBatchTrips.toInt, 1))
      .collect().map(_.getLong(0))
    if (epochs.isEmpty) None
    else Some(math.min(bufferEnd, math.max(from + MinBatchSecs, epochs.last)))
  }

  /** The ST4 batch PARTITIONING over a horizon: iterate [[batchEnd]] from
    * `from0` and report every (batch, from, end, count) window — the exact
    * sequence of high-water-mark advances the idle backfill would commit.
    * A driver loop by nature (each window's start is the previous window's
    * end, just like the reference's importer loop). When the horizon holds
    * ≤ `collectCap` starts it is collected ONCE and folded in memory (two
    * jobs total); beyond the cap — where a driver array would not be
    * bounded — each round collects at most [[MinBatchTrips]] epochs and
    * runs one bounded count over the cached horizon table. Both paths run
    * the identical recurrence. `maxBatches` bounds the scan. */
  def batchBoundaries(starts: DataFrame, epochCol: String, from0: Long,
                      bufferEnd: Long, maxBatches: Int,
                      collectCap: Int = 1 << 18): Seq[(Int, Long, Long, Long)] = {
    val horizon = starts.select(col(epochCol).cast("long").as("start_epoch"))
      .filter(col("start_epoch") > from0 && col("start_epoch") <= bufferEnd)
      .cache()
    try {
      if (horizon.count() <= collectCap) {
        val epochs = horizon.orderBy("start_epoch").collect().map(_.getLong(0))
        foldBoundaries(epochs, from0, bufferEnd, maxBatches)
      } else {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
        var from = from0
        var i = 1
        while (from < bufferEnd && i <= maxBatches) {
          batchEnd(horizon, from, bufferEnd) match {
            case None =>
              out += ((i, from, bufferEnd, 0L))
              from = bufferEnd
            case Some(end) =>
              val cnt = horizon.filter(
                col("start_epoch") > from && col("start_epoch") <= end).count()
              out += ((i, from, end, cnt))
              from = end
          }
          i += 1
        }
        out.toSeq
      }
    } finally horizon.unpersist()
  }

  /** The boundary recurrence over an already-collected ascending epoch
    * array (all in (from0, bufferEnd]) — same rule as [[batchEnd]]:
    * epochs(i..) are exactly the starts after the current mark, so the
    * batch target is the min(MinBatchTrips, remaining)-th of them. */
  private def foldBoundaries(epochs: Array[Long], from0: Long, bufferEnd: Long,
                             maxBatches: Int): Seq[(Int, Long, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    var i = 0 // epochs(0 until i) are ≤ the current mark (already batched)
    var from = from0
    var b = 1
    while (from < bufferEnd && b <= maxBatches) {
      if (i >= epochs.length) {
        out += ((b, from, bufferEnd, 0L))
        from = bufferEnd
      } else {
        val k = math.min(i + math.max(MinBatchTrips.toInt, 1), epochs.length) - 1
        val end = math.min(bufferEnd, math.max(from + MinBatchSecs, epochs(k)))
        var j = i
        while (j < epochs.length && epochs(j) <= end) j += 1
        out += ((b, from, end, (j - i).toLong))
        from = end
        i = j
      }
      b += 1
    }
    out.toSeq
  }

  /** One backfill iteration from `highWaterMark` (epoch secs; trips starting
    * ≤ hwm are already predicted). */
  def advance(spark: SparkSession, schedule: GtfsSchedule, source: String,
              specific: Dataset[SpecificCurveRow], defaults: Dataset[DefaultCurveRow],
              highWaterMark: Long, nowEpochSecs: Long,
              scheduleFileName: Option[String] = None): Option[Batch] = {
    val bufferEnd = nowEpochSecs + BufferSecs
    val from = math.max(highWaterMark, nowEpochSecs)
    if (from >= bufferEnd) return None // buffer full → PREDICTION_FULL_TIMEOUT

    // scan forward day by day until the batch window covers ≥6 min of trips
    // and ≥1000 trips (or the buffer end is reached)
    var day = java.time.LocalDate.ofEpochDay(from / 86400)
    val lastDay = java.time.LocalDate.ofEpochDay(bufferEnd / 86400)
    val starts = new scala.collection.mutable.ArrayBuffer[(String, DataFrame)]()
    var firstDay = true
    while (!day.isAfter(lastDay)) {
      starts += ((day.toString,
        tripStarts(spark, schedule, day.toString, includePrevious = firstDay)))
      firstDay = false
      day = day.plusDays(1)
    }
    val allStarts = starts.map(_._2).reduce(_ unionByName _)
      .filter(col("start_epoch") > from && col("start_epoch") <= bufferEnd)
      .cache()
    val total = allStarts.count()
    // schema-correct empty predictions: spark.emptyDataFrame has ZERO
    // columns, and callers filter the batch by column (cleanup, window
    // filter) — they would throw UNRESOLVED_COLUMN on a legitimate
    // empty state. A limit(0) over the real plan keeps the exact schema.
    def emptyPredictions = Predictor.batchPredict(spark, schedule,
      java.time.LocalDate.ofEpochDay(from / 86400).toString,
      source, specific, defaults, scheduleFileName).limit(0)

    if (total == 0) {
      allStarts.unpersist()
      return Some(Batch(
        emptyPredictions, bufferEnd, 0)) // nothing scheduled → mark advanced
    }

    // grow the window until both minimums hold (total > 0 here, so the
    // shared boundary step always finds an epoch)
    val end = batchEnd(allStarts, from, bufferEnd).get

    val batchTrips = allStarts.filter(col("start_epoch") <= end)
    val dates = batchTrips.select("service_date").distinct()
      .collect().map(_.getString(0)).sorted
    val preds = dates.map { d =>
      Predictor.batchPredict(spark, schedule, d, source, specific, defaults,
          scheduleFileName)
        .join(broadcast(batchTrips.filter(col("service_date") === d)
          .select(col("trip_id"))), Seq("trip_id"), "left_semi")
    }.reduceOption(_ unionByName _).getOrElse(emptyPredictions)

    // materialize the bounded batch, then RELEASE the per-iteration cache —
    // the idle-backfill loop calls advance() forever, and a leaked cached
    // plan per iteration would crowd out the persistent schedule caches
    // (localCheckpoint blocks are freed by the ContextCleaner once the
    // returned Batch is dropped; CacheManager entries are not)
    val batch = Batch(preds.localCheckpoint(true), end, batchTrips.count())
    allStarts.unpersist()
    Some(batch)
  }
}
