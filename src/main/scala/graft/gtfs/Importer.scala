package graft.gtfs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Flat decoded GTFS-RT row: one per (trip update × stop time update × file).
  * Mirrors the reference's per-entity iteration
  * (/root/reference/src/importer/per_schedule_importer.rs:119-243). */
final case class RtRow(
    file_name: String,
    time_of_recording: Long, // feed header timestamp, epoch seconds
    trip_id: String,
    rt_route_id: Option[String],
    start_date: Option[String], // "YYYYMMDD"
    start_time: Option[String], // "HH:MM:SS", may exceed 24h
    stop_sequence: Option[Int],
    rt_stop_id: Option[String],
    delay_arrival: Option[Int],
    delay_departure: Option[Int])

/** Batch ingest: GTFS-RT protobuf files → `records` DataFrame (S3 + J1 + J2 +
  * F4 + W2). The streaming wrapper reuses the same [[recordsFromRt]] plan
  * (SURVEY.md §3.1).
  */
object Importer {

  /** Decode raw `.pb` file bytes (from `spark.read.format("binaryFile")`)
    * into flat RT rows. Decoding runs distributed in a mapPartitions over the
    * binary files — one task per file group, no driver funnel. */
  def decodeRtFiles(spark: SparkSession, binaryFiles: DataFrame): Dataset[RtRow] = {
    import spark.implicits._
    binaryFiles
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        // one corrupt/truncated .pb yields zero rows instead of failing the
        // whole job (the reference skips bad files individually)
        val msg = try GtfsRtCodec.decode(bytes)
          catch { case _: GtfsRtCodec.MalformedProtobufException =>
            GtfsRtCodec.FeedMessage(None, Nil) }
        msg.timestamp match {
          // no header timestamp → skip the FILE, as the reference does
          // (per_schedule_importer.rs:111-113) — defaulting to epoch 0 would
          // make every row lose the W2 last-writer-wins dedupe
          case None => Iterator.empty
          case Some(ts) =>
            msg.tripUpdates.iterator.flatMap { tu =>
              tu.trip.tripId match {
                case None => Iterator.empty // required field missing → skip entity
                case Some(tripId) =>
                  tu.stopTimeUpdates.iterator.map { stu =>
                    RtRow(name, ts, tripId, tu.trip.routeId, tu.trip.startDate,
                      tu.trip.startTime, stu.stopSequence, stu.stopId,
                      stu.arrival.flatMap(_.delay), stu.departure.flatMap(_.delay))
                  }
              }
            }
        }
      })
  }

  /** The `records` table (FIXTURES.md §3) from decoded RT rows + schedule:
    *
    *  - J1: broadcast join against schedule trips (unmatched trip_id rows are
    *    dropped, per_schedule_importer.rs:161-162 error path);
    *  - J2: equi-join stop_times on (trip_id, stop_sequence) for the stop's
    *    schedule position (unmatched stop_sequence dropped, :386-393);
    *  - F4: keep rows with at least one delay;
    *  - W2: last-writer-wins on the upsert key, newest time_of_recording
    *    (per_schedule_importer.rs:406-421).
    *
    * The schedule side is broadcast — it is KBs-to-MBs vs. a records stream
    * that grows unboundedly, so the join never shuffles the big side.
    */
  def recordsFromRt(spark: SparkSession, rt: Dataset[RtRow],
                    schedule: GtfsSchedule, source: String,
                    dedupe: Boolean = true,
                    scheduleFileName: Option[String] = None): DataFrame = {
    val trips = schedule.trips.select(
      col("trip_id"), col("route_id"), col("route_variant"))
    val stopTimes = schedule.stopTimes.select(
      col("trip_id"), col("stop_sequence"), col("stop_id"),
      col("stop_index"), col("stop_count"), col("arrival_secs"), col("departure_secs"))

    val joined = rt.toDF()
      .join(broadcast(trips), Seq("trip_id"))
      .join(broadcast(stopTimes), Seq("trip_id", "stop_sequence"))
      // try_to_timestamp: a malformed feed date must skip the entity, not
      // throw through the whole job under ANSI
      .withColumn("trip_start_date",
        to_date(try_to_timestamp(col("start_date"), lit("yyyyMMdd"))))
      .withColumn("trip_start_time", GtfsTime.parseGtfsTimeCol(col("start_time")))
      // the reference requires a parseable start_date AND start_time in the
      // trip descriptor (gtfs_time.rs:27-33) — the error skips the entity at
      // per_schedule_importer.rs:158. Null dates would also conflate every
      // service day of a trip into one W2 last-writer-wins group.
      .filter(col("trip_start_date").isNotNull && col("trip_start_time").isNotNull)
      .filter(col("delay_arrival").isNotNull || col("delay_departure").isNotNull)

    val upsertKey = Seq("source", "route_id", "route_variant", "trip_id",
      "trip_start_date", "trip_start_time", "stop_sequence")
    val w = Window.partitionBy(upsertKey.map(col): _*)
      .orderBy(col("time_of_recording").desc)

    val withMeta = joined
      .withColumn("source", lit(source))
      .withColumn("schedule_file_name",
        lit(scheduleFileName.getOrElse(source + "_schedule")))
    // W2 last-writer-wins: a window on the batch path; the streaming path
    // (no windows on streaming DFs) defers it to the upsert/state layer.
    val deduped =
      if (dedupe) withMeta.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      else withMeta

    deduped
      .select(col("source"), col("route_id"), col("route_variant"),
        col("trip_id"), col("trip_start_date"), col("trip_start_time"),
        col("stop_sequence").cast("int").as("stop_sequence"), col("stop_id"),
        col("stop_index"), col("stop_count"), col("arrival_secs"), col("departure_secs"),
        timestamp_seconds(col("time_of_recording")).as("time_of_recording"),
        col("delay_arrival"), col("delay_departure"),
        col("schedule_file_name"))
  }

  /** One-call batch import: read a directory of .pb files, decode, join the
    * schedule, produce `records`. Directory-to-schedule matching (J6/S4) and
    * streaming live in graft.streaming. */
  def importDirectory(spark: SparkSession, rtDir: String,
                      schedule: GtfsSchedule, source: String): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pb").load(rtDir)
    recordsFromRt(spark, decodeRtFiles(spark, bin), schedule, source)
  }
}
