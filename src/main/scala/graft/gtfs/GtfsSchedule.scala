package graft.gtfs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** GTFS static schedule loaded from a directory of CSV files (S1), with the
  * derived columns the engine keys on (SURVEY.md §1.4):
  *
  *   - `stop_index` / `stop_count` per trip (dense position, not the raw
  *     stop_sequence, which may have holes),
  *   - `route_section` Beginning/Middle/End,
  *   - parsed `arrival_secs`/`departure_secs` (may exceed 86400),
  *   - per-trip `trip_start_time` (first stop's departure,
  *     per_schedule_importer.rs:164),
  *   - **`route_variant`**: a stable id per (route_id, ordered stop_id list)
  *     — the reference gets this from a forked gtfs-structures crate
  *     (Cargo.toml:19); here it is derived as xxhash64 over the route and the
  *     ordered stop list, which is deterministic across runs and clusters.
  *
  * Everything is a plain DataFrame; the schedule is small relative to the
  * observation stream, so callers broadcast these in joins (J1/J2).
  */
final case class GtfsSchedule(
    agency: DataFrame,
    stops: DataFrame,
    routes: DataFrame,
    trips: DataFrame,       // + route_variant, trip_start_time, route_type
    stopTimes: DataFrame,   // + stop_index, stop_count, route_section, *_secs
    calendar: DataFrame,
    calendarDates: DataFrame) {

  /** Release the S2 cache (the persisted trips/stopTimes derivations) —
    * for callers that load many schedule versions in one session
    * (importTree over months of feeds) and are done with this one. */
  def unpersist(): Unit = { trips.unpersist(); stopTimes.unpersist() }

  /** Trips of one route variant share an identical stop list; this picks the
    * representative stop list per variant (J9: groupBy + first). */
  def variantStops: DataFrame =
    stopTimes
      .join(trips.select("trip_id", "route_id", "route_variant"), "trip_id")
      .groupBy("route_id", "route_variant", "stop_index")
      .agg(first("stop_id").as("stop_id"),
        first("route_section").as("route_section"),
        first("stop_count").as("stop_count"))
}

object GtfsSchedule {

  private def csv(spark: SparkSession, dir: String, name: String, schema: StructType): DataFrame = {
    // Hadoop-FS existence probe, not java.io.File: `dir` may carry a scheme
    // (ScheduleCache lists versions via the FileSystem API, and production
    // schedules live on hdfs://-like stores where a local File check would
    // silently read EVERY optional table as absent-empty).
    val path = new org.apache.hadoop.fs.Path(dir, s"$name.txt")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.option("header", "true").schema(schema).csv(path.toString)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private val agencySchema = StructType(Seq(
    StructField("agency_id", StringType), StructField("agency_name", StringType)))
  private val stopsSchema = StructType(Seq(
    StructField("stop_id", StringType), StructField("stop_name", StringType),
    StructField("stop_lat", DoubleType), StructField("stop_lon", DoubleType)))
  private val routesSchema = StructType(Seq(
    StructField("route_id", StringType), StructField("agency_id", StringType),
    StructField("route_short_name", StringType), StructField("route_type", IntegerType)))
  private val tripsSchema = StructType(Seq(
    StructField("trip_id", StringType), StructField("route_id", StringType),
    StructField("service_id", StringType), StructField("trip_headsign", StringType)))
  private val stopTimesSchema = StructType(Seq(
    StructField("trip_id", StringType), StructField("stop_sequence", IntegerType),
    StructField("stop_id", StringType), StructField("arrival_time", StringType),
    StructField("departure_time", StringType)))
  private val calendarSchema = StructType(Seq(
    StructField("service_id", StringType),
    StructField("monday", IntegerType), StructField("tuesday", IntegerType),
    StructField("wednesday", IntegerType), StructField("thursday", IntegerType),
    StructField("friday", IntegerType), StructField("saturday", IntegerType),
    StructField("sunday", IntegerType),
    StructField("start_date", StringType), StructField("end_date", StringType)))
  private val calendarDatesSchema = StructType(Seq(
    StructField("service_id", StringType), StructField("date", StringType),
    StructField("exception_type", IntegerType)))

  def load(spark: SparkSession, dir: String): GtfsSchedule = {
    val agency = csv(spark, dir, "agency", agencySchema)
    val stops = csv(spark, dir, "stops", stopsSchema)
    val routes = csv(spark, dir, "routes", routesSchema)
    val tripsRaw = csv(spark, dir, "trips", tripsSchema)
    val stRaw = csv(spark, dir, "stop_times", stopTimesSchema)
    val calendar = csv(spark, dir, "calendar", calendarSchema)
    val calendarDates = csv(spark, dir, "calendar_dates", calendarDatesSchema)

    val perTrip = Window.partitionBy("trip_id")
    val perTripOrdered = perTrip.orderBy("stop_sequence")
    val stopTimes = stRaw
      .withColumn("arrival_secs", GtfsTime.parseGtfsTimeCol(col("arrival_time")))
      .withColumn("departure_secs", GtfsTime.parseGtfsTimeCol(col("departure_time")))
      .withColumn("stop_index", row_number().over(perTripOrdered) - 1)
      .withColumn("stop_count", count(lit(1)).over(perTrip))
      .withColumn("route_section",
        RouteSections.sectionCol(col("stop_index"), col("stop_count")))

    // route_variant: stable hash of (route_id, ordered stop_id list).
    // sort_array on (stop_sequence, stop_id) structs gives the canonical
    // order without a second shuffle; one aggregation per trip, then the
    // variant id is a pure hash — deterministic on any cluster layout.
    val tripVariant = stopTimes
      .groupBy("trip_id")
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("stop_index"), col("stop_id")))),
          s => s.getField("stop_id")), "\u0001").as("stop_ids_key"),
        min(when(col("stop_index") === 0, col("departure_secs"))).as("trip_start_time"))

    val trips = tripsRaw
      .join(tripVariant, Seq("trip_id"), "left")
      .withColumn("route_variant",
        pmod(xxhash64(col("route_id"), col("stop_ids_key")), lit(Long.MaxValue)))
      .drop("stop_ids_key")
      .join(routes.select("route_id", "route_type"), Seq("route_id"), "left")

    // S2 schedule cache (src/main.rs:321-393 → df.persist()): the derived
    // tables are re-referenced by every micro-batch / per-query plan; without
    // persist each reference re-reads the CSVs and re-runs the window +
    // groupBy derivations.
    GtfsSchedule(agency, stops, routes, trips.persist(), stopTimes.persist(),
      calendar, calendarDates)
  }
}
