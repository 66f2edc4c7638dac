package graft.gtfs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.curves.{CPoint, Curves}

/** Result of a prediction lookup (reference `PredictionResult`,
  * /root/reference/src/types/prediction_result.rs). Either a single curve or
  * a whole curve set (when no initial delay is known). */
sealed trait PredictionResult {
  def precisionType: Int
  def sampleSize: Int
}
final case class CurvePrediction(curve: Array[CPoint], precisionType: Int,
                                 sampleSize: Int) extends PredictionResult
final case class CurveSetPrediction(set: Array[(Float, Array[CPoint])],
                                    precisionType: Int, sampleSize: Int) extends PredictionResult

/** Hierarchical prediction lookup (SURVEY.md §3.3): specific curve-set →
  * DEFAULT-slot curve-set → general per-stop curve → default-curve grid
  * (General/FallbackGeneral/SuperGeneral baked in at build time).
  *
  * The statistics tables are kilobyte-to-megabyte scale (SURVEY.md §4), so
  * the point-query API holds them in driver maps; [[Predictor.batchPredict]]
  * is the join form used for bulk schedule predictions (ST4 analogue).
  */
final class Predictor(
    specific: Array[SpecificCurveRow],
    defaults: Array[DefaultCurveRow]) {
  import Codes._

  private val generalByKey: Map[(Long, Int, Int, Int), SpecificCurveRow] =
    specific.filter(_.curve_kind == "general")
      .map(r => (r.route_variant, r.event_type, r.time_slot_id, r.end_stop_index) -> r)
      .toMap

  private val curveSets: Map[(Long, Int, Int, Int, Int), Array[SpecificCurveRow]] =
    specific.filter(_.curve_kind == "curveset")
      .groupBy(r => (r.route_variant, r.event_type, r.time_slot_id,
        r.start_stop_index, r.end_stop_index))

  private val defaultByKey: Map[(Int, String, Int, Int), DefaultCurveRow] =
    defaults.map(r => (r.route_type, r.route_section, r.time_slot_id, r.event_type) -> r).toMap

  /** predictor/mod.rs:270-335 `predict_specific`. */
  def predictSpecific(variant: Long, start: Option[(Int, Option[Int])],
                      endIdx: Int, slotId: Int, et: Int): Option[PredictionResult] =
    start match {
      case None =>
        generalByKey.get((variant, et, slotId, endIdx))
          .map(r => CurvePrediction(r.curve.toArray, r.precision_type, r.sample_size))
      case Some((startIdx, delayDep)) =>
        curveSets.get((variant, et, slotId, startIdx, endIdx)) match {
          case None if slotId != DefaultTimeSlot =>
            predictSpecific(variant, start, endIdx, DefaultTimeSlot, et)
          case None => None
          case Some(rows) =>
            val set = rows.sortBy(_.focus_delay.getOrElse(0f))
              .map(r => (r.focus_delay.getOrElse(0f), r.curve.toArray))
            val sample = rows.head.sample_size
            delayDep match {
              case None => Some(CurveSetPrediction(set, rows.head.precision_type, sample))
              case Some(d) =>
                val curve = Curves.curveSetInterpolate(set.toSeq, d.toFloat)
                val precision = if (slotId == DefaultTimeSlot) PrecisionFallbackSpecific
                                else PrecisionSpecific
                Some(CurvePrediction(curve, precision, sample))
            }
        }
    }

  /** predictor/mod.rs:242-267 `predict_default` — the grid always has a row
    * (every cell filled at build time, CurveAnalysis.defaultCurves). */
  def predictDefault(routeType: Int, section: String, slotId: Int, et: Int): Option[PredictionResult] = {
    val slot = if (slotId == DefaultTimeSlot) 1 else slotId // grid has slots 1..11
    defaultByKey.get((routeType, section, slot, et))
      .map(r => CurvePrediction(r.curve.toArray, r.precision_type, r.sample_size))
  }

  /** predictor/mod.rs:178-239 `predict`: specific with fallback to default. */
  def predict(variant: Long, routeType: Int, start: Option[(Int, Option[Int])],
              endIdx: Int, section: String, slotId: Int, et: Int): Option[PredictionResult] =
    predictSpecific(variant, start, endIdx, slotId, et)
      .orElse(predictDefault(routeType, section, slotId, et))
}

object Predictor {
  import Codes._

  def fromTables(spark: SparkSession, specific: Dataset[SpecificCurveRow],
                 defaults: Dataset[DefaultCurveRow]): Predictor =
    new Predictor(specific.collect(), defaults.collect())

  /** Bulk schedule-based predictions (the idle-backfill capability, ST4 /
    * scheduled_predictions_importer.rs): for every (trip, stop, event type)
    * of a service day, attach the most specific curve via JOINs — the
    * curve tables are broadcast, the schedule side stays partitioned, so
    * this scales to any number of trips without a driver loop.
    */
  def batchPredict(spark: SparkSession, schedule: GtfsSchedule,
                   serviceDate: String, source: String,
                   specific: Dataset[SpecificCurveRow],
                   defaults: Dataset[DefaultCurveRow]): DataFrame = {
    import spark.implicits._

    val base = schedule.stopTimes
      .join(schedule.trips.select("trip_id", "route_id", "route_variant",
        "route_type", "trip_start_time"), "trip_id")
      .withColumn("trip_start_date", to_date(lit(serviceDate), "yyyy-MM-dd"))
      .flatMap { r =>
        val arr = if (r.isNullAt(r.fieldIndex("arrival_secs"))) None
                  else Some((EventArrival, r.getAs[Int]("arrival_secs")))
        val dep = if (r.isNullAt(r.fieldIndex("departure_secs"))) None
                  else Some((EventDeparture, r.getAs[Int]("departure_secs")))
        (arr.toSeq ++ dep.toSeq).map { case (et, secs) =>
          (r.getAs[String]("trip_id"), r.getAs[String]("route_id"),
            r.getAs[Long]("route_variant"),
            Option(r.getAs[Integer]("route_type")).map(_.toInt).getOrElse(3),
            r.getAs[Int]("stop_sequence"), r.getAs[String]("stop_id"),
            r.getAs[Int]("stop_index"), r.getAs[Long]("stop_count").toInt,
            Option(r.getAs[Integer]("trip_start_time")).map(_.toInt).getOrElse(0),
            java.sql.Date.valueOf(serviceDate), et, secs)
        }
      }
      .toDF("trip_id", "route_id", "route_variant", "route_type",
        "stop_sequence", "stop_id", "stop_index", "stop_count",
        "trip_start_time", "trip_start_date", "event_type", "event_secs")
      .withColumn("scheduled_ts",
        GtfsTime.dateAndTime(col("trip_start_date"), col("event_secs")))
      .withColumn("time_slot_id", TimeSlots.slotIdCol(col("scheduled_ts")))
      .withColumn("route_section",
        RouteSections.sectionCol(col("stop_index"), col("stop_count")))

    val gen = specific.filter(_.curve_kind == "general").toDF()
      .select(col("route_variant"), col("event_type"), col("time_slot_id"),
        col("end_stop_index").as("stop_index"),
        col("curve").as("g_curve"), col("precision_type").as("g_precision"),
        col("sample_size").as("g_sample"))
    val dft = defaults.toDF()
      .select(col("route_type"), col("route_section"),
        col("time_slot_id").as("d_slot"), col("event_type"),
        col("curve").as("d_curve"), col("precision_type").as("d_precision"),
        col("sample_size").as("d_sample"))

    val joined = base
      .join(broadcast(gen),
        Seq("route_variant", "event_type", "time_slot_id", "stop_index"), "left")
      .join(broadcast(dft),
        base("route_type") === dft("route_type")
          && base("route_section") === dft("route_section")
          && col("d_slot") === when(col("time_slot_id") === DefaultTimeSlot, 1)
            .otherwise(col("time_slot_id"))
          && base("event_type") === dft("event_type"), "left")
      .drop(dft("route_type")).drop(dft("route_section")).drop(dft("event_type"))
      .withColumn("prediction_curve", coalesce(col("g_curve"), col("d_curve")))
      .withColumn("precision_type", coalesce(col("g_precision"), col("d_precision")))
      .withColumn("sample_size", coalesce(col("g_sample"), col("d_sample")))
      .filter(col("prediction_curve").isNotNull)

    // curve min/max anchored at the scheduled time (per_schedule_importer.rs:345-346)
    joined
      .withColumn("curve_min_secs", element_at(col("prediction_curve"), 1).getField("x"))
      .withColumn("curve_max_secs", element_at(col("prediction_curve"), -1).getField("x"))
      .withColumn("prediction_min",
        col("scheduled_ts") + make_dt_interval(lit(0), lit(0), lit(0),
          col("curve_min_secs").cast("decimal(18,6)")))
      .withColumn("prediction_max",
        col("scheduled_ts") + make_dt_interval(lit(0), lit(0), lit(0),
          col("curve_max_secs").cast("decimal(18,6)")))
      .select(
        lit(source).as("source"), col("event_type"), col("stop_id"),
        col("prediction_min"), col("prediction_max"),
        col("route_id"), col("trip_id"), col("trip_start_date"),
        col("trip_start_time"), col("stop_sequence"),
        col("precision_type"), lit(OriginSchedule).as("origin_type"),
        col("sample_size"), col("prediction_curve"),
        lit(source + "_schedule").as("schedule_file_name"))
  }
}
