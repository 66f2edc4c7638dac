package graft.gtfs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.curves.{CPoint, Curves}

/** The passenger-information query layer (SURVEY.md §2 monitor rows): the
  * DataFrame queries behind the reference's web pages — the HTML/PNG
  * rendering itself is out of engine scope (S18), but every filter, window
  * and composition the pages need is here.
  */
object Monitor {

  /** Curve-evaluation UDFs over the stored `array<struct<x,y>>` columns.
    * (A UDF is acceptable here: these run on the kilobyte-scale curve
    * tables, never on the observation stream.) */
  private def toCurve(points: Seq[org.apache.spark.sql.Row]): Array[CPoint] =
    points.map(r => CPoint(r.getFloat(0), r.getFloat(1))).toArray

  val curveXAtY = udf { (points: Seq[org.apache.spark.sql.Row], y: Double) =>
    Curves.xAtY(toCurve(points), y.toFloat).toDouble
  }

  val curvePercentiles = udf { (points: Seq[org.apache.spark.sql.Row]) =>
    Curves.percentiles(toCurve(points)).map(_.toDouble)
  }

  /** W8: percentile columns (delay_1 … delay_99) from stored curves
    * (prediction_result.rs:40-47). */
  def withPercentiles(predictions: DataFrame): DataFrame =
    predictions
      .withColumn("ps", curvePercentiles(col("prediction_curve")))
      // one eager op for the seven extracts (each withColumn re-analyzes
      // the whole tree; the logical plan is identical). ListMap: column
      // ORDER in the schema follows the map's iteration order, and a
      // >4-entry immutable.Map hashes it away
      .withColumns(scala.collection.immutable.ListMap(
        "delay_1" -> element_at(col("ps"), 1),
        "delay_5" -> element_at(col("ps"), 2),
        "delay_25" -> element_at(col("ps"), 3),
        "delay_50" -> element_at(col("ps"), 4),
        "delay_75" -> element_at(col("ps"), 5),
        "delay_95" -> element_at(col("ps"), 6),
        "delay_99" -> element_at(col("ps"), 7)))
      .drop("ps")

  /** The stop page (monitor/mod.rs:426-591): departures at a stop within a
    * time window —
    *  - F5: interval overlap with the page window (S9 scan shape);
    *  - W6: among predictions for the same (route, vehicle), prefer
    *    realtime-origin over schedule-origin rows;
    *  - F7: drop the trip's final stop (nothing departs);
    *  - F6: keep rows whose 5%/95% quantile instants fall inside the window;
    *  - W5: sort by the median (50%) quantile instant;
    *  - X12/X13: display formatting (delay as "+n", route-type label). */
  def stopPage(spark: SparkSession, predictions: DataFrame, schedule: GtfsSchedule,
               stopId: String, windowStart: String, windowEnd: String): DataFrame =
    stopPageFiltered(spark, predictions.filter(col("stop_id") === stopId),
      schedule, windowStart, windowEnd)

  /** The extended stop set behind a page (journey_data.rs:229-264): every
    * stop sharing the name, plus every stop within `maxDistM` (300 m,
    * EXTENDED_STOPS_MAX_DISTANCE) of one of them — the platform group the
    * reference queries departures across. The named side is a handful of
    * platforms → broadcast against one pass over the stops table; returns
    * (stop_id, dist_m to the closest named platform). */
  def extendedStops(spark: SparkSession, stops: DataFrame, stopName: String,
                    maxDistM: Double = 300.0): DataFrame = {
    val named = stops.filter(col("stop_name") === stopName) // F12
      .select(col("stop_lat").as("a_lat"), col("stop_lon").as("a_lon"))
    stops.select(col("stop_id"), col("stop_lat"), col("stop_lon"))
      .crossJoin(broadcast(named))
      .withColumn("dist_m", Geo.haversineMeters(col("a_lat"), col("a_lon"),
        col("stop_lat"), col("stop_lon")))
      .filter(col("dist_m") < maxDistM)
      .groupBy("stop_id").agg(min("dist_m").as("dist_m"))
  }

  /** Stop page for a stop NAME: departures across the whole extended
    * platform group, as the reference's page does
    * (monitor/mod.rs:450-452 loops extended_stop_ids). */
  def stopPageByName(spark: SparkSession, predictions: DataFrame,
                     schedule: GtfsSchedule, stopName: String,
                     windowStart: String, windowEnd: String,
                     maxDistM: Double = 300.0,
                     keep: Seq[String] = Nil): DataFrame = {
    val ext = extendedStops(spark, schedule.stops, stopName, maxDistM)
      .select("stop_id")
    stopPageFiltered(spark,
      predictions.join(broadcast(ext), Seq("stop_id"), "left_semi"),
      schedule, windowStart, windowEnd, keep)
  }

  /** Stop page in a JOURNEY context (write_stop_time_output,
    * monitor/mod.rs:866-890): the traveller arrives with `arrivalCurve`
    * (anchored at `arrivalAnchorEpoch`), walks to each platform of the
    * group (distance from [[extendedStops]]), and each departure row gets
    * its local transfer probability — X10 convolution with the X9 walk
    * curve, then X11 — with rows under 5 % suppressed (F8). */
  def stopPageWithArrival(spark: SparkSession, predictions: DataFrame,
                          schedule: GtfsSchedule, stopName: String,
                          windowStart: String, windowEnd: String,
                          arrivalCurve: Array[CPoint], arrivalAnchorEpoch: Double,
                          maxDistM: Double = 300.0): DataFrame = {
    val ext = extendedStops(spark, schedule.stops, stopName, maxDistM)
    val withDist = predictions.join(broadcast(ext), Seq("stop_id"))
    val page = stopPageFiltered(spark, withDist, schedule, windowStart, windowEnd,
      keep = Seq("dist_m", "prediction_min", "prediction_curve"))
    val transferProb = udf { (points: Seq[org.apache.spark.sql.Row],
                              minEpoch: Double, dist: Double) =>
      val dep = toCurve(points)
      val depAnchor = minEpoch - dep.head.x
      val arrWalk = Curves.convolve(arrivalCurve, Curves.walkTimeCurve(dist.toFloat))
      Curves.transferProbability(arrWalk, arrivalAnchorEpoch, dep, depAnchor)
    }
    page
      .withColumn("transfer_prob", round(transferProb(col("prediction_curve"),
        unix_timestamp(col("prediction_min")).cast("double"), col("dist_m")), 4))
      .filter(col("transfer_prob") >= 0.05) // F8
      .drop("prediction_min", "prediction_curve")
      .withColumn("dist_m", round(col("dist_m"), 1))
  }

  // (trip → last stop_sequence) is STATIC per schedule version, and every
  // stop-page request re-aggregated it from stopTimes — S2-schedule-cache
  // parity (the reference's FileCache holds per-schedule derived data):
  // materialized once per (session, schedule), one broadcast-sized row per
  // trip. Stopped sessions purged; hot-reload builds a new GtfsSchedule, so
  // a key never aliases changed data and stale entries are bounded by the
  // handful of versions a session loads.
  private val lastStopsMemo = scala.collection.concurrent.TrieMap[
    (SparkSession, GtfsSchedule), DataFrame]()
  private def lastStopsOf(spark: SparkSession,
                          schedule: GtfsSchedule): DataFrame = {
    lastStopsMemo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    lastStopsMemo.getOrElseUpdate((spark, schedule),
      schedule.stopTimes
        .groupBy("trip_id").agg(max("stop_sequence").as("last_seq"))
        .localCheckpoint())
  }

  private def stopPageFiltered(spark: SparkSession, predictions: DataFrame,
                               schedule: GtfsSchedule, windowStart: String,
                               windowEnd: String, keep: Seq[String] = Nil): DataFrame = {
    val ws = to_timestamp(lit(windowStart))
    val we = to_timestamp(lit(windowEnd))

    val lastStops = lastStopsOf(spark, schedule)

    val overlap = predictions
      .filter(col("event_type") === Codes.EventDeparture)
      .filter(col("prediction_min") < we && col("prediction_max") > ws) // F5

    // Quantile instants = scheduled anchor + x_at_y(p) (monitor/mod.rs
    // get_absolute_time_for_probability). prediction_min is anchored at the
    // curve's min-x point, so the scheduled instant is recovered as
    // prediction_min - curve[0].x — NOT via delay_X - delay_1, whose delay_1
    // (= x at y=0.01) sits above the min-x outlier and would shift every
    // timestamp earlier.
    val withQ = withPercentiles(overlap)
      .withColumn("sched_anchor", col("prediction_min") - make_dt_interval(lit(0), lit(0), lit(0),
        element_at(col("prediction_curve"), 1).getField("x").cast("decimal(18,6)")))
      .withColumns(Map(
        "q5_ts" -> (col("sched_anchor") + make_dt_interval(lit(0), lit(0), lit(0),
          col("delay_5").cast("decimal(18,6)"))),
        "median_ts" -> (col("sched_anchor") + make_dt_interval(lit(0), lit(0), lit(0),
          col("delay_50").cast("decimal(18,6)"))),
        "q95_ts" -> (col("sched_anchor") + make_dt_interval(lit(0), lit(0), lit(0),
          col("delay_95").cast("decimal(18,6)")))))
      .filter(col("q5_ts") < we && col("q95_ts") > ws) // F6 — before W6, as the
      // reference trims the window first (monitor/mod.rs:460-493); otherwise a
      // realtime row later removed by F6 still suppresses its schedule twin

    val realtimePreferred = withQ
      .withColumn("has_rt", max(col("origin_type") === Codes.OriginRealtime)
        .over(Window.partitionBy("route_id", "trip_start_date", "trip_start_time")))
      .filter(!col("has_rt") || col("origin_type") === Codes.OriginRealtime) // W6
      .drop("has_rt")

    val notLast = realtimePreferred
      .join(broadcast(lastStops), Seq("trip_id"), "left")
      .filter(col("stop_sequence") < col("last_seq")) // F7
      .drop("last_seq")

    val routeTypeLabel = typedLit(Map( // X13 (monitor/mod.rs:894-922 codes)
      0 -> "Tram", 1 -> "Subway", 2 -> "Rail", 3 -> "Bus", 4 -> "Ferry",
      5 -> "CableCar", 6 -> "Gondola", 7 -> "Funicular", 200 -> "Coach",
      1100 -> "Air", 1500 -> "Taxi"))

    notLast
      .join(broadcast(schedule.routes.select(col("route_id"), col("route_short_name"),
        col("route_type"))), Seq("route_id"), "left")
      .withColumns(Map( // X12 + X13 in one eager op
        "delay_label" -> format_string("%+d", col("delay_50").cast("int")),
        "route_type_label" ->
          coalesce(routeTypeLabel(col("route_type")), lit("?"))))
      .orderBy("median_ts", "trip_id") // W5
      .select((Seq("route_id", "route_short_name", "route_type_label", "trip_id",
        "stop_sequence", "median_ts", "delay_label", "precision_type",
        "origin_type", "sample_size") ++ keep).map(col): _*)
  }

  /** The trip page (monitor/mod.rs:690-795 `generate_trip_page`): for one
    * vehicle (trip id + start date/time) and a boarding stop, the departure
    * prediction at the boarding stop plus arrival predictions at every later
    * stop — each with scheduled instant and the 1%/50%/99% quantile instants
    * the page's [−/○/+] columns show (write_stop_time_output), stop names
    * joined from the schedule (F12), ordered by stop sequence. */
  def tripPage(spark: SparkSession, predictions: DataFrame, schedule: GtfsSchedule,
               tripId: String, tripStartDate: String, tripStartTime: Int,
               boardingStopSeq: Int): DataFrame = {
    val vehicle = predictions
      .filter(col("trip_id") === tripId
        && col("trip_start_date") === to_date(lit(tripStartDate), "yyyy-MM-dd")
        && col("trip_start_time") === tripStartTime)
      .filter((col("stop_sequence") === boardingStopSeq
          && col("event_type") === Codes.EventDeparture)
        || (col("stop_sequence") > boardingStopSeq
          && col("event_type") === Codes.EventArrival))

    val secs = (c: Column) => make_dt_interval(lit(0), lit(0), lit(0), c.cast("decimal(18,6)"))
    withPercentiles(vehicle)
      .withColumn("sched_ts", col("prediction_min") -
        secs(element_at(col("prediction_curve"), 1).getField("x")))
      .withColumns(Map( // one eager op for the three independent instants
        "q1_ts" -> (col("sched_ts") + secs(col("delay_1"))),
        "median_ts" -> (col("sched_ts") + secs(col("delay_50"))),
        "q99_ts" -> (col("sched_ts") + secs(col("delay_99")))))
      .join(broadcast(schedule.stops.select(col("stop_id"), col("stop_name"))),
        Seq("stop_id"), "left")
      .orderBy("stop_sequence", "event_type")
      .select("route_id", "trip_id", "stop_sequence", "event_type", "stop_name",
        "sched_ts", "q1_ts", "median_ts", "q99_ts",
        "precision_type", "origin_type", "sample_size")
  }

  /** One leg of a composed journey: ride a vehicle between two stop
    * sequences, or walk a known distance to the next stop. */
  sealed trait JourneyLeg
  final case class RideLeg(tripId: String, tripStartDate: String, tripStartTime: Int,
                           boardStopSeq: Int, alightStopSeq: Int) extends JourneyLeg
  final case class WalkLeg(distanceMeters: Float) extends JourneyLeg

  /** End-to-end journey composition (journey_data.rs:265-339, :420-470):
    * chain stop → trip → walk legs, carrying an absolute-anchored arrival
    * curve and a cumulative success probability —
    *  - start: ±30 s uniform curve anchored at `startEpoch`, probability 1
    *    (journey_data.rs:317-321);
    *  - ride: probability ×= X11 transfer probability from the current
    *    arrival curve to the leg's departure curve (journey_data.rs:445);
    *    the new arrival curve is the prediction at the alight stop;
    *  - walk: arrival curve = X10 convolution with the synthetic X9
    *    walk-time curve; probability carries over (journey_data.rs:300-310).
    *
    * Per-leg curve lookups collect SINGLE prediction rows (the reference
    * issues the same one-row queries per leg, journey_data.rs:487-493);
    * the returned frame has one row per component with the reach
    * probability and the 50% quantile instant. */
  /** One journey component's EXACT fold state (unrounded): the traveller's
    * relative-time curve and absolute anchor after the component, plus the
    * running reach probability. [[journey]] rounds these at its DataFrame
    * boundary; the serving layer consumes the last state directly — one
    * copy of the composition for both the oracled query and the HTTP
    * pages. */
  final case class JourneyState(idx: Int, kind: String, tripId: String,
                                prob: Double, curve: Array[CPoint], anchor: Double)

  /** The X10/X11 journey fold: start = ±30 s uniform curve at `startEpoch`
    * (journey_data.rs:317-321); a ride multiplies in the transfer
    * probability onto its boarding departure and replaces state with the
    * alighting arrival prediction; a walk convolves the X9 walk-time
    * curve. */
  def journeyStates(predictions: DataFrame, startEpoch: Double,
                    legs: Seq[JourneyLeg]): Seq[JourneyState] = {

    def predictionAt(tripId: String, date: String, startTime: Int, stopSeq: Int,
                     et: Int): (Array[CPoint], Double) = {
      val rows = predictions
        .filter(col("trip_id") === tripId
          && col("trip_start_date") === to_date(lit(date), "yyyy-MM-dd")
          && col("trip_start_time") === startTime
          && col("stop_sequence") === stopSeq && col("event_type") === et)
        .select(unix_timestamp(col("prediction_min")).cast("double").as("min_epoch"),
          col("prediction_curve"))
        .collect()
      require(rows.nonEmpty, s"no prediction for $tripId seq $stopSeq et $et")
      val r = rows.head
      val curve = toCurve(r.getSeq[org.apache.spark.sql.Row](1))
      // prediction_min sits at the curve's min-x point → scheduled anchor
      val anchor = r.getDouble(0) - curve.head.x
      (curve, anchor)
    }

    var curve: Array[CPoint] = Array(CPoint(-30f, 0f), CPoint(30f, 1f))
    var anchor: Double = startEpoch
    // double like the oracle's product of (1 - miss) terms — see
    // Curves.transferProbability
    var prob: Double = 1.0
    val out = Seq.newBuilder[JourneyState]
    out += JourneyState(0, "start", "", 1.0, curve, anchor)
    legs.zipWithIndex.foreach {
      case (RideLeg(tripId, date, startTime, board, alight), i) =>
        val (depCurve, depAnchor) =
          predictionAt(tripId, date, startTime, board, Codes.EventDeparture)
        prob *= Curves.transferProbability(curve, anchor, depCurve, depAnchor)
        val (arrCurve, arrAnchor) =
          predictionAt(tripId, date, startTime, alight, Codes.EventArrival)
        curve = arrCurve; anchor = arrAnchor
        out += JourneyState(i + 1, "ride", tripId, prob, curve, anchor)
      case (WalkLeg(dist), i) =>
        curve = Curves.convolve(curve, Curves.walkTimeCurve(dist))
        out += JourneyState(i + 1, "walk", "", prob, curve, anchor)
    }
    out.result()
  }

  def journey(spark: SparkSession, predictions: DataFrame, schedule: GtfsSchedule,
              startEpoch: Double, legs: Seq[JourneyLeg]): DataFrame = {
    import spark.implicits._
    // each row also carries the component's current relative-time curve —
    // the journey QUERY drops it, but the oracle aux dump explodes it so the
    // DuckDB reconstruction can replay the walk convolution's consumers
    // (median + next transfer) without re-running the X10 recursion
    journeyStates(predictions, startEpoch, legs)
      .map(s => (s.idx, s.kind, s.tripId,
        (math.rint(s.prob * 10000) / 10000).toDouble,
        s.anchor, s.anchor + Curves.xAtY(s.curve, 0.5f), s.curve.toSeq))
      .toDF("component_idx", "kind", "trip_id", "reach_prob",
        "anchor_epoch", "median_epoch", "curve")
      .withColumn("anchor_epoch", round(col("anchor_epoch"), 2))
      .withColumn("median_epoch", round(col("median_epoch"), 2))
      .orderBy("component_idx")
  }

  /** F11: stop-name autocomplete — names containing every query term,
    * distinct, sorted, top 10 (monitor/mod.rs:202-224). */
  def autocomplete(stops: DataFrame, terms: Seq[String]): DataFrame = {
    val cond = terms.map(t => lower(col("stop_name")).contains(t.toLowerCase))
      .reduceOption(_ && _).getOrElse(lit(true))
    stops.filter(cond).select("stop_name").distinct().orderBy("stop_name").limit(10)
  }

  /** J8: trip resolution by descriptor (journey_data.rs:382-473): headsign +
    * route short name + route type + departure time at a named stop, with the
    * service date allowed to shift ±1 day (25 h+ start times). */
  def resolveTrip(schedule: GtfsSchedule, headsign: String, routeShortName: String,
                  routeType: Int, stopName: String, departureSecs: Int): DataFrame = {
    val stopIds = schedule.stops.filter(col("stop_name") === stopName) // F12
      .select(col("stop_id"))
    schedule.trips
      .filter(col("trip_headsign") === headsign && col("route_type") === routeType)
      .join(schedule.routes.filter(col("route_short_name") === routeShortName)
        .select("route_id"), Seq("route_id"))
      .join(schedule.stopTimes, Seq("trip_id"))
      .join(broadcast(stopIds), Seq("stop_id"))
      .filter(abs(col("departure_secs") - departureSecs) % 86400 === 0)
      .select("trip_id", "route_id", "route_variant", "stop_sequence", "departure_secs")
  }

  /** J10: variant subsumption — variants whose stop list is a contiguous
    * subsequence (forward or reversed) of the longest variant's list
    * (visual_schedule.rs:236-277). Variant lists are tiny → driver-side
    * matching over the collected per-route lists, as the reference does. */
  def subsumedVariants(spark: SparkSession, schedule: GtfsSchedule, routeId: String): Seq[(Long, Long)] = {
    val variants = schedule.variantStops
      .filter(col("route_id") === routeId)
      .orderBy("route_variant", "stop_index")
      .select("route_variant", "stop_id")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (v, rows) => v -> rows.map(_.getString(1)).toSeq }
      .toSeq
    if (variants.isEmpty) return Seq.empty // unknown/variant-less route
    def isSubTrip(sub: Seq[String], full: Seq[String]): Boolean =
      VisualSchedule.isSub(sub, full) || VisualSchedule.isSub(sub, full.reverse)
    val longest = variants.maxBy(_._2.length)
    variants.filter { case (v, stops) =>
      v != longest._1 && isSubTrip(stops, longest._2)
    }.map { case (v, _) => (v, longest._1) }
  }

  /** X9 + J7: synthetic walk-time curves between nearby platform pairs
    * (journey_data.rs:234-263, :558-594): haversine ≤ maxDistM via the
    * grid-bucket join, curve from the pure walk-time synthesis. */
  def walkCurves(spark: SparkSession, stops: DataFrame, maxDistM: Double = 300.0): DataFrame = {
    import spark.implicits._
    // The 3×3 neighborhood probe only sees every true pair when the cell is
    // at least maxDistM wide in DEGREES on both axes. A longitude degree
    // shrinks by cos(lat), so size the cell from the corpus's extreme
    // latitude (one scalar agg over the small stops table; |lat| clamped at
    // 85° so a junk polar coordinate can't zero the cosine). 111 km/degree
    // undershoots the true 111.32 km, inflating the cell slightly — safe.
    val latRow = stops.agg(max(abs(col("stop_lat")))).head()
    val maxAbsLat = (if (latRow.isNullAt(0)) 0.0 else latRow.getDouble(0)).min(85.0)
    val mPerDegLon = 111000.0 * math.cos(math.toRadians(maxAbsLat))
    val cell = math.max(maxDistM / 111000.0, maxDistM / mPerDegLon)
    val pts = stops.select(col("stop_id"), col("stop_lat"), col("stop_lon"))
      .withColumn("cx", floor(col("stop_lon") / cell))
      .withColumn("cy", floor(col("stop_lat") / cell))
    val probe = pts
      .withColumn("nx", explode(array(col("cx") - 1, col("cx"), col("cx") + 1)))
      .withColumn("ny", explode(array(col("cy") - 1, col("cy"), col("cy") + 1)))
      .select(col("stop_id").as("from_stop"), col("stop_lat").as("a_lat"),
        col("stop_lon").as("a_lon"), col("nx"), col("ny"))
    val build = pts.select(col("stop_id").as("to_stop"), col("stop_lat").as("b_lat"),
      col("stop_lon").as("b_lon"), col("cx").as("nx"), col("cy").as("ny"))
    val pairs = probe.join(build, Seq("nx", "ny"))
      .filter(col("from_stop") < col("to_stop"))
      .withColumn("dist_m", Geo.haversineMeters(col("a_lat"), col("a_lon"),
        col("b_lat"), col("b_lon")))
      .filter(col("dist_m") <= maxDistM)
      .select("from_stop", "to_stop", "dist_m")
    // returns Seq[CPoint] so the column is array<struct<x,y>> like every
    // other curve column (tuples would encode as _1/_2)
    val walkCurve = udf { (d: Double) => Curves.walkTimeCurve(d.toFloat).toSeq }
    pairs.withColumn("walk_curve", walkCurve(col("dist_m")))
  }

  /** X10 + X11: journey-leg composition — convolve an arrival curve with the
    * walk-time curve to the transfer stop, then the probability of catching a
    * departure curve (time_curve.rs:18-77). Driver-side curve math on two
    * prediction rows (the reference composes journeys one leg at a time). */
  def transferProbability(arrivalCurve: Array[CPoint], arrivalRefEpoch: Double,
                          walkDistanceM: Float,
                          departureCurve: Array[CPoint], departureRefEpoch: Double): Double = {
    val walk = Curves.walkTimeCurve(walkDistanceM)
    val arrivalPlusWalk = Curves.convolve(arrivalCurve, walk)
    Curves.transferProbability(arrivalPlusWalk, arrivalRefEpoch,
      departureCurve, departureRefEpoch)
  }
}
