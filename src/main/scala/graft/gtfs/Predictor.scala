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
    defaults: Array[DefaultCurveRow]) extends Serializable {
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
        // the reference's general_delay map is keyed by stop index only:
        // every slot pass overwrites the same key and DEFAULT runs last
        // (analyser/specific_curves.rs:276-285, TIME_SLOTS_WITH_DEFAULT
        // order), so the curve served at predictor/mod.rs:286-289 is always
        // the DEFAULT-slot (all-observations) one — never the request slot's
        generalByKey.get((variant, et, DefaultTimeSlot, endIdx))
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

/** One realtime prediction target: a (vehicle, later stop, event type) cell
  * with its observed basis and schedule context — the typed-row input of the
  * broadcast-lookup prediction path ([[Predictor.batchPredictRealtimeCached]]). */
private[gtfs] final case class RealtimeTarget(
    trip_id: String, trip_start_date: java.sql.Date, trip_start_time: Int,
    route_id: String, route_variant: Long, route_type: Option[Int],
    stop_sequence: Int, stop_id: String, stop_index: Int,
    basis_idx: Int, basis_delay: Int,
    scheduled_ts: java.sql.Timestamp, time_slot_id: Int, route_section: String,
    event_type: Int)

/** A resolved realtime prediction before the timestamp anchoring — the
  * typed-row output of the broadcast-lookup path; `anchorAndSelect` turns it
  * into the shared predictions schema. */
private[gtfs] final case class RealtimePredRow(
    trip_id: String, trip_start_date: java.sql.Date, trip_start_time: Int,
    route_id: String, stop_sequence: Int, stop_id: String, event_type: Int,
    scheduled_ts: java.sql.Timestamp, precision_type: Int, sample_size: Int,
    prediction_curve: Array[CPoint])

/** A statistics table exceeds the driver-map bound — the TYPED contract for
  * the broadcast-downgrade path: [[CurveCache.tryGet]] catches exactly this
  * (never a message substring) and falls back to the distributed join form.
  * Extends IllegalArgumentException so pre-existing callers that treated the
  * bound as a plain argument violation keep working. */
final class CurveStoreTooLargeException(message: String)
    extends IllegalArgumentException(message)

object Predictor {
  import Codes._

  /** Prediction rows store at most 120 curve points
    * (`serialize_compact_limited(120)`, per_schedule_importer.rs:362): when a
    * curve exceeds the cap, keep 120 evenly-index-spaced points including
    * both endpoints. Pure Catalyst (`transform`/`sequence`) — stays in
    * whole-stage codegen, no UDF. */
  val MaxCurvePoints = 120
  def capCurve(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // null-preserving: without the isNotNull gate, size(NULL) is NULL under
    // ANSI, the CASE falls to otherwise, and transform over a literal
    // sequence yields a NON-null array of 120 null structs — which would
    // slip a "no curve matched" row past downstream isNotNull drop filters
    when(c.isNotNull,
      when(size(c) <= MaxCurvePoints, c).otherwise(
        transform(sequence(lit(0), lit(MaxCurvePoints - 1)),
          i => element_at(c, (i * (size(c) - 1) / (MaxCurvePoints - 1) + 1).cast("int")))))

  /** JVM twin of [[capCurve]] for the broadcast-lookup path — same
    * evenly-index-spaced 120-point selection, same integer arithmetic
    * (`i * (n-1) / 119`, 0-based), so the two paths are bit-identical. */
  def capCurveJvm(c: Array[CPoint]): Array[CPoint] =
    if (c.length <= MaxCurvePoints) c
    else Array.tabulate(MaxCurvePoints)(i =>
      c(i * (c.length - 1) / (MaxCurvePoints - 1)))

  /** Shared tail of every prediction producer: anchor the curve's min/max x
    * at the scheduled instant (per_schedule_importer.rs:345-346) and emit the
    * predictions-table schema. `scheduleFileName` is the reference's
    * per-row schedule provenance (scheduled_predictions_importer.rs:297:
    * `"schedule_file_name" => self.filename`) — the stale-schedule delete
    * and the per-version HWM recovery key on it after a schedule swap. */
  private def anchorAndSelect(df: DataFrame, source: String, originType: Int,
                              scheduleFileName: String): DataFrame =
    // ONE eager select (was 4 withColumn + select — five re-analyses of the
    // producer's full tree per invocation): the min/max helper columns are
    // used once each, so inlining them is exactly what CollapseProject did
    // to the old form — the optimized plan is identical
    df.select(
      lit(source).as("source"), col("event_type"), col("stop_id"),
      (col("scheduled_ts") + make_dt_interval(lit(0), lit(0), lit(0),
        element_at(col("prediction_curve"), 1).getField("x")
          .cast("decimal(18,6)"))).as("prediction_min"),
      (col("scheduled_ts") + make_dt_interval(lit(0), lit(0), lit(0),
        element_at(col("prediction_curve"), -1).getField("x")
          .cast("decimal(18,6)"))).as("prediction_max"),
      col("route_id"), col("trip_id"), col("trip_start_date"),
      col("trip_start_time"), col("stop_sequence"),
      col("precision_type"), lit(originType).as("origin_type"),
      col("sample_size"), col("prediction_curve"),
      lit(scheduleFileName).as("schedule_file_name"))

  /** Rows above this bound indicate the statistics tables are no longer
    * driver-map material — use [[batchPredict]]'s join form instead. The
    * reference's whole statistics tree is KB–MB (SURVEY §4); 2M rows ≈
    * hundreds of MB of curves, far past any sane point-query use. */
  val MaxDriverRows = 2000000

  private[gtfs] def guarded[T](rows: Array[T], what: String,
                               bound: Long = MaxDriverRows): Array[T] = {
    if (rows.length > bound)
      throw new CurveStoreTooLargeException(
        s"$what has ${rows.length} rows — over the driver-map bound $bound; " +
          "use Predictor.batchPredict (broadcast-join form) instead")
    rows
  }

  def fromTables(spark: SparkSession, specific: Dataset[SpecificCurveRow],
                 defaults: Dataset[DefaultCurveRow]): Predictor =
    new Predictor(guarded(specific.collect(), "specific_curves"),
      guarded(defaults.collect(), "default_curves"))

  /** Bulk schedule-based predictions (the idle-backfill capability, ST4 /
    * scheduled_predictions_importer.rs): for every (trip, stop, event type)
    * of a service day, attach the most specific curve via JOINs — the
    * curve tables are broadcast, the schedule side stays partitioned, so
    * this scales to any number of trips without a driver loop.
    */
  /** (trip × stop × event type) targets of a service day, with scheduled
    * instants, time slots and sections attached. Only trips whose service
    * actually RUNS on the date are targeted (`trips_for_date`,
    * scheduled_predictions_importer.rs:115); feeds without any calendar
    * data at all fall back to every trip. */
  // STRUCTURAL reuse per (session, schedule, date) — PLAN memoization only
  // (the Tables.t shape): a DataFrame holds no data, every action still
  // computes from the schedule tables; what the memo removes is the
  // per-invocation eager re-analysis of this ~10-op construction over the
  // schedule lineage plus the hasCalendar isEmpty probes (TimeQ phases:
  // construction was 0.40 s of gtfs_predictions_realtime's 0.53 s planMin).
  // The production refresh loop re-plans this subtree with an identical
  // (schedule, date) key every 5 s trigger, so the reuse is the serving
  // shape too, not bench geometry. Keys hold session/schedule references —
  // stopped sessions are purged like Tables.t; a GtfsSchedule is immutable
  // per load (hot-reload builds a new instance), so a key can never alias
  // changed data.
  private val targetsMemo = scala.collection.concurrent.TrieMap[
    (SparkSession, GtfsSchedule, String), DataFrame]()
  private def targetsForDate(spark: SparkSession, schedule: GtfsSchedule,
                             serviceDate: String): DataFrame = {
    targetsMemo.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
    targetsMemo.getOrElseUpdate((spark, schedule, serviceDate),
      buildTargetsForDate(spark, schedule, serviceDate))
  }

  private def buildTargetsForDate(spark: SparkSession, schedule: GtfsSchedule,
                                  serviceDate: String): DataFrame = {
    import spark.implicits._
    val hasCalendar = !schedule.calendar.isEmpty || !schedule.calendarDates.isEmpty
    val scoped =
      if (hasCalendar)
        schedule.stopTimes.join(broadcast(
          ServiceCalendar.tripsForDate(spark, schedule, serviceDate)
            .select("trip_id")), Seq("trip_id"), "left_semi")
      else schedule.stopTimes
    scoped
      .join(schedule.trips.select("trip_id", "route_id", "route_variant",
        "route_type", "trip_start_time"), "trip_id")
      // event fan-out as a Column explode (no typed flatMap): a national
      // schedule × every refresh date flows through here, so it stays in
      // whole-stage codegen like the curve-input prep
      // route_type stays null when routes.txt lacks the route: the reference
      // propagates the get_route error and produces NO default prediction for
      // such trips (predictor/mod.rs:219-221) — a null never equi-joins the
      // default grid, which reproduces exactly that
      .select(col("trip_id"), col("route_id"), col("route_variant"),
        col("route_type"),
        col("stop_sequence"), col("stop_id"), col("stop_index"),
        col("stop_count").cast("int").as("stop_count"),
        coalesce(col("trip_start_time"), lit(0)).as("trip_start_time"),
        to_date(lit(serviceDate), "yyyy-MM-dd").as("trip_start_date"),
        explode(array(
          struct(lit(EventArrival).as("event_type"),
            col("arrival_secs").as("event_secs")),
          struct(lit(EventDeparture).as("event_type"),
            col("departure_secs").as("event_secs")))).as("ev"))
      .filter(col("ev.event_secs").isNotNull)
      // withColumns over withColumn chains here and below: every eager
      // Dataset op re-analyzes the whole growing tree, so batching
      // independent columns into one op cuts the per-invocation
      // construction cost without changing the logical plan
      .withColumns(Map(
        "event_type" -> col("ev.event_type"),
        "event_secs" -> col("ev.event_secs")))
      .drop("ev")
      .withColumn("scheduled_ts",
        GtfsTime.dateAndTime(col("trip_start_date"), col("event_secs")))
      .withColumns(Map(
        "time_slot_id" -> TimeSlots.slotIdCol(col("scheduled_ts")),
        "route_section" ->
          RouteSections.sectionCol(col("stop_index"), col("stop_count"))))
  }

  def batchPredict(spark: SparkSession, schedule: GtfsSchedule,
                   serviceDate: String, source: String,
                   specific: Dataset[SpecificCurveRow],
                   defaults: Dataset[DefaultCurveRow],
                   scheduleFileName: Option[String] = None): DataFrame = {
    val base = targetsForDate(spark, schedule, serviceDate)

    // DEFAULT-slot general curves only: the reference serves the
    // all-observations curve for every request slot (general_delay is keyed
    // by stop index alone and the DEFAULT pass writes last —
    // analyser/specific_curves.rs:276-285)
    val gen = specific.filter(r =>
        r.curve_kind == "general" && r.time_slot_id == Codes.DefaultTimeSlot).toDF()
      .select(col("route_variant"), col("event_type"),
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
        Seq("route_variant", "event_type", "stop_index"), "left")
      .join(broadcast(dft),
        base("route_type") === dft("route_type")
          && base("route_section") === dft("route_section")
          && col("d_slot") === when(col("time_slot_id") === DefaultTimeSlot, 1)
            .otherwise(col("time_slot_id"))
          && base("event_type") === dft("event_type"), "left")
      .drop(dft("route_type")).drop(dft("route_section")).drop(dft("event_type"))
      .withColumn("prediction_curve", capCurve(coalesce(col("g_curve"), col("d_curve"))))
      .withColumn("precision_type", coalesce(col("g_precision"), col("d_precision")))
      .withColumn("sample_size", coalesce(col("g_sample"), col("d_sample")))
      .filter(col("prediction_curve").isNotNull)

    anchorAndSelect(joined, source, OriginSchedule,
      scheduleFileName.getOrElse(source + "_schedule"))
  }

  /** Realtime targets shared by the join and broadcast-lookup forms: every
    * (vehicle with an observed basis) × (later stop) × (event type), with the
    * basis columns attached. */
  private def realtimeTargets(spark: SparkSession, schedule: GtfsSchedule,
                              records: DataFrame, serviceDate: String): DataFrame = {
    // latest basis per vehicle (W3: top-1 by stop, then recency)
    val basisW = org.apache.spark.sql.expressions.Window
      .partitionBy("trip_id", "trip_start_date", "trip_start_time")
      .orderBy(col("stop_sequence").desc, col("time_of_recording").desc)
    val basis = records
      .filter(col("delay_departure").isNotNull
        && col("trip_start_date") === to_date(lit(serviceDate), "yyyy-MM-dd"))
      .withColumn("rn", row_number().over(basisW))
      .filter(col("rn") === 1)
      .select(col("trip_id"), col("trip_start_date"), col("trip_start_time"),
        col("stop_index").as("basis_idx"),
        col("delay_departure").as("basis_delay"))

    // join on (trip_id, date): the vehicle's trip_start_time comes from the
    // realtime feed and may differ by seconds from the schedule-derived
    // first-stop departure — the basis row carries the authoritative value
    targetsForDate(spark, schedule, serviceDate)
      .drop("trip_start_time")
      .join(basis, Seq("trip_id", "trip_start_date"))
      .filter(col("stop_index") > col("basis_idx"))
  }

  /** Realtime-conditioned batch prediction (SURVEY.md §3.1 step 5 /
    * per_schedule_importer.rs:320-366): for every vehicle with an observed
    * basis (latest stop with a departure delay), predict every LATER stop ×
    * event type through the conditional curve sets — the join form of
    * `predict_specific` with a known initial delay:
    *
    *   targets ⋈ basis (per vehicle) ⋈ broadcast(curve sets on
    *   (variant, et, slot|DEFAULT, basis_idx, target_idx)) →
    *   `curve_at_x_with_continuation(basis delay)` per group.
    *
    * Targets without a matching curve set (any slot) fall back to the
    * DEFAULT GRID while keeping the realtime origin — the reference's
    * `or_else(predict_default)` at predictor/mod.rs:216-239 applies to the
    * realtime path too; dropping such rows to the schedule-origin backfill
    * would flip their origin/precision on every page. */
  def batchPredictRealtime(spark: SparkSession, schedule: GtfsSchedule,
                           records: DataFrame, serviceDate: String, source: String,
                           specific: Dataset[SpecificCurveRow],
                           defaults: Dataset[DefaultCurveRow],
                           scheduleFileName: Option[String] = None): DataFrame = {
    import spark.implicits._

    val targets = realtimeTargets(spark, schedule, records, serviceDate)

    val sets = specific.filter(_.curve_kind == "curveset").toDF()
      .select(col("route_variant").as("cs_variant"),
        col("event_type").as("cs_event_type"),
        col("time_slot_id").as("cs_slot"),
        col("start_stop_index"), col("end_stop_index"),
        col("focus_delay"), col("curve"), col("sample_size").as("cs_sample"))

    // slot-specific match preferred, DEFAULT-slot fallback (predict_specific
    // recursion, predictor/mod.rs:299-313) — rank 0 beats rank 1. A LEFT
    // join so targets with no curve set at ANY slot surface as rank-2 rows
    // and take the default grid below: one pass over the target stream,
    // where a separate anti-join fallback leg would run the whole
    // schedule-join pipeline a second time.
    val joined = targets
      .join(broadcast(sets),
        col("route_variant") === col("cs_variant")
          && col("event_type") === col("cs_event_type")
          && col("basis_idx") === col("start_stop_index")
          && col("stop_index") === col("end_stop_index")
          && (col("cs_slot") === col("time_slot_id")
            || col("cs_slot") === Codes.DefaultTimeSlot), "left")
      .withColumn("slot_rank",
        when(col("cs_slot").isNull, 2)
          .when(col("cs_slot") === col("time_slot_id"), 0).otherwise(1))

    // returns Seq[CPoint] → array<struct<x,y>>, schema-identical to the
    // schedule-origin path (tuples would encode as _1/_2)
    val interpolate = udf { (curves: Seq[org.apache.spark.sql.Row], delay: Int) =>
      val set = curves.map { r =>
        (r.getFloat(0), r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => graft.curves.CPoint(p.getFloat(0), p.getFloat(1))).toArray)
      }
      if (set.isEmpty) null
      else Curves.curveSetInterpolate(set.toSeq, delay.toFloat).toSeq
    }

    // default grid for the rank-2 (no curve set at any slot) rows — same
    // join keys as batchPredict's default leg, realtime origin kept
    // (`or_else(predict_default)`, predictor/mod.rs:216-239)
    val dft = defaults.toDF()
      .select(col("route_type").as("d_route_type"),
        col("route_section").as("d_section"),
        col("time_slot_id").as("d_slot"), col("event_type").as("d_et"),
        col("curve").as("d_curve"), col("precision_type").as("d_precision"),
        col("sample_size").as("d_sample"))

    val keyCols = Seq("trip_id", "trip_start_date", "trip_start_time",
      "route_id", "stop_sequence", "stop_id", "event_type")
    // ONE aggregation on the 7-col vehicle-stop key: slot_rank only takes
    // values {0, 1} (both can coexist) or exactly {2} (the single all-null
    // row of an unmatched left join), so the per-rank curve sets collect as
    // rank-conditional lists in the same pass and the winner is chosen by
    // min(slot_rank) afterwards — where a groupBy on (key, rank) followed
    // by a best-rank Window re-exchanged AND sorted the whole aggregate
    // stream a second time on the 7-col key
    val resolved = joined
      .groupBy(keyCols.map(col): _*)
      .agg(
        first("scheduled_ts").as("scheduled_ts"),
        first("basis_delay").as("basis_delay"),
        min("slot_rank").as("best_rank"),
        first(when(col("slot_rank") === 0, col("cs_sample")), ignoreNulls = true).as("s0"),
        first(when(col("slot_rank") === 1, col("cs_sample")), ignoreNulls = true).as("s1"),
        // null-gated structs: collect_list skips the nulls the other rank's
        // rows (and the rank-2 all-null row) contribute
        collect_list(when(col("slot_rank") === 0,
          struct(col("focus_delay"), col("curve")))).as("set0"),
        collect_list(when(col("slot_rank") === 1,
          struct(col("focus_delay"), col("curve")))).as("set1"),
        // carried only for the rank-2 default-grid join
        first("route_type").as("route_type"),
        first("route_section").as("route_section"),
        first("time_slot_id").as("time_slot_id"))
      .withColumns(Map(
        "curve_set" -> when(col("best_rank") === 0, col("set0"))
          .when(col("best_rank") === 1, col("set1")),
        "cs_sample" -> when(col("best_rank") === 0, col("s0"))
          .when(col("best_rank") === 1, col("s1"))))
      // broadcast grid lookup, gated to the fallback tier; targets whose
      // route has no route_type never equi-join and drop below — the
      // reference produces no prediction for them (predictor/mod.rs:219-221)
      .join(broadcast(dft),
        col("best_rank") === 2
          && col("route_type") === col("d_route_type")
          && col("route_section") === col("d_section")
          && col("event_type") === col("d_et")
          && col("d_slot") === when(col("time_slot_id") === Codes.DefaultTimeSlot, 1)
            .otherwise(col("time_slot_id")), "left")
      // the raw curve materializes in its OWN projection before capCurve:
      // capCurve references its argument in ~5 expression positions (null
      // gate, size test, identity branch, and per-element inside the
      // >120-point resample lambda), and Spark's subexpression elimination
      // does not reach into conditional branches or lambda bodies — inlining
      // the interpolate UDF there evaluated it several times per row and
      // quintupled the optimizer's expression tree. CollapseProject keeps
      // the split (it refuses to duplicate non-cheap expressions), so the
      // UDF runs exactly once per row and capCurve sees a plain attribute.
      .withColumn("__raw_curve",
        when(col("best_rank") < 2, interpolate(col("curve_set"), col("basis_delay")))
          .otherwise(col("d_curve")))
      .withColumn("prediction_curve", capCurve(col("__raw_curve")))
      .drop("__raw_curve")
      .filter(col("prediction_curve").isNotNull)
      .withColumns(Map(
        "precision_type" ->
          when(col("best_rank") === 0, Codes.PrecisionSpecific)
            .when(col("best_rank") === 1, Codes.PrecisionFallbackSpecific)
            .otherwise(col("d_precision")),
        "sample_size" ->
          when(col("best_rank") < 2, col("cs_sample")).otherwise(col("d_sample"))))
    anchorAndSelect(resolved, source, OriginRealtime,
      scheduleFileName.getOrElse(source + "_schedule"))
  }

  /** The AMORTIZED realtime prediction path: the hierarchical lookup of
    * [[batchPredictRealtime]] against a LONG-LIVED executor-resident
    * `Broadcast[Predictor]` instead of a per-call broadcast exchange over the
    * curve tables. Same values, same schema (the convergence spec pins form
    * ≡ form), different cost model:
    *
    *   - zero per-call broadcast build — the curve maps ship to each executor
    *     ONCE and are reused by every later call (a 5 s streaming trigger
    *     otherwise rebuilds a multi-hundred-MB exchange 17k times/day — the
    *     reference amortizes the same data as in-memory per-route curve
    *     files, src/main.rs:321-393 FileCache, src/types/types.md:19-27);
    *   - zero shuffle — each target row resolves independently through the
    *     broadcast maps (specific → DEFAULT slot → default grid), so the
    *     whole per-trigger plan is scan → mapPartitions → project, where the
    *     join form needs a 7-col-key hash aggregation over the exploded
    *     (target × curve-set member) stream.
    *
    * Gated by [[MaxDriverRows]] at broadcast-build time (CurveCache /
    * startPredictionRefresh); past that, use the join form. */
  def batchPredictRealtimeCached(spark: SparkSession, schedule: GtfsSchedule,
      records: DataFrame, serviceDate: String, source: String,
      bc: org.apache.spark.broadcast.Broadcast[Predictor],
      scheduleFileName: Option[String] = None): DataFrame = {
    import spark.implicits._
    val targets = realtimeTargets(spark, schedule, records, serviceDate)
      .select(col("trip_id"), col("trip_start_date"), col("trip_start_time"),
        col("route_id"), col("route_variant"), col("route_type"),
        col("stop_sequence"), col("stop_id"), col("stop_index"),
        col("basis_idx"), col("basis_delay"),
        col("scheduled_ts"), col("time_slot_id"), col("route_section"),
        col("event_type"))
      .as[RealtimeTarget]

    val rows = targets.mapPartitions { it =>
      val p = bc.value
      it.flatMap { t =>
        // specific (slot → DEFAULT-slot recursion inside predictSpecific,
        // ranks 0/1) with default-grid fallback (rank 2); a null route_type
        // never reaches the grid — the reference produces no prediction for
        // such trips (predictor/mod.rs:219-221), same as the join form's
        // null-excluding equi-join
        p.predictSpecific(t.route_variant,
            Some((t.basis_idx, Some(t.basis_delay))), t.stop_index,
            t.time_slot_id, t.event_type)
          .orElse(t.route_type.flatMap(rt =>
            p.predictDefault(rt, t.route_section, t.time_slot_id, t.event_type)))
          .iterator.collect { case CurvePrediction(curve, prec, sample) =>
            RealtimePredRow(t.trip_id, t.trip_start_date, t.trip_start_time,
              t.route_id, t.stop_sequence, t.stop_id, t.event_type,
              t.scheduled_ts, prec, sample, capCurveJvm(curve))
          }
      }
    }
    anchorAndSelect(rows.toDF(), source, OriginRealtime,
      scheduleFileName.getOrElse(source + "_schedule"))
  }
}
