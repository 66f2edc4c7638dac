package graft.gtfs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.curves.{CPoint, Curves}

/** Enum codes, mirroring /root/reference/src/types/mod.rs:74-98 and
  * src/types/event_type.rs:17-31. */
object Codes {
  val EventArrival = 1
  val EventDeparture = 2
  val PrecisionUnknown = 0
  val PrecisionSpecific = 1
  val PrecisionFallbackSpecific = 2
  val PrecisionSemiSpecific = 3
  val PrecisionGeneral = 4
  val PrecisionFallbackGeneral = 5
  val PrecisionSuperGeneral = 6
  val OriginUnknown = 0
  val OriginRealtime = 1
  val OriginSchedule = 2
  val DefaultTimeSlot = 12
}

/** One leaf of the flattened statistics tree (SURVEY.md §1.3,
  * specific_curves table). `curve_kind` ∈ {"general", "curveset"}. */
final case class SpecificCurveRow(
    route_id: String, route_variant: Long, event_type: Int, time_slot_id: Int,
    start_stop_index: Int, end_stop_index: Int, curve_kind: String,
    focus_delay: Option[Float], curve: Seq[CPoint],
    precision_type: Int, sample_size: Int)

/** default_curves table row (SURVEY.md §1.3). */
final case class DefaultCurveRow(
    route_type: Int, route_section: String, time_slot_id: Int, event_type: Int,
    curve: Seq[CPoint], precision_type: Int, sample_size: Int)

final case class VariantCurve(
    route_type: Int, route_section: String, time_slot_id: Int, event_type: Int,
    route_variant: Long, curve: Seq[CPoint], sample_size: Int)

/** The `analyse compute-curves` subsystem (SURVEY.md §3.2), Spark-first:
  * the reference's per-route Rust loop over SQL scans
  * (/root/reference/src/analyser/specific_curves.rs:29-56, default_curves.rs:42-248)
  * becomes shuffled groupBy/flatMapGroups jobs over one `records` DataFrame —
  * rayon nesting disappears, partition parallelism replaces it.
  */
object CurveAnalysis {
  import Codes._

  /** J5 gap-fill projection: per vehicle, synthesize a row for every
    * scheduled stop without an observation, carrying the delays of the most
    * recent earlier observed row (specific_curves.rs:158-252).
    *
    * The reference's two-iterator merge has a labeled-loop defect that makes
    * it consume the whole schedule on the first item; this implements the
    * documented intent ("project the delay at the previous stop onto each
    * following stop where we have no data") as a single window pass.
    */
  def gapFill(records: DataFrame, schedule: GtfsSchedule): DataFrame = {
    val vehicleKey = Seq("trip_id", "trip_start_date", "trip_start_time")
    val vehicles = records
      .select((vehicleKey ++ Seq("source", "route_id", "route_variant", "schedule_file_name"))
        .map(col): _*)
      .distinct()
    val stopTimes = schedule.stopTimes.select(
      col("trip_id"), col("stop_sequence"), col("stop_id"),
      col("stop_index"), col("stop_count"), col("arrival_secs"), col("departure_secs"))
    val grid = vehicles.join(broadcast(stopTimes), Seq("trip_id"))
    val obs = records.select(
      (vehicleKey ++ Seq("stop_sequence", "delay_arrival", "delay_departure")).map(col): _*)
      .withColumn("observed", lit(true))

    val w = Window.partitionBy(vehicleKey.map(col): _*).orderBy("stop_index")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(obs, vehicleKey :+ "stop_sequence", "left")
      .withColumn("donor",
        last(when(col("observed"), struct(col("delay_arrival"), col("delay_departure"))),
          ignoreNulls = true).over(w))
      .withColumn("delay_arrival",
        when(col("observed"), col("delay_arrival")).otherwise(col("donor.delay_arrival")))
      .withColumn("delay_departure",
        when(col("observed"), col("delay_departure")).otherwise(col("donor.delay_departure")))
      .filter(col("donor").isNotNull) // stops before the first observation stay absent
      .withColumn("observed", coalesce(col("observed"), lit(false)))
      .drop("donor")
  }

  /** Adds per-event-type scheduled datetimes and TimeSlot ids. */
  /** The A7 per-event observation rows ((route, variant, event, slot, stop)
    * → delay) feeding the general-curve aggregation — exposed so the
    * curve-invariant driver query can recompute every kept curve point's
    * ECDF value from the same observations through an independent
    * (window-function) path. */
  def generalObservations(records: DataFrame, schedule: GtfsSchedule): DataFrame =
    generalCurveInput(withSlots(gapFill(records, schedule)))

  private def generalCurveInput(filled: DataFrame): DataFrame = filled
    .select(col("route_id"), col("route_variant"), col("stop_index"),
      explode(array(
        struct(lit(EventArrival).as("event_type"),
          col("delay_arrival").as("delay"), col("slot_arrival").as("slot")),
        struct(lit(EventDeparture).as("event_type"),
          col("delay_departure").as("delay"), col("slot_departure").as("slot"))))
        .as("ev"))
    .filter(col("ev.delay").isNotNull)
    .select(col("route_id"), col("route_variant"),
      col("ev.event_type").as("event_type"),
      explode(array(col("ev.slot"), lit(DefaultTimeSlot))).as("time_slot_id"),
      col("stop_index"), col("ev.delay").cast("float").as("delay"))

  private def withSlots(df: DataFrame): DataFrame =
    df.withColumn("slot_arrival",
        TimeSlots.slotIdCol(GtfsTime.dateAndTime(col("trip_start_date"), col("arrival_secs"))))
      .withColumn("slot_departure",
        TimeSlots.slotIdCol(GtfsTime.dateAndTime(col("trip_start_date"), col("departure_secs"))))

  /** Specific statistics (per route variant): general per-stop delay curves
    * (A7) and conditional stop-pair curve sets (J3 + A5/A6), all time slots +
    * DEFAULT, both event types. One shuffled job; grouping keys are the
    * reference's HashMap keys (SURVEY.md §1.3). */
  def specificCurves(spark: SparkSession, records: DataFrame,
                     schedule: GtfsSchedule): Dataset[SpecificCurveRow] = {
    import spark.implicits._
    val filled = withSlots(gapFill(records, schedule))

    // ---- A7 general per-stop curves: one per (variant, et, slot, stop) ----
    // Rows enter their own slot AND the DEFAULT slot, mirroring the
    // reference's loop over TIME_SLOTS_WITH_DEFAULT. Pure Column explodes
    // (no typed flatMap): the prep of billions of observation rows stays
    // inside whole-stage codegen with zero per-row object churn.
    val generalInput = generalCurveInput(filled)

    // ECDF via the partial Aggregator (graft.functions.EcdfAggregator):
    // map-side combine shuffles (value → count) maps, not raw delay rows —
    // the F9 ≥20 gate and ε=0.01 simplify live inside the aggregator.
    val generalCurves = generalInput
      .groupBy("route_id", "route_variant", "event_type", "time_slot_id", "stop_index")
      .agg(
        graft.functions.EcdfAggregator.ecdf(col("delay"), 20, 0.01f).as("curve"),
        count(lit(1)).cast("int").as("sample_size"))
      .filter(size(col("curve")) >= 2)
      .select(col("route_id"), col("route_variant"), col("event_type"),
        col("time_slot_id"), col("stop_index").as("start_stop_index"),
        col("stop_index").as("end_stop_index"), lit("general").as("curve_kind"),
        lit(null).cast("float").as("focus_delay"), col("curve"),
        lit(PrecisionSemiSpecific).as("precision_type"), col("sample_size"))
      .as[SpecificCurveRow]

    // ---- J3 pair join + A5/A6 curve sets ----------------------------------
    // Start side: departure delay at the earlier stop. End side: the event
    // delay at the later stop. Same vehicle = equi-key → sort-merge/shuffled
    // hash join on the vehicle key only; the stop-index θ-condition and the
    // ±3000/rounding filters (F2/F3) are post-join.
    val vehicleKey = Seq("trip_id", "trip_start_date", "trip_start_time")
    val starts = filled
      .filter(col("delay_departure").isNotNull && abs(col("delay_departure")) < 3000)
      .select(vehicleKey.map(col) ++ Seq(col("route_id"), col("route_variant"),
        col("stop_index").as("s_idx"), col("delay_departure").as("d_s"),
        col("slot_arrival").as("s_slot_arrival"), col("slot_departure").as("s_slot_departure")): _*)
    val ends = filled
      .select(vehicleKey.map(col) ++ Seq(col("stop_index").as("e_idx"),
        col("delay_arrival").as("e_delay_arrival"),
        col("delay_departure").as("e_delay_departure"),
        col("slot_arrival").as("e_slot_arrival"),
        col("slot_departure").as("e_slot_departure")): _*)

    val pairs = starts.join(ends, vehicleKey)
      .filter(col("e_idx") > col("s_idx"))

    // explode over event type and (matching slot | DEFAULT) — again pure
    // Column ops; `d - d % 12` reproduces the Scala Int division's
    // truncation toward zero (F3 truncating 12 s rounding) for negatives.
    val pairInput = pairs
      .select(col("route_id"), col("route_variant"), col("s_idx"), col("e_idx"),
        col("d_s").as("d_s_raw"),
        explode(array(
          struct(lit(EventArrival).as("event_type"),
            col("e_delay_arrival").as("d_e_raw"),
            col("s_slot_arrival").as("s_slot"), col("e_slot_arrival").as("e_slot")),
          struct(lit(EventDeparture).as("event_type"),
            col("e_delay_departure").as("d_e_raw"),
            col("s_slot_departure").as("s_slot"), col("e_slot_departure").as("e_slot"))))
          .as("ev"))
      .filter(col("ev.d_e_raw").isNotNull
        && col("ev.d_e_raw") < 3000 && col("ev.d_e_raw") > -3000) // F2
      .select(col("route_id"), col("route_variant"),
        col("ev.event_type").as("event_type"),
        explode(when(col("ev.s_slot") === col("ev.e_slot"),
            array(col("ev.e_slot"), lit(DefaultTimeSlot)))
          .otherwise(array(lit(DefaultTimeSlot)))).as("time_slot_id"),
        col("s_idx"), col("e_idx"),
        (col("d_s_raw") - col("d_s_raw") % 12).cast("float").as("d_s"),
        (col("ev.d_e_raw") - col("ev.d_e_raw") % 12).cast("float").as("d_e"))

    // Partial-aggregating curve-set build: map-side combine shuffles
    // ((d_s, d_e) → count) cells, never raw pair rows — the F9 >20 gate and
    // the marker/focused-ECDF recursion live inside the aggregator finish.
    val pairCurves = pairInput
      .groupBy("route_id", "route_variant", "event_type", "time_slot_id",
        "s_idx", "e_idx")
      .agg(graft.functions.PairCurveSetAggregator
        .curveSet(col("d_s"), col("d_e"), minPairs = 20).as("cs"))
      .select(col("route_id"), col("route_variant"), col("event_type"),
        col("time_slot_id"), col("s_idx"), col("e_idx"),
        explode(col("cs.entries")).as("fc"), // empty entries → no rows
        col("cs.sample_size").as("sample_size"))
      .select(col("route_id"), col("route_variant"), col("event_type"),
        col("time_slot_id"), col("s_idx").as("start_stop_index"),
        col("e_idx").as("end_stop_index"), lit("curveset").as("curve_kind"),
        col("fc.focus").as("focus_delay"), col("fc.curve").as("curve"),
        lit(PrecisionSpecific).as("precision_type"), col("sample_size"))
      .as[SpecificCurveRow]

    generalCurves.union(pairCurves)
  }

  /** Default (per route-type) statistics with the A8/A9 fallback hierarchy:
    * per-variant section×slot ECDFs (≥10 rows, ε=0.001) → averaged per
    * (route_type, route_section, time_slot, event_type) [General] → per
    * (route_type, event_type) [FallbackGeneral] → global [SuperGeneral];
    * every one of the 11×3×11×2 cells gets the most specific available curve
    * (default_curves.rs:42-248). */
  /** The per-variant ECDF curves the A8/A9 default rollups average —
    * exposed so the curve-invariant driver query can recompute every
    * default-curve point as the mean of its contributors' evaluations. */
  def variantCurves(spark: SparkSession, records: DataFrame,
                    schedule: GtfsSchedule): Dataset[VariantCurve] = {
    import spark.implicits._

    val routeTypes = schedule.trips
      .select(col("trip_id"), col("route_type"), col("route_variant"))
      .filter(col("route_type").isNotNull)
    val withMeta = records
      .drop("route_variant")
      .join(broadcast(routeTypes), Seq("trip_id"))
      .withColumn("route_section",
        RouteSections.sectionCol(col("stop_index"), col("stop_count")))
      // A16: slot of the scheduled arrival-else-departure datetime
      .withColumn("slot", TimeSlots.slotIdCol(GtfsTime.dateAndTime(
        col("trip_start_date"), coalesce(col("arrival_secs"), col("departure_secs")))))

    withMeta
      .select(col("route_type"), col("route_section"),
        col("slot").as("time_slot_id"), col("route_variant"),
        explode(array( // Column explode, not typed flatMap — stays codegen'd
          struct(lit(EventArrival).as("event_type"), col("delay_arrival").as("delay")),
          struct(lit(EventDeparture).as("event_type"), col("delay_departure").as("delay"))))
          .as("ev"))
      .filter(col("ev.delay").isNotNull)
      .select(col("route_type"), col("route_section"), col("time_slot_id"),
        col("ev.event_type").as("event_type"), col("route_variant"),
        col("ev.delay").cast("float").as("delay"))
      // partial-aggregated ECDF; MIN_DATA_FOR_CURVE (10) and ε=0.001 inside
      .groupBy("route_type", "route_section", "time_slot_id", "event_type", "route_variant")
      .agg(
        graft.functions.EcdfAggregator.ecdf(col("delay"), 10, 0.001f).as("curve"),
        count(lit(1)).cast("int").as("sample_size"))
      .filter(size(col("curve")) >= 2)
      .as[VariantCurve]
  }

  /** The three A8/A9 rollup levels (General / FallbackGeneral /
    * SuperGeneral) BEFORE grid selection — exposed so the oracle aux dump
    * can hand each level's points to the full-row reconstruction of
    * `gtfs_default_curves` (the grid enumeration, precedence and sample
    * means are re-derived in SQL; the averaged point values are pinned by
    * the defaultPointsCheck contributor-mean invariant). */
  def defaultRollups(spark: SparkSession, records: DataFrame, schedule: GtfsSchedule)
      : (Dataset[DefaultCurveRow], Dataset[DefaultCurveRow], Dataset[DefaultCurveRow]) = {
    import spark.implicits._
    val vCurves: Dataset[VariantCurve] = variantCurves(spark, records, schedule)

    // The curve sets are tiny (≤ variants × 66 cells) — the three average
    // levels run as small shuffles over them.
    val general = vCurves
      .groupByKey(v => (v.route_type, v.route_section, v.time_slot_id, v.event_type))
      .mapGroups { (key: (Int, String, Int, Int), vs: Iterator[VariantCurve]) =>
        val (rt, rs, ts, et) = key
        val list = vs.toArray
        val avg = Curves.simplify(
          Curves.average(list.map(_.curve.toArray).toSeq), 0.001f)
        DefaultCurveRow(rt, rs, ts, et, avg.toSeq, PrecisionGeneral,
          (list.map(_.sample_size.toLong).sum / list.length).toInt)
      }

    val fallback = vCurves
      .groupByKey(v => (v.route_type, v.event_type))
      .mapGroups { (key: (Int, Int), vs: Iterator[VariantCurve]) =>
        val (rt, et) = key
        val list = vs.toArray
        val avg = Curves.simplify(
          Curves.average(list.map(_.curve.toArray).toSeq), 0.001f)
        DefaultCurveRow(rt, "*", 0, et, avg.toSeq, PrecisionFallbackGeneral,
          (list.map(_.sample_size.toLong).sum / list.length).toInt)
      }

    val superGeneral = vCurves
      .groupByKey(_ => 1)
      .mapGroups { (_: Int, vs: Iterator[VariantCurve]) =>
        val list = vs.toArray
        // super default: inputs are pre-simplified with the coarser ε=0.01
        val avg = Curves.simplify(
          Curves.average(list.map(v => Curves.simplify(v.curve.toArray, 0.01f)).toSeq), 0.001f)
        DefaultCurveRow(0, "*", 0, 0, avg.toSeq, PrecisionSuperGeneral,
          (list.map(_.sample_size.toLong).sum / list.length).toInt)
      }
    (general, fallback, superGeneral)
  }

  def defaultCurves(spark: SparkSession, records: DataFrame,
                    schedule: GtfsSchedule): Dataset[DefaultCurveRow] = {
    val (general, fallback, superGeneral) = defaultRollups(spark, records, schedule)
    defaultCurvesFrom(spark, general, fallback, superGeneral)
  }

  /** Grid fill from PRE-BUILT (ideally cached) rollup levels. Callers that
    * also dump the rollup points for an oracle must pass the same cached
    * datasets here: the f32 contributor means inside [[defaultRollups]] are
    * summation-order-sensitive, so two independent computations can differ
    * by an ulp — sharing one materialization keeps query and dump
    * bit-identical. */
  def defaultCurvesFrom(spark: SparkSession,
                        general: Dataset[DefaultCurveRow],
                        fallback: Dataset[DefaultCurveRow],
                        superGeneral: Dataset[DefaultCurveRow]): Dataset[DefaultCurveRow] = {
    import spark.implicits._

    // Fill every (rt, rs, ts, et) cell with the most specific curve available
    // — the same fixed 11 GTFS route types the reference enumerates
    // (default_curves.rs:45-57; gtfs-structures codes).
    val rts = Seq(0, 1, 2, 3, 4, 5, 6, 7, 200, 1100, 1500)
    val grid = for {
      rt <- rts; rs <- Seq("Beginning", "Middle", "End")
      ts <- 1 to 11; et <- Seq(EventArrival, EventDeparture)
    } yield (rt, rs, ts, et)
    val gridDf = grid.toDF("route_type", "route_section", "time_slot_id", "event_type")

    val g = general.toDF()
    val f = fallback.toDF().select(col("route_type"), col("event_type"),
      col("curve").as("f_curve"), col("precision_type").as("f_precision"),
      col("sample_size").as("f_sample"))
    val sg = superGeneral.toDF().select(col("curve").as("sg_curve"),
      col("precision_type").as("sg_precision"), col("sample_size").as("sg_sample"))

    gridDf
      .join(g, Seq("route_type", "route_section", "time_slot_id", "event_type"), "left")
      .join(f, Seq("route_type", "event_type"), "left")
      .crossJoin(broadcast(sg))
      .select(
        col("route_type"), col("route_section"), col("time_slot_id"), col("event_type"),
        coalesce(col("curve"), col("f_curve"), col("sg_curve")).as("curve"),
        coalesce(col("precision_type"), col("f_precision"), col("sg_precision")).as("precision_type"),
        coalesce(col("sample_size"), col("f_sample"), col("sg_sample")).as("sample_size"))
      .as[DefaultCurveRow]
  }
}
