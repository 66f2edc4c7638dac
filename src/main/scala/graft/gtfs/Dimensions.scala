package graft.gtfs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's dimension vocabularies (SURVEY.md §1.4), reproduced
  * exactly, each as BOTH a pure-Scala function (driver-side / tests) and a
  * Spark `Column` expression (pipelines; codegen-friendly, no UDF).
  */

/** TimeSlot: 11 named weekday×hour slots + DEFAULT (id 12), with wrap-around
  * semantics for night slots. Mirrors /root/reference/src/types/time_slots.rs:27-201.
  *
  * Weekday encoding below: 0 = Monday … 6 = Sunday (num_days_from_monday). */
object TimeSlots {
  final case class Slot(id: Int, minWeekday: Int, maxWeekday: Int, minHour: Int, maxHour: Int)

  val WorkdayMorning = Slot(1, 0, 4, 4, 6)
  val WorkdayMorningRush = Slot(2, 0, 4, 6, 8)
  val WorkdayLateMorning = Slot(3, 0, 4, 8, 12)
  val WorkdayNoonRush = Slot(4, 0, 4, 12, 14)
  val WorkdayAfternoon = Slot(5, 0, 4, 14, 16)
  val WorkdayAfternoonRush = Slot(6, 0, 4, 16, 18)
  val WorkdayEvening = Slot(7, 0, 4, 18, 20)
  val SaturdayDay = Slot(8, 5, 5, 4, 20)
  val SundayDay = Slot(9, 6, 6, 4, 20)
  val NightBeforeWorkday = Slot(10, 6, 3, 20, 4) // Sun..Thu, wrapped weekday range
  val NightBeforeWeekendDay = Slot(11, 4, 5, 20, 4)
  val Default = Slot(12, 0, 6, 0, 24)

  val All: Seq[Slot] = Seq(WorkdayMorning, WorkdayMorningRush, WorkdayLateMorning,
    WorkdayNoonRush, WorkdayAfternoon, WorkdayAfternoonRush, WorkdayEvening,
    SaturdayDay, SundayDay, NightBeforeWorkday, NightBeforeWeekendDay)

  /** time_slots.rs:168-201 `matches`, with the wrapped weekday/hour cases. */
  def matches(s: Slot, weekday: Int, hour: Int): Boolean = {
    val day =
      (weekday >= s.minWeekday && weekday <= s.maxWeekday) ||
        (s.minWeekday > s.maxWeekday && (weekday >= s.minWeekday || weekday <= s.maxWeekday))
    val hourOk =
      (hour >= s.minHour && hour < s.maxHour) ||
        (s.minHour > s.maxHour && (hour >= s.minHour || hour < s.maxHour))
    day && hourOk
  }

  /** First matching slot id (time_slots.rs:156-165); total because the 11
    * slots cover every (weekday, hour). */
  def classify(weekday: Int, hour: Int): Int =
    All.find(s => matches(s, weekday, hour)).map(_.id).getOrElse(Default.id)

  /** Column form over a timestamp: weekday 0=Mon from Spark's dayofweek
    * (1=Sun..7=Sat), then the same first-match CASE chain. Pure expressions →
    * whole-stage codegen, no UDF. */
  def slotIdCol(ts: Column): Column = {
    val wd = (dayofweek(ts) + lit(5)) % 7
    val h = hour(ts)
    def dayCond(s: Slot): Column =
      if (s.minWeekday <= s.maxWeekday) wd.between(s.minWeekday, s.maxWeekday)
      else (wd >= s.minWeekday) || (wd <= s.maxWeekday)
    def hourCond(s: Slot): Column =
      if (s.minHour <= s.maxHour) (h >= s.minHour) && (h < s.maxHour)
      else (h >= s.minHour) || (h < s.maxHour)
    All.foldRight(lit(Default.id)) { (s, acc) =>
      when(dayCond(s) && hourCond(s), lit(s.id)).otherwise(acc)
    }
  }

  /** DuckDB CASE expression equivalent to [[slotIdCol]] for oracle SQL.
    * `tsExpr` must be a timestamp expression; isodow: Mon=1..Sun=7. */
  def duckDbSlotIdSql(tsExpr: String): String = {
    val wd = s"(CAST(isodow($tsExpr) AS INT) - 1)"
    val h = s"CAST(EXTRACT(hour FROM $tsExpr) AS INT)"
    val cases = All.map { s =>
      val day =
        if (s.minWeekday <= s.maxWeekday) s"($wd BETWEEN ${s.minWeekday} AND ${s.maxWeekday})"
        else s"($wd >= ${s.minWeekday} OR $wd <= ${s.maxWeekday})"
      val hourC =
        if (s.minHour <= s.maxHour) s"($h >= ${s.minHour} AND $h < ${s.maxHour})"
        else s"($h >= ${s.minHour} OR $h < ${s.maxHour})"
      s"WHEN $day AND $hourC THEN ${s.id}"
    }
    s"CASE ${cases.mkString(" ")} ELSE ${Default.id} END"
  }
}

/** RouteSection: Beginning/Middle/End with section length min(5, stops/3).
  * Mirrors /root/reference/src/types/route_sections.rs:37-52. */
object RouteSections {
  def classify(stopIndex: Int, stopCount: Int): String = {
    val sectionSize = math.min(5, stopCount / 3)
    if (stopIndex < sectionSize) "Beginning"
    else if (stopCount - stopIndex <= sectionSize) "End"
    else "Middle"
  }

  def sectionCol(stopIndex: Column, stopCount: Column): Column = {
    val size = least(lit(5), (stopCount.cast("int") / 3).cast("int"))
    when(stopIndex < size, "Beginning")
      .when(stopCount - stopIndex <= size, "End")
      .otherwise("Middle")
  }

  def duckDbSectionSql(idxExpr: String, countExpr: String): String =
    // FLOOR, not CAST: DuckDB CAST(double AS INT) rounds to nearest.
    s"""CASE WHEN $idxExpr < LEAST(5, CAST(FLOOR($countExpr / 3) AS INT)) THEN 'Beginning'
        WHEN $countExpr - $idxExpr <= LEAST(5, CAST(FLOOR($countExpr / 3) AS INT)) THEN 'End'
        ELSE 'Middle' END"""
}

/** GTFS time semantics: service-day seconds are anchored at "noon minus 12 h"
  * of the service day and may be < 0 or ≥ 86400 (>24:00:00 trips). Mirrors
  * /root/reference/src/types/gtfs_time.rs:53-56 and src/main.rs:421-442.
  * With the engine's UTC session timezone the noon-anchored form equals
  * date + secs, but stays DST-correct if a local tz is ever configured. */
object GtfsTime {
  /** Absolute instant of (service date, seconds-since-noon-minus-12h):
    * noon of the service day plus (secs − 12 h), as a day-time interval add
    * (DST-correct if a non-UTC session timezone is ever configured). */
  def dateAndTime(serviceDate: Column, secs: Column): Column =
    serviceDate.cast("timestamp") +
      make_dt_interval(lit(0), lit(12), lit(0),
        (secs - lit(43200)).cast("decimal(18,6)"))

  def duckDbDateAndTimeSql(dateExpr: String, secsExpr: String): String =
    s"CAST($dateExpr AS TIMESTAMP) + INTERVAL 12 HOUR + to_seconds(CAST($secsExpr AS BIGINT) - 43200)"

  /** "HH:MM:SS" (H may exceed 24) → seconds. gtfs_time.rs:22-46. */
  def parseGtfsTimeCol(s: Column): Column = {
    // the reference regex (gtfs_time.rs:24): first H:M:S digit group anywhere
    // in the string. No match → NULL (callers skip the entity) where the old
    // split-and-cast form threw under ANSI on any junk suffix; try_cast turns
    // an absurd digit run into NULL instead of a job-killing overflow.
    val re = "(\\d+):(\\d+):(\\d+)"
    def part(i: Int) = nullif(regexp_extract(s, re, i), lit("")).try_cast("int")
    part(1) * 3600 + part(2) * 60 + part(3)
  }

  def parseGtfsTime(s: String): Option[Int] = {
    val m = "(\\d+):(\\d+):(\\d+)".r.findFirstMatchIn(s)
    m.map(g => g.group(1).toInt * 3600 + g.group(2).toInt * 60 + g.group(3).toInt)
  }
}

/** Haversine great-circle distance as a pure column expression (no UDF).
  * Mirrors the geo-crate call at /root/reference/src/monitor/journey_data.rs:73. */
object Geo {
  private val EarthRadiusM = 6371008.8

  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusM) * atan2(sqrt(a), sqrt(lit(1) - a))
  }

  def duckDbHaversineSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"""2 * $EarthRadiusM * atan2(
          sqrt(pow(sin(radians($lat2 - $lat1) / 2), 2)
               + cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2), 2)),
          sqrt(1 - (pow(sin(radians($lat2 - $lat1) / 2), 2)
               + cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2), 2))))"""
}
