package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.gtfs._

/** Monitor-layer operators (SURVEY.md §2.2 F5-F12, §2.5 W5/W6/W8, §2.3
  * J8/J10, §2.7 X9-X13). SQL-expressible shapes run on the synthetic tables
  * with DuckDB oracles; the curve-bearing pages run on the GTFS fixture
  * pipeline (rows-only; curve math pinned by CurvesSpec).
  */
object MonitorPack extends QueryPack {
  import Tables.t

  // ---- F5 interval-overlap filter (oracle-checked) -----------------------
  // predictions-shaped intervals from orders: [orderdate, orderdate+7d]
  private def f5WindowOverlap(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("iv_start", col("o_orderdate"))
      .withColumn("iv_end", col("o_orderdate") + expr("INTERVAL 7 DAYS"))
      .filter(col("iv_start") < lit("1995-02-01").cast("timestamp")
        && col("iv_end") > lit("1995-01-01").cast("timestamp"))
      .select("o_orderkey", "iv_start", "iv_end")
      .orderBy("o_orderkey")

  // ---- F7 last-stop filter (oracle-checked) ------------------------------
  private def f7LastStop(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val lastLine = li.groupBy("l_orderkey").agg(max("l_linenumber").as("last_ln"))
    li.join(broadcast(lastLine), Seq("l_orderkey"))
      .filter(col("l_linenumber") < col("last_ln"))
      .select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---- F11/W7 autocomplete (oracle-checked) ------------------------------
  private def f11Autocomplete(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(lower(col("c_name")).contains("1") && lower(col("c_name")).contains("9"))
      .select("c_name").distinct().orderBy("c_name").limit(10)

  // ---- A15 high-water mark (oracle-checked) ------------------------------
  private def a15Watermark(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(max("event_id").as("hwm_id"), max(col("ts").cast("date")).as("hwm_day"))
      .orderBy("event_type")

  // ---- SO4 set difference (oracle-checked) -------------------------------
  private def so4Except(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.filter(col("value") > 190).select("user_id")
      .except(e.filter(col("value") < 10).select("user_id"))
      .orderBy("user_id")
  }

  // ---- X12 display formatting (oracle-checked) ---------------------------
  private def x12Format(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        format_string("%+d", col("value").cast("int")).as("delay_label"),
        format_string("%d:%02d Min.", expr("(event_id % 100) div 60"),
          (col("event_id") % 100) % 60).as("duration_label"))
      .orderBy("event_id")

  // ---- curve-bearing monitor pages on the GTFS fixture (rows-only) -------
  private def stopPage(s: SparkSession, dir: String): DataFrame = {
    val (sched, preds) = GtfsPack.predictionState(s)
    // name-based page = the reference's extended-platform-group query
    // (at the 300 m radius the fixture group is the single platform S2)
    Monitor.stopPageByName(s, preds, sched, "Stop 2",
      "2024-03-04 00:00:00", "2024-03-05 00:00:00")
  }

  private def w8Percentiles(s: SparkSession, dir: String): DataFrame = {
    val (_, preds) = GtfsPack.predictionState(s)
    Monitor.withPercentiles(preds)
      .select("trip_id", "stop_sequence", "event_type",
        "delay_1", "delay_5", "delay_25", "delay_50", "delay_75", "delay_95", "delay_99")
      .orderBy("trip_id", "stop_sequence", "event_type")
  }

  private def x9WalkCurves(s: SparkSession, dir: String): DataFrame = {
    val (sched, _) = GtfsPack.predictionState(s)
    // fixture platforms sit ~310 m apart diagonally; 600 m yields pairs.
    // walk_curve → JSON: the driver harness cannot hash array<struct> cells.
    Monitor.walkCurves(s, sched.stops, maxDistM = 600.0)
      .withColumn("walk_curve", to_json(col("walk_curve")))
      .orderBy("from_stop", "to_stop")
  }

  /** Journey-context stop page (F8): arriving at Stop 2 around 07:55 with a
    * ±60 s arrival curve, which departures are catchable with ≥5 % chance. */
  private def stopPageTransfer(s: SparkSession, dir: String): DataFrame = {
    val (sched, preds) = GtfsPack.predictionState(s)
    val arrivalEpoch = s.sql(
      "SELECT unix_timestamp(to_timestamp('2024-03-04 07:55:00'))").head.getLong(0).toDouble
    Monitor.stopPageWithArrival(s, preds, sched, "Stop 2",
      "2024-03-04 00:00:00", "2024-03-05 00:00:00",
      Array(graft.curves.CPoint(-60f, 0f), graft.curves.CPoint(60f, 1f)),
      arrivalEpoch)
  }

  /** Trip page for fixture trip T1 (departs 08:00:30 → trip_start_time
    * 28830), boarding at the first stop (seq 10). */
  private def tripPage(s: SparkSession, dir: String): DataFrame = {
    val (sched, preds) = GtfsPack.predictionState(s)
    Monitor.tripPage(s, preds, sched, "T1", "2024-03-04",
      tripStartTime = 8 * 3600 + 30, boardingStopSeq = 10)
  }

  /** 3-leg fixture journey: S1 →(T1)→ S3 →(walk ~260 m)→ S4 →(T1sub)→ S5.
    * T1sub departs S4 at 10:10:30, ~2 h after T1 arrives S3 — the first
    * transfer succeeds with certainty, exercising X10/X11 end to end. */
  private def journeyQ(s: SparkSession, dir: String): DataFrame = {
    val (sched, preds) = GtfsPack.predictionState(s)
    val start = s.sql("SELECT unix_timestamp(to_timestamp('2024-03-04 07:55:00'))")
      .head.getLong(0).toDouble
    Monitor.journey(s, preds, sched, start, Seq(
      Monitor.RideLeg("T1", "2024-03-04", 8 * 3600 + 30, boardStopSeq = 10, alightStopSeq = 30),
      Monitor.WalkLeg(261f),
      Monitor.RideLeg("T1sub", "2024-03-04", 10 * 3600 + 30, boardStopSeq = 40, alightStopSeq = 50)))
  }

  private def j8ResolveTrip(s: SparkSession, dir: String): DataFrame = {
    val (sched, _) = GtfsPack.predictionState(s)
    Monitor.resolveTrip(sched, "Downtown", "10", 3, "Stop 1", 8 * 3600 + 30)
      .orderBy("trip_id", "stop_sequence")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f5_window_overlap" -> (f5WindowOverlap _),
    "f7_last_stop" -> (f7LastStop _),
    "f11_autocomplete" -> (f11Autocomplete _),
    "a15_watermark" -> (a15Watermark _),
    "so4_except" -> (so4Except _),
    "x12_format" -> (x12Format _),
    "monitor_stop_page" -> (stopPage _),
    "monitor_stop_page_transfer" -> (stopPageTransfer _),
    "monitor_trip_page" -> (tripPage _),
    "monitor_journey" -> (journeyQ _),
    "w8_percentiles" -> (w8Percentiles _),
    "x9_walk_curves" -> (x9WalkCurves _),
    "j8_resolve_trip" -> (j8ResolveTrip _)
  )

  val oracles: Map[String, String] = Map(
    "f5_window_overlap" -> """
      SELECT o_orderkey, o_orderdate AS iv_start,
             o_orderdate + INTERVAL 7 DAY AS iv_end
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1995-02-01 00:00:00'
        AND o_orderdate + INTERVAL 7 DAY > TIMESTAMP '1995-01-01 00:00:00'
      ORDER BY o_orderkey""",
    "f7_last_stop" -> """
      SELECT l_orderkey, l_linenumber FROM (
        SELECT l_orderkey, l_linenumber,
               MAX(l_linenumber) OVER (PARTITION BY l_orderkey) AS last_ln
        FROM lineitem)
      WHERE l_linenumber < last_ln
      ORDER BY l_orderkey, l_linenumber""",
    "f11_autocomplete" -> """
      SELECT DISTINCT c_name FROM customer
      WHERE lower(c_name) LIKE '%1%' AND lower(c_name) LIKE '%9%'
      ORDER BY c_name LIMIT 10""",
    "a15_watermark" -> """
      SELECT event_type, MAX(event_id) AS hwm_id, CAST(MAX(ts) AS DATE) AS hwm_day
      FROM events GROUP BY event_type ORDER BY event_type""",
    "so4_except" -> """
      SELECT user_id FROM events WHERE value > 190
      EXCEPT
      SELECT user_id FROM events WHERE value < 10
      ORDER BY user_id""",
    "x12_format" -> """
      SELECT event_id,
             printf('%+d', CAST(TRUNC(value) AS INT)) AS delay_label,
             printf('%d:%02d Min.', (event_id % 100) // 60, (event_id % 100) % 60)
               AS duration_label
      FROM events ORDER BY event_id""",
    // J8 over the schedule aux dumps: headsign + short name + route type +
    // named stop + departure time mod 24 h (journey_data.rs:382-473).
    "j8_resolve_trip" -> """
      SELECT t.trip_id, t.route_id, t.route_variant, st.stop_sequence,
             st.departure_secs
      FROM read_parquet('__VOUT__/_aux/sched_trips/*.parquet') t
      JOIN read_parquet('__VOUT__/_aux/sched_routes/*.parquet') r
        ON r.route_id = t.route_id AND r.route_short_name = '10'
      JOIN read_parquet('__VOUT__/_aux/sched_stop_times/*.parquet') st
        ON st.trip_id = t.trip_id
      JOIN read_parquet('__VOUT__/_aux/sched_stops/*.parquet') s
        ON s.stop_id = st.stop_id AND s.stop_name = 'Stop 1'
      WHERE t.trip_headsign = 'Downtown' AND t.route_type = 3
        AND abs(st.departure_secs - 28830) % 86400 = 0
      ORDER BY t.trip_id, st.stop_sequence"""
  )
}
