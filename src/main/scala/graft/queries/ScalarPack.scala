package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.gtfs.{TimeSlots, RouteSections, GtfsTime, Geo}

/** Scalar-function operators (SURVEY.md §2.7) and the geo self-join (J7),
  * checked against DuckDB with dialect-equivalent expressions generated from
  * the same slot/section tables in graft.gtfs.Dimensions.
  */
object ScalarPack extends QueryPack {
  import Tables.t

  // ---- X6 TimeSlot classification (time_slots.rs:156-201) ----------------
  private def x6TimeSlot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"), TimeSlots.slotIdCol(col("ts")).as("time_slot_id"))
      .orderBy("event_id")

  // ---- X7 RouteSection classification (route_sections.rs:37-52) ----------
  // lineitem as "trip": stop_count = lines per order, stop_index = rank-1.
  private def x7RouteSection(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val order = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    // full-partition count on the SAME (partition, order) spec as the
    // row_number — one WindowExec, one sort (count is order-invariant)
    val counts = order.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    li.withColumn("stop_count", count(lit(1)).over(counts))
      .withColumn("stop_index", row_number().over(order) - 1)
      .select(col("l_orderkey"), col("l_linenumber"),
        RouteSections.sectionCol(col("stop_index"), col("stop_count")).as("route_section"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---- X4/X5 noon-anchored GTFS datetime (gtfs_time.rs:53-56) ------------
  // secs spans <0 and >86400 to exercise the overflow-day semantics.
  private def x4DateAndTime(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        GtfsTime.dateAndTime(col("o_orderdate").cast("date"),
          (col("o_orderkey") % 120000) - 3600).as("event_ts"))
      .orderBy("o_orderkey")

  // ---- X8/J7 haversine geo self-join (journey_data.rs:22-77) -------------
  // Suppliers get deterministic synthetic coordinates; pairs within 300 m.
  // Spark side is the scale path: grid-bucket the points (cell ≈ 2×radius)
  // and equi-join on the 3×3 neighborhood instead of a cross join — at 100 TB
  // a cross join is impossible, a cell join is linear in pair density.
  private val CellDeg = 0.005 // ≈ 556 m latitude; ≥ 2× the 300 m radius

  // dense synthetic city grid: ~55 m steps over a 50x37 grid, so
  // every scale factor yields a healthy number of <300 m pairs
  private def supplierGeo(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier").select(
      col("s_suppkey"),
      ((col("s_suppkey") % 50) * 0.0005 + 50.0).as("lat"),
      (((col("s_suppkey") * 7) % 37) * 0.0008 + 8.0).as("lon"))

  private def j7GeoJoin(s: SparkSession, dir: String): DataFrame = {
    val pts = supplierGeo(s, dir)
      .withColumn("cx", floor(col("lon") / CellDeg))
      .withColumn("cy", floor(col("lat") / CellDeg))
    // left side explodes to its 3×3 neighborhood; right side stays put →
    // every true pair lands in exactly one (cell) bucket of the right point.
    val probe = pts
      .withColumn("nx", explode(array(col("cx") - 1, col("cx"), col("cx") + 1)))
      .withColumn("ny", explode(array(col("cy") - 1, col("cy"), col("cy") + 1)))
      .select(col("s_suppkey").as("a_key"), col("lat").as("a_lat"),
        col("lon").as("a_lon"), col("nx"), col("ny"))
    val build = pts.select(col("s_suppkey").as("b_key"), col("lat").as("b_lat"),
      col("lon").as("b_lon"), col("cx").as("nx"), col("cy").as("ny"))
    probe.join(build, Seq("nx", "ny"))
      .filter(col("a_key") < col("b_key"))
      .withColumn("dist_m",
        Geo.haversineMeters(col("a_lat"), col("a_lon"), col("b_lat"), col("b_lon")))
      .filter(col("dist_m") <= 300.0)
      .select(col("a_key"), col("b_key"), round(col("dist_m"), 3).as("dist_m"))
      .orderBy("a_key", "b_key")
  }

  // ---- X14 percent-encoding of URL path elements (monitor/mod.rs:25-27) --
  // the raw table strings contain no escapable bytes, so the input is a
  // path element COMPOSED from them with the four delimiters plus a
  // non-ASCII and a control byte — every branch of the escape set fires
  private def x14UrlEncode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .withColumn("path_elem",
        concat(col("n_name"), lit("/"), lit("kälte?q=\""),
          col("n_nationkey").cast("string"), lit("\"`\t")))
      .select(col("n_nationkey"),
        graft.functions.PercentEncodePath(col("path_elem")).as("encoded"))
      .orderBy("n_nationkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x6_time_slot" -> (x6TimeSlot _),
    "x7_route_section" -> (x7RouteSection _),
    "x4_date_and_time" -> (x4DateAndTime _),
    "x14_urlencode" -> (x14UrlEncode _),
    "j7_geo_join" -> (j7GeoJoin _)
  )

  private val geoLat = "((s_suppkey % 50) * 0.0005 + 50.0)"
  private val geoLon = "(((s_suppkey * 7) % 37) * 0.0008 + 8.0)"

  val oracles: Map[String, String] = Map(
    "x6_time_slot" -> s"""
      SELECT event_id, ${TimeSlots.duckDbSlotIdSql("ts")} AS time_slot_id
      FROM events ORDER BY event_id""",
    "x7_route_section" -> s"""
      SELECT l_orderkey, l_linenumber,
             ${RouteSections.duckDbSectionSql("stop_index", "stop_count")} AS route_section
      FROM (
        SELECT l_orderkey, l_linenumber,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS stop_count,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS stop_index
        FROM lineitem)
      ORDER BY l_orderkey, l_linenumber""",
    "x4_date_and_time" -> s"""
      SELECT o_orderkey,
             ${GtfsTime.duckDbDateAndTimeSql("CAST(o_orderdate AS DATE)", "(o_orderkey % 120000) - 3600")} AS event_ts
      FROM orders ORDER BY o_orderkey""",
    // byte walk over the UTF-8 encoding (the established hex()-substr blob
    // indexing): controls, the four delimiters and every byte >= 0x80
    // become '%' + uppercase hex — DuckDB hex() is already uppercase
    "x14_urlencode" -> s"""
      WITH src AS (
        SELECT n_nationkey,
               n_name || '/' || 'kälte?q="' || CAST(n_nationkey AS VARCHAR)
                 || '"`' || chr(9) AS path_elem
        FROM nation),
      bytes AS (
        SELECT s.n_nationkey, g.i,
               ('0x' || substr(hex(encode(s.path_elem)), 2 * g.i + 1, 2))::INT AS b,
               substr(hex(encode(s.path_elem)), 2 * g.i + 1, 2) AS hx
        FROM src s
        CROSS JOIN generate_series(0, 4095) AS g(i)
        WHERE g.i < octet_length(encode(s.path_elem)))
      SELECT n_nationkey,
             string_agg(CASE WHEN b >= 128 OR b < 32 OR b = 127
                               OR b IN (47, 63, 34, 96)
                             THEN '%' || hx ELSE chr(b) END, '' ORDER BY i) AS encoded
      FROM bytes GROUP BY n_nationkey ORDER BY n_nationkey""",
    "j7_geo_join" -> s"""
      WITH pts AS (
        SELECT s_suppkey, $geoLat AS lat, $geoLon AS lon FROM supplier)
      SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
             ROUND(${Geo.duckDbHaversineSql("a.lat", "a.lon", "b.lat", "b.lon")}, 3) AS dist_m
      FROM pts a JOIN pts b ON a.s_suppkey < b.s_suppkey
      WHERE ${Geo.duckDbHaversineSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 300.0
      ORDER BY a_key, b_key"""
  )
}
