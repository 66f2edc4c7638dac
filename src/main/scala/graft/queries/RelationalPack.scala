package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2 relational operator inventory, re-expressed over the driver's
  * synthetic tables (TESTDATA.md). Each query keeps the *shape* of the cited
  * reference operator (filters F*, joins J*, aggregations A*, windows W*, set
  * ops SO*, scalar functions X*) while running on `lineitem`/`orders`/
  * `events`/… so the DuckDB oracle can check it.
  *
  * Scale notes are per-query: broadcast hints go on dimension tables only,
  * self-joins are equi-keyed so they sort-merge on the join key, and window
  * functions partition on high-cardinality keys.
  */
object RelationalPack extends QueryPack {
  import Tables.t

  // ---- F1/F2 delay-validity range filter + projection --------------------
  // Mirrors /root/reference/src/analyser/count.rs:50-52 (±36000 bound).
  private def f1RangeFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("value").between(-36000, 36000) && col("event_type") =!= "error")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")

  // ---- F3 truncating 12 s quantization -----------------------------------
  // Mirrors specific_curves.rs:316-321: (d/12)*12 with Rust integer division
  // (truncation toward zero, NOT floor).
  private def f3Quantize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        (expr("CAST(value - 100 AS INT)") - expr("CAST(value - 100 AS INT) % 12"))
          .as("delay_rounded"))
      .orderBy("event_id")

  // ---- A1/A2 interval count & mean + global min/max ----------------------
  // Mirrors count.rs:24-28 and :43-77 (hourly buckets, count + avg).
  private def a1IntervalStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("value").between(-36000, 36000))
      .groupBy(col("ts").cast("date").as("bucket_day"), hour(col("ts")).as("bucket_hour"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
      .orderBy("bucket_day", "bucket_hour")

  private def a2MinMax(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .agg(
        min(col("ts").cast("date")).as("min_day"),
        max(col("ts").cast("date")).as("max_day"),
        min("event_id").as("min_id"),
        max("event_id").as("max_id"),
        count(lit(1)).as("n"))

  // ---- J1 broadcast dimension join (schedule-lookup shape) ---------------
  // Mirrors per_schedule_importer.rs:161-162: stream rows joined against a
  // small in-memory schedule → broadcast inner join of small dims.
  private def j1BroadcastJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val customer = broadcast(t(s, dir, "customer"))
    val nation = broadcast(t(s, dir, "nation"))
    val region = broadcast(t(s, dir, "region"))
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("r_name")
  }

  // ---- J3/J4 stop-pair self-join (the core analytic join) ----------------
  // Mirrors specific_curves.rs:279-328 / monitor/mod.rs:1510-1528: same
  // vehicle (= l_orderkey), later stop (= higher linenumber), grouped pair
  // stats. Equi-key l_orderkey keeps this a single shuffle; at 100 TB the
  // pair blow-up stays bounded because lines-per-order is small and AQE can
  // split skewed orders.
  private def j3PairJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val l1 = li.select(col("l_orderkey"), col("l_linenumber").as("s_idx"),
      col("l_extendedprice").as("s_price"))
    val l2 = li.select(col("l_orderkey"), col("l_linenumber").as("e_idx"),
      col("l_extendedprice").as("e_price"))
    l1.join(l2, Seq("l_orderkey"))
      .filter(col("e_idx") > col("s_idx"))
      .groupBy("s_idx", "e_idx")
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("e_price") - col("s_price")), 2).as("avg_price_diff"))
      .orderBy("s_idx", "e_idx")
  }

  // ---- J5/W4 forward fill (projection gap-fill) --------------------------
  // Mirrors specific_curves.rs:228-244: carry the most recent earlier value
  // forward over gaps, per vehicle (= user), ordered by stop sequence
  // (= event_id; ts order equals event_id order in the testdata).
  private def w4ForwardFill(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("purchase_value",
        when(col("event_type") === "purchase", col("value")))
      .withColumn("last_purchase_value",
        last("purchase_value", ignoreNulls = true).over(w))
      .select("event_id", "user_id", "last_purchase_value")
      .orderBy("event_id")
  }

  // ---- J6 as-of join -----------------------------------------------------
  // Mirrors importer/mod.rs:377-450: each rt file (= click) takes the newest
  // schedule (= purchase) at or before it. Implemented the scalable way: one
  // pass, forward-fill of the reference stream inside a single window — no
  // shuffle beyond the user_id partition.
  private def j6AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("purchase_id",
        when(col("event_type") === "purchase", col("event_id")))
      .withColumn("asof_purchase_id",
        last("purchase_id", ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select("event_id", "user_id", "asof_purchase_id")
      .orderBy("event_id")
  }

  // ---- J11 semi / anti joins ---------------------------------------------
  // Mirrors the implicit membership joins (SURVEY §2.3 J11).
  private def j11SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val buildingCustomers =
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    t(s, dir, "orders")
      .join(broadcast(buildingCustomers), col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey")
      .orderBy("o_orderkey")
  }

  private def j11AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders").select(col("o_custkey"))
    t(s, dir, "customer")
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // ---- W2 last-writer-wins dedup -----------------------------------------
  // Mirrors per_schedule_importer.rs:406-421: newest observation per key
  // wins (event_id is the recording order).
  private def w2LastWriter(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "value")
      .orderBy("user_id", "event_type")
  }

  // ---- W7 top-k ----------------------------------------------------------
  // Mirrors monitor/mod.rs:215 (sorted distinct take(10)).
  private def w7TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(10)

  // ---- A9 grouping-sets fallback hierarchy -------------------------------
  // Mirrors default_curves.rs:180-244: specific cell → per-type fallback →
  // global fallback, exactly Spark GROUPING SETS. COALESCE'd labels avoid
  // engine-specific NULL ordering.
  private def a9GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    s.sql("""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             COUNT(*) AS n,
             ROUND(SUM(l_quantity), 2) AS sum_qty
      FROM lineitem_gs
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY returnflag, linestatus
    """)
  }

  // ---- A12 distinct ------------------------------------------------------
  private def a12Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select("event_type").distinct().orderBy("event_type")

  // ---- SO1 union of per-day sets -----------------------------------------
  // Mirrors scheduled_predictions_importer.rs:112-139 (current ∪ previous day).
  private def so1Union(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.filter(col("value") > 150).select("event_type")
      .union(e.filter(col("value") < 50).select("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  // ---- X1/X3 regex extraction --------------------------------------------
  // Mirrors main.rs:101-121 / gtfs_time.rs:22-46 (regex field extraction).
  private def x1RegexExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        // no-match yields '' — NULL it out before the cast, which throws
        // on '' under ANSI mode (both engines return '' from regexp_extract)
        nullif(regexp_extract(col("props"), "\"k\": (\\d+)", 1), lit(""))
          .cast("int").as("k"))
      .orderBy("event_id")

  // ---- A3 ECDF construction, oracle-checked ------------------------------
  // Runs the REAL curve library (graft.curves.Curves.makeCurve, the weighted
  // ECDF of curve_utils.rs:65-94 with no focus) per event_type over quantized
  // values, exploded to (group, x, y) rows. The DuckDB oracle reproduces the
  // construction in SQL: cumulative count at first occurrence / n, endpoints
  // forced to 0/1, and the reference's lastX=0 quirk (a minimum value of
  // exactly 0 emits no point of its own).
  private def a3EcdfCurve(s: SparkSession, dir: String): DataFrame =
    // the PARTIAL-aggregating ECDF (EcdfAggregator, whose finish is pinned
    // to Curves.makeCurve(values, None) by EcdfAggregatorSpec — endpoints,
    // lastX=0 quirk and all; ε=0 keeps simplify a no-op): map-side combine
    // shuffles one (value → count) cell per distinct delay instead of every
    // raw observation row, which the previous typed groupByKey/
    // flatMapGroups form shipped whole (guide §2.3: aggregate before you
    // shuffle). Same curve values; y rounding is half-up on non-negative
    // values in both forms.
    t(s, dir, "events")
      .select(col("event_type"),
        (expr("CAST(value AS INT)") - expr("CAST(value AS INT) % 12"))
          .cast("float").as("v"))
      .groupBy("event_type")
      .agg(graft.functions.EcdfAggregator.ecdf(col("v"), 1, 0f).as("curve"))
      .select(col("event_type"), posexplode(col("curve")))
      .select(col("event_type"), col("col.x").cast("int").as("x"),
        (round(col("col.y").cast("double") * 10000) / 10000).as("y"))
      .orderBy("event_type", "x")

  // A8/A10 curve averaging, oracle-checked end to end: per-group
  // unsimplified ECDFs (the REAL partial aggregator) averaged pointwise on
  // the union x-grid by the REAL library average — the default-curve
  // averaging step (default_curves.rs:180-244) made SQL-expressible by
  // ε=0 (simplify is then a no-op). The oracle reproduces makeCurve
  // (incl. the lastX=0 quirk), linear yAtX interpolation with 0/1 clamps,
  // and the pointwise mean.
  private def a8CurveAverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select(col("event_type"),
        (expr("CAST(value AS INT)") - expr("CAST(value AS INT) % 12"))
          .cast("float").as("v"))
      .groupBy("event_type")
      .agg(graft.functions.EcdfAggregator.ecdf(col("v"), 1, 0f).as("curve"))
      .as[(String, Seq[graft.curves.CPoint])]
      .groupByKey(_ => 1)
      .flatMapGroups { (_: Int, it: Iterator[(String, Seq[graft.curves.CPoint])]) =>
        // deterministic float-sum order: sort curves by group key
        val cs = it.toSeq.sortBy(_._1).map(_._2.toArray)
        graft.curves.Curves.average(cs).iterator
          .map(p => (p.x.toInt, math.round(p.y.toDouble * 10000) / 10000.0))
      }
      .toDF("x", "y")
      .orderBy("x")
  }

  // W8 quantile extraction, oracle-checked: the REAL library inverse-CDF
  // (Curves.xAtY via Curves.percentiles — the consumer the prediction rows
  // run through, prediction_result.rs:40-47) against a full SQL
  // reconstruction (leftmost bracketing points + linear interpolation).
  // x is rounded to 2dp: quantile x values run to ~1e3 where Float carries
  // ~1e-4 absolute error, so 4dp would flake at round boundaries.
  private def w8QuantileExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select(col("event_type"),
        (expr("CAST(value AS INT)") - expr("CAST(value AS INT) % 12"))
          .cast("float").as("v"))
      .groupBy("event_type")
      .agg(graft.functions.EcdfAggregator.ecdf(col("v"), 1, 0f).as("curve"))
      .as[(String, Seq[graft.curves.CPoint])]
      .flatMap { case (g, curve) =>
        val c = curve.toArray
        graft.curves.Curves.PredictionPercentiles
          .zip(graft.curves.Curves.percentiles(c))
          .map { case (p, x) =>
            (g, math.round(p * 100), math.round(x.toDouble * 100) / 100.0)
          }
      }
      .toDF("event_type", "p", "x")
      .orderBy("event_type", "p")
  }

  // ---- Flagship: q1-style aggregation (headline correctness probe) -------
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "f1_range_filter" -> (f1RangeFilter _),
    "f3_quantize_12s" -> (f3Quantize _),
    "a1_interval_stats" -> (a1IntervalStats _),
    "a2_minmax" -> (a2MinMax _),
    "j1_broadcast_join" -> (j1BroadcastJoin _),
    "j3_pair_join" -> (j3PairJoin _),
    "w4_forward_fill" -> (w4ForwardFill _),
    "j6_asof_join" -> (j6AsOfJoin _),
    "j11_semi_join" -> (j11SemiJoin _),
    // 0-row INVARIANT (anti-join against a complete dimension); non-trivial
    // because j11_semi_join (2958 rows at sf0.01) keeps the same join live
    "j11_anti_join" -> (j11AntiJoin _),
    "w2_last_writer" -> (w2LastWriter _),
    "w7_topk" -> (w7TopK _),
    "a9_grouping_sets" -> (a9GroupingSets _),
    "a3_ecdf_curve" -> (a3EcdfCurve _),
    "a8_curve_average" -> (a8CurveAverage _),
    "w8_quantile_extract" -> (w8QuantileExtract _),
    "a12_distinct" -> (a12Distinct _),
    "so1_union" -> (so1Union _),
    "x1_regex_extract" -> (x1RegexExtract _)
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             ROUND(AVG(l_quantity), 4) AS avg_qty,
             ROUND(AVG(l_discount), 4) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "f1_range_filter" -> """
      SELECT event_id, user_id, event_type, value
      FROM events
      WHERE value BETWEEN -36000 AND 36000 AND event_type <> 'error'
      ORDER BY event_id""",
    "f3_quantize_12s" -> """
      SELECT event_id,
             CAST(TRUNC(value - 100) AS INT)
               - CAST(TRUNC(value - 100) AS INT) % 12 AS delay_rounded
      FROM events
      ORDER BY event_id""",
    "a1_interval_stats" -> """
      SELECT CAST(ts AS DATE) AS bucket_day, EXTRACT(hour FROM ts) AS bucket_hour,
             COUNT(*) AS n, ROUND(AVG(value), 4) AS avg_value
      FROM events
      WHERE value BETWEEN -36000 AND 36000
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "a2_minmax" -> """
      SELECT CAST(MIN(ts) AS DATE) AS min_day, CAST(MAX(ts) AS DATE) AS max_day,
             MIN(event_id) AS min_id, MAX(event_id) AS max_id, COUNT(*) AS n
      FROM events""",
    "j1_broadcast_join" -> """
      SELECT r_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""",
    "j3_pair_join" -> """
      SELECT l1.l_linenumber AS s_idx, l2.l_linenumber AS e_idx,
             COUNT(*) AS n_pairs,
             ROUND(AVG(l2.l_extendedprice - l1.l_extendedprice), 2) AS avg_price_diff
      FROM lineitem l1
      JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                       AND l2.l_linenumber > l1.l_linenumber
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "w4_forward_fill" -> """
      SELECT event_id, user_id,
             LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_purchase_value
      FROM events
      ORDER BY event_id""",
    "j6_asof_join" -> """
      SELECT event_id, user_id, asof_purchase_id FROM (
        SELECT event_id, user_id, event_type,
               LAST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS asof_purchase_id
        FROM events)
      WHERE event_type = 'click'
      ORDER BY event_id""",
    "j11_semi_join" -> """
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      ORDER BY o_orderkey""",
    "j11_anti_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      ORDER BY c_custkey""",
    "w2_last_writer" -> """
      SELECT user_id, event_type, event_id, value FROM (
        SELECT user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
      ORDER BY user_id, event_type""",
    "w7_topk" -> """
      SELECT c_custkey, c_name, c_acctbal FROM customer
      ORDER BY c_acctbal DESC, c_custkey LIMIT 10""",
    "a9_grouping_sets" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             COUNT(*) AS n,
             ROUND(SUM(l_quantity), 2) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY returnflag, linestatus""",
    "a3_ecdf_curve" -> """
      WITH vals AS (
        SELECT event_type AS g,
               CAST(TRUNC(value) AS INT) - CAST(TRUNC(value) AS INT) % 12 AS x
        FROM events),
      stats AS (SELECT g, COUNT(*) AS n, MIN(x) AS mn FROM vals GROUP BY g),
      pts AS (SELECT g, x, COUNT(*) AS cnt FROM vals GROUP BY g, x),
      cum AS (
        SELECT g, x,
               SUM(cnt) OVER (PARTITION BY g ORDER BY x) - cnt + 1 AS first_rn
        FROM pts),
      emitted AS (
        SELECT c.g, c.x, c.first_rn, s.n FROM cum c JOIN stats s ON c.g = s.g
        WHERE NOT (c.x = 0 AND c.x = s.mn))
      SELECT g AS event_type, x,
             CASE WHEN x = MIN(x) OVER (PARTITION BY g) THEN 0.0
                  WHEN x = MAX(x) OVER (PARTITION BY g) THEN 1.0
                  ELSE ROUND(first_rn * 1.0 / n, 4) END AS y
      FROM emitted
      ORDER BY event_type, x""",
    "a8_curve_average" -> """
      WITH vals AS (
        SELECT event_type AS g,
               CAST(TRUNC(value) AS INT) - CAST(TRUNC(value) AS INT) % 12 AS x
        FROM events),
      stats AS (SELECT g, COUNT(*) AS n, MIN(x) AS mn FROM vals GROUP BY g),
      pts AS (SELECT g, x, COUNT(*) AS cnt FROM vals GROUP BY g, x),
      cum AS (
        SELECT g, x,
               SUM(cnt) OVER (PARTITION BY g ORDER BY x) - cnt + 1 AS first_rn
        FROM pts),
      emitted AS (
        SELECT cu.g, cu.x, cu.first_rn, st.n FROM cum cu JOIN stats st ON cu.g = st.g
        WHERE NOT (cu.x = 0 AND cu.x = st.mn)),
      curve AS (
        SELECT g, x,
               CASE WHEN x = MIN(x) OVER (PARTITION BY g) THEN 0.0
                    WHEN x = MAX(x) OVER (PARTITION BY g) THEN 1.0
                    ELSE first_rn * 1.0 / n END AS y
        FROM emitted),
      gs AS (SELECT DISTINCT g FROM curve),
      grid AS (SELECT DISTINCT x FROM curve),
      interp AS (
        SELECT gs.g, grid.x AS gx,
          CASE
            WHEN grid.x <= (SELECT MIN(c.x) FROM curve c WHERE c.g = gs.g) THEN 0.0
            WHEN grid.x >= (SELECT MAX(c.x) FROM curve c WHERE c.g = gs.g) THEN 1.0
            ELSE (SELECT p0.y + (p1.y - p0.y) * ((grid.x - p0.x) * 1.0 / (p1.x - p0.x))
                  FROM (SELECT c0.x, c0.y FROM curve c0
                        WHERE c0.g = gs.g AND c0.x < grid.x
                        ORDER BY c0.x DESC LIMIT 1) p0,
                       (SELECT c1.x, c1.y FROM curve c1
                        WHERE c1.g = gs.g AND c1.x >= grid.x
                        ORDER BY c1.x LIMIT 1) p1)
          END AS y
        FROM gs CROSS JOIN grid)
      SELECT gx AS x, ROUND(AVG(y), 4) AS y
      FROM interp GROUP BY gx ORDER BY gx""",
    "w8_quantile_extract" -> """
      WITH vals AS (
        SELECT event_type AS g,
               CAST(TRUNC(value) AS INT) - CAST(TRUNC(value) AS INT) % 12 AS x
        FROM events),
      stats AS (SELECT g, COUNT(*) AS n, MIN(x) AS mn FROM vals GROUP BY g),
      pts AS (SELECT g, x, COUNT(*) AS cnt FROM vals GROUP BY g, x),
      cum AS (
        SELECT g, x,
               SUM(cnt) OVER (PARTITION BY g ORDER BY x) - cnt + 1 AS first_rn
        FROM pts),
      emitted AS (
        SELECT cu.g, cu.x, cu.first_rn, st.n FROM cum cu JOIN stats st ON cu.g = st.g
        WHERE NOT (cu.x = 0 AND cu.x = st.mn)),
      curve AS (
        SELECT g, x,
               CASE WHEN x = MIN(x) OVER (PARTITION BY g) THEN 0.0
                    WHEN x = MAX(x) OVER (PARTITION BY g) THEN 1.0
                    ELSE first_rn * 1.0 / n END AS y
        FROM emitted),
      ps(p, y) AS (VALUES (1, 0.01), (5, 0.05), (25, 0.25), (50, 0.50),
                          (75, 0.75), (95, 0.95), (99, 0.99)),
      gs AS (SELECT DISTINCT g FROM curve)
      SELECT gs.g AS event_type, ps.p AS p,
        ROUND(CASE
          WHEN ps.y <= (SELECT c.y FROM curve c WHERE c.g = gs.g ORDER BY c.x LIMIT 1)
            THEN (SELECT c.x FROM curve c WHERE c.g = gs.g ORDER BY c.x LIMIT 1)
          WHEN ps.y >= (SELECT c.y FROM curve c WHERE c.g = gs.g ORDER BY c.x DESC LIMIT 1)
            THEN (SELECT c.x FROM curve c WHERE c.g = gs.g ORDER BY c.x DESC LIMIT 1)
          ELSE (SELECT p0.x + (p1.x - p0.x) * ((ps.y - p0.y) / (p1.y - p0.y))
                FROM (SELECT c0.x, c0.y FROM curve c0
                      WHERE c0.g = gs.g AND c0.y < ps.y
                      ORDER BY c0.x DESC LIMIT 1) p0,
                     (SELECT c1.x, c1.y FROM curve c1
                      WHERE c1.g = gs.g AND c1.y >= ps.y
                      ORDER BY c1.x LIMIT 1) p1)
        END, 2) AS x
      FROM gs CROSS JOIN ps
      ORDER BY event_type, p""",
    "a12_distinct" -> """
      SELECT DISTINCT event_type FROM events ORDER BY event_type""",
    "so1_union" -> """
      SELECT event_type, COUNT(*) AS n FROM (
        SELECT event_type FROM events WHERE value > 150
        UNION ALL
        SELECT event_type FROM events WHERE value < 50)
      GROUP BY event_type ORDER BY event_type""",
    "x1_regex_extract" -> """
      SELECT event_id,
             CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS INT) AS k
      FROM events
      ORDER BY event_id"""
  )
}
