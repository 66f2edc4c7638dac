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

  // fixture-page results consumed by more than one query (the page itself
  // and the probability-invariant check) — computed once per session, like
  // PipelinePack's shared pair caches
  // per-key lazy thunks (same pattern as PipelinePack): distinct pages build
  // concurrently during prewarm, same-key callers share one evaluation
  private val memo =
    scala.collection.concurrent.TrieMap[(SparkSession, String), () => DataFrame]()
  private def cached(s: SparkSession, key: String)
                    (build: => DataFrame): DataFrame = {
    // long-lived JVMs (tests, bench) create several sessions — drop entries
    // whose session is gone so the map can't leak plans across sessions
    memo.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    val thunk = memo.getOrElseUpdate((s, key), {
      // localCheckpoint over cache (see GtfsPack.predictionState): derived
      // ops over a cached plan re-analyze its whole lineage per query
      lazy val v: DataFrame = build.localCheckpoint()
      () => v
    })
    thunk()
  }

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
  // window max over the vehicle key, exactly the oracle's shape: ONE
  // exchange of the fact table and one scan. The previous form broadcast
  // the per-order aggregate back against a second scan — broadcasting an
  // aggregate OF THE FACT TABLE grows with the fact table (one row per
  // order key), which caps out the driver/executors at scale, and the
  // optimization guide (§3.1) reserves broadcast for bounded dimensions.
  private def f7LastStop(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
    t(s, dir, "lineitem")
      .withColumn("last_ln", max("l_linenumber").over(w))
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

  // ---- ST4 backfill batch boundaries (oracle-checked) --------------------
  // the idle-backfill batch PARTITIONING (≥6 min AND ≥1000-trip windows,
  // clipped at the 7d12h buffer) reconstructed over the events table as the
  // start-instant stream: every high-water-mark advance the ST4 loop would
  // commit, via the same ScheduledPredictions.batchEnd step advance() uses
  private val St4From = 1704067200L // 2024-01-01 00:00:00 UTC
  private val St4MaxBatches = 12
  private def st4BackfillBatches(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val starts = t(s, dir, "events").select(unix_timestamp(col("ts")).as("start_epoch"))
    ScheduledPredictions.batchBoundaries(starts, "start_epoch", St4From,
      St4From + ScheduledPredictions.BufferSecs, St4MaxBatches)
      .toDF("batch_idx", "from_epoch", "end_epoch", "trip_count")
      .orderBy("batch_idx")
  }

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

  // ---- curve-bearing monitor pages on the GTFS fixture --------------------
  // Time columns go out as ROUNDED EPOCH DOUBLES (not timestamps): Spark
  // parquet timestamps surface in DuckDB as TIMESTAMPTZ and isoformat
  // differently from the oracle's naive arithmetic; an epoch double is
  // engine-neutral and the round(4) absorbs f32-vs-f64 interpolation dust.
  private def stopPage(s: SparkSession, dir: String): DataFrame = {
    val (sched, preds) = GtfsPack.predictionState(s)
    // name-based page = the reference's extended-platform-group query
    // (at the 300 m radius the fixture group is the single platform S2)
    Monitor.stopPageByName(s, preds, sched, "Stop 2",
      "2024-03-04 00:00:00", "2024-03-05 00:00:00")
      .withColumn("median_epoch", round(col("median_ts").cast("double"), 4))
      .drop("median_ts")
  }

  private def w8Percentiles(s: SparkSession, dir: String): DataFrame = {
    val (_, preds) = GtfsPack.predictionState(s)
    val ds = Seq("delay_1", "delay_5", "delay_25", "delay_50", "delay_75",
      "delay_95", "delay_99")
    // full 5-column prediction key in output + sort: (trip_id, seq, event)
    // is only unique by accident of the single-day fixture — a second
    // service day would make the sort (and the oracle rows) ambiguous
    Monitor.withPercentiles(preds)
      .select(PredKeys.map(col) ++ ds.map(d => round(col(d), 4).as(d)): _*)
      .orderBy(PredKeys.map(col): _*)
  }

  private def x9WalkCurves(s: SparkSession, dir: String): DataFrame = {
    val (sched, _) = GtfsPack.predictionState(s)
    // fixture platforms sit ~310 m apart diagonally; 600 m yields pairs.
    // walk_curve → JSON: the driver harness cannot hash array<struct> cells.
    Monitor.walkCurves(s, sched.stops, maxDistM = 600.0)
      .withColumn("walk_curve", to_json(col("walk_curve")))
      .withColumn("dist_m", round(col("dist_m"), 3))
      .orderBy("from_stop", "to_stop")
  }

  /** Journey-context stop page (F8): arriving at Stop 2 around 07:55 with a
    * ±60 s arrival curve, which departures are catchable with ≥5 % chance. */
  // shared between the transfer-page query and its oracle's aux dump: the
  // assumed arrival curve at the platform group and its absolute anchor
  private val TransferArrCurve =
    Array(graft.curves.CPoint(-60f, 0f), graft.curves.CPoint(60f, 1f))
  private def transferArrivalEpoch(s: SparkSession): Double = s.sql(
    "SELECT unix_timestamp(to_timestamp('2024-03-04 07:55:00'))").head().getLong(0).toDouble

  private def stopPageTransfer(s: SparkSession, dir: String): DataFrame =
    cached(s, "stop_page_transfer") {
      val (sched, preds) = GtfsPack.predictionState(s)
      Monitor.stopPageWithArrival(s, preds, sched, "Stop 2",
        "2024-03-04 00:00:00", "2024-03-05 00:00:00",
        TransferArrCurve, transferArrivalEpoch(s))
        .withColumn("median_epoch", round(col("median_ts").cast("double"), 4))
        .drop("median_ts")
        .orderBy("median_epoch", "trip_id")
    }

  /** X15 — heat-strip rendering over the S2 platform's prediction rows,
    * proven END TO END: each strip renders from the prediction curve on the
    * page's shared time axis (reference `src/monitor/mod.rs:1215-1262`),
    * encodes through the real zlib PNG writer, decodes BACK through the PNG
    * reader, and the query emits the decoded pixels; the oracle re-derives
    * every pixel in SQL from the already-hash-verified curve points, so a
    * defect in the density math, the gradient, the zlib encode or the
    * decode all surface as value diffs. The render itself is bounded page
    * work (10 rows × width px), like the other page UDF paths. */
  private val HeatStripWidth = 24

  private def heatStrip(s: SparkSession, dir: String): DataFrame = {
    val (_, preds) = GtfsPack.predictionState(s)
    val rows = preds.filter(col("stop_id") === "S2")
      .select(PredKeys.map(col) ++ Seq(
        col("prediction_min").cast("double").as("min_e"),
        col("prediction_max").cast("double").as("max_e"),
        col("prediction_curve")): _*)
    val win = rows.agg(min("min_e").as("w0"), max("max_e").as("w1"))
    val strip = udf { (points: Seq[org.apache.spark.sql.Row], minE: Double,
                       w0: Double, w1: Double, eventType: Int) =>
      val curve = points
        .map(r => graft.curves.CPoint(r.getFloat(0), r.getFloat(1))).toArray
      val anchor = minE - curve.head.x
      // RGBA (4 bytes/pixel): the PNG is color type 6 with the reference's
      // constant alpha 255 — the oracle pins all four channels
      val bytes = HeatStrip.png(curve, anchor, w0, w1, HeatStripWidth, eventType)
      graft.ops.MediaCodec.pngPixels(bytes).getOrElse(Array.emptyByteArray)
        .grouped(4).map(p => (p(0) & 0xff, p(1) & 0xff, p(2) & 0xff, p(3) & 0xff)).toSeq
    }
    rows.crossJoin(broadcast(win))
      .withColumn("pxs", strip(col("prediction_curve"), col("min_e"),
        col("w0"), col("w1"), col("event_type")))
      .select(PredKeys.map(col) :+ posexplode(col("pxs")): _*)
      .select(PredKeys.map(col) ++ Seq(
        col("pos").cast("int").as("px"), col("col._1").as("r"),
        col("col._2").as("g"), col("col._3").as("b"),
        col("col._4").as("a")): _*)
      .orderBy(PredKeys.map(col) :+ col("px"): _*)
  }

  /** Trip page for fixture trip T1 (departs 08:00:30 → trip_start_time
    * 28830), boarding at the first stop (seq 10). */
  private def tripPage(s: SparkSession, dir: String): DataFrame = {
    val (sched, preds) = GtfsPack.predictionState(s)
    val page = Monitor.tripPage(s, preds, sched, "T1", "2024-03-04",
      tripStartTime = 8 * 3600 + 30, boardingStopSeq = 10)
    Seq("sched_ts" -> "sched_epoch", "q1_ts" -> "q1_epoch",
      "median_ts" -> "median_epoch", "q99_ts" -> "q99_epoch")
      .foldLeft(page) { case (df, (ts, ep)) =>
        df.withColumn(ep, round(col(ts).cast("double"), 4)).drop(ts)
      }
  }

  /** 3-leg fixture journey: S1 →(T1)→ S3 →(walk ~260 m)→ S4 →(T1sub)→ S5.
    * T1sub departs S4 at 10:10:30, ~2 h after T1 arrives S3 — the first
    * transfer succeeds with certainty, exercising X10/X11 end to end. */
  private def journeyFull(s: SparkSession): DataFrame =
    cached(s, "journey") {
      val (sched, preds) = GtfsPack.predictionState(s)
      // same 07:55 anchor as the transfer page — one definition, so editing
      // the journey start can't desynchronize the two queries' oracles
      val start = transferArrivalEpoch(s)
      Monitor.journey(s, preds, sched, start, Seq(
        Monitor.RideLeg("T1", "2024-03-04", 8 * 3600 + 30, boardStopSeq = 10, alightStopSeq = 30),
        Monitor.WalkLeg(261f),
        Monitor.RideLeg("T1sub", "2024-03-04", 10 * 3600 + 30, boardStopSeq = 40, alightStopSeq = 50)))
    }

  private def journeyQ(s: SparkSession, dir: String): DataFrame =
    journeyFull(s).drop("curve")

  /** Builds the memoized fixture pages ahead of timing (Bench's setup
    * phase): the journey trace and the transfer page are each consumed by
    * their own query AND the probability-invariant check, so per-query
    * bench numbers should reflect marginal cost, not which consumer runs
    * first alphabetically. */
  def prewarm(s: SparkSession): Unit =
    Par.all(
      "journey" -> (() => { journeyFull(s); () }),
      "transfer" -> (() => { stopPageTransfer(s, ""); () }),
      // the schedule-static variant index map (VisualSchedule memo) builds
      // here so its one-time collect is accounted as setup, like the other
      // shared schedule-derived state
      "variant_index" -> (() => {
        VisualSchedule.variantIndexMap(s, GtfsPack.predictionState(s)._1); ()
      }))

  /** Probability invariants for the two convolution-bearing queries (X10/X11
    * are procedural — step-discretized convolution with a data-dependent
    * break — so no SQL reconstruction exists; CurvesSpec pins the math on
    * hand-computed cases). Violations must be 0 rows: journey reach
    * probability starts at 1, stays within [0,1], never increases, and
    * carries unchanged over walk legs; transfer rows honour the F8 ≥5 %
    * suppression and the 300 m platform-group radius. */
  private def probCheck(s: SparkSession, dir: String): DataFrame = {
    // unpartitioned window = one journey's component rows (bounded page
    // output, ~4 rows per request) — the WindowExec single-partition WARN
    // this emits is about THIS page-sized stream, never corpus data
    val j = journeyQ(s, dir)
      .withColumn("prev_prob",
        lag("reach_prob", 1).over(Window.orderBy("component_idx")))
    val jviol = j.filter(
      col("reach_prob") < 0 || col("reach_prob") > 1
        || (col("component_idx") === 0 && col("reach_prob") =!= 1.0)
        || (col("prev_prob").isNotNull && col("reach_prob") > col("prev_prob") + 1e-9)
        || (col("kind") === "walk" && col("prev_prob").isNotNull
          && col("reach_prob") =!= col("prev_prob")))
      .select(lit("journey").as("page"),
        col("component_idx").cast("string").as("row_key"))
    val tviol = stopPageTransfer(s, dir)
      // dist_m is page output, rounded to 1 dp — a true 299.96 m platform
      // rounds to 300.0, so only reject values no <300 m distance can
      // round to (>= 300.05, i.e. rounded >= 300.1)
      .filter(col("transfer_prob") < 0.05 || col("transfer_prob") > 1
        || col("dist_m") >= 300.05)
      .select(lit("transfer").as("page"), col("trip_id").as("row_key"))
    jviol.union(tviol).orderBy("page", "row_key")
  }

  private def j8ResolveTrip(s: SparkSession, dir: String): DataFrame = {
    val (sched, _) = GtfsPack.predictionState(s)
    Monitor.resolveTrip(sched, "Downtown", "10", 3, "Stop 1", 8 * 3600 + 30)
      .orderBy("trip_id", "stop_sequence")
  }

  /** Aux inputs for the page/percentile oracles: the batch-prediction rows
    * scalarized (epoch doubles) and their curves exploded to one row per
    * point, plus the per-pair walk-curve lookup. The curve CONTENT is
    * Spark-computed (marker recursion / walk synthesis are not
    * SQL-expressible; both are pinned by CurvesSpec and the curve-invariant
    * queries) — the oracles verify everything DOWNSTREAM: percentile
    * interpolation, window overlap, realtime preference, last-stop and
    * quantile-window filters, ordering, joins, formatting. */
  def oracleAux(s: SparkSession): Map[String, DataFrame] = {
    val (sched, preds) = GtfsPack.predictionState(s)
    val keys = Seq(col("trip_id"), col("trip_start_date"), col("trip_start_time"),
      col("stop_sequence"), col("event_type"))
    val rows = preds.select(keys ++ Seq(col("stop_id"), col("route_id"),
      col("precision_type"), col("origin_type"), col("sample_size"),
      col("prediction_min").cast("double").as("min_epoch"),
      col("prediction_max").cast("double").as("max_epoch")): _*)
    val points = preds
      .select(keys :+ posexplode(col("prediction_curve")): _*)
      .select(keys ++ Seq(col("pos").as("idx"),
        col("col.x").as("x"), col("col.y").as("y")): _*)
    val walk = Monitor.walkCurves(s, sched.stops, maxDistM = 600.0)
      .select(col("from_stop"), col("to_stop"),
        to_json(col("walk_curve")).as("curve_json"))
    // journey reconstruction inputs: each component's relative-time curve —
    // the oracle replays the start curve and both ride-arrival curves from
    // pred_points anyway, but the WALK component's convolved curve (X10's
    // step-discretized recursion with a data-dependent break) rides along
    // from here, pinned numerically by CurvesSpec + monitor_prob_check
    val journeyCurves = journeyFull(s)
      .select(col("component_idx"), posexplode(col("curve")))
      .select(col("component_idx"), col("pos").as("pidx"),
        col("col.x").as("x"), col("col.y").as("y"))
    // transfer-page reconstruction inputs: the arrival⊕walk convolution per
    // extended-platform stop (same X10 recursion; the transfer INTEGRAL over
    // it is fully re-derived in SQL)
    import s.implicits._
    val convRows = Monitor.extendedStops(s, sched.stops, "Stop 2", 300.0)
      .collect().toSeq
      .flatMap { r =>
        val (sid, dist) = (r.getString(0), r.getDouble(1))
        graft.curves.Curves
          .convolve(TransferArrCurve, graft.curves.Curves.walkTimeCurve(dist.toFloat))
          .zipWithIndex.map { case (p, i) => (sid, i, p.x, p.y) }
      }
    val transferConv = convRows.toDF("stop_id", "pidx", "x", "y")
    Map("pred_rows" -> rows, "pred_points" -> points, "walk_pairs" -> walk,
      "journey_curves" -> journeyCurves, "transfer_conv" -> transferConv)
  }

  private val PredKeys = Seq("trip_id", "trip_start_date", "trip_start_time",
    "stop_sequence", "event_type")
  private def keyList(prefix: String = ""): String =
    PredKeys.map(k => if (prefix.isEmpty) k else s"$prefix.$k").mkString(", ")
  private def keyJoin(a: String, b: String): String =
    PredKeys.map(k => s"$a.$k = $b.$k").mkString(" AND ")

  /** CTE block reproducing [[graft.curves.Curves.xAtY]] over the exploded
    * `pred_points` aux: per prediction row, the leftmost segment reaching
    * each target y, linearly interpolated, clamped to the first/last point
    * outside [y0, yN]. Percentile targets are the exact doubles of the f32
    * constants ([[graft.curves.Curves.PredictionPercentiles]]), so the
    * segment choice matches the Scala scan bit for bit, and the interp
    * emulates f32 with a REAL cast after every operation (the only residual
    * difference is double-rounding through f64 ops, ~2⁻²⁹ likely per op —
    * absorbed by the round(4) on outputs).
    * Exposes `ends` (first/last points) and `pq` (one row per prediction
    * with d1…d99). */
  private def quantCtes: String = {
    val ps = Seq(1 -> 0.01f, 5 -> 0.05f, 25 -> 0.25f, 50 -> 0.5f,
      75 -> 0.75f, 95 -> 0.95f, 99 -> 0.99f)
      .map { case (n, f) => s"($n, ${f.toDouble})" }.mkString(", ")
    val dcols = Seq(1, 5, 25, 50, 75, 95, 99)
      .map(n => s"MAX(CASE WHEN pn = $n THEN q END) AS d$n").mkString(",\n                 ")
    s"""
    pp AS (SELECT ${keyList()}, idx, x::DOUBLE AS x, y::DOUBLE AS y
           FROM read_parquet('__VOUT__/_aux/pred_points/*.parquet')),
    ends AS (SELECT ${keyList()},
                    MIN_BY(x, idx) AS fx, MIN_BY(y, idx) AS fy,
                    MAX_BY(x, idx) AS lx, MAX_BY(y, idx) AS ly
             FROM pp GROUP BY ${keyList()}),
    ps(pn, pv) AS (VALUES $ps),
    seg AS (SELECT *, LAG(x) OVER w AS px, LAG(y) OVER w AS py
            FROM pp WINDOW w AS (PARTITION BY ${keyList()} ORDER BY idx)),
    cand AS (SELECT ${keyList("seg")}, pn,
                    -- f32 emulation (REAL cast after every op): the Scala
                    -- side interpolates in Float, and a f64 result landing
                    -- an ulp under an integer flips TRUNC-based labels
                    CAST(px + CAST(CAST(x - px AS REAL)
                      * CAST(CAST(pv - py AS REAL) / CAST(y - py AS REAL) AS REAL)
                      AS REAL) AS REAL) AS q,
                    ROW_NUMBER() OVER (PARTITION BY ${keyList("seg")}, pn
                                       ORDER BY idx) AS rn
             FROM seg CROSS JOIN ps WHERE y >= pv),
    quant AS (SELECT ${keyList("e")}, p.pn,
                     CASE WHEN p.pv <= e.fy THEN e.fx
                          WHEN p.pv >= e.ly THEN e.lx
                          ELSE c.q END AS q
              FROM ends e CROSS JOIN ps p
              LEFT JOIN cand c ON ${keyJoin("c", "e")} AND c.pn = p.pn AND c.rn = 1),
    pq AS (SELECT ${keyList()},
                 $dcols
           FROM quant GROUP BY ${keyList()})"""
  }

  /** Generic CTE block: f32-emulated piecewise-linear curve evaluation over
    * `pts`(keys..., pidx, x, y) for every row of `tgt`(keys..., carry...,
    * tv). Mode "xAtY" = leftmost x reaching y ([[graft.curves.Curves.xAtY]]);
    * "yAtX" = clamped CDF evaluation ([[graft.curves.Curves.yAtX]]). Emits
    * `$out`(keys, carry, v) plus `${out}_ends` (first/last points per key).
    * (keys ++ carry) must identify a target row. Same REAL-cast-per-op f32
    * emulation and double-rounding caveat as [[quantCtes]]. */
  private def interpCte(out: String, pts: String, keys: Seq[String],
                        tgt: String, carry: Seq[String], mode: String): String = {
    val kl = keys.mkString(", ")
    val partition = if (keys.isEmpty) "" else s"PARTITION BY $kl "
    val groupBy = if (keys.isEmpty) "" else s"GROUP BY $kl"
    val tCols = (keys ++ carry).map(c => s"t.$c").mkString(", ")
    val outCols = keys ++ carry
    val joinTG = if (keys.isEmpty) "1 = 1" else keys.map(k => s"g.$k = t.$k").mkString(" AND ")
    val joinTE = if (keys.isEmpty) "1 = 1" else keys.map(k => s"e.$k = t.$k").mkString(" AND ")
    val joinTC = outCols.map(k => s"c.$k = t.$k").mkString(" AND ")
    // the chosen segment always has py < tv <= y (xAtY) / px < tv <= x
    // (yAtX) — the leftmost-match rule plus the clamp cases make the
    // denominator strictly positive, exactly as in the Scala scan
    val cond = if (mode == "xAtY") "g.y >= t.tv" else "g.pidx >= 1 AND g.x >= t.tv"
    val interp =
      if (mode == "xAtY")
        """CAST(g.px + CAST(CAST(g.x - g.px AS REAL)
           * CAST(CAST(t.tv - g.py AS REAL) / CAST(g.y - g.py AS REAL) AS REAL)
           AS REAL) AS REAL)"""
      else
        """CASE WHEN g.x = g.px THEN g.y ELSE
           CAST(g.py + CAST(CAST(g.y - g.py AS REAL)
           * CAST(CAST(t.tv - g.px AS REAL) / CAST(g.x - g.px AS REAL) AS REAL)
           AS REAL) AS REAL) END"""
    val clampLo = if (mode == "xAtY") "t.tv <= e.fy THEN e.fx" else "t.tv <= e.fx THEN e.fy"
    val clampHi = if (mode == "xAtY") "t.tv >= e.ly THEN e.lx" else "t.tv >= e.lx THEN e.ly"
    s"""
    ${out}_ends AS (SELECT ${if (keys.isEmpty) "1 AS __k" else kl},
                           MIN_BY(x, pidx) AS fx, MIN_BY(y, pidx) AS fy,
                           MAX_BY(x, pidx) AS lx, MAX_BY(y, pidx) AS ly
                    FROM $pts $groupBy),
    ${out}_seg AS (SELECT *, LAG(x) OVER w AS px, LAG(y) OVER w AS py
                   FROM $pts WINDOW w AS (${partition}ORDER BY pidx)),
    ${out}_cand AS (SELECT $tCols, t.tv, $interp AS v,
                           ROW_NUMBER() OVER (PARTITION BY $tCols ORDER BY g.pidx) AS rn
                    FROM $tgt t JOIN ${out}_seg g ON $joinTG AND $cond),
    $out AS (SELECT $tCols, t.tv,
                    CASE WHEN $clampLo WHEN $clampHi ELSE c.v END AS v
             FROM $tgt t
             JOIN ${out}_ends e ON $joinTE
             LEFT JOIN ${out}_cand c ON $joinTC AND c.rn = 1)"""
  }

  /** DuckDB oracle for [[heatStrip]]: re-derives every pixel from the
    * hash-verified `pred_points` / `pred_rows` aux — cumulative samples via
    * the f32-emulated yAtX [[interpCte]], f32 de-cumulation and max-clamp,
    * the reference's f32 crop expression widened to DOUBLE, and the
    * d3/colorous uniform cubic basis-spline gradient over the shared
    * ColorBrewer anchors (VALUES generated from [[graft.gtfs.HeatStrip]]'s
    * arrays INCLUDING the reflected phantom endpoints at index −1/9, so
    * both engines read one table and the spline's 4-point window is a plain
    * 4-way index join). The spline expression mirrors
    * [[graft.gtfs.HeatStrip.color]] term for term — identical f64 operation
    * order, so ROUND sees bit-identical inputs. Gradient index 1/2 = the
    * event_type codes. */
  private def heatStripSql: String = {
    val w = HeatStripWidth
    // indices −1..9: row −1 = 2·v₀−v₁, row 9 = 2·v₈−v₇ (d3's reflected
    // phantom endpoints), rows 0..8 the published anchors
    val anchors = Seq(1 -> graft.gtfs.HeatStrip.YlOrBr,
        2 -> graft.gtfs.HeatStrip.YlGnBu).flatMap { case (gi, a) =>
      def ref(p: (Int, Int, Int), q: (Int, Int, Int)) =
        (2 * p._1 - q._1, 2 * p._2 - q._2, 2 * p._3 - q._3)
      val ext = (ref(a(0), a(1)) +: a.toSeq) :+ ref(a(8), a(7))
      ext.zipWithIndex.map { case ((r, g, b), i) =>
        s"($gi, ${i - 1}, $r, $g, $b)"
      }
    }.mkString(", ")
    s"""
    WITH pp AS (SELECT ${keyList()}, idx AS pidx, x, y
                FROM read_parquet('__VOUT__/_aux/pred_points/*.parquet')),
    hs_rows AS (SELECT ${keyList()}, min_epoch
                FROM read_parquet('__VOUT__/_aux/pred_rows/*.parquet')
                WHERE stop_id = 'S2'),
    hs_win AS (SELECT MIN(min_epoch) AS w0, MAX(max_epoch) AS w1
               FROM read_parquet('__VOUT__/_aux/pred_rows/*.parquet')
               WHERE stop_id = 'S2'),
    hs_x0 AS (SELECT ${keyList()}, MIN_BY(x, pidx) AS x0 FROM pp
              GROUP BY ${keyList()}),
    hs_tgt AS (SELECT ${keyList("r")}, g.i AS pxi,
                      CAST(w.w0 + (w.w1 - w.w0) / $w * g.i
                           - (r.min_epoch - a.x0::DOUBLE) AS REAL) AS tv
               FROM hs_rows r CROSS JOIN hs_win w
               CROSS JOIN generate_series(0, $w) AS g(i)
               JOIN hs_x0 a ON ${keyJoin("a", "r")}),
    ${interpCte("hv", "pp", PredKeys, "hs_tgt", Seq("pxi"), "yAtX")},
    hs_cum AS (SELECT ${keyList()}, pxi, CAST(v AS REAL) AS c FROM hv),
    hs_unc AS (SELECT ${keyList("a")}, a.pxi AS px, a.c AS pc,
                      CAST(b.c - a.c AS REAL) AS u
               FROM hs_cum a JOIN hs_cum b
                 ON ${keyJoin("a", "b")} AND b.pxi = a.pxi + 1),
    hs_mx AS (SELECT ${keyList()}, GREATEST(MAX(u), CAST(0.05 AS REAL)) AS m
              FROM hs_unc GROUP BY ${keyList()}),
    hs_t AS (SELECT ${keyList("u")}, u.px,
                    CASE WHEN u.pc > CAST(0.01 AS REAL) AND u.pc < CAST(0.99 AS REAL)
                         THEN CAST(CAST(CAST(0.2 AS REAL)
                              + CAST(CAST(u.u / m.m AS REAL) * CAST(0.6 AS REAL) AS REAL)
                              AS REAL) AS DOUBLE)
                         WHEN u.pc > 0 AND u.pc < 1 THEN 0.0
                         ELSE NULL END AS t
             FROM hs_unc u JOIN hs_mx m ON ${keyJoin("u", "m")}),
    hs_anchors(gi, i, ar, ag, ab) AS (VALUES $anchors),
    hs_seg AS (SELECT ${keyList("t")}, t.px, t.t,
                      LEAST(CAST(FLOOR(t.t * 8) AS INT), 7) AS seg,
                      t.t * 8 - LEAST(CAST(FLOOR(t.t * 8) AS INT), 7) AS t1
               FROM hs_t t),
    hs_w AS (SELECT *, t1 * t1 AS t2, t1 * t1 * t1 AS t3 FROM hs_seg),
    hs_col AS (SELECT ${keyList("w")}, w.px,
                      CASE WHEN w.t IS NULL THEN 255
                           ELSE GREATEST(0, LEAST(255, CAST(ROUND(
                             ((1 - 3 * w.t1 + 3 * w.t2 - w.t3) * a0.ar
                              + (4 - 6 * w.t2 + 3 * w.t3) * a1.ar
                              + (1 + 3 * w.t1 + 3 * w.t2 - 3 * w.t3) * a2.ar
                              + w.t3 * a3.ar) / 6) AS INT))) END AS r,
                      CASE WHEN w.t IS NULL THEN 255
                           ELSE GREATEST(0, LEAST(255, CAST(ROUND(
                             ((1 - 3 * w.t1 + 3 * w.t2 - w.t3) * a0.ag
                              + (4 - 6 * w.t2 + 3 * w.t3) * a1.ag
                              + (1 + 3 * w.t1 + 3 * w.t2 - 3 * w.t3) * a2.ag
                              + w.t3 * a3.ag) / 6) AS INT))) END AS g,
                      CASE WHEN w.t IS NULL THEN 255
                           ELSE GREATEST(0, LEAST(255, CAST(ROUND(
                             ((1 - 3 * w.t1 + 3 * w.t2 - w.t3) * a0.ab
                              + (4 - 6 * w.t2 + 3 * w.t3) * a1.ab
                              + (1 + 3 * w.t1 + 3 * w.t2 - 3 * w.t3) * a2.ab
                              + w.t3 * a3.ab) / 6) AS INT))) END AS b
               FROM hs_w w
               LEFT JOIN hs_anchors a0 ON a0.gi = w.event_type AND a0.i = w.seg - 1
               LEFT JOIN hs_anchors a1 ON a1.gi = w.event_type AND a1.i = w.seg
               LEFT JOIN hs_anchors a2 ON a2.gi = w.event_type AND a2.i = w.seg + 1
               LEFT JOIN hs_anchors a3 ON a3.gi = w.event_type AND a3.i = w.seg + 2)
    SELECT ${keyList()}, CAST(px AS INT) AS px, r, g, b, 255 AS a
    FROM hs_col ORDER BY ${keyList()}, px"""
  }

  private val RouteTypeLabelCase = """CASE r.route_type
      WHEN 0 THEN 'Tram' WHEN 1 THEN 'Subway' WHEN 2 THEN 'Rail'
      WHEN 3 THEN 'Bus' WHEN 4 THEN 'Ferry' WHEN 5 THEN 'CableCar'
      WHEN 6 THEN 'Gondola' WHEN 7 THEN 'Funicular' WHEN 200 THEN 'Coach'
      WHEN 1100 THEN 'Air' WHEN 1500 THEN 'Taxi' ELSE '?' END"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f5_window_overlap" -> (f5WindowOverlap _),
    "f7_last_stop" -> (f7LastStop _),
    "f11_autocomplete" -> (f11Autocomplete _),
    "a15_watermark" -> (a15Watermark _),
    "st4_backfill_batches" -> (st4BackfillBatches _),
    // 0-row INVARIANT (EXCEPT of a set against its superset); non-trivial
    // because so1_union (5 rows) proves the unioned inputs are non-empty
    "so4_except" -> (so4Except _),
    "x12_format" -> (x12Format _),
    "monitor_stop_page" -> (stopPage _),
    "monitor_stop_page_transfer" -> (stopPageTransfer _),
    "monitor_trip_page" -> (tripPage _),
    "monitor_journey" -> (journeyQ _),
    "monitor_heat_strip" -> (heatStrip _),
    "w8_percentiles" -> (w8Percentiles _),
    "x9_walk_curves" -> (x9WalkCurves _),
    "j8_resolve_trip" -> (j8ResolveTrip _),
    // 0-row INVARIANT (rows = probability-axiom violations); non-trivial
    // because monitor_journey (4 rows) proves the checked journey exists
    "monitor_prob_check" -> (probCheck _)
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
    // ST4 batch recurrence as a recursive CTE: each step's end is
    // min(buffer, max(from + 360 s, the 1000th start after from — or the
    // last available when fewer remain)); no starts left → the mark jumps
    // straight to the buffer end. idx ranks the horizon once so "the
    // 1000th after from" is one indexed lookup per step.
    "st4_backfill_batches" -> {
      val buf = St4From + ScheduledPredictions.BufferSecs
      s"""
      WITH RECURSIVE
      idx AS (
        SELECT e, ROW_NUMBER() OVER (ORDER BY e) AS rn FROM (
          SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events)
        WHERE e > $St4From AND e <= $buf),
      b(batch_idx, from_epoch, end_epoch) AS (
        SELECT 0, CAST($St4From AS BIGINT), CAST($St4From AS BIGINT)
        UNION ALL
        SELECT batch_idx + 1, end_epoch,
          CASE WHEN t.tgt IS NULL THEN CAST($buf AS BIGINT)
               ELSE CAST(LEAST($buf, GREATEST(end_epoch + ${ScheduledPredictions.MinBatchSecs}, t.tgt)) AS BIGINT) END
        FROM b, LATERAL (SELECT COALESCE(
           (SELECT i.e FROM idx i WHERE i.rn =
              (SELECT COALESCE(max(i2.rn), 0) FROM idx i2 WHERE i2.e <= b.end_epoch)
                + ${ScheduledPredictions.MinBatchTrips}),
           (SELECT max(i3.e) FROM idx i3 WHERE i3.e > b.end_epoch)) AS tgt) t
        WHERE b.end_epoch < $buf AND b.batch_idx < $St4MaxBatches)
      SELECT batch_idx, from_epoch, end_epoch,
        (SELECT count(*) FROM idx i WHERE i.e > o.from_epoch AND i.e <= o.end_epoch)
          AS trip_count
      FROM b o WHERE batch_idx > 0 ORDER BY batch_idx"""
    },
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
    "monitor_prob_check" -> """
      SELECT CAST(NULL AS VARCHAR) AS page, CAST(NULL AS VARCHAR) AS row_key
      WHERE 1 = 0""",
    // W8 percentile extraction, recomputed from the exploded curve points.
    "w8_percentiles" -> s"""
      WITH $quantCtes
      SELECT ${keyList()},
             ROUND(d1, 4) AS delay_1, ROUND(d5, 4) AS delay_5,
             ROUND(d25, 4) AS delay_25, ROUND(d50, 4) AS delay_50,
             ROUND(d75, 4) AS delay_75, ROUND(d95, 4) AS delay_95,
             ROUND(d99, 4) AS delay_99
      FROM pq ORDER BY ${keyList()}""",
    // Trip page: vehicle filter, percentile instants (anchor = min_epoch −
    // first curve x, mirroring the decimal(18,6) interval casts as ROUND 6),
    // stop-name join, ordering (monitor/mod.rs:690-795).
    "monitor_trip_page" -> s"""
      WITH $quantCtes,
      pr AS (SELECT * FROM read_parquet('__VOUT__/_aux/pred_rows/*.parquet')),
      veh AS (SELECT * FROM pr
              WHERE trip_id = 'T1' AND trip_start_date = DATE '2024-03-04'
                AND trip_start_time = 28830
                AND ((stop_sequence = 10 AND event_type = 2)
                  OR (stop_sequence > 10 AND event_type = 1))),
      j AS (SELECT veh.*, pq.d1, pq.d50, pq.d99, e.fx,
                   veh.min_epoch - ROUND(e.fx, 6) AS anchor
            FROM veh
            JOIN pq ON ${keyJoin("pq", "veh")}
            JOIN ends e ON ${keyJoin("e", "veh")})
      SELECT j.route_id, j.trip_id, j.stop_sequence, j.event_type, s.stop_name,
             ROUND(anchor, 4) AS sched_epoch,
             ROUND(anchor + ROUND(d1, 6), 4) AS q1_epoch,
             ROUND(anchor + ROUND(d50, 6), 4) AS median_epoch,
             ROUND(anchor + ROUND(d99, 6), 4) AS q99_epoch,
             j.precision_type, j.origin_type, j.sample_size
      FROM j LEFT JOIN read_parquet('__VOUT__/_aux/sched_stops/*.parquet') s
        ON s.stop_id = j.stop_id
      ORDER BY j.stop_sequence, j.event_type""",
    // Stop page: extended platform group (haversine < 300 m), F5 overlap,
    // F6 quantile-window trim, W6 realtime preference, F7 last-stop drop,
    // route join + X12/X13 labels, W5 median order (monitor/mod.rs:426-591).
    "monitor_stop_page" -> s"""
      WITH $quantCtes,
      pr AS (SELECT * FROM read_parquet('__VOUT__/_aux/pred_rows/*.parquet')),
      st AS (SELECT * FROM read_parquet('__VOUT__/_aux/sched_stops/*.parquet')),
      named AS (SELECT stop_lat AS a_lat, stop_lon AS a_lon FROM st
                WHERE stop_name = 'Stop 2'),
      ext AS (SELECT s.stop_id FROM st s CROSS JOIN named
              WHERE ${Geo.duckDbHaversineSql("named.a_lat", "named.a_lon",
                "s.stop_lat", "s.stop_lon")} < 300.0
              GROUP BY s.stop_id),
      win AS (SELECT epoch(TIMESTAMP '2024-03-04 00:00:00') AS ws,
                     epoch(TIMESTAMP '2024-03-05 00:00:00') AS we),
      ov AS (SELECT pr.* FROM pr
             JOIN ext ON ext.stop_id = pr.stop_id CROSS JOIN win
             WHERE pr.event_type = 2 AND pr.min_epoch < win.we
               AND pr.max_epoch > win.ws),
      q AS (SELECT ov.*, pq.d5, pq.d50, pq.d95,
                   ov.min_epoch - ROUND(e.fx, 6) AS anchor
            FROM ov
            JOIN pq ON ${keyJoin("pq", "ov")}
            JOIN ends e ON ${keyJoin("e", "ov")}),
      f6 AS (SELECT q.* FROM q CROSS JOIN win
             WHERE anchor + ROUND(d5, 6) < win.we
               AND anchor + ROUND(d95, 6) > win.ws),
      w6 AS (SELECT *, MAX(CASE WHEN origin_type = 1 THEN 1 ELSE 0 END)
                         OVER (PARTITION BY route_id, trip_start_date,
                                            trip_start_time) AS has_rt
             FROM f6),
      w6f AS (SELECT * FROM w6 WHERE has_rt = 0 OR origin_type = 1),
      last AS (SELECT trip_id, MAX(stop_sequence) AS last_seq
               FROM read_parquet('__VOUT__/_aux/sched_stop_times/*.parquet')
               GROUP BY trip_id),
      nl AS (SELECT w.* FROM w6f w JOIN last l ON l.trip_id = w.trip_id
             WHERE w.stop_sequence < l.last_seq)
      SELECT nl.route_id, r.route_short_name,
             $RouteTypeLabelCase AS route_type_label,
             nl.trip_id, nl.stop_sequence,
             ROUND(anchor + ROUND(d50, 6), 4) AS median_epoch,
             printf('%+d', CAST(TRUNC(d50) AS INT)) AS delay_label,
             nl.precision_type, nl.origin_type, nl.sample_size
      FROM nl LEFT JOIN read_parquet('__VOUT__/_aux/sched_routes/*.parquet') r
        ON r.route_id = nl.route_id
      ORDER BY median_epoch, nl.trip_id""",
    // F8/X11 full-row reconstruction: the whole stop page re-derived as in
    // monitor_stop_page (window trim, W6 realtime preference, F7, labels)
    // with the platform-group DISTANCE kept, then the transfer probability
    // integral (time_curve.rs:18-32) replayed in SQL — 100 arrival
    // percentiles through the arrival⊕walk curve (xAtY), each evaluated
    // against the departure CDF (yAtX), summed and complemented — and the
    // F8 ≥5 % gate applied to the rounded value. Only the convolved
    // arrival⊕walk curve itself (X10's recursion) comes from the
    // transfer_conv dump.
    "monitor_stop_page_transfer" -> s"""
      WITH $quantCtes,
      pr AS (SELECT * FROM read_parquet('__VOUT__/_aux/pred_rows/*.parquet')),
      st AS (SELECT * FROM read_parquet('__VOUT__/_aux/sched_stops/*.parquet')),
      named AS (SELECT stop_lat AS a_lat, stop_lon AS a_lon FROM st
                WHERE stop_name = 'Stop 2'),
      ext AS (SELECT s.stop_id, MIN(${Geo.duckDbHaversineSql("named.a_lat",
                "named.a_lon", "s.stop_lat", "s.stop_lon")}) AS dist_m
              FROM st s CROSS JOIN named
              WHERE ${Geo.duckDbHaversineSql("named.a_lat", "named.a_lon",
                "s.stop_lat", "s.stop_lon")} < 300.0
              GROUP BY s.stop_id),
      win AS (SELECT epoch(TIMESTAMP '2024-03-04 00:00:00') AS ws,
                     epoch(TIMESTAMP '2024-03-05 00:00:00') AS we),
      ov AS (SELECT pr.*, ext.dist_m FROM pr
             JOIN ext ON ext.stop_id = pr.stop_id CROSS JOIN win
             WHERE pr.event_type = 2 AND pr.min_epoch < win.we
               AND pr.max_epoch > win.ws),
      q AS (SELECT ov.*, pq.d5, pq.d50, pq.d95,
                   ov.min_epoch - ROUND(e.fx, 6) AS anchor
            FROM ov
            JOIN pq ON ${keyJoin("pq", "ov")}
            JOIN ends e ON ${keyJoin("e", "ov")}),
      f6 AS (SELECT q.* FROM q CROSS JOIN win
             WHERE anchor + ROUND(d5, 6) < win.we
               AND anchor + ROUND(d95, 6) > win.ws),
      w6 AS (SELECT *, MAX(CASE WHEN origin_type = 1 THEN 1 ELSE 0 END)
                         OVER (PARTITION BY route_id, trip_start_date,
                                            trip_start_time) AS has_rt
             FROM f6),
      w6f AS (SELECT * FROM w6 WHERE has_rt = 0 OR origin_type = 1),
      last AS (SELECT trip_id, MAX(stop_sequence) AS last_seq
               FROM read_parquet('__VOUT__/_aux/sched_stop_times/*.parquet')
               GROUP BY trip_id),
      nl AS (SELECT w.* FROM w6f w JOIN last l ON l.trip_id = w.trip_id
             WHERE w.stop_sequence < l.last_seq),
      cpts AS (SELECT stop_id, pidx, x::DOUBLE AS x, y::DOUBLE AS y
               FROM read_parquet('__VOUT__/_aux/transfer_conv/*.parquet')),
      pct AS (SELECT UNNEST(generate_series(0, 99)) AS p),
      ct AS (SELECT c.stop_id, pct.p,
                    CAST(CAST(pct.p AS REAL) / CAST(100 AS REAL) AS REAL) AS tv
             FROM (SELECT DISTINCT stop_id FROM cpts) c CROSS JOIN pct),
      ${interpCte("cx", "cpts", Seq("stop_id"), "ct", Seq("p"), "xAtY")},
      dpp AS (SELECT ${keyList()}, idx AS pidx, x, y FROM pp),
      dt AS (SELECT ${keyList("n")}, c.p,
                    -- reference double truncation (time_curve.rs:80-97)
                    CAST(TRUNC(epoch(TIMESTAMP '2024-03-04 07:55:00') + TRUNC(c.v)
                         - (FLOOR(n.min_epoch) - e.fx)) AS REAL) AS tv
             FROM nl n
             JOIN ends e ON ${keyJoin("e", "n")}
             JOIN cx c ON c.stop_id = n.stop_id),
      ${interpCte("dv", "dpp", PredKeys, "dt", Seq("p"), "yAtX")},
      tp AS (SELECT ${keyList()},
                    ROUND(1.0 - SUM(CAST(CAST(v AS REAL) / CAST(100 AS REAL) AS REAL)),
                          4) AS transfer_prob
             FROM dv GROUP BY ${keyList()})
      SELECT nl.route_id, r.route_short_name,
             $RouteTypeLabelCase AS route_type_label,
             nl.trip_id, nl.stop_sequence,
             printf('%+d', CAST(TRUNC(d50) AS INT)) AS delay_label,
             nl.precision_type, nl.origin_type, nl.sample_size,
             ROUND(nl.dist_m, 1) AS dist_m, tp.transfer_prob,
             ROUND(anchor + ROUND(d50, 6), 4) AS median_epoch
      FROM nl
      JOIN tp ON ${keyJoin("tp", "nl")}
      LEFT JOIN read_parquet('__VOUT__/_aux/sched_routes/*.parquet') r
        ON r.route_id = nl.route_id
      WHERE tp.transfer_prob >= 0.05
      ORDER BY median_epoch, nl.trip_id""",
    // X10/X11 journey composition re-derived leg by leg: the start curve and
    // both ride predictions come from the pred dumps; transfer reach
    // probabilities are the full 100-percentile integral in SQL; anchors are
    // FLOOR(min_epoch) − first-point-x exactly as Monitor.journey's
    // unix_timestamp re-anchoring; medians are xAtY(curve, 0.5). Only the
    // walk component's convolved curve (X10) rides along from the
    // journey_curves dump.
    "monitor_heat_strip" -> heatStripSql,
    "monitor_journey" -> s"""
      WITH jc AS (SELECT component_idx, pidx, x::DOUBLE AS x, y::DOUBLE AS y
                  FROM read_parquet('__VOUT__/_aux/journey_curves/*.parquet')),
      pp0 AS (SELECT trip_id, trip_start_time, stop_sequence, event_type,
                     idx AS pidx, x::DOUBLE AS x, y::DOUBLE AS y
              FROM read_parquet('__VOUT__/_aux/pred_points/*.parquet')
              WHERE trip_start_date = DATE '2024-03-04'),
      pr0 AS (SELECT trip_id, trip_start_time, stop_sequence, event_type, min_epoch
              FROM read_parquet('__VOUT__/_aux/pred_rows/*.parquet')
              WHERE trip_start_date = DATE '2024-03-04'),
      xpts AS (
        SELECT 'j0' AS src, pidx, x, y FROM jc WHERE component_idx = 0
        UNION ALL SELECT 'j2', pidx, x, y FROM jc WHERE component_idx = 2
        UNION ALL SELECT 'arr1', pidx, x, y FROM pp0
          WHERE trip_id = 'T1' AND trip_start_time = 28830
            AND stop_sequence = 30 AND event_type = 1
        UNION ALL SELECT 'arr2', pidx, x, y FROM pp0
          WHERE trip_id = 'T1sub' AND trip_start_time = 36030
            AND stop_sequence = 50 AND event_type = 1),
      pct AS (SELECT UNNEST(generate_series(0, 99)) AS p),
      xt AS (
        SELECT s.src, pct.p,
               CAST(CAST(pct.p AS REAL) / CAST(100 AS REAL) AS REAL) AS tv
        FROM pct CROSS JOIN (SELECT UNNEST(['j0', 'j2']) AS src) s
        UNION ALL
        SELECT s.src, -1 AS p, CAST(0.5 AS REAL) AS tv
        FROM (SELECT UNNEST(['j0', 'j2', 'arr1', 'arr2']) AS src) s),
      ${interpCte("xv", "xpts", Seq("src"), "xt", Seq("p"), "xAtY")},
      anchors AS (SELECT
        epoch(TIMESTAMP '2024-03-04 07:55:00') AS a0,
        (SELECT FLOOR(r.min_epoch) - e.fx FROM pr0 r, xv_ends e
          WHERE r.trip_id = 'T1' AND r.trip_start_time = 28830
            AND r.stop_sequence = 30 AND r.event_type = 1 AND e.src = 'arr1') AS a1,
        (SELECT FLOOR(r.min_epoch) - e.fx FROM pr0 r, xv_ends e
          WHERE r.trip_id = 'T1sub' AND r.trip_start_time = 36030
            AND r.stop_sequence = 50 AND r.event_type = 1 AND e.src = 'arr2') AS a3),
      dpts AS (
        SELECT 'dep1' AS src, pidx, x, y FROM pp0
          WHERE trip_id = 'T1' AND trip_start_time = 28830
            AND stop_sequence = 10 AND event_type = 2
        UNION ALL SELECT 'dep2', pidx, x, y FROM pp0
          WHERE trip_id = 'T1sub' AND trip_start_time = 36030
            AND stop_sequence = 40 AND event_type = 2),
      danch AS (SELECT
        (SELECT FLOOR(min_epoch) FROM pr0 WHERE trip_id = 'T1'
          AND trip_start_time = 28830 AND stop_sequence = 10 AND event_type = 2)
        - (SELECT MIN_BY(x, pidx) FROM dpts WHERE src = 'dep1') AS da1,
        (SELECT FLOOR(min_epoch) FROM pr0 WHERE trip_id = 'T1sub'
          AND trip_start_time = 36030 AND stop_sequence = 40 AND event_type = 2)
        - (SELECT MIN_BY(x, pidx) FROM dpts WHERE src = 'dep2') AS da2),
      dt AS (
        -- double truncation as the reference (time_curve.rs:80-97): x_at_y
        -- as i64 toward zero, then num_seconds() of the difference — every
        -- percentile hits the departure CDF at a whole-second offset
        SELECT 'dep1' AS src, xv.p,
               CAST(TRUNC(a.a0 + TRUNC(xv.v) - d.da1) AS REAL) AS tv
        FROM xv, anchors a, danch d WHERE xv.src = 'j0' AND xv.p >= 0
        UNION ALL
        SELECT 'dep2', xv.p, CAST(TRUNC(a.a1 + TRUNC(xv.v) - d.da2) AS REAL)
        FROM xv, anchors a, danch d WHERE xv.src = 'j2' AND xv.p >= 0),
      ${interpCte("dv", "dpts", Seq("src"), "dt", Seq("p"), "yAtX")},
      totals AS (SELECT src,
                        SUM(CAST(CAST(v AS REAL) / CAST(100 AS REAL) AS REAL)) AS miss
                 FROM dv GROUP BY src),
      probs AS (SELECT
        (SELECT 1.0 - miss FROM totals WHERE src = 'dep1') AS p1,
        (SELECT (1.0 - (SELECT miss FROM totals WHERE src = 'dep1'))
              * (1.0 - (SELECT miss FROM totals WHERE src = 'dep2'))) AS p3),
      meds AS (SELECT
        (SELECT v FROM xv WHERE src = 'j0' AND p = -1) AS m0x,
        (SELECT v FROM xv WHERE src = 'arr1' AND p = -1) AS m1x,
        (SELECT v FROM xv WHERE src = 'j2' AND p = -1) AS m2x,
        (SELECT v FROM xv WHERE src = 'arr2' AND p = -1) AS m3x)
      SELECT * FROM (
        SELECT 0 AS component_idx, 'start' AS kind, '' AS trip_id,
               1.0 AS reach_prob, ROUND(a.a0, 2) AS anchor_epoch,
               ROUND(a.a0 + m.m0x, 2) AS median_epoch
        FROM anchors a, meds m
        UNION ALL
        SELECT 1, 'ride', 'T1', ROUND(pb.p1, 4), ROUND(a.a1, 2),
               ROUND(a.a1 + m.m1x, 2)
        FROM anchors a, meds m, probs pb
        UNION ALL
        SELECT 2, 'walk', '', ROUND(pb.p1, 4), ROUND(a.a1, 2),
               ROUND(a.a1 + m.m2x, 2)
        FROM anchors a, meds m, probs pb
        UNION ALL
        SELECT 3, 'ride', 'T1sub', ROUND(pb.p3, 4), ROUND(a.a3, 2),
               ROUND(a.a3 + m.m3x, 2)
        FROM anchors a, meds m, probs pb)
      ORDER BY component_idx""",
    // X9 pairs re-derived by plain all-pairs haversine (the Spark side uses
    // the grid-bucketed join); curves via the walk_pairs lookup — LEFT join,
    // so a pair the Spark side missed still surfaces as a row diff.
    "x9_walk_curves" -> s"""
      WITH st AS (SELECT stop_id, stop_lat, stop_lon
                  FROM read_parquet('__VOUT__/_aux/sched_stops/*.parquet')),
      pairs AS (SELECT a.stop_id AS from_stop, b.stop_id AS to_stop,
                       ${Geo.duckDbHaversineSql("a.stop_lat", "a.stop_lon",
                         "b.stop_lat", "b.stop_lon")} AS dist
                FROM st a JOIN st b ON a.stop_id < b.stop_id
                WHERE ${Geo.duckDbHaversineSql("a.stop_lat", "a.stop_lon",
                  "b.stop_lat", "b.stop_lon")} <= 600.0)
      SELECT p.from_stop, p.to_stop, ROUND(p.dist, 3) AS dist_m,
             w.curve_json AS walk_curve
      FROM pairs p
      LEFT JOIN read_parquet('__VOUT__/_aux/walk_pairs/*.parquet') w
        ON w.from_stop = p.from_stop AND w.to_stop = p.to_stop
      ORDER BY p.from_stop, p.to_stop""",
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
