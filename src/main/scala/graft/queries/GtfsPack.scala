package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gtfs._

/** The GTFS domain pipeline (SURVEY.md §3.1-§3.3) surfaced as driver-runnable
  * queries. These run the REAL engine paths — protobuf decode (S3), schedule
  * join (J1/J2), last-writer-wins records (W2), gap-fill (J5), specific and
  * default curve builds (A3-A10), batch prediction (ST4 analogue) — over the
  * deterministic GTFS fixture set (the reference ships no test data,
  * SURVEY.md §5). Curve construction is not SQL-expressible, so these are
  * rows-only checks; the curve *semantics* are pinned by CurvesSpec /
  * GtfsPipelineSpec property tests, and the scalar dimensions (time slot,
  * route section, GTFS time, haversine) are DuckDB-checked in ScalarPack.
  */
object GtfsPack extends QueryPack {

  // Fixture + pipeline results are built once per JVM and cached: Verify and
  // Bench call every query in sequence, and the inputs are identical.
  private lazy val dirs: (String, String) = FixtureLocator.create()

  private var cache: Option[(SparkSession, GtfsSchedule, DataFrame)] = None
  private var curveCache: Option[(SparkSession,
    org.apache.spark.sql.Dataset[SpecificCurveRow],
    org.apache.spark.sql.Dataset[DefaultCurveRow])] = None
  // the three default-curve rollup levels, cached so the query table and the
  // oracle's point dump read ONE materialization — the f32 contributor means
  // are summation-order-sensitive, so recomputing them per consumer could
  // differ by an ulp and flake the gtfs_default_curves oracle
  private var rollCache: Option[(SparkSession,
    (org.apache.spark.sql.Dataset[DefaultCurveRow],
     org.apache.spark.sql.Dataset[DefaultCurveRow],
     org.apache.spark.sql.Dataset[DefaultCurveRow]))] = None

  /** Wall seconds of each one-time fixture build phase (filled on first
    * touch) — Bench reports them in setup_detail so regressions in the
    * setup ledger are attributable. */
  val setupTimings = scala.collection.concurrent.TrieMap[String, Double]()
  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    setupTimings.put(name, (System.nanoTime() - t0) / 1e9)
    r
  }

  private def pipeline(s: SparkSession): (GtfsSchedule, DataFrame) = synchronized {
    cache match {
      case Some((sess, sched, recs)) if sess eq s => (sched, recs)
      case _ =>
        val (schedDir, rtDir) = timed("fixture_files")(dirs)
        val sched = timed("schedule_load")(GtfsSchedule.load(s, schedDir))
        val recs = timed("rt_import") {
          // localCheckpoint over cache for the same reason as
          // predictionState: every downstream query re-analyzes this
          // lineage per DataFrame op when it is merely cached
          Importer.importDirectory(s, rtDir, sched, "graft").localCheckpoint()
        }
        cache = Some((s, sched, recs))
        (sched, recs)
    }
  }

  /** The two curve tables feed three queries — build once per session. */
  private def curves(s: SparkSession): (org.apache.spark.sql.Dataset[SpecificCurveRow],
                                        org.apache.spark.sql.Dataset[DefaultCurveRow]) = synchronized {
    curveCache match {
      case Some((sess, sc, dc)) if sess eq s => (sc, dc)
      case _ =>
        val (sched, recs) = pipeline(s)
        // the two curve tables read the same cached records independently —
        // build them on parallel threads (join() publishes the vars)
        var sc: org.apache.spark.sql.Dataset[SpecificCurveRow] = null
        var dc: org.apache.spark.sql.Dataset[DefaultCurveRow] = null
        Par.all(
          "specific_curves" -> (() => sc = timed("specific_curves") {
            CurveAnalysis.specificCurves(s, recs, sched).localCheckpoint()
          }),
          "default_curves" -> (() => dc = timed("default_curves") {
            val (g0, f0, sg0) = CurveAnalysis.defaultRollups(s, recs, sched)
            def mat(r: org.apache.spark.sql.Dataset[DefaultCurveRow]) =
              r.localCheckpoint()
            val (g, f, sg) = (mat(g0), mat(f0), mat(sg0))
            rollCache = Some((s, (g, f, sg)))
            CurveAnalysis.defaultCurvesFrom(s, g, f, sg).localCheckpoint()
          }))
        curveCache = Some((s, sc, dc))
        (sc, dc)
    }
  }

  // time_of_recording goes out as epoch SECONDS: Spark writes parquet
  // timestamps as UTC-adjusted µs, which DuckDB surfaces as TIMESTAMPTZ —
  // the naive-vs-zoned isoformat mismatch would fail the compare even for
  // identical instants. A BIGINT is engine-neutral.
  private def asEpochSecs(df: DataFrame): DataFrame =
    df.withColumn("time_of_recording", unix_timestamp(col("time_of_recording")))

  // sort keys include source + trip_start_time: the vehicle key is
  // (source, trip, date, START TIME) — two services of one trip_id on the
  // same date (frequency trips) would otherwise tie and dump in
  // shuffle-dependent order (the w8Percentiles totality rule)
  private def records(s: SparkSession, dir: String): DataFrame =
    asEpochSecs(pipeline(s)._2)
      .orderBy("source", "trip_start_date", "trip_id", "trip_start_time",
        "stop_sequence")

  // ST2 as a value oracle: the prediction-request dedup replayed in batch
  // form (one micro-batch per vehicle × recording instant) over the same
  // records table the gtfs_records oracle checks — every emitted request,
  // its basis stop/delay and its last-seen instant
  private def st2Requests(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingImport.predictionRequestsBatch(pipeline(s)._2)
      .orderBy("trip_id", "trip_start_date", "trip_start_time", "last_seen")

  private def gapFilled(s: SparkSession, dir: String): DataFrame = {
    val (sched, recs) = pipeline(s)
    CurveAnalysis.gapFill(recs, sched)
      .orderBy("source", "trip_start_date", "trip_id", "trip_start_time",
        "stop_index")
  }

  // Curve tables go out as one scalar row per POINT (the driver harness
  // hashes with pandas, which cannot sort/factorize array<struct> cells) —
  // and the exploded form is what lets their oracles reconstruct the full
  // row set value by value instead of comparing JSON strings.
  private def specific(s: SparkSession, dir: String): DataFrame = {
    val meta = Seq("route_id", "route_variant", "event_type", "time_slot_id",
      "start_stop_index", "end_stop_index", "curve_kind", "focus_delay",
      "precision_type", "sample_size")
    curves(s)._1.toDF()
      .withColumn("focus_delay", col("focus_delay").cast("double"))
      .select(meta.map(col) :+ posexplode(col("curve")): _*)
      .select(meta.map(col) ++ Seq(col("pos").as("idx"),
        col("col.x").cast("double").as("x"),
        round(col("col.y").cast("double"), 5).as("y")): _*)
      .orderBy("route_id", "route_variant", "event_type", "time_slot_id",
        "start_stop_index", "end_stop_index", "curve_kind", "focus_delay", "idx")
  }

  private def defaults(s: SparkSession, dir: String): DataFrame = {
    val meta = Seq("route_type", "route_section", "time_slot_id", "event_type",
      "precision_type", "sample_size")
    curves(s)._2.toDF()
      .select(meta.map(col) :+ posexplode(col("curve")): _*)
      .select(meta.map(col) ++ Seq(col("pos").as("idx"),
        col("col.x").cast("double").as("x"),
        round(col("col.y").cast("double"), 5).as("y")): _*)
      .orderBy("route_type", "route_section", "time_slot_id", "event_type", "idx")
  }

  private var predCache: Option[(SparkSession, DataFrame)] = None

  /** Schedule + cached batch predictions for the monitor-layer queries. */
  def predictionState(s: SparkSession): (GtfsSchedule, DataFrame) = synchronized {
    val (sched, _) = pipeline(s)
    predCache match {
      case Some((sess, p)) if sess eq s => (sched, p)
      case _ =>
        val (sc, dc) = curves(s)
        val p = timed("batch_predict") {
          // localCheckpoint, not cache: a dozen monitor queries derive from
          // this table, and each withColumn/join they add re-ANALYZES the
          // whole predictor lineage when the plan is merely cached —
          // measured ~0.5 s of driver-side analysis per page query at
          // sf0.1. The checkpoint truncates the plan to a LogicalRDD (the
          // bounded, already-materialized prediction set), exactly the
          // monitor serving shape: pages query the prediction TABLE, not
          // the predictor's provenance. The trade — checkpoint blocks have
          // no lineage to recompute from after executor loss — is moot in
          // this harness: Verify/Bench pin local mode, where losing the
          // only executor IS process death. A cluster deployment serves
          // from the STORED tables (PredictionsTable.read), not these
          // memos.
          Predictor.batchPredict(s, sched, "2024-03-04", "graft", sc, dc)
            .localCheckpoint()
        }
        predCache = Some((s, p))
        (sched, p)
    }
  }

  private def predictions(s: SparkSession, dir: String): DataFrame =
    predictionState(s)._2
      // epoch doubles: Spark parquet timestamps surface as TIMESTAMPTZ in
      // DuckDB and cannot be compared against the oracle's naive arithmetic
      .withColumns(Map(
        "prediction_curve" -> to_json(col("prediction_curve")),
        "prediction_min" -> col("prediction_min").cast("double"),
        "prediction_max" -> col("prediction_max").cast("double")))
      .orderBy("trip_id", "stop_sequence", "event_type")

  /** ST1/ST5: the streaming ingest (binaryFile stream → decode → schedule
    * join → last-writer-wins upsert) run to completion with AvailableNow;
    * returns the upserted records table — row-identical to `gtfs_records`. */
  private def streamedRecords(s: SparkSession, dir: String): DataFrame = {
    val (sched, _) = pipeline(s)
    val (_, rtDir) = dirs
    val base = Scratch.tempDir("graft_stream").toString
    val recordsDir = base + "/records"
    try {
      // the reference's `import batch` contract: runBatch runs the backlog
      // to completion AND folds the delta at stream end, so the read below
      // is the steady-state short-circuit — a plain pruned scan of the
      // key-unique base, no resolution window
      graft.streaming.StreamingImport.runBatch(s, rtDir, sched, "graft",
        recordsDir, base + "/ckpt")
      // materialize the bounded fixture table on the driver so the temp
      // records/checkpoint dirs can be deleted — repeated bench/verify runs
      // must not accumulate stream state on the (RAM-backed) scratch space
      val out = asEpochSecs(graft.gtfs.RecordsTable.read(s, recordsDir))
        .orderBy("source", "trip_start_date", "trip_id", "trip_start_time",
          "stop_sequence")
      val schema = out.schema
      val rows = out.collect().toIndexedSeq
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  /** Realtime-conditioned predictions (3.1 step 5): vehicles observed on
    * 2024-01-15 predicted forward through the conditional curve sets.
    * Output is one row per CURVE POINT (scalar columns only): the oracle
    * re-derives the basis selection, target fan-out, slot-ranked curve-set
    * choice and the f32 union-grid interpolation numerically — a JSON
    * string compare would founder on float formatting differences. */
  private def predictionsRealtime(s: SparkSession, dir: String): DataFrame = {
    val (sched, recs) = pipeline(s)
    val (sc, dc) = curves(s)
    val meta = Seq("source", "event_type", "stop_id", "route_id", "trip_id",
      "trip_start_date", "trip_start_time", "stop_sequence", "precision_type",
      "origin_type", "sample_size", "prediction_min", "prediction_max",
      "schedule_file_name")
    Predictor.batchPredictRealtime(s, sched, recs, "2024-01-15", "graft", sc, dc)
      .withColumns(Map( // one eager op — each withColumn re-analyzed the tree
        "prediction_min" -> col("prediction_min").cast("double"),
        "prediction_max" -> col("prediction_max").cast("double")))
      .select(meta.map(col) :+ posexplode(col("prediction_curve")): _*)
      .select(meta.map(col) ++ Seq(col("pos").as("idx"),
        col("col.x").cast("double").as("x"),
        round(col("col.y").cast("double"), 5).as("y")): _*)
      .orderBy("trip_id", "stop_sequence", "event_type", "idx")
  }

  /** Visual-schedule line dataset on the fixture schedule (X15's data half;
    * the PNG rendering is out of engine scope). */
  private def visualSchedule(s: SparkSession, dir: String): DataFrame = {
    val (sched, _) = pipeline(s)
    VisualSchedule.tripLines(s, sched)
      .orderBy("route_id", "primary_variant", "route_variant", "trip_id",
        "stop_sequence")
  }

  /** Curve-construction invariant (driver-checkable, must be 0 rows): every
    * kept point of every GENERAL specific curve must sit on the weighted
    * ECDF of its group's observations — y = (#obs < x + 1) / n for interior
    * points (the makeCurve first-occurrence rule), exactly 0/1 at the ends —
    * with the observations re-derived through an independent window-function
    * path rather than the EcdfAggregator. Catches aggregator merge bugs,
    * simplify y-corruption and grouping mistakes; matched against a
    * WHERE-false DuckDB oracle. */
  private def generalPointsCheck(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (sched, recs) = pipeline(s)
    val keys = Seq("route_id", "route_variant", "event_type", "time_slot_id", "stop_index")
    val cells = CurveAnalysis.generalObservations(recs, sched)
      .groupBy((keys :+ "delay").map(col): _*).agg(count(lit(1)).as("c"))
    // both window aggregates share ONE (partition, order) spec — differing
    // only in frame — so they plan as a single WindowExec over a single
    // sort; the previous unordered spec for `n` forced a second window
    // operator (guide §2.4: operations keyed the same way share one pass).
    // A full-partition sum is order-invariant, so `n` is unchanged.
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy("delay")
    val cum = cells
      .withColumn("cum_before", coalesce(sum("c").over(
        byKey.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum("c").over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("y_exp", (col("cum_before") + 1).cast("double") / col("n"))
      .select((keys.map(col) :+ col("delay").as("x") :+ col("y_exp")): _*)
    val pts = curves(s)._1.toDF().filter(col("curve_kind") === "general")
      .withColumn("stop_index", col("end_stop_index"))
      .withColumn("npts", size(col("curve")))
      .select((keys.map(col) :+ col("npts") :+ posexplode(col("curve"))): _*)
      .select((keys.map(col) ++ Seq(col("npts"), col("pos").as("idx"),
        col("col.x").as("x"), col("col.y").cast("double").as("y"))): _*)
    pts.join(cum, keys :+ "x", "left")
      .filter(
        (col("idx") === 0 && abs(col("y")) > 1e-6)
          || (col("idx") === col("npts") - 1 && abs(col("y") - 1) > 1e-6)
          || (col("idx") > 0 && col("idx") < col("npts") - 1
            && (col("y_exp").isNull || abs(col("y") - col("y_exp")) > 1e-4)))
      .select((keys.map(col) ++ Seq(col("idx"), col("x"), col("y"), col("y_exp"))): _*)
      .orderBy((keys :+ "idx").map(col): _*)
  }

  /** Default-curve invariant (0 rows): every point of every default grid
    * curve must equal the MEAN of its contributor variant curves evaluated
    * at that x — contributors chosen by the row's precision level (General:
    * same (type, section, slot, event); FallbackGeneral: same (type, event);
    * SuperGeneral: all variants, pre-simplified ε=0.01). Pins the A8/A9
    * rollup averaging at the full grid. */
  private def defaultPointsCheck(s: SparkSession, dir: String): DataFrame = {
    val (sched, recs) = pipeline(s)
    val toArr = (pts: Seq[org.apache.spark.sql.Row]) =>
      pts.map(r => graft.curves.CPoint(r.getFloat(0), r.getFloat(1))).toArray
    val yAtX = udf { (pts: Seq[org.apache.spark.sql.Row], x: Double) =>
      graft.curves.Curves.yAtX(toArr(pts), x.toFloat).toDouble }
    val simp01 = udf { (pts: Seq[org.apache.spark.sql.Row]) =>
      graft.curves.Curves.simplify(toArr(pts), 0.01f).toSeq }
    // the ε=0.01 simplification is hoisted to ONE evaluation per variant
    // row (the broadcast build side) — it used to run inside the joined
    // projection, once per matched (point × variant) pair (guide §1.2
    // step 2: per-task work). The join itself deliberately STAYS the
    // single conditional BroadcastNestedLoopJoin: an r16 experiment split
    // it into per-tier equi-join legs (2 BroadcastHashJoins + a cross leg)
    // and measured SLOWER — this check runs on the constant-size GTFS
    // fixture, never at corpus scale, so the extra per-leg jobs/broadcasts
    // cost more than the ~6M cheap CASE evaluations they remove.
    val vc = CurveAnalysis.variantCurves(s, recs, sched).toDF()
      .select(col("route_type").as("v_rt"), col("route_section").as("v_rs"),
        col("time_slot_id").as("v_ts"), col("event_type").as("v_et"),
        col("curve").as("v_curve"))
      .withColumn("v_curve_s01", simp01(col("v_curve")))
    val gkeys = Seq("route_type", "route_section", "time_slot_id", "event_type")
    val pts = curves(s)._2.toDF()
      .select((gkeys.map(col) ++ Seq(col("precision_type"),
        posexplode(col("curve")))): _*)
      .select((gkeys.map(col) ++ Seq(col("precision_type"),
        col("pos").as("idx"), col("col.x").cast("double").as("x"),
        col("col.y").cast("double").as("y"))): _*)
    pts
      .join(broadcast(vc),
        when(col("precision_type") === Codes.PrecisionGeneral,
          col("v_rt") === col("route_type") && col("v_rs") === col("route_section")
            && col("v_ts") === col("time_slot_id") && col("v_et") === col("event_type"))
          .when(col("precision_type") === Codes.PrecisionFallbackGeneral,
            col("v_rt") === col("route_type") && col("v_et") === col("event_type"))
          .otherwise(lit(true)))
      .withColumn("v_eval", yAtX(
        when(col("precision_type") === Codes.PrecisionSuperGeneral,
          col("v_curve_s01")).otherwise(col("v_curve")), col("x")))
      .groupBy((gkeys ++ Seq("precision_type", "idx", "x", "y")).map(col): _*)
      .agg(avg(col("v_eval")).as("y_exp"))
      .filter(abs(col("y") - col("y_exp")) > 1e-4)
      .select((gkeys.map(col) ++ Seq(col("precision_type"), col("idx"),
        col("x"), col("y"), col("y_exp"))): _*)
      .orderBy((gkeys ++ Seq("idx")).map(col): _*)
  }

  /** Structural invariant for the conditional curve-SET rows (0 rows): the
    * marker recursion itself is not SQL-reproducible, but every emitted
    * curve must be a well-formed CDF — endpoints exactly 0/1, x strictly
    * increasing and y non-decreasing, span ≥ 13 s, x a 12 s-quantized delay
    * within ±3000 (F2/F3 bounds). */
  private def curvesetShapeCheck(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = Seq("route_id", "route_variant", "event_type", "time_slot_id",
      "start_stop_index", "end_stop_index", "focus_delay")
    val pts = curves(s)._1.toDF().filter(col("curve_kind") === "curveset")
      .withColumn("npts", size(col("curve")))
      .select(keys.map(col) ++ Seq(col("npts"), posexplode(col("curve"))): _*)
      .select(keys.map(col) ++ Seq(col("npts"), col("pos").as("idx"),
        col("col.x").cast("double").as("x"), col("col.y").cast("double").as("y")): _*)
    // one (partition, order) spec for all four window aggregates — frames
    // differ (lag offsets vs unbounded span), but sharing the spec plans a
    // single WindowExec over a single sort (full-partition max/min are
    // order-invariant, so `span` is unchanged)
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy("idx")
    val whole = byKey.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    pts
      .withColumn("prev_x", lag("x", 1).over(byKey))
      .withColumn("prev_y", lag("y", 1).over(byKey))
      .withColumn("span", max("x").over(whole) - min("x").over(whole))
      .withColumn("reason",
        when(col("idx") === 0 && abs(col("y")) > 1e-6, "first_y_not_zero")
          .when(col("idx") === col("npts") - 1 && abs(col("y") - 1) > 1e-6,
            "last_y_not_one")
          .when(col("prev_x").isNotNull && col("x") <= col("prev_x"), "x_not_increasing")
          .when(col("prev_y").isNotNull && col("y") < col("prev_y"), "y_decreasing")
          .when(abs(col("x")) > 3000, "x_out_of_range")
          .when(col("x") =!= (col("x") / 12).cast("int").cast("double") * 12,
            "x_not_quantized")
          .when(col("span") < 13.0, "span_below_13"))
      .filter(col("reason").isNotNull)
      .select(keys.map(col) ++ Seq(col("reason"), col("idx"), col("x"), col("y")): _*)
      .orderBy((keys :+ "idx").map(col): _*)
  }

  /** A1's rt-file half (count.rs:41-70): per-day file count + byte size of
    * the fixture rt directory listing. */
  private def fileStats(s: SparkSession, dir: String): DataFrame = {
    val (_, rtDir) = dirs
    Directory.rtFileStats(s, rtDir).orderBy("file_date")
  }

  /** Aux inputs for the outDir-based DuckDB oracles (written by Verify under
    * `<outDir>_aux/`; `__VOUT__` in the oracle SQL is substituted with the
    * real outDir at dump time). The rt decode and schedule derivations are
    * Spark-computed — the oracles verify everything DOWNSTREAM of them
    * (joins, LWW, gap-fill, aggregation); the decode itself is pinned by the
    * codec round-trip tests. The file listing is plain java.nio — fully
    * independent of the Spark binaryFile source it checks. */
  def oracleAux(s: SparkSession): Map[String, DataFrame] = {
    import s.implicits._
    val (_, rtDir) = dirs
    val (sched, recs) = pipeline(s)
    val bin = s.read.format("binaryFile").option("pathGlobFilter", "*.pb").load(rtDir)
    val rtRows = Importer.decodeRtFiles(s, bin).toDF()
    val listing = {
      val stream = java.nio.file.Files.list(java.nio.file.Paths.get(rtDir))
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".pb"))
          .map(p => (p.getFileName.toString, java.nio.file.Files.size(p)))
          .toSeq.sorted
      } finally stream.close()
    }
    // curve-table dumps for the prediction-selection oracle: the curve
    // CONTENT is Spark-computed (marker recursion is not SQL-expressible;
    // pinned by CurvesSpec + the curve-invariant checks) and rides along as
    // its to_json string — the oracle re-derives the prediction TARGETS and
    // the general→default fallback joins from scratch
    val (sc, dc) = curves(s)
    val genCurves = sc.toDF().filter(col("curve_kind") === "general")
      .select(col("route_variant"), col("event_type"), col("time_slot_id"),
        col("end_stop_index").as("stop_index"),
        to_json(Predictor.capCurve(col("curve"))).as("g_json"),
        col("precision_type").as("g_precision"), col("sample_size").as("g_sample"),
        element_at(col("curve"), 1).getField("x").as("g_min_x"),
        element_at(col("curve"), -1).getField("x").as("g_max_x"))
    val dftCurves = dc.toDF()
      .select(col("route_type"), col("route_section"), col("time_slot_id"),
        col("event_type"),
        to_json(Predictor.capCurve(col("curve"))).as("d_json"),
        col("precision_type").as("d_precision"), col("sample_size").as("d_sample"),
        element_at(col("curve"), 1).getField("x").as("d_min_x"),
        element_at(col("curve"), -1).getField("x").as("d_max_x"))
    // gtfs_specific_curves reconstruction inputs: for GENERAL curves only
    // the kept x-coordinates are dumped (which points ε=0.01 simplify kept —
    // the one recursive decision SQL can't replay); every y is recomputed in
    // DuckDB from the observations as the f32 ECDF (cum_before+1)/n.
    val genKept = sc.toDF().filter(col("curve_kind") === "general")
      .withColumn("npts", size(col("curve")))
      .select(col("route_id"), col("route_variant"), col("event_type"),
        col("time_slot_id"), col("end_stop_index").as("stop_index"),
        col("npts"), posexplode(col("curve")))
      .select(col("route_id"), col("route_variant"), col("event_type"),
        col("time_slot_id"), col("stop_index"), col("npts"),
        col("pos").as("idx"), col("col.x").as("x"))
    // gtfs_default_curves reconstruction inputs: the three rollup levels'
    // POINTS (f32 contributor means — summation order makes them
    // SQL-irreproducible bit-exactly; values pinned by defaultPointsCheck).
    // Which level each grid cell gets, the precision codes and the sample
    // means are all re-derived in SQL from the records output. The points
    // come from the SAME cached rollups the query table was built from
    // (curves(s) populates rollCache) — recomputing them here could drift
    // by an ulp through a different shuffle arrival order.
    val (genRoll, fbRoll, sgRoll) = rollCache match {
      case Some((sess, rolls)) if sess eq s => rolls
      case _ => throw new IllegalStateException(
        "curves(s) must run before oracleAux so the rollups are cached")
    }
    def rollPts(ds: org.apache.spark.sql.Dataset[DefaultCurveRow],
                keys: Seq[String]): DataFrame =
      ds.toDF().select(keys.map(col) :+ posexplode(col("curve")): _*)
        .select(keys.map(col) ++ Seq(col("pos").as("pidx"),
          col("col.x").as("x"), col("col.y").as("y")): _*)
    Map(
      "gen_kept" -> genKept,
      "dft_gen_pts" -> rollPts(genRoll,
        Seq("route_type", "route_section", "time_slot_id", "event_type")),
      "dft_fb_pts" -> rollPts(fbRoll, Seq("route_type", "event_type")),
      "dft_sg_pts" -> rollPts(sgRoll, Seq.empty),
      "rt_rows" -> rtRows,
      "sched_trips" -> sched.trips.select("trip_id", "route_id", "route_variant",
        "trip_start_time", "route_type", "trip_headsign", "service_id"),
      "sched_stop_times" -> sched.stopTimes.select("trip_id", "stop_sequence",
        "stop_id", "stop_index", "stop_count", "route_section",
        "arrival_secs", "departure_secs"),
      "sched_stops" -> sched.stops,
      "sched_routes" -> sched.routes,
      "rt_files" -> listing.toDF("file_name", "length"),
      "trips_for_date" -> ServiceCalendar
        .tripsForDate(s, sched, "2024-03-04").select("trip_id"),
      "trips_for_date_rt" -> ServiceCalendar
        .tripsForDate(s, sched, "2024-01-15").select("trip_id"),
      "variant_primary" -> VisualSchedule.variantIndexMap(s, sched),
      "gen_curves" -> genCurves,
      "dft_curves" -> dftCurves,
      // capped default curves as exploded points: the realtime oracle's
      // default-grid fallback leg joins these for targets with no curve set
      "dft_points" -> dc.toDF()
        .select(col("route_type"), col("route_section"), col("time_slot_id"),
          col("event_type"), col("precision_type").as("d_precision"),
          col("sample_size").as("d_sample"),
          posexplode(Predictor.capCurve(col("curve"))))
        .select(col("route_type"), col("route_section"), col("time_slot_id"),
          col("event_type"), col("d_precision"), col("d_sample"),
          col("pos").as("pidx"), col("col.x").as("x"), col("col.y").as("y")),
      "cs_points" -> sc.toDF().filter(col("curve_kind") === "curveset")
        .select(col("route_variant"), col("event_type"), col("time_slot_id"),
          col("start_stop_index"), col("end_stop_index"), col("focus_delay"),
          col("sample_size"), posexplode(col("curve")))
        .select(col("route_variant"), col("event_type"), col("time_slot_id"),
          col("start_stop_index"), col("end_stop_index"), col("focus_delay"),
          col("sample_size"), col("pos").as("pidx"),
          col("col.x").as("x"), col("col.y").as("y")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gtfs_predictions_realtime" -> (predictionsRealtime _),
    "gtfs_visual_schedule" -> (visualSchedule _),
    "gtfs_file_stats" -> (fileStats _),
    "gtfs_records" -> (records _),
    "st2_prediction_requests" -> (st2Requests _),
    "gtfs_gap_fill" -> (gapFilled _),
    "gtfs_specific_curves" -> (specific _),
    "gtfs_default_curves" -> (defaults _),
    "gtfs_predictions" -> (predictions _),
    "gtfs_stream_records" -> (streamedRecords _),
    // the three *_check queries are 0-row INVARIANTS (rows = violations);
    // they are non-trivial because their non-empty companions prove the
    // checked data exists: gtfs_specific_curves (2660 rows at sf0.01) for
    // the curve-set shape, gtfs_default_curves (14600) for both point checks
    "gtfs_general_points_check" -> (generalPointsCheck _),
    "gtfs_default_points_check" -> (defaultPointsCheck _),
    "gtfs_curveset_shape_check" -> (curvesetShapeCheck _)
  )

  // vehicle key of a prediction row
  private val Vk = Seq("trip_id", "trip_start_date", "trip_start_time",
    "route_id", "stop_sequence", "stop_id", "event_type")
  private def vkCols(p: String = ""): String =
    Vk.map(c => if (p.isEmpty) c else s"$p.$c").mkString(", ")
  private def vkJoin(a: String, b: String): String =
    Vk.map(c => s"$a.$c = $b.$c").mkString(" AND ")

  private def realtimePredictionSql: String = s"""
    WITH recs AS (SELECT * FROM read_parquet('__VOUT__/gtfs_records/*.parquet')),
    basis AS (
      SELECT trip_id, trip_start_date, trip_start_time,
             stop_index AS basis_idx, delay_departure AS basis_delay
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY trip_id, trip_start_date, trip_start_time
                   ORDER BY stop_sequence DESC, time_of_recording DESC) AS rn
            FROM recs
            WHERE delay_departure IS NOT NULL AND trip_start_date = DATE '2024-01-15')
      WHERE rn = 1),
    st AS (SELECT * FROM read_parquet('__VOUT__/_aux/sched_stop_times/*.parquet')),
    tfd AS (SELECT trip_id FROM read_parquet('__VOUT__/_aux/trips_for_date_rt/*.parquet')),
    tr AS (SELECT * FROM read_parquet('__VOUT__/_aux/sched_trips/*.parquet')),
    ev AS (
      SELECT trip_id, stop_sequence, stop_id, stop_index, route_section,
             1 AS event_type, arrival_secs AS event_secs
      FROM st WHERE arrival_secs IS NOT NULL
      UNION ALL
      SELECT trip_id, stop_sequence, stop_id, stop_index, route_section,
             2 AS event_type, departure_secs AS event_secs
      FROM st WHERE departure_secs IS NOT NULL),
    base AS (
      SELECT ev.*, tr.route_id, tr.route_variant, tr.route_type,
             DATE '2024-01-15' AS trip_start_date,
             ${GtfsTime.duckDbDateAndTimeSql("DATE '2024-01-15'", "ev.event_secs")} AS scheduled_ts
      FROM ev JOIN tfd ON tfd.trip_id = ev.trip_id JOIN tr ON tr.trip_id = ev.trip_id),
    slotted AS (SELECT *, ${TimeSlots.duckDbSlotIdSql("scheduled_ts")} AS time_slot_id FROM base),
    tgt AS (SELECT s.*, b.trip_start_time, b.basis_idx, b.basis_delay
            FROM slotted s JOIN basis b
              ON b.trip_id = s.trip_id AND b.trip_start_date = s.trip_start_date
            WHERE s.stop_index > b.basis_idx),
    cs AS (SELECT * FROM read_parquet('__VOUT__/_aux/cs_points/*.parquet')),
    cskeys AS (SELECT DISTINCT route_variant, event_type, time_slot_id,
                      start_stop_index, end_stop_index, focus_delay, sample_size FROM cs),
    matched AS (
      SELECT ${vkCols("t")}, t.scheduled_ts, t.basis_delay,
             k.time_slot_id AS cs_slot, k.focus_delay, k.sample_size,
             k.route_variant, k.start_stop_index, k.end_stop_index,
             CASE WHEN k.time_slot_id = t.time_slot_id THEN 0 ELSE 1 END AS slot_rank
      FROM tgt t JOIN cskeys k
        ON k.route_variant = t.route_variant AND k.event_type = t.event_type
       AND k.start_stop_index = t.basis_idx AND k.end_stop_index = t.stop_index
       AND (k.time_slot_id = t.time_slot_id OR k.time_slot_id = ${Codes.DefaultTimeSlot})),
    best AS (SELECT *, MIN(slot_rank) OVER (PARTITION BY ${vkCols()}) AS best_rank FROM matched),
    chosen AS (SELECT * FROM best WHERE slot_rank = best_rank),
    bracket AS (
      SELECT ${vkCols()}, scheduled_ts, basis_delay, cs_slot, sample_size, slot_rank,
             route_variant, start_stop_index, end_stop_index,
             MIN(focus_delay) AS fmin, MAX(focus_delay) AS fmax,
             MAX(CASE WHEN focus_delay < CAST(basis_delay AS REAL)
                      THEN focus_delay END) AS f0,
             MIN(CASE WHEN focus_delay >= CAST(basis_delay AS REAL)
                      THEN focus_delay END) AS f1
      FROM chosen
      GROUP BY ${vkCols()}, scheduled_ts, basis_delay, cs_slot, sample_size, slot_rank,
               route_variant, start_stop_index, end_stop_index),
    clamped AS (
      SELECT b.*, CASE WHEN CAST(b.basis_delay AS REAL) <= b.fmin THEN b.fmin
                       ELSE b.fmax END AS the_focus
      FROM bracket b
      WHERE CAST(b.basis_delay AS REAL) <= b.fmin OR CAST(b.basis_delay AS REAL) >= b.fmax),
    clamped_pts AS (
      SELECT ${vkCols("c")}, c.scheduled_ts, c.slot_rank, c.sample_size,
             cs.pidx AS idx, cs.x, cs.y
      FROM clamped c JOIN cs
        ON cs.route_variant = c.route_variant AND cs.event_type = c.event_type
       AND cs.time_slot_id = c.cs_slot AND cs.start_stop_index = c.start_stop_index
       AND cs.end_stop_index = c.end_stop_index AND cs.focus_delay = c.the_focus),
    interp AS (
      SELECT b.*, CAST(CAST(CAST(b.basis_delay AS REAL) - b.f0 AS REAL)
                       / CAST(b.f1 - b.f0 AS REAL) AS REAL) AS t
      FROM bracket b
      WHERE CAST(b.basis_delay AS REAL) > b.fmin AND CAST(b.basis_delay AS REAL) < b.fmax),
    grid AS (
      SELECT DISTINCT ${vkCols("i")}, cs.x AS gx
      FROM interp i JOIN cs
        ON cs.route_variant = i.route_variant AND cs.event_type = i.event_type
       AND cs.time_slot_id = i.cs_slot AND cs.start_stop_index = i.start_stop_index
       AND cs.end_stop_index = i.end_stop_index AND cs.focus_delay IN (i.f0, i.f1)),
    sides AS (SELECT i.*, s.side, CASE WHEN s.side = 0 THEN i.f0 ELSE i.f1 END AS sfocus
              FROM interp i CROSS JOIN (SELECT UNNEST([0, 1]) AS side) s),
    spts AS (
      SELECT ${vkCols("sd")}, sd.side, sd.t, g.gx, cs.pidx, cs.x, cs.y,
             LAG(cs.x) OVER w AS px, LAG(cs.y) OVER w AS py,
             MIN(cs.x) OVER wk AS cminx, MAX(cs.x) OVER wk AS cmaxx,
             MIN_BY(cs.y, cs.pidx) OVER wk AS cfy, MAX_BY(cs.y, cs.pidx) OVER wk AS cly
      FROM sides sd
      JOIN cs ON cs.route_variant = sd.route_variant AND cs.event_type = sd.event_type
             AND cs.time_slot_id = sd.cs_slot AND cs.start_stop_index = sd.start_stop_index
             AND cs.end_stop_index = sd.end_stop_index AND cs.focus_delay = sd.sfocus
      JOIN grid g ON ${vkJoin("g", "sd")}
      WINDOW w AS (PARTITION BY ${vkCols("sd")}, sd.side, g.gx ORDER BY cs.pidx),
             wk AS (PARTITION BY ${vkCols("sd")}, sd.side, g.gx)),
    evals AS (
      SELECT ${vkCols()}, side, t, gx,
             CASE WHEN gx <= cminx THEN cfy
                  WHEN gx >= cmaxx THEN cly
                  ELSE MAX(CASE WHEN x >= gx AND px IS NOT NULL AND px < gx THEN
                         CASE WHEN x = px THEN y
                              ELSE CAST(py + CAST(CAST(y - py AS REAL)
                                     * CAST(CAST(gx - px AS REAL) / CAST(x - px AS REAL) AS REAL)
                                     AS REAL) AS REAL) END END) END AS ey
      FROM spts
      GROUP BY ${vkCols()}, side, t, gx, cminx, cmaxx, cfy, cly),
    interp_pts AS (
      SELECT ${vkCols()},
             ROW_NUMBER() OVER (PARTITION BY ${vkCols()} ORDER BY gx) - 1 AS idx, gx AS x,
             CAST(CAST(MAX(CASE WHEN side = 0 THEN ey END)
                       * CAST(1 - t AS REAL) AS REAL)
                  + CAST(MAX(CASE WHEN side = 1 THEN ey END) * t AS REAL) AS REAL) AS y
      FROM evals GROUP BY ${vkCols()}, t, gx),
    ipmeta AS (
      SELECT i.*, p.idx, p.x, p.y FROM interp i JOIN interp_pts p ON ${vkJoin("p", "i")}),
    mkeys AS (SELECT DISTINCT ${vkCols()} FROM matched),
    unmatched AS (
      SELECT t.* FROM tgt t LEFT JOIN mkeys m ON ${vkJoin("m", "t")}
      WHERE m.trip_id IS NULL),
    dftp AS (SELECT * FROM read_parquet('__VOUT__/_aux/dft_points/*.parquet')),
    fb AS (
      SELECT ${vkCols("t")}, t.scheduled_ts,
             d.d_precision AS precision_type, d.d_sample AS sample_size,
             d.pidx AS idx, d.x, d.y
      FROM unmatched t JOIN dftp d
        ON d.route_type = t.route_type AND d.route_section = t.route_section
       AND d.event_type = t.event_type
       AND d.time_slot_id = CASE WHEN t.time_slot_id = ${Codes.DefaultTimeSlot} THEN 1
                                 ELSE t.time_slot_id END),
    allpts AS (
      SELECT ${vkCols()}, scheduled_ts,
             CASE WHEN slot_rank = 0 THEN ${Codes.PrecisionSpecific}
                  ELSE ${Codes.PrecisionFallbackSpecific} END AS precision_type,
             sample_size, idx, x, y FROM clamped_pts
      UNION ALL
      SELECT ${vkCols()}, scheduled_ts,
             CASE WHEN slot_rank = 0 THEN ${Codes.PrecisionSpecific}
                  ELSE ${Codes.PrecisionFallbackSpecific} END AS precision_type,
             sample_size, idx, x, y FROM ipmeta
      UNION ALL
      SELECT ${vkCols()}, scheduled_ts, precision_type,
             sample_size, idx, x, y FROM fb),
    agg AS (
      SELECT *, MIN(x) OVER (PARTITION BY ${vkCols()}) AS min_x,
                MAX(x) OVER (PARTITION BY ${vkCols()}) AS max_x
      FROM allpts)
    SELECT 'graft' AS source, event_type, stop_id, route_id, trip_id,
           trip_start_date, trip_start_time, stop_sequence,
           precision_type,
           ${Codes.OriginRealtime} AS origin_type, sample_size,
           epoch(scheduled_ts) + ROUND(min_x::DOUBLE, 6) AS prediction_min,
           epoch(scheduled_ts) + ROUND(max_x::DOUBLE, 6) AS prediction_max,
           'graft_schedule' AS schedule_file_name,
           idx, x::DOUBLE AS x, ROUND(y::DOUBLE, 5) AS y
    FROM agg ORDER BY trip_id, stop_sequence, event_type, idx"""

  /** The records-table reconstruction shared by the batch and streaming
    * oracles: decode dump → trips/stop_times joins (J1/J2) → GTFS start
    * date/time parse (unparseable → entity skipped, as the reference's
    * gtfs_time.rs error path) → F4 delay filter → W2 last-writer-wins.
    * Mirrors Importer.recordsFromRt step for step. */
  private val recordsSql = """
    WITH rt AS (SELECT * FROM read_parquet('__VOUT__/_aux/rt_rows/*.parquet')),
    tr AS (SELECT trip_id, route_id, route_variant
           FROM read_parquet('__VOUT__/_aux/sched_trips/*.parquet')),
    st AS (SELECT trip_id, stop_sequence, stop_id, stop_index, stop_count,
                  arrival_secs, departure_secs
           FROM read_parquet('__VOUT__/_aux/sched_stop_times/*.parquet')),
    joined AS (
      SELECT rt.trip_id, rt.stop_sequence, rt.time_of_recording,
             rt.delay_arrival, rt.delay_departure,
             tr.route_id, tr.route_variant,
             st.stop_id, st.stop_index, st.stop_count,
             st.arrival_secs, st.departure_secs,
             try_strptime(rt.start_date, '%Y%m%d')::DATE AS trip_start_date,
             TRY_CAST(NULLIF(regexp_extract(rt.start_time, '(\d+):(\d+):(\d+)', 1), '') AS INT) * 3600
               + TRY_CAST(NULLIF(regexp_extract(rt.start_time, '(\d+):(\d+):(\d+)', 2), '') AS INT) * 60
               + TRY_CAST(NULLIF(regexp_extract(rt.start_time, '(\d+):(\d+):(\d+)', 3), '') AS INT)
               AS trip_start_time
      FROM rt
      JOIN tr ON tr.trip_id = rt.trip_id
      JOIN st ON st.trip_id = rt.trip_id AND st.stop_sequence = rt.stop_sequence
      WHERE rt.delay_arrival IS NOT NULL OR rt.delay_departure IS NOT NULL),
    dedup AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY route_id, route_variant, trip_id, trip_start_date,
                     trip_start_time, stop_sequence
        ORDER BY time_of_recording DESC) AS rn
      FROM joined
      WHERE trip_start_date IS NOT NULL AND trip_start_time IS NOT NULL)
    SELECT 'graft' AS source, route_id, route_variant, trip_id, trip_start_date,
           trip_start_time, stop_sequence, stop_id, stop_index, stop_count,
           arrival_secs, departure_secs, time_of_recording,
           delay_arrival, delay_departure,
           'graft_schedule' AS schedule_file_name
    FROM dedup WHERE rn = 1"""

  val oracles: Map[String, String] = Map(
    "gtfs_records" -> recordsSql,
    // ST5 through the oracle: the streamed table must equal the same SQL
    // reconstruction the batch path matches.
    "gtfs_stream_records" -> recordsSql,
    // ST2: per vehicle, one micro-batch per recording instant (newest =
    // max (stop, delay) within it), running basis = window max of
    // (stop, rec_ts, delay) — regressions can't advance it — and a request
    // emits exactly when the (stop, delay) pair changes.
    "st2_prediction_requests" -> """
      WITH recs AS (SELECT * FROM read_parquet('__VOUT__/gtfs_records/*.parquet')
                    WHERE delay_departure IS NOT NULL),
      -- route columns ride inside the max struct (field-order comparison,
      -- same as Spark's struct ordering): one row per (vehicle, instant)
      -- even if a feed anomaly keys a vehicle by two route_variants at the
      -- same rec_ts — a wider group key would tie the window rows and the
      -- replay would be shuffle-order dependent on the Spark side
      pb AS (SELECT trip_id, trip_start_date, trip_start_time,
                    time_of_recording AS rec_ts,
                    max(struct_pack(s := stop_sequence, d := delay_departure,
                                    rv := route_variant, ri := route_id)) AS nb
             FROM recs GROUP BY 1, 2, 3, 4),
      run AS (SELECT *, max(struct_pack(s := nb.s, t := rec_ts, d := nb.d))
                OVER (PARTITION BY trip_id, trip_start_date, trip_start_time
                      ORDER BY rec_ts ROWS UNBOUNDED PRECEDING) AS basis
              FROM pb),
      lagd AS (SELECT *, lag(basis)
                 OVER (PARTITION BY trip_id, trip_start_date, trip_start_time
                       ORDER BY rec_ts) AS prev
               FROM run)
      SELECT trip_id, trip_start_date, trip_start_time,
             nb.ri AS route_id, nb.rv AS route_variant,
             basis.s AS stop_sequence, basis.d AS delay_departure,
             basis.t AS last_seen
      FROM lagd WHERE prev IS NULL OR basis.s <> prev.s OR basis.d <> prev.d
      ORDER BY trip_id, trip_start_date, trip_start_time, last_seen""",
    // J5 forward fill over the schedule grid, from the checked records output.
    "gtfs_gap_fill" -> """
      WITH recs AS (SELECT * FROM read_parquet('__VOUT__/gtfs_records/*.parquet')),
      st AS (SELECT trip_id, stop_sequence, stop_id, stop_index, stop_count,
                    arrival_secs, departure_secs
             FROM read_parquet('__VOUT__/_aux/sched_stop_times/*.parquet')),
      veh AS (SELECT DISTINCT trip_id, trip_start_date, trip_start_time, source,
                     route_id, route_variant, schedule_file_name
              FROM recs),
      grid AS (SELECT v.*, st.stop_sequence, st.stop_id, st.stop_index,
                      st.stop_count, st.arrival_secs, st.departure_secs
               FROM veh v JOIN st ON st.trip_id = v.trip_id),
      obs AS (SELECT trip_id, trip_start_date, trip_start_time, stop_sequence,
                     delay_arrival AS o_da, delay_departure AS o_dd, TRUE AS obs
              FROM recs),
      j AS (SELECT g.*, o.o_da, o.o_dd, o.obs
            FROM grid g LEFT JOIN obs o
              ON o.trip_id = g.trip_id AND o.trip_start_date = g.trip_start_date
             AND o.trip_start_time = g.trip_start_time
             AND o.stop_sequence = g.stop_sequence),
      w AS (SELECT *, LAST_VALUE(
              CASE WHEN obs THEN struct_pack(da := o_da, dd := o_dd) END
              IGNORE NULLS) OVER (
                PARTITION BY trip_id, trip_start_date, trip_start_time
                ORDER BY stop_index
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS donor
            FROM j)
      SELECT trip_id, trip_start_date, trip_start_time, source, route_id,
             route_variant, schedule_file_name, stop_sequence, stop_id,
             stop_index, stop_count, arrival_secs, departure_secs,
             CASE WHEN obs THEN o_da ELSE donor.da END AS delay_arrival,
             CASE WHEN obs THEN o_dd ELSE donor.dd END AS delay_departure,
             COALESCE(obs, FALSE) AS observed
      FROM w WHERE donor IS NOT NULL""",
    // Curve-construction invariants: the Spark side recomputes every kept
    // curve point through an independent path and emits VIOLATIONS — the
    // result must be empty (WHERE-false oracles; non-vacuous: the fixture
    // produces hundreds of checked points).
    // A7 + A5/A6 full-row reconstruction: observations re-derived from the
    // (oracle-checked) gap-fill output — scheduled-time slots, the per-event
    // explode and the slot∪DEFAULT duplication all in SQL — then every
    // GENERAL curve point's y recomputed as the f32 ECDF (cum_before+1)/n
    // with exact 0/1 endpoints, joined to the kept-x dump only for WHICH
    // points ε=0.01 simplify retained. sample_size is the recomputed group
    // count, not a pass-through. Curve-SET points ride along from cs_points
    // (the marker recursion is not SQL-expressible; shape-pinned by
    // gtfs_curveset_shape_check + hand-computed CurvesSpec cases), with
    // their route_id re-resolved through the variant→route map.
    "gtfs_specific_curves" -> s"""
      WITH filled AS (SELECT * FROM read_parquet('__VOUT__/gtfs_gap_fill/*.parquet')),
      sl AS (SELECT route_id, route_variant, stop_index, delay_arrival, delay_departure,
               ${TimeSlots.duckDbSlotIdSql(
                 GtfsTime.duckDbDateAndTimeSql("trip_start_date", "arrival_secs"))} AS slot_arr,
               ${TimeSlots.duckDbSlotIdSql(
                 GtfsTime.duckDbDateAndTimeSql("trip_start_date", "departure_secs"))} AS slot_dep
             FROM filled),
      ev AS (
        SELECT route_id, route_variant, ${Codes.EventArrival} AS event_type,
               slot_arr AS slot, stop_index, CAST(delay_arrival AS REAL) AS delay
        FROM sl WHERE delay_arrival IS NOT NULL
        UNION ALL
        SELECT route_id, route_variant, ${Codes.EventDeparture}, slot_dep, stop_index,
               CAST(delay_departure AS REAL)
        FROM sl WHERE delay_departure IS NOT NULL),
      obs AS (
        SELECT route_id, route_variant, event_type, slot AS time_slot_id, stop_index, delay FROM ev
        UNION ALL
        SELECT route_id, route_variant, event_type, ${Codes.DefaultTimeSlot}, stop_index, delay FROM ev),
      cells AS (SELECT route_id, route_variant, event_type, time_slot_id, stop_index,
                       delay, COUNT(*) AS c
                FROM obs GROUP BY ALL),
      cum AS (SELECT *,
                COALESCE(SUM(c) OVER (
                  PARTITION BY route_id, route_variant, event_type, time_slot_id, stop_index
                  ORDER BY delay ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb,
                SUM(c) OVER (
                  PARTITION BY route_id, route_variant, event_type, time_slot_id, stop_index) AS n
              FROM cells),
      kept AS (SELECT * FROM read_parquet('__VOUT__/_aux/gen_kept/*.parquet')),
      gen AS (
        SELECT k.route_id, k.route_variant, k.event_type, k.time_slot_id,
               k.stop_index AS start_stop_index, k.stop_index AS end_stop_index,
               'general' AS curve_kind, CAST(NULL AS DOUBLE) AS focus_delay,
               ${Codes.PrecisionSemiSpecific} AS precision_type,
               CAST(u.n AS INT) AS sample_size, k.idx, CAST(k.x AS DOUBLE) AS x,
               CASE WHEN k.idx = 0 THEN 0.0
                    WHEN k.idx = k.npts - 1 THEN 1.0
                    ELSE ROUND(CAST(CAST(u.cumb + 1 AS REAL) / CAST(u.n AS REAL) AS DOUBLE), 5)
               END AS y
        FROM kept k
        JOIN cum u ON u.route_id = k.route_id AND u.route_variant = k.route_variant
          AND u.event_type = k.event_type AND u.time_slot_id = k.time_slot_id
          AND u.stop_index = k.stop_index AND u.delay = k.x),
      vmap AS (SELECT DISTINCT route_variant, route_id
               FROM read_parquet('__VOUT__/_aux/sched_trips/*.parquet')),
      cs AS (SELECT * FROM read_parquet('__VOUT__/_aux/cs_points/*.parquet')),
      csr AS (
        SELECT m.route_id, cs.route_variant, cs.event_type, cs.time_slot_id,
               cs.start_stop_index, cs.end_stop_index, 'curveset' AS curve_kind,
               CAST(cs.focus_delay AS DOUBLE) AS focus_delay,
               ${Codes.PrecisionSpecific} AS precision_type, cs.sample_size,
               cs.pidx AS idx, CAST(cs.x AS DOUBLE) AS x,
               ROUND(CAST(cs.y AS DOUBLE), 5) AS y
        FROM cs JOIN vmap m ON m.route_variant = cs.route_variant)
      SELECT * FROM gen UNION ALL SELECT * FROM csr
      ORDER BY route_id, route_variant, event_type, time_slot_id, start_stop_index,
               end_stop_index, curve_kind, focus_delay NULLS FIRST, idx""",
    // A8/A9/A10 full-row reconstruction: variant survival (n ≥ 10 and ≥ 2
    // emitted ECDF points, including the reference's min-delay-0 quirk), the
    // per-cell / per-type / global sample means with integer division, the
    // fixed 11×3×11×2 grid enumeration and the General → FallbackGeneral →
    // SuperGeneral precedence are ALL re-derived in SQL from the records
    // output; only the averaged point VALUES come from the rollup dumps
    // (f32 contributor means, pinned by gtfs_default_points_check).
    "gtfs_default_curves" -> s"""
      WITH recs AS (SELECT * FROM read_parquet('__VOUT__/gtfs_records/*.parquet')),
      tr AS (SELECT trip_id, route_type
             FROM read_parquet('__VOUT__/_aux/sched_trips/*.parquet')
             WHERE route_type IS NOT NULL),
      base AS (SELECT r.route_variant, r.delay_arrival, r.delay_departure, tr.route_type,
                 ${RouteSections.duckDbSectionSql("r.stop_index", "r.stop_count")} AS route_section,
                 ${TimeSlots.duckDbSlotIdSql(GtfsTime.duckDbDateAndTimeSql(
                   "r.trip_start_date", "COALESCE(r.arrival_secs, r.departure_secs)"))} AS time_slot_id
               FROM recs r JOIN tr ON tr.trip_id = r.trip_id),
      vobs AS (
        SELECT route_type, route_section, time_slot_id, ${Codes.EventArrival} AS event_type,
               route_variant, CAST(delay_arrival AS REAL) AS delay
        FROM base WHERE delay_arrival IS NOT NULL
        UNION ALL
        SELECT route_type, route_section, time_slot_id, ${Codes.EventDeparture},
               route_variant, CAST(delay_departure AS REAL)
        FROM base WHERE delay_departure IS NOT NULL),
      vstats AS (SELECT route_type, route_section, time_slot_id, event_type, route_variant,
                        COUNT(*) AS n, COUNT(DISTINCT delay) AS nd, MIN(delay) AS mind
                 FROM vobs GROUP BY ALL),
      vsurv AS (SELECT * FROM vstats
                WHERE n >= 10 AND nd - (CASE WHEN mind = 0 THEN 1 ELSE 0 END) >= 2),
      genm AS (SELECT route_type, route_section, time_slot_id, event_type,
                      CAST(SUM(n) // COUNT(*) AS INT) AS g_sample
               FROM vsurv GROUP BY ALL),
      fbm AS (SELECT route_type, event_type, CAST(SUM(n) // COUNT(*) AS INT) AS f_sample
              FROM vsurv GROUP BY ALL),
      sgm AS (SELECT CAST(SUM(n) // COUNT(*) AS INT) AS s_sample FROM vsurv),
      grid AS (
        SELECT rt.route_type, rs.route_section, ts.time_slot_id, et.event_type
        FROM (SELECT UNNEST([0,1,2,3,4,5,6,7,200,1100,1500]) AS route_type) rt
        CROSS JOIN (SELECT UNNEST(['Beginning','Middle','End']) AS route_section) rs
        CROSS JOIN (SELECT UNNEST([1,2,3,4,5,6,7,8,9,10,11]) AS time_slot_id) ts
        CROSS JOIN (SELECT UNNEST([${Codes.EventArrival},${Codes.EventDeparture}]) AS event_type) et),
      sel AS (
        SELECT g.route_type, g.route_section, g.time_slot_id, g.event_type,
               CASE WHEN gm.g_sample IS NOT NULL THEN ${Codes.PrecisionGeneral}
                    WHEN fm.f_sample IS NOT NULL THEN ${Codes.PrecisionFallbackGeneral}
                    ELSE ${Codes.PrecisionSuperGeneral} END AS precision_type,
               COALESCE(gm.g_sample, fm.f_sample, sm.s_sample) AS sample_size
        FROM grid g
        LEFT JOIN genm gm ON gm.route_type = g.route_type
          AND gm.route_section = g.route_section
          AND gm.time_slot_id = g.time_slot_id AND gm.event_type = g.event_type
        LEFT JOIN fbm fm ON fm.route_type = g.route_type AND fm.event_type = g.event_type
        CROSS JOIN sgm sm),
      gp AS (SELECT * FROM read_parquet('__VOUT__/_aux/dft_gen_pts/*.parquet')),
      fp AS (SELECT * FROM read_parquet('__VOUT__/_aux/dft_fb_pts/*.parquet')),
      sp AS (SELECT * FROM read_parquet('__VOUT__/_aux/dft_sg_pts/*.parquet')),
      pts AS (
        SELECT s.route_type, s.route_section, s.time_slot_id, s.event_type,
               s.precision_type, s.sample_size, p.pidx, p.x, p.y
        FROM sel s JOIN gp p ON s.precision_type = ${Codes.PrecisionGeneral}
          AND p.route_type = s.route_type AND p.route_section = s.route_section
          AND p.time_slot_id = s.time_slot_id AND p.event_type = s.event_type
        UNION ALL
        SELECT s.route_type, s.route_section, s.time_slot_id, s.event_type,
               s.precision_type, s.sample_size, p.pidx, p.x, p.y
        FROM sel s JOIN fp p ON s.precision_type = ${Codes.PrecisionFallbackGeneral}
          AND p.route_type = s.route_type AND p.event_type = s.event_type
        UNION ALL
        SELECT s.route_type, s.route_section, s.time_slot_id, s.event_type,
               s.precision_type, s.sample_size, p.pidx, p.x, p.y
        FROM sel s CROSS JOIN sp p WHERE s.precision_type = ${Codes.PrecisionSuperGeneral})
      SELECT route_type, route_section, time_slot_id, event_type, precision_type,
             sample_size, pidx AS idx, CAST(x AS DOUBLE) AS x,
             ROUND(CAST(y AS DOUBLE), 5) AS y
      FROM pts
      ORDER BY route_type, route_section, time_slot_id, event_type, idx""",
    "gtfs_general_points_check" -> """
      SELECT CAST(NULL AS VARCHAR) AS route_id, CAST(NULL AS BIGINT) AS route_variant,
             CAST(NULL AS INT) AS event_type, CAST(NULL AS INT) AS time_slot_id,
             CAST(NULL AS INT) AS stop_index, CAST(NULL AS INT) AS idx,
             CAST(NULL AS REAL) AS x, CAST(NULL AS DOUBLE) AS y,
             CAST(NULL AS DOUBLE) AS y_exp
      WHERE 1 = 0""",
    "gtfs_default_points_check" -> """
      SELECT CAST(NULL AS INT) AS route_type, CAST(NULL AS VARCHAR) AS route_section,
             CAST(NULL AS INT) AS time_slot_id, CAST(NULL AS INT) AS event_type,
             CAST(NULL AS INT) AS precision_type, CAST(NULL AS INT) AS idx,
             CAST(NULL AS DOUBLE) AS x, CAST(NULL AS DOUBLE) AS y,
             CAST(NULL AS DOUBLE) AS y_exp
      WHERE 1 = 0""",
    "gtfs_curveset_shape_check" -> """
      SELECT CAST(NULL AS VARCHAR) AS route_id, CAST(NULL AS BIGINT) AS route_variant,
             CAST(NULL AS INT) AS event_type, CAST(NULL AS INT) AS time_slot_id,
             CAST(NULL AS INT) AS start_stop_index, CAST(NULL AS INT) AS end_stop_index,
             CAST(NULL AS REAL) AS focus_delay, CAST(NULL AS VARCHAR) AS reason,
             CAST(NULL AS INT) AS idx, CAST(NULL AS DOUBLE) AS x,
             CAST(NULL AS DOUBLE) AS y
      WHERE 1 = 0""",
    // Batch prediction (ST4 join form): targets re-derived from the schedule
    // dumps (event fan-out, GTFS noon-anchored time, time slot, service-day
    // scoping), then the general→default fallback joins — the curve strings
    // ride along from the curve-table dumps, everything else is re-computed.
    "gtfs_predictions" -> s"""
      WITH st AS (SELECT * FROM read_parquet('__VOUT__/_aux/sched_stop_times/*.parquet')),
      tfd AS (SELECT trip_id FROM read_parquet('__VOUT__/_aux/trips_for_date/*.parquet')),
      tr AS (SELECT * FROM read_parquet('__VOUT__/_aux/sched_trips/*.parquet')),
      ev AS (
        SELECT trip_id, stop_sequence, stop_id, stop_index, route_section,
               1 AS event_type, arrival_secs AS event_secs
        FROM st WHERE arrival_secs IS NOT NULL
        UNION ALL
        SELECT trip_id, stop_sequence, stop_id, stop_index, route_section,
               2 AS event_type, departure_secs AS event_secs
        FROM st WHERE departure_secs IS NOT NULL),
      base AS (
        SELECT ev.*, tr.route_id, tr.route_variant,
               tr.route_type AS route_type,
               COALESCE(tr.trip_start_time, 0) AS trip_start_time,
               DATE '2024-03-04' AS trip_start_date,
               ${GtfsTime.duckDbDateAndTimeSql("DATE '2024-03-04'", "ev.event_secs")}
                 AS scheduled_ts
        FROM ev
        JOIN tfd ON tfd.trip_id = ev.trip_id
        JOIN tr ON tr.trip_id = ev.trip_id),
      slotted AS (SELECT *, ${TimeSlots.duckDbSlotIdSql("scheduled_ts")} AS time_slot_id
                  FROM base),
      g AS (SELECT * FROM read_parquet('__VOUT__/_aux/gen_curves/*.parquet')),
      d AS (SELECT * FROM read_parquet('__VOUT__/_aux/dft_curves/*.parquet')),
      sel AS (
        SELECT s.*,
               COALESCE(g.g_json, d.d_json) AS prediction_curve,
               COALESCE(g.g_precision, d.d_precision) AS precision_type,
               COALESCE(g.g_sample, d.d_sample) AS sample_size,
               COALESCE(g.g_min_x, d.d_min_x)::DOUBLE AS min_x,
               COALESCE(g.g_max_x, d.d_max_x)::DOUBLE AS max_x
        FROM slotted s
        LEFT JOIN g ON g.route_variant = s.route_variant
                   AND g.event_type = s.event_type
                   AND g.time_slot_id = 12
                   AND g.stop_index = s.stop_index
        LEFT JOIN d ON d.route_type = s.route_type
                   AND d.route_section = s.route_section
                   AND d.event_type = s.event_type
                   AND d.time_slot_id = CASE WHEN s.time_slot_id = 12 THEN 1
                                             ELSE s.time_slot_id END
        WHERE COALESCE(g.g_json, d.d_json) IS NOT NULL)
      SELECT 'graft' AS source, event_type, stop_id,
             epoch(scheduled_ts) + ROUND(min_x, 6) AS prediction_min,
             epoch(scheduled_ts) + ROUND(max_x, 6) AS prediction_max,
             route_id, trip_id, trip_start_date, trip_start_time, stop_sequence,
             precision_type, 2 AS origin_type, sample_size, prediction_curve,
             'graft_schedule' AS schedule_file_name
      FROM sel ORDER BY trip_id, stop_sequence, event_type""",
    // Visual-schedule line data: the distributed joins + projection over the
    // driver-built (variant, stop) → (primary, y) map (visual_schedule.rs
    // greedy grouping, pinned by VisualScheduleSpec).
    "gtfs_visual_schedule" -> """
      SELECT tr.route_id, vp.primary_variant, tr.route_variant, st.trip_id,
             st.stop_sequence, st.stop_id, vp.y_index,
             st.arrival_secs, st.departure_secs
      FROM read_parquet('__VOUT__/_aux/sched_stop_times/*.parquet') st
      JOIN read_parquet('__VOUT__/_aux/sched_trips/*.parquet') tr
        ON tr.trip_id = st.trip_id
      JOIN read_parquet('__VOUT__/_aux/variant_primary/*.parquet') vp
        ON vp.route_id = tr.route_id AND vp.route_variant = tr.route_variant
       AND vp.stop_id = st.stop_id
      ORDER BY tr.route_id, vp.primary_variant, tr.route_variant, st.trip_id,
               st.stop_sequence""",
    // Realtime-conditioned predictions: basis selection (W3 over the records
    // dump), target fan-out, slot-ranked curve-set choice and the f32
    // union-grid interpolation of curve_at_x_with_continuation — all
    // replayed in SQL over the exploded curve-set points
    // (per_schedule_importer.rs:320-366, predictor/mod.rs:299-324).
    "gtfs_predictions_realtime" -> realtimePredictionSql,
    // A1's rt-file half against the independent java.nio listing.
    "gtfs_file_stats" -> """
      SELECT strptime(regexp_extract(file_name, '(\d{4}-\d{2}-\d{2})', 1),
                      '%Y-%m-%d')::DATE AS file_date,
             COUNT(*) AS rt_file_count,
             -- BIGINT cast: DuckDB SUM(BIGINT) is HUGEINT, which lands in
             -- pandas as float64 and hash-mismatches Spark's int64
             CAST(SUM(length) AS BIGINT) AS rt_file_size
      FROM read_parquet('__VOUT__/_aux/rt_files/*.parquet')
      GROUP BY 1 ORDER BY 1"""
  )
}

/** Writes the deterministic GTFS fixture set into a stable temp location
  * (shared between Verify/Bench invocations within one process). */
private object FixtureLocator {
  def create(): (String, String) = {
    val root = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_gtfs_fixture_v1")
    val sched = root.resolve("schedule")
    val rt = root.resolve("rt")
    if (!java.nio.file.Files.exists(rt.resolve(".done"))) {
      java.nio.file.Files.createDirectories(sched)
      java.nio.file.Files.createDirectories(rt)
      FixtureGen.writeSchedule(sched)
      FixtureGen.writeRtFiles(rt)
      java.nio.file.Files.write(rt.resolve(".done"), Array.emptyByteArray)
    }
    (sched.toString, rt.toString)
  }
}
