package graft.gtfs

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.curves.Curves

class GtfsPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val (schedDir, rtDir) = GtfsFixtures.create()
  lazy val schedule: GtfsSchedule = GtfsSchedule.load(spark, schedDir)
  lazy val records = {
    val df = Importer.importDirectory(spark, rtDir, schedule, "test")
    df.cache(); df.count(); df
  }

  test("codec round-trips a FeedMessage including negative delays") {
    import GtfsRtCodec._
    val msg = FeedMessage(Some(1700000000L), Seq(TripUpdate(
      TripDescriptor(Some("T1"), Some("R1"), Some("25:10:00"), Some("20240101")),
      Seq(StopTimeUpdate(Some(3), Some("S3"),
        Some(StopTimeEvent(Some(-120), None)), Some(StopTimeEvent(Some(60), Some(1700000100L))))))))
    val back = decode(encode(msg))
    assert(back == msg)
  }

  test("codec round-trip property: random FeedMessages survive encode→decode") {
    import GtfsRtCodec._
    // randomized structural coverage the fixed case can't give: optional
    // fields present/absent in every combination, negative delays (10-byte
    // varints), empty update lists, unicode (incl. surrogate-pair) strings
    val rnd = new scala.util.Random(4242)
    def opt[A](a: => A): Option[A] = if (rnd.nextBoolean()) Some(a) else None
    // sample WHOLE code points: indexing the pool by char could split the
    // bus emoji's surrogate pair, and a lone surrogate is not a valid
    // string (UTF-8 encodes it as '?' — a generator artifact, not a codec
    // defect; the first draft of this test tripped exactly that way)
    val pool = Seq("a", "b", "c", "X", "Y", "Z", "0", "1", "5", ":",
      "ß", "官", "🚌", "-", "_", "/", " ")
    def str(): String =
      (0 until rnd.nextInt(12)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    def event() = StopTimeEvent(opt(rnd.nextInt()),
      opt(rnd.nextLong() & Long.MaxValue))
    for (_ <- 0 until 300) {
      val msg = FeedMessage(opt(rnd.nextLong() & Long.MaxValue),
        Seq.fill(rnd.nextInt(4))(TripUpdate(
          TripDescriptor(opt(str()), opt(str()), opt(str()), opt(str())),
          Seq.fill(rnd.nextInt(5))(StopTimeUpdate(
            opt(rnd.nextInt() & Int.MaxValue), opt(str()),
            opt(event()), opt(event()))))))
      assert(decode(encode(msg)) == msg, s"round-trip mismatch for $msg")
    }
  }

  test("codec fuzz: adversarial bytes either decode or raise the typed error") {
    import GtfsRtCodec._
    val valid = encode(FeedMessage(Some(1700000000L), Seq(TripUpdate(
      TripDescriptor(Some("T1"), Some("R1"), Some("08:00:00"), Some("20240101")),
      Seq(StopTimeUpdate(Some(1), Some("S1"),
        Some(StopTimeEvent(Some(5), None)), None))))))
    val rnd = new scala.util.Random(99)
    val cases =
      // every truncation of a valid message
      (0 until valid.length).map(valid.take) ++
      // random garbage of assorted sizes
      (0 until 200).map(_ => Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)) ++
      // valid message with random single-byte corruptions
      (0 until 200).map { _ =>
        val b = valid.clone(); b(rnd.nextInt(b.length)) = rnd.nextInt().toByte; b
      }
    cases.foreach { bytes =>
      try { decode(bytes); () }
      catch {
        case _: MalformedProtobufException => () // the documented contract
        case e: Throwable =>
          fail(s"decode threw ${e.getClass.getSimpleName} on ${bytes.length} bytes" +
            s" (importer only guards the typed error): $e")
      }
    }
  }

  test("schedule load derives variants: same stop list = same variant") {
    val trips = schedule.trips.select("trip_id", "route_variant").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(trips("T1") == trips("T1b"), "identical stop lists share a variant")
    assert(trips("T1") != trips("T1sub"), "sub-sequence is a different variant")
    assert(trips("T1") != trips("T2"))
  }

  test("schedule load: stop_index dense, stop_count, section rule, >24h times") {
    val t2 = schedule.stopTimes.filter("trip_id = 'T2'")
      .select("stop_index", "stop_count", "route_section").collect()
    assert(t2.length == 16)
    assert(t2.map(_.getInt(0)).sorted.toSeq == (0 until 16))
    assert(t2.forall(_.getLong(1) == 16))
    // 16 stops → section size 5
    assert(t2.count(_.getString(2) == "Beginning") == 5)
    assert(t2.count(_.getString(2) == "End") == 5)
    val t3 = schedule.stopTimes.filter("trip_id = 'T3' AND stop_sequence = 4")
      .select("departure_secs").head()
    assert(t3.getInt(0) > 86400, "past-midnight departure kept as >24h seconds")
  }

  test("records: J1/J2 misses dropped, F4 null-delay dropped, W2 newest wins") {
    assert(records.filter("trip_id = 'GHOST'").count() == 0, "unknown trip dropped")
    assert(records.filter("stop_sequence = 999").count() == 0, "unknown stop dropped")
    // day-0 stop 1 had a newer second file with delay 444/456
    val d0 = records.filter("trip_start_date = '2024-01-01' AND stop_sequence = 10")
      .select("delay_arrival", "delay_departure").head()
    assert(d0.getInt(0) == 444 && d0.getInt(1) == 456)
    // delay-less update for S2 on day 0 must not appear as a null-null row
    assert(records.filter("delay_arrival IS NULL AND delay_departure IS NULL").count() == 0)
    // 60 days × 4 stops + day-0 outlier row
    assert(records.count() == 60L * 4 + 1)
  }

  test("gap-fill synthesizes missing stops carrying the donor's delays") {
    val filled = CurveAnalysis.gapFill(records, schedule)
    val day1 = filled.filter("trip_start_date = '2024-01-02' AND trip_id = 'T1'")
      .orderBy("stop_index")
      .select("stop_index", "observed", "delay_arrival", "delay_departure")
      .collect()
    assert(day1.length == 6, "all scheduled stops present after gap-fill")
    val synth = day1.filter(!_.getBoolean(1))
    assert(synth.map(_.getInt(0)).toSet == Set(2, 4), "stops 3,5 synthesized (0-based 2,4)")
    // synthesized stop 2 carries stop 1's delays (delay(d=1, stop=2))
    val donor = GtfsFixtures.delay(1, 2)
    assert(synth.find(_.getInt(0) == 2).get.getInt(2) == donor)
    assert(synth.find(_.getInt(0) == 2).get.getInt(3) == donor + 12)
  }

  test("specific curves: general rows gate >=20, valid curves, slots + DEFAULT") {
    val sc = CurveAnalysis.specificCurves(spark, records, schedule).cache()
    val general = sc.filter(_.curve_kind == "general").collect()
    assert(general.nonEmpty)
    general.foreach { r =>
      assert(r.sample_size >= 20)
      assert(r.curve.head.y == 0f && r.curve.last.y == 1f)
      assert(r.start_stop_index == r.end_stop_index)
      assert(r.precision_type == Codes.PrecisionSemiSpecific)
    }
    assert(general.exists(_.time_slot_id == Codes.DefaultTimeSlot))
    assert(general.exists(_.time_slot_id != Codes.DefaultTimeSlot))

    val sets = sc.filter(_.curve_kind == "curveset").collect()
    assert(sets.nonEmpty)
    sets.foreach { r =>
      assert(r.end_stop_index > r.start_stop_index)
      assert(r.focus_delay.isDefined)
      assert(r.precision_type == Codes.PrecisionSpecific)
      val c = r.curve.toArray
      assert(Curves.maxX(c) >= Curves.minX(c) + 13.0f)
      // F2/F3: foci are within ±3000 and delays were rounded to 12s
      assert(math.abs(r.focus_delay.get) < 3000)
    }
  }

  test("default curves: full 726-cell grid, precision hierarchy") {
    val dc = CurveAnalysis.defaultCurves(spark, records, schedule).collect()
    assert(dc.length == 11 * 3 * 11 * 2, "11 route types × 3 sections × 11 slots × 2 events")
    assert(dc.forall(_.curve.nonEmpty))
    val bus = dc.filter(_.route_type == 3) // fixture data is on a bus route
    assert(bus.exists(_.precision_type == Codes.PrecisionGeneral))
    // types with no data at all fall back to SuperGeneral
    val taxi = dc.filter(_.route_type == 1500)
    assert(taxi.forall(_.precision_type == Codes.PrecisionSuperGeneral))
    dc.foreach { r =>
      assert(r.curve.head.y == 0f && r.curve.last.y == 1f)
    }
  }

  test("visual schedule: sub-variants grouped under longest; y along primary") {
    val variantOf = schedule.trips.select("trip_id", "route_variant").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // grouping: T1sub (S2..S5) and T3 (S1..S4) are contiguous subsequences
    // of T1's S1..S6 → all R1 variants share T1's primary
    val lines = VisualSchedule.tripLines(spark, schedule).collect()
    val primaries = lines.map(r =>
      r.getAs[Long]("route_variant") -> r.getAs[Long]("primary_variant")).toMap
    assert(primaries(variantOf("T1sub")) == variantOf("T1"))
    assert(primaries(variantOf("T3")) == variantOf("T1"))
    assert(primaries(variantOf("T2")) == variantOf("T2"), "R2 is its own primary")

    // y positions follow the PRIMARY list: T1sub serves S2..S5 → indices 1..4
    val subY = lines.filter(_.getAs[String]("trip_id") == "T1sub")
      .sortBy(_.getAs[Int]("stop_sequence"))
      .map(_.getAs[Int]("y_index")).toSeq
    assert(subY == Seq(1, 2, 3, 4), s"T1sub y positions: $subY")
    // every trip of the fixture contributes all its stop rows
    assert(lines.count(_.getAs[String]("trip_id") == "T2") == 16)
  }

  test("variant index map is memoized per (session, schedule) — plan reuse") {
    // r17: the schedule-static mapping is built once per schedule version
    // (S2 FileCache parity); same key returns the SAME DataFrame, a
    // different schedule instance rebuilds
    val a = VisualSchedule.variantIndexMap(spark, schedule)
    val b = VisualSchedule.variantIndexMap(spark, schedule)
    assert(a eq b, "same (session, schedule) reuses the built mapping")
    val (schedDir2, _) = GtfsFixtures.create()
    val schedule2 = GtfsSchedule.load(spark, schedDir2)
    try {
      val c = VisualSchedule.variantIndexMap(spark, schedule2)
      assert(!(c eq a), "a new schedule instance gets its own mapping")
      assert(c.collect().toSet == a.collect().toSet,
        "identical fixture schedules yield identical mappings")
    } finally schedule2.unpersist()
  }

  test("batch prediction targets only trips whose service runs on the date") {
    // same schedule, but service WD skips Mondays
    val dir = java.nio.file.Files.createTempDirectory("nomonday")
    FixtureGen.writeSchedule(dir)
    java.nio.file.Files.write(dir.resolve("calendar.txt"), String.join("\n",
      "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date",
      "WD,0,1,1,1,1,1,1,20240101,20241231").getBytes("UTF-8"))
    val noMonday = GtfsSchedule.load(spark, dir.toString)
    val sc = CurveAnalysis.specificCurves(spark, records, schedule)
    val dc = CurveAnalysis.defaultCurves(spark, records, schedule)
    val monday = Predictor.batchPredict(spark, noMonday, "2024-03-04", "test", sc, dc)
    assert(monday.count() == 0, "2024-03-04 is a Monday — no service, no targets")
    val tuesday = Predictor.batchPredict(spark, noMonday, "2024-03-05", "test", sc, dc)
    assert(tuesday.count() > 0, "Tuesday service runs")
  }

  test("predictor: hierarchy specific -> default, batch join produces predictions") {
    val sc = CurveAnalysis.specificCurves(spark, records, schedule)
    val dc = CurveAnalysis.defaultCurves(spark, records, schedule)
    val p = Predictor.fromTables(spark, sc, dc)
    val variant = schedule.trips.filter("trip_id = 'T1'")
      .select("route_variant").head().getLong(0)

    // SemiSpecific: no start info, general curve at stop 1
    val semi = p.predict(variant, 3, None, 1, "Beginning", 3, Codes.EventArrival)
    assert(semi.exists(_.precisionType == Codes.PrecisionSemiSpecific))

    // Specific: known delay at stop 0 → interpolated curve for stop 5
    val spec = p.predict(variant, 3, Some((0, Some(120))), 5, "End", 3, Codes.EventArrival)
    assert(spec.isDefined)
    assert(Set(Codes.PrecisionSpecific, Codes.PrecisionFallbackSpecific)
      .contains(spec.get.precisionType))

    // unknown variant → default grid
    val dflt = p.predict(-1L, 2, Some((0, Some(120))), 5, "Middle", 3, Codes.EventArrival)
    assert(dflt.exists(r => r.precisionType == Codes.PrecisionGeneral ||
      r.precisionType == Codes.PrecisionFallbackGeneral ||
      r.precisionType == Codes.PrecisionSuperGeneral))

    val preds = Predictor.batchPredict(spark, schedule, "2024-03-04", "test", sc, dc)
    assert(preds.count() > 0)
    val row = preds.filter("trip_id = 'T1' AND stop_sequence = 60 AND event_type = 1").head()
    val pmin = row.getAs[java.sql.Timestamp]("prediction_min")
    val pmax = row.getAs[java.sql.Timestamp]("prediction_max")
    assert(!pmax.before(pmin))
    assert(row.getAs[Int]("origin_type") == Codes.OriginSchedule)
  }

  test("prediction curves are capped at 120 evenly-index-spaced points incl. endpoints") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val big = (0 until 300).map(i => graft.curves.CPoint(i.toFloat, i / 299f))
    val out = Seq(Tuple1(big)).toDF("curve")
      .select(Predictor.capCurve(col("curve")).as("capped"))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getFloat(0), r.getFloat(1)))
    assert(out.size == Predictor.MaxCurvePoints)
    assert(out.head._1 == 0f && out.last._1 == 299f, "endpoints must survive the cap")
    assert(out.map(_._1.toInt) == (0 until 120).map(i => i * 299 / 119),
      "points must be evenly index-spaced")
    // curves at or under the cap pass through untouched
    val small = (0 until 5).map(i => graft.curves.CPoint(i.toFloat, i / 4f))
    val kept = Seq(Tuple1(small)).toDF("curve")
      .select(Predictor.capCurve(col("curve")).as("capped"))
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(kept.size == 5)
    // null stays null: under ANSI, size(NULL) is NULL, the CASE would fall
    // to otherwise and transform would build a NON-null array of 120 null
    // structs — a "no curve matched" target (rank-2 row whose route never
    // equi-joins the default grid) must instead stay null and be dropped by
    // the prediction paths' isNotNull filter, as the reference emits no
    // prediction for it (predictor/mod.rs:219-221)
    val nulled = Seq(Tuple1(Option.empty[Seq[graft.curves.CPoint]])).toDF("curve")
      .select(Predictor.capCurve(col("curve")).as("capped"))
      .head
    assert(nulled.isNullAt(0), "capCurve(NULL) must be NULL, not an array of nulls")
  }
}
