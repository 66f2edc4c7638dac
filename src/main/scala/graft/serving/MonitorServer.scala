package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit, to_date, unix_timestamp}
import graft.curves.CPoint
import graft.gtfs.{Codes, GtfsSchedule, HeatStrip, Monitor}

/** S18 — the HTTP serving layer over the Spark-produced monitor state
  * (reference `src/monitor/mod.rs:102-190`; SURVEY scopes the engine out of
  * this layer — "the serving layer can be anything reading the
  * Spark-produced tables" — and this is exactly that: a dependency-free JDK
  * `HttpServer` whose handlers only consume the same page DataFrames the
  * oracled monitor_* queries check). Routes mirror the reference:
  *
  *   - `GET /`                         → search page
  *   - `GET /embed`, `GET /noscript`   → search page variants
  *   - `GET /autocomplete?query=q`     → JSON list (F11)
  *   - `GET /stop-by-name?start=name`  → 302 to `/<dd.MM.yy HH:mm>/<name>/`
  *                                       with the X14 path escaping
  *   - `GET /<datetime>/<stop>/`       → stop page (F5/F6/W5/W6) with an
  *                                       X15 heat-strip data URL per row
  *   - `GET /<datetime>/<stop>/<trip>/`            → trip page (the trip
  *     descriptor is the reference's `"<type> <route> nach <headsign> um
  *     <HH:mm>"` form, resolved via J8; mod.rs:690-795)
  *   - `GET /<datetime>/<stop>/<trip>/<stop>/`     → journey stop page with
  *     arrival context (per-row transfer probability, F8/X10/X11;
  *     mod.rs:866-890); `Fußweg` path elements are walk legs
  *     (journey_data.rs:211-218) and a journey may not END with a walk
  *     (mod.rs:410 → 400)
  *   - `GET /info/<datetime>/<journey…>/`          → journey info page
  *     (component list with reach probabilities; mod.rs:1264)
  *   - `GET /style.css`, `/favicon.ico`, `/impressum.html`, and the
  *     `fonts/ favicons/ help/ images/` trees → static files under
  *     `docRoot` (mod.rs:153 / serve_static_file; the reference's
  *     `web-assets/`), 404 on a missing file, absent root, or any
  *     path-traversal escape
  *
  * Page rendering collects only bounded page rows (same contract as the
  * reference building HTML per request); all heavy lifting stays in the
  * cached prediction DataFrame. Failures render the reference's 500 page.
  *
  * The schedule HOT-RELOADS: the reference resolves it per request through
  * its mtime FileCache (`main.get_schedule()`, monitor/mod.rs:204/253), so
  * a GTFS version dropped while the monitor runs reaches autocomplete,
  * trip resolution and the stop pages without a restart. `scheduleProvider`
  * is consulted at most once per `scheduleTtlMs` (default 5 s — the
  * importer's TIME_BETWEEN_DIR_SCANS cadence; pass 0 to resolve every
  * request); wire it to [[graft.gtfs.ScheduleCache.newest]] so the probe is
  * one directory listing + fingerprint check, with the load itself cached
  * until the version's files actually change. PREDICTIONS resolve through a
  * provider as well, once per request: a `spark.read.parquet` DataFrame
  * snapshots its parquet file index at CONSTRUCTION, so a pinned one would
  * point at deleted files forever after the importer's first dynamic
  * partition overwrite — pass `() => spark.read.parquet(dir)` and each
  * request reads the live table (one listing per request; the reference's
  * monitor likewise queries MySQL per request). A provider that returns None
  * (the schedule tree momentarily empty mid-swap) keeps the LAST
  * successfully resolved schedule — the reference's monitor likewise keeps
  * its loaded schedule until the cache hands it a new one — and re-probes
  * on the next request rather than waiting out the TTL. The last-known
  * schedule serves from its persisted derivations (S2: trips/stop_times);
  * a request needing a non-persisted CSV that is physically gone renders
  * the 500 page for that request and recovers with the tree — the server
  * itself never dies on a swap.
  */
class MonitorServer(spark: SparkSession,
                    scheduleProvider: () => Option[GtfsSchedule],
                    predictionsProvider: () => DataFrame, port: Int = 0,
                    docRoot: Option[String] = None,
                    scheduleTtlMs: Long = 5000L,
                    dataRoots: Seq[String] = Seq.empty) {

  /** Compat/test surface: PINS `schedule` AND the predictions DataFrame
    * (its file-index snapshot included) for the server's lifetime — a GTFS
    * version dropped mid-run, or a predictions partition overwritten by a
    * live importer, is invisible here. Production wires the primary
    * constructor to a [[graft.gtfs.ScheduleCache]] and a fresh
    * `spark.read.parquet`. */
  def this(spark: SparkSession, schedule: GtfsSchedule, predictions: DataFrame) =
    this(spark, () => Some(schedule), () => predictions)

  // like the schedule: ONE predictions frame per request (fresh file-index
  // listing), pinned on first use, cleared with the exchange
  private val pinnedPredictions = new ThreadLocal[DataFrame]

  private def predictions: DataFrame = {
    val p = pinnedPredictions.get()
    if (p != null) p
    else {
      val d = predictionsProvider()
      pinnedPredictions.set(d)
      d
    }
  }

  // (resolvedAtNanos, schedule) of the last successful resolution; requests
  // inside the TTL reuse it without consulting the provider at all
  private val current =
    new java.util.concurrent.atomic.AtomicReference[(Long, GtfsSchedule)](null)

  // ONE schedule object per request: handlers read `schedule` many times
  // (resolveTrip alone touches stops, trips, routes and stop_times), and a
  // version swap landing mid-render must not hand the same request v1 stops
  // and v2 trips — the first access resolves and pins it for the request's
  // pool thread; [[handle]] clears the pin when the exchange closes
  private val pinnedForRequest = new ThreadLocal[GtfsSchedule]

  private def schedule: GtfsSchedule = {
    val p = pinnedForRequest.get()
    if (p != null) p
    else {
      // lazily on FIRST use, so static-asset requests never resolve at all
      val s = resolveSchedule()
      pinnedForRequest.set(s)
      s
    }
  }

  // set once the boot-order notice has been printed, cleared by the first
  // successful resolution (which logs the flip) — so an operator can tell
  // "started before the first schedule version" from a real fault without
  // grepping per-request 500s
  private val noScheduleNoticed = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** `private[graft]` so the scale rehearsal can time the REAL served
    * steady-state path (TTL check + memo read), not a proxy. */
  private[graft] def resolveSchedule(): GtfsSchedule = {
    val now = System.nanoTime()
    val c = current.get()
    if (c != null && now - c._1 < scheduleTtlMs * 1000000L) c._2
    else scheduleProvider() match {
      case Some(s) =>
        if (noScheduleNoticed.compareAndSet(true, false))
          System.err.println(
            "[monitor] first schedule version resolved; dynamic pages are live")
        // CAS, not set: a slow resolution racing a concurrent one must not
        // clobber the other thread's (possibly newer) schedule with a fresh
        // stamp — on a lost race this request still serves what it resolved
        current.compareAndSet(c, (now, s)); s
      case None if c != null =>
        // tree momentarily empty: serve the last known schedule and leave
        // the stamp stale so the very next request re-probes (recovery is
        // not delayed by the TTL)
        c._2
      case None =>
        // parity with the reference's monitor, which cannot start without a
        // schedule (its own TODO at monitor/mod.rs:127-129) — but say so
        // ONCE instead of only throwing per request
        if (noScheduleNoticed.compareAndSet(false, true))
          System.err.println("[monitor] no schedule version available yet; " +
            "dynamic pages render the 500 page until the first version lands " +
            "(static assets and the search page serve regardless)")
        throw new IllegalStateException(
          "no schedule version available to serve")
    }
  }

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  // without an executor every request runs on the single dispatcher thread:
  // one stop-page render (seconds of Spark collects) would head-of-line
  // block even trivial /autocomplete calls. Spark job submission is
  // thread-safe, so a small pool serves pages concurrently.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)

  def start(): Int = {
    server.start()
    // boot-order notice: a monitor started BEFORE any schedule version
    // exists serves statics but 500s dynamic pages — probe once (one
    // provider listing) so the log says which situation this is
    try resolveSchedule()
    catch { case scala.util.control.NonFatal(_) => () } // per-request paths re-probe

    server.getAddress.getPort
  }
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private def handle(ex: HttpExchange): Unit =
    // one bounded retry when a page read races the automatic mode's dynamic
    // partition overwrite of the predictions/records tables (the reference's
    // monitor reads transactionally from MySQL and never sees this): the
    // handlers build the whole body BEFORE writing any response bytes, so a
    // failed first attempt has sent nothing and the retry is safe; the
    // per-request pins are cleared between attempts so the retry resolves a
    // FRESH file index instead of re-reading the raced snapshot
    try MonitorServer.withReadRetry(onRetry = () => {
      // clear BOTH pins AND the TTL memo: without invalidating `current`,
      // a schedule-side race inside the TTL would re-resolve the identical
      // stale schedule and the retry could never succeed
      pinnedForRequest.remove(); pinnedPredictions.remove(); current.set(null)
    }, dataRoots = dataRoots)(route(ex))
    catch {
      case e: Exception =>
        // best-effort: if the failed attempt already sent headers (client
        // disconnect mid-body-write), a second sendResponseHeaders throws —
        // swallow it rather than leak into the dispatcher; the finally
        // still closes the exchange
        try respond(ex, 500, "text/html",
          s"<html><body><h1>500</h1><p>${escapeHtml(e.toString)}</p></body></html>")
        catch { case _: Exception => () }
    } finally {
      pinnedForRequest.remove(); pinnedPredictions.remove(); ex.close()
    }

  private def route(ex: HttpExchange): Unit = {
    val rawPath = ex.getRequestURI.getRawPath
    // URI path segments decode only %-escapes; URLDecoder alone would also
    // turn a literal '+' (which the X14 escaping passes through) into a space
    val parts = rawPath.split("/").filter(_.nonEmpty)
      .map(p => java.net.URLDecoder.decode(p.replace("+", "%2B"),
        StandardCharsets.UTF_8))
    val q = queryParams(ex)
    parts.toSeq match {
      // static assets FIRST, exactly the reference's prefix set
      // (mod.rs:153: fonts/_, favicons/_, favicon.ico, impressum.html,
      // style.css, help/.., images/..) — anything else falls through to
      // the dynamic routes
      case p if isStaticPath(p) => serveStatic(ex, p)
      case Seq() | Seq("embed") | Seq("noscript") =>
        respond(ex, 200, "text/html", searchPage)
      case Seq("autocomplete") =>
        respond(ex, 200, "application/json",
          autocompleteJson(q.getOrElse("query", "")))
      case Seq("stop-by-name") =>
        val name = q.getOrElse("start", "")
        val now = java.time.LocalDateTime.now()
          .format(java.time.format.DateTimeFormatter.ofPattern("dd.MM.yy HH:mm"))
        // the X14 set passes a literal space through (fine INSIDE a page
        // path the browser renders), but a Location HEADER must be a valid
        // RFC 3986 URI — strict clients throw on a raw space
        val loc = s"/${pathEncode(now)}/${pathEncode(name)}/".replace(" ", "%20")
        ex.getResponseHeaders.add("Location", loc)
        ex.sendResponseHeaders(302, -1)
      case "info" +: datetime +: journey if journey.nonEmpty =>
        respond(ex, 200, "text/html", infoPage(datetime, journey))
      case Seq(datetime, stopName) =>
        respond(ex, 200, "text/html", stopPage(datetime, stopName))
      // a journey path: datetime then alternating stop / (trip|Fußweg)
      // components (journey_data.rs:183-208)
      case datetime +: journey if journey.nonEmpty =>
        if (journey.size % 2 == 0) {
          // even count → journey ends with a trip or walk component
          if (journey.last == "Fußweg")
            respond(ex, 400, "text/html",
              "400: Journey may not end with a walk.") // mod.rs:410
          else respond(ex, 200, "text/html", tripPageHtml(datetime, journey))
        } else respond(ex, 200, "text/html", journeyStopPage(datetime, journey))
      case _ =>
        respond(ex, 404, "text/html",
          "<html><body><h1>404</h1></body></html>")
    }
  }

  // ---- static assets (mod.rs:153 + serve_static_file/mod.rs:192, the
  // reference's hyper_staticfile over "web-assets/") ----

  private def isStaticPath(parts: Seq[String]): Boolean = parts match {
    case Seq("fonts", _) | Seq("favicons", _) => true
    case Seq("favicon.ico") | Seq("impressum.html") | Seq("style.css") => true
    case "help" +: _ => true
    case "images" +: _ => true
    case _ => false
  }

  private val mimeByExt = Map(
    "html" -> "text/html", "css" -> "text/css",
    "js" -> "application/javascript", "json" -> "application/json",
    "png" -> "image/png", "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg",
    "svg" -> "image/svg+xml", "gif" -> "image/gif",
    "ico" -> "image/x-icon", "woff" -> "font/woff", "woff2" -> "font/woff2",
    "ttf" -> "font/ttf", "otf" -> "font/otf", "txt" -> "text/plain")

  /** Serves one file from the doc root. 404 for a missing root, a missing
    * file, or any path that escapes the root — the parts are already
    * %-decoded, so a `%2e%2e` ("..") element lands here and must be caught
    * by the canonical-path containment check, not by string matching. */
  private def serveStatic(ex: HttpExchange, parts: Seq[String]): Unit = {
    val file = docRoot.map { root =>
      val rootF = new java.io.File(root).getCanonicalFile
      val f = new java.io.File(rootF, parts.mkString(java.io.File.separator))
        .getCanonicalFile
      (rootF, f)
    }.filter { case (rootF, f) =>
      f.getPath.startsWith(rootF.getPath + java.io.File.separator) && f.isFile
    }.map(_._2)
    file match {
      case None =>
        respond(ex, 404, "text/html", "<html><body><h1>404</h1></body></html>")
      case Some(f) =>
        val ext = f.getName.split('.').last.toLowerCase
        val mime = mimeByExt.getOrElse(ext, "application/octet-stream")
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        ex.getResponseHeaders.add("Content-Type", mime)
        // JDK HttpServer: length 0 means "chunked, unknown" — an empty
        // asset must send -1 (no body) instead
        ex.sendResponseHeaders(200, if (bytes.length == 0) -1 else bytes.length.toLong)
        ex.getResponseBody.write(bytes)
    }
  }

  /** X14 escaping for a generated path element. */
  private def pathEncode(s: String): String =
    graft.functions.PercentEncodePath
      .encode(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  private def searchPage: String =
    """<html><body><h1>graft monitor</h1>
      |<form action="/stop-by-name" method="get">
      |<input name="start" placeholder="stop name"/><button>Go</button>
      |</form></body></html>""".stripMargin

  private def autocompleteJson(prefix: String): String = {
    val names = Monitor
      .autocomplete(schedule.stops, prefix.split("\\s+").filter(_.nonEmpty).toSeq)
      .collect().map(_.getString(0))
    names.map(n => "\"" + jsonEscape(n) + "\"").mkString("[", ",", "]")
  }

  /** The stop page across the extended platform group, one heat strip per
    * departure row on the page's shared time axis. `datetime` is the
    * reference's `dd.MM.yy HH:mm` path element; the page window is that
    * day (the fixture queries' convention). The rows come from THE SAME
    * pipeline the oracled monitor_stop_page query runs (F5 overlap, F6
    * quantile trim, W6 realtime-over-schedule, F7 final-stop drop, W5
    * median sort) — the server must not re-implement a weaker page that
    * would, e.g., list a schedule row next to its realtime replacement. */
  private def stopPage(datetime: String, stopName: String): String = {
    val day = java.time.LocalDate.parse(datetime.split(" ").head,
      java.time.format.DateTimeFormatter.ofPattern("dd.MM.yy"))
    val w0 = s"$day 00:00:00"
    val w1 = s"${day.plusDays(1)} 00:00:00"
    val rows = Monitor.stopPageByName(spark, predictions, schedule, stopName,
      w0, w1, keep = Seq("prediction_min", "prediction_max", "prediction_curve"))
      .collect()
    if (rows.isEmpty)
      return s"<html><body><h1>${escapeHtml(stopName)}</h1><p>no departures</p></body></html>"
    def epoch(r: org.apache.spark.sql.Row, field: String): Double =
      r.getAs[java.sql.Timestamp](field).getTime / 1000.0
    val win0 = rows.map(epoch(_, "prediction_min")).min
    val win1 = rows.map(epoch(_, "prediction_max")).max
    val trs = rows.map { r => // already W5-ordered by median
      val curve: Array[CPoint] = r.getAs[Seq[org.apache.spark.sql.Row]]("prediction_curve")
        .map(p => CPoint(p.getFloat(0), p.getFloat(1))).toArray
      val anchor = epoch(r, "prediction_min") - curve.head.x
      val png = HeatStrip.png(curve, anchor, win0, win1, width = 120,
        Codes.EventDeparture)
      val b64 = java.util.Base64.getEncoder.encodeToString(png)
      def s(field: String): String = // route join is left: name may be null
        escapeHtml(Option(r.getAs[String](field)).getOrElse("?"))
      s"""<tr><td>${s("route_short_name")}</td>
         |<td>${s("route_type_label")}</td>
         |<td>${s("trip_id")}</td>
         |<td>${r.getAs[java.sql.Timestamp]("median_ts").toInstant}</td>
         |<td>${escapeHtml(r.getAs[String]("delay_label"))}</td>
         |<td><img alt="heat strip" src="data:image/png;base64,$b64"/></td></tr>""".stripMargin
    }
    s"""<html><body><h1>${escapeHtml(stopName)}</h1>
       |<table><tr><th>route</th><th>type</th><th>trip</th><th>median</th>
       |<th>delay</th><th>density</th></tr>
       |${trs.mkString("\n")}
       |</table></body></html>""".stripMargin
  }

  // ---- journey-path machinery (reference journey_data.rs) ----

  /** The reference's trip descriptor: `"<type> <route> nach <headsign> um
    * <HH:mm>"` (journey_data.rs:352-355). */
  private val TripRe = "(\\S+) (.+) nach (.+) um (\\d\\d):(\\d\\d)".r

  /** Reverse of the X13 route-type labels (monitor/mod.rs:894-922). */
  private val labelToType = Map(
    "Tram" -> 0, "Subway" -> 1, "Rail" -> 2, "Bus" -> 3, "Ferry" -> 4,
    "CableCar" -> 5, "Gondola" -> 6, "Funicular" -> 7, "Coach" -> 200,
    "Air" -> 1100, "Taxi" -> 1500)

  private val PathDtFmt = java.time.format.DateTimeFormatter.ofPattern("dd.MM.yy HH:mm")

  private def serviceDate(datetime: String): String =
    java.time.LocalDate.parse(datetime.split(" ").head,
      java.time.format.DateTimeFormatter.ofPattern("dd.MM.yy")).toString

  /** A resolved ride: vehicle identity + boarding stop sequence. */
  private case class ResolvedTrip(tripId: String, tripStartDate: String,
                                  tripStartTime: Int, boardSeq: Int)

  /** J8 resolution of a descriptor path element at a boarding stop. */
  private def resolveTrip(descr: String, boardingStop: String,
                          date: String): ResolvedTrip = descr match {
    case TripRe(label, routeName, headsign, hh, mm) =>
      val routeType = labelToType.getOrElse(label,
        throw new IllegalArgumentException(s"unknown route type label '$label'"))
      // J8 at MINUTE granularity: the URL's descriptor carries HH:mm only
      // (journey_data.rs:355 "%H:%M"), so the server matches the scheduled
      // departure's minute-of-day; Monitor.resolveTrip (the oracled exact-
      // seconds form) stays unchanged for callers that know the seconds
      val mins = hh.toInt * 60 + mm.toInt
      val stopIds = schedule.stops
        .filter(col("stop_name") === lit(boardingStop)).select(col("stop_id"))
      val rows = schedule.trips
        .filter(col("trip_headsign") === lit(headsign)
          && col("route_type") === routeType)
        .join(schedule.routes
          .filter(col("route_short_name") === lit(routeName))
          .select("route_id"), Seq("route_id"))
        .join(schedule.stopTimes, Seq("trip_id"))
        .join(broadcast(stopIds), Seq("stop_id"))
        .filter(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.floor(col("departure_secs") / 60),
          lit(1440)) === mins)
        .select("trip_id", "route_id", "route_variant", "stop_sequence")
        .collect()
      require(rows.nonEmpty, s"no trip matches descriptor '$descr' at $boardingStop")
      // collect() order varies with partitioning — pick deterministically:
      // the first matching trip id, boarding at its EARLIEST matching stop
      // (a loop trip can pass the boarding platform twice in one minute;
      // identical URLs must serve identical pages)
      val best = rows.minBy(r => (r.getString(0), r.getInt(3)))
      val tripId = best.getString(0)
      val startTime = schedule.trips.filter(col("trip_id") === lit(tripId))
        .select("trip_start_time").collect().headOption
        .flatMap(r => Option(r.get(0)).map(_.toString.toInt)).getOrElse(0)
      ResolvedTrip(tripId, date, startTime, best.getInt(3))
    case _ => throw new IllegalArgumentException(
      s"Trip string does not contain a valid trip descriptor: '$descr'")
  }

  /** First stop sequence after `afterSeq` on the trip whose platform has
    * `stopName` (the alighting stop of a ride leg). */
  private def alightSeq(tripId: String, stopName: String, afterSeq: Int): Int = {
    val rows = schedule.stopTimes
      .filter(col("trip_id") === lit(tripId) && col("stop_sequence") > afterSeq)
      .join(broadcast(schedule.stops.filter(col("stop_name") === lit(stopName))
        .select("stop_id")), Seq("stop_id"))
      .agg(org.apache.spark.sql.functions.min("stop_sequence")).collect()
    require(rows.nonEmpty && !rows.head.isNullAt(0),
      s"trip $tripId does not reach '$stopName' after sequence $afterSeq")
    rows.head.getInt(0)
  }

  /** One prediction curve + absolute anchor from the predictions table
    * (single-row collect, like the reference's per-leg queries). */
  /** Minimum platform-to-platform haversine between two stop NAMES (X8 via
    * the shared Geo column expression; both groups are a handful of rows). */
  private def stopDistanceM(a: String, b: String): Double = {
    val s = schedule.stops.select(col("stop_name"), col("stop_lat"), col("stop_lon"))
    val pa = s.filter(col("stop_name") === lit(a))
      .select(col("stop_lat").as("lat1"), col("stop_lon").as("lon1"))
    val pb = s.filter(col("stop_name") === lit(b))
      .select(col("stop_lat").as("lat2"), col("stop_lon").as("lon2"))
    val rows = pa.crossJoin(pb).select(graft.gtfs.Geo.haversineMeters(
      col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("d"))
      .agg(org.apache.spark.sql.functions.min("d")).collect()
    require(rows.nonEmpty && !rows.head.isNullAt(0), s"unknown stops '$a'/'$b'")
    rows.head.getDouble(0)
  }

  /** The journey's leg list for components 1 until `until` (exclusive).
    * Components alternate stop / (trip|Fußweg), starting with a stop
    * (journey_data.rs:183-208). */
  private def buildLegs(datetime: String, journey: Seq[String],
                        until: Int): Seq[Monitor.JourneyLeg] = {
    val date = serviceDate(datetime)
    (1 until until by 2).map { i =>
      journey(i) match {
        case "Fußweg" => Monitor.WalkLeg(
          stopDistanceM(journey(i - 1), journey(i + 1)).toFloat)
        case descr =>
          val t = resolveTrip(descr, journey(i - 1), date)
          Monitor.RideLeg(t.tripId, t.tripStartDate, t.tripStartTime,
            t.boardSeq, alightSeq(t.tripId, journey(i + 1), t.boardSeq))
      }
    }
  }

  /** Walks the journey components up to (exclusive) index `until` through
    * the ORACLED fold ([[Monitor.journeyStates]] — one copy of the X10/X11
    * composition for query and serving), returning the traveller's arrival
    * curve + absolute anchor there. Like the query form, every ride leg
    * requires its boarding DEPARTURE prediction too (for the transfer-
    * probability fold) — a store missing that row fails the request rather
    * than silently serving a page outside the oracle's semantics. */
  private def arrivalState(datetime: String, journey: Seq[String],
                           until: Int): (Array[CPoint], Double) = {
    val startEpoch = java.time.LocalDateTime.parse(datetime, PathDtFmt)
      .toEpochSecond(java.time.ZoneOffset.UTC).toDouble
    val last = Monitor.journeyStates(predictions, startEpoch,
      buildLegs(datetime, journey, until)).last
    (last.curve, last.anchor)
  }

  /** The trip page (mod.rs:690-795): journey ends with a trip descriptor. */
  private def tripPageHtml(datetime: String, journey: Seq[String]): String = {
    val date = serviceDate(datetime)
    val t = resolveTrip(journey.last, journey(journey.size - 2), date)
    val rows = Monitor.tripPage(spark, predictions, schedule, t.tripId,
      t.tripStartDate, t.tripStartTime, t.boardSeq).collect()
    val trs = rows.map { r =>
      def ts(f: String) = Option(r.getAs[java.sql.Timestamp](f))
        .map(_.toInstant.toString).getOrElse("?")
      s"""<tr><td>${r.getAs[Int]("stop_sequence")}</td>
         |<td>${if (r.getAs[Int]("event_type") == Codes.EventDeparture) "dep" else "arr"}</td>
         |<td>${escapeHtml(Option(r.getAs[String]("stop_name")).getOrElse("?"))}</td>
         |<td>${ts("sched_ts")}</td><td>${ts("q1_ts")}</td>
         |<td>${ts("median_ts")}</td><td>${ts("q99_ts")}</td></tr>""".stripMargin
    }
    s"""<html><body><h1>${escapeHtml(journey.last)}</h1>
       |<table><tr><th>seq</th><th>event</th><th>stop</th><th>scheduled</th>
       |<th>-</th><th>o</th><th>+</th></tr>
       |${trs.mkString("\n")}
       |</table></body></html>""".stripMargin
  }

  /** Journey stop page (mod.rs:866-890): arrival context from the legs
    * before the final stop; per-departure transfer probability, F8 cut. */
  private def journeyStopPage(datetime: String, journey: Seq[String]): String = {
    if (journey.size == 1) return stopPage(datetime, journey.head)
    val stopName = journey.last
    val (curve, anchor) = arrivalState(datetime, journey, journey.size - 1)
    val day = java.time.LocalDate.parse(datetime.split(" ").head,
      java.time.format.DateTimeFormatter.ofPattern("dd.MM.yy"))
    val rows = Monitor.stopPageWithArrival(spark, predictions, schedule,
      stopName, s"$day 00:00:00", s"${day.plusDays(1)} 00:00:00",
      curve, anchor).collect()
    val trs = rows.map { r =>
      def s(f: String) = escapeHtml(Option(r.getAs[String](f)).getOrElse("?"))
      s"""<tr><td>${s("route_short_name")}</td><td>${s("trip_id")}</td>
         |<td>${r.getAs[java.sql.Timestamp]("median_ts").toInstant}</td>
         |<td>${s("delay_label")}</td>
         |<td>${(r.getAs[Double]("transfer_prob") * 100).round}%</td></tr>""".stripMargin
    }
    s"""<html><body><h1>${escapeHtml(stopName)}</h1>
       |<table><tr><th>route</th><th>trip</th><th>median</th><th>delay</th>
       |<th>transfer</th></tr>
       |${trs.mkString("\n")}
       |</table></body></html>""".stripMargin
  }

  /** Journey info page (mod.rs:1264 generate_info_page): one row per
    * component with kind, reach probability and median instant. Journeys
    * must end with a stop (ride legs need their alighting stop). */
  private def infoPage(datetime: String, journey: Seq[String]): String = {
    require(journey.size % 2 == 1, "info journeys must end with a stop")
    val startEpoch = java.time.LocalDateTime.parse(datetime, PathDtFmt)
      .toEpochSecond(java.time.ZoneOffset.UTC).toDouble
    val legs = buildLegs(datetime, journey, journey.size)
    val rows = Monitor.journey(spark, predictions, schedule, startEpoch, legs)
      .select("component_idx", "kind", "trip_id", "reach_prob", "median_epoch")
      .collect()
    val trs = rows.map { r =>
      s"""<tr><td>${r.getAs[Int]("component_idx")}</td>
         |<td>${escapeHtml(r.getAs[String]("kind"))}</td>
         |<td>${escapeHtml(r.getAs[String]("trip_id"))}</td>
         |<td>${r.getAs[Double]("reach_prob")}</td>
         |<td>${java.time.Instant.ofEpochSecond(r.getAs[Double]("median_epoch").toLong)}</td></tr>""".stripMargin
    }
    s"""<html><body><h1>Journey</h1>
       |<table><tr><th>#</th><th>kind</th><th>trip</th><th>reach</th>
       |<th>median</th></tr>
       |${trs.mkString("\n")}
       |</table></body></html>""".stripMargin
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map(_.split("&").toSeq).getOrElse(Seq())
      .flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) =>
            Some(java.net.URLDecoder.decode(k, StandardCharsets.UTF_8) ->
              java.net.URLDecoder.decode(v, StandardCharsets.UTF_8))
          case _ => None
        }
      }.toMap

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def respond(ex: HttpExchange, code: Int, mime: String, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", s"$mime; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }
}

object MonitorServer {

  /** A read that raced a concurrent file swap: a replaced file vanishes
    * between plan and scan. Since r13 the LWW tables themselves are
    * race-free (LwwTable's retirement/grace discipline keeps superseded
    * files on disk through the grace window), so this belt remains for the
    * trees that still swap by rename — the schedule directory and the
    * curve stores — and for readers that outlive the grace window.
    * Deliberately NARROW —
    * anything else (bad descriptor, missing trip, a genuinely broken table)
    * must surface on the first attempt. With `dataRoots` given, the failure
    * must additionally name a path under one of them (the schedule tree and
    * the predictions/records tables — the only paths a live importer
    * rewrites), mirroring `StreamingImport.scheduleReadRace`: a permanently
    * missing file elsewhere must not pay the retry sleep + re-render on
    * every request before its 500. An empty `dataRoots` (providers are
    * opaque closures; the caller did not say where they read) keeps the
    * unscoped match. */
  private[serving] def transientReadRace(e: Throwable,
      dataRoots: Seq[String] = Seq.empty): Boolean = {
    val rootPaths = dataRoots.map(r =>
      new org.apache.hadoop.fs.Path(r).toUri.getPath)
    def underRoots(m: String): Boolean =
      rootPaths.isEmpty || rootPaths.exists(m.contains)
    def walk(t: Throwable, depth: Int): Boolean = t match {
      case null => false
      case _ if depth >= 16 => false
      case se: org.apache.spark.SparkException =>
        val m = Option(se.getMessage).getOrElse("")
        (m.contains("FAILED_READ_FILE") && underRoots(m)) ||
          walk(se.getCause, depth + 1)
      case fnf: java.io.FileNotFoundException =>
        underRoots(Option(fnf.getMessage).getOrElse("")) ||
          walk(fnf.getCause, depth + 1)
      case _ => false
    }
    walk(e, 0)
  }

  /** Runs `body`; on ONE transient read race (see [[transientReadRace]])
    * waits `retryDelayMs` for the overwrite to settle, runs `onRetry` (the
    * server clears its per-request pins there so the second attempt
    * resolves fresh frames), and re-runs `body` once. A second race — or
    * any other failure — propagates. */
  private[serving] def withReadRetry[T](retryDelayMs: Long = 300L,
      onRetry: () => Unit = () => (),
      dataRoots: Seq[String] = Seq.empty)(body: => T): T =
    try body
    catch {
      case e if transientReadRace(e, dataRoots) =>
        Thread.sleep(retryDelayMs)
        onRetry()
        body
    }
}
