package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *   - `GET /autocomplete?query=q`     → JSON list (F11)
  *   - `GET /stop-by-name?start=name`  → 302 to `/<dd.MM.yy HH:mm>/<name>/`
  *                                       with the X14 path escaping
  *   - `GET /<datetime>/<stop>/`       → stop page (F5/F6/W5/W6) with an
  *                                       X15 heat-strip data URL per row
  *
  * Page rendering collects only bounded page rows (same contract as the
  * reference building HTML per request); all heavy lifting stays in the
  * cached prediction DataFrame. Failures render the reference's 500 page.
  */
class MonitorServer(spark: SparkSession, schedule: GtfsSchedule,
                    predictions: DataFrame, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  // without an executor every request runs on the single dispatcher thread:
  // one stop-page render (seconds of Spark collects) would head-of-line
  // block even trivial /autocomplete calls. Spark job submission is
  // thread-safe, so a small pool serves pages concurrently.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private def handle(ex: HttpExchange): Unit =
    try route(ex)
    catch {
      case e: Exception =>
        respond(ex, 500, "text/html",
          s"<html><body><h1>500</h1><p>${escapeHtml(e.toString)}</p></body></html>")
    } finally ex.close()

  private def route(ex: HttpExchange): Unit = {
    val rawPath = ex.getRequestURI.getRawPath
    // URI path segments decode only %-escapes; URLDecoder alone would also
    // turn a literal '+' (which the X14 escaping passes through) into a space
    val parts = rawPath.split("/").filter(_.nonEmpty)
      .map(p => java.net.URLDecoder.decode(p.replace("+", "%2B"),
        StandardCharsets.UTF_8))
    val q = queryParams(ex)
    parts.toSeq match {
      case Seq() => respond(ex, 200, "text/html", searchPage)
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
      case Seq(datetime, stopName) =>
        respond(ex, 200, "text/html", stopPage(datetime, stopName))
      case _ =>
        respond(ex, 404, "text/html",
          "<html><body><h1>404</h1></body></html>")
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
