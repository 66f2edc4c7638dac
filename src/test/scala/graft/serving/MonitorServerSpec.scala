package graft.serving

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite

/** S18 end to end: the serving layer over the real fixture pipeline —
  * search page, autocomplete JSON, the stop-by-name redirect (X14-escaped
  * path), and a stop page whose rows embed decodable X15 heat-strip PNGs. */
class MonitorServerSpec extends AnyFunSuite {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("serves search, autocomplete, redirect and a stop page with PNG strips") {
    val (sched, preds) = graft.queries.GtfsPack.predictionState(spark)
    val server = new MonitorServer(spark, sched, preds)
    val port = server.start()
    try {
      val root = get(port, "/")
      assert(root.statusCode() == 200 && root.body().contains("stop-by-name"))

      val ac = get(port, "/autocomplete?query=Stop%202")
      assert(ac.statusCode() == 200 && ac.body().contains("\"Stop 2\""))

      val redir = get(port, "/stop-by-name?start=Stop%202")
      assert(redir.statusCode() == 302)
      val loc = redir.headers().firstValue("Location").orElseThrow()
      // a Location header must be a valid RFC 3986 URI: the page path keeps
      // X14 semantics but spaces travel as %20 in the header
      assert(loc.endsWith("/Stop%202/"), s"unexpected Location: $loc")
      assert(!loc.contains(" "), s"raw space in Location: $loc")
      // and the redirect target resolves: the route decoder turns it back
      val decoded = java.net.URLDecoder.decode(loc, "UTF-8")
      assert(decoded.endsWith("/Stop 2/"), s"undecodable Location: $loc")

      // the fixture predictions are for 2024-03-04
      val page = get(port, "/04.03.24%2008:00/Stop%202/")
      assert(page.statusCode() == 200)
      assert(page.body().contains("<h1>Stop 2</h1>"))
      assert(page.body().contains("T1"), "expected fixture trips on the page")
      // every row embeds a real, decodable 120x1 PNG
      val b64s = "data:image/png;base64,([A-Za-z0-9+/=]+)".r
        .findAllMatchIn(page.body()).map(_.group(1)).toSeq
      assert(b64s.nonEmpty, "no heat strips on the page")
      b64s.foreach { b64 =>
        val png = java.util.Base64.getDecoder.decode(b64)
        assert(graft.ops.MediaCodec.parsePng(png).contains((120, 1, 8)))
        assert(graft.ops.MediaCodec.pngPixels(png).exists(_.length == 120 * 4),
          "RGBA strip (color type 6, constant alpha)")
      }

      // an unparseable journey path lands in the journey handler and renders
      // the reference's 500 error page (mod.rs:188-190: any handler error →
      // INTERNAL_SERVER_ERROR page, not a 404)
      val missing = get(port, "/a/b/c/d")
      assert(missing.statusCode() == 500)

      // path segments must decode only %-escapes: a literal '+' (which the
      // X14 escaping passes through) is part of the name, NOT a space — so
      // this must look up "Stop+2" (absent) rather than resolve "Stop 2"
      val plus = get(port, "/04.03.24%2008:00/Stop+2/")
      assert(plus.statusCode() == 200)
      assert(plus.body().contains("<h1>Stop+2</h1>"), s"got: ${plus.body().take(120)}")
      assert(plus.body().contains("no departures"))
    } finally server.stop()
  }

  test("serves every reference journey route shape (trip page, walk legs, info)") {
    val (sched, preds) = graft.queries.GtfsPack.predictionState(spark)
    val server = new MonitorServer(spark, sched, preds)
    val port = server.start()
    // T1 (route R1 "10", Bus, headsign Downtown) departs Stop 2 at 08:05:30;
    // the URL descriptor carries minute granularity (journey_data.rs:355)
    val trip = "Bus%2010%20nach%20Downtown%20um%2008:05"
    val dt = "04.03.24%2008:00"
    try {
      // search page variants (mod.rs:154-156)
      assert(get(port, "/embed").statusCode() == 200)
      assert(get(port, "/noscript").statusCode() == 200)

      // trip page: boarding departure + later arrivals with [-/o/+] quantiles
      val tp = get(port, s"/$dt/Stop%202/$trip/")
      assert(tp.statusCode() == 200, tp.body().take(200))
      assert(tp.body().contains("Stop 4") && tp.body().contains("Stop 6"),
        s"later stops missing: ${tp.body().take(400)}")
      assert(tp.body().contains("<td>dep</td>") && tp.body().contains("<td>arr</td>"))

      // journey stop page: arrive at Stop 4 with T1, see departures with
      // transfer probabilities (F8 keeps rows ≥ 5%)
      val jp = get(port, s"/$dt/Stop%202/$trip/Stop%204/")
      assert(jp.statusCode() == 200, jp.body().take(200))
      assert(jp.body().contains("<h1>Stop 4</h1>"))
      assert(jp.body().contains("transfer"))
      assert("<td>\\d+%</td>".r.findFirstIn(jp.body()).isDefined,
        s"no transfer-probability rows: ${jp.body().take(400)}")

      // walk leg (Fußweg) between stops, then the stop page there
      val wp = get(port, s"/$dt/Stop%202/$trip/Stop%204/Fu%C3%9Fweg/Stop%205/")
      assert(wp.statusCode() == 200, wp.body().take(200))
      assert(wp.body().contains("<h1>Stop 5</h1>"))

      // a journey may not END with a walk (mod.rs:410 → 400)
      val bad = get(port, s"/$dt/Stop%202/Fu%C3%9Fweg/")
      assert(bad.statusCode() == 400)
      assert(bad.body().contains("may not end with a walk"))

      // info page over the composed journey (mod.rs:172-178, 1264)
      val ip = get(port, s"/info/$dt/Stop%202/$trip/Stop%204/")
      assert(ip.statusCode() == 200, ip.body().take(200))
      assert(ip.body().contains("<td>start</td>") && ip.body().contains("<td>ride</td>"))
      assert(ip.body().contains("T1"))
    } finally server.stop()
  }

  test("serves the reference's static-asset routes with traversal rejection") {
    // one round-trip per asset class of mod.rs:153 (fonts/_, favicons/_,
    // favicon.ico, impressum.html, style.css, help/.., images/..) out of a
    // doc root — the reference's web-assets/ via hyper_staticfile
    val (sched, preds) = graft.queries.GtfsPack.predictionState(spark)
    val root = java.nio.file.Files.createTempDirectory("webassets")
    def put(rel: String, bytes: Array[Byte]): Unit = {
      val p = root.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, bytes)
    }
    val pngBytes = graft.gtfs.HeatStrip.png(
      Array(graft.curves.CPoint(0f, 0f), graft.curves.CPoint(10f, 1f)),
      0.0, 0.0, 10.0, 16, graft.gtfs.Codes.EventDeparture)
    put("style.css", "body { color: #222; }".getBytes("UTF-8"))
    put("impressum.html", "<html><body>Impressum</body></html>".getBytes("UTF-8"))
    put("favicon.ico", Array[Byte](0, 0, 1, 0))
    put("fonts/mono.woff2", Array[Byte](0x77, 0x4f, 0x46, 0x32))
    put("favicons/icon-32.png", pngBytes)
    put("help/index.html", "<html><body>Hilfe</body></html>".getBytes("UTF-8"))
    put("images/logo.svg", "<svg xmlns='http://www.w3.org/2000/svg'/>".getBytes("UTF-8"))
    // a file OUTSIDE the root that traversal must never reach
    java.nio.file.Files.write(root.getParent.resolve("secret_outside.txt"),
      "secret".getBytes("UTF-8"))

    val server = new MonitorServer(spark, () => Some(sched), () => preds,
      docRoot = Some(root.toString))
    val port = server.start()
    try {
      def mime(r: java.net.http.HttpResponse[_]): String =
        r.headers().firstValue("Content-Type").orElse("")
      val css = get(port, "/style.css")
      assert(css.statusCode() == 200 && css.body().contains("#222"))
      assert(mime(css) == "text/css")
      val imp = get(port, "/impressum.html")
      assert(imp.statusCode() == 200 && imp.body().contains("Impressum"))
      assert(mime(imp) == "text/html")
      val hlp = get(port, "/help/index.html")
      assert(hlp.statusCode() == 200 && hlp.body().contains("Hilfe"))
      val svg = get(port, "/images/logo.svg")
      assert(svg.statusCode() == 200 && mime(svg) == "image/svg+xml")
      val woff = get(port, "/fonts/mono.woff2")
      assert(woff.statusCode() == 200 && mime(woff) == "font/woff2")
      val ico = get(port, "/favicon.ico")
      assert(ico.statusCode() == 200 && mime(ico) == "image/x-icon")
      // binary fidelity: the PNG survives byte-for-byte
      val fav = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/favicons/icon-32.png"))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      assert(fav.statusCode() == 200 && mime(fav) == "image/png")
      assert(fav.body().toSeq == pngBytes.toSeq, "asset bytes must round-trip")

      // missing file under a static prefix → 404 (not the dynamic 500 page)
      assert(get(port, "/images/absent.png").statusCode() == 404)
      // deeper nesting under the single-level prefixes is NOT a static
      // route (mod.rs:153 matches exactly ["fonts", _]) — falls through to
      // the journey handler like any other path
      assert(get(port, "/fonts/a/b.woff").statusCode() != 200)

      // path traversal: %2e%2e decodes to ".." AFTER the prefix match, so
      // only the canonical containment check stands between the request
      // and the filesystem — both spellings must 404
      assert(get(port, "/help/../secret_outside.txt").statusCode() == 404)
      assert(get(port, "/help/%2e%2e/secret_outside.txt").statusCode() == 404)
      assert(get(port, "/images/%2e%2e/%2e%2e/secret_outside.txt").statusCode() == 404)
    } finally server.stop()

    // without a doc root every static route 404s (nothing to serve)
    val bare = new MonitorServer(spark, sched, preds)
    val p2 = bare.start()
    try assert(get(p2, "/style.css").statusCode() == 404)
    finally bare.stop()
  }

  test("a page read racing a partition overwrite retries once; real errors surface at once") {
    // transient race (the automatic mode's dynamic overwrite deletes listed
    // files between plan and scan): ONE retry, then success
    var n = 0
    val r = MonitorServer.withReadRetry(1L) {
      n += 1
      if (n == 1) throw new org.apache.spark.SparkException(
        "[FAILED_READ_FILE.FILE_NOT_EXIST] Encountered error while reading file")
      42
    }
    assert(r == 42 && n == 2, s"one retry then success: n=$n r=$r")
    // the retry is BOUNDED: a second consecutive race propagates
    var m = 0
    intercept[org.apache.spark.SparkException] {
      MonitorServer.withReadRetry(1L) {
        m += 1
        throw new org.apache.spark.SparkException("[FAILED_READ_FILE] again")
      }
    }
    assert(m == 2, s"exactly two attempts: $m")
    // nested cause form (SparkException wrapping FileNotFoundException)
    var k = 0
    assert(MonitorServer.withReadRetry(1L) {
      k += 1
      if (k == 1) throw new org.apache.spark.SparkException("task failed",
        new java.io.FileNotFoundException("part-00000 deleted"))
      7
    } == 7)
    // anything else never retries
    var j = 0
    intercept[IllegalStateException] {
      MonitorServer.withReadRetry(1L) { j += 1; throw new IllegalStateException("boom") }
    }
    assert(j == 1, s"non-transient errors surface on the first attempt: $j")
  }

  test("the CLI monitor subcommand serves a prepared tree and picks up the live table") {
    val (_, preds) = graft.queries.GtfsPack.predictionState(spark)
    val base = java.nio.file.Files.createTempDirectory("climon")
    val v1 = java.nio.file.Files.createDirectories(
      base.resolve("schedule").resolve("2024-01-01"))
    graft.gtfs.FixtureGen.writeSchedule(v1)
    val server = graft.ImportCli.runMonitor(spark, base.toString, port = 0)
    val port = server.start()
    try {
      // schedule-backed routes serve immediately (hot-reloading cache)
      assert(get(port, "/autocomplete?query=Stop%202").body().contains("Stop 2"))
      // prediction pages render the 500 page until EITHER table has data
      assert(get(port, "/04.03.24%2008:00/Stop%202/").statusCode() == 500)
      // the batch pass writes its dump -> the SAME server picks it up on
      // the next request (per-request fresh read, no restart)
      preds.write.mode("overwrite").parquet(s"$base/predictions")
      val pg = get(port, "/04.03.24%2008:00/Stop%202/")
      assert(pg.statusCode() == 200 && pg.body().contains("<h1>Stop 2</h1>"),
        s"batch table served: ${pg.statusCode()} ${pg.body().take(600)}")
      // the automatic mode's stream table appears WITH data -> preferred.
      // Written through the real upsert: the stream table's contract is the
      // LWW layout (delta tree + refresh_seq), not a raw dump
      graft.streaming.StreamingImport.upsertTable(
        preds.withColumn("refresh_seq", org.apache.spark.sql.functions.lit(0L)),
        s"$base/stream/predictions",
        graft.gtfs.PredictionsTable.KeyCols,
        org.apache.spark.sql.functions.col("refresh_seq"))
      assert(get(port, "/04.03.24%2008:00/Stop%202/").statusCode() == 200)
    } finally server.stop()
  }

  test("the schedule hot-reloads: a version dropped mid-run reaches the pages without restart") {
    val (_, preds) = graft.queries.GtfsPack.predictionState(spark)
    val base = java.nio.file.Files.createTempDirectory("monhot")
    val parent = base.resolve("schedule")
    java.nio.file.Files.createDirectories(parent)
    val v1 = java.nio.file.Files.createDirectories(parent.resolve("2024-01-01"))
    graft.gtfs.FixtureGen.writeSchedule(v1)
    val cache = new graft.gtfs.ScheduleCache(spark, parent.toString)
    // ttl 0 = resolve per request (the production default is the 5 s scan
    // cadence; the test wants the very next request to see the drop)
    val server = new MonitorServer(spark, () => cache.newest().map(_._2),
      () => preds, scheduleTtlMs = 0L)
    val port = server.start()
    // v2 shifts T1's stop-1 departure from 08:00:30 to 08:01:30, so the
    // J8 minute-granular descriptor resolves "um 08:00" only under v1 and
    // "um 08:01" only under v2
    val tripV1 = "/04.03.24%2008:00/Stop%201/Bus%2010%20nach%20Downtown%20um%2008:00/"
    val tripV2 = "/04.03.24%2008:00/Stop%201/Bus%2010%20nach%20Downtown%20um%2008:01/"
    try {
      // ---- under v1 ----
      assert(!get(port, "/autocomplete?query=Stop%2021").body().contains("Stop 21"),
        "v2-only stop must not autocomplete under v1")
      assert(get(port, tripV1).statusCode() == 200, "v1 descriptor resolves")
      assert(get(port, tripV2).statusCode() == 500,
        "v2 descriptor must not resolve under v1")

      // ---- drop v2 ATOMICALLY while the server runs ----
      val tmp = java.nio.file.Files.createDirectories(base.resolve("incoming"))
      graft.gtfs.FixtureGen.writeSchedule(tmp, version = 2)
      java.nio.file.Files.write(tmp.resolve("stops.txt"),
        "\nS21,Stop 21,50.0500,8.0700".getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.APPEND)
      java.nio.file.Files.move(tmp, parent.resolve("2024-02-15"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)

      // ---- the NEXT requests serve v2: no restart, no new server ----
      assert(get(port, "/autocomplete?query=Stop%2021").body().contains("Stop 21"),
        "autocomplete picks up the new version's stop")
      assert(get(port, tripV2).statusCode() == 200,
        "trip resolution picks up the new version's shifted departure")
      assert(get(port, tripV1).statusCode() == 500,
        "the superseded version no longer resolves")

      // ---- tree momentarily empty: the server survives on the LAST KNOWN
      // schedule object (persisted derivations keep serving; a request that
      // must re-scan a now-absent CSV renders the per-request 500 page) and
      // recovers the instant the tree returns — never a dead server or a
      // thrown-out provider
      val away = base.resolve("away")
      java.nio.file.Files.move(parent, away,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      val during = get(port, "/autocomplete?query=Stop%2021")
      assert(during.statusCode() == 200 || during.statusCode() == 500,
        s"an outage request still gets an HTTP answer: ${during.statusCode()}")
      java.nio.file.Files.move(away, parent,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      assert(get(port, tripV2).statusCode() == 200, "recovery is seamless")
      assert(get(port, "/autocomplete?query=Stop%2021").body().contains("Stop 21"),
        "autocomplete recovered with the tree")
    } finally { server.stop(); cache.close() }
  }

  test("started before the first schedule version: statics serve, dynamics 500, first drop flips to 200") {
    // VERDICT r10 #4 — boot-order vs fault must be tellable apart: the
    // server STARTS over an empty schedule tree (one logged notice), the
    // search page serves, dynamic routes render the 500 page per request,
    // and the FIRST dropped version flips them to 200 with no restart
    val base = java.nio.file.Files.createTempDirectory("monempty")
    val parent = base.resolve("schedule")
    java.nio.file.Files.createDirectories(parent)
    val cache = new graft.gtfs.ScheduleCache(spark, parent.toString)
    val server = new MonitorServer(spark, () => cache.newest().map(_._2),
      () => null, scheduleTtlMs = 0L)
    val port = server.start() // must not throw on the empty tree
    try {
      assert(get(port, "/").statusCode() == 200, "search page serves")
      assert(get(port, "/style.css").statusCode() == 404,
        "static routes answer (no doc root -> 404, not a schedule error)")
      assert(get(port, "/autocomplete?query=Stop").statusCode() == 500,
        "dynamic routes 500 while no version exists")
      // the first version lands -> the very next request serves it
      val v1 = java.nio.file.Files.createDirectories(base.resolve("incoming"))
      graft.gtfs.FixtureGen.writeSchedule(v1)
      java.nio.file.Files.move(v1, parent.resolve("2024-01-01"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      val ac = get(port, "/autocomplete?query=Stop%202")
      assert(ac.statusCode() == 200 && ac.body().contains("Stop 2"),
        "first dropped version flips dynamic pages to 200")
    } finally { server.stop(); cache.close() }
  }

  test("the read-race retry is scoped to the declared data roots (ADVICE r10)") {
    // under a root: retried once
    var n = 0
    assert(MonitorServer.withReadRetry(1L,
      dataRoots = Seq("/data/stream/predictions", "/data/schedule")) {
      n += 1
      if (n == 1) throw new java.io.FileNotFoundException(
        "File file:/data/stream/predictions/source=x/part-0.parquet does not exist")
      9
    } == 9 && n == 2)
    // a permanently missing file OUTSIDE every root pays no retry sleep:
    // it surfaces on the first attempt
    var m = 0
    intercept[java.io.FileNotFoundException] {
      MonitorServer.withReadRetry(1L,
        dataRoots = Seq("/data/stream/predictions")) {
        m += 1
        throw new java.io.FileNotFoundException("/etc/unrelated.conf missing")
      }
    }
    assert(m == 1, s"out-of-root FNF never retries: $m")
    // same scoping for the FAILED_READ_FILE form
    intercept[org.apache.spark.SparkException] {
      MonitorServer.withReadRetry(1L, dataRoots = Seq("/data/schedule")) {
        throw new org.apache.spark.SparkException(
          "[FAILED_READ_FILE] file:///somewhere/else/part-0.parquet")
      }
    }
    assert(MonitorServer.transientReadRace(
      new org.apache.spark.SparkException(
        "[FAILED_READ_FILE] file:///data/schedule/2024-01-01/trips.txt"),
      Seq("file:/data/schedule")),
      "scheme-qualified roots normalize like scheduleReadRace")
  }
}
