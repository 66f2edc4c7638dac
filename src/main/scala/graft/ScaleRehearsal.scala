package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Scale rehearsal for the curve path (dev tool, not part of the driver
  * contract): generates a records table several orders of magnitude larger
  * than the test fixture (same shape the importer produces), runs the
  * specific + default curve builds on it, and prints wall time, row counts
  * and shuffle bytes. Results are recorded in SCALE.md.
  *
  * Knobs via env: SPARK_GRAFT_SR_ROUTES (default 500), _TRIPS (trips per
  * variant per day, default 10), _STOPS (default 20), _DAYS (default 60).
  * Defaults yield ~12M observation rows → ~230M quantized delay pairs
  * through the A6 aggregator (~50,000× the unit fixture).
  */
object ScaleRehearsal {

  private final class ShuffleMeter extends SparkListener {
    val writeBytes = new AtomicLong
    val readBytes = new AtomicLong
    val spillBytes = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        readBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spillBytes.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  private def fmtHms(secs: Int): String =
    f"${secs / 3600}%02d:${(secs % 3600) / 60}%02d:${secs % 60}%02d"

  /** Synthetic GTFS CSV schedule: `routes` routes × 2 variants (full +
    * prefix) × `tripsPerVariant` trips, `stops` stops each. `version` ≥ 2
    * models a GTFS re-publication for the soak rehearsal: all times shift
    * +60 s per version step and the variant-1 trips are RENAMED (the
    * changed-trip_id case the stale-schedule delete exists for); variant-0
    * names stay stable so rt feeds join every version. */
  private def writeSchedule(dir: java.nio.file.Path, routes: Int,
                            tripsPerVariant: Int, stops: Int,
                            version: Int = 1): Unit = {
    def w(name: String, lines: Iterator[String]): Unit = {
      val bw = java.nio.file.Files.newBufferedWriter(dir.resolve(name))
      try lines.foreach { l => bw.write(l); bw.write("\n") } finally bw.close()
    }
    val shift = 60 * (version - 1)
    def tripId(r: Int, v: Int, t: Int): String =
      if (v == 1 && version >= 2) s"T${r}_${v}v${version}_$t" else s"T${r}_${v}_$t"
    w("agency.txt", Iterator("agency_id,agency_name", "AG,ScaleTest"))
    w("stops.txt", Iterator("stop_id,stop_name,stop_lat,stop_lon") ++
      (1 to stops).iterator.map(i => f"S$i,Stop $i,${50.0 + i * 0.002}%.4f,${8.0 + i * 0.003}%.4f"))
    w("routes.txt", Iterator("route_id,agency_id,route_short_name,route_type") ++
      (0 until routes).iterator.map(r => s"R$r,AG,${r % 900},${Seq(0, 1, 2, 3)(r % 4)}"))
    w("trips.txt", Iterator("trip_id,route_id,service_id,trip_headsign") ++
      (for {
        r <- (0 until routes).iterator; v <- Iterator(0, 1); t <- (0 until tripsPerVariant).iterator
      } yield s"${tripId(r, v, t)},R$r,WD,H$r"))
    // variant 0 = all stops; variant 1 = first stops/2 stops (a sub-variant)
    w("stop_times.txt", Iterator("trip_id,stop_sequence,stop_id,arrival_time,departure_time") ++
      (for {
        r <- (0 until routes).iterator; v <- Iterator(0, 1); t <- (0 until tripsPerVariant).iterator
        n = if (v == 0) stops else stops / 2
        i <- (1 to n).iterator
        arr = 5 * 3600 + t * 1200 + (i - 1) * 180 + shift
      } yield s"${tripId(r, v, t)},$i,S$i,${fmtHms(arr)},${fmtHms(arr + 30)}"))
    w("calendar.txt", Iterator(
      "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date",
      "WD,1,1,1,1,1,1,1,20240101,20261231"))
  }

  /** Importer-shaped records table: days × stop_times with deterministic
    * pseudo-delays (pure Column arithmetic — generated distributed). */
  private def syntheticRecords(schedule: graft.gtfs.GtfsSchedule, days: Int): DataFrame = {
    val spark = schedule.trips.sparkSession
    val dayDf = spark.range(days).select(
      date_add(to_date(lit("2024-01-01")), col("id").cast("int")).as("trip_start_date"))
    val base = schedule.stopTimes
      .join(schedule.trips.select("trip_id", "route_id", "route_variant",
        "route_type", "trip_start_time"), "trip_id")
      .crossJoin(dayDf)
    val h = pmod(xxhash64(col("trip_id"), col("trip_start_date"), col("stop_sequence")), lit(100000))
    base.select(
      lit("scale").as("source"), col("route_id"), col("route_variant"),
      col("trip_id"), col("trip_start_date"), col("trip_start_time"),
      col("stop_sequence"), col("stop_id"), col("stop_index"), col("stop_count"),
      col("arrival_secs"), col("departure_secs"),
      (pmod(h, lit(500)) - 100).cast("int").as("delay_arrival"),
      (pmod(h + 37, lit(500)) - 88).cast("int").as("delay_departure"),
      to_timestamp(col("trip_start_date")).as("time_of_recording"),
      lit("scale_sched").as("schedule_file_name"))
  }

  /** Deterministic synthetic corpus with planted near-duplicates: ~55-word
    * docs from a 4096-word vocabulary; every 50th doc is a light edit of
    * the nearest BASE doc before it (near-dup), every 97th an exact copy
    * of one. Copying from a base doc (not blindly from id−1) matters:
    * id−1 may itself be a planted special whose REAL text differs from the
    * base formula, and rebuilding it from the formula would plant a
    * "duplicate" of a document that doesn't exist — skewing the ground
    * truth the dedup rehearsal numbers are judged against. Any 3
    * consecutive ids contain at most one multiple of 50 and one of 97, so
    * stepping back ≤3 always reaches a base doc. Pure Column ops —
    * generated distributed, no driver loop. */
  private def syntheticDocs(spark: SparkSession, n: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def isSpecial(c: org.apache.spark.sql.Column) =
      c > 0 && (pmod(c, lit(50)) === 0 || pmod(c, lit(97)) === 0)
    def baseWords(idc: org.apache.spark.sql.Column, upTo: Int) =
      transform(sequence(lit(0), lit(upTo)), i =>
        concat(lit("w"), pmod(xxhash64(idc, i), lit(4096))))
    val prevBase =
      when(!isSpecial(col("id") - 1), col("id") - 1)
        .when(!isSpecial(col("id") - 2), col("id") - 2)
        .otherwise(col("id") - 3)
    spark.range(n).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(97)) === 0 && col("id") > 0,
        // exact copy of the nearest base doc's text
        concat_ws(" ", baseWords(prevBase, 54)))
      .when(pmod(col("id"), lit(50)) === 0 && col("id") > 0,
        // near-dup: nearest base doc's words with the last 5 replaced
        concat_ws(" ", concat(
          baseWords(prevBase, 49),
          transform(sequence(lit(50), lit(54)), i =>
            concat(lit("x"), pmod(xxhash64(col("id"), i), lit(4096)))))))
      .otherwise(concat_ws(" ", baseWords(col("id"), 54))).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val routes = sys.env.getOrElse("SPARK_GRAFT_SR_ROUTES", "500").toInt
    val tripsPerVariant = sys.env.getOrElse("SPARK_GRAFT_SR_TRIPS", "10").toInt
    val stops = sys.env.getOrElse("SPARK_GRAFT_SR_STOPS", "20").toInt
    val days = sys.env.getOrElse("SPARK_GRAFT_SR_DAYS", "60").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mode = sys.env.getOrElse("SPARK_GRAFT_SR_MODE", "curves")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SR_DOCS", "1000000").toLong
    // partition-count knob for the biggest configs: at 100M records the
    // default cpus-partitions put ~3M rows of aggregation state in each
    // task, and the resulting sorter spill (on top of the shuffle files)
    // can exceed local disk — more partitions = same shuffle bytes, far
    // less spill, exactly the cluster-side sizing rule from the brief
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SR_SHUFFLE", cpus)
    // SPARK_GRAFT_SR_OPS: comma-separated subset of ops to run (default
    // all) — one parse shared by every mode, so the subset syntax can't
    // drift between them. Lets a 10M-doc run exercise just
    // clusters/packing, or a 100M-record run put each disk-heavy curve op
    // in its own process with a fresh local disk.
    val srOps = sys.env.get("SPARK_GRAFT_SR_OPS")
      .map(_.split(",").map(_.trim).toSet)
    def opWanted(name: String): Boolean = srOps.forall(_.contains(name))

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    // listener events are delivered ASYNCHRONOUSLY: without draining the
    // bus, the last stage's task-end bytes land in the NEXT op's delta.
    // LiveListenerBus.waitUntilEmpty is package-private → reflection (it's
    // public at the bytecode level); a short sleep is the fallback.
    def drainListeners(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        val m = bus.getClass.getMethods
          .filter(_.getName == "waitUntilEmpty").minBy(_.getParameterCount)
        if (m.getParameterCount == 0) m.invoke(bus)
        else m.invoke(bus, java.lang.Long.valueOf(10000L))
      } catch { case _: Throwable => Thread.sleep(500) }

    def runTimed(name: String)(f: => Long): Unit = {
      drainListeners()
      val w0 = meter.writeBytes.get; val r0 = meter.readBytes.get
      val s0 = meter.spillBytes.get; val c0 = System.nanoTime()
      val rows = f
      val wall = (System.nanoTime() - c0) / 1e9
      drainListeners() // attribute this op's bytes to this op
      println(f"[scale] $name: rows=$rows wall=$wall%.1fs " +
        f"shuffleWrite=${(meter.writeBytes.get - w0) / 1e6}%.0fMB " +
        f"shuffleRead=${(meter.readBytes.get - r0) / 1e6}%.0fMB " +
        f"spill=${(meter.spillBytes.get - s0) / 1e6}%.0fMB")
    }

    if (mode == "ann") {
      // ---- similarity search at corpus scale: 1M × 64-dim vectors ----
      val n = sys.env.getOrElse("SPARK_GRAFT_SR_VECS", "1000000").toLong
      val embDir = java.nio.file.Files.createTempDirectory("sr_emb").toString + "/embeddings"
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => (pmod(xxhash64(col("id"), i), lit(2000)).cast("float") - 1000f) / 1000f)
          .cast("array<float>") // the arithmetic promotes to double
          .as("embedding"))
        .write.mode("overwrite").parquet(embDir)
      val emb = spark.read.parquet(embDir)
      println(f"[scale] embeddings: rows=${emb.count()} parquet=${
        new java.io.File(embDir).listFiles().map(_.length).sum / 1e6}%.0fMB")
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      if (opWanted("ann_brute")) runTimed("ann_brute")(
        graft.ops.Similarity.bruteForceTopK(emb, qids, 10).count())
      if (opWanted("ann_lsh")) runTimed("ann_lsh")(
        graft.ops.Similarity.lshTopK(emb, qids, 10, numTables = 12,
          planesPerTable = 8).count())
      // default fitSampleMod=0 → auto-sized Lloyd fit (~100k vectors
      // regardless of n) — the knob the 10M run was previously fit-dominated
      // without
      if (opWanted("ann_ivf")) runTimed("ann_ivf_fit+query")(
        graft.ops.Similarity.ivfTopK(emb, qids, 10, nCells = 64,
          nProbe = 8).count())
      // near-dup PAIRS with the auto-sized plane count (16 at n=1M): the
      // candidate set must stay ~numTables*n*targetBucket/2, never the
      // all-pairs blowup a fixed plane count degrades to
      if (opWanted("near_dup_pairs")) runTimed("near_dup_pairs")(
        graft.ops.Similarity.cosineNearDupPairs(emb, threshold = 0.9).count())
      spark.stop()
      return
    }

    if (mode == "stream") {
      // ---- streaming ingest at scale (ST1/ST5/W2, SCALE.md "Streaming
      // ingest" row): many .pb micro-batch files through the full
      // decode → broadcast-schedule-join → partition-scoped LWW upsert
      // loop, plus the ST2 stateful request dedup over the same stream.
      // The claim under test: per-micro-batch cost is O(batch ∪ touched
      // partitions) — FLAT as cumulative ingested rows grow — and ST2
      // state stays bounded by the live vehicle count.
      import graft.gtfs.GtfsRtCodec
      import GtfsRtCodec.{FeedMessage, StopTimeEvent, StopTimeUpdate, TripDescriptor, TripUpdate}
      // the ONE synthetic records-row builder the LSM rehearsal ops share
      // (backstop_bound, trivial_fold): a schema tweak must land once
      def recordsRows(date: String, n: Long, offset: Long) = {
        import org.apache.spark.sql.functions._
        spark.range(n)
          .select(lit("scale").as("source"),
            concat(lit("R"), ((col("id") + offset) % 50).cast("string")).as("route_id"),
            ((col("id") + offset) % 7).as("route_variant"),
            concat(lit("T"), lit(offset), lit("_"), col("id")).as("trip_id"),
            lit(java.sql.Date.valueOf(date)).as("trip_start_date"),
            lit(28800).as("trip_start_time"),
            ((col("id") + offset) % 40).cast("int").as("stop_sequence"),
            timestamp_seconds(lit(1705300000L) + (col("id") + offset) / 1000L)
              .as("time_of_recording"),
            ((col("id") + offset) % 600).cast("int").as("delay_arrival"))
      }
      val files = sys.env.getOrElse("SPARK_GRAFT_SR_FILES", "240").toInt
      val tripsPerFile = sys.env.getOrElse("SPARK_GRAFT_SR_TRIPS_PER_FILE", "500").toInt
      val filesPerTrigger = sys.env.getOrElse("SPARK_GRAFT_SR_FPT", "16").toInt

      val schedDir = java.nio.file.Files.createTempDirectory("sr_sched")
      writeSchedule(schedDir, routes, tripsPerVariant, stops)
      val schedule = graft.gtfs.GtfsSchedule.load(spark, schedDir.toString)
      schedule.trips.count(); schedule.stopTimes.count()

      // feed files rotate through the variant-0 trips with an advancing
      // recording clock: after one full rotation every later file RE-updates
      // keys already stored with newer timestamps — the upsert does real
      // last-writer-wins merge work, not append-only inserts
      val nTrips = routes * tripsPerVariant
      // feedStops < stops puts the W3 basis mid-trip, leaving the later
      // stops as realtime prediction targets (the refresh op needs them;
      // with every stop delayed there would be nothing left to predict)
      def genFeed(label: String, feedStops: Int,
                  dateFor: Int => String = _ => "20240115"): java.nio.file.Path = {
        val dir = java.nio.file.Files.createTempDirectory(s"sr_rt_$label")
        val tGen = System.nanoTime()
        for (f <- 0 until files) {
          val rec = 1705276800L + f * 30L
          val updates = (0 until tripsPerFile).map { k =>
            val g = (f.toLong * tripsPerFile + k) % nTrips
            val r = (g / tripsPerVariant).toInt
            val t = (g % tripsPerVariant).toInt
            TripUpdate(
              TripDescriptor(Some(s"T${r}_0_$t"), Some(s"R$r"),
                Some(fmtHms(5 * 3600 + t * 1200)), Some(dateFor(f))),
              (1 to feedStops).map { i =>
                val d = (((g * 31 + i * 13 + f) % 500) - 100).toInt
                StopTimeUpdate(Some(i), Some(s"S$i"),
                  Some(StopTimeEvent(Some(d), None)),
                  Some(StopTimeEvent(Some(d + 12), None)))
              })
          }
          java.nio.file.Files.write(dir.resolve(f"feed_$f%05d.pb"),
            GtfsRtCodec.encode(FeedMessage(Some(rec), updates)))
        }
        val pbBytes = dir.toFile.listFiles().map(_.length).sum
        println(f"[scale] rt files[$label]: n=$files pb=${pbBytes / 1e6}%.0fMB " +
          f"updates=${files.toLong * tripsPerFile * feedStops} gen=${(System.nanoTime() - tGen) / 1e9}%.1fs " +
          s"(trips=$nTrips rotation=${nTrips / tripsPerFile} files)")
        dir
      }
      lazy val rtDir = genFeed("full", stops)

      // per-micro-batch walls read SYNCHRONOUSLY from the query object's
      // recentProgress after awaitTermination — the StreamingQueryListener
      // bus is asynchronous and trailing events may not have been delivered
      // yet when the report prints, undercounting batches/walls
      def batchReport(name: String, query: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
        val bs = query.recentProgress.toSeq
          .map(p => (p.id, p.batchId,
            Option(p.durationMs.get("triggerExecution"))
              .map(_.toDouble / 1000.0).getOrElse(0.0), p.numInputRows))
          .sortBy(_._2)
          .filter(_._4 > 0) // AvailableNow ends with an empty finalizing batch
        if (bs.nonEmpty) {
          val walls = bs.map(_._3)
          // numInputRows counts binaryFile SOURCE rows = .pb FILES per trigger
          println(f"[scale] $name batches=${bs.size} files/batch=${bs.map(_._4).sum / bs.size} " +
            f"wall first=${walls.head}%.1fs median=${walls.sorted.apply(walls.size / 2)}%.1fs " +
            f"last=${walls.last}%.1fs max=${walls.max}%.1fs")
        }
      }

      if (opWanted("ingest")) {
        val recordsDir = java.nio.file.Files.createTempDirectory("sr_srec").toString + "/records"
        val ckpt = java.nio.file.Files.createTempDirectory("sr_ckpt").toString
        var qh: org.apache.spark.sql.streaming.StreamingQuery = null
        runTimed("stream_ingest") {
          val q = graft.streaming.StreamingImport.start(spark, rtDir.toString,
            schedule, "scale", recordsDir, ckpt,
            automatic = false, maxFilesPerTrigger = filesPerTrigger)
          qh = q
          q.awaitTermination()
          // resolved LWW view: the AvailableNow run leaves its batches in
          // the delta tree (a plain base read would see nothing)
          graft.gtfs.RecordsTable.read(spark, recordsDir).count()
        }
        batchReport("stream_ingest", qh)
      }

      if (opWanted("upsert_growth")) {
        // ---- VERDICT r10 #1's done criterion, measured: per-trigger
        // upsert wall must stay FLAT while the day partition grows 10×+.
        // Each loop turn appends one fixed-size batch of NEW keys to ONE
        // (source, date) partition through the production upsert path
        // (delta append, no compaction — the backstop bound is not reached
        // at one file per append). For contrast, the OLD per-trigger cost —
        // a read-merge-overwrite of the whole accumulated partition, which
        // is exactly what compact() does — is timed at 10×, 50× and 100×
        // the batch size: flat appends vs visibly growing merges.
        import org.apache.spark.sql.functions._
        val rows = sys.env.getOrElse("SPARK_GRAFT_SR_UPSERT_ROWS", "20000").toInt
        val batches = sys.env.getOrElse("SPARK_GRAFT_SR_UPSERT_BATCHES", "100").toInt
        // the longest run between explicit merge checkpoints is
        // (batches/2, batches]; one delta file lands per append, so the
        // 64-file backstop stays silent only while batches/2 + 64 > batches,
        // i.e. batches <= 126 — past that a timed append would include the
        // backstop's O(delta) merge and skew the last decade (the
        // backstop_bound op below measures that merge deliberately).
        // Cap rather than skew.
        require(batches >= 10 && batches <= 126,
          s"SPARK_GRAFT_SR_UPSERT_BATCHES must be in [10, 126], got $batches")
        val dir = java.nio.file.Files.createTempDirectory("sr_upsert").toString + "/records"
        def batchDf(i: Int) = spark.range(rows.toLong)
          .select(lit("scale").as("source"),
            concat(lit("R"), (col("id") % 50).cast("string")).as("route_id"),
            (col("id") % 7).as("route_variant"),
            concat(lit("T"), lit(i.toLong * rows), lit("_"), col("id")).as("trip_id"),
            lit(java.sql.Date.valueOf("2024-01-15")).as("trip_start_date"),
            lit(28800).as("trip_start_time"),
            (col("id") % 40).cast("int").as("stop_sequence"),
            timestamp_seconds(lit(1705300000L) + lit(i * 60L)).as("time_of_recording"),
            (col("id") % 600).cast("int").as("delay_arrival"))
        runTimed("upsert_growth") {
          val appendWalls = (1 to batches).map { i =>
            val t0 = System.nanoTime()
            graft.streaming.StreamingImport.upsertBatch(batchDf(i), dir)
            val w = (System.nanoTime() - t0) / 1e9
            if (i == batches / 10 || i == batches / 2 || i == batches) {
              val tc = System.nanoTime()
              val files = graft.gtfs.LwwTable.compact(spark, dir,
                graft.gtfs.RecordsTable.KeyCols, graft.gtfs.RecordsTable.ordering)
              println(f"[scale] upsert_growth OLD-shape merge at ${i}x batch " +
                f"(${i.toLong * rows} rows): wall=${(System.nanoTime() - tc) / 1e9}%.2fs " +
                f"($files delta files folded)")
            }
            w
          }
          def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
          val decade = math.max(1, batches / 10)
          val firstDecade = appendWalls.take(decade)
          val lastDecade = appendWalls.takeRight(decade)
          println(f"[scale] upsert_growth NEW-shape appends: batches=$batches " +
            f"rows/batch=$rows partition 1x->${batches}x; " +
            f"wall first-decade median=${med(firstDecade)}%.2fs " +
            f"last-decade median=${med(lastDecade)}%.2fs " +
            f"overall median=${med(appendWalls)}%.2fs max=${appendWalls.max}%.2fs")
          graft.gtfs.RecordsTable.read(spark, dir).count()
        }
      }

      if (opWanted("resolve_exchanges")) {
        // ---- VERDICT r16 stretch #9, measured: the single-exchange append
        // (partitionedResolve — the LWW resolution window runs ON the write
        // partitioning, since PartCols ⊂ keyCols) vs the two-exchange form
        // (resolve exchanged on the full key, then a second repartition to
        // the one-file-per-partition layout) at a production-like trigger
        // cadence. The exchange counts themselves are pinned by
        // LwwTableSpec's plan assertion; this measures the per-trigger wall
        // delta the saved exchange buys.
        import org.apache.spark.sql.functions._
        val rows = sys.env.getOrElse("SPARK_GRAFT_SR_RX_ROWS", "200000").toInt
        val trigs = sys.env.getOrElse("SPARK_GRAFT_SR_RX_TRIGS", "20").toInt
        val base = java.nio.file.Files.createTempDirectory("sr_rx").toString
        val keys = graft.gtfs.RecordsTable.KeyCols
        def ord = graft.gtfs.RecordsTable.ordering
        // four (source, date) partitions per batch so the layout exchange
        // has real routing work, duplicate keys within the batch so the
        // resolution window has real collapsing work
        def batchDf(i: Int) = spark.range(rows.toLong)
          .select(lit("scale").as("source"),
            concat(lit("R"), (col("id") % 50).cast("string")).as("route_id"),
            (col("id") % 7).as("route_variant"),
            concat(lit("T"), (col("id") % (rows / 4)).cast("string")).as("trip_id"),
            date_add(lit(java.sql.Date.valueOf("2024-01-15")),
              (col("id") % 4).cast("int")).as("trip_start_date"),
            lit(28800).as("trip_start_time"),
            (col("id") % 40).cast("int").as("stop_sequence"),
            timestamp_seconds(lit(1705300000L) + lit(i * 60L) + col("id") % 120)
              .as("time_of_recording"),
            (col("id") % 600).cast("int").as("delay_arrival"))
        def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
        runTimed("resolve_exchanges") {
          val twoExchange = (1 to trigs).map { i =>
            val t0 = System.nanoTime()
            graft.gtfs.LwwTable.resolve(batchDf(i), keys, ord)
              .repartition(graft.gtfs.LwwTable.PartCols.map(col): _*)
              .write.mode("append")
              .partitionBy(graft.gtfs.LwwTable.PartCols: _*)
              .parquet(s"$base/two/_delta")
            (System.nanoTime() - t0) / 1e9
          }
          val oneExchange = (1 to trigs).map { i =>
            val t0 = System.nanoTime()
            graft.gtfs.LwwTable.append(batchDf(i), s"$base/one", keys, ord)
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[scale] resolve_exchanges rows/trigger=$rows trigs=$trigs: " +
            f"two-exchange median=${med(twoExchange)}%.2fs " +
            f"one-exchange median=${med(oneExchange)}%.2fs " +
            f"(speedup ${med(twoExchange) / med(oneExchange)}%.2fx)")
          graft.gtfs.LwwTable.readRaw(spark, s"$base/one").count()
        }
      }

      if (opWanted("backstop_bound")) {
        // ---- VERDICT r11 #1's done criterion, measured: with the idle
        // branch DISABLED (nothing here folds to base except the explicit
        // per-stage contrast point), per-trigger wall — INCLUDING the
        // ~64th triggers where the size backstop fires — must stay bounded
        // by the DELTA working set while the base partition grows to 100M
        // rows. The backstop is a delta→delta merge (LwwTable.mergeDelta):
        // no base read, so base size must never appear in a trigger's
        // wall. For contrast the OLD backstop shape — the full base fold —
        // is timed ONCE per stage (off-path; production runs it from the
        // idle branch), and its wall is exactly the stall that no longer
        // lands on a trigger.
        import org.apache.spark.sql.functions._
        val rows = sys.env.getOrElse("SPARK_GRAFT_SR_BS_ROWS", "20000").toInt
        val trigs = sys.env.getOrElse("SPARK_GRAFT_SR_BS_TRIGS", "70").toInt
        val stages = sys.env.getOrElse("SPARK_GRAFT_SR_BS_STAGES",
          "200000,1000000").split(",").map(_.trim.toLong).toSeq
        val dir = java.nio.file.Files.createTempDirectory("sr_backstop")
          .toString + "/records"
        var keyOffset = 0L
        var baseRows = 0L
        def rowsDf(n: Long, offset: Long) = recordsRows("2024-01-15", n, offset)
        runTimed("backstop_bound") {
          stages.foreach { target =>
            // seed the base DIRECTLY to the stage size (parallel write;
            // distinct keys keep the base key-unique by construction —
            // routing the seed through append would funnel it into the
            // one-file-per-partition single-task write)
            val need = target - baseRows
            if (need > 0) {
              rowsDf(need, keyOffset).write.mode("append")
                .partitionBy("source", "trip_start_date").parquet(dir)
              keyOffset += need; baseRows = target
            } else
              // no silent caps: the previous stage's contrast fold already
              // grew the base past this target (trigs × rows per stage), so
              // the stage label understates the measured base size
              println(s"[scale] backstop_bound stage target=$target" +
                s" OVERSHOT: base already holds $baseRows rows —" +
                " this stage measures the larger base")
            var prevFiles = 0
            val walls = (1 to trigs).map { _ =>
              val t0 = System.nanoTime()
              graft.streaming.StreamingImport.upsertBatch(
                rowsDf(rows.toLong, keyOffset), dir)
              keyOffset += rows
              val w = (System.nanoTime() - t0) / 1e9
              val nf = graft.gtfs.LwwTable.deltaFileCount(spark, dir)
              val merged = nf < prevFiles
              prevFiles = nf
              (w, merged)
            }
            val plain = walls.filterNot(_._2).map(_._1)
            val merges = walls.zipWithIndex.filter(_._1._2)
            def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
            println(f"[scale] backstop_bound base=${baseRows} rows: " +
              f"append median=${med(plain)}%.2fs max=${plain.max}%.2fs; " +
              s"backstop merge at trigger(s) ${merges.map(_._2 + 1).mkString(",")} " +
              f"wall=${merges.map(_._1._1).map(w => f"$w%.2f").mkString(",")}s " +
              f"(delta working set=${trigs.toLong * rows} rows); " +
              f"per-trigger MAX=${walls.map(_._1).max}%.2fs")
            // contrast: the OLD backstop = a base fold of this partition,
            // timed off-path (also folds the stage's rows for the next seed)
            val tc = System.nanoTime()
            graft.gtfs.RecordsTable.compact(spark, dir)
            baseRows += trigs.toLong * rows
            println(f"[scale] backstop_bound OLD-shape base fold at " +
              f"$baseRows rows: wall=${(System.nanoTime() - tc) / 1e9}%.2fs " +
              "(the stall that no longer lands on any trigger)")
          }
          graft.gtfs.RecordsTable.read(spark, dir).count()
        }
      }

      if (opWanted("trivial_fold")) {
        // ---- the fold's LSM trivial move at base scale: a fresh day
        // partition (one delta file, no base overlap — the day-rollover
        // shape) must fold by RENAMES whose cost is independent of how
        // large the rest of the base is, while an overlapping partition
        // pays the O(partition) merge. This is the difference between a
        // daily maintenance fold that is free and one that rewrites
        // history.
        import org.apache.spark.sql.functions._
        val baseN = sys.env.getOrElse("SPARK_GRAFT_SR_TF_BASE", "20000000").toLong
        val dir = java.nio.file.Files.createTempDirectory("sr_trivial")
          .toString + "/records"
        def day(d: String, n: Long, offset: Long) = recordsRows(d, n, offset)
        runTimed("trivial_fold") {
          day("2024-01-15", baseN, 0L).write.mode("append")
            .partitionBy("source", "trip_start_date").parquet(dir)
          // day-rollover: one append into a FRESH day -> single delta file
          graft.streaming.StreamingImport.upsertBatch(
            day("2024-01-16", 20000, baseN), dir)
          val t1 = System.nanoTime()
          graft.gtfs.RecordsTable.compact(spark, dir)
          val trivialWall = (System.nanoTime() - t1) / 1e9
          // contrast: the same-size append into the 20M-row day -> merge
          graft.streaming.StreamingImport.upsertBatch(
            day("2024-01-15", 20000, baseN + 20000L), dir)
          val t2 = System.nanoTime()
          graft.gtfs.RecordsTable.compact(spark, dir)
          val overlapWall = (System.nanoTime() - t2) / 1e9
          println(f"[scale] trivial_fold: base day A=$baseN rows; " +
            f"fresh-day fold=$trivialWall%.2fs (trivial move, " +
            f"base-size-independent); overlapping-day fold=$overlapWall%.2fs " +
            "(O(partition) merge of day A)")
          graft.gtfs.RecordsTable.read(spark, dir).count()
        }
      }

      if (opWanted("st2")) {
        val ckpt2 = java.nio.file.Files.createTempDirectory("sr_ckpt2").toString
        val emitted = new AtomicLong
        var qh2: org.apache.spark.sql.streaming.StreamingQuery = null
        runTimed("stream_st2_requests") {
          val rt = graft.streaming.StreamingImport.rtStream(
            spark, rtDir.toString, filesPerTrigger)
          val recs = graft.streaming.StreamingImport.recordsStream(
            spark, rt, schedule, "scale")
          val reqs = graft.streaming.StreamingImport.predictionRequests(
            spark, recs,
            org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
          val q = reqs.writeStream
            .outputMode("append")
            .option("checkpointLocation", ckpt2)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (b: org.apache.spark.sql.Dataset[
              graft.streaming.PredictionRequest], _: Long) =>
              emitted.addAndGet(b.count()); ()
            }
            .start()
          qh2 = q
          q.awaitTermination()
          emitted.get()
        }
        batchReport("stream_st2_requests", qh2)
      }

      if (opWanted("st2_ttl")) {
        // ---- ST2 state EVICTION under identity churn (SCALE.md row) ----
        // The service date in the trip descriptor advances every `rotEvery`
        // files, so the stream keeps minting fresh VehicleIdentifiers
        // (trip_id, start_date, start_time) while earlier generations go
        // silent. With the TTL shrunk to rehearsal scale, the state store
        // must track the LIVE vehicle set — rows ≈ one TTL window of
        // identities, falling back to ZERO once the feed goes quiet — not
        // the cumulative identity count. That is the production claim
        // behind the 12 h TTL: an importer running for months holds state
        // proportional to vehicles currently on the road.
        val ttl = sys.env.getOrElse("SPARK_GRAFT_SR_TTL", "12 seconds")
        val rotEvery = sys.env.getOrElse("SPARK_GRAFT_SR_ROT_FILES", "20").toInt
        val drainSecs = sys.env.getOrElse("SPARK_GRAFT_SR_DRAIN", "45").toInt
        val rtDirRot = genFeed("rot", stops, f =>
          java.time.LocalDate.of(2024, 1, 1).plusDays((f / rotEvery).toLong)
            .format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE))
        val generations = (files + rotEvery - 1) / rotEvery
        val cumulativeIds = generations.toLong * math.min(nTrips, rotEvery.toLong * tripsPerFile)
        val ckptT = java.nio.file.Files.createTempDirectory("sr_ckpt_ttl").toString
        val emitted = new AtomicLong
        runTimed("stream_st2_ttl") {
          val rt = graft.streaming.StreamingImport.rtStream(
            spark, rtDirRot.toString, filesPerTrigger)
          val recs = graft.streaming.StreamingImport.recordsStream(
            spark, rt, schedule, "scale")
          val reqs = graft.streaming.StreamingImport.predictionRequests(
            spark, recs,
            org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
            ttl)
          val q = reqs.writeStream
            .outputMode("append")
            .option("checkpointLocation", ckptT)
            .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
            .foreachBatch { (b: org.apache.spark.sql.Dataset[
              graft.streaming.PredictionRequest], _: Long) =>
              emitted.addAndGet(b.count()); ()
            }
            .start()
          // recentProgress retains only the trailing ~100 progresses — far
          // fewer than this run's batch count — so the trajectory is polled
          // LIVE from lastProgress (keyed by batchId; poll period well under
          // the 1 s trigger so no batch is skipped)
          val traj = scala.collection.mutable.TreeMap[Long, (Long, Long, Long)]()
          // lastProgress alone can lose a batch when two complete
          // back-to-back between 250 ms polls (e.g. after one slow batch
          // under load): the overwritten entry's numInputRows would
          // undercount the drain condition — possibly pinning the loop to
          // the 600 s deadline — and the evicted/peak totals. Merging the
          // recentProgress window too (keyed by batchId, so re-merging is
          // idempotent) recovers briefly-missed batches.
          def poll(): Unit =
            (q.recentProgress.toSeq ++ Option(q.lastProgress)).foreach { p =>
              if (p.stateOperators.nonEmpty)
                traj(p.batchId) = (p.numInputRows,
                  p.stateOperators.head.numRowsTotal,
                  p.stateOperators.head.numRowsRemoved)
            }
          // run until the file backlog is consumed, then keep the trigger
          // firing (empty batches process timeouts) so eviction completes
          val deadline = System.nanoTime() + 600L * 1000 * 1000 * 1000
          var drained = 0
          while (drained < drainSecs * 4 && System.nanoTime() < deadline) {
            Thread.sleep(250)
            poll()
            if (traj.valuesIterator.map(_._1).sum >= files) drained += 1 // 250 ms ticks
          }
          q.stop(); q.awaitTermination(); poll()
          val rows = traj.toSeq
          val peak = if (rows.isEmpty) 0L else rows.map(_._2._2).max
          val fin = if (rows.isEmpty) 0L else rows.last._2._2
          val removed = rows.map(_._2._3).sum
          println(f"[scale] stream_st2_ttl: ttl=$ttl rotEvery=$rotEvery " +
            f"generations=$generations cumulative_ids=$cumulativeIds " +
            f"peak_state_rows=$peak final_state_rows=$fin evicted=$removed " +
            f"requests=${emitted.get()}")
          // print only the informative batches: state or eviction changed
          var lastPrinted = (-1L, -1L)
          rows.foreach { case (b, (in, tot, rem)) =>
            if ((tot, rem) != lastPrinted || in > 0) {
              println(s"[scale]   ttl batch=$b files=$in state_rows=$tot removed=$rem")
              lastPrinted = (tot, rem)
            }
          }
          peak
        }
      }

      if (opWanted("refresh")) {
        // the reference importer's FULL realtime loop at scale: each
        // micro-batch upserts records, re-predicts the touched service date
        // from the stored basis (curve-set join + rank-tier default
        // fallback), and upserts the predictions. Feed caps updates at 60 %
        // of the route, so ~40 % of each trip remains a realtime target.
        val histDays = sys.env.getOrElse("SPARK_GRAFT_SR_HIST_DAYS", "7").toInt
        val hist = syntheticRecords(schedule, histDays)
        val tCurves = System.nanoTime()
        val sc2 = graft.gtfs.CurveAnalysis.specificCurves(spark, hist, schedule).cache()
        val dc2 = graft.gtfs.CurveAnalysis.defaultCurves(spark, hist, schedule).cache()
        val nSc = sc2.count(); val nDc = dc2.count()
        println(f"[scale] refresh curve tables: specific=$nSc default=$nDc " +
          f"from ${histDays}d history, build=${(System.nanoTime() - tCurves) / 1e9}%.1fs")
        val rtDirMid = genFeed("midtrip", stops * 3 / 5)
        val recordsDir2 = java.nio.file.Files.createTempDirectory("sr_rrec").toString + "/records"
        val predsDir = java.nio.file.Files.createTempDirectory("sr_preds").toString + "/predictions"
        val ckpt3 = java.nio.file.Files.createTempDirectory("sr_ckpt3").toString
        var qh3: org.apache.spark.sql.streaming.StreamingQuery = null
        runTimed("stream_refresh") {
          val q = graft.streaming.StreamingImport.startPredictionRefresh(
            spark, rtDirMid.toString, schedule, "scale", recordsDir2, predsDir,
            ckpt3, sc2, dc2, automatic = false, maxFilesPerTrigger = filesPerTrigger)
          qh3 = q
          q.awaitTermination()
          // the resolved LWW view: the run ends with micro-batches in the
          // delta tree (compaction is the idle branch's job)
          graft.gtfs.PredictionsTable.read(spark, predsDir).count()
        }
        batchReport("stream_refresh", qh3)
        sc2.unpersist(); dc2.unpersist()
      }

      if (opWanted("automatic")) {
        // ---- the COMPOSED automatic mode at scale (SCALE.md row) ----
        // Claim under test: the idle backfill drains a full 7d12h buffer of
        // scheduled trips in ≥1000-trip ST4 batches at a flat per-batch
        // wall (each advance is O(batch + horizon scan over the broadcast
        // schedule), never O(already-predicted history)); a sustained rt
        // backlog suppresses backfill decisions entirely; the drain + a
        // reopened buffer resume them.
        val histDays = sys.env.getOrElse("SPARK_GRAFT_SR_HIST_DAYS", "2").toInt
        val hist = syntheticRecords(schedule, histDays)
        val scA = graft.gtfs.CurveAnalysis.specificCurves(spark, hist, schedule).cache()
        val dcA = graft.gtfs.CurveAnalysis.defaultCurves(spark, hist, schedule).cache()
        scA.count(); dcA.count()
        val rtLive = java.nio.file.Files.createTempDirectory("sr_auto_rt")
        val recDir = java.nio.file.Files.createTempDirectory("sr_auto_rec").toString + "/records"
        val predDir = java.nio.file.Files.createTempDirectory("sr_auto_pred").toString + "/predictions"
        val ckptA = java.nio.file.Files.createTempDirectory("sr_auto_ckpt").toString
        val clock = new AtomicLong(1705320000L) // 2024-01-15 12:00 UTC
        spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "1000ms")
        val tripsPerDay = routes * 2 * tripsPerVariant
        println(s"[scale] automatic: ${tripsPerDay} trips/day, buffer " +
          s"${graft.gtfs.ScheduledPredictions.BufferSecs / 3600}h ≈ " +
          s"${tripsPerDay * graft.gtfs.ScheduledPredictions.BufferSecs / 86400} trips")
        runTimed("automatic_mode") {
          val auto = graft.streaming.AutomaticImport.start(spark,
            rtLive.toString, schedule, "scale", recDir, predDir, ckptA,
            scA, dcA, nowEpochSecs = () => clock.get(),
            triggerInterval = "1 second", idlePollMs = 200L,
            idleConfirmMs = 1500L, bufferFullBackoffSecs = 3600L,
            maxFilesPerTrigger = filesPerTrigger)
          try {
            // phase 1: drain the whole buffer while idle
            val dl1 = System.nanoTime() + 2400L * 1000000000L
            while (!auto.backfillEvents.exists(_.bufferFull)
                && System.nanoTime() < dl1) Thread.sleep(500)
            val evs = auto.backfillEvents.filterNot(_.bufferFull)
            val walls = evs.map(e => (e.completedAtNanos - e.decidedAtNanos) / 1e9)
            val trips = evs.map(_.tripCount).sum
            println(f"[scale] automatic backfill: batches=${evs.size} " +
              f"trips=$trips buffer_full=${auto.backfillEvents.exists(_.bufferFull)} " +
              (if (walls.nonEmpty)
                f"batch wall median=${walls.sorted.apply(walls.size / 2)}%.1fs " +
                f"max=${walls.max}%.1fs" else ""))
            println(f"[scale] automatic predictions: rows=${
              graft.gtfs.PredictionsTable.read(spark, predDir).count()
            } hwm=${auto.highWaterMark}")

            // phase 2: sustained rt backlog → zero backfill decisions.
            // Generate the feed BEFORE stamping tDrop: genFeed's protobuf
            // synthesis takes seconds and must not inflate the measured
            // ingest window (the files only become visible at the copy).
            val pre = auto.backfillEvents.size
            val busySrc = genFeed("autobusy", stops * 3 / 5)
            val tDrop = System.nanoTime()
            busySrc.toFile.listFiles().foreach { f =>
              java.nio.file.Files.copy(f.toPath, rtLive.resolve(f.getName),
                java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
            }
            // batchId-keyed accumulation: recentProgress is a ROLLING window
            // (default 100 entries), so summing it directly undercounts once
            // data batches + 1 s no-data events exceed the cap (same shape
            // as the st2_ttl poll fix)
            val seenBatches = scala.collection.mutable.HashMap.empty[Long, Long]
            def ingested(): Long = {
              auto.query.recentProgress.foreach(p =>
                seenBatches(p.batchId) =
                  math.max(seenBatches.getOrElse(p.batchId, 0L), p.numInputRows))
              seenBatches.values.sum
            }
            // Once the source has SEEN the backlog, reopen the buffer:
            // phase 1 ended buffer-full with the clock frozen, so the
            // back-off alone would suppress every decision and "zero
            // decisions during the backlog" would be vacuous. With the
            // buffer open, only the idle gate — the property under test —
            // stands between the backlog and a backfill decision.
            val seenDl = System.nanoTime() + 120L * 1000000000L
            while (!(auto.query.status.isDataAvailable || ingested() >= 1)
                && System.nanoTime() < seenDl) Thread.sleep(250)
            clock.addAndGet(86400L)
            val tOpen = System.nanoTime()
            val dl2 = System.nanoTime() + 1800L * 1000000000L
            while ((ingested() < files || auto.query.status.isDataAvailable)
                && System.nanoTime() < dl2) Thread.sleep(500)
            val tDrain = System.nanoTime()
            val during = auto.backfillEvents.drop(pre).count(e =>
              e.decidedAtNanos > tOpen + 1000L * 1000000L
                && e.decidedAtNanos < tDrain - 2000L * 1000000L)
            println(f"[scale] automatic busy phase: files=$files " +
              f"drain=${(tDrain - tDrop) / 1e9}%.1fs " +
              f"backfill_decisions_during_backlog=$during " +
              f"records=${graft.gtfs.RecordsTable.read(spark, recDir).count()}")

            // phase 3: stream idle again + open buffer → backfill resumes
            clock.addAndGet(86400L) // another day of buffer room
            val dl3 = System.nanoTime() + 600L * 1000000000L
            while (!auto.backfillEvents.drop(pre).exists(e =>
                !e.bufferFull && e.tripCount > 0 && e.decidedAtNanos > tDrain)
                && System.nanoTime() < dl3) Thread.sleep(500)
            val resumed = auto.backfillEvents.drop(pre)
              .filter(e => !e.bufferFull && e.tripCount > 0)
            println(s"[scale] automatic resume: resumed_batches=${resumed.size} " +
              s"trips=${resumed.map(_.tripCount).sum}")
            trips
          } finally auto.stop()
        }
        val tRec = System.nanoTime()
        val rec = graft.streaming.AutomaticImport.recoverHighWaterMark(spark, predDir, "scale")
        println(f"[scale] automatic hwm recovery: hwm=$rec " +
          f"wall=${(System.nanoTime() - tRec) / 1e9}%.1fs")
        scA.unpersist(); dcA.unpersist()
      }

      if (opWanted("monitor")) {
        // ---- the serving layer's hot-reload price, measured (SCALE.md
        // r10): a monitor request inside the TTL pays ZERO filesystem
        // calls; at TTL expiry it pays one ScheduleCache.newest() probe
        // (directory listing + full-file fingerprint, metadata only); only
        // a version whose files actually CHANGED pays a reload. This op
        // times each tier against the rehearsal-scale schedule so the
        // steady-state claim is a number, not prose.
        import java.nio.file.Files
        val base = Files.createTempDirectory("sr_mon")
        val v1 = Files.createDirectories(base.resolve("schedule/2024-01-01"))
        writeSchedule(v1, routes, tripsPerVariant, stops)
        val cache = new graft.gtfs.ScheduleCache(spark, s"$base/schedule")
        def timeN(n: Int)(f: => Unit): Double = {
          val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
          (System.nanoTime() - t0) / 1e6 / n
        }
        val tLoad0 = System.nanoTime()
        cache.newest().foreach(_._2.stopTimes.count()) // first load, plans materialized
        val loadMs = (System.nanoTime() - tLoad0) / 1e6
        val probeMs = timeN(200)(cache.newest()) // fingerprint hit: probe only
        // the server-side TTL memo, timed on the REAL served path
        // (MonitorServer.resolveSchedule: nanoTime + TTL compare + memo
        // read), not a bare atomic-read proxy; the TTL is pinned long so
        // every timed call stays inside it
        val srv = new graft.serving.MonitorServer(spark,
          () => cache.newest().map(_._2), () => null,
          scheduleTtlMs = 3600L * 1000L)
        srv.resolveSchedule() // populate the memo
        val memoMs = timeN(10000)(assert(srv.resolveSchedule() != null))
        srv.stop()
        // invalidation: touch one file -> next probe fingerprints + reloads lazily
        val stops1 = v1.resolve("stops.txt")
        Files.setLastModifiedTime(stops1,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 2000))
        val tInval = System.nanoTime()
        cache.newest() // detects the fingerprint change, reloads (lazy plans)
        val invalMs = (System.nanoTime() - tInval) / 1e6
        println(f"[scale] monitor hot-reload tiers: ttl_memo=${memoMs}%.4fms " +
          f"probe=${probeMs}%.2fms invalidate+reload(lazy)=${invalMs}%.1fms " +
          f"first_load(materialized)=${loadMs}%.0fms (schedule: $routes routes, " +
          f"${stops} stops/variant)")
        cache.close()
      }

      if (opWanted("soak")) {
        // ---- SOAK: the production-faithful hot-reloading mode end to end
        // (SCALE.md row; VERDICT r9 #5): busy → idle backfill under v1 →
        // schedule v2 dropped MID-RUN → busy under v2 → multi-day clock
        // advance with --cleanup on. Claims under test: the swap needs no
        // restart (rt + backfill re-resolve per batch/iteration), v1's
        // schedule-origin rows below the v2 mark are retired batch by
        // batch, committed marks advance monotonically within each version
        // era, and the predictions table stays bounded to the live window
        // under cleanup.
        import java.nio.file.{Files, StandardCopyOption}
        val base = Files.createTempDirectory("sr_soak")
        val schedParent = Files.createDirectories(base.resolve("schedule"))
        val v1Dir = Files.createDirectories(schedParent.resolve("2024-01-01"))
        writeSchedule(v1Dir, routes, tripsPerVariant, stops)
        val schedule1 = graft.gtfs.GtfsSchedule.load(spark, v1Dir.toString)
        // 7 days of history, like the refresh op: enough samples that the
        // F9 min-sample gates pass and the SPECIFIC store is non-empty
        val histS = syntheticRecords(schedule1,
          sys.env.getOrElse("SPARK_GRAFT_SR_HIST_DAYS", "7").toInt)
        val specDir = s"$base/curves/specific"; val defDir = s"$base/curves/default"
        val scS = graft.gtfs.CurveAnalysis.specificCurves(spark, histS, schedule1).cache()
        val dcS = graft.gtfs.CurveAnalysis.defaultCurves(spark, histS, schedule1).cache()
        graft.gtfs.CurveStore.saveSpecific(scS, specDir)
        graft.gtfs.CurveStore.saveDefault(dcS, defDir)
        scS.unpersist(); dcS.unpersist(); schedule1.unpersist()

        val rtLive = Files.createDirectories(base.resolve("rt"))
        val recDir = s"$base/stream/records"; val predDir = s"$base/stream/predictions"
        val clock = new AtomicLong(1705320000L) // 2024-01-15 12:00 UTC
        spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "1000ms")
        def copyDated(src: java.nio.file.Path, datePrefix: String): Unit =
          src.toFile.listFiles().foreach { f =>
            Files.copy(f.toPath, rtLive.resolve(s"$datePrefix-${f.getName}"),
              StandardCopyOption.COPY_ATTRIBUTES)
          }
        // reads race the writer's partition swaps — poll, treating a
        // mid-swap read failure as "not yet" (the gate serializes WRITERS
        // only; an external reader sees the same swap a monitor would)
        def awaitSoft(secs: Long)(cond: => Boolean): Boolean = {
          def soft = try cond catch { case scala.util.control.NonFatal(_) => false }
          val dl = System.nanoTime() + secs * 1000000000L
          // capture the last evaluation — a post-loop re-read could race a
          // mid-swap snapshot and report false after observing true
          var ok = soft
          while (!ok && System.nanoTime() < dl) { Thread.sleep(500); ok = soft }
          ok
        }
        // RAW base ∪ delta: phases 3/5 assert rows are PHYSICALLY retired,
        // and a stale row lingering un-compacted in the delta tree must
        // fail the check, not hide behind the resolved view
        def schedOriginRows(name: String) =
          graft.gtfs.LwwTable.readRaw(spark, predDir)
          .filter(col("origin_type") === graft.gtfs.Codes.OriginSchedule
            && col("schedule_file_name") === name)
        val tripStartTs = unix_timestamp(graft.gtfs.GtfsTime.dateAndTime(
          col("trip_start_date"), col("trip_start_time")))

        runTimed("soak_total") {
          val auto = graft.streaming.AutomaticImport.startFromDirs(spark,
            rtLive.toString, schedParent.toString, "scale", recDir, predDir,
            s"$base/stream/ckpt", specDir, defDir,
            nowEpochSecs = () => clock.get(), triggerInterval = "1 second",
            idlePollMs = 200L, idleConfirmMs = 1500L,
            bufferFullBackoffSecs = 3600L,
            maxFilesPerTrigger = filesPerTrigger, performCleanup = true)
          try {
            // phase 1 (busy, v1 era): a dated rt backlog through the as-of path
            val t1 = System.nanoTime()
            copyDated(genFeed("soak_v1", stops * 3 / 5), "2024-01-15")
            require(awaitSoft(900)(graft.gtfs.LwwTable.readRaw(spark, recDir)
              .filter(col("schedule_file_name") === "2024-01-01").count() > 0),
              "soak: v1-era records carry the v1 version name")
            println(f"[scale] soak phase1 (busy v1): first records " +
              f"${(System.nanoTime() - t1) / 1e9}%.1fs after drop")

            // phase 2 (idle): ≥2 committed v1 backfill batches
            val t2 = System.nanoTime()
            require(awaitSoft(1200)(auto.backfillEvents
              .count(e => !e.bufferFull && e.tripCount > 0) >= 2),
              "soak: v1 backfill committed")
            val v1Marks = auto.backfillEvents.filterNot(_.bufferFull)
              .map(_.toHwm).filter(_ > 0)
            require(v1Marks == v1Marks.sorted, s"soak: v1 marks monotonic: $v1Marks")
            require(awaitSoft(300)(schedOriginRows("2024-01-01").count() > 0),
              "soak: v1 schedule-origin predictions landed")
            println(f"[scale] soak phase2 (idle backfill v1): " +
              f"batches=${v1Marks.size} wall=${(System.nanoTime() - t2) / 1e9}%.1fs")

            // phase 3: v2 dropped ATOMICALLY mid-run; clock reopens buffer
            val t3 = System.nanoTime()
            val tmpV2 = Files.createDirectories(base.resolve("incoming_v2"))
            writeSchedule(tmpV2, routes, tripsPerVariant, stops, version = 2)
            Files.move(tmpV2, schedParent.resolve("2024-01-16"),
              StandardCopyOption.ATOMIC_MOVE)
            val preSwap = auto.backfillEvents.size
            clock.addAndGet(86400L) // 2024-01-16 12:00
            require(awaitSoft(1200)(schedOriginRows("2024-01-16").count() > 0),
              "soak: backfill switched to v2 without restart")
            // v1 rows below the advancing v2 mark retire batch by batch
            require(awaitSoft(1200)(schedOriginRows("2024-01-01")
                .filter(tripStartTs <= auto.highWaterMark).count() == 0),
              "soak: stale v1 rows below the v2 mark deleted")
            val v2Marks = auto.backfillEvents.drop(preSwap)
              .filterNot(_.bufferFull).map(_.toHwm).filter(_ > 0)
            require(v2Marks == v2Marks.sorted, s"soak: v2 marks monotonic: $v2Marks")
            println(f"[scale] soak phase3 (v2 swap): v2 batches=${v2Marks.size} " +
              f"wall=${(System.nanoTime() - t3) / 1e9}%.1fs")

            // phase 4 (busy, v2 era): post-drop files join v2 by J6 as-of
            val t4 = System.nanoTime()
            copyDated(genFeed("soak_v2", stops * 3 / 5,
              _ => "20240117"), "2024-01-17")
            require(awaitSoft(900)(graft.gtfs.LwwTable.readRaw(spark, recDir)
              .filter(col("trip_start_date") === "2024-01-17"
                && col("schedule_file_name") === "2024-01-16").count() > 0),
              "soak: post-drop rt files join the NEW version")
            println(f"[scale] soak phase4 (busy v2): " +
              f"wall=${(System.nanoTime() - t4) / 1e9}%.1fs")

            // phase 5: days pass with --cleanup on → table stays bounded to
            // the live window (12 h lookback + 48 h partition margin +
            // 7.5 d buffer ≈ 11 date partitions), early-era partitions gone
            val t5 = System.nanoTime()
            clock.addAndGet(4 * 86400L) // 2024-01-20 12:00
            val cutoffDay = java.time.LocalDate.parse("2024-01-18")
            def partDates(): Seq[java.time.LocalDate] = {
              val root = new java.io.File(s"$predDir/source=scale")
              Option(root.listFiles()).getOrElse(Array.empty).toSeq
                .map(_.getName).filter(_.startsWith("trip_start_date="))
                .map(_.stripPrefix("trip_start_date="))
                .filterNot(_.startsWith("__"))
                .map(java.time.LocalDate.parse)
            }
            require(awaitSoft(1200)(
                partDates().nonEmpty && !partDates().exists(_.isBefore(cutoffDay))),
              s"soak: cleanup pruned pre-${cutoffDay} partitions: ${partDates().sorted}")
            val nParts = partDates().size
            require(nParts <= 12, s"soak: table bounded to the live window, $nParts partitions")
            require(awaitSoft(300)(schedOriginRows("2024-01-01")
                .filter(tripStartTs <= auto.highWaterMark).count() == 0),
              "soak: no stale v1 rows past the swap")
            println(f"[scale] soak phase5 (cleanup): partitions=$nParts " +
              f"(all >= $cutoffDay) wall=${(System.nanoTime() - t5) / 1e9}%.1fs")
            graft.gtfs.PredictionsTable.read(spark, predDir,
              Some("2024-01-16")).count()
          } finally auto.stop()
        }
        val tRecS = System.nanoTime()
        val recS = graft.streaming.AutomaticImport.recoverHighWaterMark(
          spark, predDir, "scale", Some("2024-01-16"))
        require(recS > 0, "soak: per-version mark recoverable after stop")
        println(f"[scale] soak hwm recovery (v2-scoped): hwm=$recS " +
          f"wall=${(System.nanoTime() - tRecS) / 1e9}%.1fs")
      }

      spark.stop()
      return
    }

    if (mode == "docs") {
      // ---- label-propagation clustering decade point (VERDICT r14 #8) ----
      // Near-dup `clusters` had oracle-green correctness but no scale point
      // past the r8 corpus runs, whose pair count is an artifact of the
      // corpus's duplication rate. This op builds a SYNTHETIC pair graph
      // with controlled size and the worst diameter shape for min-label
      // propagation: chains of SPARK_GRAFT_SR_CL_CHAIN nodes (default 1024
      // — path halving converges in ~log2(chain)+1 rounds, so deep chains
      // stress the iteration count the corpus graph's shallow star
      // components never do), SPARK_GRAFT_SR_CL_PAIRS edges total. Opt-in
      // (SPARK_GRAFT_SR_OPS must name it): the graph is corpus-independent,
      // and the default docs run stays comparable round over round.
      if (srOps.exists(_.contains("clusters_synth"))) {
        val nPairs = sys.env.getOrElse("SPARK_GRAFT_SR_CL_PAIRS",
          "10000000").toLong
        val chain = sys.env.getOrElse("SPARK_GRAFT_SR_CL_CHAIN", "1024").toInt
        require(chain >= 2, s"chain length must be >= 2: $chain")
        val numChains = math.max(1L, nPairs / (chain - 1))
        val nNodes = numChains * chain
        val nodes = spark.range(nNodes).select(col("id").as("doc_id"))
        // node i -> i+1 except at chain ends; the last node of the last
        // chain is a chain end, so no edge ever dangles past nNodes-1
        val pairsSynth = spark.range(nNodes)
          .filter(col("id") % chain =!= (chain - 1))
          .select(col("id").as("a"), (col("id") + 1L).as("b"))
        println(s"[scale] clusters_synth graph: nodes=$nNodes " +
          s"pairs=${numChains * (chain - 1)} chain=$chain")
        runTimed("clusters_synth") {
          val dropped = graft.ops.Dedup.clusters(nodes, pairsSynth)
            .filter(!col("is_kept")).count()
          // every chain collapses to its min node: the count is a closed
          // form, so the decade point carries its own correctness pin
          require(dropped == nNodes - numChains,
            s"clusters_synth: expected ${nNodes - numChains} non-kept " +
              s"docs, got $dropped")
          dropped
        }
        if (srOps.exists(s => (s - "clusters_synth").isEmpty)) {
          spark.stop(); return
        }
      }
      // ---- training-data pipeline ops at corpus scale ----
      // SPARK_GRAFT_SR_DOCS_DIR: persistent corpus location, reused when it
      // already holds a committed write. The corpus is deterministic (pure
      // hash arithmetic), so sharing one generation across the per-op
      // fresh-disk processes changes nothing about the ops measured — while
      // saving the ~20 min the interpreted higher-order string build costs
      // at 30M docs, and leaving the whole scratch budget to the op's
      // shuffle.
      val docsDir = sys.env.getOrElse("SPARK_GRAFT_SR_DOCS_DIR",
        java.nio.file.Files.createTempDirectory("sr_docs").toString + "/documents")
      if (!new java.io.File(docsDir, "_SUCCESS").exists())
        syntheticDocs(spark, nDocs).write.mode("overwrite").parquet(docsDir)
      val docs = spark.read.parquet(docsDir)
      val nHave = docs.count()
      // a reused dir holding a DIFFERENT-sized corpus would silently turn
      // every "30M" measurement into a measurement of whatever is on disk —
      // fail loudly instead (the caller deletes the dir or fixes SR_DOCS)
      require(nHave == nDocs, s"corpus at $docsDir has $nHave rows but " +
        s"SPARK_GRAFT_SR_DOCS=$nDocs — delete the dir or match the size")
      println(f"[scale] documents: rows=$nHave parquet=${
        new java.io.File(docsDir).listFiles().map(_.length).sum / 1e6}%.0fMB")
      if (opWanted("dedup_exact"))
        runTimed("dedup_exact")(graft.ops.Dedup.exact(docs).count())
      // cache the shingle index (and the pair set below) only when MORE THAN
      // ONE selected op consumes it: at 30M docs the cached index is ~60 GB
      // of disk blocks that this box's single scratch disk cannot hold next
      // to the consumer's own shuffle (SCALE.md 30M abort). A lone op runs
      // UNCACHED — inside one op the doc-keyed repartition exchange is
      // already reused across its aggregations (signatures + doc sets read
      // one shuffle), so nothing is computed twice; only cross-op sharing
      // needs the cache.
      // the pairs chain counts as ONE sh consumer no matter how many pair
      // ops run: when several do, `pairs` itself is cached, so sh is only
      // materialized once by the pairs build — counting each pair op as a
      // direct sh reader would cache the ~60 GB index for a single read,
      // recreating the very disk exhaustion the conditional cache avoids
      val anyPairOp = Seq("ngram_pairs", "clusters", "pipeline_curate")
        .exists(opWanted)
      val shConsumers = Seq("shingle_index", "minhash_lsh").count(opWanted) +
        (if (anyPairOp) 1 else 0)
      lazy val sh = {
        val d = graft.ops.Dedup.shingles(docs, "doc_id", "text", 3, 100)
        if (shConsumers > 1) d.cache() else d
      }
      if (opWanted("shingle_index")) runTimed("shingle_index")(sh.count())
      if (opWanted("minhash_lsh")) runTimed("minhash_lsh")(
        graft.ops.Dedup.minhashLshFromShingles(sh, 32, 8, 0.5).count())
      if (opWanted("simhash"))
        runTimed("simhash")(graft.ops.Dedup.simhashPairs(docs, 3).count())
      val pairConsumers = Seq("ngram_pairs", "clusters", "pipeline_curate")
        .count(opWanted)
      lazy val pairs = {
        val d = graft.ops.Dedup.ngramJaccardFromShingles(sh, 0.5)
        if (pairConsumers > 1) d.cache() else d
      }
      if (opWanted("ngram_pairs")) runTimed("ngram_pairs")(pairs.count())
      if (opWanted("clusters")) runTimed("clusters")(
        graft.ops.Dedup.clusters(docs, pairs).filter(!col("is_kept")).count())
      if (opWanted("dup_spans")) {
        // substring-level dedup at corpus scale: spans + the strip pass
        // (the strip re-reads the spans, so they persist for the pair)
        runTimed("dup_spans") {
          val spans = graft.ops.Dedup.dupSpans(docs, n = 5, minCount = 2)
            .persist()
          val nSpans = spans.count()
          val removed = graft.ops.Dedup.stripFromSpans(docs, spans)
            .agg(sum(col("tokens_removed"))).head().getLong(0)
          spans.unpersist()
          println(s"[scale] dup_spans: spans=$nSpans tokens_removed=$removed")
          nSpans
        }
      }
      if (opWanted("sample_split")) runTimed("sample_split")(
        graft.ops.Sampling.assign(docs,
          graft.ops.TextAnalysis.langIdCol(col("text")), Map("en" -> 40), 100)
          .filter(col("sampled")).count())
      if (opWanted("vocabulary")) runTimed("vocabulary")(
        graft.ops.TextAnalysis.vocabulary(docs, 100).count())
      if (opWanted("pack_sequences")) runTimed("pack_sequences")(
        graft.ops.Packing.concatChunkPack(docs, budget = 2048)
          .filter(col("straddles")).count())
      // the full curation chain (language/quality/repetition gates, near-dup
      // collapse, decontamination vs a 1/97 benchmark slice, stratified
      // sample) composed over the cached pair set — the pipeline_curate
      // query's shape at corpus scale
      if (opWanted("pipeline_curate")) runTimed("pipeline_curate") {
        import graft.ops.{Dedup, Sampling, TextAnalysis}
        val kept = Dedup.clusters(docs, pairs).filter(col("is_kept")).select("doc_id")
        val contaminated = Dedup.contamination(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0), n = 8).select("doc_id")
        docs
          .withColumn("lang_pred", TextAnalysis.langIdCol(col("text")))
          .withColumn("quality", TextAnalysis.qualityScoreCol(col("text")))
          .withColumn("repetition", TextAnalysis.dupNgramFracCol(col("text"), 3))
          .filter(col("quality") >= 0.2 && col("repetition") <= 0.5)
          .filter(col("doc_id") % 97 =!= 0)
          .join(kept, Seq("doc_id"), "left_semi")
          .join(contaminated, Seq("doc_id"), "left_anti")
          .filter(Sampling.stratifiedKeepCol(col("doc_id"), col("lang_pred"),
            Map("en" -> 40), defaultPct = 100))
          .count()
      }
      spark.stop()
      return
    }

    val schedDir = java.nio.file.Files.createTempDirectory("sr_sched")
    writeSchedule(schedDir, routes, tripsPerVariant, stops)
    val schedule = graft.gtfs.GtfsSchedule.load(spark, schedDir.toString)
    schedule.trips.count(); schedule.stopTimes.count()

    val records = syntheticRecords(schedule, days)

    val recDir = java.nio.file.Files.createTempDirectory("sr_records").toString + "/records"
    val t0 = System.nanoTime()
    records.write.mode("overwrite").parquet(recDir)
    val genSecs = (System.nanoTime() - t0) / 1e9
    val stored = spark.read.parquet(recDir)
    val nRecords = stored.count()
    val bytes = new java.io.File(recDir).listFiles().map(_.length).sum

    println(f"[scale] records: rows=$nRecords parquet=${bytes / 1e6}%.0fMB gen=${genSecs}%.1fs " +
      s"(routes=$routes trips/var=$tripsPerVariant stops=$stops days=$days)")
    // SPARK_GRAFT_SR_OPS subsets the curve mode too: at 100M records the
    // specific-curve shuffle (~70 GB) plus the cached curve blocks plus the
    // next op's shuffle exceed this box's single local disk — each op can
    // run in its own process with a fresh disk instead (a cluster gives
    // every executor its own scratch; one shared disk for 32 "executors"
    // is the local-mode bottleneck, not the plan)
    val needPredict = opWanted("batch_predict") || opWanted("batch_predict_realtime")
    // caching pays only when a later prediction op reuses the table
    lazy val sc = {
      val d = graft.gtfs.CurveAnalysis.specificCurves(spark, stored, schedule)
      if (needPredict) d.cache() else d
    }
    lazy val dc = {
      val d = graft.gtfs.CurveAnalysis.defaultCurves(spark, stored, schedule)
      if (needPredict) d.cache() else d
    }
    if (opWanted("specific_curves")) runTimed("specific_curves")(sc.count())
    if (opWanted("default_curves")) runTimed("default_curves")(dc.count())
    // when the subset selects a prediction op but not the curve builds, the
    // lazy cached inputs must still materialize OUTSIDE the prediction's
    // timed block — otherwise the printed prediction wall silently includes
    // the whole curve construction and is not comparable to the SCALE.md
    // table rows (cheap cached counts when the builds ran above)
    if (needPredict) { sc.count(); dc.count() }
    // the prediction join paths over one service day against the full curve
    // tables: general/default broadcasts (batchPredict) and the curve-set
    // broadcast join with its rank-tier default fallback (batchPredictRealtime)
    if (opWanted("batch_predict")) runTimed("batch_predict")(
      graft.gtfs.Predictor.batchPredict(
        spark, schedule, "2024-01-15", "scale", sc, dc).count())
    if (opWanted("batch_predict_realtime")) {
      // synthetic records delay EVERY stop, so the W3 basis would be each
      // vehicle's last stop (no later targets). Null the tail deltas to put
      // the basis mid-trip — stops 6..19 become realtime targets.
      val midTrip = stored.withColumn("delay_departure",
        when(col("stop_index") <= 5, col("delay_departure")))
      runTimed("batch_predict_realtime")(
        graft.gtfs.Predictor.batchPredictRealtime(
          spark, schedule, midTrip, "2024-01-15", "scale", sc, dc).count())
    }
    if (needPredict) { sc.unpersist(); dc.unpersist() }
    spark.stop()
  }
}
