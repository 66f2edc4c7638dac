package graft

import org.apache.spark.sql.SparkSession
import graft.gtfs._

/** CLI analogue of the reference's `import --record manual <dir>` +
  * `predict` subcommands (src/main.rs:231-251): scans `<dir>/rt` against
  * dated schedules in `<dir>/schedule`, imports matched groups into
  * `<dir>/records` (archiving processed files), then runs one scheduled-
  * prediction backfill batch into `<dir>/predictions`.
  *
  * Usage: sbt "runMain graft.ImportCli <baseDir> [source] [serviceDateForNow]"
  */
object ImportCli {

  /** The whole import→analyse→predict pass, session-agnostic so tests can
    * drive it against a shared SparkSession. */
  def run(spark: SparkSession, baseDir: String, source: String, nowDate: String): Unit = {
    // ---- import --record: directory scan → records table ----
    val (recsOpt, stats) = Directory.importTree(spark, baseDir, source)
    stats.foreach { case (sched, ok, failed) =>
      println(s"[import] schedule=$sched rt_ok=$ok rt_failed=$failed")
    }
    recsOpt match {
      case None => println("[import] no realtime files found")
      case Some(recs) =>
        recs.write.mode("overwrite").parquet(s"$baseDir/records")
        println(s"[import] records=${recs.count()} -> $baseDir/records")

        // ---- analyse: curve tables ----
        // newest DATED schedule: undated directories stay in schedule/
        // (importTree no longer archives them) and must not win a
        // lexicographic max ("current" > "2024-…")
        val schedDirs = Option(new java.io.File(s"$baseDir/schedule").listFiles())
          .getOrElse(Array.empty)
          .map(_.getPath).filter(p => Directory.dateFromFilename(p).isDefined)
        require(schedDirs.nonEmpty, s"no dated schedule directory under $baseDir/schedule")
        val schedule = GtfsSchedule.load(spark, schedDirs.max)
        val sc = CurveAnalysis.specificCurves(spark, recs, schedule).cache()
        val dc = CurveAnalysis.defaultCurves(spark, recs, schedule).cache()
        try {
          CurveStore.saveSpecific(sc, s"$baseDir/curves/specific")
          CurveStore.saveDefault(dc, s"$baseDir/curves/default")
          println(s"[analyse] specific=${sc.count()} default=${dc.count()} -> $baseDir/curves")

          // ---- predict: one scheduled backfill batch + cleanup ----
          val now = java.time.LocalDate.parse(nowDate).toEpochDay * 86400 + 12 * 3600
          ScheduledPredictions.advance(spark, schedule, source, sc, dc, 0L, now) match {
            case None => println("[predict] buffer full (would back off 20 min)")
            case Some(batch) =>
              val live = Directory.predictionWindowFilter(
                Directory.cleanupOutdatedPredictions(batch.predictions, now), now)
              live.write.mode("overwrite").parquet(s"$baseDir/predictions")
              println(s"[predict] trips=${batch.tripCount} rows=${live.count()} " +
                s"hwm=${batch.newHighWaterMark} -> $baseDir/predictions")
          }
        } finally {
          sc.unpersist(); dc.unpersist()
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse(
      sys.error("usage: ImportCli <baseDir> [source] [nowDate]"))
    val source = if (args.length > 1) args(1) else "graft"
    val nowDate = if (args.length > 2) args(2) else java.time.LocalDate.now().toString

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, baseDir, source, nowDate)
    finally spark.stop()
  }
}
