package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.gtfs._

class StreamingImportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val (schedDir, rtDir) = GtfsFixtures.create()
  lazy val schedule: GtfsSchedule = GtfsSchedule.load(spark, schedDir)

  test("streaming ingest over the rt directory equals the batch import") {
    val recordsDir = Files.createTempDirectory("records_stream").toString + "/records"
    val ckpt = Files.createTempDirectory("ckpt").toString
    val q = StreamingImport.start(spark, rtDir, schedule, "test",
      recordsDir, ckpt, automatic = false)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(recordsDir)
    val batch = Importer.importDirectory(spark, rtDir, schedule, "test")
    assert(streamed.count() == batch.count(),
      "streamed upsert result equals batch import")
    // last-writer-wins held across micro-batches
    val d0 = streamed
      .filter("trip_start_date = '2024-01-01' AND stop_sequence = 10")
      .select("delay_arrival").head()
    assert(d0.getInt(0) == 444)
  }

  test("stateful basis dedup emits one request per changed basis") {
    import spark.implicits._
    // two micro-batches via MemoryStream: same vehicle, same basis twice,
    // then a new basis
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RtRow]
    val schedule = this.schedule
    val recs = StreamingImport.recordsStream(spark,
      mem.toDS(), schedule, "test")
    val requests = StreamingImport.predictionRequests(spark, recs,
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = requests.writeStream
      .format("memory").queryName("pred_requests")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

    def rt(seq: Int, delay: Int, rec: Long): RtRow =
      RtRow("f.pb", rec, "T1", Some("R1"), Some("20240110"), Some("08:00:00"),
        Some(seq), Some(s"S${seq / 10}"), Some(delay), Some(delay))

    mem.addData(rt(20, 60, 1000L))
    q.processAllAvailable()
    mem.addData(rt(20, 60, 2000L)) // unchanged basis → suppressed
    q.processAllAvailable()
    mem.addData(rt(30, 120, 3000L)) // new basis → emitted
    q.processAllAvailable()
    q.stop()

    val out = spark.table("pred_requests")
      .select("basis_stop_sequence", "basis_delay_departure").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(out == Seq((20, 60), (30, 120)),
      s"one request per distinct basis, got $out")
  }
}
