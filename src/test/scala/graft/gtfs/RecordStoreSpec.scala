package graft.gtfs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the bucketed records layout eliminates the shuffle under the J3
  * stop-pair self-join — the co-location claim in SCALE.md, checked against
  * the actual physical plan. */
class RecordStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val (schedDir, rtDir) = GtfsFixtures.create()
  lazy val schedule: GtfsSchedule = GtfsSchedule.load(spark, schedDir)
  lazy val records = Importer.importDirectory(spark, rtDir, schedule, "test")

  test("bucketed self-join on the vehicle key plans with zero exchanges") {
    // the suite shares one JVM-wide session (getOrCreate), so this spec's
    // warehouse conf may be ignored and a managed-table location from a
    // previous run can linger on disk — clear catalog entry AND location
    spark.sql("DROP TABLE IF EXISTS records_bucketed")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del)
      f.delete(); ()
    }
    del(new java.io.File(wh, "records_bucketed"))
    RecordStore.saveBucketed(records, "records_bucketed", buckets = 8)
    val stored = RecordStore.load(spark, "records_bucketed")
    assert(stored.count() == records.count(), "bucketed round-trip keeps rows")

    // J3 shape: self-join on the vehicle key (superset of the bucket key)
    val vehicleKey = Seq("trip_id", "trip_start_date", "trip_start_time")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false") // stable plan text
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // buckets cover trip_id, a subset of the 3-column vehicle key: subset
      // co-partitioning is semantically sound (equal vehicle keys ⇒ equal
      // trip_id ⇒ same bucket) but gated by this flag since Spark 3.3
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      val joined = stored.as("a").join(stored.as("b"), vehicleKey)
        .filter(col("b.stop_sequence") > col("a.stop_sequence"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket co-location must eliminate the shuffle:\n$plan")
      assert(joined.count() > 0, "join still produces pairs")

      // the unbucketed baseline DOES shuffle — the comparison that makes
      // the zero-exchange assertion meaningful
      val flat = records
      val flatPlan = flat.as("a").join(flat.as("b"), vehicleKey)
        .filter(col("b.stop_sequence") > col("a.stop_sequence"))
        .queryExecution.executedPlan.toString
      assert(flatPlan.contains("Exchange"), "unbucketed baseline shuffles")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
    }
  }
}
