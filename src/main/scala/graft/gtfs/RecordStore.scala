package graft.gtfs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed persistence for the records table — the co-location layout
  * SCALE.md prescribes for 100 TB: partition directories by
  * `(source, trip_start_date)` for pruning (S6/S7 and the streaming
  * upsert's LWW layout), buckets by `trip_id` so every join
  * keyed on the vehicle — the J3 stop-pair self-join, gap-fill's window,
  * the realtime basis join — reads co-located data and needs NO exchange:
  * `HashPartitioning(trip_id)` satisfies any clustering on a superset of
  * the vehicle key. Bucketed tables need the session catalog
  * (`saveAsTable`); plain directory-parquet writers cannot record bucket
  * metadata. */
object RecordStore {

  def saveBucketed(records: DataFrame, table: String, buckets: Int = 32): Unit =
    records.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, "trip_id")
      .sortBy("trip_id", "stop_sequence")
      .saveAsTable(table)

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
