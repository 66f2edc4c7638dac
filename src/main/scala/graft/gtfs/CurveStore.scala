package graft.gtfs

import org.apache.spark.sql.{Dataset, SparkSession}

/** S16/S17: persistence of the statistics tables. The reference serializes a
  * nested MessagePack tree, optionally sharded into a directory per route
  * (delay_statistics.rs:29-45, types.md:19-27); the Spark-native analogue is
  * parquet partitioned by route_id / route_type — the partition directories
  * ARE the shard layout, and partition pruning replaces the tree descent. */
object CurveStore {

  def saveSpecific(curves: Dataset[SpecificCurveRow], dir: String): Unit =
    curves.write.mode("overwrite").partitionBy("route_id").parquet(dir)

  def saveDefault(curves: Dataset[DefaultCurveRow], dir: String): Unit =
    curves.write.mode("overwrite").partitionBy("route_type").parquet(dir)

  /** A store table with no data files — a young feed whose min-sample gates
    * (F9) passed nothing yet, or a just-overwritten-empty re-analysis —
    * means "no curves of this kind", never a dead reader: save* with zero
    * rows leaves only `_SUCCESS` under the partitioned root, and a bare
    * spark.read.parquet on that throws UNABLE_TO_INFER_SCHEMA (which would
    * kill the streaming refresh loop mid-trigger). The reference returns an
    * empty statistics tree for a missing file (main.rs:321-340). */
  def loadSpecific(spark: SparkSession, dir: String): Dataset[SpecificCurveRow] = {
    import spark.implicits._
    if (!Directory.tableHasData(spark, dir)) spark.emptyDataset[SpecificCurveRow]
    else spark.read.parquet(dir)
      .select("route_id", "route_variant", "event_type", "time_slot_id",
        "start_stop_index", "end_stop_index", "curve_kind", "focus_delay",
        "curve", "precision_type", "sample_size")
      .as[SpecificCurveRow]
  }

  def loadDefault(spark: SparkSession, dir: String): Dataset[DefaultCurveRow] = {
    import spark.implicits._
    if (!Directory.tableHasData(spark, dir)) spark.emptyDataset[DefaultCurveRow]
    else spark.read.parquet(dir)
      .select("route_type", "route_section", "time_slot_id", "event_type",
        "curve", "precision_type", "sample_size")
      .as[DefaultCurveRow]
  }

  /** SO3: merged statistics = specific ⊎ default — two independent tables
    * loaded side by side (src/main.rs:295-318); the Predictor consumes both.
    * Collects to driver maps, gated by [[Predictor.MaxDriverRows]] — beyond
    * that, use the broadcast-join form ([[Predictor.batchPredict]]). */
  def loadMerged(spark: SparkSession, specificDir: String, defaultDir: String,
                 maxRows: Long = Predictor.MaxDriverRows): Predictor =
    new Predictor(
      Predictor.guarded(loadSpecific(spark, specificDir).collect(),
        "specific_curves", maxRows),
      Predictor.guarded(loadDefault(spark, defaultDir).collect(),
        "default_curves", maxRows))
}
