package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints the formatted physical plan of selected queries and
  * greps it for the scale-critical properties (parquet filter pushdown,
  * pruned ReadSchema, broadcast joins on dimension tables, whole-stage
  * codegen coverage). Run: `sbt "runMain graft.Explain [sfDir]"`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // audit-only: AQE wraps the plan in an unfinalized AdaptiveSparkPlan,
      // which hides codegen annotations until execution
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val audit = Seq("q1_agg", "f1_range_filter", "j1_broadcast_join",
      "j3_pair_join", "j7_geo_join", "w2_last_writer", "ann_brute_topk",
      "dedup_exact", "text_stats", "a8_curve_average", "dedup_lsh_vs_exact",
      "ann_lsh_recall", "gtfs_visual_schedule", "gtfs_file_stats",
      "monitor_trip_page", "ann_ivf_topk", "gtfs_predictions_realtime",
      "dedup_embedding", "sample_split", "text_vocab", "text_bigrams",
      "text_common_ratio", "corpus_report", "pipeline_curate",
      // round-5 reshaped queries: rebanded SimHash, un-hinted MinHash,
      // memoized curate→pack, exploded curve tables, real-codec resize
      "dedup_simhash", "dedup_minhash_lsh", "pipeline_curate_pack",
      "gtfs_specific_curves", "gtfs_default_curves", "mm_resize",
      // round-12 additions: substring-level dedup + its strip pass
      "dedup_substring", "dedup_substring_strip")

    audit.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"\n===== $name =====")
      println(plan)
      val codegenSpans = "codegen id : (\\d+)".r.findAllMatchIn(plan)
        .map(_.group(1).toInt).toSet.size
      val checks = Seq(
        "PushedFilters" -> plan.contains("PushedFilters: ["),
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        s"CodegenSpans=$codegenSpans" -> (codegenSpans > 0))
      println(s"--- summary[$name]: " + checks.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
