package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in a
  * canonical order and chunked every `budget` tokens; each document lands in
  * the bin where its first token falls, and `straddles` marks docs cut by a
  * bin boundary. This is the standard "concat-and-chunk" packing that turns
  * a filtered corpus into fixed-length training sequences.
  *
  * The global running token offset is a distributed prefix sum — NOT a
  * global-order window (which Spark executes in a single partition, the
  * classic scale trap). Three steps, all bounded: range-partition by the
  * order key (contiguous key ranges land in increasing partition ids),
  * per-partition totals to the driver (#partitions values), and a local
  * cumulative window per partition with the broadcast prefix offset added.
  * Every shuffle carries (id, count) pairs; the window sorts only within
  * partitions. Output is independent of the partition count (asserted in
  * tests), so the sampled range boundaries cannot perturb results.
  */
object Packing {

  /** (doc_id, n_tok, bin, straddles) for concat-and-chunk packing at
    * `budget` tokens per sequence, in ascending `idCol` order. */
  def concatChunkPack(docs: DataFrame, budget: Long,
                      idCol: String = "doc_id", textCol: String = "text",
                      numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism
    val counted = docs
      .select(col(idCol), TextAnalysis.tokenCountCol(col(textCol))
        .cast("long").as("n_tok"))
      .repartitionByRange(p, col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pin partitioning: pid must not be recomputed
    val partTotals = counted.groupBy("pid")
      .agg(sum("n_tok").as("part_sum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (partTotals.isEmpty) -1 else partTotals.keys.max
    val offsets = (0 to maxPid).scanLeft(0L) {
      case (acc, pid) => acc + partTotals.getOrElse(pid, 0L)
    }.toArray // offsets(pid) = tokens in partitions before pid
    import spark.implicits._
    val offsetDf = offsets.take(maxPid + 1).zipWithIndex
      .map { case (off, pid) => (pid, off) }.toSeq.toDF("pid", "pid_offset")
    val w = Window.partitionBy("pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .join(broadcast(offsetDf), Seq("pid"))
      .withColumn("start_tok", col("pid_offset") + sum("n_tok").over(w) - col("n_tok"))
      // integer `div`, not `/`: double division loses exactness past 2^53
      // cumulative tokens and a boundary doc would land in the wrong bin
      // (the oracle's `//` is exact at any scale)
      .withColumn("bin", expr(s"start_tok div CAST($budget AS BIGINT)"))
      .withColumn("straddles",
        col("bin") =!= expr(s"(start_tok + n_tok - 1) div CAST($budget AS BIGINT)"))
      .select(col(idCol), col("n_tok"), col("bin"), col("straddles"))
  }

  /** DuckDB oracle twin of [[concatChunkPack]] (a plain global-order window
    * is fine at oracle scale). */
  def duckDbConcatChunkPackSql(table: String, budget: Long, idCol: String,
                               textCol: String): String = s"""
    WITH t AS (SELECT $idCol, len(${TextAnalysis.duckDbTokensSql(textCol)})::BIGINT AS n_tok
               FROM $table),
    c AS (SELECT $idCol, n_tok,
                 SUM(n_tok) OVER (ORDER BY $idCol ROWS UNBOUNDED PRECEDING) AS cs
          FROM t)
    SELECT $idCol, n_tok,
           ((cs - n_tok) // $budget)::BIGINT AS bin,
           (((cs - n_tok) // $budget) != ((cs - 1) // $budget)) AS straddles
    FROM c ORDER BY $idCol"""
}
