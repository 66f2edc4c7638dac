package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by packs (graft.queries.*), one entry per
  * implemented operator from SURVEY.md §2 plus the training-data-pipeline
  * operators. `oracleSql` carries DuckDB-runnable equivalents for the
  * driver's correctness gate — as of round 5 every query has one (the
  * non-SQL-expressible recursions ride along as aux dumps; everything
  * around them is re-derived in SQL).
  */
object SparkEntry {
  private val packs: Seq[QueryPack] = Seq(
    RelationalPack,
    ScalarPack,
    GtfsPack,
    PipelinePack,
    MonitorPack
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
