package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries. Each entry in [[queries]] maps
  * a query name to `(spark, sfDir) => DataFrame`; [[oracles]] carries the
  * equivalent DuckDB SQL for the driver's correctness gate (omitted entries
  * get a weaker rows-only check).
  *
  * Contract notes (see the driver prompt):
  *   - column names must match between the DataFrame and the SQL;
  *   - results must be deterministic → every query ends in a total ORDER BY;
  *   - double aggregates are rounded so both engines hash identically;
  *   - raw `events.ts` values never appear in output (parquet stores
  *     nanoseconds; Spark truncates to microseconds, DuckDB does not).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

/** Runs independent one-time builds on parallel threads against the shared
  * session (Spark schedules concurrent jobs from separate threads fine);
  * joins all, then rethrows the first failure so a broken build can't be
  * silently absorbed by a prewarm phase. */
object Par {
  def all(tasks: (String, () => Unit)*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ths = tasks.map { case (name, f) =>
      val t = new Thread(() => try f() catch { case e: Throwable => errs.add(e) },
        s"graft-par-$name")
      t.start(); t
    }
    ths.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }
}

/** Scratch space for the harness's temp sinks and streaming checkpoints:
  * prefer the node's RAM-backed tmpfs when present — the local-mode
  * stand-in for the fast local disks a cluster puts shuffle/checkpoint
  * scratch on (a PRODUCTION streaming checkpoint belongs on durable
  * storage; these are single-JVM bench/verify runs whose checkpoint dies
  * with the process either way, so only the fsync cost differs). Override
  * with SPARK_GRAFT_TMP. */
object Scratch {
  private lazy val base: java.nio.file.Path = {
    val cand = sys.env.get("SPARK_GRAFT_TMP")
      .orElse(Some("/dev/shm").filter(p =>
        java.nio.file.Files.isWritable(java.nio.file.Paths.get(p))))
      .getOrElse(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    java.nio.file.Paths.get(cand)
  }
  def tempDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(base, prefix)
}

object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.LongType

  /** All testdata tables (TESTDATA.md). */
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table. `events.ts` is stored as parquet
    * TIMESTAMP(NANOS), which Spark 4 refuses by default — read it as a
    * nanosecond long and truncate to a microsecond timestamp (the oracle
    * side only ever sees day/hour truncations of it, so the lost sub-µs
    * precision is immaterial).
    *
    * The ANALYZED PLAN is memoized per (session, dir, table): every
    * `spark.read.parquet` call builds a fresh InMemoryFileIndex (a driver
    * file listing) and re-reads the footer schema, and the bench/verify
    * harness calls this hundreds of times per run for the same static
    * inputs. Plan reuse only — nothing is persisted or collected; every
    * action on the returned frame scans parquet from scratch. The inputs
    * are immutable test fixtures, so the pinned file-list snapshot cannot
    * go stale mid-run. */
  private val memo =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]()
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    memo.filterInPlace { case ((sess, _, _), _) => !sess.sparkContext.isStopped }
    memo.getOrElseUpdate((spark, dir, name), {
      if (name == "events")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    })
  }
}
