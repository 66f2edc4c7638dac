package graft

import org.apache.spark.sql.SparkSession

/** The ONE definition of the engine's session shape (VERDICT r16 #6): every
  * entry point — production (ImportCli) and harness (Bench, Verify, TimeQ,
  * ExplainAll, StreamProbe) — builds its session here, so production
  * executes the plans the bench times and a conf added for the engine's
  * benefit cannot silently stay harness-only.
  *
  * Worker count comes from `$SPARK_GRAFT_CPUS` (driver contract: the bench
  * is re-run at a lower core count to measure scaling, so the master must
  * never be hard-coded); `defaultCpus` is each entry point's historical
  * fallback when the env var is absent.
  */
object GraftSession {

  def cpus(defaultCpus: String): String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)

  def builder(defaultCpus: String): SparkSession.Builder = {
    val c = cpus(defaultCpus)
    SparkSession.builder()
      .master(s"local[$c]")
      // local default: one shuffle partition per core. At production scale
      // this is cluster-sized by the deployment (AQE coalescing keeps small
      // stages narrow either way); the bench contract needs it to track the
      // worker count so 8-core and 32-core runs are comparable.
      .config("spark.sql.shuffle.partitions", c)
      .config("spark.sql.session.timeZone", "UTC")
      // runtime-gated SMJ→SHJ upgrade (guide §3.1): AQE rewrites a
      // sort-merge join to shuffled-hash only when every post-shuffle
      // partition MEASURES below this bound, so small runs skip the sort
      // while at scale (partitions >64 MB) the join stays sort-merge —
      // scale-neutral by construction, unlike a static SHUFFLE_HASH hint
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64MB")
      // file-listing parallelism cutoff (guide §6 driver-side listing): the
      // default (32 paths) launches a Spark JOB to list the rt tree's ~60
      // date directories — 130-200 ms of task overhead per streaming batch
      // for a listing the driver does in ~1 ms on a filesystem this size.
      // Trees past 128 paths (real partitioned tables at scale) still list
      // distributed; deployments on slow object stores override downward.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "128")
      .config("spark.ui.enabled", "false")
  }
}
