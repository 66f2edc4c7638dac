package graft.gtfs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Second-PROCESS writer for [[LwwCrossProcessSpec]]: its own JVM attempting
  * a `compact` against a table whose lease another process holds — the
  * fail-fast half of the single-writer contract (VERDICT r13 #1), which an
  * in-JVM test cannot prove (the held-lease registry is process-local, so
  * only a genuinely separate process exercises the foreign-lease path).
  *
  * Modes: `compact` attempts the fold bare (expected to be REFUSED while
  * the first process's lease is live); `takeover` acquires the lease first
  * (expected to succeed once the first lease has expired), folds, and
  * releases. Writes `OK <n>` / `REFUSED <msg>` / `FAIL <msg>` to the
  * result file; exit 0 unless the run itself broke. */
object CompactProbeMain {
  def main(args: Array[String]): Unit = {
    val Array(tableDir, ctlDir, mode) = args
    val keyCols = Seq("source", "trip_id", "trip_start_date")
    def write(text: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(ctlDir, s"result-$mode"),
        text.getBytes("UTF-8"))
    var spark: SparkSession = null
    try {
      spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      mode match {
        case "compact" =>
          try {
            val n = LwwTable.compact(spark, tableDir, keyCols, col("seq"),
              graceMs = 600000L)
            write(s"OK $n")
          } catch {
            case e: IllegalStateException
                if e.getMessage.contains("another writer process holds the lease") =>
              write(s"REFUSED ${e.getMessage}")
          }
        case "takeover" =>
          val lease = WriterLease.acquire(spark, tableDir)
          try {
            val n = LwwTable.compact(spark, tableDir, keyCols, col("seq"),
              graceMs = 600000L)
            write(s"OK $n")
          } finally lease.release()
        case "acquire-exit" =>
          // acquire and exit WITHOUT releasing: the graceful-death path —
          // the JVM shutdown hook must free the lease so a replacement
          // writer starts instantly (WriterLease class doc: restart
          // latency)
          val lease = WriterLease.acquire(spark, tableDir)
          write(s"OK ${lease.ownerId}")
        case m if m.startsWith("compact-race") =>
          // AD-HOC writer vs ad-hoc writer (VERDICT r14 #1): a bare compact
          // on an UN-leased table must acquire an ephemeral lease. The
          // winner parks inside the fold (test seam) until the spec's `go`
          // marker, so the other racer provably attempts its fold while the
          // first is mid-fold — and must be refused, not interleaved.
          WriterLease.ephemeralHoldHook = _ => {
            java.nio.file.Files.write(
              java.nio.file.Paths.get(ctlDir, s"infold-$m"), "1".getBytes("UTF-8"))
            val dl = System.nanoTime() + 120L * 1000000000L
            while (!java.nio.file.Files.exists(
                java.nio.file.Paths.get(ctlDir, "go")) && System.nanoTime() < dl)
              Thread.sleep(50)
          }
          try {
            val n = LwwTable.compact(spark, tableDir, keyCols, col("seq"),
              graceMs = 600000L)
            write(s"OK $n")
          } catch {
            case e: IllegalStateException
                if e.getMessage.contains("another writer process holds the lease")
                  || e.getMessage.contains("raced and lost") =>
              write(s"REFUSED ${e.getMessage}")
          }
        case m if m.startsWith("compact-loop") =>
          // ad-hoc maintenance STORM participant: loop bare compacts (each
          // taking the ephemeral lease) until the spec's stop marker,
          // counting folds vs collisions. Any error other than the named
          // refusal/raced-lost is a protocol failure and fails the probe.
          java.nio.file.Files.write(
            java.nio.file.Paths.get(ctlDir, s"ready-$m"), "1".getBytes("UTF-8"))
          var oks = 0L
          var refused = 0L
          val dl = System.nanoTime() + 120L * 1000000000L
          while (!java.nio.file.Files.exists(
              java.nio.file.Paths.get(ctlDir, "stop-loop"))
              && System.nanoTime() < dl) {
            try {
              LwwTable.compact(spark, tableDir, keyCols, col("seq"),
                graceMs = 600000L)
              oks += 1
            } catch {
              case e: IllegalStateException
                  if e.getMessage.contains("another writer process holds the lease")
                    || e.getMessage.contains("raced and lost") =>
                refused += 1
            }
            Thread.sleep(25)
          }
          write(s"OK $oks $refused")
        case m if m.startsWith("acquire-race") =>
          // two replacement writers observing the SAME expired lease: the
          // takeover must be single-winner (claim by atomic rename). Both
          // racers park on a barrier after session startup so the acquires
          // genuinely overlap; the winner then HOLDS until the spec has
          // read both results, so a slow loser can never acquire after an
          // early release.
          java.nio.file.Files.write(
            java.nio.file.Paths.get(ctlDir, s"ready-$m"), "1".getBytes("UTF-8"))
          val dl = System.nanoTime() + 120L * 1000000000L
          while (!java.nio.file.Files.exists(
              java.nio.file.Paths.get(ctlDir, "go-acquire")) && System.nanoTime() < dl)
            Thread.sleep(5)
          try {
            val lease = WriterLease.acquire(spark, tableDir)
            write(s"OK ${lease.ownerId}")
            val dl2 = System.nanoTime() + 120L * 1000000000L
            while (!java.nio.file.Files.exists(
                java.nio.file.Paths.get(ctlDir, "release-acquire"))
                && System.nanoTime() < dl2)
              Thread.sleep(50)
            lease.release()
          } catch {
            case e: IllegalStateException =>
              write(s"REFUSED ${e.getMessage}")
          }
      }
    } catch {
      case e: Throwable =>
        val sw = new java.io.StringWriter()
        e.printStackTrace(new java.io.PrintWriter(sw))
        write(s"FAIL ${e.getClass.getName}: ${e.getMessage}\n$sw")
        if (spark != null) spark.stop()
        sys.exit(1)
    }
    spark.stop()
    sys.exit(0)
  }
}
