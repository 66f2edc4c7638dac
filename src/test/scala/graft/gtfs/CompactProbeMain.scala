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
