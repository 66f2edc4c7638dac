package graft.gtfs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Second-PROCESS reader for [[LwwCrossProcessSpec]]: its own JVM, its own
  * SparkSession, bare `LwwTable.read`/`readRaw` against a table another
  * process is actively folding — the external-reader half of the class
  * doc's multi-process contract, which the in-JVM stress spec cannot
  * exercise. Writes `started` when its first read succeeds, loops until
  * the `stop` marker appears, then writes `OK <reads>` (or the failure) to
  * the result file; exit code 0 only on a fully clean run. */
object ReadProbeMain {
  def main(args: Array[String]): Unit = {
    val Array(tableDir, ctlDir) = args
    val keyCols = Seq("source", "trip_id", "trip_start_date")
    var spark: SparkSession = null
    def write(name: String, text: String): Unit = {
      val p = java.nio.file.Paths.get(ctlDir, name)
      java.nio.file.Files.write(p, text.getBytes("UTF-8"))
    }
    try {
      spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      var reads = 0L
      def once(): Unit = {
        val resolved = LwwTable.read(spark, tableDir, keyCols, col("seq"))
        require(resolved.count() > 0, "resolved view empty")
        val m = LwwTable.readRaw(spark, tableDir)
          .agg(max(col("seq"))).head().getLong(0)
        require(m > 0, s"raw max seq $m")
        reads += 1
      }
      once()
      write("started", "1")
      val stop = java.nio.file.Paths.get(ctlDir, "stop")
      val deadline = System.nanoTime() + 180L * 1000000000L
      while (!java.nio.file.Files.exists(stop)
          && System.nanoTime() < deadline) once()
      write("result", s"OK $reads")
    } catch {
      case e: Throwable =>
        val sw = new java.io.StringWriter()
        e.printStackTrace(new java.io.PrintWriter(sw))
        write("result", s"FAIL ${e.getClass.getName}: ${e.getMessage}\n$sw")
        if (spark != null) spark.stop()
        sys.exit(1)
    }
    spark.stop()
    sys.exit(0)
  }
}
