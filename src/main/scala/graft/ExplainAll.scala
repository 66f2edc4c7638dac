package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for every declared query to one file per
  * query under an output directory — the optimization-round evidence trail
  * (plans/r16/<name>_before.txt / _after.txt). Unlike [[Explain]] this
  * builds the REAL bench session shape (same master/shuffle width as Bench,
  * AQE left ON but plans printed pre-execution) so Exchange counts and join
  * strategies match what the bench actually runs.
  *
  * Run: `sbt "runMain graft.ExplainAll <sfDir> <outDir> [suffix] [names...]"`
  * Names default to every SparkEntry query. Queries that materialize on the
  * driver (streaming harness queries) surface as LogicalRDD scans — noted in
  * the dump header.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "plans/r16"
    val suffix = if (args.length > 2) args(2) else "before"
    val names = if (args.length > 3) args.drop(3).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val exchanges = "Exchange".r.findAllIn(plan).size
        val header = s"== $name ($suffix) ==\n" +
          s"# Exchange nodes: $exchanges\n" +
          s"# joins: " + Seq("BroadcastHashJoin", "SortMergeJoin",
            "ShuffledHashJoin", "BroadcastNestedLoopJoin")
            .map(j => s"$j=${j.r.findAllIn(plan).size}").mkString(" ") + "\n\n"
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), header + plan)
        println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
