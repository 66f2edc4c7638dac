package graft

import org.apache.spark.sql.SparkSession

/** Times individual declared queries in isolation with the Bench session
  * shape and methodology (count() action, min over passes after a warm
  * pass). For optimization-round A/B work where the full 85-query bench is
  * too coarse. Run: `sbt "runMain graft.TimeQ <name> [name...]"`. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_TIMEQ_PASSES", "3").toInt
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    args.foreach { n =>
      val fn = SparkEntry.queries(n)
      val warm = {
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // driver-side share: analysis+optimization+physical planning alone
      // (no job) — tells plan-depth overhead apart from execution
      val planTimes = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.executedPlan
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] $n%-35s warm=$warm%8.3f min=${times.min}%8.3f " +
        f"planMin=${planTimes.min}%6.3f " +
        times.map(t => f"$t%.3f").mkString("passes=[", ", ", "]"))
      // optional planMin decomposition: DataFrame CONSTRUCTION (eager
      // per-op analysis while the query builds) vs the final plan's
      // optimize + physical-planning phases (SPARK_GRAFT_TIMEQ_PHASES=1)
      if (sys.env.get("SPARK_GRAFT_TIMEQ_PHASES").contains("1")) {
        val t0 = System.nanoTime(); val df = fn(spark, sfDir)
        val t1 = System.nanoTime(); df.queryExecution.optimizedPlan
        val t2 = System.nanoTime(); df.queryExecution.executedPlan
        val t3 = System.nanoTime()
        println(f"[timeq]   phases construct=${(t1 - t0) / 1e9}%.3f " +
          f"optimize=${(t2 - t1) / 1e9}%.3f physical=${(t3 - t2) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
