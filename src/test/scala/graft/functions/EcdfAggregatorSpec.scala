package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.curves.{CPoint, Curves}

class EcdfAggregatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("aggregator output equals Curves.makeCurve on random groups") {
    val rnd = new scala.util.Random(11)
    val rows = for {
      g <- 0 until 8
      _ <- 0 until (25 + rnd.nextInt(200))
    } yield (g, ((rnd.nextInt(500) - 120) / 12 * 12).toFloat)

    val agg = rows.toDF("g", "v")
      .groupBy("g")
      .agg(EcdfAggregator.ecdf(col("v"), minSamples = 20, simplifyEps = 0f).as("curve"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => CPoint(p.getFloat(0), p.getFloat(1))).toArray)
      .toMap

    rows.groupBy(_._1).foreach { case (g, vs) =>
      val expected = Curves.makeCurve(vs.map(_._2), None).map(_._1)
      val got = agg(g)
      expected match {
        case None => assert(got.isEmpty)
        case Some(c) =>
          assert(got.length == c.length, s"group $g point count")
          got.zip(c).foreach { case (a, b) =>
            assert(a.x == b.x && math.abs(a.y - b.y) < 1e-5f,
              s"group $g: $a vs $b")
          }
      }
    }
  }

  test("min-sample gate and degenerate groups yield empty curves") {
    val df = Seq((1, 5f), (1, 5f), (2, 1f), (2, 2f)).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(EcdfAggregator.ecdf(col("v"), minSamples = 3, simplifyEps = 0f).as("curve"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Any](1).length).toMap
    assert(out(1) == 0, "single distinct x -> empty")
    assert(out(2) == 0, "below min samples -> empty")
  }

  test("partial aggregation appears in the plan (map-side combine)") {
    val df = spark.range(1000).select((col("id") % 10).as("g"),
      (col("id") % 37).cast("float").as("v"))
      .groupBy("g")
      .agg(EcdfAggregator.ecdf(col("v"), 1, 0f).as("curve"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"object aggregate expected in:\n$plan")
    // two aggregate operators (partial + final) around the exchange
    val aggCount = "(ObjectHashAggregate|SortAggregate)".r.findAllIn(plan).length
    assert(aggCount >= 2, s"partial+final aggregation expected, got $aggCount")
  }
}
