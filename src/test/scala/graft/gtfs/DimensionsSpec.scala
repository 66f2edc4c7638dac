package graft.gtfs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the three faces of each dimension vocabulary to one another:
  * pure Scala (driver/tests) ≡ Column expression (pipelines); the DuckDB SQL
  * face is pinned by the x6/x7 oracle queries in the driver gate. */
class DimensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("TimeSlots: slotIdCol equals pure classify over a full week of hours") {
    // every (weekday, hour) combination, via a fixed week (2024-01-01 is Monday)
    val stamps = for {
      day <- 0 until 7
      hour <- 0 until 24
    } yield (day, hour, f"2024-01-0${day + 1}%d $hour%02d:30:00")
    val got = stamps.toDF("wd", "h", "ts")
      .select(col("wd"), col("h"),
        TimeSlots.slotIdCol(to_timestamp(col("ts"))).as("slot"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    stamps.foreach { case (wd, h, _) =>
      assert(got((wd, h)) == TimeSlots.classify(wd, h),
        s"weekday=$wd hour=$h")
    }
    // every hour of the week is covered by exactly one of the 11 slots
    stamps.foreach { case (wd, h, _) =>
      val matches = TimeSlots.All.count(s => TimeSlots.matches(s, wd, h))
      assert(matches == 1, s"weekday=$wd hour=$h matched $matches slots")
    }
  }

  test("RouteSections: sectionCol equals pure classify across trip lengths") {
    val cases = for {
      n <- Seq(1, 2, 3, 6, 14, 15, 16, 30)
      i <- 0 until n
    } yield (i, n)
    val got = cases.toDF("idx", "cnt")
      .select(col("idx"), col("cnt"),
        RouteSections.sectionCol(col("idx"), col("cnt")).as("sec"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getString(2)).toMap
    cases.foreach { case (i, n) =>
      assert(got((i, n)) == RouteSections.classify(i, n), s"idx=$i n=$n")
    }
  }

  test("GtfsTime: parse round-trips >24h values; dateAndTime spans midnight") {
    assert(GtfsTime.parseGtfsTime("08:30:15").contains(8 * 3600 + 30 * 60 + 15))
    assert(GtfsTime.parseGtfsTime("25:10:00").contains(25 * 3600 + 600))
    val df = Seq(("2024-03-10", 25 * 3600)).toDF("d", "secs")
      .select(GtfsTime.dateAndTime(to_date(col("d")), col("secs")).as("ts"))
    // 25:00 on Mar 10 = 01:00 on Mar 11 (UTC session; noon-anchored formula)
    assert(df.head().getAs[java.sql.Timestamp]("ts").toInstant.toString
      == "2024-03-11T01:00:00Z")
  }
}
