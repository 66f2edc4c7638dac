package graft.gtfs

import java.nio.file.{Files, Path}
import java.time.LocalDate

/** Deterministic GTFS-shaped fixtures (FIXTURES.md §1-2): the reference ships
  * no test data (SURVEY.md §5), so the suite generates its own — 2 routes of
  * different types, 2 variants of one route (one a sub-sequence), a >15-stop
  * trip, a past-midnight departure, plus GTFS-RT .pb files covering the
  * error paths (unknown trip, missing stop, absent delay, outliers,
  * duplicate updates with newer recording time).
  */
object FixtureGen {
  import GtfsRtCodec._

  val StartDate: LocalDate = LocalDate.of(2024, 1, 1) // a Monday
  val Days = 60

  /** Deterministic pseudo-delay in seconds, varied but bounded. */
  def delay(day: Int, stop: Int): Int = 24 + ((day * 7 + stop * 13) % 25) * 12

  /** `version` 2 models a realistic GTFS re-publication: every T1 time
    * shifts +60 s and the duplicate trip T1b is RENAMED to T1b2 — the
    * changed-trip_id case the reference's stale-schedule delete exists for
    * ("changed trip_ids would show up as duplicate trips in the monitor",
    * scheduled_predictions_importer.rs:234-237). */
  def writeSchedule(dir: Path, version: Int = 1): Unit = {
    def w(name: String, lines: Seq[String]): Unit =
      Files.write(dir.resolve(name), String.join("\n", lines: _*).getBytes("UTF-8"))
    val shift = if (version >= 2) 60 else 0
    val t1bId = if (version >= 2) "T1b2" else "T1b"

    w("agency.txt", Seq("agency_id,agency_name", "AG1,Test Agency"))
    w("stops.txt", "stop_id,stop_name,stop_lat,stop_lon" +:
      (1 to 20).map(i => f"S$i%d,Stop $i%d,${50.0 + i * 0.002}%.4f,${8.0 + i * 0.003}%.4f"))
    w("routes.txt", Seq("route_id,agency_id,route_short_name,route_type",
      "R1,AG1,10,3", "R2,AG1,RE5,2"))
    // T1/T1b: same 6-stop variant of R1 (T1b is a duplicate trip of the same
    // variant); T1sub: 4-stop sub-sequence variant; T2: 16-stop rail trip
    // (exercises min(5, n/3)=5); T3: crosses midnight.
    w("trips.txt", Seq("trip_id,route_id,service_id,trip_headsign",
      "T1,R1,WD,Downtown", s"$t1bId,R1,WD,Downtown", "T1sub,R1,WD,Midtown",
      "T2,R2,WD,Central", "T3,R1,WD,NightOwl"))
    val t1Stops = (1 to 6).map { i =>
      val arr = 8 * 3600 + (i - 1) * 300 + shift
      s"T1,${i * 10},S$i,${fmt(arr)},${fmt(arr + 30)}"
    }
    val t1bStops = (1 to 6).map { i =>
      val arr = 9 * 3600 + (i - 1) * 300 + shift
      s"$t1bId,${i * 10},S$i,${fmt(arr)},${fmt(arr + 30)}"
    }
    val t1subStops = (2 to 5).map { i =>
      val arr = 10 * 3600 + (i - 2) * 300
      s"T1sub,${i * 10},S$i,${fmt(arr)},${fmt(arr + 30)}"
    }
    val t2Stops = (1 to 16).map { i =>
      val arr = 7 * 3600 + (i - 1) * 600
      s"T2,$i,S${math.min(i, 20)},${fmt(arr)},${fmt(arr + 60)}"
    }
    val t3Stops = (1 to 4).map { i =>
      val arr = 23 * 3600 + 1800 + (i - 1) * 1200 // 23:30 .. 24:30+
      s"T3,$i,S$i,${fmt(arr)},${fmt(arr + 30)}"
    }
    w("stop_times.txt", "trip_id,stop_sequence,stop_id,arrival_time,departure_time" +:
      (t1Stops ++ t1bStops ++ t1subStops ++ t2Stops ++ t3Stops))
    w("calendar.txt", Seq(
      "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date",
      "WD,1,1,1,1,1,1,1,20240101,20241231"))
  }

  private def fmt(secs: Int): String =
    f"${secs / 3600}%02d:${(secs % 3600) / 60}%02d:${secs % 60}%02d"

  /** One .pb file per service day with updates for T1 (stops 3 and 5 omitted
    * → gap-fill targets), plus error-path entities on day 0. */
  def writeRtFiles(dir: Path): Unit = {
    for (d <- 0 until Days) {
      val date = StartDate.plusDays(d)
      val dateStr = date.toString.replace("-", "")
      val recordingTs = date.toEpochDay * 86400L + 9 * 3600
      val updates = Seq(
        TripUpdate(
          TripDescriptor(Some("T1"), Some("R1"), Some("08:00:00"), Some(dateStr)),
          (1 to 6).filterNot(i => i == 3 || i == 5).map { i =>
            StopTimeUpdate(Some(i * 10), Some(s"S$i"),
              arrival = Some(StopTimeEvent(Some(delay(d, i)), None)),
              departure = if (i == 6) None // last stop: no departure event
                else Some(StopTimeEvent(Some(delay(d, i) + 12), None)))
          })) ++
        (if (d == 0) Seq(
          // unknown trip (J1 miss), unknown stop_sequence (J2 miss),
          // delay-less update (F4), outlier delay (survives records, dropped by F2)
          TripUpdate(TripDescriptor(Some("GHOST"), Some("R9"), Some("08:00:00"), Some(dateStr)),
            Seq(StopTimeUpdate(Some(10), Some("S1"),
              Some(StopTimeEvent(Some(60), None)), None))),
          TripUpdate(TripDescriptor(Some("T1"), Some("R1"), Some("08:00:00"), Some(dateStr)),
            Seq(
              StopTimeUpdate(Some(999), Some("S9"),
                Some(StopTimeEvent(Some(60), None)), None),
              StopTimeUpdate(Some(20), Some("S2"), None, None),
              StopTimeUpdate(Some(30), Some("S3"), // stop not in regular updates
                Some(StopTimeEvent(Some(5000), None)), None)))) // outlier
         else Nil)
      val msg = FeedMessage(Some(recordingTs), updates)
      Files.write(dir.resolve(s"$date-feed.pb"), GtfsRtCodec.encode(msg))
      if (d == 0) {
        // second, newer file for day 0: last-writer-wins target on stop 1
        val newer = FeedMessage(Some(recordingTs + 600), Seq(
          TripUpdate(TripDescriptor(Some("T1"), Some("R1"), Some("08:00:00"), Some(dateStr)),
            Seq(StopTimeUpdate(Some(10), Some("S1"),
              Some(StopTimeEvent(Some(444), None)),
              Some(StopTimeEvent(Some(456), None)))))))
        Files.write(dir.resolve(s"$date-feed2.pb"), GtfsRtCodec.encode(newer))
      }
    }
  }
}
