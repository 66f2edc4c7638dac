package graft.gtfs

import java.nio.file.Files

/** Test access to the deterministic GTFS fixtures (generator lives in main
  * as [[FixtureGen]] so the driver-facing GtfsPack can use it too). */
object GtfsFixtures {
  def delay(day: Int, stop: Int): Int = FixtureGen.delay(day, stop)

  /** Writes schedule + rt dirs under a fresh temp root; returns (scheduleDir, rtDir). */
  def create(): (String, String) = {
    val root = Files.createTempDirectory("gtfs_fixture")
    val sched = root.resolve("schedule"); Files.createDirectories(sched)
    val rt = root.resolve("rt"); Files.createDirectories(rt)
    FixtureGen.writeSchedule(sched)
    FixtureGen.writeRtFiles(rt)
    (sched.toString, rt.toString)
  }
}
