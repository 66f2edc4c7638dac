package graft.gtfs

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Enforcement of the LWW table's single-WRITER contract (VERDICT r13 #1).
  *
  * The class doc of [[LwwTable]] promises "one writer process owns a live
  * table's folds/merges" — the in-process write gate serializes them, but
  * nothing used to serialize a SECOND writer process: a mis-deployed
  * duplicate of `import automatic`, or an operator running a manual
  * `compact` beside a live stream, would interleave folds — two merges
  * could pin overlapping file sets and retire each other's merged output,
  * silently losing rows. The reference tolerates concurrent writer
  * PROCESSES for free because MySQL transactions serialize them (the
  * deadlock-1213 retry in batched_statements.rs:72-84 exists precisely
  * because a second connection may hold row locks); a file-based table has
  * to construct the fail-fast equivalent.
  *
  * Mechanism — a lock file at the ONE well-known path
  * `<table>/_gc/writer.lease` (content = ownerId + ttlMs, mtime = the
  * heartbeat), on the same filesystem assumptions the fold already
  * documents:
  *
  *  - [[WriterLease.acquire]] refuses while a LIVE foreign lease exists
  *    (mtime younger than the lease's own ttl) — named error; an EXPIRED
  *    lease (a crashed writer) is deleted and taken over; a live lease
  *    registered to THIS process (restart without release) is adopted.
  *    The create uses `fs.create(…, overwrite = false)` — atomic on HDFS
  *    and friends (the namenode arbitrates), check-then-act on the local
  *    FS — followed by a READ-BACK: with one fixed path, concurrent
  *    winners-by-race all read the SAME final content, so exactly the one
  *    whose ownerId survived proceeds and every other acquirer fails with
  *    the named error. At most one winner on either filesystem.
  *  - [[WriterLease.renew]] is the heartbeat: verifies the file still
  *    carries OUR ownerId (a takeover replaced it ⇒ named stop error —
  *    continuing to fold would be the very interleaving the lease
  *    prevents) and bumps the mtime. Owning processes renew at their loop
  *    cadence, far below the ttl (default 10 min vs a 5 s idle poll).
  *  - every DESTRUCTIVE table entry point ([[LwwTable.compact]],
  *    [[LwwTable.mergeDelta]], [[LwwTable.replacePartitions]], the
  *    oversized backstop past its early returns) asserts via
  *    [[WriterLease.assertWriter]]: a LIVE lease owned by another process
  *    fails fast with a named error; no lease at all passes (un-leased
  *    tables — single-process deployments, tests, offline maintenance —
  *    keep today's semantics). O(batch) appends stay un-asserted: they
  *    are additive (never pin or retire files), and the hot path must not
  *    pay a listing per trigger.
  *
  * The lease lives under `_gc/` (hidden from Spark's directory reads,
  * beside the retirement manifests) and is ignored by manifest parsing
  * and GC (neither a `retire-` nor a `.tmp-` name).
  *
  * RESTART LATENCY: a writer that dies GRACEFULLY (stop(), SIGTERM,
  * normal exit — a JVM shutdown hook releases every live handle) frees
  * the lease instantly; a hard kill (-9) or power loss leaves it to
  * expire, so the replacement waits up to the ttl before takeover — the
  * Iceberg/Delta lock-expiry tradeoff. Size the ttl between the longest
  * writer stall you tolerate heartbeat-free (the loop renews every poll,
  * but a base fold can hold it for its 30–40 s worst case) and the
  * restart latency you accept after a hard kill; [[DefaultTtlMs]] sits
  * at 10 min, an order of magnitude above the worst measured stall.
  */
final class WriterLease private[gtfs] (spark: SparkSession,
    val tableDir: String, val ownerId: String, val ttlMs: Long) {

  private def fs: FileSystem =
    new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Heartbeat: verifies ownership and bumps the lease mtime. Fails with a
    * named error when the lease is gone or re-owned — the owner outlived
    * its ttl without renewing and another writer took over; this writer
    * must STOP (restart to re-acquire), not limp on. */
  def renew(): Unit = {
    val f = fs
    val current = WriterLease.readLease(f, tableDir)
    if (!current.exists(_.ownerId == ownerId))
      throw new IllegalStateException(
        s"LWW table $tableDir: writer lease $ownerId expired and was taken" +
          " over (renew came later than the ttl) — this writer must stop;" +
          " restart it to re-acquire")
    f.setTimes(WriterLease.leasePath(tableDir), System.currentTimeMillis(), -1)
  }

  /** Releases the lease (idempotent; a lease already taken over is left to
    * its new owner). */
  def release(): Unit = {
    try {
      val f = fs
      if (WriterLease.readLease(f, tableDir).exists(_.ownerId == ownerId))
        f.delete(WriterLease.leasePath(tableDir), false)
    } catch { case scala.util.control.NonFatal(_) => () }
    WriterLease.held.remove(WriterLease.rootKey(fs, tableDir), ownerId)
    WriterLease.deregister(this)
  }
}

object WriterLease {

  /** Default lease ttl: far above any writer loop cadence (the automatic
    * mode renews per idle iteration, seconds apart), far below an
    * operator's patience for a crashed writer's takeover. */
  val DefaultTtlMs: Long = 600000L

  /** The lease file's name under `<table>/_gc/`. ONE fixed name per table:
    * mutual exclusion needs a single rendezvous path — per-owner names
    * would let two concurrent takeovers each create their own file and
    * both believe they won. */
  val LeaseFileName: String = "writer.lease"

  /** Leases held by THIS process: qualified table root -> ownerId. Lets
    * [[assertWriter]] recognize our own lease without threading the handle
    * through every fold call site, and lets a same-process restart adopt
    * its still-live lease instead of refusing itself. */
  private val held = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Live handles for the shutdown hook: a writer dying GRACEFULLY
    * (SIGTERM, normal exit) releases its leases so a replacement starts
    * instantly; only a hard kill (-9) or power loss pays the ttl before
    * takeover — the Iceberg/Delta lock-expiry tradeoff, documented rather
    * than avoidable. Best-effort: the hook must never block or fail the
    * exit. */
  private val liveHandles =
    new java.util.concurrent.ConcurrentHashMap[String, WriterLease]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      liveHandles.values.forEach(l =>
        try l.release() catch { case _: Throwable => () }),
      "graft-writer-lease-release"))

  private def register(l: WriterLease): WriterLease = {
    hookInstalled
    liveHandles.put(l.ownerId, l)
    l
  }

  private def deregister(l: WriterLease): Unit =
    liveHandles.remove(l.ownerId)

  private def gcDir(tableDir: String) = new Path(s"$tableDir/_gc")

  private[gtfs] def leasePath(tableDir: String): Path =
    new Path(gcDir(tableDir), LeaseFileName)

  private def rootKey(fs: FileSystem, tableDir: String): String =
    fs.makeQualified(new Path(tableDir)).toString

  private case class LeaseInfo(ownerId: String, ttlMs: Long, mtime: Long) {
    def live(now: Long): Boolean = now - mtime < ttlMs
  }

  /** The table's lease, parsed; None when absent (or it vanished between
    * probe and open — a concurrent release reads as absent). Unreadable
    * content parses as a live lease under the DEFAULT ttl with an owner
    * nobody holds — failing safe toward refusal, never toward two
    * writers. */
  private def readLease(fs: FileSystem, tableDir: String): Option[LeaseInfo] = {
    val p = leasePath(tableDir)
    val st =
      try fs.getFileStatus(p)
      catch { case _: java.io.FileNotFoundException => return None }
    try {
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      val owner = lines.headOption.getOrElse("unreadable")
      val ttl = lines.lift(1).flatMap(_.toLongOption).getOrElse(DefaultTtlMs)
      Some(LeaseInfo(owner, ttl, st.getModificationTime))
    } catch {
      case _: java.io.FileNotFoundException => None
      // present but unreadable (torn write, checksum sidecar drift): a
      // live lease nobody owns — refusal-shaped, never two-writers-shaped
      case scala.util.control.NonFatal(_) =>
        Some(LeaseInfo("unreadable", DefaultTtlMs, st.getModificationTime))
    }
  }

  /** Acquires the writer lease for `tableDir`, failing fast with a named
    * error when another writer holds a live one. An expired lease (crashed
    * writer) is taken over; a still-live lease registered to THIS process
    * (same-process restart without release) is adopted. */
  def acquire(spark: SparkSession, tableDir: String,
      ttlMs: Long = DefaultTtlMs): WriterLease = {
    require(ttlMs > 0, s"lease ttl must be positive: $ttlMs")
    val fs = new Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val now = System.currentTimeMillis()
    readLease(fs, tableDir).foreach { l =>
      if (l.live(now) && Option(held.get(rootKey(fs, tableDir)))
          .contains(l.ownerId)) {
        // same-process re-acquire (e.g. a restarted automatic mode that
        // never released): adopt rather than refuse ourselves
        val lease = new WriterLease(spark, tableDir, l.ownerId, l.ttlMs)
        lease.renew()
        return register(lease)
      }
      if (l.live(now))
        throw new IllegalStateException(refusal(tableDir, l, now))
      fs.delete(leasePath(tableDir), false) // expired: take over
    }
    val ownerId = java.util.UUID.randomUUID().toString
    fs.mkdirs(gcDir(tableDir))
    try {
      val out = fs.create(leasePath(tableDir), false) // the acquisition point
      try out.write(s"$ownerId\n$ttlMs\n".getBytes("UTF-8"))
      finally out.close()
    } catch {
      case _: java.io.IOException => // FileAlreadyExists subsumed: lost the race
        val w = readLease(fs, tableDir)
        throw new IllegalStateException(w.fold(
          s"LWW table $tableDir: lease acquisition raced and lost")(l =>
          refusal(tableDir, l, System.currentTimeMillis())))
    }
    // READ-BACK verification: on a local FS two same-instant takeovers can
    // slip past the create's existence check; with ONE fixed path they
    // both read the same final bytes, so exactly one sees its own ownerId
    val back = readLease(fs, tableDir)
    if (!back.exists(_.ownerId == ownerId))
      throw new IllegalStateException(back.fold(
        s"LWW table $tableDir: lease acquisition raced and lost")(l =>
        refusal(tableDir, l, System.currentTimeMillis())))
    held.put(rootKey(fs, tableDir), ownerId)
    register(new WriterLease(spark, tableDir, ownerId, ttlMs))
  }

  private def refusal(tableDir: String, l: LeaseInfo, now: Long): String =
    s"LWW table $tableDir: another writer process holds the lease" +
      s" (owner ${l.ownerId}, heartbeat ${now - l.mtime} ms ago, ttl" +
      s" ${l.ttlMs} ms) — one writer process owns a live table's" +
      " folds/merges (LwwTable class doc); stop the other writer or wait" +
      " for its lease to expire"

  /** The destructive entry points' guard: fails fast with a named error
    * when a LIVE lease held by ANOTHER process exists for `tableDir`. No
    * lease at all — or our own / an expired one — passes. Cost: one
    * `getFileStatus` miss on un-leased tables (the same `_gc` probe the
    * retirement read paths already pay), per FOLD, never per trigger or
    * per read. */
  private[gtfs] def assertWriter(spark: SparkSession, tableDir: String): Unit = {
    val fs = new Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val now = System.currentTimeMillis()
    readLease(fs, tableDir).foreach { l =>
      if (l.live(now)
          && !Option(held.get(rootKey(fs, tableDir))).contains(l.ownerId))
        throw new IllegalStateException(refusal(tableDir, l, now))
    }
  }
}
