package graft.gtfs

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Long-lived, store-mtime-invalidated broadcast of the statistics tables —
  * the Spark-native form of the reference's FileCache
  * (/root/reference/src/main.rs:321-393): curve files are loaded once, held
  * in memory, and reused across requests until the file on disk changes.
  *
  * Here the cached unit is the whole curve store ([[CurveStore]] parquet
  * directories) and the cached object is an executor-resident
  * `Broadcast[Predictor]`: every streaming trigger / serving request reuses
  * the already-shipped broadcast blocks instead of rebuilding a
  * multi-hundred-MB broadcast exchange per call. Re-running the analyser
  * rewrites the store directories, which changes [[storeVersion]]; the next
  * [[get]] then rebuilds the broadcast and unpersists the stale one — the
  * mtime check is a driver-side metadata listing, never a data scan.
  *
  * Sized for statistics tables that fit the driver
  * ([[Predictor.MaxDriverRows]], same bound as the point-query Predictor);
  * past that, [[tryGet]] returns None and the caller keeps the
  * broadcast-join form ([[Predictor.batchPredictRealtime]]) whose curve
  * side stays distributed — the size gate reads parquet FOOTER row counts
  * (no data scan, re-checked only when the store version changes), so an
  * analyser re-run that grows the store past the bound downgrades the next
  * trigger to the join form instead of killing the stream on the
  * [[Predictor.guarded]] require.
  */
final class CurveCache(spark: SparkSession, specificDir: String, defaultDir: String,
                       maxRows: Long = Predictor.MaxDriverRows) {

  // None inside the value slot = this store version is known oversized —
  // remembered so the footer walk runs once per version, not per trigger
  @volatile private var cached: Option[(Long, Option[Broadcast[Predictor]])] = None

  /** Cheap store fingerprint: FNV-1a over (full file path, length, mtime) of
    * every file under both store directories. Any CurveStore.save* rewrite
    * changes it; listing is pure namenode/inode metadata. The FULL path (not
    * the bare file name) goes into the mix: two same-named, same-length
    * part files whose mtimes swap across partition subdirectories must not
    * collide to the same version. */
  private[gtfs] def storeVersion(): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    var h = 0xcbf29ce484222325L
    def mix(v: Long): Unit = { h ^= v; h *= 0x100000001b3L }
    Seq(specificDir, defaultDir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) {
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val st = it.next()
          mix(st.getPath.toUri.getPath.hashCode.toLong)
          mix(st.getLen)
          mix(st.getModificationTime)
        }
      }
    }
    h
  }

  /** The current broadcast Predictor, rebuilt only when the store changed
    * on disk — or None when the store exceeds [[Predictor.MaxDriverRows]]
    * (decided from footer metadata BEFORE any collect, so an oversized
    * store never OOMs the driver on the way to the guard). Thread-safe;
    * callers must not destroy the returned broadcast. */
  def tryGet(): Option[Broadcast[Predictor]] = synchronized {
    val v = storeVersion()
    cached match {
      case Some((ver, bcOpt)) if ver == v => bcOpt
      case stale =>
        // unpersist (not destroy): in-flight tasks of the previous trigger
        // may still read the old value; unpersist drops executor copies and
        // lets them re-fetch from the driver if needed
        stale.foreach(_._2.foreach(_.unpersist(blocking = false)))
        def footerRows(dir: String): Long = {
          // tableHasData, not exists: a zero-row save leaves a root with
          // only _SUCCESS, and reading it would kill the refresh stream
          // with UNABLE_TO_INFER_SCHEMA (empty store = 0 curves)
          if (Directory.tableHasData(spark, dir))
            graft.ops.Similarity.corpusCount(spark.read.parquet(dir))
          else 0L
        }
        // PER-TABLE bound, matching Predictor.guarded (each collected array
        // is checked on its own — a 1.2M + 0.9M store loads fine). Past
        // 4096 files corpusCount EXTRAPOLATES from a footer sample, so a
        // near-the-bound underestimate can still reach guarded's hard
        // check — the TYPED catch downgrades that band to None (join form)
        // instead of letting the failure escape into the streaming loop.
        // The instance maxRows threads all the way into guarded, so gate,
        // guard and diagnostics agree on one bound.
        val bcOpt =
          if (footerRows(specificDir) <= maxRows &&
              footerRows(defaultDir) <= maxRows)
            try Some(spark.sparkContext.broadcast(
              CurveStore.loadMerged(spark, specificDir, defaultDir, maxRows)))
            catch { case _: CurveStoreTooLargeException => None }
          else None
        cached = Some((v, bcOpt))
        bcOpt
    }
  }

  /** [[tryGet]] for callers that require the in-memory form. */
  def get(): Broadcast[Predictor] = tryGet().getOrElse(throw new IllegalStateException(
    s"curve store at $specificDir + $defaultDir exceeds the driver-map bound " +
      s"($maxRows rows); use the distributed join form"))
}
