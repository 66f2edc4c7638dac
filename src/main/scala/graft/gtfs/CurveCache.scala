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
  * past that, use the broadcast-join form ([[Predictor.batchPredictRealtime]])
  * whose curve side stays distributed.
  */
final class CurveCache(spark: SparkSession, specificDir: String, defaultDir: String) {

  @volatile private var cached: Option[(Long, Broadcast[Predictor])] = None

  /** Cheap store fingerprint: FNV-1a over (file name, length, mtime) of every
    * file under both store directories. Any CurveStore.save* rewrite changes
    * it; listing is pure namenode/inode metadata. */
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
          mix(st.getPath.getName.hashCode.toLong)
          mix(st.getLen)
          mix(st.getModificationTime)
        }
      }
    }
    h
  }

  /** The current broadcast Predictor, rebuilt only when the store changed on
    * disk. Thread-safe; callers must not destroy the returned broadcast. */
  def get(): Broadcast[Predictor] = synchronized {
    val v = storeVersion()
    cached match {
      case Some((ver, bc)) if ver == v => bc
      case stale =>
        // unpersist (not destroy): in-flight tasks of the previous trigger
        // may still read the old value; unpersist drops executor copies and
        // lets them re-fetch from the driver if needed
        stale.foreach(_._2.unpersist(blocking = false))
        val bc = spark.sparkContext.broadcast(
          CurveStore.loadMerged(spark, specificDir, defaultDir))
        cached = Some((v, bc))
        bc
    }
  }
}
