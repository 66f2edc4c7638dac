package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: opaque payload bytes + typed metadata. The payload
  * column stays `binary` end-to-end; only the decode boundary interprets it. */
final case class MediaAsset(
    asset_id: Long, mime: String, payload: Array[Byte],
    width: Int, height: Int, duration_ms: Long)

/** Decoded features for one asset (fixed-shape batch output). */
final case class MediaFeatures(
    asset_id: Long, mime: String, n_bytes: Int,
    feature: Array[Float],   // 16-dim byte-histogram embedding (STUB decode)
    frames_sampled: Int)

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, processed by per-partition
  * batch functions (the Scala analogue of Pandas-UDF `mapInPandas` batches).
  *
  * ⚠ STUB DECODE: no image/audio codecs exist in this environment, so
  * [[decodeFeatures]] derives a deterministic 16-bin byte histogram instead
  * of real pixel/sample decoding. Everything around it — the binary schema,
  * partition-level batching, fixed-shape feature output, frame sampling —
  * is the real plumbing a codec would drop into.
  */
object Multimodal {

  /** Deterministic synthetic assets from any (id, text) source — payload is
    * the UTF-8 text; metadata derived from the id. Stand-in for reading
    * `binaryFile` blobs at scale. */
  def synthesizeAssets(spark: SparkSession, src: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text"): Dataset[MediaAsset] = {
    import spark.implicits._
    src.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)].map {
      case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val mime = (id % 3) match {
          case 0 => "image/png"
          case 1 => "audio/wav"
          case _ => "video/mp4"
        }
        MediaAsset(id, mime, payload,
          width = 16 + (id % 64).toInt, height = 16 + (id % 48).toInt,
          duration_ms = payload.length.toLong * 10)
    }
  }

  /** STUB decode → fixed-shape features, batched per partition (no per-row
    * driver round-trips; at scale each task decodes its whole partition). */
  def decodeFeatures(spark: SparkSession, assets: Dataset[MediaAsset],
                     frameStride: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        // STUB: byte histogram in 16 bins stands in for a real decoder.
        val hist = new Array[Float](16)
        var i = 0
        while (i < a.payload.length) {
          hist(((a.payload(i) & 0xff) >> 4)) += 1f
          i += 1
        }
        val n = math.max(a.payload.length, 1).toFloat
        var j = 0
        while (j < 16) { hist(j) /= n; j += 1 }
        val frames = if (a.payload.isEmpty) 0 else (a.payload.length + frameStride - 1) / frameStride
        MediaFeatures(a.asset_id, a.mime, a.payload.length, hist, frames)
      }
    }
  }

  /** "Frame sampling": every `stride`-th byte of the payload (the real
    * operation for video would sample frames; the plumbing — binary in,
    * bounded array out, stays identical). */
  def sampleFrames(spark: SparkSession, assets: Dataset[MediaAsset],
                   stride: Int = 32, maxFrames: Int = 16): DataFrame = {
    import spark.implicits._
    assets.map { a =>
      val frames = a.payload.indices.by(stride).take(maxFrames)
        .map(i => a.payload(i).toInt & 0xff).toArray
      (a.asset_id, a.mime, frames)
    }.toDF("asset_id", "mime", "frame_bytes")
  }
}
