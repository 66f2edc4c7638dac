package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: opaque payload bytes + typed metadata. The payload
  * column stays `binary` end-to-end; only the decode boundary interprets it. */
final case class MediaAsset(
    asset_id: Long, mime: String, payload: Array[Byte],
    width: Int, height: Int, duration_ms: Long)

/** Decoded features for one asset (fixed-shape batch output). Container
  * metadata is parsed from the REAL file headers; fields not applicable to
  * the modality are -1. `parse_ok` is false for corrupt/foreign payloads. */
final case class MediaFeatures(
    asset_id: Long, mime: String, n_bytes: Int,
    feature: Array[Float],   // 16-dim byte-histogram embedding
    frames_sampled: Int,
    decoded_width: Int, decoded_height: Int,
    sample_rate: Int, decoded_duration_ms: Long,
    pcm_mean_abs: Double,    // mean |16-bit sample| of decoded PCM (wav; −1 else)
    parse_ok: Boolean)

/** Real header codecs for the three modalities — pure byte parsing, no
  * external libraries: PNG signature + IHDR (width/height/bit depth), RIFF
  * WAVE fmt/data chunks (rate/channels/bits → duration), MP4 box tree down
  * to moov/mvhd (timescale/duration). The pixel/sample payload itself is
  * NOT decompressed (no codecs in this environment) — but the container
  * parsing is the real thing and round-trips the synthesized files. */
object MediaCodec {
  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int): Array[Byte] = be32(v).reverse
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def rbe32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def rle32(b: Array[Byte], o: Int): Int =
    ((b(o + 3) & 0xff) << 24) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def rle16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def tag(b: Array[Byte], o: Int): String =
    if (o + 4 <= b.length) new String(b.slice(o, o + 4), "ISO-8859-1") else ""

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc32(tag: String, data: Array[Byte]): Array[Byte] = {
    val c = new java.util.zip.CRC32
    c.update(tag.getBytes("ISO-8859-1"))
    c.update(data)
    be32(c.getValue.toInt)
  }

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] =
    be32(data.length) ++ tag.getBytes("ISO-8859-1") ++ data ++ crc32(tag, data)

  /** REAL PNG: signature, IHDR (8-bit truecolor, color type 2 for 3
    * channels / 6 for RGBA), a zlib-deflated IDAT of filter-0 scanlines
    * whose channel bytes cycle through `content` row-major, IEND — all
    * chunks with genuine CRC32s. Empty content emits an empty IDAT (such
    * assets are skipped downstream, as a real pipeline skips zero-byte
    * blobs). */
  def pngBytes(width: Int, height: Int, content: Array[Byte],
               channels: Int = 3): Array[Byte] = {
    require(channels == 3 || channels == 4,
      s"channels must be 3 (RGB) or 4 (RGBA), got $channels")
    val idat: Array[Byte] =
      if (content.isEmpty) Array.emptyByteArray
      else {
        val stride = 1 + width * channels
        val raw = new Array[Byte](height * stride)
        var k = 0 // global pixel-channel index
        var y = 0
        while (y < height) {
          raw(y * stride) = 0 // filter type 0 (None)
          var i = 1
          while (i < stride) {
            raw(y * stride + i) = content(k % content.length)
            k += 1; i += 1
          }
          y += 1
        }
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length + 64)
        val out = new java.io.ByteArrayOutputStream()
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end()
        out.toByteArray
      }
    PngSig ++
      chunk("IHDR", be32(width) ++ be32(height) ++
        Array[Byte](8, if (channels == 4) 6 else 2, 0, 0, 0)) ++
      chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** (width, height, bitDepth) from the PNG signature + IHDR. */
  def parsePng(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length >= 26 && b.take(8).sameElements(PngSig) && tag(b, 12) == "IHDR")
      Some((rbe32(b, 16), rbe32(b, 20), b(24) & 0xff))
    else None

  /** Valid RIFF/WAVE with a 16-byte PCM fmt chunk and one data chunk. */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
               samples: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val byteRate = sampleRate * blockAlign
    val data = if (samples.length % 2 == 0) samples else samples :+ 0.toByte
    "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(byteRate) ++ le16(blockAlign) ++ le16(bitsPerSample) ++
      "data".getBytes ++ le32(data.length) ++ data
  }

  /** (sampleRate, channels, bitsPerSample, durationMs) by walking the RIFF
    * chunk list for `fmt ` and `data`. */
  def parseWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    // Long offsets + unsigned chunk lengths: a corrupt length byte must end
    // the walk (monotonic advance), never loop forever or index negatively
    var o = 12L
    var fmt: Option[(Int, Int, Int)] = None
    var dataLen = -1L
    while (o + 8 <= b.length) {
      val oi = o.toInt
      val id = tag(b, oi)
      val len = rle32(b, oi + 4).toLong & 0xffffffffL
      // the fmt chunk's OWN length must cover the 16 PCM fields — checking
      // only the buffer bound would read the NEXT chunk's bytes as
      // rate/channels/bits on a truncated fmt and report garbage as parsed
      if (id == "fmt " && fmt.isEmpty && len >= 16 && o + 8 + 16 <= b.length)
        fmt = Some((rle32(b, oi + 12), rle16(b, oi + 10), rle16(b, oi + 22)))
      // FIRST data chunk wins, like wavData — duration and the PCM stats
      // must come from the same chunk on multi-data-chunk blobs
      if (id == "data" && dataLen < 0 && o + 8 + len <= b.length) dataLen = len
      o += 8 + len + (len & 1) // chunks are word-aligned
    }
    for ((rate, channels, bits) <- fmt if dataLen >= 0 && rate > 0 && channels > 0 && bits > 0)
      yield (rate, channels, bits,
        dataLen * 1000L / (rate.toLong * channels * bits / 8))
  }

  /** Minimal ISO-BMFF: ftyp, moov containing a version-0 mvhd
    * (timescale + duration), and an mdat carrying `content`. */
  def mp4Bytes(timescale: Int, duration: Int, content: Array[Byte]): Array[Byte] = {
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(512)
    val mvhd = be32(32) ++ "mvhd".getBytes ++ be32(0) /* version+flags */ ++
      be32(0) ++ be32(0) /* creation, modification */ ++
      be32(timescale) ++ be32(duration) ++ be32(0x00010000)
    val moov = be32(8 + mvhd.length) ++ "moov".getBytes ++ mvhd
    val mdat = be32(8 + content.length) ++ "mdat".getBytes ++ content
    ftyp ++ moov ++ mdat
  }

  /** (timescale, duration, durationMs) by walking top-level boxes and
    * descending into moov for mvhd (version 0 or 1). */
  def parseMp4(b: Array[Byte]): Option[(Int, Int, Long)] = {
    // box sizes compared in Long (unsigned) — a forged size near 2^31 must
    // fail the bounds check, not wrap negative and walk off the buffer
    def findBox(lo: Int, hi: Int, name: String): Option[(Int, Int)] = {
      var o = lo.toLong
      while (o + 8 <= hi) {
        val size = rbe32(b, o.toInt).toLong & 0xffffffffL
        if (size < 8 || o + size > hi) return None
        if (tag(b, o.toInt + 4) == name) return Some((o.toInt + 8, (o + size).toInt))
        o += size
      }
      None
    }
    if (b.length < 8 || tag(b, 4) != "ftyp") return None
    for {
      (mLo, mHi) <- findBox(0, b.length, "moov")
      (hLo, hHi) <- findBox(mLo, mHi, "mvhd")
      if hLo < hHi // non-empty box: the version byte is readable
      version = b(hLo) & 0xff
      // v0 reads bytes hLo+12..19; v1 (64-bit times) reads hLo+20..31
      if hLo + (if (version == 0) 20 else 32) <= hHi
    } yield {
      val (ts, dur) =
        if (version == 0) (rbe32(b, hLo + 12), rbe32(b, hLo + 16))
        else (rbe32(b, hLo + 20), rbe32(b, hLo + 28)) // v1: 64-bit times
      (ts, dur, if (ts > 0) dur.toLong * 1000L / ts else -1L)
    }
  }

  /** The RIFF `data` chunk's bytes — the raw PCM samples (PCM needs no
    * codec library; the samples ARE the chunk content). */
  def wavData(b: Array[Byte]): Option[Array[Byte]] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var o = 12L
    while (o + 8 <= b.length) {
      val oi = o.toInt
      val len = rle32(b, oi + 4).toLong & 0xffffffffL
      if (o + 8 + len > b.length) return None
      if (tag(b, oi) == "data") return Some(b.slice(oi + 8, oi + 8 + len.toInt))
      o += 8 + len + (len & 1)
    }
    None
  }

  /** All IDAT chunks' bytes concatenated, by walking the PNG chunk list
    * (NOT a fixed offset — robust to ancillary chunks and split IDATs). */
  def pngIdat(b: Array[Byte]): Option[Array[Byte]] = {
    if (!parsePng(b).isDefined) return None
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    var found = false
    var o = 8L
    while (o + 8 <= b.length) {
      val oi = o.toInt
      val len = rbe32(b, oi).toLong & 0xffffffffL
      if (o + 8 + len > b.length) return if (found) Some(out.toArray) else None
      if (tag(b, oi + 4) == "IDAT") {
        found = true; out ++= b.slice(oi + 8, oi + 8 + len.toInt)
      }
      o += 8 + len + 4 // len + tag + data + crc
    }
    if (found) Some(out.toArray) else None
  }

  /** Decompressed pixel-channel bytes (h·w·3 for 8-bit truecolor): inflate
    * the concatenated IDAT zlib stream and strip the per-scanline filter
    * byte. Only filter type 0 is decoded (the only one this engine writes);
    * anything else — wrong stream length, bad zlib data, unsupported
    * filter — returns None rather than failing the task. */
  def pngPixels(b: Array[Byte]): Option[Array[Byte]] = {
    for {
      (w, h, _) <- parsePng(b)
      // channel count from the IHDR color type: 2 = truecolor RGB,
      // 6 = truecolor + alpha; other types unsupported
      ch <- (b(25) & 0xff) match {
        case 2 => Some(3)
        case 6 => Some(4)
        case _ => None
      }
      idat <- pngIdat(b)
      if idat.nonEmpty && w > 0 && h > 0 &&
        // corrupt IHDR dims: the expected raw size must fit an Int without
        // overflow AND be achievable from this stream (zlib expands at most
        // ~1032:1) — otherwise a flipped dimension byte would turn the
        // allocation below into a NegativeArraySize/OOM task failure.
        // Division form: h * (1 + ch·w) itself can exceed Long for forged
        // w = h = 2^31-1, so never form the product
        h.toLong <= math.min(Int.MaxValue.toLong,
          idat.length.toLong * 1032L + 1024L) / (1L + ch.toLong * w.toLong)
      raw <- try {
        val inf = new java.util.zip.Inflater()
        inf.setInput(idat)
        val stride = 1 + w * ch
        val out = new Array[Byte](h * stride)
        var off = 0
        var stalled = false
        while (off < out.length && !inf.finished() && !stalled) {
          val n = inf.inflate(out, off, out.length - off)
          if (n == 0 && inf.needsInput()) stalled = true else off += n
        }
        inf.end()
        if (off == out.length) Some(out) else None
      } catch { case _: java.util.zip.DataFormatException => None }
      pixels <- {
        val stride = 1 + w * ch
        var y = 0
        var filtersOk = true
        val px = new Array[Byte](h * w * ch)
        while (y < h && filtersOk) {
          if (raw(y * stride) != 0) filtersOk = false
          else System.arraycopy(raw, y * stride + 1, px, y * w * ch, w * ch)
          y += 1
        }
        if (filtersOk) Some(px) else None
      }
    } yield pixels
  }
}

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, processed by per-partition
  * batch functions (the Scala analogue of Pandas-UDF `mapInPandas` batches).
  *
  * The synthesized payloads are REAL container files — the PNG is a fully
  * valid image (zlib-deflated filter-0 scanlines, genuine chunk CRC32s),
  * the WAVE/MP4 are header-valid — and [[decodeFeatures]] parses their
  * actual headers via [[MediaCodec]]; [[resizeImages]] decompresses the
  * PNG pixel data for real (JDK Inflater). Audio/video SAMPLE decode is
  * the remaining would-need-a-codec-library step; the byte histogram
  * stands in for the content embedding. */
object Multimodal {

  /** Deterministic synthetic assets from any (id, text) source — the text
    * bytes become the media content inside a format-valid container, with
    * metadata derived from the id. Stand-in for reading `binaryFile` blobs
    * at scale. */
  def synthesizeAssets(spark: SparkSession, src: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text"): Dataset[MediaAsset] = {
    import spark.implicits._
    src.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)].map {
      case (id, text) =>
        val content = text.getBytes("UTF-8")
        (id % 3) match {
          case 0 =>
            val w = 16 + (id % 64).toInt
            val h = 16 + (id % 48).toInt
            MediaAsset(id, "image/png", MediaCodec.pngBytes(w, h, content),
              width = w, height = h, duration_ms = 0L)
          case 1 =>
            val channels = 1 + (id % 2).toInt
            val payload = MediaCodec.wavBytes(8000, channels, 16, content)
            val durMs = MediaCodec.parseWav(payload).map(_._4).getOrElse(0L)
            MediaAsset(id, "audio/wav", payload,
              width = 0, height = 0, duration_ms = durMs)
          case _ =>
            val durMs = content.length.toLong * 10
            MediaAsset(id, "video/mp4",
              MediaCodec.mp4Bytes(1000, durMs.toInt, content),
              width = 0, height = 0, duration_ms = durMs)
        }
    }
  }

  /** Header decode → fixed-shape features, batched per partition (no
    * per-row driver round-trips; at scale each task decodes its whole
    * partition). Corrupt/foreign payloads yield `parse_ok = false` instead
    * of failing the task. */
  def decodeFeatures(spark: SparkSession, assets: Dataset[MediaAsset],
                     frameStride: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val hist = new Array[Float](16)
        var i = 0
        while (i < a.payload.length) {
          hist(((a.payload(i) & 0xff) >> 4)) += 1f
          i += 1
        }
        val n = math.max(a.payload.length, 1).toFloat
        var j = 0
        while (j < 16) { hist(j) /= n; j += 1 }
        val frames = if (a.payload.isEmpty) 0
                     else (a.payload.length + frameStride - 1) / frameStride
        val (w, h, rate, durMs, ok) = a.mime match {
          case "image/png" => MediaCodec.parsePng(a.payload) match {
            case Some((pw, ph, _)) => (pw, ph, -1, -1L, true)
            case None => (-1, -1, -1, -1L, false)
          }
          case "audio/wav" => MediaCodec.parseWav(a.payload) match {
            case Some((sr, _, _, d)) => (-1, -1, sr, d, true)
            case None => (-1, -1, -1, -1L, false)
          }
          case "video/mp4" => MediaCodec.parseMp4(a.payload) match {
            case Some((_, _, d)) => (-1, -1, -1, d, true)
            case None => (-1, -1, -1, -1L, false)
          }
          case _ => (-1, -1, -1, -1L, false)
        }
        // real sample decode for audio: PCM needs no codec library — read
        // the data chunk and average the |16-bit LE| amplitudes
        val pcm = if (a.mime != "audio/wav") -1.0
          else MediaCodec.wavData(a.payload).filter(_.length >= 2).map { d =>
            var s = 0L; var i = 0
            while (i + 1 < d.length) {
              s += math.abs(((d(i + 1) << 8) | (d(i) & 0xff)).toShort.toLong)
              i += 2
            }
            BigDecimal(s.toDouble / (d.length / 2))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          }.getOrElse(-1.0)
        MediaFeatures(a.asset_id, a.mime, a.payload.length, hist, frames,
          w, h, rate, durMs, pcm, ok)
      }
    }
  }

  /** Nearest-neighbor image resize over the binary column, batched per
    * partition: chunk-walking IDAT extraction, REAL zlib inflate + filter-0
    * scanline stripping ([[MediaCodec.pngPixels]]), the (dy·srcH/dstH,
    * dx·srcW/dstW) index math over the decoded red channel, binary out;
    * non-image, empty and undecodable assets are skipped; scale-out by
    * partition. Emits summary scalars (byte sum, corner pixels) so the
    * result is oracle-checkable without shipping pixels to the driver. */
  def resizeImages(spark: SparkSession, assets: Dataset[MediaAsset],
                   dstW: Int, dstH: Int): DataFrame = {
    // fail fast on the driver: degenerate dims would otherwise throw
    // Array-bounds errors inside executor tasks after the decode work
    require(dstW > 0 && dstH > 0, s"resize dims must be positive: ${dstW}x$dstH")
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        if (a.mime != "image/png") None
        else for {
          // index with the DECODED header dims (what pngPixels sized the
          // buffer by), not the asset's declared metadata — a blob whose
          // metadata drifted from its actual header must be skipped, not
          // read out of bounds
          (srcW, srcH, _) <- MediaCodec.parsePng(a.payload)
          px <- MediaCodec.pngPixels(a.payload).filter(_.nonEmpty)
        } yield {
          // pixel stride from the DECODE itself (pngPixels returns exactly
          // h·w·channels bytes), so it can never disagree with the decoder's
          // color-type mapping — a fixed 3-byte stride garbled the channel
          // sampling on RGBA inputs (e.g. this engine's own heat strips)
          val ch = px.length / (srcW * srcH)
          val out = new Array[Byte](dstW * dstH)
          var y = 0
          while (y < dstH) {
            val sy = y * srcH / dstH
            var x = 0
            while (x < dstW) {
              val sx = x * srcW / dstW
              out(y * dstW + x) = px((sy * srcW + sx) * ch) // red channel
              x += 1
            }
            y += 1
          }
          var sum = 0L
          var i = 0
          while (i < out.length) { sum += out(i) & 0xff; i += 1 }
          (a.asset_id, srcW, srcH, dstW, dstH, out,
            sum, out(0) & 0xff, out(out.length - 1) & 0xff)
        }
      }
    }.toDF("asset_id", "src_w", "src_h", "dst_w", "dst_h", "pixels",
      "byte_sum", "first_px", "last_px")
  }

  /** "Frame sampling": every `stride`-th byte of the payload (the real
    * operation for video would sample frames; the plumbing — binary in,
    * bounded array out, stays identical). */
  def sampleFrames(spark: SparkSession, assets: Dataset[MediaAsset],
                   stride: Int = 32, maxFrames: Int = 16): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    import spark.implicits._
    assets.map { a =>
      val frames = a.payload.indices.by(stride).take(maxFrames)
        .map(i => a.payload(i).toInt & 0xff).toArray
      (a.asset_id, a.mime, frames)
    }.toDF("asset_id", "mime", "frame_bytes")
  }
}
