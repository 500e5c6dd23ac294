package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the pipeline
  * as opaque `binary` columns plus typed metadata, exactly like a training
  * corpus stores them. The Spark-side mechanics are real — schema,
  * partition-preserving `mapPartitions`, case-class encoders, batch-shaped
  * iteration — and so is the IMAGE path: [[decodeImages]] reads real
  * PNG/JPEG/GIF/BMP dimensions through the JDK's `javax.imageio`
  * (header-only — no pixel decode, so metadata extraction over a 100 TB
  * shard costs header bytes, not decompressed frames). [[decodeStub]]
  * keeps a deterministic text-bytes path whose output an external oracle
  * can recompute; audio/video would slot a codec into the same
  * per-partition iterator.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int, checksum: Long)

  /** Wrap a text corpus as a media table: payload = UTF-8 bytes. In a real
    * pipeline the binary column comes straight from the source (tar shards,
    * parquet LOBs); text-as-bytes keeps the plumbing testable here.
    */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"),
      lit("text/plain").as("media_type"))

  /** STUB decode: a real implementation opens the codec once per partition
    * (expensive native init amortized over the batch) and emits one meta row
    * per media row — the iterator shape below is exactly that. The fake
    * "decode" derives width/height/checksum from the byte length so results
    * are deterministic and independently computable by the test oracle.
    */
  def decodeStub(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "media_type").as[MediaRow].mapPartitions { rows =>
      // real impl: val codec = NativeCodec.open(); rows.map { r => codec.decode(r.media) ... }
      rows.map { r => fakeDecode(r) }
    }
  }

  private def fakeDecode(r: MediaRow): MediaMeta = {
    // null media degrades like an empty payload — poison rows must not
    // NPE here any more than in the real decoder below
    val n = if (r.media == null) 0 else r.media.length
    MediaMeta(r.doc_id, n, n % 800, n % 600, n.toLong * 2654435761L)
  }

  /** REAL image metadata decode (JDK `javax.imageio`, zero new deps).
    * Dimensions come from the format reader's HEADER path
    * (`ImageReader.getWidth/getHeight`), which parses the image header
    * without decompressing pixels — the right cost model for corpus-scale
    * metadata extraction. The checksum is CRC32 over the payload.
    *
    * Undecodable payloads (no registered reader, truncated bytes) yield
    * width = height = -1 rather than failing the task: at corpus scale a
    * fraction of media bytes is always corrupt, and a poison row must
    * not kill a 10-hour job. Callers filter `width >= 0` to keep decoded
    * rows.
    */
  def decodeImages(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "media_type").as[MediaRow].mapPartitions { rows =>
      // ImageIO scans its reader registry per MIME lookup; doing the
      // per-partition init here (one registry touch, reused readers) is
      // the codec-amortization shape real decoders need.
      rows.map(imageMeta)
    }
  }

  /** REAL image resize (JDK `java.awt` + `javax.imageio`, headless-safe):
    * decode → bilinear scale to (w, h) → re-encode PNG. The per-partition
    * iterator shape amortizes codec setup exactly like a native decoder
    * would; undecodable payloads pass through as null media (poison rows
    * must not kill the job — filter `media IS NOT NULL` downstream).
    * Frame-sampling for video would slot into the same shape with a real
    * codec; no video codec ships with the JDK.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): Dataset[MediaRow] = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "media_type").as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val out = try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
          if (img == null) null
          else {
            val scaled = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "png", bos)
            bos.toByteArray
          }
        } catch { case _: Exception => null }
        MediaRow(r.doc_id, out, if (out == null) r.media_type else "image/png")
      }
    }
  }

  final case class AudioMeta(doc_id: Long, n_bytes: Int, sample_rate: Double,
      channels: Int, bits: Int, frames: Long, duration_secs: Double)

  /** REAL audio metadata decode (JDK `javax.sound.sampled`, zero new
    * deps): WAV/AIFF/AU header parse via
    * `AudioSystem.getAudioFileFormat`, which reads the container header
    * without decoding samples — the same header-only cost model as
    * [[decodeImages]]. Emits sample rate, channel count, bits per sample,
    * frame count and duration (frames / frame rate).
    *
    * Poison rows (null media, non-audio bytes, truncated headers) degrade
    * to -1 fields instead of failing the task; filter `sample_rate >= 0`
    * to keep decoded rows. Compressed formats without a JDK provider
    * (mp3, ogg) land in the same degraded bucket — a real pipeline slots
    * its codec into this exact per-partition iterator. No video container
    * parser ships with the JDK (see [[resizeImages]] note).
    */
  def decodeAudio(media: DataFrame): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "media_type").as[MediaRow].mapPartitions { rows =>
      rows.map(audioMeta)
    }
  }

  private def audioMeta(r: MediaRow): AudioMeta = {
    if (r.media == null) return AudioMeta(r.doc_id, 0, -1.0, -1, -1, -1L, -1.0)
    try {
      // ByteArrayInputStream supports mark/reset, which the provider
      // probe requires; header parse only — samples are never decoded.
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(r.media))
      val fmt = aff.getFormat
      val frames = aff.getFrameLength.toLong
      val dur =
        if (frames >= 0 && fmt.getFrameRate > 0) frames / fmt.getFrameRate.toDouble
        else -1.0
      AudioMeta(r.doc_id, r.media.length, fmt.getSampleRate.toDouble,
        fmt.getChannels, fmt.getSampleSizeInBits, frames, dur)
    } catch {
      case _: Exception => AudioMeta(r.doc_id, r.media.length, -1.0, -1, -1, -1L, -1.0)
    }
  }

  final case class VideoMeta(doc_id: Long, n_bytes: Int, brand: String,
      timescale: Long, duration_secs: Double, width: Double, height: Double)

  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_ts_ms: Long,
      frame: Array[Byte])

  /** Video frame-sampling PLUMBING: one output row per sampled frame at
    * `fps`, timestamps derived from the real mvhd duration (the box
    * parser above), `frame` bytes STUBBED as null — this container ships
    * no video codec, so the decode step is the documented stub while
    * everything Spark-side (schema, per-partition iterator shape, row
    * explosion bounded by duration×fps, poison-row behavior) is real. A
    * production build drops a codec into `decodeFrame` below and nothing
    * else changes.
    *
    * Undecodable payloads contribute ZERO frames (not a poison row —
    * a frame table indexes decoded content only; the metadata sweep is
    * where corruption gets counted). `maxFramesPerDoc` bounds the
    * explosion a lying duration field could cause — a 10-hour "video" in
    * a 2 KB payload must not emit 36k rows.
    */
  def sampleFramesStub(media: DataFrame, fps: Double = 1.0,
      maxFramesPerDoc: Int = 64): Dataset[FrameRow] = {
    require(fps > 0 && maxFramesPerDoc > 0, "need fps>0, maxFramesPerDoc>0")
    val spark = media.sparkSession
    import spark.implicits._
    // real impl: val codec = NativeCodec.open(); codec.seekAndDecode(...)
    def decodeFrame(bytes: Array[Byte], tsMs: Long): Array[Byte] = null
    media.select("doc_id", "media", "media_type").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val meta = videoMeta(r)
        if (meta.timescale < 0 || meta.duration_secs <= 0) Iterator.empty
        else {
          val n = math.min(math.floor(meta.duration_secs * fps).toLong + 1,
            maxFramesPerDoc.toLong).toInt
          (0 until n).iterator.map { i =>
            val tsMs = math.round(i * 1000.0 / fps)
            FrameRow(r.doc_id, i, tsMs, decodeFrame(r.media, tsMs))
          }
        }
      }
    }
  }

  final case class FeatureRow(doc_id: Long, feature: Array[Float])

  /** Deterministic media feature extraction: an L1-normalized 16-bin
    * byte histogram per payload — the stand-in for a real embedding
    * model with the identical Spark shape (binary in, fixed-width float
    * vector out, per-partition iterator so a real model would batch and
    * amortize its init). The fake is DETERMINISTIC and independently
    * computable, so specs can pin exact values; the output feeds the
    * [[graft.operators.Similarity]] surface unchanged (any fixed-width
    * float vector does).
    *
    * Empty/null payloads yield the zero vector (not dropped: a feature
    * table usually must stay 1:1 with its media table for downstream
    * joins).
    */
  def byteHistogramFeatures(media: DataFrame, bins: Int = 16): Dataset[FeatureRow] = {
    require(bins > 0 && 256 % bins == 0, s"bins must divide 256, got $bins")
    val spark = media.sparkSession
    import spark.implicits._
    val per = 256 / bins
    media.select("doc_id", "media", "media_type").as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val counts = new Array[Int](bins)
        val bytes = if (r.media == null) Array.emptyByteArray else r.media
        var i = 0
        while (i < bytes.length) {
          counts((bytes(i) & 0xff) / per) += 1
          i += 1
        }
        val total = bytes.length
        val v = new Array[Float](bins)
        if (total > 0) {
          var b = 0
          while (b < bins) { v(b) = counts(b).toFloat / total; b += 1 }
        }
        FeatureRow(r.doc_id, v)
      }
    }
  }

  /** REAL video metadata decode: an MP4/QuickTime (ISO BMFF) box parser
    * in pure JVM — no codec, no new deps. Walks the top-level box
    * structure (u32 size + fourcc, 64-bit `largesize` honored), reads
    * `ftyp`'s major brand, `moov/mvhd`'s timescale + duration (version
    * 0 and 1 layouts) and the first video track's `tkhd` 16.16
    * fixed-point display dimensions. Header-only, like the image and
    * audio paths: a corpus-scale metadata sweep touches box headers,
    * never sample data — and `moov` leads the file in faststart
    * layouts, so object-store range reads stay small.
    *
    * Poison rows (null, truncated, non-MP4) degrade to -1 fields, never
    * failing the task; filter `timescale >= 0` for decoded rows.
    * Frame-sampling would slot a real codec into this same iterator.
    */
  def decodeVideo(media: DataFrame): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "media_type").as[MediaRow].mapPartitions { rows =>
      rows.map(videoMeta)
    }
  }

  private def videoMeta(r: MediaRow): VideoMeta = {
    val bad = VideoMeta(r.doc_id, if (r.media == null) 0 else r.media.length,
      null, -1L, -1.0, -1.0, -1.0)
    if (r.media == null) return bad
    try {
      val buf = java.nio.ByteBuffer.wrap(r.media).order(java.nio.ByteOrder.BIG_ENDIAN)
      var brand: String = null
      var timescale = -1L
      var duration = -1L
      var width = -1.0
      var height = -1.0

      def fourcc(at: Int): String =
        new String(r.media, at, 4, java.nio.charset.StandardCharsets.US_ASCII)

      /** Walk boxes in [from, to), calling `visit(type, payloadStart,
        * payloadEnd)` for each; descent into containers is driven by the
        * callbacks themselves re-invoking walk. Returns false on
        * malformed sizes.
        */
      def walk(from: Long, to: Long, visit: (String, Long, Long) => Unit): Boolean = {
        var p = from
        while (p + 8 <= to) {
          val size32 = buf.getInt(p.toInt).toLong & 0xffffffffL
          val tpe = fourcc(p.toInt + 4)
          var header = 8L
          var size = size32
          if (size32 == 1L) { // 64-bit largesize
            if (p + 16 > to) return false
            size = buf.getLong(p.toInt + 8)
            header = 16L
          } else if (size32 == 0L) size = to - p // box extends to end
          if (size < header || p + size > to) return false
          visit(tpe, p + header, p + size)
          p += size
        }
        true
      }

      walk(0L, r.media.length.toLong, {
        case ("ftyp", s, e) if e - s >= 4 => brand = fourcc(s.toInt)
        case ("moov", ms, me) =>
          walk(ms, me, {
            case ("mvhd", s, e) =>
              val v = r.media(s.toInt) & 0xff
              if (v == 1 && e - s >= 32) {
                timescale = buf.getInt(s.toInt + 20).toLong & 0xffffffffL
                duration = buf.getLong(s.toInt + 24)
              } else if (v == 0 && e - s >= 20) {
                timescale = buf.getInt(s.toInt + 12).toLong & 0xffffffffL
                duration = buf.getInt(s.toInt + 16).toLong & 0xffffffffL
              }
            case ("trak", ts, te) =>
              walk(ts, te, {
                case ("tkhd", s, e) =>
                  val v = r.media(s.toInt) & 0xff
                  val dimOff = if (v == 1) 88 else 76 // width/height at payload end
                  if (e - s >= dimOff + 8 && width < 0) {
                    val w = (buf.getInt(s.toInt + dimOff).toLong & 0xffffffffL) / 65536.0
                    val h = (buf.getInt(s.toInt + dimOff + 4).toLong & 0xffffffffL) / 65536.0
                    if (w > 0 && h > 0) { width = w; height = h }
                  }
                case _ => ()
              })
            case _ => ()
          })
        case _ => ()
      })
      if (timescale <= 0) bad
      else VideoMeta(r.doc_id, r.media.length, brand, timescale,
        if (duration >= 0) duration.toDouble / timescale else -1.0, width, height)
    } catch { case _: Exception => bad }
  }

  private def imageMeta(r: MediaRow): MediaMeta = {
    // null media is a poison row like any other: degrade, don't NPE
    if (r.media == null) return MediaMeta(r.doc_id, 0, -1, -1, 0L)
    val crc = new java.util.zip.CRC32()
    crc.update(r.media)
    var w = -1
    var h = -1
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(r.media))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (readers.hasNext) {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          w = reader.getWidth(0)  // header-only: no pixel decode
          h = reader.getHeight(0)
        } catch { case _: Exception => w = -1; h = -1 }
        finally reader.dispose()
      }
    } finally if (iis != null) iis.close()
    MediaMeta(r.doc_id, r.media.length, w, h, crc.getValue)
  }
}
