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
