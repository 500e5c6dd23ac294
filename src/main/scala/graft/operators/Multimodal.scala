package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the pipeline
  * as opaque `binary` columns plus typed metadata, exactly like a training
  * corpus stores them. The Spark-side mechanics here are real — schema,
  * partition-preserving `mapPartitions`, case-class encoders, batch-shaped
  * iteration — while the actual byte decoding is a STUB (this container has
  * no image/audio codecs): [[decodeStub]] derives deterministic fake
  * dimensions from the payload, at the exact point a real implementation
  * would call the codec. Swap `fakeDecode` for a JNI/FFI decode and nothing
  * else changes.
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
    val n = r.media.length
    MediaMeta(r.doc_id, n, n % 800, n % 600, n.toLong * 2654435761L)
  }
}
