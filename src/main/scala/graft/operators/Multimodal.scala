package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `BinaryType` payloads with
  * typed metadata, and per-partition imperative feature extraction — the
  * pattern for image/audio/video processing in a 100 TB training-data
  * pipeline.
  *
  * The decode step is a **deterministic stub**: this container has no
  * image/audio codecs, so "decoding" computes byte-level features
  * (checksum, digest, digest-derived dimensions). The Spark-side plumbing
  * is the real thing — binary columns, typed Dataset rows, mapPartitions
  * batch iteration (one codec init per partition, the expensive part in a
  * real decoder), and a schema that survives the oracle gate.
  */
object Multimodal {

  /** A media row: opaque payload + minimal typed metadata. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Extracted features — everything deterministic from the bytes. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, byte_sum: Long, sha256_hex: String,
      width: Int, height: Int, thumb_w: Int, thumb_h: Int)

  /** Pack a text corpus into media rows (UTF-8 payload). In production
    * the payload column would come straight from parquet BinaryType.
    */
  def packDocuments(docs: DataFrame): Dataset[MediaRecord] =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("media_type"))
      .as(Encoders.product[MediaRecord])

  /** Per-partition "decode" + feature extraction. Real codecs would be
    * initialized once per partition here (`// codec = ImageIO...`); the
    * stub derives dimensions from the content digest so every value is
    * reproducible in any engine.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { rec =>
        val bytes = rec.payload
        val sum = bytes.foldLeft(0L)((acc, b) => (acc + (b & 0xff)) % 1000000007L)
        md.reset()
        val hex = md.digest(bytes).map("%02x".format(_)).mkString
        // digest-derived stand-ins for decoded media dimensions
        val w = 64 + (hex.charAt(0).toInt % 8) * 16
        val h = 64 + (hex.charAt(1).toInt % 8) * 16
        MediaFeatures(rec.doc_id, bytes.length.toLong, sum, hex, w, h, w / 2, h / 2)
      }
    }(Encoders.product[MediaFeatures])

  /** End-to-end: corpus → binary payloads → per-partition features. */
  def documentFeatures(docs: DataFrame): DataFrame =
    extractFeatures(packDocuments(docs)).toDF()
}
