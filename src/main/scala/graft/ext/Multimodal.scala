package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video travel as opaque `binary`
  * payload columns with a typed metadata struct alongside.
  *
  * The decode step is pluggable ([[BinaryDecoder]]) and runs via
  * `mapPartitions` so a real decoder (JNI image lib, audio codec) is
  * instantiated ONCE per partition and fed a stream of payloads — the batch
  * shape a vectorized decoder wants. Partitioning, schema, and the batch
  * plumbing are real and tested; the decoder itself is a STUB here
  * ([[StubDecoder]]): the image/audio libraries are not available in this
  * build, so it derives deterministic fake metadata from the raw bytes.
  * Swapping in a real decoder is a one-line change at the call site.
  *
  * At 100 TB: payloads should live in their own parquet column (columnar
  * pruning keeps metadata-only queries from reading bytes), partition count
  * sized so `bytes per partition` fits executor memory, and decode is a
  * narrow map — no shuffle.
  */
object Multimodal {

  /** Typed metadata extracted from a binary payload. */
  final case class MediaMeta(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_bytes: Long,
      first_byte: Int)

  /** One-per-partition decoder contract. Implementations may hold native
    * resources; `decode` is called once per payload within a partition. */
  trait BinaryDecoder extends Serializable {
    def decode(id: Long, payload: Array[Byte]): MediaMeta
  }

  /** STUB decoder — deterministic fake metadata derived from the bytes
    * (length/first byte), standing in for a real image decode. Marked
    * clearly: replace with a real implementation when codec libs exist. */
  object StubDecoder extends BinaryDecoder {
    override def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val first = if (payload.nonEmpty) payload(0) & 0xff else 0
      MediaMeta(
        doc_id = id,
        format = "stub",
        width = (payload.length % 640).toInt,
        height = (first * 7) % 480,
        n_bytes = payload.length.toLong,
        first_byte = first)
    }
  }

  /** Decode a (id, payload) frame into typed metadata via mapPartitions.
    * Input: `idCol` long, `payloadCol` binary. */
  def decodeBatch(
      df: DataFrame,
      decoder: BinaryDecoder,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder is materialized once per partition (real decoders hold
        // native state); payloads stream through it
        val d = decoder
        it.map { case (id, bytes) => d.decode(id, bytes) }
      }
  }

  /** Byte-level feature vector — the feature-extract stage that follows
    * decode in a multimodal pipeline (decode → features → embed). These
    * features are REAL (computed from the payload bytes, no stub): byte
    * count and class counts a content-type classifier would use. */
  final case class ByteFeatures(
      doc_id: Long,
      n_bytes: Long,
      n_upper: Long,
      n_digit: Long,
      n_space: Long,
      n_non_ascii: Long)

  /** Extract [[ByteFeatures]] per payload via the same once-per-partition
    * mapPartitions batch shape as [[decodeBatch]]. Narrow map, no shuffle. */
  def featureBatch(
      df: DataFrame,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[ByteFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          var upper = 0L; var digit = 0L; var space = 0L; var nonAscii = 0L
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            if (b >= 'A' && b <= 'Z') upper += 1
            else if (b >= '0' && b <= '9') digit += 1
            else if (b == ' ') space += 1
            if (b > 0x7f) nonAscii += 1
            i += 1
          }
          ByteFeatures(id, bytes.length.toLong, upper, digit, space, nonAscii)
        }
      }
  }
}
