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
    *     descriptor's little-endian width/height at offsets 6/8;
    *   - BMP — `BM` magic, then the DIB header at offset 14:
    *     BITMAPCOREHEADER (size 12) carries little-endian u16 dims at
    *     18/20, every later header signed-le32 dims at 18/22 (height
    *     negative = top-down row order — magnitude is the pixel height).
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
      } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
        // DIB header size must be a known BITMAPxHEADER value — 'BM' alone
        // matches arbitrary binaries; width must be positive (only height
        // may legally be negative, meaning top-down row order)
        val dib = u8(b, 14) | (u8(b, 15) << 8) | (u8(b, 16) << 16) |
          (u8(b, 17) << 24)
        if (dib == 12) ("bmp", le16(b, 18), le16(b, 20))
        else if (dib == 40 || dib == 52 || dib == 56 || dib == 108 ||
            dib == 124) {
          val w = u8(b, 18) | (u8(b, 19) << 8) | (u8(b, 20) << 16) |
            (u8(b, 21) << 24)
          val h = u8(b, 22) | (u8(b, 23) << 8) | (u8(b, 24) << 16) |
            (u8(b, 25) << 24)
          if (w > 0) ("bmp", w, math.abs(h)) else ("bin", 0, 0)
        } else ("bin", 0, 0)
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

  // ======================= AUDIO (RIFF/WAVE) =======================

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32u(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def fourCC(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Parsed geometry of a PCM RIFF/WAVE payload — the audio twin of
    * [[HeaderDecoder.parse]]: (channels, sample_rate, bits, block_align,
    * data_offset, data_bytes), found by the standard chunk walk (`fmt `
    * and `data` may be separated by LIST/fact/other chunks; chunk bodies
    * pad to even length — RIFF spec). `data_bytes` is truncated to whole
    * frames and to the bytes actually present (a clipped download parses
    * to its playable prefix rather than refusing). None when the payload
    * is not a PCM (`wFormatTag = 1`) WAV. */
  private[graft] def wavParse(
      b: Array[Byte]): Option[(Int, Int, Int, Int, Int, Long)] = {
    if (b.length < 44 || fourCC(b, 0) != "RIFF" || fourCC(b, 8) != "WAVE")
      return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    while (i + 8 <= b.length) {
      val id = fourCC(b, i)
      val size = le32u(b, i + 4)
      val body = i + 8
      // a declared chunk size that overruns the buffer would advance `i`
      // past the end (or, near Int.MaxValue, wrap it negative and crash
      // the fourCC read) — treat as corrupt, not-a-WAV, EXCEPT for the
      // `data` chunk, which legitimately clips (truncated download) and
      // returns below before any advance
      if (id != "data" && size > (b.length - body).toLong) return None
      if (id == "fmt ") {
        if (body + 16 > b.length) return None
        if (le16(b, body) != 1) return None // PCM only
        fmt = Some((le16(b, body + 2), le32u(b, body + 4).toInt,
          le16(b, body + 14), le16(b, body + 12)))
      } else if (id == "data") {
        return fmt.collect {
          case (ch, rate, bits, ba) if ch > 0 && rate > 0 && ba > 0 =>
            val avail = math.max(0L, math.min(size, (b.length - body).toLong))
            (ch, rate, bits, ba, body, avail - avail % ba)
        }
      }
      i = body + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Encode interleaved PCM16 samples as a canonical 44-byte-header
    * RIFF/WAVE payload — the write-side twin of [[wavParse]] (round-trip
    * pinned in spec; the x159/x160 gates decode REAL WAV bytes produced
    * here, mirroring x158's PNG/BMP round-trip). `samples.length` must be
    * a multiple of `channels`. */
  def packWav(
      samples: Array[Short], channels: Int, sampleRate: Int): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"${samples.length} samples do not tile $channels channels")
    require(sampleRate >= 1, s"sampleRate must be >= 1, got $sampleRate")
    val dataBytes = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Channel-0 PCM16 sample of frame `f` (signed little-endian). */
  private def pcm16Frame0(b: Array[Byte], dataOff: Int, blockAlign: Int,
      f: Long): Int = {
    val off = dataOff + f * blockAlign
    (b((off + 1).toInt).toInt << 8) | (b(off.toInt) & 0xff)
  }

  /** Typed audio metadata — header chunk walk only, sample bytes never
    * touched (the cheap path a 100 TB metadata filter takes before any
    * decode; keep payloads in their own parquet column so this projection
    * never reads them for non-WAV filters). `ok = false` marks payloads
    * that are not PCM WAV. `n_frames` counts per-channel sample frames;
    * `duration_ms = ⌊n_frames·1000 / sample_rate⌋`. */
  final case class WavMeta(
      doc_id: Long,
      ok: Boolean,
      channels: Int,
      sample_rate: Int,
      bits: Int,
      n_frames: Long,
      duration_ms: Long)

  def wavMetaBatch(
      df: DataFrame,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[WavMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        wavParse(bytes) match {
          case Some((ch, rate, bits, ba, _, dataBytes)) =>
            val frames = dataBytes / ba
            WavMeta(id, ok = true, ch, rate, bits, frames,
              frames * 1000L / rate)
          case None => WavMeta(id, ok = false, 0, 0, 0, 0L, 0L)
        }
      })
  }

  /** Full-scan audio features over every PCM16 sample (all channels):
    * `sum_abs` (exact integer loudness mass — the quality-filter signal)
    * and `peak_abs` (clipping detector). `ok = false` when the payload is
    * not PCM16 WAV. Narrow map, no shuffle — the decode → feature stage
    * of a multimodal pipeline, like [[featureBatch]] for images. */
  final case class AudioStats(
      doc_id: Long,
      ok: Boolean,
      channels: Int,
      sample_rate: Int,
      bits: Int,
      n_frames: Long,
      duration_ms: Long,
      sum_abs: Long,
      peak_abs: Int)

  def audioStatsBatch(
      df: DataFrame,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[AudioStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        wavParse(bytes) match {
          case Some((ch, rate, bits, ba, off, dataBytes))
              if bits == 16 && ba == 2 * ch =>
            val frames = dataBytes / ba
            var sum = 0L; var peak = 0
            val nSamples = (dataBytes / 2).toInt
            var s = 0
            while (s < nSamples) {
              val v = (bytes(off + 2 * s + 1).toInt << 8) |
                (bytes(off + 2 * s) & 0xff)
              val a = math.abs(v)
              sum += a
              if (a > peak) peak = a
              s += 1
            }
            AudioStats(id, ok = true, ch, rate, bits, frames,
              frames * 1000L / rate, sum, peak)
          case _ => AudioStats(id, ok = false, 0, 0, 0, 0L, 0L, 0L, 0)
        }
      })
  }

  /** Evenly spaced PCM frame sampling — the audio frame-sample stage
    * (decode → sample → feature-extract): position `pos ∈ [0, nFrames)`
    * reads channel-0 of frame `⌊pos·n_frames/nFrames⌋`. Payloads that are
    * not PCM16 (or hold no frames) emit no rows — filter on
    * [[wavMetaBatch]]'s `ok` upstream to audit them. Narrow map. */
  final case class AudioFrame(
      doc_id: Long, pos: Int, frame_idx: Long, sample: Int)

  def sampleAudioFrames(
      df: DataFrame,
      nFrames: Int,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[AudioFrame] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        wavParse(bytes) match {
          case Some((ch, _, bits, ba, off, dataBytes))
              if bits == 16 && ba == 2 * ch && dataBytes >= ba =>
            val n = dataBytes / ba
            (0 until nFrames).map { pos =>
              val f = pos.toLong * n / nFrames
              AudioFrame(id, pos, f, pcm16Frame0(bytes, off, ba, f))
            }
          case _ => Nil
        }
      })
  }

  /** 64-bit ENERGY-GRADIENT fingerprint — the audio twin of [[dHash64]]
    * (dHash's construction applied to the loudness envelope, as in
    * Haitsma–Kalker energy-difference audio fingerprinting): the frame
    * stream splits into 65 equal windows (window `i` covers frames
    * [⌊i·n/65⌋, ⌊(i+1)·n/65⌋)), `energy_i` = Σ|sample| over the window's
    * frames (all channels, exact integers), and bit `i` is set iff
    * `energy_i·cnt_{i+1} > energy_{i+1}·cnt_i` (cross-multiplied in
    * BigInt — never floating division — so the fingerprint is
    * bit-reproducible on any engine from the same samples; the x160
    * oracle re-derives it in SQL). Envelope SIGNS survive resampling and
    * amplitude-preserving re-encodes, which is what makes equal
    * fingerprints mean "the same recording" across sample rates; a
    * locally edited window flips only the two comparisons it touches.
    * None unless PCM16 with ≥ 65 frames. */
  def audioFingerprint64(payload: Array[Byte]): Option[Long] =
    wavParse(payload).flatMap {
      case (ch, _, bits, ba, off, dataBytes) if bits == 16 && ba == 2 * ch =>
        val n = dataBytes / ba
        if (n < 65) None
        else {
          val energy = new Array[Long](65)
          val cnt = new Array[Long](65)
          var w = 0
          while (w < 65) {
            val f0 = w * n / 65; val f1 = (w + 1) * n / 65
            var e = 0L
            var f = f0
            while (f < f1) {
              var c = 0
              while (c < ch) {
                val so = (off + f * ba + 2 * c).toInt
                e += math.abs((payload(so + 1).toInt << 8) |
                  (payload(so) & 0xff))
                c += 1
              }
              f += 1
            }
            energy(w) = e
            cnt(w) = f1 - f0
            w += 1
          }
          var hash = 0L
          var i = 0
          while (i < 64) {
            if (BigInt(energy(i)) * cnt(i + 1) >
                BigInt(energy(i + 1)) * cnt(i))
              hash |= 1L << i
            i += 1
          }
          Some(hash)
        }
      case _ => None
    }

  /** One row per payload: (doc_id, ok, afp) — [[audioFingerprint64]] in
    * the once-per-partition batch shape. Pair via
    * [[Dedup.hammingPairs64]], exactly like image phashes. */
  final case class AudioFp(doc_id: Long, ok: Boolean, afp: Long)

  def audioFingerprintBatch(
      df: DataFrame,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[AudioFp] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        audioFingerprint64(bytes) match {
          case Some(fp) => AudioFp(id, ok = true, fp)
          case None => AudioFp(id, ok = false, 0L)
        }
      })
  }

  // =================== VIDEO (ISO BMFF / MP4 headers) ===================

  private def be32u(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32u(b, i) << 32) | be32u(b, i + 4)

  /** Parsed header geometry of an ISO BMFF (MP4) payload — what a real
    * corpus's videos actually are (the GVID frame-stream stands in only
    * for pixel access). HEADER-ONLY, exactly like [[wavParse]]: a box
    * walk over `ftyp` (major brand) and the `moov` tree — `mvhd`
    * (timescale + duration, version 0 and 1 layouts), `tkhd` per track
    * (16.16 fixed-point presentation dims; the first track with a
    * nonzero width supplies them), and the first `stsd` sample entry's
    * format fourcc (the codec a curation filter routes on). Media data
    * (`mdat`) is never touched. Returns (brand, n_tracks, timescale,
    * duration, width, height, codec); None when the payload is not a
    * (whole-header) MP4 or any box size overruns its container —
    * corrupt/adversarial sizes refuse, never crash (the [[wavParse]]
    * contract). */
  private[graft] def mp4Parse(
      b: Array[Byte]): Option[(String, Int, Long, Long, Int, Int, String)] = {
    if (b.length < 12 || fourCC(b, 4) != "ftyp") return None
    val brand = fourCC(b, 8)
    var timescale = 0L; var duration = 0L
    var w = 0; var h = 0; var nTracks = 0; var codec = ""
    var sawMoov = false
    // containers we descend into; leaf boxes parse in place. Depth is
    // bounded by the fixed moov>trak>mdia>minf>stbl nesting.
    def walk(start: Int, end: Int): Boolean = {
      var i = start
      while (i + 8 <= end) {
        val size32 = be32u(b, i)
        var hdr = 8
        val size: Long =
          if (size32 == 1L) {
            if (i + 16 > end) return false
            hdr = 16; be64(b, i + 8)
          } else if (size32 == 0L) (end - i).toLong // box runs to the end
          else size32
        if (size < hdr || i + size > end) return false // overrun = corrupt
        val typ = fourCC(b, i + 4)
        val body = i + hdr
        val bodyEnd = (i + size).toInt
        typ match {
          case "moov" =>
            sawMoov = true
            if (!walk(body, bodyEnd)) return false
          case "trak" =>
            nTracks += 1
            if (!walk(body, bodyEnd)) return false
          case "mdia" | "minf" | "stbl" =>
            if (!walk(body, bodyEnd)) return false
          case "mvhd" =>
            if (body + 1 > bodyEnd) return false
            if ((b(body) & 0xff) == 1) { // version 1: 64-bit times
              if (body + 32 > bodyEnd) return false
              timescale = be32u(b, body + 20)
              duration = be64(b, body + 24)
            } else {
              if (body + 20 > bodyEnd) return false
              timescale = be32u(b, body + 12)
              duration = be32u(b, body + 16)
            }
          case "tkhd" =>
            if (body + 1 > bodyEnd) return false
            val (wo, ho) = if ((b(body) & 0xff) == 1) (88, 92) else (76, 80)
            if (body + ho + 4 <= bodyEnd && w == 0) {
              val tw = (be32u(b, body + wo) >> 16).toInt // 16.16 fixed
              val th = (be32u(b, body + ho) >> 16).toInt
              if (tw > 0) { w = tw; h = th }
            }
          case "stsd" =>
            // fullbox(4) + entry_count(4), then entry: size(4) + format(4)
            if (codec.isEmpty && body + 16 <= bodyEnd)
              codec = fourCC(b, body + 12)
          case _ => () // mdat, free, skip — never read
        }
        i = (i + size).toInt
      }
      true
    }
    if (!walk(0, b.length) || !sawMoov || timescale <= 0) None
    else Some((brand, nTracks, timescale, duration, w, h, codec))
  }

  private def bmffBox(typ: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
    bb.array()
  }

  /** Synthesize a minimal-box MP4 header — the write-side twin of
    * [[mp4Parse]] ([[packWav]]'s role for the x167 gate): `ftyp(brand)`
    * then `moov[mvhd(v0)` + per track `trak[tkhd + mdia[minf[stbl[
    * stsd(codec)]]]]]`. Real players need sample tables this does not
    * carry; the HEADER geometry (brands, times, fixed-point dims, codec
    * fourcc) is bit-faithful to the spec layouts, which is all the
    * header parser — and a metadata-level curation pipeline — reads. */
  def packMp4(
      brand: String, timescale: Int, duration: Long,
      tracks: Seq[(Int, Int, String)]): Array[Byte] = {
    require(brand.length == 4, s"brand must be a fourcc, got '$brand'")
    require(timescale >= 1, s"timescale must be >= 1, got $timescale")
    require(duration >= 0 && duration <= Int.MaxValue,
      s"version-0 boxes carry 32-bit durations, got $duration")
    require(tracks.forall(_._3.length == 4), "codec must be a fourcc")
    val ftyp = {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.put(brand.getBytes("US-ASCII")).putInt(0)
        .put(brand.getBytes("US-ASCII"))
      bmffBox("ftyp", bb.array())
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // creation / modification
        .putInt(timescale).putInt(duration.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort) // rate, volume
        .position(36) // 10 reserved bytes
      bb.putInt(0x00010000).putInt(0).putInt(0) // unity matrix
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
        .position(96) // 24 pre_defined bytes
      bb.putInt(tracks.length + 1) // next_track_ID
      bmffBox("mvhd", bb.array())
    }
    val traks = tracks.zipWithIndex.map { case ((w, h, codec), ti) =>
      val tkhd = {
        val bb = java.nio.ByteBuffer.allocate(84)
        bb.putInt(7) // version 0, flags: enabled|in-movie|in-preview
          .putInt(0).putInt(0) // creation / modification
          .putInt(ti + 1).putInt(0) // track_ID, reserved
          .putInt(duration.toInt)
          .position(40) // reserved(8) + layer(2) + alt(2) + vol(2) + res(2)
        bb.putInt(0x00010000).putInt(0).putInt(0) // unity matrix
          .putInt(0).putInt(0x00010000).putInt(0)
          .putInt(0).putInt(0).putInt(0x40000000)
        bb.putInt(w << 16).putInt(h << 16) // 16.16 fixed-point dims
        bmffBox("tkhd", bb.array())
      }
      val stsd = {
        val bb = java.nio.ByteBuffer.allocate(24)
        bb.putInt(0).putInt(1) // fullbox, entry_count = 1
          .putInt(16).put(codec.getBytes("US-ASCII")) // sample entry
          .position(20)
        bb.putShort(0).putShort(1) // reserved tail + data_ref_index
        bmffBox("stsd", bb.array())
      }
      val mdia = bmffBox("mdia", bmffBox("minf", bmffBox("stbl", stsd)))
      bmffBox("trak", tkhd ++ mdia)
    }
    ftyp ++ bmffBox("moov", mvhd ++ traks.flatten)
  }

  /** Typed MP4 header metadata in the once-per-partition batch shape —
    * `ok = false` marks payloads that are not (whole-header) MP4.
    * `duration_ms = ⌊duration·1000 / timescale⌋`. */
  final case class Mp4Meta(
      doc_id: Long,
      ok: Boolean,
      brand: String,
      n_tracks: Int,
      duration_ms: Long,
      width: Int,
      height: Int,
      codec: String)

  def mp4MetaBatch(
      df: DataFrame,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[Mp4Meta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        mp4Parse(bytes) match {
          case Some((brand, nTracks, ts, dur, w, h, codec)) =>
            Mp4Meta(id, ok = true, brand, nTracks, dur * 1000L / ts, w, h,
              codec)
          case None => Mp4Meta(id, ok = false, "", 0, 0L, 0, 0, "")
        }
      })
  }

  // ========================= AUDIO (MP3) =========================

  /** MPEG-1/2/2.5 Layer III bitrate tables (kbps), by bitrate_index
    * 1–14 (0 = "free" and 15 = invalid both refuse — a free-bitrate
    * stream needs frame-sync scanning, not header arithmetic). */
  private val Mp3BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** Sample-rate tables by version: index 0–2 (3 is reserved). */
  private val Mp3SampleRateV1 = Array(44100, 48000, 32000)
  private val Mp3SampleRateV2 = Array(22050, 24000, 16000)
  private val Mp3SampleRateV25 = Array(11025, 12000, 8000)

  /** Parsed header geometry of an MP3 (MPEG audio Layer III) payload —
    * with WAV ([[wavParse]]) and MP4 ([[mp4Parse]]) this covers what a
    * real crawl's audio actually is. HEADER-ONLY: an optional ID3v2 tag
    * is SKIPPED via its syncsafe size (never read), then the first
    * frame header's 4 bytes decode version / bitrate / sample rate /
    * channel mode from the spec tables; frame count and duration are
    * the CBR estimate ⌊payload / frame_len⌋ (the standard header-level
    * answer — exact VBR duration needs a full frame walk a metadata
    * filter should never pay). Returns (version, bitrate_kbps,
    * sample_rate, channels, frames, duration_ms); None for anything
    * that is not a whole-frame Layer III stream — reserved version/
    * rate bits, free bitrate, Layer I/II, a tag with no audio after
    * it, torn syncsafe bytes — corrupt/adversarial payloads refuse,
    * never crash (the [[wavParse]] contract). */
  private[graft] def mp3Parse(
      b: Array[Byte]): Option[(String, Int, Int, Int, Long, Long)] = {
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe u28: four bytes, high bit clear on each (else torn tag)
      if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return None
      val tagSize = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      off = 10 + tagSize
      if (off < 0 || off > b.length) return None // tag overruns payload
    }
    if (off + 4 > b.length) return None
    if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xe0) != 0xe0) return None
    val versionBits = (b(off + 1) >> 3) & 3
    val layerBits = (b(off + 1) >> 1) & 3
    if (versionBits == 1 || layerBits != 1) return None // reserved / not L3
    val brIdx = (b(off + 2) >> 4) & 0xf
    val srIdx = (b(off + 2) >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val padding = (b(off + 2) >> 1) & 1
    val channels = if (((b(off + 3) >> 6) & 3) == 3) 1 else 2
    val (version, bitrate, sampleRate, spf) = versionBits match {
      case 3 => ("1", Mp3BitrateV1L3(brIdx), Mp3SampleRateV1(srIdx), 1152)
      case 2 => ("2", Mp3BitrateV2L3(brIdx), Mp3SampleRateV2(srIdx), 576)
      case _ => ("2.5", Mp3BitrateV2L3(brIdx), Mp3SampleRateV25(srIdx), 576)
    }
    val frameBytes = spf / 8 * bitrate * 1000 / sampleRate + padding
    val frames = ((b.length - off) / frameBytes).toLong
    if (frames < 1) return None // clipped before one whole frame
    Some((version, bitrate, sampleRate, channels, frames,
      frames * spf * 1000L / sampleRate))
  }

  /** Synthesize a CBR Layer III stream — [[mp3Parse]]'s write-side twin
    * ([[packWav]]'s role, for the x172 gate): an optional zero-padded
    * ID3v2.4 tag with a bit-faithful syncsafe size, then `nFrames`
    * frames each opening with a spec-layout header (padding bit clear)
    * and filled to the exact CBR frame length. The fill is not decodable
    * audio — the header fields and frame arithmetic, which is all the
    * parser and a metadata-level filter read, are bit-faithful. */
  def packMp3(
      version: String, bitrateIdx: Int, srIdx: Int, mono: Boolean,
      nFrames: Int, id3Bytes: Int = 0): Array[Byte] = {
    val versionBits = version match {
      case "1" => 3
      case "2" => 2
      case "2.5" => 0
      case v => throw new IllegalArgumentException(
        s"version must be 1, 2 or 2.5, got '$v'")
    }
    require(bitrateIdx >= 1 && bitrateIdx <= 14,
      s"bitrate index must be in 1..14, got $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2,
      s"sample-rate index must be in 0..2, got $srIdx")
    require(nFrames >= 1, s"need at least one frame, got $nFrames")
    require(id3Bytes >= 0 && id3Bytes < (1 << 28),
      s"ID3v2 size must fit a syncsafe u28, got $id3Bytes")
    val bos = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      bos.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      bos.write(Array[Byte](((id3Bytes >> 21) & 0x7f).toByte,
        ((id3Bytes >> 14) & 0x7f).toByte, ((id3Bytes >> 7) & 0x7f).toByte,
        (id3Bytes & 0x7f).toByte))
      bos.write(new Array[Byte](id3Bytes))
    }
    val (bitrate, sampleRate, spf) = versionBits match {
      case 3 => (Mp3BitrateV1L3(bitrateIdx), Mp3SampleRateV1(srIdx), 1152)
      case 2 => (Mp3BitrateV2L3(bitrateIdx), Mp3SampleRateV2(srIdx), 576)
      case _ => (Mp3BitrateV2L3(bitrateIdx), Mp3SampleRateV25(srIdx), 576)
    }
    val frameBytes = spf / 8 * bitrate * 1000 / sampleRate
    val header = Array[Byte](0xff.toByte,
      (0xe0 | (versionBits << 3) | (1 << 1) | 1).toByte, // L3, no CRC
      ((bitrateIdx << 4) | (srIdx << 2)).toByte, // padding 0, private 0
      (if (mono) 0xc0 else 0x00).toByte)
    val frame = new Array[Byte](frameBytes)
    System.arraycopy(header, 0, frame, 0, 4)
    java.util.Arrays.fill(frame, 4, frameBytes, 0x55.toByte)
    (1 to nFrames).foreach(_ => bos.write(frame))
    bos.toByteArray
  }

  /** Typed MP3 header metadata in the once-per-partition batch shape —
    * `ok = false` marks payloads that are not whole-frame Layer III. */
  final case class Mp3Meta(
      doc_id: Long,
      ok: Boolean,
      version: String,
      bitrate_kbps: Int,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long)

  def mp3MetaBatch(
      df: DataFrame,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[Mp3Meta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        mp3Parse(bytes) match {
          case Some((ver, br, sr, ch, frames, durMs)) =>
            Mp3Meta(id, ok = true, ver, br, sr, ch, frames, durMs)
          case None => Mp3Meta(id, ok = false, "", 0, 0, 0, 0L, 0L)
        }
      })
  }

  // ================== UNIFIED MEDIA-TYPE DISPATCH ==================

  /** One typed-metadata row for ANY payload — the dispatcher a mixed
    * media lake filters on before any modality-specific decode:
    * magic-byte dispatch to the image header parser ([[HeaderDecoder]]),
    * the WAV chunk walk ([[wavParse]]), the MP4 box walk ([[mp4Parse]] —
    * presentation dims + mvhd duration; brand/codec detail via
    * [[mp4MetaBatch]]), the MP3 frame-header decode ([[mp3Parse]] —
    * channels / sample rate / CBR frame count and duration), or the
    * GVID container header (frame count +
    * FIRST frame's image header for dimensions — headers only, no
    * pixel/sample decode anywhere on this path). Fields not meaningful
    * for a type are 0; unrecognized payloads are `bin`. */
  final case class MediaTypeMeta(
      doc_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      channels: Int,
      sample_rate: Int,
      n_frames: Long,
      duration_ms: Long,
      n_bytes: Long)

  def mediaMeta(id: Long, payload: Array[Byte]): MediaTypeMeta = {
    val n = payload.length.toLong
    val (imgFmt, iw, ih) = HeaderDecoder.parse(payload)
    if (imgFmt != "bin")
      MediaTypeMeta(id, imgFmt, iw, ih, 0, 0, 1L, 0L, n)
    else wavParse(payload) match {
      case Some((ch, rate, _, ba, _, dataBytes)) =>
        val frames = dataBytes / ba
        MediaTypeMeta(id, "wav", 0, 0, ch, rate, frames,
          frames * 1000L / rate, n)
      case None => mp4Parse(payload) match {
        case Some((_, _, ts, dur, mw, mh, _)) =>
          MediaTypeMeta(id, "mp4", mw, mh, 0, 0, 0L, dur * 1000L / ts, n)
        case None => mp3Parse(payload) match {
          case Some((_, _, sr, ch, frames, durMs)) =>
            MediaTypeMeta(id, "mp3", 0, 0, ch, sr, frames, durMs, n)
          case None => unpackVideo(payload) match {
            case Some(frames) =>
              val (_, fw, fh) = frames.headOption
                .map(HeaderDecoder.parse).getOrElse(("bin", 0, 0))
              MediaTypeMeta(id, "video", fw, fh, 0, 0, frames.length.toLong,
                0L, n)
            case None => MediaTypeMeta(id, "bin", 0, 0, 0, 0, 0L, 0L, n)
          }
        }
      }
    }
  }

  /** [[mediaMeta]] in the once-per-partition batch shape. */
  def mediaMetaBatch(
      df: DataFrame,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[MediaTypeMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => mediaMeta(id, bytes) })
  }

  // =================== VIDEO (frame-stream container) ===================

  /** Minimal frame-stream container for video payloads: `GVID` magic,
    * big-endian u32 frame count, u32 per-frame byte lengths, then the
    * concatenated frame payloads (each a self-contained image encoding —
    * PNG/BMP decode offline via ImageIO). A REAL codec (H.264, VP9)
    * belongs to a [[BinaryDecoder]]-style plug-in this container stands
    * in for in the offline build; the Spark-side plumbing it exercises —
    * binary schema, frame sampling, per-frame perceptual hashing, the
    * near-dup join — is real and gate-tested (x162). */
  def packVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GVID")
    out.writeInt(frames.length)
    frames.foreach(f => out.writeInt(f.length))
    frames.foreach(out.write)
    out.flush()
    bos.toByteArray
  }

  /** The container's frames, or None when the payload is not a (complete)
    * GVID stream. */
  private[graft] def unpackVideo(b: Array[Byte]): Option[Array[Array[Byte]]] = {
    if (b.length < 8 || fourCC(b, 0) != "GVID") return None
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(b))
    in.skipBytes(4)
    val n = in.readInt()
    if (n < 0 || b.length < 8L + 4L * n) return None
    val lens = Array.fill(n)(in.readInt())
    if (lens.exists(_ < 0) ||
        8L + 4L * n + lens.map(_.toLong).sum > b.length) return None
    Some(lens.map { len => val f = new Array[Byte](len); in.readFully(f); f })
  }

  /** Every `everyK`-th frame (0, k, 2k, …) perceptual-hashed — frame
    * sampling fused with [[dHash64]] so unsampled frame bytes are never
    * decoded. `ok = false` rows mark sampled frames that did not decode;
    * a non-GVID payload emits a single (frame_idx = -1, ok = false) row
    * so undecodable payloads stay auditable. Narrow map, no shuffle. */
  final case class VideoFrameHash(
      doc_id: Long, frame_idx: Int, ok: Boolean, phash: Long)

  def videoFrameHashes(
      df: DataFrame,
      everyK: Int = 1,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[VideoFrameHash] = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        unpackVideo(bytes) match {
          case Some(frames) =>
            (0 until frames.length by everyK).map { fi =>
              dHash64(frames(fi)) match {
                case Some(hs) => VideoFrameHash(id, fi, ok = true, hs)
                case None => VideoFrameHash(id, fi, ok = false, 0L)
              }
            }
          case None => Seq(VideoFrameHash(id, -1, ok = false, 0L))
        }
      })
  }

  /** Video near-dup pairs from sampled frame hashes: two videos match
    * when they share at least `minShared` DISTINCT frame perceptual
    * hashes — the shingle-join pattern ([[Dedup]]'s n-gram posture)
    * applied to frame fingerprints: distinct (video, phash) → equi-join
    * on the 64-bit hash → group-count. Cost rides shared-frame
    * collisions, never O(n²) in videos. A pathological corpus-wide
    * common frame (a black lead-in, a studio logo card) behaves like a
    * stopword shingle — one hash shared by f videos contributes f²/2
    * join rows while carrying no discriminating signal; `maxFrameDf`
    * is the stopword cap (the inverted index's posture): hashes whose
    * video-document-frequency exceeds it are dropped BEFORE the join,
    * bounding the blow-up, and true duplicates still pair on their
    * distinctive frames. Input: `ok`-filtered [[videoFrameHashes]] rows
    * (or any (id, hash) relation). */
  def videoNearDupPairs(
      hashes: DataFrame,
      minShared: Int,
      idCol: String = "doc_id",
      hashCol: String = "phash",
      maxFrameDf: Int = Int.MaxValue): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxFrameDf >= 1, s"maxFrameDf must be >= 1, got $maxFrameDf")
    val distinctH = hashes
      .select(col(idCol).cast("long").as("gid"),
        col(hashCol).cast("long").as("ph"))
      .distinct()
    // document frequency over DISTINCT (video, hash) rows; map-side
    // partial counts, then a semi-join keeps only sub-cap hashes
    val h =
      if (maxFrameDf == Int.MaxValue) distinctH
      else distinctH.join(
        distinctH.groupBy(col("ph")).agg(count(lit(1)).as("graft_df"))
          .filter(col("graft_df") <= maxFrameDf).select(col("ph")),
        Seq("ph"), "left_semi")
    h.as("a").join(h.as("b"),
        col("a.ph") === col("b.ph") && col("a.gid") < col("b.gid"))
      .groupBy(col("a.gid").as("id_a"), col("b.gid").as("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
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
