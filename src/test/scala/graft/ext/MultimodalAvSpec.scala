package graft.ext

import graft.SparkSpec

/** Audio (RIFF/WAVE) + video (GVID frame-stream) multimodal operators:
  * encode/parse round-trips, exact feature arithmetic, fingerprint
  * invariances, and the near-dup joins. The oracle-facing behavior is
  * gated by x159–x162; this spec pins the library contracts those gates
  * compose. */
class MultimodalAvSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, lit}

  /** 65 windows × `w` frames of constant positive amplitude per window —
    * the envelope construction the x160 gate uses: window `i` of wave
    * group `g` holds samples of value `amp(g,i)·100`. */
  private def amp(g: Int, i: Int): Int =
    (g * 31 + i * 53 + (i * i * (g + 7)) % 29) % 199

  private def wave(g: Int, w: Int, rate: Int,
      edit: Option[Int] = None): Array[Byte] = {
    val samples = new Array[Short](65 * w)
    for (i <- 0 until 65; j <- 0 until w) {
      val a = edit match {
        case Some(ei) if ei == i => (amp(g, i) + 97) % 199
        case _ => amp(g, i)
      }
      samples(i * w + j) = (a * 100).toShort
    }
    Multimodal.packWav(samples, channels = 1, sampleRate = rate)
  }

  test("packWav/wavParse round-trip; refusals for non-RIFF and non-PCM") {
    val b = wave(3, 16, 8000)
    val Some((ch, rate, bits, ba, off, dataBytes)) = Multimodal.wavParse(b)
    assert((ch, rate, bits, ba) == (1, 8000, 16, 2))
    assert(dataBytes == 65L * 16 * 2 && off == 44)
    // stereo geometry
    val st = Multimodal.packWav(Array[Short](1, 2, 3, 4), 2, 44100)
    assert(Multimodal.wavParse(st).get._1 == 2)
    assert(Multimodal.wavParse(st).get._4 == 4) // block align
    // refusals
    assert(Multimodal.wavParse("not audio at all".getBytes).isEmpty)
    val nonPcm = b.clone(); nonPcm(20) = 3 // wFormatTag = IEEE float
    assert(Multimodal.wavParse(nonPcm).isEmpty)
    // a clipped download parses to its playable whole-frame prefix
    val clipped = java.util.Arrays.copyOf(b, b.length - 3)
    val Some((_, _, _, _, _, clippedBytes)) = Multimodal.wavParse(clipped)
    assert(clippedBytes == (b.length - 3 - 44) / 2 * 2)
  }

  test("wavParse walks past interposed chunks to find fmt/data") {
    val plain = wave(1, 16, 8000)
    // splice a LIST chunk (odd-sized body → padded) between fmt and data
    val head = java.util.Arrays.copyOfRange(plain, 0, 36)
    val tail = java.util.Arrays.copyOfRange(plain, 36, plain.length)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(head)
    bos.write("LIST".getBytes("US-ASCII"))
    bos.write(Array[Byte](5, 0, 0, 0)) // size 5 LE
    bos.write("INFOx".getBytes("US-ASCII"))
    bos.write(0) // even-length pad
    bos.write(tail)
    val spliced = bos.toByteArray
    assert(Multimodal.wavParse(spliced).map(t => (t._1, t._2, t._6)) ==
      Some((1, 8000, 65L * 16 * 2)))
  }

  test("wavParse refuses corrupt chunk sizes instead of crashing") {
    val plain = wave(1, 16, 8000)
    // a non-fmt/non-data chunk whose declared size overruns the buffer
    // (adversarial: near Int.MaxValue, which would wrap the cursor
    // negative and crash the fourCC read if advanced)
    val head = java.util.Arrays.copyOfRange(plain, 0, 36)
    val tail = java.util.Arrays.copyOfRange(plain, 36, plain.length)
    def spliceList(sizeLe: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(head)
      bos.write("LIST".getBytes("US-ASCII"))
      bos.write(sizeLe)
      bos.write("INFO".getBytes("US-ASCII"))
      bos.write(tail)
      bos.toByteArray
    }
    // size 0x7ffffff0 — parses to None, never throws
    assert(Multimodal.wavParse(
      spliceList(Array[Byte](0xf0.toByte, 0xff.toByte, 0xff.toByte, 0x7f))
    ).isEmpty)
    // size just past the remaining bytes — also corrupt, also None
    assert(Multimodal.wavParse(
      spliceList(Array[Byte](0xff.toByte, 0xff.toByte, 0, 0))).isEmpty)
    // a clipped DATA chunk still parses to its playable prefix (the
    // legitimate overrun the guard must not reject)
    val clipped = java.util.Arrays.copyOf(plain, plain.length - 10)
    assert(Multimodal.wavParse(clipped).nonEmpty)
  }

  test("BMP branch rejects unknown DIB sizes and non-positive widths") {
    def bm(dib: Int, w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(26)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(26).putInt(0).putInt(26)
        .putInt(dib).putInt(w).putInt(h)
      b.array()
    }
    assert(Multimodal.HeaderDecoder.parse(bm(40, 18, 16)) == ("bmp", 18, 16))
    assert(Multimodal.HeaderDecoder.parse(bm(108, 18, -16)) ==
      ("bmp", 18, 16), "negative height = top-down rows, magnitude kept")
    // arbitrary binary starting 'BM' with a junk DIB size is NOT a bmp
    assert(Multimodal.HeaderDecoder.parse(bm(0x2020, 18, 16)) ==
      ("bin", 0, 0))
    // a crafted negative width is corrupt, not a picture
    assert(Multimodal.HeaderDecoder.parse(bm(40, -18, 16)) == ("bin", 0, 0))
    assert(Multimodal.HeaderDecoder.parse(bm(40, 0, 16)) == ("bin", 0, 0))
  }

  test("audioStatsBatch and sampleAudioFrames are exact") {
    val payloads = Seq((1L, wave(2, 16, 8000)), (2L, "junk".getBytes()))
      .toDF("doc_id", "payload")
    val stats = Multimodal.audioStatsBatch(payloads).collect()
      .map(s => s.doc_id -> s).toMap
    assert(!stats(2L).ok)
    val s1 = stats(1L)
    val expSum = (0 until 65).map(i => amp(2, i).toLong * 100 * 16).sum
    val expPeak = (0 until 65).map(amp(2, _)).max * 100
    assert(s1.ok && s1.n_frames == 65 * 16 && s1.duration_ms == 130 &&
      s1.sum_abs == expSum && s1.peak_abs == expPeak)
    val frames = Multimodal.sampleAudioFrames(payloads, nFrames = 5)
      .collect().sortBy(_.pos)
    assert(frames.map(_.doc_id).toSet == Set(1L)) // junk emits no rows
    assert(frames.map(_.frame_idx).toSeq ==
      Seq(0L, 208L, 416L, 624L, 832L)) // ⌊pos·1040/5⌋
    assert(frames.map(_.sample).toSeq ==
      Seq(0, 13, 26, 39, 52).map(amp(2, _) * 100))
  }

  test("audioFingerprint64: window-scale invariant; local edit flips <= 2 " +
      "bits; refusals") {
    val f16 = Multimodal.audioFingerprint64(wave(5, 16, 8000)).get
    val f32 = Multimodal.audioFingerprint64(wave(5, 32, 16000)).get
    val f24 = Multimodal.audioFingerprint64(wave(5, 24, 12000)).get
    assert(f16 == f32 && f16 == f24,
      "same envelope at other rates/lengths must fingerprint identically")
    val edited = Multimodal.audioFingerprint64(
      wave(5, 16, 8000, edit = Some(5))).get
    val ham = java.lang.Long.bitCount(f16 ^ edited)
    assert(ham >= 1 && ham <= 2, s"one edited window flips 1-2 bits: $ham")
    assert(Multimodal.audioFingerprint64(
      wave(6, 16, 8000)) != Multimodal.audioFingerprint64(wave(5, 16, 8000)))
    // refusals: under 65 frames, and non-WAV
    val tiny = Multimodal.packWav(Array.fill[Short](64)(100), 1, 8000)
    assert(Multimodal.audioFingerprint64(tiny).isEmpty)
    assert(Multimodal.audioFingerprint64("nope".getBytes).isEmpty)
    // banded pairing over fingerprints mirrors the image path
    val sigs = Seq((1L, f16), (2L, f32), (3L, edited),
        (4L, Multimodal.audioFingerprint64(wave(9, 16, 8000)).get))
      .toDF("doc_id", "afp")
    val pairs = Dedup.hammingPairs64(sigs, "doc_id", "afp", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      !pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("mediaMeta dispatches by magic bytes; BMP header parse is real") {
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    // real ImageIO BMP bytes parse through the DIB header branch
    assert(Multimodal.HeaderDecoder.parse(encode("bmp", 18, 16)) ==
      ("bmp", 18, 16))
    assert(Multimodal.HeaderDecoder.parse(encode("png", 27, 24)) ==
      ("png", 27, 24))
    val img = Multimodal.mediaMeta(1L, encode("bmp", 36, 32))
    assert((img.media_type, img.width, img.height, img.n_frames) ==
      ("bmp", 36, 32, 1L))
    val aud = Multimodal.mediaMeta(2L, wave(3, 16, 8000))
    assert((aud.media_type, aud.channels, aud.sample_rate, aud.n_frames,
      aud.duration_ms) == ("wav", 1, 8000, 1040L, 130L))
    val vid = Multimodal.mediaMeta(3L,
      Multimodal.packVideo(Seq(encode("png", 18, 16), encode("png", 18, 16))))
    assert((vid.media_type, vid.width, vid.height, vid.n_frames) ==
      ("video", 18, 16, 2L))
    val bin = Multimodal.mediaMeta(4L, "just text".getBytes("UTF-8"))
    assert((bin.media_type, bin.n_bytes) == ("bin", 9L))
  }

  test("packMp4/mp4Parse round-trip; corrupt box sizes refuse, not crash") {
    val b = Multimodal.packMp4("isom", timescale = 1000, duration = 4500,
      tracks = Seq((640, 360, "avc1"), (0, 0, "mp4a")))
    val Some((brand, nTracks, ts, dur, w, h, codec)) = Multimodal.mp4Parse(b)
    assert((brand, nTracks, ts, dur) == ("isom", 2, 1000L, 4500L))
    assert((w, h) == (640, 360), "first nonzero-width track supplies dims")
    assert(codec == "avc1", "first stsd sample entry supplies the codec")
    // audio-only file: no video track, dims stay 0
    val audio = Multimodal.packMp4("M4A ", 44100, 441000,
      Seq((0, 0, "mp4a")))
    assert(Multimodal.mp4Parse(audio).get._5 == 0)
    assert(Multimodal.mp4Parse(audio).get._7 == "mp4a")
    // refusals: not BMFF, and a box size overrunning its container
    assert(Multimodal.mp4Parse("not a movie".getBytes).isEmpty)
    assert(Multimodal.mp4Parse(java.util.Arrays.copyOf(b, 40)).isEmpty)
    val corrupt = b.clone()
    // blow up the moov box's declared size (it starts right after the
    // 20-byte ftyp): 0x7fffffff overruns the buffer
    corrupt(20) = 0x7f.toByte; corrupt(21) = 0xff.toByte
    corrupt(22) = 0xff.toByte; corrupt(23) = 0xff.toByte
    assert(Multimodal.mp4Parse(corrupt).isEmpty)
    // dispatcher routes mp4 with duration arithmetic
    val m = Multimodal.mediaMeta(9L, b)
    assert((m.media_type, m.width, m.height, m.duration_ms) ==
      ("mp4", 640, 360, 4500L))
  }

  test("collapsePayloadsExact + expand/intra recover the member pair " +
      "relation with rep-level (linear) band work") {
    // 4 distinct recordings; recording 0 planted 3× byte-identical,
    // recording 1 planted 2×; 2 is a near-dup (edit) of 0; 3 unrelated
    val p0 = wave(5, 16, 8000)
    val docs = Seq(
      10L -> p0, 40L -> p0.clone(), 70L -> p0.clone(),
      20L -> wave(6, 16, 8000), 50L -> wave(6, 16, 8000),
      30L -> wave(5, 16, 8000, edit = Some(5)),
      60L -> wave(9, 16, 8000)
    ).toDF("doc_id", "payload")
    val (members, reps) = Dedup.collapsePayloadsExact(docs, "doc_id", "payload")
    assert(reps.count() == 4, "4 distinct byte strings -> 4 reps")
    assert(members.count() == 7)
    val sigs = Multimodal.audioFingerprintBatch(reps, "rid").toDF()
      .filter(col("ok")).select(col("doc_id"), col("afp"))
    val repPairs = Dedup.hammingPairs64(sigs, "doc_id", "afp", maxHamming = 3)
    // rep-level pair count is independent of the plant multiplicity
    assert(repPairs.count() == 1, "only (10, 30) pairs at rep level")
    val full = Dedup.expandRepPairs(repPairs, members)
      .unionByName(Dedup.intraRepPairs(members,
        reps.select(col("rid"), lit(0L).as("hamming"))))
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    // member level: the 0-group triangle (3), the 1-group pair (1), and
    // the near-dup edges from each 0-copy to the edit (3)
    assert(full == Set((10L, 40L, 0L), (10L, 70L, 0L), (40L, 70L, 0L),
      (20L, 50L, 0L),
      (10L, 30L, full.find(p => p._1 == 10L && p._2 == 30L).get._3),
      (30L, 40L, full.find(p => p._1 == 30L && p._2 == 40L).get._3),
      (30L, 70L, full.find(p => p._1 == 30L && p._2 == 70L).get._3)))
    // the expanded cross pairs carry the rep pair's hamming
    val crossHams = full.filter(p => Set(30L).contains(p._1) ||
      Set(30L).contains(p._2)).map(_._3)
    assert(crossHams.size == 1 || crossHams.forall(_ == crossHams.head))
  }

  test("videoNearDupPairs maxFrameDf drops corpus-wide hot frames " +
      "without losing true-dup recall") {
    // the x162 block pattern: NONLINEAR in the seed, so distinct seeds
    // produce distinct dHashes (a plain gradient is dHash-invariant
    // across seeds — every row comparison sees the same sign)
    def png(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(18, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 18) {
        val bx = x * 9 / 18; val by = y * 8 / 16
        val v = (seed * 37 + bx * 29 + by * 17 +
          (bx * by * (seed + 3)) % 13) % 199
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // every video opens with the same 3 lead-in frames (the black-intro
    // hazard); videos 1/2 are true dups (share all 4 real frames),
    // 3..8 are pairwise unrelated (modulo incidental 1-2 frame hash
    // collisions, which sit below the minShared=3 threshold)
    def vid(reals: Seq[Int]): Array[Byte] =
      Multimodal.packVideo(Seq(png(900), png(901), png(902)) ++
        reals.map(png))
    val df = (Seq(
      1L -> vid(Seq(10, 11, 12, 13)), 2L -> vid(Seq(10, 11, 12, 13))) ++
      (3L to 8L).map(i => i -> vid(Seq(20 + i.toInt * 4, 21 + i.toInt * 4,
        22 + i.toInt * 4, 23 + i.toInt * 4))))
      .toDF("doc_id", "payload")
    val hashes = Multimodal.videoFrameHashes(df, everyK = 1).toDF()
      .filter(col("ok")).select(col("doc_id"), col("phash"))
    // uncapped: the lead-ins alone pair EVERY video with every other —
    // 28 quadratic junk pairs
    val uncapped = Multimodal.videoNearDupPairs(hashes, minShared = 3)
    assert(uncapped.count() == 28)
    // capped: lead-in hashes (df=8) drop; only the true dup survives,
    // with shared_frames counted over its distinctive frames
    val capped = Multimodal.videoNearDupPairs(hashes, minShared = 3,
      maxFrameDf = 4)
    assert(capped.select("id_a", "id_b", "shared_frames")
      .as[(Long, Long, Long)].collect().toSeq == Seq((1L, 2L, 4L)))
  }

  test("GVID pack/unpack, frame sampling, and the video near-dup join") {
    def png(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(18, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 18) {
        val v = (seed * 37 + (x / 2) * 29 + (y / 2) * 17) % 199
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val vidA = Multimodal.packVideo((0 until 6).map(f => png(f)))
    val vidB = Multimodal.packVideo( // same video, one frame replaced
      (0 until 6).map(f => png(if (f == 3) 99 else f)))
    val vidC = Multimodal.packVideo((0 until 6).map(f => png(50 + f)))
    assert(Multimodal.unpackVideo(vidA).get.length == 6)
    assert(Multimodal.unpackVideo("GVIDxxxx".getBytes).isEmpty)
    assert(Multimodal.unpackVideo( // truncated frame bytes refuse
      java.util.Arrays.copyOf(vidA, vidA.length - 1)).isEmpty)
    val df = Seq((1L, vidA), (2L, vidB), (3L, vidC), (4L, "junk".getBytes))
      .toDF("doc_id", "payload")
    val hashes = Multimodal.videoFrameHashes(df, everyK = 2).collect()
    assert(hashes.filter(_.doc_id == 1L).map(_.frame_idx).sorted.toSeq ==
      Seq(0, 2, 4), "everyK=2 samples frames 0/2/4")
    assert(hashes.filter(_.doc_id == 4L).toSeq
      .map(h => (h.frame_idx, h.ok)) == Seq((-1, false)),
      "non-GVID payload emits the single audit row")
    val all = Multimodal.videoFrameHashes(df, everyK = 1).toDF()
      .filter("ok")
    val pairs = Multimodal.videoNearDupPairs(all, minShared = 5)
      .select("id_a", "id_b", "shared_frames")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 5L)),
      s"A~B share 5 of 6 frames, C shares none: $pairs")
  }

  test("packMp3/mp3Parse round-trip across versions; ID3v2 skipped by " +
      "syncsafe size; corrupt payloads refuse, not crash") {
    // V1 44.1 kHz stereo, no tag: 128 kbps frame = 144*128000/44100 = 417
    val v1 = Multimodal.packMp3("1", bitrateIdx = 9, srIdx = 0,
      mono = false, nFrames = 12)
    assert(Multimodal.mp3Parse(v1).contains(
      ("1", 128, 44100, 2, 12L, 12L * 1152 * 1000 / 44100)))
    // V2 16 kHz mono behind a 300-byte ID3v2 tag (spf 576, table V2)
    val v2 = Multimodal.packMp3("2", bitrateIdx = 4, srIdx = 2,
      mono = true, nFrames = 7, id3Bytes = 300)
    assert(Multimodal.mp3Parse(v2).contains(
      ("2", 32, 16000, 1, 7L, 7L * 576 * 1000 / 16000)))
    // V2.5 8 kHz: the low-rate tail of the table
    val v25 = Multimodal.packMp3("2.5", bitrateIdx = 1, srIdx = 2,
      mono = true, nFrames = 3)
    assert(Multimodal.mp3Parse(v25).contains(
      ("2.5", 8, 8000, 1, 3L, 3L * 576 * 1000 / 8000)))
    // refusals: junk, clipped before one whole frame, a tag overrunning
    // the payload, a torn (non-syncsafe) tag size byte, Layer II bits,
    // free bitrate, reserved sample-rate index
    assert(Multimodal.mp3Parse("not audio".getBytes).isEmpty)
    assert(Multimodal.mp3Parse(java.util.Arrays.copyOf(v1, 100)).isEmpty)
    assert(Multimodal.mp3Parse(java.util.Arrays.copyOf(v2, 200)).isEmpty,
      "tag declares 300 body bytes but payload clips at 200")
    val torn = v2.clone(); torn(6) = 0x80.toByte
    assert(Multimodal.mp3Parse(torn).isEmpty)
    val l2 = v1.clone(); l2(1) = (l2(1) & ~0x06 | 0x04).toByte
    assert(Multimodal.mp3Parse(l2).isEmpty)
    val free = v1.clone(); free(2) = (free(2) & 0x0f).toByte
    assert(Multimodal.mp3Parse(free).isEmpty)
    val badSr = v1.clone(); badSr(2) = (badSr(2) | 0x0c).toByte
    assert(Multimodal.mp3Parse(badSr).isEmpty)
    // dispatcher routes both tagged and untagged mp3
    val m = Multimodal.mediaMeta(5L, v2)
    assert((m.media_type, m.channels, m.sample_rate, m.n_frames) ==
      ("mp3", 1, 16000, 7L))
    assert(Multimodal.mediaMeta(6L, v1).media_type == "mp3")
  }
}
