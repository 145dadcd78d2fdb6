package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched per-partition feature extraction.
  *
  * Decoded for REAL in pure JVM code: WAV/PCM16 audio (RIFF chunk walk →
  * duration, sample rate, RMS envelope features), PPM P6 images (header
  * parse → dimensions, gray thumbnail features), PNG/JPEG/GIF/BMP via
  * the JDK's own javax.imageio — thumbnail features are sampled directly
  * from the decoded image at the g×g target positions — plus container
  * METADATA for MP3 (MPEG frame headers → duration/bitrate/rate) and MP4
  * (ISO-BMFF box walk + H.264 SPS exp-Golomb parse → coded dimensions,
  * duration, codec). Only the compressed-payload decode (MP3 PCM, H.264
  * frames) falls through to `decodeStub`, which derives deterministic
  * fake features from the bytes; swap it for a JNI/FFM decoder and
  * nothing else changes. Everything around the decode — schema, batch
  * shape, partition sizing, the mapPartitions contract — is the
  * production design either way.
  */
object Multimodal {

  /** Canonical media schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true),
    )), nullable = true),
  ))

  final case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      /** Codec the decoder recognized: "wav-pcm16" | "ppm-p6" | "stub". */
      codec: String,
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int],
      duration_ms: Option[Long],
      features: Array[Float],
      ok: Boolean,
      error: String,
  )

  // ---------------------------------------------------------------- WAV --

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** RIFF/WAVE PCM16 parse: walks the chunk list to `fmt ` and `data`.
    * Returns (sampleRate, channels, samples as normalized mono doubles).
    */
  private[operators] def parseWav(b: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var data: Array[Double] = null
    var halt = false
    while (!halt && off + 8 <= b.length) {
      val id = tag(b, off); val sz = le32(b, off + 4)
      // a malformed/adversarial chunk size must not hang or crash the task:
      // a negative size (or one past the buffer) ends the walk with
      // whatever was parsed so far
      if (sz < 0 || sz > b.length - off - 8) halt = true
      else {
        if (id == "fmt " && off + 8 + 16 <= b.length) {
          val fmt = le16(b, off + 8)
          channels = le16(b, off + 10)
          sampleRate = le32(b, off + 12)
          bits = le16(b, off + 22)
          if (fmt != 1 || bits != 16 || channels < 1) return None // PCM16 only
        } else if (id == "data" && sampleRate > 0) {
          val n = sz / (2 * channels)
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            // average channels to mono, normalize to [-1, 1]
            var acc = 0.0; var c = 0
            while (c < channels) {
              val s = le16(b, off + 8 + 2 * (i * channels + c)).toShort
              acc += s / 32768.0; c += 1
            }
            out(i) = acc / channels; i += 1
          }
          data = out
        }
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
    }
    if (sampleRate > 0 && data != null) Some((sampleRate, channels, data)) else None
  }

  /** RIFF/WAVE magic sniff: true = the payload CLAIMS to be a WAV, so a
    * failed `parseWav` must surface as a decode failure rather than fall
    * through to the stub (which would launder fake features as ok=true).
    */
  private[operators] def sniffWav(b: Array[Byte]): Boolean =
    b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE"

  // ---------------------------------------------------------------- MP3 --

  private val Mp3BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** MPEG audio (Layer III) METADATA from frame headers — pure JVM, no
    * native codec: skips an ID3v2 tag, walks consecutive frame headers
    * (bitrate/samplerate tables, padded frame sizes) summing samples, and
    * returns (sampleRate, avgBitrateKbps, durationMs). The payload decode
    * (feature vectors) stays stubbed behind `decodeStub` — that is the
    * native-decoder swap point.
    */
  private[graft] def parseMp3Meta(b: Array[Byte]): Option[(Int, Int, Long)] = {
    var off = 0
    if (b.length >= 10 && b(0) == 'I'.toByte && b(1) == 'D'.toByte && b(2) == '3'.toByte) {
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      off = 10 + sz
    }
    if (off < 0 || off + 4 > b.length) return None
    var frames = 0L; var samples = 0L; var kbpsSum = 0L; var rate = -1
    var i = off
    while (i + 4 <= b.length) {
      val b0 = b(i) & 0xff; val b1 = b(i + 1) & 0xff
      var advanced = false
      if (b0 == 0xff && (b1 & 0xe0) == 0xe0) {
        val verBits = (b1 >> 3) & 0x3   // 0 = MPEG2.5, 2 = MPEG2, 3 = MPEG1
        val layerBits = (b1 >> 1) & 0x3 // 1 = Layer III
        val b2 = b(i + 2) & 0xff
        val brIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 0x3
        val pad = (b2 >> 1) & 0x1
        if (verBits != 1 && layerBits == 1 && brIdx != 0 && brIdx != 15 && srIdx != 3) {
          val v1 = verBits == 3
          val kbps = if (v1) Mp3BitrateV1L3(brIdx) else Mp3BitrateV2L3(brIdx)
          val sr0 = Mp3Rates(srIdx)
          val sr = if (v1) sr0 else if (verBits == 2) sr0 / 2 else sr0 / 4
          val fsz = (if (v1) 144 else 72) * (kbps * 1000) / sr + pad
          if (fsz > 4) {
            if (rate < 0) rate = sr
            frames += 1
            samples += (if (v1) 1152 else 576)
            kbpsSum += kbps
            i += fsz
            advanced = true
          }
        }
      }
      if (!advanced) {
        // resync only while hunting for the FIRST frame; garbage after
        // valid frames ends the walk (trailing tags etc.)
        if (frames == 0) i += 1 else i = b.length
      }
    }
    // one plausible 4-byte pattern can occur by chance in arbitrary binary
    // (any 0xFF 0xEx pair with sane index bits); demand at least two
    // CONSECUTIVE valid frames before classifying the payload as mp3, so
    // unrecognized binaries keep their honest stub path
    if (frames < 2 || rate <= 0) None
    else Some((rate, (kbpsSum / frames).toInt, samples * 1000L / rate))
  }

  /** Synthetic CBR MPEG1 Layer III frames (48 kHz, 192 kbps → exactly 576
    * bytes and 24 ms per frame): real headers, zeroed payload — enough for
    * metadata parity tests and deterministic oracle durations.
    */
  private[graft] def mp3Bytes(frames: Int): Array[Byte] = {
    val out = new Array[Byte](576 * frames)
    var f = 0
    while (f < frames) {
      val o = f * 576
      out(o) = 0xff.toByte; out(o + 1) = 0xfb.toByte; out(o + 2) = 0xb4.toByte
      f += 1
    }
    out
  }

  // ---------------------------------------------------------------- MP4 --

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  /** ISO-BMFF magic sniff: an `ftyp` box at offset 4 means the payload
    * CLAIMS to be an MP4, so a failed parse must surface as a decode
    * failure rather than fall through to the stub.
    */
  private[operators] def sniffMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && tag(b, 4) == "ftyp"

  /** First child box named `name` inside [lo, hi): returns (bodyLo, boxEnd).
    * Handles 64-bit largesize (size==1) and to-end-of-file (size==0);
    * malformed sizes end the walk instead of looping or crashing the task.
    */
  private def findBox(b: Array[Byte], lo: Int, hi: Int, name: String): Option[(Int, Int)] = {
    var off = lo
    while (off + 8 <= hi) {
      val sz = be32(b, off)
      val id = tag(b, off + 4)
      var bodyLo = off + 8
      val boxEnd: Long =
        if (sz == 1 && off + 16 <= hi) { bodyLo = off + 16; off + be64(b, off + 8) }
        else if (sz == 0) hi.toLong
        else off + sz
      if (boxEnd < bodyLo || boxEnd > hi) return None
      if (id == name) return Some((bodyLo, boxEnd.toInt))
      off = boxEnd.toInt
    }
    None
  }

  final case class Mp4Meta(width: Option[Int], height: Option[Int],
                           durationMs: Option[Long], fourcc: String)

  /** H.264 sequence-parameter-set parse (ITU-T H.264 §7.3.2.1.1): strips
    * emulation-prevention bytes, exp-Golomb-decodes through the profile
    * extension block (incl. scaling lists) to `pic_width_in_mbs_minus1` /
    * `pic_height_in_map_units_minus1`, and applies frame cropping with the
    * chroma-idc-dependent crop units — the coded dimensions a real decoder
    * would report, in pure JVM code.
    */
  private[graft] def parseSps(nal: Array[Byte]): Option[(Int, Int)] = {
    if (nal.length < 4 || (nal(0) & 0x1f) != 7) return None
    // de-emulate: 00 00 03 -> 00 00
    val rbsp = new Array[Byte](nal.length); var n = 0; var zeros = 0; var i = 1
    while (i < nal.length) {
      val v = nal(i) & 0xff
      if (zeros >= 2 && v == 3) zeros = 0
      else { rbsp(n) = nal(i); n += 1; zeros = if (v == 0) zeros + 1 else 0 }
      i += 1
    }
    object Eof extends Exception
    var bit = 0
    def u(k: Int): Int = {
      var v = 0; var j = 0
      while (j < k) {
        if (bit >= n * 8) throw Eof
        v = (v << 1) | ((rbsp(bit >> 3) >> (7 - (bit & 7))) & 1)
        bit += 1; j += 1
      }
      v
    }
    def ue(): Int = {
      var lead = 0
      while (u(1) == 0) { lead += 1; if (lead > 31) throw Eof }
      (1 << lead) - 1 + (if (lead == 0) 0 else u(lead))
    }
    def se(): Int = { val k = ue(); if ((k & 1) == 1) (k + 1) / 2 else -(k / 2) }
    try {
      val profile = u(8); u(8); u(8) // constraint flags, level_idc
      ue() // seq_parameter_set_id
      var chroma = 1 // 4:2:0 default for non-extended profiles
      var separateColour = 0
      if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)(profile)) {
        chroma = ue()
        if (chroma == 3) separateColour = u(1)
        ue(); ue(); u(1) // bit depths, qpprime
        if (u(1) == 1) { // seq_scaling_matrix_present
          val lists = if (chroma != 3) 8 else 12
          var l = 0
          while (l < lists) {
            if (u(1) == 1) {
              val size = if (l < 6) 16 else 64
              var last = 8; var next = 8; var j = 0
              while (j < size) {
                if (next != 0) next = ((last + se()) % 256 + 256) % 256
                if (next != 0) last = next
                j += 1
              }
            }
            l += 1
          }
        }
      }
      ue() // log2_max_frame_num_minus4
      val poc = ue()
      if (poc == 0) ue()
      else if (poc == 1) {
        u(1); se(); se()
        val nrf = ue(); var j = 0
        while (j < nrf) { se(); j += 1 }
      }
      ue(); u(1) // max_num_ref_frames, gaps_allowed
      val wMbs = ue() + 1
      val hUnits = ue() + 1
      val frameMbsOnly = u(1)
      if (frameMbsOnly == 0) u(1) // mb_adaptive_frame_field
      u(1) // direct_8x8_inference
      var w = wMbs * 16
      var h = (2 - frameMbsOnly) * hUnits * 16
      if (u(1) == 1) { // frame_cropping
        val cl = ue(); val cr = ue(); val ct = ue(); val cb = ue()
        // §7.4.2.1.1: ChromaArrayType 0 (monochrome / separate planes) crops
        // in luma samples; otherwise in SubWidthC × SubHeightC chroma units
        val chromaArrayType = if (separateColour == 1) 0 else chroma
        val (ux, uy) = chromaArrayType match {
          case 0 => (1, 2 - frameMbsOnly)
          case 2 => (2, 1 * (2 - frameMbsOnly)) // 4:2:2
          case 3 => (1, 1 * (2 - frameMbsOnly)) // 4:4:4
          case _ => (2, 2 * (2 - frameMbsOnly)) // 4:2:0
        }
        w -= (cl + cr) * ux
        h -= (ct + cb) * uy
      }
      if (w > 0 && h > 0) Some((w, h)) else None
    } catch { case Eof => None }
  }

  /** MP4 (ISO-BMFF) METADATA from the box tree — pure JVM, no native
    * codec: `moov/mvhd` for duration, `trak/tkhd` for display dimensions,
    * `stsd`'s first sample entry for the codec fourcc, and for AVC the
    * `avcC` SPS via [[parseSps]] for the true coded dimensions. The frame
    * decode (feature vectors) stays stubbed behind `decodeStub` — that is
    * the native-decoder swap point.
    */
  private[graft] def parseMp4Meta(b: Array[Byte]): Option[Mp4Meta] = {
    if (!sniffMp4(b)) return None
    val (moovLo, moovHi) = findBox(b, 0, b.length, "moov").getOrElse(return None)
    val durMs = findBox(b, moovLo, moovHi, "mvhd").flatMap { case (lo, hi) =>
      val ver = b(lo) & 0xff
      if (ver == 1 && lo + 32 <= hi) {
        val ts = be32(b, lo + 20); if (ts > 0) Some(be64(b, lo + 24) * 1000L / ts) else None
      } else if (ver == 0 && lo + 20 <= hi) {
        val ts = be32(b, lo + 12); if (ts > 0) Some(be32(b, lo + 16) * 1000L / ts) else None
      } else None
    }
    val trak = findBox(b, moovLo, moovHi, "trak")
    val display = trak.flatMap { case (lo, hi) =>
      findBox(b, lo, hi, "tkhd").flatMap { case (tl, th) =>
        val ver = b(tl) & 0xff
        val wOff = if (ver == 1) tl + 88 else tl + 76
        if (wOff + 8 <= th) {
          val w = (be32(b, wOff) >> 16).toInt
          val h = (be32(b, wOff + 4) >> 16).toInt
          if (w > 0 && h > 0) Some((w, h)) else None
        } else None
      }
    }
    val stsd = trak.flatMap { case (lo, hi) =>
      findBox(b, lo, hi, "mdia").flatMap { case (ml, mh) =>
        findBox(b, ml, mh, "minf").flatMap { case (nl, nh) =>
          findBox(b, nl, nh, "stbl").flatMap { case (sl, sh) =>
            findBox(b, sl, sh, "stsd")
          }
        }
      }
    }
    var fourcc = "unknown"
    var coded: Option[(Int, Int)] = None
    stsd.foreach { case (lo, hi) =>
      if (lo + 16 <= hi && be32(b, lo + 4) >= 1) {
        val entryLo = lo + 8
        val esz = be32(b, entryLo)
        val entryHi = math.min(hi.toLong, entryLo + esz).toInt
        if (entryLo + 8 <= entryHi) {
          fourcc = tag(b, entryLo + 4)
          // visual sample entry: 78-byte fixed body, then child boxes (avcC)
          if (entryLo + 86 <= entryHi) {
            findBox(b, entryLo + 86, entryHi, "avcC").foreach { case (al, ah) =>
              // avcC: ver, profile, compat, level, lenSizeMinusOne, numSPS|0xE0
              if (al + 8 <= ah && (b(al) & 0xff) == 1 && ((b(al + 5) & 0x1f) >= 1)) {
                val spsLen = be16(b, al + 6).toInt
                if (al + 8 + spsLen <= ah) {
                  val nal = java.util.Arrays.copyOfRange(b, al + 8, al + 8 + spsLen)
                  coded = parseSps(nal)
                }
              }
            }
          }
        }
      }
    }
    val dims = coded.orElse(display)
    Some(Mp4Meta(dims.map(_._1), dims.map(_._2), durMs,
      if (fourcc == "avc1") "mp4-avc1" else s"mp4-$fourcc"))
  }

  /** Baseline-profile H.264 SPS NAL for a w×h frame, padded with rbsp
    * trailing zeros to a FIXED 13 bytes (header + 12 payload) so the
    * synthetic container below has constant size. Non-multiple-of-16
    * dimensions are expressed through real frame cropping (4:2:0 crop
    * units), which exercises the parser's crop arithmetic.
    */
  private[graft] def spsNal(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0, "even dimensions only")
    val wMbs = (w + 15) / 16
    val hMbs = (h + 15) / 16
    val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    var cur = 0; var nb = 0
    def putBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); nb += 1
      if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
    }
    def putU(v: Int, k: Int): Unit = { var j = k - 1; while (j >= 0) { putBit((v >> j) & 1); j -= 1 } }
    def putUe(v: Int): Unit = {
      val vp = v + 1
      val nbits = 32 - Integer.numberOfLeadingZeros(vp)
      putU(0, nbits - 1); putU(vp, nbits)
    }
    putU(66, 8); putU(0, 8); putU(30, 8) // baseline, no constraints, level 3.0
    putUe(0) // seq_parameter_set_id
    putUe(0) // log2_max_frame_num_minus4
    putUe(0) // pic_order_cnt_type
    putUe(0) // log2_max_pic_order_cnt_lsb_minus4
    putUe(1) // max_num_ref_frames
    putBit(0) // gaps_in_frame_num_value_allowed
    putUe(wMbs - 1)
    putUe(hMbs - 1)
    putBit(1) // frame_mbs_only
    putBit(1) // direct_8x8_inference
    val cropR = (wMbs * 16 - w) / 2 // 4:2:0 horizontal crop unit = 2 px
    val cropB = (hMbs * 16 - h) / 2 // frame_mbs_only → vertical unit = 2 px
    if (cropR > 0 || cropB > 0) {
      putBit(1); putUe(0); putUe(cropR); putUe(0); putUe(cropB)
    } else putBit(0)
    putBit(0) // vui_parameters_present
    putBit(1) // rbsp stop bit
    while (nb != 0) putBit(0)
    require(buf.length <= 12, s"SPS overflow for ${w}x$h")
    while (buf.length < 12) buf += 0.toByte
    (0x67.toByte +: buf).toArray
  }

  private def beBytes32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def beBytes16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def mp4Box(name: String, parts: Array[Byte]*): Array[Byte] = {
    val len = 8 + parts.map(_.length).sum
    beBytes32(len) ++ name.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      parts.flatten
  }

  /** Synthetic fixed-size (457-byte) MP4: real ftyp/moov/mvhd/trak/tkhd/
    * mdia/mdhd/hdlr/minf/stbl/stsd box tree with an avc1 sample entry and
    * a genuine [[spsNal]] — real headers, no media data. Constant total
    * size and arithmetic-only metadata make oracle SQL twins exact.
    */
  private[graft] def mp4Bytes(w: Int, h: Int, durMs: Long): Array[Byte] = {
    val sps = spsNal(w, h)
    val avcC = mp4Box("avcC",
      Array(1, 66, 0, 30, 0xff, 0xe1).map(_.toByte),
      beBytes16(sps.length), sps, Array(0.toByte)) // numPPS = 0
    val avc1Body = new Array[Byte](78)
    avc1Body(7) = 1 // data_reference_index
    System.arraycopy(beBytes16(w), 0, avc1Body, 24, 2)
    System.arraycopy(beBytes16(h), 0, avc1Body, 26, 2)
    System.arraycopy(beBytes32(0x00480000L), 0, avc1Body, 28, 4) // 72 dpi
    System.arraycopy(beBytes32(0x00480000L), 0, avc1Body, 32, 4)
    System.arraycopy(beBytes16(1), 0, avc1Body, 40, 2) // frame_count
    System.arraycopy(beBytes16(24), 0, avc1Body, 74, 2) // depth
    System.arraycopy(beBytes16(0xffff), 0, avc1Body, 76, 2) // pre_defined
    val avc1 = mp4Box("avc1", avc1Body, avcC)
    val stsd = mp4Box("stsd", Array[Byte](0, 0, 0, 0), beBytes32(1), avc1)
    val minf = mp4Box("minf", mp4Box("stbl", stsd))
    val mdhd = mp4Box("mdhd", Array[Byte](0, 0, 0, 0),
      beBytes32(0), beBytes32(0), beBytes32(1000), beBytes32(durMs),
      beBytes16(0x55c4), beBytes16(0)) // language "und"
    val hdlr = mp4Box("hdlr", Array[Byte](0, 0, 0, 0), beBytes32(0),
      "vide".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      new Array[Byte](12), Array(0.toByte))
    val mdia = mp4Box("mdia", mdhd, hdlr, minf)
    val unityMatrix = beBytes32(0x00010000L) ++ beBytes32(0) ++ beBytes32(0) ++
      beBytes32(0) ++ beBytes32(0x00010000L) ++ beBytes32(0) ++
      beBytes32(0) ++ beBytes32(0) ++ beBytes32(0x40000000L)
    val tkhd = mp4Box("tkhd", Array[Byte](0, 0, 0, 7),
      beBytes32(0), beBytes32(0), beBytes32(1), beBytes32(0), beBytes32(durMs),
      new Array[Byte](8), beBytes16(0), beBytes16(0), beBytes16(0), beBytes16(0),
      unityMatrix, beBytes32(w.toLong << 16), beBytes32(h.toLong << 16))
    val trak = mp4Box("trak", tkhd, mdia)
    val mvhd = mp4Box("mvhd", Array[Byte](0, 0, 0, 0),
      beBytes32(0), beBytes32(0), beBytes32(1000), beBytes32(durMs),
      beBytes32(0x00010000L), beBytes16(0x0100), beBytes16(0),
      new Array[Byte](8), unityMatrix, new Array[Byte](24), beBytes32(2))
    val moov = mp4Box("moov", mvhd, trak)
    val ftyp = mp4Box("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      beBytes32(0x200),
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    ftyp ++ moov
  }

  /** `dim` RMS-envelope buckets over the mono samples. */
  private def wavFeatures(samples: Array[Double], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    var d = 0
    while (d < dim) {
      val lo = (samples.length.toLong * d / dim).toInt
      val hi = math.max(lo + 1, (samples.length.toLong * (d + 1) / dim).toInt)
      var acc = 0.0; var i = lo
      while (i < math.min(hi, samples.length)) { acc += samples(i) * samples(i); i += 1 }
      out(d) = math.sqrt(acc / math.max(1, math.min(hi, samples.length) - lo)).toFloat
      d += 1
    }
    out
  }

  // ---------------------------------------------------------------- PPM --

  /** PPM P6 parse: "P6" <w> <h> <maxval> then binary RGB triplets.
    * Returns (width, height, row-major gray values in [0, 1]).
    */
  private[operators] def parsePpm(b: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (b.length < 11 || b(0) != 'P' || b(1) != '6') return None
    var off = 2
    def nextInt(): Int = {
      // skip whitespace and '#' comments
      var done = false
      while (!done && off < b.length) {
        val c = b(off).toChar
        if (c == '#') { while (off < b.length && b(off) != '\n') off += 1 }
        else if (c.isWhitespace) off += 1
        else done = true
      }
      var v = 0
      while (off < b.length && (b(off).toChar).isDigit) { v = v * 10 + (b(off) - '0'); off += 1 }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    off += 1 // single whitespace after maxval
    if (off + 3L * w * h > b.length) return None
    val gray = new Array[Double](w * h)
    var i = 0
    while (i < w * h) {
      val r = b(off + 3 * i) & 0xff
      val g = b(off + 3 * i + 1) & 0xff
      val bl = b(off + 3 * i + 2) & 0xff
      gray(i) = (0.299 * r + 0.587 * g + 0.114 * bl) / maxv
      i += 1
    }
    Some((w, h, gray))
  }

  /** Nearest-neighbor resize of the gray bitmap to a g×g thumbnail, row
    * major, padded with zeros up to `dim`.
    */
  private def ppmFeatures(w: Int, h: Int, gray: Array[Double], dim: Int): Array[Float] = {
    val g = math.max(1, math.sqrt(dim.toDouble).toInt)
    val out = new Array[Float](dim)
    var y = 0
    while (y < g) {
      var x = 0
      while (x < g) {
        val sx = math.min(w - 1, x * w / g)
        val sy = math.min(h - 1, y * h / g)
        val k = y * g + x
        if (k < dim) out(k) = gray(sy * w + sx).toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  // ---------------------------------------------------------- ImageIO ----

  /** PNG/JPEG/GIF/BMP decode via the JDK's own javax.imageio (headless-safe,
    * no external libraries). Magic bytes are sniffed first so non-image
    * payloads skip ImageIO entirely. Returns (codec, image).
    */
  /** Magic-byte sniff: which decodable image format does this look like? */
  private[operators] def sniffImage(b: Array[Byte]): Option[String] =
    if (b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') Some("png")
    else if (b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) Some("jpeg")
    else if (b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') Some("gif")
    else if (b.length > 2 && b(0) == 'B' && b(1) == 'M') Some("bmp")
    else None

  private[operators] def parseImage(b: Array[Byte]): Option[(String, java.awt.image.BufferedImage)] = {
    val codec = sniffImage(b).getOrElse(return None)
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
        .map(img => (codec, img))
    } catch { case _: Throwable => None }
  }

  /** Gray thumbnail features sampled straight from the decoded image:
    * nearest-neighbor at the g×g target positions only (g² getRGB calls,
    * not width×height), same layout as `ppmFeatures`.
    */
  private def imageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val g = math.max(1, math.sqrt(dim.toDouble).toInt)
    val out = new Array[Float](dim)
    var y = 0
    while (y < g) {
      var x = 0
      while (x < g) {
        val k = y * g + x
        if (k < dim) {
          val rgb = img.getRGB(math.min(w - 1, x * w / g), math.min(h - 1, y * h / g))
          val r = (rgb >> 16) & 0xff; val gr = (rgb >> 8) & 0xff; val bl = rgb & 0xff
          out(k) = ((0.299 * r + 0.587 * gr + 0.114 * bl) / 255.0).toFloat
        }
        x += 1
      }
      y += 1
    }
    out
  }

  // --------------------------------------------------------------- stub --

  /** STUB decode for formats that need native codecs (MP3, H.264):
    * deterministic fake features from the byte content. Replace with a
    * JNI/FFM decoder at integration time.
    */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish rolling hash over bytes
    var i = 0
    while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
    var d = 0
    while (d < dim) {
      val v = h ^ (d.toLong * 0x9e3779b97f4a7c15L)
      out(d) = ((v % 2000003L).toFloat / 1000001.5f) - 1.0f
      d += 1
    }
    out
  }

  /** Batched feature extraction over the binary column. Runs as
    * mapPartitions so decoder init amortizes per partition (the Pandas-UDF
    * batch contract, JVM-side). Rows with null/empty bytes produce ok=false
    * instead of failing the task; format is sniffed from magic bytes.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select(col("asset_id"), col("media_type"), col("bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          if (bytes == null || bytes.isEmpty)
            MediaFeatures(id, mt, 0L, "none", None, None, None, None,
              Array.empty, ok = false, error = "empty bytes")
          else try parseWav(bytes) match {
            case Some((rate, _, samples)) =>
              MediaFeatures(id, mt, bytes.length.toLong, "wav-pcm16",
                None, None, Some(rate), Some(samples.length * 1000L / rate),
                wavFeatures(samples, dim), ok = true, error = "")
            // claims RIFF/WAVE but didn't parse (truncated data chunk,
            // non-PCM16): surface the failure like the image path does —
            // stub features must not silently replace a real decode
            case None if sniffWav(bytes) =>
              MediaFeatures(id, mt, bytes.length.toLong, "wav-pcm16",
                None, None, None, None, Array.empty,
                ok = false, error = "wav-pcm16 decode failed")
            case None => parsePpm(bytes) match {
              case Some((w, h, gray)) =>
                MediaFeatures(id, mt, bytes.length.toLong, "ppm-p6",
                  Some(w), Some(h), None, None,
                  ppmFeatures(w, h, gray, dim), ok = true, error = "")
              case None => parseImage(bytes) match {
                case Some((codec, img)) =>
                  MediaFeatures(id, mt, bytes.length.toLong, codec,
                    Some(img.getWidth), Some(img.getHeight), None, None,
                    imageFeatures(img, dim), ok = true, error = "")
                case None => sniffImage(bytes) match {
                  // looked like a decodable format but the decode failed:
                  // surface the failure, don't launder fake stub features
                  // into downstream similarity/dedup indexes as ok=true
                  case Some(codec) =>
                    MediaFeatures(id, mt, bytes.length.toLong, codec,
                      None, None, None, None, Array.empty,
                      ok = false, error = s"$codec decode failed")
                  case None if sniffMp4(bytes) => parseMp4Meta(bytes) match {
                    // real box-tree + SPS metadata; frame decode stays
                    // stubbed (decodeStub is the native-decoder swap point)
                    case Some(m) =>
                      MediaFeatures(id, mt, bytes.length.toLong, m.fourcc,
                        m.width, m.height, None, m.durationMs,
                        decodeStub(bytes, dim), ok = true, error = "")
                    case None =>
                      MediaFeatures(id, mt, bytes.length.toLong, "mp4",
                        None, None, None, None, Array.empty,
                        ok = false, error = "mp4 decode failed")
                  }
                  case None => parseMp3Meta(bytes) match {
                    // real header-derived metadata; feature vectors remain
                    // stubbed (decodeStub is the native-decoder swap point)
                    case Some((rate, _, durMs)) =>
                      MediaFeatures(id, mt, bytes.length.toLong, "mp3",
                        None, None, Some(rate), Some(durMs),
                        decodeStub(bytes, dim), ok = true, error = "")
                    case None =>
                      MediaFeatures(id, mt, bytes.length.toLong, "stub",
                        None, None, None, None, decodeStub(bytes, dim),
                        ok = true, error = "")
                  }
                }
              }
            }
          } catch { // the documented contract: a row never fails the task
            case e: Throwable =>
              MediaFeatures(id, mt, bytes.length.toLong, "error",
                None, None, None, None, Array.empty,
                ok = false, error = s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        }
      }
  }

  /** Deterministic synthetic media table derived from the documents table —
    * gives the multimodal path real data to run on (bytes = utf8 text,
    * metadata derived from length).
    */
  def syntheticMediaFromDocuments(spark: SparkSession, documentsParquet: String): DataFrame = {
    val docs = spark.read.parquet(documentsParquet)
    // audio assets carry REAL (synthetic CBR) mp3 frames and video assets
    // REAL fixed-size MP4 box trees with genuine H.264 SPS headers, so both
    // metadata decode paths run against genuine containers; images keep raw
    // text bytes (no recognizable container → deterministic stub path)
    val mp3Udf = udf((nChars: Int) => mp3Bytes(nChars % 32 + 2))
    val mp4Udf = udf((nChars: Int) =>
      mp4Bytes((nChars % 8 + 1) * 16, (nChars % 4 + 1) * 16, nChars * 10L))
    docs.select(
      col("doc_id").as("asset_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("media_type"),
      (when(col("doc_id") % 3 === 1,
        mp3Udf(coalesce(col("n_chars"), lit(0)).cast("int")))
        .when(col("doc_id") % 3 === 2,
          mp4Udf(coalesce(col("n_chars"), lit(0)).cast("int")))
        .otherwise(encode(col("text"), "UTF-8"))).as("bytes"),
      struct(
        (col("n_chars") % 1920).cast("int").as("width"),
        (col("n_chars") % 1080).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).cast("long").as("duration_ms"),
        lit("stub").as("codec")).as("meta"))
  }

  /** Frame-sampling plan for video assets: one row per sampled frame index —
    * sequence+explode, fully distributed (no driver loop).
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("media_type") === "video")
      // a NULL or zero duration is "no known content": emit NO frames —
      // greatest() skips nulls, so without the filter both cases would
      // fabricate a frame at 0 ms for an asset nothing was decoded from
      .filter(col("meta.duration_ms").isNotNull && col("meta.duration_ms") > 0L)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), greatest(col("meta.duration_ms") - 1, lit(0L)),
          lit(everyMs))))
      .select(col("asset_id"), col("frame_ms"))

  /** [[sampleFrames]] from the DECODED container durations instead of
    * caller-supplied metadata: one decode pass recovers `duration_ms` from
    * the MP4 box tree (or WAV/MP3 headers), then the same sequence+explode
    * plan emits the frame grid. Assets whose decode fails or reports no
    * duration emit no frames — observable via the decode's ok/error surface
    * rather than silently trusting stale metadata.
    */
  def sampleFramesDecoded(media: DataFrame, everyMs: Long, dim: Int = 4): DataFrame =
    extractFeatures(media.filter(col("media_type") === "video"), dim).toDF()
      .filter(col("ok") && col("duration_ms").isNotNull)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), greatest(col("duration_ms") - 1, lit(0L)),
          lit(everyMs))))
      .select(col("asset_id"), col("frame_ms"))

  // ------------------------------------------------- perceptual hashing --

  final case class ImageHash(
      asset_id: Long,
      media_type: String,
      ok: Boolean,
      codec: String,
      width: Option[Int],
      height: Option[Int],
      dhash: Long,
      error: String,
  )

  /** 9×8 nearest-sampled gray grid from a decoded image (same sampling and
    * luminance weights as the feature thumbnails), row major.
    */
  private def grayGrid9x8(get: (Int, Int) => Double, w: Int, h: Int): Array[Double] = {
    val out = new Array[Double](9 * 8)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        out(y * 9 + x) = get(math.min(w - 1, x * w / 9), math.min(h - 1, y * h / 8))
        x += 1
      }
      y += 1
    }
    out
  }

  private def dhashOf(g: Array[Double]): Long = {
    var hash = 0L; var k = 0; var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) < g(y * 9 + x + 1)) hash |= 1L << k
        k += 1; x += 1
      }
      y += 1
    }
    hash
  }

  /** 64-bit perceptual difference hash (dHash, Krawetz's "Kind of Like
    * That" construction) per image asset: a 9×8 gray thumbnail sampled
    * straight from the decode, bit (y,x) set when gray(x,y) < gray(x+1,y).
    * Horizontal gradients survive rescaling and recompression, so Hamming
    * distance between hashes ranks near-duplicate images — the standard
    * image-dedup key. PPM runs through the pure-JVM parser; PNG/JPEG/GIF/
    * BMP through ImageIO; undecodable bytes emit ok=false (never a fake
    * hash). Batched mapPartitions like extractFeatures.
    */
  def imageDHash(media: DataFrame): Dataset[ImageHash] = {
    implicit val enc = Encoders.product[ImageHash]
    media.select(col("asset_id"), col("media_type"), col("bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          if (bytes == null || bytes.isEmpty)
            ImageHash(id, mt, ok = false, "none", None, None, 0L, "empty bytes")
          else parsePpm(bytes) match {
            case Some((w, h, gray)) =>
              val g = grayGrid9x8((x, y) => gray(y * w + x), w, h)
              ImageHash(id, mt, ok = true, "ppm-p6", Some(w), Some(h),
                dhashOf(g), "")
            case None => parseImage(bytes) match {
              case Some((codec, img)) =>
                val g = grayGrid9x8((x, y) => {
                  val rgb = img.getRGB(x, y)
                  val rr = (rgb >> 16) & 0xff; val gg = (rgb >> 8) & 0xff
                  val bb = rgb & 0xff
                  (0.299 * rr + 0.587 * gg + 0.114 * bb) / 255.0
                }, img.getWidth, img.getHeight)
                ImageHash(id, mt, ok = true, codec,
                  Some(img.getWidth), Some(img.getHeight), dhashOf(g), "")
              case None =>
                val codec = sniffImage(bytes).getOrElse("none")
                ImageHash(id, mt, ok = false, codec, None, None, 0L,
                  if (codec == "none") "unrecognized container"
                  else s"$codec decode failed")
            }
          }
        }
      }
  }

  /** Perceptual near-duplicate image pairs: dHash + the block-pigeonhole
    * Hamming banding ([[Dedup.fingerprintPairs]]) — candidates meet in
    * exact-chunk buckets, never an all-pairs scan. maxHamming defaults
    * looser than text simhash (recompression flips a few gradient bits).
    */
  def imageNearDupPairs(media: DataFrame, blocks: Int = 8, maxHamming: Int = 6,
                        maxBucket: Int = 1000): DataFrame =
    Dedup.fingerprintPairs(
      imageDHash(media).filter(col("ok")).toDF(),
      "asset_id", "dhash", blocks, maxHamming, maxBucket)

  final case class AudioHash(
      asset_id: Long,
      media_type: String,
      ok: Boolean,
      codec: String,
      duration_ms: Option[Long],
      ahash: Long,
      error: String,
  )

  /** 64-bit audio fingerprint in the Haitsma–Kalker (2002) energy-delta
    * construction, time-domain variant: the PCM stream splits into a 9×8
    * (time × band) RMS-energy grid — 9 equal time windows, 8 equal-width
    * sub-windows inside each (the band proxy; no FFT dependency) — and bit
    * (t, b) is set when energy increases from window t to t+1 in band b.
    * Sign-of-delta survives volume scaling and requantization exactly
    * (energy ratios are preserved), so Hamming distance ranks re-encoded /
    * gain-adjusted copies. Only real WAV decodes hash; everything else is
    * ok=false.
    */
  def audioFingerprint(media: DataFrame): Dataset[AudioHash] = {
    implicit val enc = Encoders.product[AudioHash]
    media.select(col("asset_id"), col("media_type"), col("bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          if (bytes == null || bytes.isEmpty)
            AudioHash(id, mt, ok = false, "none", None, 0L, "empty bytes")
          else parseWav(bytes) match {
            case Some((rate, _, samples)) if samples.length >= 9 * 8 =>
              val grid = new Array[Double](9 * 8)
              var t = 0
              while (t < 9) {
                val lo = (samples.length.toLong * t / 9).toInt
                val hi = (samples.length.toLong * (t + 1) / 9).toInt
                var b = 0
                while (b < 8) {
                  val blo = lo + ((hi - lo).toLong * b / 8).toInt
                  val bhi = math.max(blo + 1, lo + ((hi - lo).toLong * (b + 1) / 8).toInt)
                  var acc = 0.0; var i = blo
                  while (i < bhi) { acc += samples(i) * samples(i); i += 1 }
                  grid(t * 8 + b) = acc / (bhi - blo)
                  b += 1
                }
                t += 1
              }
              var hash = 0L; var k = 0; var tt = 0
              while (tt < 8) {
                var b = 0
                while (b < 8) {
                  if (grid(tt * 8 + b) < grid((tt + 1) * 8 + b)) hash |= 1L << k
                  k += 1; b += 1
                }
                tt += 1
              }
              AudioHash(id, mt, ok = true, "wav-pcm16",
                Some(samples.length * 1000L / rate), hash, "")
            case Some(_) =>
              AudioHash(id, mt, ok = false, "wav-pcm16", None, 0L,
                "too few samples to fingerprint")
            case None =>
              AudioHash(id, mt, ok = false,
                if (sniffWav(bytes)) "wav-pcm16" else "none", None, 0L,
                if (sniffWav(bytes)) "wav-pcm16 decode failed"
                else "unrecognized container")
          }
        }
      }
  }

  final case class AudioSpectral(
      asset_id: Long,
      media_type: String,
      ok: Boolean,
      codec: String,
      sample_rate: Option[Int],
      duration_ms: Option[Long],
      zcr: Option[Double],
      band_energy: Option[Seq[Double]],
      spectral_centroid_hz: Option[Double],
      error: String,
  )

  /** Goertzel single-bin power at frequency `f`: the O(n) one-frequency
    * DFT (Goertzel 1958) — no FFT dependency, fixed ascending-time loop so
    * results are deterministic doubles. Normalized to |X(f)|²/n², i.e. the
    * squared mean projection: a unit-amplitude sine at exactly `f` reads
    * 1/4 regardless of length.
    */
  private[operators] def goertzelPower(x: Array[Double], f: Double,
                                       rate: Int): Double = {
    val w = 2.0 * math.Pi * f / rate
    val coeff = 2.0 * math.cos(w)
    var s1 = 0.0; var s2 = 0.0; var i = 0
    while (i < x.length) { val s = x(i) + coeff * s1 - s2; s2 = s1; s1 = s; i += 1 }
    val p = s1 * s1 + s2 * s2 - coeff * s1 * s2
    math.max(0.0, p) / (x.length.toDouble * x.length.toDouble)
  }

  /** Spectral summary features over the real WAV decode — the audio-side
    * content/quality signals a curation pipeline gates on (speech / music /
    * silence / hum heuristics): zero-crossing rate, per-band Goertzel power
    * at fixed probe frequencies, and the energy-weighted spectral centroid
    * over those bands. One compiled pass per asset inside mapPartitions
    * (O(n·bands)); probe bands at or above Nyquist report zero energy so
    * the output schema is stable across sample rates. Non-WAV payloads are
    * ok=false — spectral features are never faked from a stub.
    */
  def audioSpectralFeatures(media: DataFrame,
      bandsHz: Seq[Double] = Seq(125.0, 250.0, 500.0, 1000.0, 2000.0, 4000.0))
      : Dataset[AudioSpectral] = {
    require(bandsHz.nonEmpty && bandsHz.forall(_ > 0), "bands must be positive Hz")
    val bands = bandsHz.toArray
    implicit val enc = Encoders.product[AudioSpectral]
    media.select(col("asset_id"), col("media_type"), col("bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          if (bytes == null || bytes.isEmpty)
            AudioSpectral(id, mt, ok = false, "none", None, None, None, None,
              None, "empty bytes")
          else parseWav(bytes) match {
            case Some((rate, _, samples)) if samples.length >= 2 =>
              // sign-tracking crossing count: exact-zero samples (a tone
              // whose crossings land on sample instants quantizes to 0)
              // must not swallow the crossing, so zeros are skipped and a
              // crossing is a change between consecutive NONZERO signs
              var z = 0; var lastSign = 0; var i = 0
              while (i < samples.length) {
                val s = java.lang.Math.signum(samples(i)).toInt
                if (s != 0) {
                  if (lastSign != 0 && s != lastSign) z += 1
                  lastSign = s
                }
                i += 1
              }
              val zcr = z.toDouble / (samples.length - 1)
              val energies = bands.map { f =>
                if (f >= rate / 2.0) 0.0 else goertzelPower(samples, f, rate)
              }
              var tot = 0.0; var fw = 0.0; var bi = 0
              while (bi < bands.length) {
                tot += energies(bi); fw += bands(bi) * energies(bi); bi += 1
              }
              val centroid = if (tot > 0.0) Some(fw / tot) else None
              AudioSpectral(id, mt, ok = true, "wav-pcm16", Some(rate),
                Some(samples.length * 1000L / rate), Some(zcr),
                Some(energies.toSeq), centroid, "")
            case Some(_) =>
              AudioSpectral(id, mt, ok = false, "wav-pcm16", None, None, None,
                None, None, "too few samples")
            case None =>
              AudioSpectral(id, mt, ok = false,
                if (sniffWav(bytes)) "wav-pcm16" else "none", None, None, None,
                None, None,
                if (sniffWav(bytes)) "wav-pcm16 decode failed"
                else "unrecognized container")
          }
        }
      }
  }

  /** Near-duplicate audio pairs over [[audioFingerprint]] hashes, banded
    * like the image and text families.
    */
  def audioNearDupPairs(media: DataFrame, blocks: Int = 8, maxHamming: Int = 6,
                        maxBucket: Int = 1000): DataFrame =
    Dedup.fingerprintPairs(
      audioFingerprint(media).filter(col("ok")).toDF(),
      "asset_id", "ahash", blocks, maxHamming, maxBucket)
}
