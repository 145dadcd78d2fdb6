package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched per-partition feature extraction.
  *
  * Decoded for REAL in pure JVM code: WAV/PCM16 audio (RIFF chunk walk →
  * duration, sample rate, RMS envelope features), PPM P6 images (header
  * parse → dimensions, gray thumbnail features), and PNG/JPEG/GIF/BMP via
  * the JDK's own javax.imageio — thumbnail features are sampled directly
  * from the decoded image at the g×g target positions. Formats that need
  * native codecs (MP3, H.264) fall through to `decodeStub`, which derives
  * deterministic fake features from the bytes; swap it for a JNI/FFM
  * decoder and nothing else changes. Everything around the decode —
  * schema, batch shape, partition sizing, the mapPartitions contract — is
  * the production design either way.
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
    // audio assets carry REAL (synthetic CBR) mp3 frames so the metadata
    // decode path runs against genuine headers; image/video keep raw text
    // bytes (no recognizable container → deterministic stub path)
    val mp3Udf = udf((nChars: Int) => mp3Bytes(nChars % 32 + 2))
    docs.select(
      col("doc_id").as("asset_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("media_type"),
      (when(col("doc_id") % 3 === 1,
        mp3Udf(coalesce(col("n_chars"), lit(0)).cast("int")))
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
      .withColumn("frame_ms",
        explode(sequence(lit(0L), greatest(col("meta.duration_ms") - 1, lit(0L)),
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

  /** Near-duplicate audio pairs over [[audioFingerprint]] hashes, banded
    * like the image and text families.
    */
  def audioNearDupPairs(media: DataFrame, blocks: Int = 8, maxHamming: Int = 6,
                        maxBucket: Int = 1000): DataFrame =
    Dedup.fingerprintPairs(
      audioFingerprint(media).filter(col("ok")).toDF(),
      "asset_id", "ahash", blocks, maxHamming, maxBucket)
}
