package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched per-partition feature extraction.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): `decodeStub` derives deterministic fake features from the
  * bytes. Everything around it — schema, batch shape, partition sizing,
  * the mapPartitions contract — is the real design: swap `decodeStub` for a
  * JNI/FFM decoder and nothing else changes.
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
      // stub "embedding": deterministic per-asset, shaped like a real one
      features: Array[Float],
      ok: Boolean,
      error: String,
  )

  /** STUB decode: deterministic fake features from the byte content.
    * Marked clearly; replace with a real decoder at integration time.
    */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    // ??? real decoder goes here (libjpeg/ffmpeg via FFM). Deterministic fake:
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
    * mapPartitions so a real decoder amortizes init per partition (the
    * Pandas-UDF batch contract, JVM-side). Rows with null/empty bytes
    * produce ok=false instead of failing the task.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select(col("asset_id"), col("media_type"), col("bytes"))
      .mapPartitions { rows =>
        // per-partition init of the (stub) decoder happens here
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          if (bytes == null || bytes.isEmpty)
            MediaFeatures(id, mt, 0L, Array.empty, ok = false, error = "empty bytes")
          else
            MediaFeatures(id, mt, bytes.length.toLong, decodeStub(bytes, dim),
              ok = true, error = "")
        }
      }
  }

  /** Deterministic synthetic media table derived from the documents table —
    * gives the multimodal path real data to run on (bytes = utf8 text,
    * metadata derived from length).
    */
  def syntheticMediaFromDocuments(spark: SparkSession, documentsParquet: String): DataFrame = {
    val docs = spark.read.parquet(documentsParquet)
    docs.select(
      col("doc_id").as("asset_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("media_type"),
      encode(col("text"), "UTF-8").as("bytes"),
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
}
