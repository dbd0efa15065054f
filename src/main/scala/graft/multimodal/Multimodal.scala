package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.StableHash

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * IMAGE decoding is REAL: [[Codec]] parses PNG/JPEG/GIF/BMP payloads
  * with JDK `javax.imageio` (no external library) into actual pixels —
  * features are luminance statistics of the decoded image, resize is a
  * real bilinear rescale re-encoded as PNG. Payloads ImageIO cannot
  * parse (and the audio/video modalities, for which the JDK ships no
  * codec) fall back to deterministic byte-hash stubs, so every operator
  * stays total and reproducible on arbitrary bytes.
  *
  * At scale the decode runs inside `mapPartitions` — one codec instance
  * per task, vectorized batches in, no driver involvement — the same
  * shape a Pandas-UDF / `mapInPandas` implementation has in PySpark.
  */
object Multimodal {

  /** Canonical media row: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("mime", StringType, nullable = true)
    )), nullable = false)
  ))

  /** Media codec. Image decode/resize is real (JDK ImageIO — PNG, JPEG,
    * GIF, BMP); undecodable payloads and audio/video use deterministic
    * byte-hash STUBS (the JDK ships no audio/video codec; a real one
    * replaces the fallback without touching the operators — they only see
    * these signatures).
    */
  object Codec extends Serializable {
    // in-memory streams only — never let ImageIO spill its working cache
    // to executor-local temp files
    javax.imageio.ImageIO.setUseCache(false)

    /** Real image decode: Some(pixels) when ImageIO recognizes the bytes,
      * None otherwise. ImageIO.read is not thread-safe-free of disk cache
      * surprises by default; the in-memory stream keeps it hermetic.
      */
    def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null || bytes.isEmpty) None
      else try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      } catch { case _: Exception => None }

    /** Feature vector of an image payload. Decodable images get REAL
      * pixel features: a `dim`-bin luminance histogram (ITU-R BT.601
      * weights) of the decoded pixels, L2-normalized — deterministic and
      * rotation/scale-sensitive the way a real pixel statistic is.
      * Undecodable bytes fall back to the hash stub so the operator is
      * total over arbitrary binary columns.
      */
    def imageFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
      decodeImage(bytes) match {
        case Some(img) =>
          val v = new Array[Float](dim)
          val w = img.getWidth
          val h = img.getHeight
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = 0.299 * ((rgb >> 16) & 0xFF) +
                0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
              val bin = math.min(dim - 1, (lum / 256.0 * dim).toInt)
              v(bin) += 1f
              x += 1
            }
            y += 1
          }
          l2Normalize(v)
        case None => hashFeatures(bytes, dim)
      }

    /** Fallback: hash byte windows into a fixed-dim unit-norm vector. */
    private[multimodal] def hashFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      if (bytes != null && bytes.nonEmpty) {
        var i = 0
        while (i < bytes.length) {
          val h = StableHash.mix64(bytes(i).toLong * 31 + i)
          v(math.floorMod(h, dim).toInt) += (if ((h & 16) == 0) 1f else -1f)
          i += 1
        }
      }
      l2Normalize(v)
    }

    private def l2Normalize(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n > 0) { var j = 0; while (j < v.length) { v(j) = (v(j) / n).toFloat; j += 1 } }
      v
    }

    /** Resize. Decodable images get a REAL bilinear rescale to exactly
      * `w`x`h`, re-encoded as PNG (deterministic encoder in the JDK).
      * Undecodable payloads fall back to byte re-sampling.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      decodeImage(bytes) match {
        case Some(img) =>
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        case None =>
          if (bytes == null || bytes.isEmpty) Array.emptyByteArray
          else {
            val out = new Array[Byte](math.max(1, w * h / 64))
            var i = 0
            while (i < out.length) {
              out(i) = bytes(((i.toLong * bytes.length) / out.length).toInt.min(bytes.length - 1))
              i += 1
            }
            out
          }
      }

    /** Frame extraction (video has no JDK codec — STUB): n evenly spaced
      * byte windows as "frames"; empty payloads yield n empty frames.
      */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      if (bytes == null || bytes.isEmpty) Seq.fill(n)(Array.emptyByteArray)
      else (0 until n).map { f =>
        val start = (f.toLong * bytes.length / n).toInt
        val end = math.min(bytes.length, start + math.max(1, bytes.length / n))
        java.util.Arrays.copyOfRange(bytes, start, math.max(start + 1, end))
      }
  }

  /** Back-compat alias (the codec is no longer a pure stub). */
  @deprecated("use Codec", "0.2") val StubCodec: Codec.type = Codec

  /** Feature-extract a binary column partition-parallel:
    * `(keyCol, features array<float>)`. Batch shape mirrors a Pandas UDF:
    * the codec sees an iterator of payloads per task.
    */
  def extractFeatures(df: DataFrame, keyCol: String, contentCol: String,
                      dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val rdd = df.select(col(keyCol).cast(LongType), col(contentCol)).rdd
      .mapPartitions(_.map { r =>
        Row(r.getLong(0), Codec.imageFeatures(r.getAs[Array[Byte]](1), dim).toSeq)
      })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize operator over image rows (real bilinear rescale for decodable
    * images; byte re-sampling fallback otherwise).
    */
  def resizeImages(df: DataFrame, contentCol: String, w: Int, h: Int): DataFrame = {
    val f = udf((b: Array[Byte]) => Codec.resize(b, w, h))
    df.withColumn("content_resized", f(col(contentCol)))
  }

  /** Frame-sampling as a generator: one row per sampled frame with its
    * index — the video analog of the chunker's 1-text -> N-chunks shape.
    */
  def sampleFrames(df: DataFrame, keyCol: String, contentCol: String,
                   nFrames: Int = 4): DataFrame = {
    val f = udf((b: Array[Byte]) => Codec.sampleFrames(b, nFrames))
    df.select(col(keyCol), posexplode(f(col(contentCol))).as(Seq("frame_idx", "frame")))
  }

  /** Deterministic media table derived from the documents fixture (text
    * bytes as payload) — gives the multimodal operators a reproducible
    * input without shipping binary fixtures.
    */
  def syntheticMediaFromDocs(docs: DataFrame): DataFrame = {
    val modality = element_at(
      typedLit(Seq("image", "audio", "video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType))
    docs.select(
      col("doc_id").as("media_id"),
      modality.as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"), lit(16).as("n_frames"),
        concat(lit("stub/"), modality).as("mime")).as("meta"))
  }
}
