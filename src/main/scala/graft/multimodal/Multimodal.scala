package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.StableHash

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side contract — schema, partition-parallel batch shape,
  * deterministic outputs — is real and tested. The actual media decoding
  * is STUBBED behind [[StubCodec]] (this build has no image/audio
  * libraries): every stub derives its output deterministically from the
  * raw bytes, so pipelines built on these operators are fully
  * reproducible and swap to a real codec by replacing one object.
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

  /** STUB codec: all "decoding" is a deterministic function of the bytes.
    * Replace with a real implementation (e.g. JNI/ImageIO/ffmpeg) without
    * touching the operators below — they only see these signatures.
    */
  object StubCodec extends Serializable {
    /** ??? in spirit — a real decoder would parse the image; the stub
      * hashes byte windows into a fixed-dim feature vector (unit norm).
      */
    def imageFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      if (bytes.nonEmpty) {
        var i = 0
        while (i < bytes.length) {
          val h = StableHash.mix64(bytes(i).toLong * 31 + i)
          v(math.floorMod(h, dim).toInt) += (if ((h & 16) == 0) 1f else -1f)
          i += 1
        }
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        if (n > 0) { var j = 0; while (j < dim) { v(j) = (v(j) / n).toFloat; j += 1 } }
      }
      v
    }

    /** Stub "resize": deterministic re-sampling of the byte stream.
      * Empty payloads resize to empty (no index arithmetic on them).
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (bytes.isEmpty) return Array.emptyByteArray
      val out = new Array[Byte](math.max(1, w * h / 64))
      var i = 0
      while (i < out.length) {
        out(i) = bytes(((i.toLong * bytes.length) / out.length).toInt.min(bytes.length - 1))
        i += 1
      }
      out
    }

    /** Stub frame extraction: n evenly spaced byte windows as "frames";
      * empty payloads yield n empty frames.
      */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      if (bytes.isEmpty) Seq.fill(n)(Array.emptyByteArray)
      else (0 until n).map { f =>
        val start = (f.toLong * bytes.length / n).toInt
        val end = math.min(bytes.length, start + math.max(1, bytes.length / n))
        java.util.Arrays.copyOfRange(bytes, start, math.max(start + 1, end))
      }
  }

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
        Row(r.getLong(0), StubCodec.imageFeatures(r.getAs[Array[Byte]](1), dim).toSeq)
      })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize operator over image rows (plumbing only; stub codec). */
  def resizeImages(df: DataFrame, contentCol: String, w: Int, h: Int): DataFrame = {
    val f = udf((b: Array[Byte]) => StubCodec.resize(b, w, h))
    df.withColumn("content_resized", f(col(contentCol)))
  }

  /** Frame-sampling as a generator: one row per sampled frame with its
    * index — the video analog of the chunker's 1-text -> N-chunks shape.
    */
  def sampleFrames(df: DataFrame, keyCol: String, contentCol: String,
                   nFrames: Int = 4): DataFrame = {
    val f = udf((b: Array[Byte]) => StubCodec.sampleFrames(b, nFrames))
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
