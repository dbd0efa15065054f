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
  * real bilinear rescale re-encoded as PNG. AUDIO decoding is REAL too:
  * `javax.sound.sampled` parses WAV/AIFF/AU containers to PCM, and
  * features (RMS, zero-crossing rate, peak, time-banded energy) come
  * from the decoded samples. Payloads neither codec recognizes — and
  * video, for which the JDK ships no codec — fall back to deterministic
  * byte-hash stubs, so every operator stays total and reproducible on
  * arbitrary bytes.
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

    /** 64-bit perceptual hash (aHash): decode, area-average down to an
      * 8x8 luminance grid, threshold each cell at the grid mean —
      * bit `y*8+x` set iff cell (x, y) is at least as bright as the
      * mean. Near-identical images (re-encodes, small pixel edits,
      * light resizes) land within a few bits of each other, so image
      * near-dup dedup is Hamming distance on longs — the SimHash
      * machinery verbatim ([[graft.dedup.Dedup.hammingNearDups]]).
      * Undecodable payloads fall back to the sign bits of the same
      * deterministic hash stub [[hashFeatures]] uses, so the operator
      * is total over arbitrary binary columns and byte-identical blobs
      * still collide exactly.
      */
    def imageHash(bytes: Array[Byte]): Long =
      decodeImage(bytes) match {
        case Some(img) =>
          val w = img.getWidth
          val h = img.getHeight
          // area-average pooling onto the 8x8 grid (integer cell
          // boundaries; every source pixel contributes to exactly one
          // cell) — deterministic, no Graphics2D interpolation involved
          val sums = new Array[Double](64)
          val counts = new Array[Long](64)
          var y = 0
          while (y < h) {
            val gy = math.min(7, y * 8 / h)
            var x = 0
            while (x < w) {
              val gx = math.min(7, x * 8 / w)
              val rgb = img.getRGB(x, y)
              val lum = 0.299 * ((rgb >> 16) & 0xFF) +
                0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
              sums(gy * 8 + gx) += lum
              counts(gy * 8 + gx) += 1
              x += 1
            }
            y += 1
          }
          val cells = Array.tabulate(64)(i =>
            if (counts(i) == 0) 0.0 else sums(i) / counts(i))
          val mean = cells.sum / 64.0
          var bits = 0L
          var i = 0
          while (i < 64) {
            if (cells(i) >= mean) bits |= (1L << i)
            i += 1
          }
          bits
        case None =>
          val v = hashFeatures(bytes, 64)
          var bits = 0L
          var i = 0
          while (i < 64) {
            if (v(i) >= 0f) bits |= (1L << i)
            i += 1
          }
          bits
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

    /** REAL video-container parsing for MJPEG-style AVI: a RIFF walk
      * collecting the `movi` stream's `##db`/`##dc` chunks (each chunk
      * IS one frame's image bytes — for MJPEG, a plain JPEG that
      * [[decodeImage]] can decode). The JDK ships no inter-frame video
      * codec, so compressed formats (H.264 etc.) still fall back to the
      * byte-window stub — but the container/frame plumbing is real and
      * the sampled frames of an MJPEG AVI are real images.
      */
    def parseAviFrames(bytes: Array[Byte]): Option[Vector[Array[Byte]]] = {
      if (bytes == null || bytes.length < 12) return None
      def fourcc(o: Int) = new String(bytes, o, 4, "US-ASCII")
      def u32(o: Int): Long =
        (bytes(o) & 0xFFL) | (bytes(o + 1) & 0xFFL) << 8 |
          (bytes(o + 2) & 0xFFL) << 16 | (bytes(o + 3) & 0xFFL) << 24
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      val frames = Vector.newBuilder[Array[Byte]]
      def isFrameId(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.substring(2) == "db" || id.substring(2) == "dc")
      def walk(start: Int, end: Int): Unit = {
        var o = start
        var ok = true
        while (ok && o + 8 <= end) {
          val id = fourcc(o)
          val size = u32(o + 4)
          val dataStart = o + 8
          if (size < 0 || dataStart + size > end) ok = false // malformed
          else {
            val dataEnd = (dataStart + size).toInt
            if (id == "LIST" || id == "RIFF") walk(dataStart + 4, dataEnd)
            else if (isFrameId(id) && size > 0)
              frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            o = dataEnd + (size & 1).toInt // chunks pad to even
          }
        }
      }
      walk(12, math.min(bytes.length.toLong, 8 + u32(4)).toInt)
      val f = frames.result()
      if (f.isEmpty) None else Some(f)
    }

    /** Frame extraction: REAL for AVI payloads (n evenly spaced frames
      * out of the container's actual frame chunks); byte-window STUB for
      * everything else (no JDK codec); empty payloads yield n empty
      * frames.
      */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      parseAviFrames(bytes) match {
        case Some(frames) =>
          (0 until n).map(i => frames((i.toLong * frames.length / n).toInt))
        case None =>
          if (bytes == null || bytes.isEmpty) Seq.fill(n)(Array.emptyByteArray)
          else (0 until n).map { f =>
            val start = (f.toLong * bytes.length / n).toInt
            val end = math.min(bytes.length, start + math.max(1, bytes.length / n))
            java.util.Arrays.copyOfRange(bytes, start, math.max(start + 1, end))
          }
      }

    /** Decoded audio: mono-mixed 16-bit samples + source rate. */
    final case class AudioInfo(samples: Array[Int], sampleRate: Float)

    /** REAL audio decode via `javax.sound.sampled` (WAV/AIFF/AU ship in
      * the JDK — no external codec needed, unlike video). Any input
      * encoding is converted to 16-bit signed PCM; multi-channel frames
      * are mixed down by per-frame channel average (floor division, so
      * the mix is integer-exact and deterministic). Unrecognized bytes
      * yield None and callers fall back to the hash stub, mirroring
      * exactly what [[decodeImage]] does for images.
      */
    def decodeAudio(bytes: Array[Byte]): Option[AudioInfo] =
      if (bytes == null || bytes.isEmpty) None
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, fmt.getChannels,
            fmt.getChannels * 2, fmt.getSampleRate, /*bigEndian=*/ false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
          val raw = pcm.readAllBytes()
          val ch = fmt.getChannels
          val nFrames = raw.length / (2 * ch)
          val out = new Array[Int](nFrames)
          var f = 0
          while (f < nFrames) {
            var sum = 0
            var c = 0
            while (c < ch) {
              val o = (f * ch + c) * 2
              sum += ((raw(o) & 0xFF) | (raw(o + 1) << 8)) // LE signed 16-bit
              c += 1
            }
            out(f) = Math.floorDiv(sum, ch)
            f += 1
          }
          Some(AudioInfo(out, fmt.getSampleRate))
        } finally in.close()
      } catch { case _: Exception => None }

    /** Scalar audio features + time-banded energy. Every scalar derives
      * from EXACT integer aggregates of the decoded samples (sum of
      * squares, sign-flip count, max abs) before the single f64
      * conversion, so the values are bit-reproducible across JVMs and
      * replicable in SQL — the same determinism contract the dedup hashes
      * keep.
      */
    /** 64-bit audio fingerprint: the DECODED sample stream splits into
      * 64 contiguous windows (floor boundaries — window of sample i is
      * `i*64/n`), bit w set iff window w's absolute-amplitude sum is at
      * least the per-window mean (`sumAbs(w) * 64 >= totalAbs`) — a
      * coarse loudness envelope, robust to re-encodes and sample-level
      * edits, integer-exact so any engine re-derives it from the
      * generator formula (the q54 oracle discipline). Undecodable
      * payloads fall back to [[hashFeatures]] sign bits like
      * [[imageHash]]. Near-dup audio is then Hamming distance through
      * [[graft.dedup.Dedup.hammingNearDups]].
      */
    def audioHash(bytes: Array[Byte]): Long =
      decodeAudio(bytes) match {
        case Some(a) if a.samples.nonEmpty =>
          val v = a.samples
          val n = v.length
          val sums = new Array[Long](64)
          var i = 0
          var total = 0L
          while (i < n) {
            val a0 = math.abs(v(i).toLong)
            sums((i.toLong * 64 / n).toInt) += a0
            total += a0
            i += 1
          }
          var bits = 0L
          var w = 0
          while (w < 64) {
            if (sums(w) * 64 >= total) bits |= (1L << w)
            w += 1
          }
          bits
        case _ =>
          val v = hashFeatures(bytes, 64)
          var bits = 0L
          var i = 0
          while (i < 64) {
            if (v(i) >= 0f) bits |= (1L << i)
            i += 1
          }
          bits
      }

    final case class AudioFeatures(
        nSamples: Long, sampleRateHz: Double, rms: Double, zcr: Double,
        peak: Double, bandEnergy: Array[Double])

    def audioFeatures(bytes: Array[Byte], nBands: Int = 8): Option[AudioFeatures] =
      decodeAudio(bytes).map { a =>
        val v = a.samples
        val n = v.length
        var sumsq = 0L
        var flips = 0L
        var pk = 0L
        val bandSq = new Array[Long](nBands)
        val bandN = new Array[Long](nBands)
        var i = 0
        while (i < n) {
          val x = v(i).toLong
          sumsq += x * x
          if (i > 0 && ((v(i) >= 0) != (v(i - 1) >= 0))) flips += 1
          if (math.abs(x) > pk) pk = math.abs(x)
          val b = ((i.toLong * nBands) / math.max(n, 1)).toInt.min(nBands - 1)
          bandSq(b) += x * x
          bandN(b) += 1
          i += 1
        }
        AudioFeatures(
          nSamples = n,
          sampleRateHz = a.sampleRate.toDouble,
          rms = if (n == 0) 0.0 else math.sqrt(sumsq.toDouble / n) / 32768.0,
          zcr = if (n < 2) 0.0 else flips.toDouble / (n - 1),
          peak = pk.toDouble / 32768.0,
          bandEnergy = Array.tabulate(nBands)(b =>
            if (bandN(b) == 0) 0.0
            else math.sqrt(bandSq(b).toDouble / bandN(b)) / 32768.0))
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

  /** Audio feature extraction partition-parallel, same `mapPartitions`
    * batch shape as [[extractFeatures]]: one decoder per task, no driver
    * involvement. Undecodable payloads keep their row with
    * `decoded = false` and null features (total over arbitrary binaries,
    * never an exception mid-scan).
    */
  def extractAudioFeatures(df: DataFrame, keyCol: String, contentCol: String,
                           nBands: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("n_samples", LongType, nullable = true),
      StructField("sample_rate", DoubleType, nullable = true),
      StructField("rms", DoubleType, nullable = true),
      StructField("zcr", DoubleType, nullable = true),
      StructField("peak", DoubleType, nullable = true),
      StructField("band_energy", ArrayType(DoubleType), nullable = true)))
    val rdd = df.select(col(keyCol).cast(LongType), col(contentCol)).rdd
      .mapPartitions(_.map { r =>
        Codec.audioFeatures(r.getAs[Array[Byte]](1), nBands) match {
          case Some(f) => Row(r.getLong(0), true, f.nSamples, f.sampleRateHz,
            f.rms, f.zcr, f.peak, f.bandEnergy.toSeq)
          case None => Row(r.getLong(0), false, null, null, null, null, null, null)
        }
      })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic audio fixture: a pure-INTEGER sample generator (no
    * trig, no floats) rendered to real RIFF/WAVE bytes through the JDK's
    * own writer. Integer-only synthesis keeps the decoded features
    * SQL-replicable bit-for-bit (the oracle reproduces the generator with
    * BIGINT arithmetic), while the payload still exercises the full
    * WAV container + PCM decode path.
    */
  /** Deterministic REAL-PNG fixture for the image near-dup gate. Each
    * document renders an 8x8 grayscale PNG through the JDK encoder:
    * every row carries its GROUP's 8-bit pattern (group = doc_id %
    * groups; pattern = the group-th byte with exactly 4 bits set, in
    * ascending numeric order — 32 bright pixels at 220, 32 dark at 30),
    * plus ONE per-document perturbed bright pixel (210). The perturbation
    * makes every PNG's BYTES unique — no exact-dup shortcut can produce
    * the pairs — while the decoded 8x8 aHash collapses each group to a
    * single 64-bit code (210 and 220 both sit above the ~125 mean).
    * Distinct 4-of-8 row patterns differ in >= 2 bits per row, so
    * cross-group Hamming >= 16 and every 16-bit block separates the
    * groups (no degenerate candidate buckets). Expected near-dup pairs
    * are therefore exactly the within-group pairs — SQL-derivable from
    * doc_id alone, which is what lets a REAL decode path carry a full
    * DuckDB oracle.
    */
  object SyntheticImage {
    val Size = 8

    /** The 70 bytes with exactly 4 bits set, ascending; index g is
      * group g's per-row pattern.
      */
    private val Patterns: Array[Int] =
      (0 until 256).filter(java.lang.Integer.bitCount(_) == 4).toArray

    def png(docId: Long, groups: Int = 50): Array[Byte] = {
      require(groups >= 1 && groups <= Patterns.length,
        s"groups must be in 1..${Patterns.length}, got $groups")
      val g = (docId % groups).toInt
      val pat = Patterns(g)
      val img = new java.awt.image.BufferedImage(
        Size, Size, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < Size) {
        var x = 0
        while (x < Size) {
          val v = if (((pat >> x) & 1) == 1) 220 else 30
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      // per-doc perturbation: the first bright pixel of a doc-chosen row
      val row = ((docId / groups) % Size).toInt
      val firstBright = (0 until Size).find(x => ((pat >> x) & 1) == 1).get
      img.setRGB(firstBright, row, (210 << 16) | (210 << 8) | 210)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Audio near-duplicate pairs: [[Codec.audioHash]]'s loudness-envelope
    * fingerprint per payload (REAL container + PCM decode; byte-hash
    * fallback for unrecognized bytes), then the shared Hamming candidate
    * join — re-encodes and sample-level edits match, different audio
    * does not. Same scale shape as [[imageNearDups]].
    */
  def audioNearDups(df: DataFrame, keyCol: String, contentCol: String,
                    maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame = {
    val hashUdf = udf((b: Array[Byte]) => Codec.audioHash(b))
    graft.dedup.Dedup.hammingNearDups(
      df.select(col(keyCol), hashUdf(col(contentCol)).as("__ah")),
      keyCol, "__ah", maxHamming, maxBucket)
  }

  /** Image near-duplicate pairs: perceptual hash per payload
    * ([[Codec.imageHash]] — real decode, hash-stub fallback), then the
    * SimHash block-pigeonhole candidate join + `bit_count(xor)` verify
    * ([[graft.dedup.Dedup.hammingNearDups]]). Returns
    * `(key_a, key_b, hamming)`, key_a < key_b. Scale shape: the hash is
    * a row-local map (one decode per payload, no shuffle), candidates
    * are an equi-join on 16-bit block values — never an all-pairs
    * product; output is quadratic only in true near-dup cluster sizes,
    * which is the answer's own size.
    */
  def imageNearDups(df: DataFrame, keyCol: String, contentCol: String,
                    maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame = {
    val hashUdf = udf((b: Array[Byte]) => Codec.imageHash(b))
    graft.dedup.Dedup.hammingNearDups(
      df.select(col(keyCol), hashUdf(col(contentCol)).as("__ph")),
      keyCol, "__ph", maxHamming, maxBucket)
  }

  /** Video near-duplicate pairs: sample `nFrames` frames per video
    * through the real container walk ([[Codec.sampleFrames]] —
    * RIFF/AVI), perceptual-hash each frame ([[Codec.imageHash]]:
    * real decode for encoded frames, the deterministic byte-hash
    * fallback for raw/unknown codecs), and pair videos whose SAME
    * frame slot matches within `maxHamming` on at least `minMatches`
    * of the sampled slots — re-encodes and single-frame edits match,
    * different footage does not. (key, slot) packs into one long so
    * the Hamming machinery ([[graft.dedup.Dedup.hammingNearDups]])
    * runs once over all slots; slot-aligned comparison means a video
    * can never match another's different scene. Scale shape: frame
    * decode is a row-local explode (nFrames rows/video), candidates
    * are the block equi-join, and the final filter is a partial-agg'd
    * count over candidate pairs — no all-pairs product anywhere.
    * Returns `(key_a, key_b, n_frames_matched)`, key_a < key_b.
    */
  def videoNearDups(df: DataFrame, keyCol: String, contentCol: String,
                    nFrames: Int = 4, minMatches: Int = 3,
                    maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame = {
    require(nFrames >= 1 && nFrames <= 16,
      s"nFrames must be in 1..16 (4-bit slot packing), got $nFrames")
    require(minMatches >= 1 && minMatches <= nFrames,
      s"minMatches must be in 1..$nFrames, got $minMatches")
    val frames = sampleFrames(df, keyCol, contentCol, nFrames)
    val hashUdf = udf((b: Array[Byte]) => Codec.imageHash(b))
    val packed = frames.select(
      (shiftleft(col(keyCol).cast("long"), 4) + col("frame_idx")).as("pk"),
      hashUdf(col("frame")).as("fh"))
    graft.dedup.Dedup.hammingNearDups(packed, "pk", "fh", maxHamming, maxBucket)
      .filter(col("key_a").bitwiseAND(lit(15L)) ===
        col("key_b").bitwiseAND(lit(15L)))
      .select(shiftright(col("key_a"), 4).as("va"),
        shiftright(col("key_b"), 4).as("vb"))
      .groupBy(col("va"), col("vb"))
      .agg(count(lit(1)).as("n_frames_matched"))
      .filter(col("n_frames_matched") >= minMatches)
      .select(col("va").as("key_a"), col("vb").as("key_b"),
        col("n_frames_matched"))
  }

  object SyntheticAudio {
    val SampleRate = 16000

    /** `n = 1600 + (id % 5) * 160` samples;
      * `v_i = ((id*7919 + 31*i^2 + 12345*i) mod 65536) - 32768`.
      */
    def samples(docId: Long): Array[Int] = {
      val n = 1600 + (docId % 5).toInt * 160
      Array.tabulate(n)(i =>
        (((docId * 7919L + 31L * i * i + 12345L * i) % 65536L) - 32768L).toInt)
    }

    /** 16-bit mono PCM WAV of [[samples]]. */
    def wav(docId: Long): Array[Byte] = pcmToWav(samples(docId), SampleRate, 1)

    /** Near-duplicate fixture for the audio dedup gate: the GROUP's base
      * waveform (group = docId % groups) with ONE sample's low bit
      * flipped per document — unique WAV bytes per doc, while the
      * loudness-envelope hash moves by at most a couple of bits (the
      * |amplitude| shift is ±1 within one of 64 windows whose sums are
      * ~10^5). The planting is integer-exact, so whether any window sits
      * on the threshold boundary is a FIXED property of the generator —
      * the gate rehearsal proves the within-group budget empirically and
      * it can never drift.
      */
    def nearWav(docId: Long, groups: Int = 20): Array[Byte] = {
      val g = docId % groups
      val v = samples(g)
      val p = ((docId / groups) % v.length).toInt
      v(p) = v(p) ^ 1
      pcmToWav(v, SampleRate, 1)
    }

    /** Render 16-bit interleaved samples as WAV via `AudioSystem.write`. */
    def pcmToWav(pcm: Array[Int], sampleRate: Int, channels: Int): Array[Byte] = {
      val bytes = new Array[Byte](pcm.length * 2)
      var i = 0
      while (i < pcm.length) {
        bytes(2 * i) = (pcm(i) & 0xFF).toByte
        bytes(2 * i + 1) = ((pcm(i) >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, channels, channels * 2, sampleRate.toFloat, false)
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, pcm.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Minimal MJPEG-AVI writer: a real RIFF/AVI container (hdrl with
    * avih + one MJPG video stream, movi with one `00dc` chunk per
    * frame) around caller-provided frame payloads. Written for fixture
    * generation and round-trip tests of [[Codec.parseAviFrames]]; the
    * structure is the standard one any AVI reader walks.
    */
  object AviWriter {
    private def le32(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      cc(id) ++ le32(data.length) ++ data ++ pad
    }
    private def list(kind: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(kind) ++ data)

    def build(frames: Seq[Array[Byte]], width: Int, height: Int,
              fps: Int = 10): Array[Byte] = {
      val usPerFrame = 1000000L / math.max(fps, 1)
      val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
        le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val strh = cc("vids") ++ cc("MJPG") ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.length) ++ le32(0) ++
        le32(0) ++ le32(0) ++ Array.fill(8)(0.toByte)
      val strf = le32(40) ++ le32(width) ++ le32(height) ++
        Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++ cc("MJPG") ++
        le32(width.toLong * height * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val hdrl = list("hdrl",
        chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
      val body = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ le32(body.length) ++ body
    }
  }

  /** Deterministic video fixture: pattern-byte frames (NOT JPEGs — the
    * payload arithmetic is SQL-replicable, like [[SyntheticAudio]])
    * inside a real AVI container, so an oracle can verify the container
    * walk end-to-end: frame j has `64 + (j % 4) * 16` bytes and byte i
    * is `(id*31 + j*7 + i) % 256`. Real-JPEG frames are exercised by
    * the specs with ImageIO-encoded payloads instead.
    */
  object SyntheticVideo {
    def frameLen(j: Int): Int = 64 + (j % 4) * 16
    def nFrames(id: Long): Int = 6 + (id % 3).toInt * 2

    def frame(id: Long, j: Int): Array[Byte] =
      Array.tabulate(frameLen(j))(i => ((id * 31 + j * 7 + i) % 256).toByte)

    def avi(id: Long): Array[Byte] =
      AviWriter.build((0 until nFrames(id)).map(frame(id, _)), 64, 48)

    /** Near-duplicate fixture for the video dedup gate: the GROUP's
      * base video (group = docId % groups) with ONE byte of ONE frame
      * low-bit-flipped per document — every AVI's bytes are unique, but
      * the fallback frame hash moves by at most 2 bits for a 1-byte
      * change (the byte leaves one of the 64 bins and enters another;
      * a bit flips only where a bin crosses zero), so same-slot frames
      * across a group stay within Hamming 2 <= 3 and at most one
      * sampled slot per PAIR can exceed it (both docs perturbing the
      * same slot compound to <= 4) — minMatches = 3 of 4 therefore
      * pairs every within-group combination, which is what lets the
      * q178 oracle derive the answer from doc_id alone.
      */
    def nearAvi(docId: Long, groups: Int = 25): Array[Byte] = {
      val g = docId % groups
      val frames = (0 until nFrames(g)).map(frame(g, _).clone).toArray
      val fj = ((docId / groups) % nFrames(g)).toInt
      val bi = ((docId % 37) % frames(fj).length).toInt
      frames(fj)(bi) = (frames(fj)(bi) ^ 1).toByte
      AviWriter.build(frames.toSeq, 64, 48)
    }
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
