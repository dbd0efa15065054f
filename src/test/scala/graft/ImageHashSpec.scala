package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Codec, SyntheticImage}

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def grayPng(size: Int, lum: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until size; x <- 0 until size) {
      val v = lum(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("aHash of the synthetic fixture is the replicated row pattern") {
    // group 0's pattern = smallest byte with 4 bits set = 0x0F
    val h = Codec.imageHash(SyntheticImage.png(0L))
    val expected = (0 until 8).map(r => 0x0FL << (r * 8)).reduce(_ | _)
    assert(h == expected)
  }

  test("per-doc perturbation changes bytes but not the hash") {
    val a = SyntheticImage.png(7L)
    val b = SyntheticImage.png(57L) // same group (7 % 50), different row
    assert(!java.util.Arrays.equals(a, b))
    assert(Codec.imageHash(a) == Codec.imageHash(b))
    // different groups land far apart (>= 2 bits per row)
    val c = SyntheticImage.png(8L)
    assert(java.lang.Long.bitCount(Codec.imageHash(a) ^ Codec.imageHash(c)) >= 16)
  }

  test("area pooling: a 2x upscale of the same pattern hashes identically") {
    val pat = 0x33 // 4 bits set
    def lum8(x: Int, y: Int) = if (((pat >> x) & 1) == 1) 220 else 30
    val small = grayPng(8, lum8)
    val big = grayPng(16, (x, y) => lum8(x / 2, y / 2))
    assert(Codec.imageHash(small) == Codec.imageHash(big))
  }

  test("one pixel crossing the mean moves the hash by exactly one bit") {
    val pat = 0x55
    def lum(x: Int, y: Int) = if (((pat >> x) & 1) == 1) 220 else 30
    val base = grayPng(8, lum)
    val flipped = grayPng(8, (x, y) =>
      if (x == 0 && y == 0) 30 else lum(x, y)) // bright -> dark at bit 0
    val d = java.lang.Long.bitCount(
      Codec.imageHash(base) ^ Codec.imageHash(flipped))
    assert(d == 1)
  }

  test("undecodable payloads get the deterministic fallback hash") {
    val a = Codec.imageHash("not an image".getBytes)
    val b = Codec.imageHash("not an image".getBytes)
    val c = Codec.imageHash("other bytes!".getBytes)
    assert(a == b && a != c)
  }

  test("imageNearDups finds exactly the within-group pairs") {
    // 3 groups x 3 docs (ids 0..8 with groups = 3): pairs are the 3
    // within-group combinations per group
    val df = (0L until 9L).map(id => (id, SyntheticImage.png(id, groups = 3)))
      .toDF("doc_id", "content")
    val pairs = Multimodal.imageNearDups(df, "doc_id", "content")
      .select("key_a", "key_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      g <- 0 until 3
      a <- 0 until 3; b <- (a + 1) until 3
    } yield ((g + 3L * a), (g + 3L * b), 0L))
      .map { case (x, y, h) => (math.min(x, y), math.max(x, y), h) }.toSet
    assert(pairs == want)
    // a near (not identical) image pairs within tolerance: flip one
    // pixel across the mean -> Hamming 1 <= 3
    val pat = 0x0F
    def lum(x: Int, y: Int) = if (((pat >> x) & 1) == 1) 220 else 30
    val near = Seq(
      (1L, grayPng(8, lum)),
      (2L, grayPng(8, (x, y) => if (x == 3 && y == 7) 30 else lum(x, y))))
      .toDF("doc_id", "content")
    val np = Multimodal.imageNearDups(near, "doc_id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(np.toSeq == Seq((1L, 2L, 1L)))
  }

  test("hammingNearDups refuses distances the pigeonhole cannot cover") {
    val df = Seq((1L, 0L)).toDF("k", "s")
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.hammingNearDups(df, "k", "s", maxHamming = 4)
    }
  }

  test("incremental hamming check: batch vs stored + within-batch, never corpus x corpus") {
    val h0 = 0x0F0F0F0F0F0F0F0FL
    val corpus = Seq((1L, h0), (2L, ~h0)).toDF("k", "h")
    val batch = Seq(
      (10L, h0 ^ 1L), // 1 bit from stored h0
      (11L, 0x1234567890ABCDEFL), // far from everything
      (12L, h0)) // exact stored dup + 1 bit from batch-mate 10
      .toDF("k", "h")
    val got = graft.dedup.Dedup
      .hammingNearDupsAgainst(corpus, batch, "k", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (10L, 1L, 1L), (10L, 12L, 1L),
      (12L, 1L, 0L), (12L, 10L, 1L)))
    // corpus rows never initiate a row; guard on the pigeonhole bound
    assert(!got.exists { case (k, _, _) => k == 1L || k == 2L })
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.hammingNearDupsAgainst(corpus, batch, "k", "h",
        maxHamming = 4)
    }
  }

  test("a one-byte frame edit moves the fallback hash by at most 2 bits") {
    import Multimodal.SyntheticVideo
    val base = SyntheticVideo.frame(3L, 0)
    val edited = base.clone
    edited(10) = (edited(10) ^ 1).toByte
    val d = java.lang.Long.bitCount(
      Codec.imageHash(base) ^ Codec.imageHash(edited))
    assert(d <= 2, s"expected <= 2 bit movement, got $d")
  }

  test("videoNearDups pairs same-footage edits, not different footage") {
    import Multimodal.SyntheticVideo
    // 2 groups x 3 docs (groups = 2): ids {0,2,4} share base video 0,
    // {1,3,5} share base video 1, each with a different 1-byte edit
    val df = (0L until 6L).map(id => (id, SyntheticVideo.nearAvi(id, groups = 2)))
      .toDF("doc_id", "content")
    val pairs = Multimodal
      .videoNearDups(df, "doc_id", "content", nFrames = 4, minMatches = 3)
      .select("key_a", "key_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 2L), (0L, 4L), (2L, 4L),
      (1L, 3L), (1L, 5L), (3L, 5L)))
    // parameter guards
    intercept[IllegalArgumentException] {
      Multimodal.videoNearDups(df, "doc_id", "content", nFrames = 17)
    }
    intercept[IllegalArgumentException] {
      Multimodal.videoNearDups(df, "doc_id", "content", minMatches = 5)
    }
  }

  test("audioHash: sample-level edits stay near, different audio lands far") {
    import Multimodal.SyntheticAudio
    val base = Codec.audioHash(SyntheticAudio.wav(5L))
    val edit = Codec.audioHash(SyntheticAudio.nearWav(25L, groups = 20))
    assert(java.lang.Long.bitCount(base ^ edit) <= 3,
      "a one-sample low-bit flip must stay within the Hamming budget")
    val other = Codec.audioHash(SyntheticAudio.wav(6L))
    assert(java.lang.Long.bitCount(base ^ other) > 3,
      "different waveforms must not collide")
    // fallback path is deterministic and byte-sensitive
    assert(Codec.audioHash("zzz".getBytes) == Codec.audioHash("zzz".getBytes))
  }

  test("audioNearDups pairs same-waveform edits only") {
    import Multimodal.SyntheticAudio
    val df = (0L until 6L).map(id => (id, SyntheticAudio.nearWav(id, groups = 2)))
      .toDF("doc_id", "content")
    val pairs = Multimodal.audioNearDups(df, "doc_id", "content")
      .select("key_a", "key_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 2L), (0L, 4L), (2L, 4L),
      (1L, 3L), (1L, 5L), (3L, 5L)))
  }

  test("mediaDedupStream: stateless stream-static screen, pairs emitted once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // corpus: one sketch per group (ids 0, 1 with groups = 2)
    val corpus = Seq(0L, 1L)
      .map(id => (id, Codec.imageHash(SyntheticImage.png(id, groups = 2))))
      .toDF("doc_id", "sketch")
    val mem = MemoryStream[(Long, Array[Byte])]
    val stream = mem.toDF().toDF("doc_id", "content")
    val out = graft.streaming.Streams.mediaDedupStream(
      stream, corpus, "doc_id", "content", kind = "image")
    val q = out.writeStream.format("memory").queryName("media_dedup_out")
      .outputMode("append").start()
    // two triggers: ids 10/11 match groups 0/1 at Hamming 0; 12 matches 0
    mem.addData((10L, SyntheticImage.png(10L, groups = 2)),
      (11L, SyntheticImage.png(11L, groups = 2)))
    q.processAllAvailable()
    mem.addData((12L, SyntheticImage.png(12L, groups = 2)))
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty,
      "the media screen must be completely stateless")
    q.stop()
    val got = spark.table("media_dedup_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly once per pair despite 4 matching blocks each
    assert(got.sorted.toSeq == Seq((0L, 10L, 0L), (0L, 12L, 0L), (1L, 11L, 0L)))
  }

  test("normalizeText: NFC composition, control strip, space collapse") {
    import graft.functions.TextFunctions
    val df = Seq(
      (1L, "caf" + "e\u0301" + "  bell\u0007gone\tdel\u007Fgone  "),
      (2L, "A\u030Angstro\u0308m"),
      (3L, "  plain  ")).toDF("id", "t")
    val out = df.select(col("id"), TextFunctions.normalizeText(col("t")).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) == "caf\u00e9 bellgone delgone")
    assert(out(2L) == "\u00c5ngstr\u00f6m" && out(2L).length == 8)
    assert(out(3L) == "plain")
  }
}
