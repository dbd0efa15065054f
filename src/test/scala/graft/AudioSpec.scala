package graft

import graft.multimodal.Multimodal.{Codec, SyntheticAudio}

class AudioSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("WAV round-trip: decoded PCM equals the synthesized samples") {
    val want = SyntheticAudio.samples(7L)
    val got = Codec.decodeAudio(SyntheticAudio.wav(7L)).get
    assert(got.sampleRate == 16000f)
    assert(got.samples.toSeq == want.toSeq)
  }

  test("stereo mixdown is the floor-average of the channels") {
    // interleaved L/R frames, including a negative odd-sum frame where
    // floorDiv and truncating division differ: (-3 + 0) / 2
    val l = Array(100, -3, 32767, -32768)
    val r = Array(200, 0, 32767, -32768)
    val inter = l.zip(r).flatMap { case (a, b) => Array(a, b) }
    val wav = SyntheticAudio.pcmToWav(inter, 8000, channels = 2)
    val got = Codec.decodeAudio(wav).get
    assert(got.samples.toSeq == l.zip(r).map { case (a, b) =>
      Math.floorDiv(a + b, 2) }.toSeq)
  }

  test("AIFF (big-endian container) decodes to the same samples") {
    val pcm = SyntheticAudio.samples(3L)
    val bytes = new Array[Byte](pcm.length * 2)
    var i = 0
    while (i < pcm.length) { // big-endian for AIFF
      bytes(2 * i) = ((pcm(i) >> 8) & 0xFF).toByte
      bytes(2 * i + 1) = (pcm(i) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      16000f, 16, 1, 2, 16000f, true)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, pcm.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val got = Codec.decodeAudio(bos.toByteArray).get
    assert(got.samples.toSeq == pcm.toSeq)
  }

  test("undecodable bytes yield None from the codec and decoded=false rows") {
    import spark.implicits._
    assert(Codec.decodeAudio("not audio at all".getBytes).isEmpty)
    assert(Codec.decodeAudio(Array.emptyByteArray).isEmpty)
    val df = Seq((1L, SyntheticAudio.wav(1L)), (2L, "junk".getBytes))
      .toDF("media_id", "content")
    val rows = graft.multimodal.Multimodal
      .extractAudioFeatures(df, "media_id", "content")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows == Map(1L -> true, 2L -> false))
  }

  test("features are exact integer aggregates of the decoded samples") {
    val id = 11L
    val v = SyntheticAudio.samples(id)
    val f = Codec.audioFeatures(SyntheticAudio.wav(id), nBands = 4).get
    val sumsq = v.map(x => x.toLong * x).sum
    assert(f.nSamples == v.length)
    assert(f.rms == math.sqrt(sumsq.toDouble / v.length) / 32768.0)
    val flips = v.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
    assert(f.zcr == flips.toDouble / (v.length - 1))
    assert(f.peak == v.map(x => math.abs(x.toLong)).max.toDouble / 32768.0)
    assert(f.bandEnergy.length == 4)
    // band RMS values of a non-silent signal are non-zero and bounded
    assert(f.bandEnergy.forall(e => e > 0.0 && e <= 1.0))
  }

  test("q54 decodes every synthetic payload") {
    val out = SparkEntry.queries("q54_audio_features")(spark, sf0001)
    val n = out.count()
    assert(n == 500L, s"expected all 500 docs decoded, got $n")
    val first = out.head()
    assert(first.getLong(1) >= 1600L)
    assert(first.getLong(2) == 16000L)
  }
}
