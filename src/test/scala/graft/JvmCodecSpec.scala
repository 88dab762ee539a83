package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The [[Multimodal.JvmCodecs]] seam proof: REAL decoding (javax.imageio
  * PNG, javax.sound.sampled WAV — pure JDK, no external library) driven
  * through the same Spark operators the stub codec runs under. Fixtures
  * are synthesized in-test (an encoded PNG and a PCM WAV built in memory),
  * so no binary files live in the repo.
  */
class JvmCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A w×h PNG with a deterministic gradient, encoded to real PNG bytes. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + y * 13) % 256) * 0x010101)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A mono 8-bit PCM WAV of `nFrames` samples at 8 kHz. */
  private def wavBytes(nFrames: Int): Array[Byte] = {
    val pcm = Array.tabulate(nFrames)(i =>
      (128 + 100 * math.sin(i * 0.1)).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeImageDims returns the true decoded raster size") {
    assert(Multimodal.JvmCodecs.decodeImageDims(pngBytes(37, 23)) == (37, 23))
  }

  test("frameCount: WAV reports its PCM frame length, PNG is one frame") {
    assert(Multimodal.JvmCodecs.frameCount(wavBytes(480)) == 480)
    assert(Multimodal.JvmCodecs.frameCount(pngBytes(8, 8)) == 1)
  }

  test("embed: unit-norm, deterministic, decode-sensitive") {
    val a = Multimodal.JvmCodecs.embed(pngBytes(16, 16), 32)
    val b = Multimodal.JvmCodecs.embed(pngBytes(16, 16), 32)
    val c = Multimodal.JvmCodecs.embed(wavBytes(480), 32)
    assert(a.toSeq == b.toSeq) // identical payloads, identical vectors
    assert(math.abs(a.map(x => x * x.toDouble).sum - 1.0) < 1e-5)
    assert(a.toSeq != c.toSeq)
  }

  test("mediaStats: dims/duration/level from real decode, mixed media") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", pngBytes(10, 4)),
      Multimodal.MediaRow(2L, "audio/wav", wavBytes(800))).toDS()
    val got = Multimodal.mediaStats(rows, Multimodal.JvmCodecs)
      .collect().sortBy(_.getLong(0))
    val img = got(0)
    assert((img.getLong(2), img.getLong(3), img.getLong(4),
      img.getLong(5)) == ((10L, 4L, 1L, 0L)))
    // mean luminance of the (7x+13y)%256 gradient over 10x4, exactly
    val expect = (for (y <- 0 until 4; x <- 0 until 10)
      yield (x * 7 + y * 13) % 256).sum.toDouble / 40
    assert(img.getDouble(6) == expect)
    val wav = got(1)
    // 800 frames at the container's native 8 kHz -> 100 ms
    assert((wav.getLong(4), wav.getLong(5)) == ((800L, 100L)))
    val pcmExpect = (0 until 800)
      .map(i => (128 + 100 * math.sin(i * 0.1)).toByte & 0xff)
      .sum.toDouble / 800
    assert(wav.getDouble(6) == pcmExpect)
  }

  test("the real codec drives the Spark operators through the same seam") {
    import spark.implicits._
    val rows = Seq(
      (1L, pngBytes(37, 23)),
      (2L, pngBytes(64, 16))
    ).toDF("id", "data")
    val media = Multimodal.asMedia(rows, "id", "data", "image/png")
    val meta = Multimodal.imageMetadata(media, Multimodal.JvmCodecs)
      .collect().sortBy(_.id)
    assert(meta.map(m => (m.id, m.width, m.height)).toSeq ==
      Seq((1L, 37, 23), (2L, 64, 16)))
    val emb = Multimodal.embedMedia(media, dim = 32, Multimodal.JvmCodecs)
    assert(emb.count() == 2)
    // audio frames through sampleFrames: stride 100 over 480 PCM frames
    val wav = Multimodal.asMedia(
      Seq((9L, wavBytes(480))).toDF("id", "data"), "id", "data", "audio/wav")
    val frames = Multimodal.sampleFrames(wav, stride = 100, Multimodal.JvmCodecs)
    assert(frames.count() == 5) // frames 0,100,200,300,400
  }

  test("committed binary fixtures decode to their pinned truth (mm5)") {
    // bytes from the repo, not from any in-process generator — the last
    // synthetic-only asterisk on the codec seam
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/graft/media/$name")
      assert(in != null, s"missing committed fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val png = res("fixture.png")
    val wav = res("fixture.wav")
    assert(Multimodal.JvmCodecs.decodeImageDims(png) == ((12, 8)))
    assert(Multimodal.JvmCodecs.frameCount(png) == 1)
    assert(math.floor(Multimodal.JvmCodecs.meanLevel(png) * 1e6 + 0.5) / 1e6
      == 126.385417)
    assert(Multimodal.JvmCodecs.frameCount(wav) == 333)
    assert(Multimodal.JvmCodecs.sampleRateHz(wav) == 11025)
    assert(math.floor(Multimodal.JvmCodecs.meanLevel(wav) * 1e6 + 0.5) / 1e6
      == 130.900901)
  }

  test("dHash64: brightness-shift invariance, structural sensitivity, " +
      "and the banded near-dup join finds exactly the planted pairs (mm6)") {
    def img(bytes: Array[Byte]) =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    def h(a: Int, b: Int, off: Int): Long =
      Multimodal.dHash64(img(Multimodal.SyntheticMedia.gradientPng(
        27, 16, a, b, off)))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    // same structure, shifted brightness: a few bits at most (the wrap
    // fronts move slightly); different slope pair: many bits
    assert(ham(h(49, 34, 0), h(49, 34, 1)) <= 4)
    assert(ham(h(49, 34, 0), h(58, 45, 0)) > 7)
    // identical raster, identical hash
    assert(h(103, 67, 2) == h(103, 67, 2))

    // the per-id pair emitter: 3 planted classes x {2,2,3} members with
    // per-member brightness jitter -> exactly the within-class pairs
    val rows = Seq(
      (1L, 0, 0), (2L, 0, 1), // class 0
      (3L, 1, 0), (4L, 1, 2), // class 1
      (5L, 2, 0), (6L, 2, 1), (7L, 2, 2)) // class 2
    import spark.implicits._
    val media = rows.map { case (id, cls, off) =>
      Multimodal.MediaRow(id, "image/png",
        Multimodal.SyntheticMedia.gradientPng(
          27, 16, 40 + 9 * cls, 23 + 11 * cls, off))
    }.toDS()
    val pairs = Multimodal.dHashNearDup(media, maxHamming = 7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L), (5L, 6L), (5L, 7L), (6L, 7L)))
  }

  test("audioHash64: gain invariance, rotation classes differ in exactly " +
      "16 bits, and the banded near-dup join finds the planted pairs (mm7)") {
    def h(cls: Int, gain: Int): Long =
      Multimodal.audioHash64(
        Multimodal.SyntheticMedia.envelopeWav(1300, cls, gain))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    // gain scaling preserves every window-energy ordering: EQUAL hash
    assert(h(3, 65) == h(3, 80) && h(3, 80) == h(3, 95))
    // rotated sawtooths: wrap positions disjoint mod 8 -> exactly 2
    // differing comparisons per 8-window cycle = 16 of 64 bits
    for (a <- 0 until 8; b <- (a + 1) until 8)
      assert(ham(h(a, 80), h(b, 80)) == 16, s"classes $a vs $b")

    // the per-id pair emitter over 3 classes x {2,2,3} gain-jittered
    // members -> exactly the within-class pairs
    val rows = Seq(
      (1L, 0, 65), (2L, 0, 95), // class 0
      (3L, 4, 65), (4L, 4, 80), // class 4
      (5L, 7, 65), (6L, 7, 80), (7L, 7, 95)) // class 7
    import spark.implicits._
    val media = rows.map { case (id, cls, gain) =>
      Multimodal.MediaRow(id, "audio/wav",
        Multimodal.SyntheticMedia.envelopeWav(1300, cls, gain))
    }.toDS()
    val pairs2 = Multimodal.audioNearDup(media, maxHamming = 7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs2 == Set((1L, 2L), (3L, 4L), (5L, 6L), (5L, 7L), (6L, 7L)))
  }
}
