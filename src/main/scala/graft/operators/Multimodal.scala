package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Model: media travels as an opaque `binary` column plus typed metadata
  * (mime, width/height or sample-rate, etc.). The Spark-side plumbing —
  * schema, batch iteration via `mapPartitions` on a typed Dataset,
  * partition-size control — is real; the actual codec work is STUBBED with a
  * deterministic fake because no image/audio library ships in this
  * container. Swap [[StubCodecs]] for a real decoder (e.g. javacpp/ffmpeg)
  * without touching the operator shape.
  *
  * Scale notes: media rows are large, so operators repartition by byte
  * budget, not row count, before the decode stage (a 100 MB video row and a
  * 10 KB thumbnail must not land in the same fixed-row-count partition), and
  * the decode runs per-partition (one codec init per partition, not per row).
  */
object Multimodal {

  final case class MediaRow(id: Long, mime: String, data: Array[Byte])
  final case class ImageMeta(id: Long, mime: String, width: Int, height: Int,
      nBytes: Long, sha: String)
  final case class Frame(id: Long, frameIndex: Int, width: Int, height: Int,
      nBytes: Long)

  /** The decode seam: every operator takes a codec as a parameter, so a
    * real decoder (javacpp/ffmpeg, an inference runtime for [[MediaCodec
    * .embed]]) swaps in without touching the Spark plumbing. Implementations
    * must be Serializable — they ship inside the `mapPartitions` closures
    * and are instantiated once per executor, with per-partition reuse.
    */
  trait MediaCodec extends Serializable {
    def decodeImageDims(data: Array[Byte]): (Int, Int)
    def frameCount(data: Array[Byte]): Int
    /** Feature-extract the payload to a unit-norm `dim`-float vector. */
    def embed(data: Array[Byte], dim: Int): Array[Float]
    /** Native sample rate in Hz for timed media, 0 for stills —
      * `frameCount / sampleRateHz` is the duration. */
    def sampleRateHz(data: Array[Byte]): Int = 0
    /** Mean signal level: mean decoded luminance for rasters, mean
      * unsigned PCM sample for audio — the "is this black/silent"
      * channel statistic a media-QC gate filters on. */
    def meanLevel(data: Array[Byte]): Double
  }

  /** ======== STUB: deterministic fake codec (the default) ========
    * Real implementations would decode the byte payload; this derives
    * deterministic pseudo-metadata from the bytes so tests are stable and
    * an engine-independent oracle can reproduce every value in ANSI SQL.
    */
  object StubCodecs extends MediaCodec {
    def decodeImageDims(data: Array[Byte]): (Int, Int) = {
      // STUB — replace with a real image decoder. Fake dims derived from the
      // payload length by plain BIGINT arithmetic (Knuth multiplicative mix)
      // so an engine-independent oracle can reproduce them in ANSI SQL.
      val h = data.length.toLong * 2654435761L
      ((256 + (h % 1024)).toInt, (256 + ((h / 1024) % 1024)).toInt)
    }
    def frameCount(data: Array[Byte]): Int = 1 + (data.length % 8)
    /** STUB embed: L2-normalized byte histogram folded into `dim` bins —
      * deterministic, and identical payloads give identical vectors (the
      * property mm3's planted-dup invariant rides on).
      */
    def embed(data: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      data.foreach(b => v((b & 0xff) % dim) += 1f)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      if (n > 0) v.map(_ / n) else v
    }
    /** STUB meanLevel: mean unsigned payload byte — SQL-replayable. */
    def meanLevel(data: Array[Byte]): Double =
      if (data.isEmpty) 0.0
      else data.foldLeft(0L)((s, b) => s + (b & 0xff)).toDouble / data.length
  }

  /** ======== REAL pure-JVM codec (seam proof) ========
    * Genuine decoding for the formats the JDK itself ships codecs for —
    * PNG/GIF/BMP via `javax.imageio`, WAV/AIFF PCM via
    * `javax.sound.sampled` — no external library. Proves the [[MediaCodec]]
    * seam with real decode work end-to-end through the same Spark plumbing
    * ([[imageMetadata]]/[[sampleFrames]]/[[embedMedia]]); [[StubCodecs]]
    * stays the DEFAULT because the registry oracles must reproduce every
    * value in engine-independent SQL, which real pixel decoding cannot.
    *
    *  - `decodeImageDims`: actual decoded raster dimensions.
    *  - `frameCount`: audio payloads report their PCM frame length (the
    *    natural "frames" of a 1-D medium); image payloads are 1 frame.
    *  - `embed`: an L2-normalized luminance histogram of the DECODED
    *    pixels (or of PCM bytes for audio) — same contract as the stub
    *    (identical payloads ⇒ identical vectors), real decode underneath.
    */
  object JvmCodecs extends MediaCodec {
    private def readImage(data: Array[Byte]) =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))

    private def audioFrames(data: Array[Byte]): Option[Int] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(data))
        try Some(math.min(in.getFrameLength, Int.MaxValue.toLong).toInt)
        finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
      }

    def decodeImageDims(data: Array[Byte]): (Int, Int) = {
      val img = readImage(data)
      if (img != null) (img.getWidth, img.getHeight)
      else {
        // audio has no raster; (0, 0) keeps mixed-media frames flowing
        // through [[sampleFrames]] without a per-mime branch upstream
        require(audioFrames(data).isDefined,
          "payload not decodable by javax.imageio or javax.sound.sampled")
        (0, 0)
      }
    }

    def frameCount(data: Array[Byte]): Int =
      audioFrames(data).getOrElse {
        require(readImage(data) != null, "payload neither audio nor image")
        1 // still image
      }

    def embed(data: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      val img = readImage(data)
      if (img != null) {
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            v(lum * dim / 256) += 1f
            x += 1
          }
          y += 1
        }
      } else {
        // audio (or other binary): histogram the raw PCM byte stream
        data.foreach(b => v((b & 0xff) * dim / 256) += 1f)
      }
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      if (n > 0) v.map(_ / n) else v
    }

    override def sampleRateHz(data: Array[Byte]): Int =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(data))
        try in.getFormat.getSampleRate.toInt finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => 0
      }

    /** Mean DECODED level: raster luminance mean for images (exact
      * integer lum per pixel, Long-accumulated), mean unsigned PCM
      * sample for audio (read through the decoder, so the container
      * header never pollutes the statistic). A payload that is neither a
      * decodable image nor decodable audio returns 0.0 — the same
      * sentinel convention as [[sampleRateHz]] — so one corrupt payload
      * in a 100 TB media-QC sweep is flagged, not a stage failure. */
    def meanLevel(data: Array[Byte]): Double = {
      val img = try readImage(data) catch { case _: java.io.IOException => null }
      if (img != null) {
        var s = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            s += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        if (n > 0) s.toDouble / n else 0.0
      } else {
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(data))
          try {
            val bytes = in.readAllBytes()
            if (bytes.isEmpty) 0.0
            else bytes.foldLeft(0L)((s, b) => s + (b & 0xff)).toDouble /
              bytes.length
          } finally in.close()
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => 0.0
          case _: java.io.IOException => 0.0
        }
      }
    }
  }

  /** Wrap an id+binary DataFrame into the canonical media schema. */
  def asMedia(df: DataFrame, idCol: String, binCol: String, mime: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), lit(mime).as("mime"),
      col(binCol).cast("binary").as("data")).as[MediaRow]
  }

  /** Repartition so each partition holds at most ~`targetBytes` of payload.
    * Uses a cheap size aggregate, never collects rows.
    */
  def repartitionByBytes(ds: Dataset[MediaRow], targetBytes: Long = 128L << 20): Dataset[MediaRow] = {
    val total = ds.toDF().agg(coalesce(sum(length(col("data"))), lit(0L))).head().getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    ds.repartition(parts)
  }

  /** Extract image metadata: per-partition batch decode (codec init once per
    * partition — mapPartitions, not map).
    */
  def imageMetadata(ds: Dataset[MediaRow],
      codec: MediaCodec = StubCodecs): Dataset[ImageMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // real code: open the codec context here, close after the iterator
      // drains — one init per partition, not per row
      it.map { m =>
        val (w, h) = codec.decodeImageDims(m.data)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(m.data).take(8).map("%02x".format(_)).mkString
        ImageMeta(m.id, m.mime, w, h, m.data.length.toLong, sha)
      }
    }
  }

  /** Frame sampling: explode each video into every `stride`-th frame's
    * metadata. Output size is bounded by frames/stride, not input bytes.
    */
  def sampleFrames(ds: Dataset[MediaRow], stride: Int = 2,
      codec: MediaCodec = StubCodecs): Dataset[Frame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.flatMap { m =>
        val n = codec.frameCount(m.data)
        val (w, h) = codec.decodeImageDims(m.data)
        (0 until n by stride).map(i => Frame(m.id, i, w, h, m.data.length.toLong))
      }
    }
  }

  /** Feature extraction: binary -> fixed-dim float vector via the codec's
    * `embed` (stub = deterministic byte-histogram projection; real impl =
    * model inference per partition-batch).
    */
  def embedMedia(ds: Dataset[MediaRow], dim: Int = 64,
      codec: MediaCodec = StubCodecs): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map(m => (m.id, codec.embed(m.data, dim)))
    }.toDF("id", "embedding")
  }

  /** 64-bit DIFFERENCE HASH (dHash) of a decoded raster — the standard
    * perceptual image fingerprint: average-pool the luminance to a 9×8
    * grid, bit (r, c) = 1 iff cell (r, c+1)'s mean exceeds cell (r, c)'s.
    * Comparing horizontal NEIGHBORS makes the hash invariant to global
    * brightness shifts and robust to mild noise — near-duplicate rasters
    * land within a few Hamming bits — while 64 bits keep the banded
    * candidate join (d3's SimHash machinery) directly reusable.
    *
    * Every cell statistic is an exact Long sum; cell means are compared
    * cross-multiplied (`sumR·nL > sumL·nR`), so the hash is bit-exact
    * deterministic — no floating point, no resampling kernel. Rasters
    * smaller than 9×8 leave empty cells (bit 0); callers should hash
    * thumbnails at least that large.
    */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val (gw, gh) = (9, 8)
    val sums = Array.ofDim[Long](gh, gw)
    val cnts = Array.ofDim[Long](gh, gw)
    var y = 0
    while (y < img.getHeight) {
      val r = math.min(y * gh / img.getHeight, gh - 1)
      var x = 0
      while (x < img.getWidth) {
        val c = math.min(x * gw / img.getWidth, gw - 1)
        val rgb = img.getRGB(x, y)
        sums(r)(c) +=
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        cnts(r)(c) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var r = 0
    while (r < gh) {
      var c = 0
      while (c < gw - 1) {
        if (sums(r)(c + 1) * cnts(r)(c) > sums(r)(c) * cnts(r)(c + 1))
          bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Per-image dHash over the media frame: real decode (pure-JDK
    * `javax.imageio`, the [[JvmCodecs]] seam's reader), per-partition
    * batch iteration like every decode stage here. Output: `(id, dhash)`.
    */
  def imageDHash(ds: Dataset[MediaRow]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.data))
        require(img != null, s"payload ${m.id} is not a decodable image")
        (m.id, dHash64(img))
      }
    }.toDF("id", "dhash")
  }

  /** Perceptual near-duplicate image pairs — the multimodal member of the
    * dedup family (exact/MinHash/SimHash/embedding for text, dHash for
    * rasters): band the 64-bit dHash into 8 bytes and bucket-join on
    * (band, value) — by pigeonhole, ANY pair within Hamming distance
    * `maxHamming` ≤ 7 shares at least one exact byte, so the blocking is
    * lossless at that radius — then verify candidates with the full
    * Hamming distance. Never all-pairs: same [[graft.operators.Dedup
    * .boundedBucketPairs]] hot-bucket guard as the text LSH family (a
    * byte shared by a whole template family is exactly the oversized-
    * bucket shape).
    */
  def dHashNearDup(ds: Dataset[MediaRow], maxHamming: Int = 7,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      repFactor: Int = Dedup.DefaultRepFactor): DataFrame =
    bandedHammingPairs(imageDHash(ds), "dhash", maxHamming, maxBucket,
      repFactor)

  /** 64-bit audio ENERGY-ENVELOPE hash — [[dHash64]]'s neighbor-compare
    * in one dimension: decode the payload through the codec seam
    * (`javax.sound.sampled`, so container headers never pollute the
    * signal), split the PCM stream into 65 equal windows, take each
    * window's mean |deviation from the 8-bit midpoint| (its energy), and
    * set bit w iff window w+1 is louder than window w. Exact integer
    * math via cross-multiplication (like dHash64), so the hash is
    * GAIN-INVARIANT (scaling preserves every energy ordering) and
    * envelope-sensitive — the same split perceptual dedup wants: "same
    * recording, different loudness" collides, "different envelope"
    * doesn't.
    */
  def audioHash64(data: Array[Byte]): Long = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(data))
    val pcm = try in.readAllBytes() finally in.close()
    require(pcm.nonEmpty, "empty audio payload")
    val w = 65
    val sums = new Array[Long](w)
    val cnts = new Array[Long](w)
    var i = 0
    while (i < pcm.length) {
      val k = math.min((i.toLong * w / pcm.length).toInt, w - 1)
      sums(k) += math.abs((pcm(i) & 0xff) - 128)
      cnts(k) += 1
      i += 1
    }
    var bits = 0L
    var k = 0
    while (k < w - 1) {
      if (cnts(k) > 0 && cnts(k + 1) > 0 &&
          sums(k + 1) * cnts(k) > sums(k) * cnts(k + 1))
        bits |= 1L << k
      k += 1
    }
    bits
  }

  /** Per-payload audio hash over the media frame — per-partition batch
    * decode like every stage here. Output: `(id, ahash)`.
    */
  def audioHashDF(ds: Dataset[MediaRow]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(it => it.map(m => (m.id, audioHash64(m.data))))
      .toDF("id", "ahash")
  }

  /** Shared banded-Hamming candidate join for any 64-bit perceptual hash
    * frame `(id, <hashCol>)`: 8 one-byte bands — by pigeonhole ANY pair
    * within Hamming ≤ 7 shares at least one exact byte (lossless
    * blocking at that radius) — bucket-join on (band, value) under the
    * [[Dedup.boundedBucketPairs]] hot-bucket guard, verify with the full
    * Hamming distance. Never all-pairs.
    */
  private[operators] def bandedHammingPairs(sig: DataFrame, hashCol: String,
      maxHamming: Int, maxBucket: Int, repFactor: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"8-byte banding is only lossless up to Hamming 7, got $maxHamming")
    val blocked = sig.select(col("id"), col(hashCol),
      explode(array((0 until 8).map { q =>
        struct(lit(q).as("q"),
          shiftright(col(hashCol), q * 8).bitwiseAND(lit(0xFFL)).as("part"))
      }: _*)).as("blk"))
      .select(col("id"), col(hashCol), col("blk.q"), col("blk.part"))
    Dedup.boundedBucketPairs(blocked, "id", Seq("q", "part"), Seq(hashCol),
        maxBucket, repFactor)
      .select(col("id_a"), col("id_b"),
        Dedup.hamming64(col(s"${hashCol}_a"), col(s"${hashCol}_b"))
          .as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Perceptual near-duplicate AUDIO pairs — the audio member of the
    * dedup family (dHash covers rasters, this covers recordings): the
    * gain-invariant [[audioHash64]] through the same lossless 8-band
    * Hamming blocking as [[dHashNearDup]].
    */
  def audioNearDup(ds: Dataset[MediaRow], maxHamming: Int = 7,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      repFactor: Int = Dedup.DefaultRepFactor): DataFrame =
    bandedHammingPairs(audioHashDF(ds), "ahash", maxHamming, maxBucket,
      repFactor)

  /** Per-payload decoded metadata in one pass — the media-QC projection a
    * 100 TB ingest runs before any training-set decision: dimensions,
    * frame count, duration (frames / native rate, ms), and the mean
    * signal level ("is this black / silent"). Per-partition decode at the
    * codec boundary like every operator above; output is a handful of
    * scalars per payload, so the stage is write-bounded, never
    * decode-output-bounded.
    */
  def mediaStats(ds: Dataset[MediaRow],
      codec: MediaCodec = StubCodecs): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (w, h) = codec.decodeImageDims(m.data)
        val n = codec.frameCount(m.data)
        val rate = codec.sampleRateHz(m.data)
        val durMs = if (rate > 0) n.toLong * 1000L / rate else 0L
        (m.id, m.mime, w.toLong, h.toLong, n.toLong, durMs,
          codec.meanLevel(m.data))
      }
    }.toDF("media_id", "mime", "width", "height", "n_frames",
      "duration_ms", "mean_level")
  }

  /** Deterministic real-format fixtures (pure-JDK encoders) for the
    * [[JvmCodecs]] rows/specs: the REGISTRY needs reproducible binary
    * payloads without committing binary files, so these generate them
    * from closed-form signals — a `(x·7 + y·13) % 256` gray gradient PNG
    * and a `128 + 100·sin(0.1·i)` 8-bit mono 8 kHz PCM WAV. The mm4
    * oracle recomputes the same closed forms as literal truth, so a
    * codec that mis-decodes dimensions, frame counts, or sample values
    * breaks the hash.
    */
  object SyntheticMedia {
    def gradientPng(w: Int, h: Int): Array[Byte] = gradientPng(w, h, 7, 13, 0)

    /** Parameterized gray gradient `(x·a + y·b + offset) % 256`: the (a, b)
      * slope pair sets the raster's STRUCTURE (where the mod-256 wrap
      * fronts fall — what a perceptual hash keys on), `offset` only shifts
      * brightness (what a perceptual hash is near-invariant to). mm6 plants
      * its near-duplicate classes exactly on this split.
      */
    def gradientPng(w: Int, h: Int, a: Int, b: Int, offset: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, ((x * a + y * b + offset) % 256) * 0x010101)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Amplitude-ENVELOPE WAV with a provably class-distinct hash: the
      * carrier is a fixed sine, the per-window amplitude is a SAWTOOTH
      * rotated by `cls` — `amp(w) = 25 + 12·((w + cls) % 8)` over
      * [[audioHash64]]'s 65 windows — and `gainPct` scales the whole
      * signal. The hash's comparison-sign vector of a rotated
      * single-wrap sawtooth encodes the rotation: any two of the 8
      * rotations differ in EXACTLY 2 of every 8 comparisons (16 of 64
      * bits — far beyond the Hamming-7 near radius), while gain scaling
      * preserves every energy ordering exactly (no adjacent window ties:
      * steps are ±12·gain, an order of magnitude above 8-bit rounding) —
      * the closed-form planting mm7 gates on, the audio analog of
      * [[gradientPng]]'s slope/offset split.
      */
    def envelopeWav(nFrames: Int, cls: Int, gainPct: Int): Array[Byte] = {
      require(cls >= 0 && cls < 8, s"8 rotation classes, got $cls")
      require(gainPct > 0 && gainPct <= 100, s"gainPct in (0,100]: $gainPct")
      val w = 65
      val pcm = Array.tabulate(nFrames) { i =>
        val win = math.min((i.toLong * w / nFrames).toInt, w - 1)
        val amp = 25.0 + 12.0 * ((win + cls) % 8)
        // 1.1 rad/sample carrier (~5.7-sample period): even short
        // windows hold several periods, so per-window mean |sin| phase
        // wobble stays far below the >=11% relative envelope steps
        (128 + (gainPct / 100.0 * amp *
          StrictMath.sin(i * 1.1)).round.toInt).toByte
      }
      riffWav8BitMono8kHz(pcm)
    }

    /** Hand-rolled RIFF container for 8-bit mono 8 kHz PCM — the
      * STANDARD 44-byte canonical-WAVE header (RIFF/WAVE/fmt /data),
      * byte-identical in meaning to what `AudioSystem.write` emits but
      * without its per-payload stream machinery: generating millions of
      * fixture payloads through AudioSystem dominates mm7's map cost by
      * an order of magnitude, and the GENERATOR is fixture plumbing —
      * only the DECODE is the codec seam under test (and JvmCodecSpec
      * decodes these bytes through `javax.sound.sampled`, proving the
      * container is the real format, not a private convention).
      */
    def riffWav8BitMono8kHz(pcm: Array[Byte]): Array[Byte] = {
      val n = pcm.length
      val buf = java.nio.ByteBuffer.allocate(44 + n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort) // PCM
        .putShort(1.toShort) // mono
        .putInt(8000) // sample rate
        .putInt(8000) // byte rate (8-bit mono)
        .putShort(1.toShort) // block align
        .putShort(8.toShort) // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(n)
        .put(pcm)
      buf.array()
    }

    def sinePcmWav(nFrames: Int): Array[Byte] = {
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
  }
}
