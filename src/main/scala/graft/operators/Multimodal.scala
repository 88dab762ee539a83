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
}
