package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing: media payloads as opaque `binary` columns with typed
  * metadata, and a batched decode/feature-extract stage
  * (`mapPartitions` — the Scala analogue of a Pandas-UDF `mapInPandas`
  * stage: batched rows in, batched feature rows out).
  *
  * Decode is REAL where the JDK has a codec: PNG payloads are actual PNG
  * files (encoded and decoded with `javax.imageio`), WAV payloads are actual
  * RIFF/WAVE PCM files (header written and parsed per the RIFF spec). Video
  * has no codec in this container, so payloads use a synthetic "GFTV"
  * container whose header carries width/height/frames — parsing it is the
  * honest analogue of reading mp4 metadata boxes (real pipelines get video
  * dimensions from container metadata without decoding frames), but the
  * format itself is a STUB stand-in for mp4.
  *
  * Construction parameters (dimensions, sample counts) are pure functions of
  * the catalog index, so the decode stage is independently oracle-checkable:
  * DuckDB recomputes the expected metadata from the same formulas while
  * Spark actually decodes the bytes.
  */
object MediaOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_ref", StringType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("bytes", LongType, nullable = false),
      StructField("source", StringType, nullable = false))), nullable = false)))

  // --- deterministic payload construction (catalog index i = 0..199) ---

  private[engine] def pngDims(i: Int): (Int, Int) = (8 + i % 24, 8 + (i * 7) % 24)
  private[engine] def wavFrames(i: Int): Int = 32 + i % 64
  private[engine] def videoDims(i: Int): (Int, Int, Int) =
    (16 + (i * 3) % 48, 16 + (i * 5) % 48, 1 + i % 30)

  private[engine] def pngPayload(i: Int): Array[Byte] = {
    val (w, h) = pngDims(i)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (x * 31 + y * 17 + i * 7919) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Minimal valid RIFF/WAVE: PCM16 mono @8kHz, `wavFrames(i)` samples. */
  private[engine] def wavPayload(i: Int): Array[Byte] = {
    val n = wavFrames(i)
    val dataBytes = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)            // PCM, mono
      .putInt(8000).putInt(8000 * 2)      // sample rate, byte rate
      .putShort(2).putShort(16)           // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var j = 0
    while (j < n) { buf.putShort(((i * 31 + j * 7) % 32768).toShort); j += 1 }
    buf.array()
  }

  /** Synthetic video container: "GFTV" magic + width/height/frames (BE
    * int32) + opaque content bytes. STUB stand-in for mp4 (no codec here). */
  private[engine] def videoPayload(ref: String, i: Int): Array[Byte] = {
    val (w, h, f) = videoDims(i)
    val content = java.security.MessageDigest.getInstance("MD5")
      .digest(ref.getBytes("UTF-8"))
    val buf = java.nio.ByteBuffer.allocate(16 + content.length)
    buf.put("GFTV".getBytes("US-ASCII")).putInt(w).putInt(h).putInt(f)
      .put(content)
    buf.array()
  }

  /** Deterministic synthetic media table over the catalog (m-0..m-199):
    * real PNG / real WAV / synthetic-container video payloads. */
  def syntheticMedia(spark: SparkSession): DataFrame = {
    import spark.implicits._
    DocTable.mediaCatalog(spark)
      .select(col("media_ref"), col("bytes"))
      .as[(String, Long)]
      .map { case (ref, bytes) =>
        val i = ((bytes - 64) / 1024).toInt
        val mime = (bytes % 3) match {
          case 0 => "image/png"
          case 1 => "audio/wav"
          case _ => "video/mp4"
        }
        val payload = mime match {
          case "image/png" => pngPayload(i)
          case "audio/wav" => wavPayload(i)
          case _           => videoPayload(ref, i)
        }
        (ref, mime, payload, bytes, "synthetic")
      }
      .toDF("media_ref", "mime", "payload", "_bytes", "_source")
      .withColumn("meta", struct(col("_bytes").as("bytes"), col("_source").as("source")))
      .drop("_bytes", "_source")
  }

  /** One decoded feature row per media item. For audio, width/height are 0
    * and `frames` is the PCM sample count; for images `frames` is 1. */
  case class MediaFeature(
      media_ref: String, mime: String,
      width: Int, height: Int, frames: Int,
      feature: Array[Float])

  /** Decode media metadata + a deterministic feature vector.
    * PNG and WAV decodes are real (javax.imageio / RIFF header parse);
    * video parses the synthetic GFTV container header (STUB for mp4). */
  object Decoder {
    def decode(mime: String, payload: Array[Byte], dim: Int = 8): (Int, Int, Int, Array[Float]) = {
      // The pseudo-feature samples DECODED content — image pixels, PCM
      // samples, container content bytes — not the compressed payload (a
      // real pipeline would run an embedding model on the decoded media).
      // Strictly positive components so the vector never has zero norm, and
      // a pure function of decoded content so the DuckDB oracle can
      // reconstruct it from the construction formulas: a feature mismatch
      // means the DECODE is wrong, not just the header parse.
      mime match {
        case m if m.startsWith("image/") =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          require(img != null, "undecodable image payload")
          val (w, h) = (img.getWidth, img.getHeight)
          val feature = Array.tabulate(dim) { f =>
            val c = img.getRGB(f % w, (f * 3) % h) & 0xff // decoded blue channel
            (c + 1 + f) / 300.0f
          }
          (w, h, 1, feature)
        case m if m.startsWith("audio/") =>
          val buf = java.nio.ByteBuffer.wrap(payload)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          require(payload.length >= 44 &&
            new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
            new String(payload, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE payload")
          val blockAlign = buf.getShort(32).toInt
          val dataBytes = buf.getInt(40)
          val frames = dataBytes / blockAlign
          val feature = Array.tabulate(dim) { f =>
            val c = payload(44 + blockAlign * ((f * 5) % frames)) & 0xff // PCM low byte
            (c + 1 + f) / 300.0f
          }
          (0, 0, frames, feature)
        case _ =>
          require(payload.length >= 17 &&
            new String(payload, 0, 4, "US-ASCII") == "GFTV", "not a GFTV payload")
          val buf = java.nio.ByteBuffer.wrap(payload)
          val content = payload.length - 16
          val feature = Array.tabulate(dim) { f =>
            val c = payload(16 + (f * 3) % content) & 0xff // container content byte
            (c + 1 + f) / 300.0f
          }
          (buf.getInt(4), buf.getInt(8), buf.getInt(12), feature)
      }
    }
  }

  /** Batched decode/feature-extract over the media table. Repartitions by
    * media_ref so decode work spreads evenly; processes rows per-partition
    * in batch (the Scala analogue of a Pandas-UDF `mapInPandas` stage). */
  def extractFeatures(media: DataFrame, dim: Int = 8): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .repartition(col("media_ref"))
      .select("media_ref", "mime", "payload")
      .as[(String, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (ref, mime, payload) =>
          val (w, h, fr, feat) = Decoder.decode(mime, payload, dim)
          MediaFeature(ref, mime, w, h, fr, feat)
        }
      }
  }

  /** Deterministic frame sampling for video refs: every `stride`-th frame
    * index up to `frames` — pure Column logic, no decode needed. */
  def sampleFrameIndexes(frames: org.apache.spark.sql.Column, stride: Int): org.apache.spark.sql.Column =
    filter(sequence(lit(0), frames - 1), i => i % stride === 0)

  /** One resized image row. */
  case class ResizedMedia(media_ref: String, mime: String,
      width: Int, height: Int, payload: Array[Byte])

  /** Real image resize (JDK-only: Graphics2D bilinear draw + PNG re-encode)
    * for image rows, batched per partition like [[extractFeatures]] — the
    * thumbnailing stage of a multimodal training pipeline. Non-image rows
    * are passed through untouched with their original dimensions. */
  def resizeImages(media: DataFrame, maxDim: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .repartition(col("media_ref"))
      .select("media_ref", "mime", "payload")
      .as[(String, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (ref, mime, payload) =>
          if (!mime.startsWith("image/")) {
            val (w, h, _, _) = Decoder.decode(mime, payload)
            ResizedMedia(ref, mime, w, h, payload)
          } else {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            require(img != null, "undecodable image payload")
            val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
            val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
              math.max(1, (img.getHeight * scale).toInt))
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ResizedMedia(ref, mime, w, h, bos.toByteArray)
          }
        }
      }
  }
}
