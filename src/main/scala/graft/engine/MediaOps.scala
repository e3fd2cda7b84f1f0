package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing: media payloads as opaque `binary` columns with typed
  * metadata, and a batched decode/feature-extract stage.
  *
  * The decode itself is a clearly-marked STUB (`StubDecoder`) — no
  * image/audio codecs ship in this container — but the Spark-side shape is
  * real and tested: schema, batch iteration (`mapPartitions`, the Scala
  * analogue of `mapInPandas` batches), partitioning by media_ref so one
  * executor decodes one media group, and the output feature schema the
  * downstream similarity ops consume.
  */
object MediaOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_ref", StringType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("bytes", LongType, nullable = false),
      StructField("source", StringType, nullable = false))), nullable = false)))

  /** Deterministic synthetic media blobs for the catalog: payload bytes are
    * a repeated md5 of the ref — opaque, stable, varied sizes. */
  def syntheticMedia(spark: SparkSession): DataFrame = {
    DocTable.mediaCatalog(spark).select(
      col("media_ref"),
      when(pmod(col("bytes"), lit(3)) === 0, lit("image/png"))
        .when(pmod(col("bytes"), lit(3)) === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("mime"),
      to_binary(repeat(md5(col("media_ref")), 8), lit("hex")).as("payload"),
      struct(col("bytes").as("bytes"), lit("synthetic").as("source")).as("meta"))
  }

  /** One decoded feature row per media item. */
  case class MediaFeature(
      media_ref: String, mime: String,
      width: Int, height: Int, frames: Int,
      feature: Array[Float])

  /** ??? STUB ??? — the real implementation would decode `payload` with an
    * image/audio codec and run a feature extractor. This deterministic fake
    * derives pseudo-features from the payload bytes so the pipeline shape
    * (schema, batching, partition strategy) is fully exercisable in tests.
    */
  object StubDecoder {
    def decode(mime: String, payload: Array[Byte], dim: Int = 8): (Int, Int, Int, Array[Float]) = {
      // deterministic pseudo-decode from payload content only
      val h = java.util.Arrays.hashCode(payload)
      val width = 16 + math.abs(h % 1024)
      val height = 16 + math.abs((h / 7) % 1024)
      val frames = if (mime.startsWith("video")) 1 + math.abs(h % 32) else 1
      val feature = Array.tabulate(dim)(i =>
        ((payload((i * 31) % payload.length) & 0xff) - 128) / 128.0f)
      (width, height, frames, feature)
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
          val (w, h, fr, feat) = StubDecoder.decode(mime, payload, dim)
          MediaFeature(ref, mime, w, h, fr, feat)
        }
      }
  }

  /** Deterministic frame sampling for video refs: every `stride`-th frame
    * index up to `frames` — pure Column logic, no decode needed. */
  def sampleFrameIndexes(frames: org.apache.spark.sql.Column, stride: Int): org.apache.spark.sql.Column =
    filter(sequence(lit(0), frames - 1), i => i % stride === 0)
}
