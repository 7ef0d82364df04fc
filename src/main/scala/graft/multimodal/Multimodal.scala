package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * payloads as opaque `binary` columns plus typed metadata, with the
  * per-record decode/feature step as a partition-mapped batch operator.
  *
  * The decode itself is STUBBED — this container has no image/audio codecs
  * — behind [[DecodeStub]], a deterministic fake that derives pixel
  * dimensions and a grey-mean from the payload bytes. Everything
  * Spark-side is real and tested: the schema, the mapPartitions batch
  * shape (one decoder init per partition, the same contract a Pandas UDF /
  * mapInPandas batch has in PySpark), partition sizing, and the
  * metadata-only fast path that never touches payload bytes.
  *
  * Scale notes:
  *  - payloads ride in parquet binary columns; metadata queries prune the
  *    payload column entirely (columnar projection — verified by
  *    `.explain` ReadSchema in the spec);
  *  - decode is embarrassingly parallel; `repartitionForDecode` sizes
  *    partitions by total payload bytes, not row count, so 4 KB thumbnails
  *    and 40 MB videos produce comparable tasks.
  */
object Multimodal {

  /** media row: payload + typed metadata (the reference stores no media;
    * this is the north-star training-data shape). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image | audio | video
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("byte_len", LongType),
    StructField("source_uri", StringType)))

  final case class MediaMeta(media_id: Long, kind: String, mime: String,
                             byte_len: Long)
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 grey_mean: Double, phash: Long)

  /** Wrap documents/bytes into the media shape (payload = utf-8 bytes when
    * sourcing from a text column — a stand-in generator for tests/bench). */
  def fromText(df: DataFrame, idCol: String, textCol: String,
               kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(kind).as("kind"),
      col(textCol).cast(BinaryType).as("payload"),
      lit("application/octet-stream").as("mime"),
      octet_length(col(textCol)).cast(LongType).as("byte_len"),
      concat(lit("synthetic://"), col(idCol)).as("source_uri"))

  /** Metadata-only projection — MUST NOT read payload bytes (column
    * pruning keeps the binary column out of the scan). */
  def metaOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"), col("mime"), col("byte_len"))

  /** The decode stub: deterministic pseudo-decode from payload bytes.
    * A real deployment swaps [[decodeImage]]'s body for a codec call
    * (e.g. javax.imageio / ffmpeg JNI); the batch contract around it —
    * one init per partition, streamed iterator, no driver collect —
    * is the part the engine owns and tests. */
  object DecodeStub {
    /** Deterministic fake "decode": dimensions/stats derived from bytes. */
    def decodeImage(mediaId: Long, payload: Array[Byte]): ImageFeatures = {
      val len = if (payload == null) 0 else payload.length
      val sum = if (len == 0) 0L else payload.foldLeft(0L)((a, b) => a + (b & 0xff))
      val width  = 64 + (len % 577)            // fake but stable dims
      val height = 64 + ((len * 7) % 431)
      val mean   = if (len == 0) 0.0 else sum.toDouble / len
      // fake perceptual hash: rolling hash of the byte stream
      val ph = if (len == 0) 0L
        else payload.foldLeft(1469598103934665603L)((h, b) =>
          (h ^ (b & 0xff)) * 1099511628211L)
      ImageFeatures(mediaId, width, height, mean, ph)
    }
  }

  /** Partition-mapped decode: the Scala analog of a mapInPandas batch UDF.
    * Decoder state (here: none; really: codec contexts) initializes once
    * per partition, rows stream through without materializing the
    * partition. */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: open codec once here
        rows.map { case (id, bytes) => DecodeStub.decodeImage(id, bytes) }
      }
  }

  /** Byte-weighted repartition: equalizes decode work per task when payload
    * sizes are skewed (videos vs thumbnails). Ranges over cumulative bytes
    * would need a global sort; hashing on a salted bucket of size
    * ceil(bytes / targetBytesPerPartition) is the shuffle-cheap version. */
  def repartitionForDecode(media: DataFrame, targetBytesPerTask: Long = 64L << 20,
                           parallelism: Int = 200): DataFrame = {
    val weighted = media.withColumn("__salt",
      (rand(42) * greatest(lit(1), (col("byte_len") / targetBytesPerTask)
        .cast(IntegerType))).cast(IntegerType))
    weighted.repartition(parallelism, col("__salt"), col("media_id"))
      .drop("__salt")
  }

  /** Frame-sample plan for video rows: one output row per sampled frame
    * index — a generator (posexplode over a sequence) so the downstream
    * decode fans out WITHOUT shuffling payload bytes more than once. */
  def frameSamplePlan(media: DataFrame, fps: Int, everyN: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest(lit(0), (col("byte_len") / (fps * everyN)).cast(IntegerType)))))
      .select(col("media_id"), col("frame_idx"), col("payload"))
}
