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
  *  - decode is embarrassingly parallel; `repartitionForDecode` spreads
  *    rows uniformly by id (a per-row decode can't be subdivided, so
  *    byte-weighting a row-level partitioner is a no-op — see its doc;
  *    byte-proportional spreading happens where rows multiply, in
  *    `frameSamplePlan`).
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
    /** Deterministic fake frame "decode": [[decodeImage]] plus a
      * frame-index-dependent perturbation, so sampled frames of one video
      * are distinct but reproducible. */
    def decodeFrame(mediaId: Long, frameIdx: Long, payload: Array[Byte]): ImageFeatures = {
      val base = decodeImage(mediaId, payload)
      base.copy(phash = java.lang.Long.rotateLeft(
        base.phash ^ (frameIdx * 0x9e3779b97f4a7c15L), (frameIdx % 63).toInt))
    }

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

  /** Real decode for the codecs the JDK ships (PNG, BMP, GIF, JPEG via
    * javax.imageio). Payloads no reader claims (raw video, exotic codecs,
    * synthetic text bytes) fall through to [[DecodeStub]], so the operator
    * is total over arbitrary binary columns either way.
    *  - grey_mean: Rec.601 luma averaged over a <=64x64 sample grid (cost
    *    bounded per row regardless of image size, deterministic);
    *  - phash: 64-bit average-hash — 8x8 block-mean luma grid, bit i set
    *    when cell i >= the grid mean. */
  object ImageDecoder {
    def decode(mediaId: Long, payload: Array[Byte]): ImageFeatures = {
      val img =
        if (payload == null || payload.length == 0) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case _: Exception => null }
      if (img == null) DecodeStub.decodeImage(mediaId, payload)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sx = math.max(1, w / 64)
        val sy = math.max(1, h / 64)
        var sum = 0.0
        var n = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sum += luma(img.getRGB(x, y)); n += 1; x += sx
          }
          y += sy
        }
        val mean = if (n == 0) 0.0 else sum / n
        // 8x8 block-mean grid for the average-hash
        val cell = new Array[Double](64)
        var i = 0
        while (i < 64) {
          val cx0 = (i % 8) * w / 8; val cx1 = math.max(cx0 + 1, (i % 8 + 1) * w / 8)
          val cy0 = (i / 8) * h / 8; val cy1 = math.max(cy0 + 1, (i / 8 + 1) * h / 8)
          val csx = math.max(1, (cx1 - cx0) / 8); val csy = math.max(1, (cy1 - cy0) / 8)
          var cs = 0.0; var cn = 0; var cy = cy0
          while (cy < cy1 && cy < h) {
            var cx = cx0
            while (cx < cx1 && cx < w) { cs += luma(img.getRGB(cx, cy)); cn += 1; cx += csx }
            cy += csy
          }
          cell(i) = if (cn == 0) 0.0 else cs / cn
          i += 1
        }
        val gridMean = cell.sum / 64
        var ph = 0L
        i = 0
        while (i < 64) { if (cell(i) >= gridMean) ph |= (1L << i); i += 1 }
        ImageFeatures(mediaId, w, h, mean, ph)
      }
    }

    @inline private def luma(rgb: Int): Double = {
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      0.299 * r + 0.587 * g + 0.114 * b
    }
  }

  /** Partition-mapped decode: the Scala analog of a mapInPandas batch UDF.
    * Decoder state (codec contexts) initializes once per partition, rows
    * stream through without materializing the partition. Dispatch is
    * per-row: JDK-readable codecs decode for real ([[ImageDecoder]]),
    * everything else degrades to the deterministic [[DecodeStub]]. */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one decoder/codec init per partition lives here; ImageIO caching
        // is static so the JVM-wide reader registry is reused across tasks
        javax.imageio.ImageIO.setUseCache(false) // no temp-file spill per row
        rows.map { case (id, bytes) => ImageDecoder.decode(id, bytes) }
      }
  }

  /** Image near-duplicates by perceptual hash: decode -> 64-bit
    * average-hash -> pigeonhole-blocked Hamming self-join (the SAME
    * blocking operator the text SimHash dedup uses — sketch families
    * compose). Returns (id_a, id_b, hamming) for pairs within
    * `maxHamming`. At 100 TB: decode cost dominates; run it once, persist
    * (media_id, phash) — 16 bytes/image — and re-block cheaply.
    * maxHamming + 1 must divide 64 (pigeonhole chunking): 1, 3, 7, 15. */
  def imageNearDups(spark: SparkSession, media: DataFrame,
                    maxHamming: Int = 7): DataFrame = {
    // empty/null payloads all stub-decode to phash 0 — left in, N dead
    // rows (failed fetches, truncated uploads) would emit N*(N-1)/2
    // hamming-0 "pairs" and quadratically blow up one block (the same
    // blank-input class simhashPortable excludes via its sentinel)
    val decodable = media.filter(
      col("payload").isNotNull && octet_length(col("payload")) > 0)
    val phashes = decodeImages(spark, decodable)
      .select(col("media_id"), col("phash").as("simhash"))
    graft.operators.Dedup.simhashNearDupsFrom(phashes, "media_id",
      bits = 64, maxHamming = maxHamming)
  }

  /** Decode repartition: spreads rows uniformly over `parallelism` tasks,
    * keyed by media_id (deterministic under task retry — no rand()).
    *
    * Honest scale note: a per-ROW decode cannot be subdivided, so no
    * partitioning scheme can equalize task cost when single payloads are
    * huge — hashing on media_id is already uniform in expectation, and a
    * "byte-weighted salt" added to the same hash key changes nothing
    * observable. That applies to [[decodeFrames]] too: a video's frames
    * decode inside the task holding its single payload copy (shipping
    * payload bytes per frame row to "spread" one video would cost more in
    * shuffle than it buys in balance), so byte_len skew is bounded by
    * one video per task, not fixable below it. */
  def repartitionForDecode(media: DataFrame,
                           parallelism: Int = 200): DataFrame =
    media.repartition(parallelism, col("media_id"))

  /** Frame-sample plan for video rows: one output row per sampled frame
    * index, PAYLOAD-FREE — (media_id, frame_idx) derives entirely from
    * metadata (byte_len), so column pruning keeps the binary payload out
    * of the scan and no shuffle ever carries it per frame row. (The prior
    * shape selected payload alongside each exploded index: a 1 GB video
    * sampled at 1,000 frames would have materialized 1,000 payload copies
    * into the next exchange.) Frame features come from [[decodeFrames]],
    * which binds the single payload copy per media row in-partition. */
  def frameSamplePlan(media: DataFrame, fps: Int, everyN: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        // INTEGRAL division (`div`), LongType indices — the exact
        // arithmetic decodeFrames runs on the JVM side. Double division
        // would diverge for byte_len near 2^53 and an Int cast overflows
        // past 2^31 frames; `div` + bigint shares exact semantics at any
        // magnitude.
        explode(sequence(lit(0L),
          greatest(lit(0L), expr(s"byte_len div ${fps.toLong * everyN}L")))))
      .select(col("media_id"), col("frame_idx"))

  /** frame row: the per-frame sibling of [[ImageFeatures]]. */
  final case class FrameFeatures(media_id: Long, frame_idx: Long, width: Int,
                                 height: Int, grey_mean: Double, phash: Long)

  /** Partition-mapped frame decode: each video row's payload is read ONCE
    * into the task, and its sampled frames decode in place from that
    * single copy (same index arithmetic as [[frameSamplePlan]], so counts
    * line up row-for-row). The fan-out happens AFTER the bytes land in the
    * task — frames multiply, payload bytes don't. Use
    * [[repartitionForDecode]] upstream to spread videos across tasks;
    * the per-frame output is small (fixed-width features) and safe to
    * shuffle. */
  def decodeFrames(spark: SparkSession, media: DataFrame,
                   fps: Int, everyN: Int): Dataset[FrameFeatures] = {
    import spark.implicits._
    val step = fps.toLong * everyN
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"), col("byte_len"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, payload, byteLen) =>
          val last = math.max(0L, byteLen / step)
          (0L to last).iterator.map { f =>
            val feat = DecodeStub.decodeFrame(id, f, payload)
            FrameFeatures(id, f, feat.width, feat.height, feat.grey_mean, feat.phash)
          }
        }
      }
  }
}
