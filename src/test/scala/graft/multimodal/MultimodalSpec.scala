package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Seq((1L, "hello world"), (2L, "a much longer synthetic payload body"),
      (3L, "x")).toDF("id", "body"),
    "id", "body")

  test("fromText produces the media schema with binary payload + byte_len") {
    assert(media.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    assert(media.schema("payload").dataType.typeName == "binary")
    val r = media.filter(col("media_id") === 1)
      .select("byte_len").as[Long].head()
    assert(r == 11L)
  }

  test("decodeImages: partition-mapped, deterministic, one row per media row") {
    val feats = Multimodal.decodeImages(spark, media)
    val rows = feats.collect().sortBy(_.media_id)
    assert(rows.length == 3)
    val again = Multimodal.decodeImages(spark, media).collect().sortBy(_.media_id)
    assert(rows.toSeq == again.toSeq) // deterministic stub
    assert(rows.forall(f => f.width >= 64 && f.height >= 64))
    // distinct payloads -> distinct fake phashes
    assert(rows.map(_.phash).distinct.length == 3)
  }

  test("decodeImages decodes a real PNG's dimensions via javax.imageio") {
    // render a 120x80 gradient, encode as PNG bytes
    val img = new java.awt.image.BufferedImage(120, 80,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 80; x <- 0 until 120)
      img.setRGB(x, y, ((x * 2) << 16) | ((y * 3) << 8) | 64)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val mediaDf = Seq((7L, "image", png, "image/png", png.length.toLong,
      "test://png")).toDF("media_id", "kind", "payload", "mime", "byte_len", "source_uri")
    val f = Multimodal.decodeImages(spark, mediaDf).collect().head
    assert(f.width == 120 && f.height == 80) // REAL decode, not the stub
    assert(f.grey_mean > 0 && f.grey_mean < 255)
    // deterministic: same bytes -> same features (incl. average-hash)
    val again = Multimodal.decodeImages(spark, mediaDf).collect().head
    assert(f == again)
    // a BMP of the same image decodes to the same dimensions
    val bmpBos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bmpBos)
    val bmp = bmpBos.toByteArray
    val bmpDf = Seq((8L, "image", bmp, "image/bmp", bmp.length.toLong,
      "test://bmp")).toDF("media_id", "kind", "payload", "mime", "byte_len", "source_uri")
    val fb = Multimodal.decodeImages(spark, bmpDf).collect().head
    assert(fb.width == 120 && fb.height == 80)
  }

  test("imageNearDups pairs a PNG with its lightly-perturbed copy, not with noise") {
    def png(seed: Int, perturb: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rnd = new scala.util.Random(seed)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = if (seed == 99) rnd.nextInt(256) // pure noise image
          else ((x * 4 + y * 2) % 256 + (if (perturb && x == 0) 8 else 0)) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, png(1, perturb = false)), // gradient
      (2L, png(2, perturb = true)),  // same gradient, one column nudged
      (3L, png(99, perturb = false)) // random noise
    ).map { case (id, p) => (id, "image", p, "image/png", p.length.toLong, s"t://$id") }
    val mediaDf = rows.toDF("media_id", "kind", "payload", "mime", "byte_len", "source_uri")
    val got = Multimodal.imageNearDups(spark, mediaDf, maxHamming = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"near-identical images not paired: $got")
    assert(!got.exists { case (a, b) => a == 3L || b == 3L },
      s"noise image wrongly paired: $got")
  }

  test("non-image payloads fall back to the deterministic stub") {
    val f = Multimodal.decodeImages(spark, media).collect().sortBy(_.media_id).head
    val expected = Multimodal.DecodeStub.decodeImage(1L,
      "hello world".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(f == expected)
  }

  test("metadata-only query prunes the payload column from the parquet scan") {
    val dir = Files.createTempDirectory("media").toString
    media.write.mode("overwrite").parquet(s"$dir/media")
    val meta = Multimodal.metaOnly(spark.read.parquet(s"$dir/media"))
    val plan = meta.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("payload"),
      s"payload column not pruned:\n$plan")
    assert(meta.count() == 3)
  }

  test("repartitionForDecode spreads rows and preserves them all") {
    val out = Multimodal.repartitionForDecode(media, parallelism = 4)
    assert(out.count() == 3)
    assert(out.columns.toSeq == media.columns.toSeq)
  }

  test("frameSamplePlan fans out video rows payload-free (no bytes per frame row)") {
    val dir = Files.createTempDirectory("framemedia").toString
    media.withColumn("kind",
        when(col("media_id") === 2, "video").otherwise(col("kind")))
      .write.mode("overwrite").parquet(s"$dir/media")
    val withVideo = spark.read.parquet(s"$dir/media")
    val frames = Multimodal.frameSamplePlan(withVideo, fps = 1, everyN = 10)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx"))
    // the exploded frame relation must never carry the binary payload:
    // the parquet scan prunes it (metadata-only plan)
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), s"payload not pruned from frame plan:\n$plan")
    assert(frames.select("media_id").distinct().as[Long].collect().toSeq == Seq(2L))
    assert(frames.count() >= 1)
  }

  test("decodeFrames decodes every sampled frame from one in-partition payload copy") {
    val withVideo = media.withColumn("kind",
      when(col("media_id") === 2, "video").otherwise(col("kind")))
    val planned = Multimodal.frameSamplePlan(withVideo, fps = 1, everyN = 10)
      .as[(Long, Long)].collect().toSet
    val decoded = Multimodal.decodeFrames(spark, withVideo, fps = 1, everyN = 10)
      .collect()
    // same index arithmetic as the plan: counts line up row-for-row
    assert(decoded.map(f => (f.media_id, f.frame_idx)).toSet == planned)
    assert(decoded.length == planned.size)
    // frame features are deterministic and frame-dependent
    val again = Multimodal.decodeFrames(spark, withVideo, fps = 1, everyN = 10)
      .collect()
    assert(decoded.sortBy(_.frame_idx).toSeq == again.sortBy(_.frame_idx).toSeq)
    assert(decoded.map(_.phash).distinct.length == decoded.length,
      "frame perturbation must distinguish frames of one video")
  }
}
