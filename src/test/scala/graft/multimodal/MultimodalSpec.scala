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
    val out = Multimodal.repartitionForDecode(media, targetBytesPerTask = 8,
      parallelism = 4)
    assert(out.count() == 3)
    assert(out.columns.toSeq == media.columns.toSeq)
  }

  test("frameSamplePlan fans out video rows without touching others") {
    val withVideo = media.withColumn("kind",
      when(col("media_id") === 2, "video").otherwise(col("kind")))
    val frames = Multimodal.frameSamplePlan(withVideo, fps = 1, everyN = 10)
    assert(frames.select("media_id").distinct().as[Long].collect().toSeq == Seq(2L))
    assert(frames.count() >= 1)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "payload"))
  }
}
