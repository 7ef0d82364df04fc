package graft.sources

import graft.SparkSpec
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonlLakeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("readSplit: clean lines parse against the pinned schema, corrupt lines are quarantined with raw text") {
    val dir = Files.createTempDirectory("jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "extra": "dropped by contract"}""",
      """not json at all""",
      """{"doc_id": 3, "text": "unterminated""",
      """{"doc_id": 4, "text": null, "lang": "de"}"""
    )
    Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

    val (good, quarantine) = JsonlLake.readSplit(spark, dir.toString, schema)
    val g = good.orderBy("doc_id")
      .select("doc_id", "text", "lang")
      .as[(Long, Option[String], String)].collect().toSeq
    assert(g == Seq(
      (1L, Some("hello world"), "en"),
      (2L, Some("bonjour"), "fr"),     // drifted extra field ignored
      (4L, None, "de")))               // explicit null is data, not corrupt
    val q = quarantine.select("raw_line").as[String].collect().toSeq.sorted
    assert(q == Seq("not json at all", """{"doc_id": 3, "text": "unterminated"""))
    // quarantine keeps lineage for the repair pass
    assert(quarantine.select("origin_file").as[String].collect()
      .forall(_.contains("part-0.jsonl")))
  }

  test("write/read round-trip with partition pruning on the partition column") {
    val dir = Files.createTempDirectory("jsonl_rt").resolve("docs").toString
    val df = Seq(
      (1L, "alpha", "en"), (2L, "beta", "en"), (3L, "gamma", "fr")
    ).toDF("doc_id", "text", "lang")
    JsonlLake.write(df, dir, partitionByCols = Seq("lang"))

    val rtSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val back = JsonlLake.read(spark, dir, rtSchema)
    assert(back.filter(col(JsonlLake.CorruptCol).isNotNull).count() == 0)
    // the partition column comes back from the directory layout, and a
    // lang filter prunes to that directory's files only
    val fr = back.filter(col("lang") === "fr")
    assert(fr.select("doc_id").as[Long].collect().toSeq == Seq(3L))
    assert(fr.select("origin_file").as[String].collect()
      .forall(_.contains("lang=fr")))
    assert(back.count() == 3)
  }
}
