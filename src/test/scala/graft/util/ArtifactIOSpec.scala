package graft.util

import graft.SparkSpec
import org.apache.spark.sql.types._

/** [[ArtifactIO.readLocal]] must return exactly what a Spark-side
  * `read.schema(...).parquet(path).collect()` returns — it replaces one
  * Spark job per artifact read across every load path (frozen LMs,
  * tokenizers, index metas/centroids), so a divergence here would skew
  * every artifact consumer at once. */
class ArtifactIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_artifactio").toString

  test("readLocal == spark.read.collect on a meta-shaped row " +
      "(ints, longs, strings, long array)") {
    val dir = tmp()
    Seq(("tag-1", 3, 8, 64, 12345L, -987654321L, Seq(1L, 7L, 9L)))
      .toDF("model_tag", "scale", "nlist", "dim", "n_vectors", "vec_fp",
        "batch_ids")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val fields = Seq("model_tag" -> StringType, "scale" -> IntegerType,
      "nlist" -> IntegerType, "dim" -> IntegerType,
      "n_vectors" -> LongType, "vec_fp" -> LongType,
      "batch_ids" -> ArrayType(LongType))
    val local = ArtifactIO.readLocal(spark, dir, fields: _*)
    val viaSpark = spark.read.schema(StructType(fields.map { case (n, t) =>
      StructField(n, t) })).parquet(dir).collect().toSeq
    assert(local.length == 1 && viaSpark.length == 1)
    assert(local.head.getString(0) == viaSpark.head.getString(0))
    assert((1 to 3).forall(i => local.head.getInt(i) == viaSpark.head.getInt(i)))
    assert((4 to 5).forall(i => local.head.getLong(i) == viaSpark.head.getLong(i)))
    assert(local.head.getSeq[Long](6) == viaSpark.head.getSeq[Long](6))
  }

  test("readLocal: empty array and null-bearing columns round-trip") {
    val dir = tmp()
    Seq((1L, Seq.empty[Long], Option.empty[String], Option(2.5)),
        (2L, Seq(4L), Option("x"), Option.empty[Double]))
      .toDF("id", "xs", "s", "d")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val rows = ArtifactIO.readLocal(spark, dir, "id" -> LongType,
        "xs" -> ArrayType(LongType), "s" -> StringType, "d" -> DoubleType)
      .sortBy(_.getLong(0))
    assert(rows.length == 2)
    assert(rows(0).getSeq[Long](1) == Seq.empty[Long],
      "empty array must read as empty, not null")
    assert(rows(0).isNullAt(2) && !rows(1).isNullAt(2))
    assert(rows(1).getString(2) == "x")
    assert(rows(0).getDouble(3) == 2.5 && rows(1).isNullAt(3))
  }

  test("readLocal: multi-file and partitioned layouts read every row " +
      "(recursive part-file listing, the bm25_meta_parts shape)") {
    val dir = tmp()
    (1 to 40).map(i => (i.toLong, i % 3)).toDF("v", "batch_id")
      .repartition(4)
      .write.mode("overwrite").partitionBy("batch_id").parquet(dir)
    val rows = ArtifactIO.readLocal(spark, dir, "v" -> LongType)
    assert(rows.map(_.getLong(0)).sorted == (1L to 40L))
  }

  test("readLocal: missing column and physically different type fail " +
      "LOUDLY with the file and field named") {
    val dir = tmp()
    Seq((1, "a")).toDF("n", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val e1 = intercept[IllegalArgumentException] {
      ArtifactIO.readLocal(spark, dir, "missing" -> LongType)
    }
    assert(e1.getMessage.contains("missing"))
    val e2 = intercept[IllegalStateException] {
      ArtifactIO.readLocal(spark, dir, "n" -> LongType) // written int32
    }
    assert(e2.getMessage.contains("'n'"))
  }

  test("localColumns reads the footer's field names (layout detection)") {
    val dir = tmp()
    Seq((7L, 2, "u")).toDF("n_total", "lm_order", "unit").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    assert(ArtifactIO.localColumns(spark, dir).toSet ==
      Set("n_total", "lm_order", "unit"))
  }

  test("footerRowCount == count() on multi-file tables and single files") {
    val dir = tmp()
    (1 to 1234).toDF("v").repartition(5)
      .write.mode("overwrite").parquet(dir)
    assert(ArtifactIO.footerRowCount(spark, dir) == 1234L)
    val one = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(p => p.getFileName.toString.startsWith("part-")
        && p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get().toString
    assert(ArtifactIO.footerRowCount(spark, one) ==
      spark.read.parquet(one).count(),
      "a bare parquet FILE (the testdata layout) must count too")
  }
}
