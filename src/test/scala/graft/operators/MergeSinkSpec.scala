package graft.operators

import graft.SparkSpec
import graft.functions.HashFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MergeSinkSpec extends SparkSpec {
  import spark.implicits._

  private def withHash(df: DataFrame): DataFrame =
    df.withColumn("row_hash",
      HashFns.canonicalRowHash(Seq(col("ticker")), Seq(col("price"))))

  private lazy val target = withHash(Seq(
    ("AAA", 10.0), ("BBB", 20.0), ("CCC", 30.0)).toDF("ticker", "price"))

  test("merge: unchanged rows no-op, changed rows update, new rows insert") {
    val updates = withHash(Seq(
      ("AAA", 10.0),   // identical -> no-op
      ("BBB", 21.0),   // changed   -> update
      ("DDD", 40.0)    // new       -> insert
    ).toDF("ticker", "price"))
    val out = MergeSink.merge(target, updates, Seq("ticker"))
      .orderBy("ticker").as[(String, Double, String)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ==
      Seq(("AAA", 10.0), ("BBB", 21.0), ("CCC", 30.0), ("DDD", 40.0)))
  }

  test("merge is idempotent: re-applying the same updates changes nothing") {
    val updates = withHash(Seq(("BBB", 21.0), ("DDD", 40.0)).toDF("ticker", "price"))
    val once  = MergeSink.merge(target, updates, Seq("ticker"))
    val twice = MergeSink.merge(once, updates, Seq("ticker"))
    assert(once.orderBy("ticker").collect().toSeq ==
      twice.orderBy("ticker").collect().toSeq)
  }

  test("merge without hash column updates unconditionally (K4 shape)") {
    val noHash = Seq(("AAA", 10.0), ("BBB", 20.0)).toDF("ticker", "price")
    val updates = Seq(("AAA", 99.0)).toDF("ticker", "price")
    val out = MergeSink.merge(noHash, updates, Seq("ticker"), hashCol = None)
      .orderBy("ticker").as[(String, Double)].collect().toSeq
    assert(out == Seq(("AAA", 99.0), ("BBB", 20.0)))
  }

  test("merge dedups update batch deterministically by updateOrder") {
    val updates = withHash(Seq(
      ("AAA", 1.0), ("AAA", 2.0)).toDF("ticker", "price"))
    val out = MergeSink.merge(target, updates, Seq("ticker"),
        updateOrder = Seq(col("price").desc))
      .filter(col("ticker") === "AAA").as[(String, Double, String)].head()
    assert(out._2 == 2.0) // keep-first by price desc = highest price wins
  }

  test("upsertParquet: create, re-apply (idempotent), update+insert, atomic swap") {
    val dir = java.nio.file.Files.createTempDirectory("merge_sink").toString
    val path = s"$dir/warehouse"
    val b1 = withHash(Seq(("AAA", 10.0), ("BBB", 20.0)).toDF("ticker", "price"))
    MergeSink.upsertParquet(spark, path, b1, Seq("ticker"))
    assert(spark.read.parquet(path).count() == 2)

    MergeSink.upsertParquet(spark, path, b1, Seq("ticker")) // replay
    assert(spark.read.parquet(path).count() == 2)

    val b2 = withHash(Seq(("BBB", 21.0), ("CCC", 30.0)).toDF("ticker", "price"))
    MergeSink.upsertParquet(spark, path, b2, Seq("ticker"))
    val rows = spark.read.parquet(path).orderBy("ticker")
      .as[(String, Double, String)].collect().toSeq.map(r => (r._1, r._2))
    assert(rows == Seq(("AAA", 10.0), ("BBB", 21.0), ("CCC", 30.0)))
  }

  test("applyStatusLifecycle: aging to inactive, new+named to active") {
    val master = Seq(
      ("T1", "2024-01-01", "active", "Fund One"),   // stale -> inactive
      ("T2", "2024-05-01", "new", "Fund Two"),      // fresh new + name -> active
      ("T3", "2024-05-01", "new", ""),              // no name -> stays new
      ("T4", "2024-05-01", "active", "Fund Four")   // fresh -> unchanged
    ).toDF("ticker", "last_seen", "status", "name")
      .withColumn("last_seen", col("last_seen").cast("date"))
    val out = MergeSink.applyStatusLifecycle(master,
        lit("2024-05-02").cast("date"), inactiveDays = 7)
      .orderBy("ticker").select("status").as[String].collect().toSeq
    assert(out == Seq("inactive", "active", "new", "active"))
  }
}
