package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private lazy val trades = Seq(
    ("VUSA", "2024-05-03", 100),
    ("VUSA", "2024-05-01", 40),
    ("ABC", "2024-05-02", 7),
    ("NEW", "2024-05-02", 1) // no price history at all
  ).toDF("ticker", "trade_date", "qty")
    .withColumn("trade_date", col("trade_date").cast("date"))

  private lazy val navs = Seq(
    ("VUSA", "2024-04-30", 99.0),
    ("VUSA", "2024-05-02", 101.0),
    ("VUSA", "2024-05-03", 102.0),
    ("ABC", "2024-01-01", 50.0)
  ).toDF("ticker", "nav_date", "nav")
    .withColumn("nav_date", col("nav_date").cast("date"))

  test("asofJoin picks the most recent right row at or before left time") {
    val out = AsOfJoin.asofJoin(trades, navs, Seq("ticker"),
        "trade_date", "nav_date")
      .orderBy("ticker", "trade_date")
      .select(col("ticker"), col("trade_date").cast("string"),
        col("nav"), col("asof_time").cast("string"))
      .as[(String, String, Option[Double], Option[String])].collect().toSeq
    assert(out == Seq(
      ("ABC", "2024-05-02", Some(50.0), Some("2024-01-01")),
      ("NEW", "2024-05-02", None, None),
      ("VUSA", "2024-05-01", Some(99.0), Some("2024-04-30")),
      ("VUSA", "2024-05-03", Some(102.0), Some("2024-05-03")))) // same-day match
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.asofJoin(trades, navs, Seq("ticker"),
        "trade_date", "nav_date", toleranceDays = Some(7))
      .filter(col("ticker") === "ABC")
      .select("nav").as[Option[Double]].head()
    assert(out.isEmpty) // ABC's only nav is 4 months old
  }

  test("left row count is preserved exactly (no fan-out, no loss)") {
    val out = AsOfJoin.asofJoin(trades, navs, Seq("ticker"),
      "trade_date", "nav_date")
    assert(out.count() == trades.count())
  }

  test("colliding right payload names are rejected with guidance") {
    val bad = navs.withColumnRenamed("nav", "qty")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(trades, bad, Seq("ticker"), "trade_date", "nav_date")
    }
    assert(e.getMessage.contains("alias"))
  }
}
