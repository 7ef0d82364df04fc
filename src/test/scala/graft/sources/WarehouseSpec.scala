package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val master = Seq(
    ("VUSA", "ETF", "Financial Times", "active", "Vanguard"),
    ("ABC", "FUND", "Financial Times", "inactive", "Alpha"),
    ("XYZ", "ETF", "Yahoo Finance", "active", "Xylo"))
    .toDF("ticker", "asset_type", "source", "status", "name")

  test("activeTickers: S6 predicate shape (status + source [+ asset_type])") {
    val got = Warehouse.activeTickers(master, "Financial Times")
      .select("ticker").as[String].collect().toSeq
    assert(got == Seq("VUSA"))
    assert(Warehouse.activeTickers(master, "Yahoo Finance", Some("ETF")).count() == 1)
    assert(Warehouse.activeTickers(master, "Yahoo Finance", Some("FUND")).count() == 0)
  }

  test("priceWatermarks: S7 per-ticker max(date)") {
    val ph = Seq(
      ("VUSA", "Financial Times", "2024-05-01"),
      ("VUSA", "Financial Times", "2024-05-03"),
      ("ABC", "Yahoo Finance", "2024-05-02"))
      .toDF("ticker", "source", "date")
      .withColumn("date", col("date").cast("date"))
    val wm = Warehouse.priceWatermarks(ph, "Financial Times")
      .select(col("ticker"), col("max_date").cast("string"))
      .as[(String, String)].collect().toSeq
    assert(wm == Seq(("VUSA", "2024-05-03")))
  }

  test("pendingWork: J2/T7 resume anti-join") {
    val work = Seq("A", "B", "C").toDF("ticker")
    val done = Seq("B").toDF("ticker")
    assert(Warehouse.pendingWork(work, done, Seq("ticker"))
      .as[String].collect().toSet == Set("A", "C"))
  }

  test("pushdownSubquery generates a projection + conjunctive-WHERE dbtable operand") {
    val q = Warehouse.pushdownSubquery("stg_price_history",
      Seq("ticker", "MAX(date) AS max_date"),
      Seq(s"source = ${Warehouse.sqlLiteral("Stock Analysis")}", "status = 'active'"))
    assert(q ==
      "(SELECT ticker, MAX(date) AS max_date FROM stg_price_history" +
        " WHERE (source = 'Stock Analysis') AND (status = 'active')) AS pushed")
    // no predicates -> bare projection subquery
    assert(Warehouse.pushdownSubquery("t", Seq("a")) == "(SELECT a FROM t) AS pushed")
    intercept[IllegalArgumentException](Warehouse.pushdownSubquery("t", Nil))
  }

  test("sqlLiteral escapes embedded quotes") {
    assert(Warehouse.sqlLiteral("O'Leary's") == "'O''Leary''s'")
  }
}
