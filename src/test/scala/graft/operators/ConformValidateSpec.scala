package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ConformValidateSpec extends SparkSpec {
  import spark.implicits._

  test("normHeaders: lowercase, trim, spaces/dashes to underscores") {
    val df = Seq((1, 2, 3)).toDF(" Ticker ", "Fund Name", "ex-date")
    assert(Conform.normHeaders(df).columns.toSeq ==
      Seq("ticker", "fund_name", "ex_date"))
  }

  test("rename ignores missing source columns") {
    val df = Seq(("V", "x")).toDF("symbol", "other")
    val out = Conform.rename(df, Map("symbol" -> "ticker", "absent" -> "y"))
    assert(out.columns.toSeq == Seq("ticker", "other"))
  }

  test("conform adds typed nulls, casts, selects in declared order") {
    val df = Seq(("V", "12.5")).toDF("ticker", "nav_price")
    val out = Conform.conform(df, Seq(
      "ticker" -> StringType, "nav_price" -> DoubleType,
      "currency" -> StringType))
    assert(out.columns.toSeq == Seq("ticker", "nav_price", "currency"))
    assert(out.schema("nav_price").dataType == DoubleType)
    val r = out.collect().head
    assert(r.getDouble(1) == 12.5 && r.isNullAt(2))
  }

  test("SourceSpec: one declarative cleaner = headers + rename + consts + conform") {
    val spec = Conform.SourceSpec(
      renameMap = Map("full_ticker" -> "ticker"),
      expected = Seq("ticker" -> StringType, "name" -> StringType,
        "source" -> StringType),
      constants = Map("source" -> "Financial Times"))
    val raw = Seq(("VUSA:LSE:GBP", "Vanguard S&P")).toDF("Full_Ticker", "Name")
    val out = spec(raw)
    assert(out.columns.toSeq == Seq("ticker", "name", "source"))
    assert(out.collect().head.getString(2) == "Financial Times")
  }

  test("Validate: every failing rule reported in declared order; split partitions") {
    val df = Seq(
      ("V", "FUND"),    // clean
      ("", "FUND"),     // blank ticker
      ("", "CRYPTO")    // both
    ).toDF("ticker", "asset_type")
    val rules = Seq(
      Validate.Rule("blank_ticker", length(trim(col("ticker"))) > 0),
      Validate.Rule("bad_asset_type", col("asset_type").isin("FUND", "ETF")))
    val (valid, rejects) = Validate.split(df, rules)
    assert(valid.count() == 1)
    val issues = rejects.orderBy("asset_type")
      .select("validation_issues").as[String].collect().toSeq
    assert(issues == Seq("blank_ticker;bad_asset_type", "blank_ticker"))
  }

  test("Validate: null predicate counts as failure (coalesce false)") {
    val df = Seq[(String, Option[Double])](("a", None)).toDF("k", "v")
    val tagged = Validate.withIssues(df, Seq(Validate.Rule("v_pos", col("v") > 0)))
    assert(tagged.select("validation_issues").as[String].head() == "v_pos")
  }
}
