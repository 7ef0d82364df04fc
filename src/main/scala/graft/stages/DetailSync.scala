package graft.stages

import graft.functions.{CleanFns, HashFns}
import graft.operators.{Conform, MergeSink}
import graft.schema.Schemas
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Static-detail sync stage (SURVEY.md §2.3 P6, §2.9 C4-C8): per-source
  * wide screener frames split into the four detail tables (info / fees /
  * risk / policy), display strings parsed into typed metrics, C13-style
  * hash, hash-guarded merge per table.
  *
  * Reference chain: 00_static_data_cleaner.py (percent/magnitude/rescale
  * coercions, expected-column lists :138-276) -> 01_detail_validator.py
  * (F1 null-key drop) -> 02_static_hasher.py (md5 all-cols) ->
  * 03_detail_loader upserts; the SA wide split is
  * 01_sa_detail_scraper.py:241-287.
  */
object DetailSync {

  /** Display-string coercions for fee-like metrics: '0.45%' -> 0.45,
    * '842.33m USD' -> 8.4233e8, '1,234' -> 1234 (C4/C5/C6). */
  def parseDisplay(df: DataFrame, percentCols: Seq[String],
                   magnitudeCols: Seq[String], numberCols: Seq[String]): DataFrame = {
    val p = percentCols.foldLeft(df)((d, c) =>
      if (d.columns.contains(c))
        d.withColumn(c, CleanFns.parsePercent(col(c))) else d)
    val m = magnitudeCols.foldLeft(p)((d, c) =>
      if (d.columns.contains(c))
        d.withColumn(c, CleanFns.parseMagnitude(col(c))) else d)
    numberCols.foldLeft(m)((d, c) =>
      if (d.columns.contains(c))
        d.withColumn(c, CleanFns.parseNumber(col(c))) else d)
  }

  /** Normalize a raw static-detail frame: headers, key normalize, null
    * markers, renames (div_yield -> dividend_yield etc). */
  def normalize(raw: DataFrame, source: String): DataFrame = {
    val base = Conform.rename(Conform.normHeaders(raw), Map(
      "div_yield" -> "dividend_yield", "symbol" -> "ticker",
      "expense" -> "expense_ratio", "aum" -> "assets_aum"))
    val withKeys = base
      .withColumn("ticker", CleanFns.normKey(col("ticker")))
      .withColumn("source", if (base.columns.contains("source"))
        coalesce(col("source"), lit(source)) else lit(source))
    val at = if (withKeys.columns.contains("asset_type"))
      CleanFns.normKey(col("asset_type")) else lit("FUND")
    val df = withKeys.withColumn("asset_type", at)
    df.columns.filter(c => df.schema(c).dataType == StringType &&
        !Seq("ticker", "asset_type", "source").contains(c))
      .foldLeft(df)((d, c) => d.withColumn(c, CleanFns.nullifyMarkers(col(c))))
  }

  /** P6 vertical split: project the wide frame onto one target schema,
    * conforming missing columns to typed nulls. */
  def slice(wide: DataFrame, target: StructType): DataFrame =
    Conform.conform(wide, target.fields.toSeq
      .filterNot(f => Seq("row_hash", "updated_at").contains(f.name))
      .map(f => f.name -> f.dataType))

  /** C7/C8 metric hygiene for risk/policy slices: overflow rescale then
    * range-bound nullify (F10) for DECIMAL(5,2) targets. */
  def metricHygiene(df: DataFrame, metricCols: Seq[String]): DataFrame =
    metricCols.filter(df.columns.contains).foldLeft(df)((d, c) =>
      d.withColumn(c, CleanFns.nullifyOutOfRange(
        CleanFns.rescaleOverflow(col(c).cast("double"))).cast(Schemas.metric)))

  private def withHash(df: DataFrame, asOf: Column): DataFrame = {
    val keys = Seq("ticker", "asset_type", "source")
    val payload = df.columns.filterNot(keys.contains).map(col).toSeq
    df.withColumn("row_hash", HashFns.canonicalRowHash(keys.map(col), payload))
      .withColumn("updated_at", asOf.cast("timestamp"))
  }

  /** Normalize + display-parse one raw source frame into the shared wide
    * shape — the per-source half of the stage, separated from the merge so
    * the orchestrator can union MANY sources and merge each target table
    * ONCE per run (not once per source; see [[runAll]]). */
  def prepareWide(raw: DataFrame, source: String): DataFrame =
    parseDisplay(normalize(raw, source),
      percentCols = Seq("expense_ratio", "initial_charge", "exit_charge",
        "top_10_hold_pct", "dividend_yield", "total_return_ytd",
        "total_return_1y", "payout_ratio"),
      magnitudeCols = Seq("assets_aum", "shares_out"),
      numberCols = Seq("holdings_count", "pe_ratio"))
      .filter(length(trim(coalesce(col("ticker"), lit("")))) > 0)

  /** Run one wide source frame into all four detail tables under
    * `warehouseRoot/stg_fund_{info,fees,risk,policy}`. */
  def run(spark: SparkSession, raw: DataFrame, source: String,
          warehouseRoot: String, asOf: Column): Map[String, DataFrame] =
    runAll(spark, Seq(prepareWide(raw, source)), warehouseRoot, asOf)

  /** Batched detail sync: union the prepared wide frames of ALL sources,
    * then merge each `stg_fund_*` table exactly once. Per-source merging
    * (N sources x 4 tables = 4N read-merge-rewrite cycles of the same
    * parquet tables per day) is the scale killer the round-1 verdict
    * flagged — every extra cycle re-shuffles and rewrites the table's
    * touched partitions, so batching cuts the day's merge I/O by Nx. */
  def runAll(spark: SparkSession, wides: Seq[DataFrame],
             warehouseRoot: String, asOf: Column): Map[String, DataFrame] = {
    require(wides.nonEmpty, "runAll needs at least one prepared wide frame")
    val wide = wides.reduce(_.unionByName(_, allowMissingColumns = true))

    val slices = Map(
      "stg_fund_info"   -> slice(wide, Schemas.fundInfo),
      "stg_fund_fees"   -> slice(wide, Schemas.fundFees),
      "stg_fund_risk"   -> metricHygiene(slice(wide, Schemas.fundRisk),
        Schemas.fundRisk.fieldNames.toSeq.filter(c =>
          c.contains("sharpe") || c.contains("beta") || c.contains("alpha") ||
            c.contains("stddev") || c.contains("r_squared"))),
      "stg_fund_policy" -> metricHygiene(slice(wide, Schemas.fundPolicy),
        Seq("dividend_yield", "payout_ratio", "total_return_ytd", "total_return_1y")))

    slices.map { case (table, df) =>
      val path = s"$warehouseRoot/$table"
      MergeSink.upsertParquet(spark, path, withHash(df, asOf),
        Schemas.naturalKeys(table))
      table -> MergeSink.readTable(spark, path)
    }
  }
}
