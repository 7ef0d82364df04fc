package graft.pipeline

import graft.SparkSpec
import graft.maintenance.Retention
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}
import java.time.LocalDate

/** End-to-end daily run over a synthetic file lake shaped like the
  * reference's validation_output/data trees (FIXTURES.md §1). */
class DailyPipelineSpec extends SparkSpec {

  private def write(dir: Path, name: String, content: String): Unit = {
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(name), content)
  }

  test("full pipeline: all stages land, replay is stable") {
    val root = Files.createTempDirectory("lake")
    val wh = s"$root/warehouse"

    write(root.resolve("lake/master/Financial Times"), "ft_master.csv",
      "ticker,asset_type,name,status,source,date_added\n" +
        "VUSA,ETF,Vanguard SP500,new,Financial Times,2024-05-01\n" +
        "ABC,FUND,Alpha Fund,new,Financial Times,2024-05-01\n")
    write(root.resolve("lake/nav/Financial Times"), "nav.csv",
      "ticker,asset_type,source,nav_price,currency,as_of_date,scrape_date\n" +
        "VUSA,ETF,Financial Times,101.5,USD,2024-05-01,2024-05-01\n")
    write(root.resolve("lake/history/Financial Times/etf/2024-05-01"),
      "VUSA_history.csv",
      "Date,Open,High,Low,Close,Volume\n2024-04-30,99,100,98,99.5,1000\n")
    write(root.resolve("lake/dividends/Yahoo Finance/fund/2024-05-01"),
      "ABC_dividend.csv", "Date,Dividend\n2024-03-01,0.52\n")
    write(root.resolve("lake/details/Stock Analysis"), "screener.csv",
      "ticker,asset_type,name,expense_ratio,assets_aum\n" +
        "VUSA,ETF,Vanguard SP500,0.07%,842.33m USD\n")
    // second detail source with heterogeneous headers (symbol/expense/aum
    // aliases, no asset_type) — exercises the batched union-by-name path
    write(root.resolve("lake/details/Financial Times"), "ft_screener.csv",
      "symbol,name,expense,aum\nABC,Alpha Fund,0.45%,12.5m USD\n")
    write(root.resolve("lake/holdings/Financial Times/etf/2024-05-01"),
      "VUSA_etf_holdings.csv",
      "ticker,asset_type,name,symbol,weight\nVUSA,ETF,Apple,AAPL,5.9%\n")
    write(root.resolve("lake/allocations/Stock Analysis/2024-05-01"),
      "VUSA_allocations.csv",
      "ticker,sector,percentage,scrape_date\nVUSA,Technology,28.4%,2024-05-01\n")

    val results = DailyPipeline.run(spark, s"$root/lake", wh, lit("2024-05-01"))
    val byStage = results.map(r => r.stage -> r.rows).toMap
    assert(results.forall(_.ok), results.mkString("; "))
    // per-stage durations (reference logger.py:81-117): every stage that
    // ran real Spark work reports a positive wall-clock duration
    assert(results.forall(_.durationMs > 0),
      s"stage duration missing: ${results.map(r => r.stage -> r.durationMs)}")
    assert(byStage("master_sync") == 2)
    assert(byStage("nav_sync") == 1)
    // batched per-table merges: ONE upsert per target table per run
    assert(byStage("history_sync") == 1)
    assert(byStage("dividend_sync") == 1)
    // BOTH detail sources land through ONE batched merge per table:
    // 2 rows x 4 tables, and the stage reports once (not per source)
    assert(byStage("detail_sync") == 8)
    assert(!byStage.keys.exists(_.startsWith("detail_sync/")))
    assert(byStage("holdings_sync") == 1)
    assert(byStage("allocations_sync") == 1)

    // replay the whole day -> identical warehouse row counts (idempotence)
    val replay = DailyPipeline.run(spark, s"$root/lake", wh, lit("2024-05-01"))
    assert(replay.map(r => r.stage -> r.rows).toMap == byStage)
  }

  test("a failing stage is captured in the run summary (A6 contract)") {
    val root = Files.createTempDirectory("lakefail")
    val wh = s"$root/warehouse"
    // details CSV with NO ticker/symbol column -> DetailSync's key
    // normalization throws; holdings after it is healthy
    write(root.resolve("lake/details/Broken Source"), "screener.csv",
      "name,expense_ratio\nNameless Fund,0.10%\n")
    write(root.resolve("lake/holdings/Financial Times/etf/2024-05-01"),
      "VUSA_etf_holdings.csv",
      "ticker,asset_type,name,symbol,weight\nVUSA,ETF,Apple,AAPL,5.9%\n")

    // failFast=false (standalone-orchestrator mode): the failed stage is
    // recorded and later stages still run
    val results = DailyPipeline.run(spark, s"$root/lake", wh,
      lit("2024-05-01"), failFast = false)
    val detail = results.find(_.stage == "detail_sync").get
    assert(!detail.ok && detail.rows == 0 && detail.error.exists(_.nonEmpty))
    // a FAILED stage still reports how long it ran before dying
    assert(detail.durationMs > 0, "failed stage must carry its duration")
    val holdings = results.find(_.stage == "holdings_sync").get
    assert(holdings.ok && holdings.rows == 1)

    // failFast=true (reference global-pipeline mode): aborts at the failed
    // stage but the thrown summary still records it
    val e = intercept[DailyPipeline.PipelineFailedException] {
      DailyPipeline.run(spark, s"$root/lake", s"$root/warehouse2",
        lit("2024-05-01"))
    }
    val failed = e.summary.last
    assert(failed.stage == "detail_sync" && !failed.ok && failed.error.nonEmpty)
    assert(!e.summary.exists(_.stage == "holdings_sync"), "abort must stop later stages")
  }

  test("Retention.purgeDatedDirs drops only dirs older than the cutoff") {
    val root = Files.createTempDirectory("retention")
    Files.createDirectories(root.resolve("2024-01-01"))
    Files.createDirectories(root.resolve("2024-03-01"))
    Files.createDirectories(root.resolve("not-a-date"))
    val deleted = Retention.purgeDatedDirs(spark, root.toString,
      LocalDate.parse("2024-03-15"), keepDays = 60)
    assert(deleted == Seq("2024-01-01"))
    assert(Files.exists(root.resolve("2024-03-01")))
    assert(Files.exists(root.resolve("not-a-date")))
  }
}
