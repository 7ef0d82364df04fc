package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

class CsvLakeSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: Path, name: String, content: String): Unit = {
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(name), content)
  }

  private lazy val lake: Path = {
    val root = Files.createTempDirectory("csv_lake")
    write(root.resolve("ft"), "nav1.csv",
      "Ticker,NAV Price,As-Of Date\nVUSA,101.5,2024-05-02\nAAA,50.0,2024-05-02\n")
    write(root.resolve("yf"), "nav2.csv",
      "ticker,nav_price,currency\nBBB,20.0,USD\n")
    write(root.resolve("yf"), "error_log.csv", "ticker,msg\nZZZ,boom\n")
    write(root.resolve("hist").resolve("etf").resolve("2024-05-02"),
      "VUSA_history.csv", "Date,Close\n2024-05-01,100.0\n")
    write(root.resolve("hist").resolve("fund").resolve("2024-05-02"),
      "ABC_history.csv", "Date,Close\n2024-05-01,10.0\n")
    write(root.resolve("hist").resolve("etf").resolve("2024-05-02"),
      "VUSA_holdings.csv", "Name,Weight\nApple,5.0\n")
    root
  }

  test("readCsv: normalized headers + origin_file lineage") {
    val df = CsvLake.readCsv(spark, lake.resolve("ft").toString)
    assert(df.columns.toSeq == Seq("ticker", "nav_price", "as_of_date", "origin_file"))
    assert(df.count() == 2)
    assert(df.select("origin_file").as[String].head().contains("nav1.csv"))
  }

  test("readSourceDirs: per-source tag, union-by-name, error files skipped") {
    val df = CsvLake.readSourceDirs(spark, Map(
      "Financial Times" -> lake.resolve("ft").toString,
      "Yahoo Finance"   -> lake.resolve("yf").toString))
    assert(df.count() == 3) // error_log.csv skipped
    val bySource = df.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource == Map("Financial Times" -> 2L, "Yahoo Finance" -> 1L))
    // drifted columns survive as nulls after unionByName
    assert(df.columns.contains("as_of_date") && df.columns.contains("currency"))
  }

  test("readRecursive + withPathIdentity: filename predicate and path identity") {
    val df = CsvLake.withPathIdentity(
      CsvLake.readRecursive(spark, lake.resolve("hist").toString,
        nameMustContain = "history", nameMustNotContain = "holdings"))
    val rows = df.select("ticker", "asset_type", "as_of_date")
      .withColumn("as_of_date", col("as_of_date").cast("string"))
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(
      ("VUSA", "ETF", "2024-05-02"),
      ("ABC", "FUND", "2024-05-02")))
  }
}
