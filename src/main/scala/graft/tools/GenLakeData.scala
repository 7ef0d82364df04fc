package graft.tools

import java.nio.file.{Files, Path, Paths}

/** Seeded generator for a STAGING-SHAPED file lake at scale — the input
  * side of the pipeline-at-scale measurement (SCALING_r07_pipeline). The
  * reference's daily staging tree is thousands of SMALL per-ticker CSVs
  * under per-source directories (`validation_output/<Source>/<category>
  * [/<date>]/<T>_*.csv`, src/utils/path_manager.py:19-49) — so the
  * generator reproduces exactly that shape: per-ticker history/dividend/
  * holdings/allocations files, one master/nav/screener CSV per source,
  * heterogeneous headers across sources (the rename-map path), percent/
  * magnitude display strings (the parse path). File-count scaling is the
  * point: a daily run's cost at the reference's scale is dominated by
  * many-small-file ingestion, not by any single big table.
  *
  * Deterministic: every value is a pure function of (ticker index, row
  * index) — two generations of the same size are byte-identical.
  * Driver-side java.nio writes: this is a TEST-HARNESS tool (the lake is
  * the simulated SCRAPER OUTPUT, which the reference also writes
  * file-at-a-time); engine code never writes this way.
  *
  * Usage: runMain graft.tools.GenLakeData <outRoot> <nTickers>
  *        [historyRows=60] [holdingsRows=20]
  */
object GenLakeData {

  private val Sources = Seq("Financial Times", "Yahoo Finance", "Stock Analysis")
  private val Date = "2024-05-01"
  private val Sectors = Seq("Technology", "Financials", "Health Care",
    "Energy", "Industrials", "Utilities", "Consumer Staples", "Materials")

  /** Deterministic per-(ticker,row,tag) value in [0, m). */
  private def h(t: Int, i: Int, tag: String, m: Int): Int = {
    var x = t.toLong * 0x9e3779b97f4a7c15L + i.toLong * 0xc2b2ae3d27d4eb4fL + tag.hashCode
    x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL; x ^= (x >>> 33)
    ((x & Long.MaxValue) % m).toInt
  }

  private def write(p: Path, content: String): Unit = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  def generate(outRoot: String, nTickers: Int, historyRows: Int = 60,
               holdingsRows: Int = 20): Unit = {
    val root = Paths.get(outRoot)
    val masters = Array.fill(Sources.size)(new StringBuilder(
      "ticker,asset_type,name,status,source,date_added\n"))
    val navs = Array.fill(Sources.size)(new StringBuilder(
      "ticker,asset_type,source,nav_price,currency,as_of_date,scrape_date\n"))
    // screener headers per source are deliberately heterogeneous — the
    // batched union-by-name + rename-map path must run at scale too
    val screeners = Array(
      new StringBuilder("ticker,asset_type,name,expense_ratio,assets_aum\n"),
      new StringBuilder("symbol,name,expense,aum\n"),
      new StringBuilder("ticker,asset_type,name,expense_ratio,assets_aum\n"))

    (0 until nTickers).foreach { t =>
      val ticker = f"TK$t%05d"
      val si = t % Sources.size
      val source = Sources(si)
      val assetType = if (t % 2 == 0) "ETF" else "FUND"
      val cat = assetType.toLowerCase
      masters(si).append(
        s"$ticker,$assetType,Fund $ticker,new,$source,$Date\n")
      navs(si).append(
        s"$ticker,$assetType,$source,${100 + h(t, 0, "nav", 9000) / 100.0},USD,$Date,$Date\n")
      if (si == 1) screeners(si).append(
        s"$ticker,Fund $ticker,0.${h(t, 0, "er", 90) + 10}%,${h(t, 0, "aum", 900) + 10}.5m USD\n")
      else screeners(si).append(
        s"$ticker,$assetType,Fund $ticker,0.${h(t, 0, "er", 90) + 10}%,${h(t, 0, "aum", 900) + 10}.5m USD\n")

      val hist = new StringBuilder("Date,Open,High,Low,Close,Volume\n")
      (0 until historyRows).foreach { i =>
        val base = 90 + h(t, i, "px", 2000) / 100.0
        val day = f"2024-${1 + i / 28}%02d-${1 + i % 28}%02d"
        hist.append(f"$day,$base%.2f,${base + 1.2}%.2f,${base - 0.8}%.2f,${base + 0.3}%.2f,${1000 + h(t, i, "vol", 100000)}\n")
      }
      write(root.resolve(s"history/$source/$cat/$Date/${ticker}_history.csv"),
        hist.toString)

      val div = new StringBuilder("Date,Dividend\n")
      (0 until 8).foreach { i =>
        div.append(f"2024-0${1 + i % 8}-15,0.${10 + h(t, i, "div", 80)}\n")
      }
      write(root.resolve(s"dividends/$source/$cat/$Date/${ticker}_dividend.csv"),
        div.toString)

      val hold = new StringBuilder("ticker,asset_type,name,symbol,weight\n")
      (0 until holdingsRows).foreach { i =>
        hold.append(s"$ticker,$assetType,Holding $i,H${h(t, i, "sym", 500)},${1 + h(t, i, "w", 80) / 10.0}%\n")
      }
      write(root.resolve(s"holdings/$source/$cat/$Date/${ticker}_${cat}_holdings.csv"),
        hold.toString)

      val alloc = new StringBuilder("ticker,sector,percentage,scrape_date\n")
      Sectors.take(4 + h(t, 0, "nsec", 4)).foreach { sec =>
        alloc.append(s"$ticker,$sec,${5 + h(t, sec.hashCode, "alloc", 250) / 10.0}%,$Date\n")
      }
      write(root.resolve(s"allocations/$source/$Date/${ticker}_allocations.csv"),
        alloc.toString)
    }

    Sources.zipWithIndex.foreach { case (s, i) =>
      write(root.resolve(s"master/$s/master.csv"), masters(i).toString)
      write(root.resolve(s"nav/$s/nav.csv"), navs(i).toString)
      write(root.resolve(s"details/$s/screener.csv"), screeners(i).toString)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenLakeData <outRoot> <nTickers> [historyRows] [holdingsRows]")
    val t0 = System.nanoTime()
    generate(args(0), args(1).toInt,
      args.lift(2).map(_.toInt).getOrElse(60),
      args.lift(3).map(_.toInt).getOrElse(20))
    println(s"generated ${args(1)}-ticker lake at ${args(0)} in " +
      s"${(System.nanoTime() - t0) / 1000000} ms")
  }
}
