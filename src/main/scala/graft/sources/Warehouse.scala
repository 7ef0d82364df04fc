package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-side scans (SURVEY.md §2.1 S6/S7): the reference reads its
  * own Postgres warehouse for active-ticker lists and incremental
  * watermarks (src/utils/db_connector.py:353-378;
  * 02_sa_price_history_scraper.py:75-93). Re-expressed over either a JDBC
  * warehouse or the engine's parquet warehouse — both paths push the
  * status/source predicates down to the source (JDBC pushdown or parquet
  * row-group pruning).
  *
  * No database ships in this container, so the JDBC variants are exercised
  * structurally (predicate construction) while the parquet variants carry
  * the behavior tests.
  */
object Warehouse {

  /** S6 shape: active tickers for one source (+ optional asset type). */
  def activeTickers(master: DataFrame, source: String,
                    assetType: Option[String] = None): DataFrame = {
    val base = master
      .filter(col("status") === "active" && col("source") === source)
    assetType.fold(base)(at => base.filter(col("asset_type") === at))
      .select("ticker", "asset_type", "name")
  }

  /** S7 shape: per-ticker incremental watermark (max loaded date). */
  def priceWatermarks(priceHistory: DataFrame, source: String): DataFrame =
    priceHistory
      .filter(col("source") === source)
      .groupBy(col("ticker"))
      .agg(max(col("date")).as("max_date"))

  /** S6 over JDBC: predicates arrive as a pushed-down WHERE via the
    * dbtable subquery (Spark additionally pushes .filter()s on the
    * returned frame into the JDBC source). */
  def jdbcActiveTickers(spark: SparkSession, url: String, table: String,
                        source: String, props: java.util.Properties): DataFrame =
    spark.read
      .jdbc(url, table, props)
      .filter(col("status") === "active" && col("source") === source)
      .select("ticker", "asset_type", "name")

  /** Anti-join resume filter (J2/T7 shape): work items minus already-done —
    * the reference's file-existence memoization, relationally. */
  def pendingWork(workList: DataFrame, done: DataFrame,
                  keys: Seq[String]): DataFrame =
    workList.join(done, keys, "left_anti")

  // ---- JDBC scale helpers (SQL generation is unit-tested; no DB ships
  // in this container, mirroring JdbcUpsert's approach) ----

  /** ANSI SQL string literal (single quotes doubled). ANSI-dialect
    * warehouses only: engines that ALSO treat backslash as an escape in
    * plain literals (MySQL's default sql_mode) can see a trailing
    * backslash swallow the closing quote — route values through the
    * prepared-statement paths (JdbcUpsert) for such targets instead of
    * interpolating. */
  def sqlLiteral(v: String): String = "'" + v.replace("'", "''") + "'"

  /** Pushdown subquery for the `dbtable` operand: projection + predicates
    * run inside the database regardless of Catalyst's JDBC filter-pushdown
    * eligibility (e.g. disjunctions of casts it declines). Mirrors the
    * reference's handwritten warehouse queries
    * (src/utils/db_connector.py:353-378). */
  def pushdownSubquery(table: String, cols: Seq[String],
                       where: Seq[String] = Nil): String = {
    require(cols.nonEmpty, "projection must name at least one column")
    val sel = s"SELECT ${cols.mkString(", ")} FROM $table"
    val q = if (where.isEmpty) sel else sel + where.mkString(" WHERE (", ") AND (", ")")
    s"($q) AS pushed"
  }

  /** Partition-parallel JDBC scan: numPartitions concurrent range queries
    * on a numeric partition column — the only way a JDBC source scales
    * past a single connection's throughput. At warehouse scale, pick a
    * clustered/indexed column and bounds from a cheap MIN/MAX probe. */
  def jdbcPartitionedRead(spark: SparkSession, url: String, dbtable: String,
                          partCol: String, lower: Long, upper: Long,
                          numPartitions: Int,
                          props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, dbtable, partCol, lower, upper, numPartitions, props)
}
