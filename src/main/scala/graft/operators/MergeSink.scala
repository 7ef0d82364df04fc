package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-guarded upsert — the reference's single most important operator
  * (SURVEY.md §2.5 J3, §2.2 K3–K5, §3.3): `INSERT ... ON CONFLICT (natural
  * key) DO UPDATE SET ... WHERE row_hash IS DISTINCT FROM EXCLUDED.row_hash`
  * (src/utils/db_connector.py:380-419), re-expressed as a relational MERGE.
  *
  * [[merge]] is a pure DataFrame -> DataFrame function (testable, oracle-able
  * as a FULL OUTER JOIN in ANSI SQL); [[upsertParquet]] wraps it as a
  * read-merge-atomic-swap sink for a parquet-backed warehouse (this build has
  * no Delta jars; with Delta/Iceberg the same `merge` becomes `MERGE INTO`).
  *
  * Scale notes: the merge is a single shuffle on the natural key. For a
  * 100 TB warehouse, partition the target by a stable key prefix (e.g.
  * hash-bucketed ticker) and merge per-partition so the rewrite touches only
  * partitions with updates (partition-overwrite mode), not the full table.
  */
object MergeSink {

  /** MERGE semantics on `keys`:
    *  - matched + row_hash equal     -> keep target row unchanged (no-op, T2)
    *  - matched + row_hash differs   -> take update row
    *  - matched, no hash guard       -> take update row (K4 unconditional)
    *  - target-only                  -> keep target row
    *  - update-only                  -> insert update row
    *
    * `updates` is deduplicated on the keys first (keep-last by `updateOrder`,
    * mirroring the reference's last-chunk-wins constraint behavior but made
    * deterministic). Output schema = target schema.
    */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String],
            hashCol: Option[String] = Some("row_hash"),
            updateOrder: Seq[Column] = Nil): DataFrame = {
    val cols = target.columns.toSeq
    val upd0 = updates.select(cols.map(col): _*)
    val upd =
      if (updateOrder.nonEmpty) Dedup.keyedKeepFirst(upd0, keys, updateOrder)
      else upd0.dropDuplicates(keys)

    val t = target.select(cols.map(c => col(c).as(s"t_$c")): _*)
    val u = upd.select(cols.map(c => col(c).as(s"u_$c")): _*)
    val joinCond = keys.map(k => col(s"t_$k") <=> col(s"u_$k")).reduce(_ && _)
    val joined = t.join(u, joinCond, "full_outer")

    val updPresent = keys.map(k => col(s"u_$k").isNotNull).reduce(_ && _)
    val tgtPresent = keys.map(k => col(s"t_$k").isNotNull).reduce(_ && _)
    val takeUpdate = hashCol match {
      case Some(h) =>
        updPresent && (!tgtPresent || !(col(s"t_$h") <=> col(s"u_$h")))
      case None => updPresent
    }
    joined.select(cols.map { c =>
      when(takeUpdate, col(s"u_$c")).otherwise(col(s"t_$c")).as(c)
    }: _*)
  }

  /** Writes `df` to a temp dir then atomically swaps it into `path`
    * (write-temp / rename-old / rename-temp / drop-old). The read-modify-
    * write primitive under [[upsertParquet]] and the status lifecycle. */
  def replaceParquet(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val tgt   = new org.apache.hadoop.fs.Path(path)
    val fs    = tgt.getFileSystem(hconf)
    val tmp = new org.apache.hadoop.fs.Path(path + "__tmp")
    df.write.mode("overwrite").parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(tgt)) fs.rename(tgt, bak)
    fs.rename(tmp, tgt)
    fs.delete(bak, true)
    // drop cached file listings so readers created after the swap see the
    // new generation (stale FileStatusCache entries would 404 on old parts)
    spark.catalog.refreshByPath(path)
  }

  /** Reads the parquet target (empty -> insert-all), merges, writes to a
    * temp dir, atomically swaps. Idempotent: re-running with identical
    * updates is a no-op on row content. */
  def upsertParquet(spark: SparkSession, path: String, updates: DataFrame,
                    keys: Seq[String], hashCol: Option[String] = Some("row_hash")): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val tgt   = new org.apache.hadoop.fs.Path(path)
    val fs    = tgt.getFileSystem(hconf)
    val merged =
      if (fs.exists(tgt)) merge(spark.read.parquet(path), updates, keys, hashCol)
      else updates.dropDuplicates(keys)
    replaceParquet(spark, path, merged)
  }

  /** T5 status lifecycle (src/utils/status_manager.py:63-88) as a pure
    * column rewrite of the master table. The reference runs two sequential
    * UPDATEs: first `get_sql_update_inactive` (targets ONLY rows WHERE
    * status='active' AND last_seen < cutoff), then
    * `get_sql_promote_new_to_active` ('new' with non-blank name). A stale
    * 'new' row therefore is never demoted — it stays 'new' or gets
    * promoted; only 'active' rows age out. The when-chain mirrors that
    * exact transition order:
    *  - 'active' + last_seen older than `asOf - inactiveDays` -> 'inactive'
    *  - 'new' with a non-blank name                           -> 'active'
    *  - otherwise unchanged. */
  def applyStatusLifecycle(master: DataFrame, asOf: Column,
                           inactiveDays: Int = 7): DataFrame =
    master.withColumn("status",
      when(col("status") === "active" &&
          col("last_seen") < date_sub(asOf, inactiveDays), lit("inactive"))
        .when(col("status") === "new" &&
          length(trim(coalesce(col("name"), lit("")))) > 0, lit("active"))
        .otherwise(col("status")))
}
