package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
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

  // ------------------------------------------------------------------ lock

  /** A second writer is already mid-upsert on the same table. */
  final class ConcurrentWriteException(path: String, holder: String)
    extends RuntimeException(
      s"table $path is locked by another writer ($holder); " +
        "concurrent upserts into one parquet table are serialized, not merged")

  private def lockPath(path: String) = new Path(path + "__lock")

  /** This writer's lock was broken (stale-judged) by a contender while it
    * was still alive; the critical section must abort, not proceed. */
  final class LockLostException(path: String, newHolder: String)
    extends RuntimeException(
      s"lock on $path was lost to another writer ($newHolder) while this " +
        "writer was still running; aborting before the table swap to avoid " +
        "two concurrent swaps corrupting the table")

  /** Handle to an acquired table lock. [[assertOwned]] re-reads the lock
    * file and aborts if another writer replaced it — called immediately
    * before the swap critical section so a slow-but-alive writer whose
    * lock was stale-broken can never race the new holder's renames. */
  private[graft] final class TableLock(fs: FileSystem, path: String,
                                       val holder: String) {
    private val lp = lockPath(path)
    private[MergeSink] def holderOf: String =
      try {
        val in = fs.open(lp)
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString
        in.close(); s
      } catch { case _: Exception => "unknown" }
    def owned: Boolean = holderOf == holder
    def assertOwned(): Unit = {
      val h = holderOf
      if (h != holder) throw new LockLostException(path, h)
    }
  }

  /** Table-level writer mutex via atomic create-if-absent of a lock file.
    *
    * The parquet swap-sink is crash-safe (marker + [[recoverSwap]]) but a
    * SECOND concurrent writer would race the staged dirs and the marker
    * itself. This lock serializes writers: acquisition is
    * `FileSystem.create(overwrite = false)`, which is atomic on HDFS and
    * object stores with conditional-put semantics; a writer that died
    * mid-hold is healed by the stale-lock timeout (its swap marker is then
    * rolled forward by recoverSwap under the new lock).
    *
    * Liveness vs the stale horizon: a daemon HEARTBEAT re-touches the lock
    * mtime every `heartbeatMs` while `body` runs, so a slow-but-alive
    * writer (a big merge overrunning `staleAfterMs`) never LOOKS dead —
    * only a truly crashed holder goes stale. Defense in depth on top: the
    * critical section re-reads the holder via [[TableLock.assertOwned]]
    * immediately before [[swapDirs]] and aborts with [[LockLostException]]
    * if the lock was lost anyway (e.g. a heartbeat write outage), so two
    * concurrent swaps cannot both proceed. Honest limits, documented: this
    * is optimistic writer-EXCLUSION, not transaction isolation — readers
    * still see generation boundaries, not snapshots, and on filesystems
    * without atomic create the race window is the create call itself.
    * Delta/Iceberg `MERGE INTO` with a real commit protocol remains the
    * upgrade path (no such jars ship here). */
  private[graft] def withTableLock[T](fs: FileSystem, path: String,
                                      staleAfterMs: Long = 30 * 60 * 1000L,
                                      heartbeatMs: Long = -1L)
                                     (body: TableLock => T): T = {
    val lp = lockPath(path)
    val holder = s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}/${java.util.UUID.randomUUID()}"
    val lock = new TableLock(fs, path, holder)
    def tryAcquire(): Boolean = {
      val created =
        try {
          val out = fs.create(lp, false) // overwrite=false: atomic create-if-absent
          out.write(holder.getBytes("UTF-8")); out.close(); true
        } catch {
          // only an EXISTING lock is contention; a transient infrastructure
          // failure (outage, permissions) must surface as itself, not as a
          // phantom concurrent writer
          case e: java.io.IOException => if (fs.exists(lp)) false else throw e
        }
      // read-back verify: two stale-breakers can both pass the mtime
      // re-check, one deletes the other's FRESH replacement, and both
      // "create" — the loser's create lands second and its bytes are the
      // file, or it lands first and was overwritten. Only the writer whose
      // holder string IS the file content actually owns the lock.
      created && lock.owned
    }
    var acquired = tryAcquire()
    if (!acquired) {
      // break ONLY the exact stale lock we observed: re-check that the
      // file still carries the same mtime before deleting, so two writers
      // probing the same stale lock can't each delete the other's FRESH
      // replacement
      val staleMtime =
        try {
          val st = fs.getFileStatus(lp)
          if (System.currentTimeMillis() - st.getModificationTime > staleAfterMs)
            Some(st.getModificationTime)
          else None
        } catch { case _: Exception => None } // vanished -> plain retry below
      staleMtime.foreach { m =>
        try if (fs.getFileStatus(lp).getModificationTime == m) fs.delete(lp, false)
        catch { case _: Exception => () } // already gone/replaced: don't touch
      }
      acquired = tryAcquire()
      if (!acquired) throw new ConcurrentWriteException(path, lock.holderOf)
    }
    // heartbeat: keep the lock visibly alive for as long as body runs.
    // Touch only while we still own it — freshening a usurper's lock would
    // extend THEIR hold. hbMs <= 0 with the default sentinel derives a
    // period well inside the stale horizon; tests pass Long.MaxValue to
    // simulate a heartbeat-less overrunning writer.
    val hbMs = if (heartbeatMs > 0) heartbeatMs
               else math.max(50L, staleAfterMs / 6)
    val hb = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(hbMs)
          try if (lock.owned) fs.setTimes(lp, System.currentTimeMillis(), -1)
          catch { case _: InterruptedException => throw new InterruptedException
                  case _: Exception => () }
        }
      } catch { case _: InterruptedException => () }
    })
    hb.setDaemon(true); hb.setName("graft-lock-heartbeat")
    if (hbMs != Long.MaxValue) hb.start()
    try body(lock)
    finally {
      hb.interrupt()
      // release ONLY our own lock: if a stale-breaker replaced it while we
      // overran staleAfterMs, deleting blindly would free the table under
      // the new holder's feet and admit a third writer mid-swap
      try if (lock.owned) fs.delete(lp, false)
      catch { case _: Exception => () }
    }
  }

  // ------------------------------------------------------------------ swap

  /** Marker-file path for an in-flight swap of `path`. The marker is
    * written BEFORE any rename and deleted after the last one, so a crash
    * leaves a record of exactly which generation dirs were mid-flight;
    * [[recoverSwap]] rolls the swap forward (staged dirs win) or back. */
  private def swapMarker(path: String) = new Path(path + "__swap")

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Marker line encoding the whole-directory swap: a root swap's subdir
    * is the empty string, which would serialize to an EMPTY marker file —
    * recovery would then parse zero entries and delete both the backup
    * and the staged generation (total table loss). The sentinel keeps the
    * marker one non-blank line per swapped dir. */
  private val RootDirSentinel = "."
  private def encodeDir(d: String) = if (d.isEmpty) RootDirSentinel else d
  private def decodeDir(l: String) = if (l == RootDirSentinel) "" else l

  /** Hadoop FileSystem.rename reports failure by RETURNING FALSE on many
    * implementations (dest-parent races, quotas, cross-fs paths) — an
    * ignored false here would let the cleanup deletes below destroy the
    * only copy of the data while reporting success. */
  private def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  /** Swaps `subdirs` of staged generation `tmp` into `path` (tmp/<d> ->
    * path/<d>, previous path/<d> parked under path__old until the swap
    * completes). `subdirs == Seq("")` swaps the whole directory.
    *
    * Entry gate: re-verifies lock ownership RIGHT BEFORE the first
    * destructive step. A writer whose lock was stale-broken during the
    * (long) staged write aborts here with [[LockLostException]] instead of
    * racing the new holder's renames. */
  private def swapDirs(fs: FileSystem, path: String, tmp: String,
                       subdirs: Seq[String], lock: TableLock): Unit = {
    lock.assertOwned()
    val old = path + "__old"
    fs.delete(new Path(old), true)
    fs.mkdirs(new Path(old))
    val m = fs.create(swapMarker(path), true)
    m.write(subdirs.map(encodeDir).mkString("\n").getBytes("UTF-8")); m.close()
    subdirs.foreach { d =>
      val cur = if (d.isEmpty) new Path(path) else new Path(path, d)
      val stg = if (d.isEmpty) new Path(tmp) else new Path(tmp, d)
      val bak = new Path(old, if (d.isEmpty) "__root" else d)
      if (fs.exists(cur)) renameOrThrow(fs, cur, bak)
      if (fs.exists(stg)) renameOrThrow(fs, stg, cur)
    }
    fs.delete(new Path(old), true)
    fs.delete(new Path(tmp), true)
    fs.delete(swapMarker(path), false)
  }

  /** Finishes an interrupted [[swapDirs]]: staged dirs (path__tmp) roll
    * forward, missing staged dirs roll back from path__old. Called
    * automatically by the sinks when a marker is present; safe no-op
    * otherwise. */
  def recoverSwap(spark: SparkSession, path: String): Boolean = {
    val fs = fsFor(spark, path)
    if (!fs.exists(swapMarker(path))) return false
    val in = fs.open(swapMarker(path))
    val parsed = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map(decodeDir).toList
    in.close()
    // a marker that parses to ZERO entries is a pre-sentinel root-swap
    // marker (the empty subdir serialized to an empty file) — treat it as
    // the whole-directory swap it was, or the deletes below would destroy
    // both the backup and the staged generation
    val subdirs = if (parsed.isEmpty) List("") else parsed
    val old = path + "__old"
    subdirs.foreach { d =>
      val cur = if (d.isEmpty) new Path(path) else new Path(path, d)
      val stg = if (d.isEmpty) new Path(path + "__tmp") else new Path(path + "__tmp", d)
      val bak = new Path(old, if (d.isEmpty) "__root" else d)
      if (!fs.exists(cur)) {
        if (fs.exists(stg)) renameOrThrow(fs, stg, cur)
        else if (fs.exists(bak)) renameOrThrow(fs, bak, cur)
      }
    }
    fs.delete(new Path(old), true)
    fs.delete(new Path(path + "__tmp"), true)
    fs.delete(swapMarker(path), false)
    spark.catalog.refreshByPath(path)
    true
  }

  /** Writes `df` to a temp dir then swaps it into `path`. Crash-safe via
    * the [[swapDirs]] marker: an interrupted swap is finished by
    * [[recoverSwap]] on the next sink call instead of losing the table. */
  def replaceParquet(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val fs = fsFor(spark, path)
    withTableLock(fs, path) { lock =>
      recoverSwap(spark, path)
      val tmp = path + "__tmp"
      df.write.mode("overwrite").parquet(tmp)
      swapDirs(fs, path, tmp, Seq(""), lock)
      // drop cached file listings so readers created after the swap see the
      // new generation (stale FileStatusCache entries would 404 on old parts)
      spark.catalog.refreshByPath(path)
    }
  }

  // -------------------------------------------------------------- bucketed

  /** Hash bucket of the natural key — the warehouse partitioning column.
    * Stable across runs (xxhash64 is seed-fixed), so a key always lands in
    * the same bucket and an upsert touches exactly the buckets its keys
    * hash into. */
  def bucketExpr(keys: Seq[String], numBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(numBuckets)).cast("int")

  private def metaPath(path: String) = new Path(path, "_graft_meta.json")

  /** numBuckets is a TABLE property, not a call parameter: mixing bucket
    * counts across upserts would route the same key to different dirs. The
    * creating write records it; later upserts read it back. */
  private def readNumBuckets(fs: FileSystem, path: String): Option[Int] = {
    if (!fs.exists(metaPath(path))) None
    else {
      val in = fs.open(metaPath(path))
      val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
      in.close()
      "\"numBuckets\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
    }
  }

  private def writeMeta(fs: FileSystem, path: String, keys: Seq[String],
                        numBuckets: Int): Unit = {
    val out = fs.create(metaPath(path), true)
    out.write(
      s"""{"numBuckets":$numBuckets,"keys":[${keys.map("\"" + _ + "\"").mkString(",")}]}"""
        .getBytes("UTF-8"))
    out.close()
  }

  /** Reads a bucketed warehouse table without the physical `__bucket`
    * partition column. */
  def readTable(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    if (df.columns.contains("__bucket")) df.drop("__bucket") else df
  }

  /** Partition-pruned, crash-safe MERGE into a hash-bucketed parquet
    * warehouse table (the scale-safe replacement for a full-table
    * rewrite — matches db_connector.py:380-419's touch-only-conflicting-
    * rows contract at the granularity Spark files allow):
    *
    *  1. table layout: path/__bucket=N/..., N = xxhash64(natural key) %
    *     numBuckets (recorded in _graft_meta.json at creation);
    *  2. an upsert computes the DISTINCT buckets its update keys hash to
    *     (bounded driver collect: <= numBuckets ints), reads ONLY those
    *     partitions of the target (partition-pruned scan), merges, and
    *     rewrites ONLY those bucket dirs via a staged marker swap;
    *  3. untouched buckets are never read, shuffled, or rewritten — at
    *     100 TB a daily increment touching 1% of keys costs ~1% of the
    *     table, not a full rewrite;
    *  4. a crash mid-swap is healed by [[recoverSwap]] on the next call
    *     (staged bucket dirs roll forward; the table is never lost).
    *
    * A pre-existing UNBUCKETED table is migrated in one full merge+rewrite
    * (flagged by the missing meta file). Idempotent: replaying identical
    * updates is a value-level no-op (hash guard) — touched buckets are
    * rewritten with identical rows. */
  def upsertParquet(spark: SparkSession, path: String, updates: DataFrame,
                    keys: Seq[String], hashCol: Option[String] = Some("row_hash"),
                    numBuckets: Int = 32): Unit = {
    val fs = fsFor(spark, path)
    withTableLock(fs, path) { lock =>
      recoverSwap(spark, path)
      val tgt = new Path(path)
      val tmp = path + "__tmp"

      // A ZERO-ROW frame through partitionBy writes a FILELESS dir that
      // read-back cannot infer a schema from — an empty FIRST upsert
      // would brick the table for every later call (the same class as
      // the streaming fileless-sink and empty-shard lessons). Empty
      // frames are written UNPARTITIONED without the __bucket column
      // and WITHOUT meta: the dir reads back (0 rows, full schema) as
      // a legacy-unbucketed table, and the first non-empty upsert
      // migrates it to the bucketed layout through the None branch
      // below. The emptiness probe is one limit-1 job on a frame that
      // is batch-sized (create) or rare (migration).
      def writeWhole(df: DataFrame, dest: String): Boolean = {
        val nonEmpty = !df.isEmpty
        if (nonEmpty)
          df.write.mode("overwrite").partitionBy("__bucket").parquet(dest)
        else
          df.drop("__bucket").write.mode("overwrite").parquet(dest)
        nonEmpty
      }

      if (!fs.exists(tgt)) {
        val nb = numBuckets
        if (writeWhole(updates.dropDuplicates(keys)
            .withColumn("__bucket", bucketExpr(keys, nb)), path))
          writeMeta(fs, path, keys, nb)
        spark.catalog.refreshByPath(path)
      } else readNumBuckets(fs, path) match {
        case None =>
          // legacy unbucketed layout — OR a bucketed table whose meta write
          // was lost to a crash between the data write and writeMeta (the
          // two aren't atomic). readTable hides any __bucket column, so the
          // migration merge works for both states (the half-created case
          // costs one full re-bucket instead of bricking every upsert with
          // an unresolvable-__bucket analysis error)
          val merged = merge(readTable(spark, path), updates, keys, hashCol)
            .withColumn("__bucket", bucketExpr(keys, numBuckets))
          val bucketed = writeWhole(merged, tmp)
          swapDirs(fs, path, tmp, Seq(""), lock)
          if (bucketed) writeMeta(fs, path, keys, numBuckets)
          spark.catalog.refreshByPath(path)

        case Some(nb) =>
          val upd = updates
            .withColumn("__bucket", bucketExpr(keys, nb))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val touched = upd.select("__bucket").distinct()
              .collect().map(_.getInt(0)).sorted
            if (touched.nonEmpty) {
              val target = spark.read.parquet(path)
                .filter(col("__bucket").isin(touched.map(Int.box): _*))
              val merged = merge(target, upd, keys, hashCol)
              merged.write.mode("overwrite").partitionBy("__bucket").parquet(tmp)
              swapDirs(fs, path, tmp, touched.map(n => s"__bucket=$n").toSeq, lock)
              spark.catalog.refreshByPath(path)
            }
          } finally upd.unpersist()
      }
    }
  }

  // ------------------------------------------------------- ACID formats

  /** True when a transactional table format (Delta Lake) is on the
    * classpath. No Delta/Iceberg jars ship in this sandbox, so this is
    * false here — but the MERGE path below is complete and spec-pinned
    * (golden SQL always; execution auto-enabled the moment the jar and
    * `io.delta.sql.DeltaSparkSessionExtension` are configured). */
  lazy val deltaAvailable: Boolean =
    try { Class.forName("org.apache.spark.sql.delta.DeltaLog"); true }
    catch { case _: Throwable => false }

  /** The `MERGE INTO` statement equivalent to [[merge]]+[[upsertParquet]]
    * on a Delta table: hash-guarded update, insert-when-new, key-only
    * match. Pure text (no Delta classes needed to build it) — with the
    * Delta extension installed, `spark.sql` executes it and the advisory
    * file lock becomes unnecessary: Delta's optimistic commit protocol is
    * the real fix for the concurrent-writer races the lock mitigates. */
  def deltaMergeSql(path: String, updatesView: String, keys: Seq[String],
                    hashCol: Option[String] = Some("row_hash")): String = {
    val on = keys.map(k => s"t.`$k` <=> u.`$k`").mkString(" AND ")
    val guard = hashCol.fold("")(h =>
      s" AND NOT (t.`$h` <=> u.`$h`)")
    s"""MERGE INTO delta.`$path` t
       |USING $updatesView u
       |ON $on
       |WHEN MATCHED$guard THEN UPDATE SET *
       |WHEN NOT MATCHED THEN INSERT *""".stripMargin
  }

  /** Routes an upsert through Delta `MERGE INTO` when the format is on
    * the classpath, else through the parquet swap-sink — the "optional
    * ACID profile": zero configuration when the jars are absent, full
    * transactional semantics (no advisory lock, snapshot isolation,
    * concurrent-writer safety) the moment they're present. `updates` is
    * deduplicated on the keys exactly like [[merge]] does. */
  def upsertAuto(spark: SparkSession, path: String, updates: DataFrame,
                 keys: Seq[String], hashCol: Option[String] = Some("row_hash"),
                 numBuckets: Int = 32): Unit =
    if (deltaAvailable) {
      val view = s"graft_updates_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      updates.dropDuplicates(keys).createOrReplaceTempView(view)
      try spark.sql(deltaMergeSql(path, view, keys, hashCol))
      finally spark.catalog.dropTempView(view)
    } else upsertParquet(spark, path, updates, keys, hashCol, numBuckets)

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
