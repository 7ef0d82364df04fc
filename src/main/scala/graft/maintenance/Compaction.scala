package graft.maintenance

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction — the lake-maintenance operator every long-running
  * ingestion pipeline needs (the reference's daily appends produce one file
  * per ticker per day: `data/03_staging/...` grows without bound;
  * incremental Spark sinks have the same pathology — a 100 TB lake fed by
  * small batches degrades every downstream scan with per-file open costs
  * and starves split planning).
  *
  * Two pieces:
  *  - [[binPack]]: the PLAN — deterministic size-based bin packing of a
  *    (file, bytes) listing into target-size output groups. Pure
  *    DataFrame logic (window cumsum), so it is oracle-checkable and runs
  *    distributed over listings of any size.
  *  - [[compactParquetDir]]: the ACTION — list a parquet directory's part
  *    files, bin-pack them, rewrite each bin as one file, atomically swap.
  *
  * Binning contract: files are taken in a DETERMINISTIC total order
  * (caller-chosen sort key; path order for the FS op) and bin
  * `b = floor(cum_bytes_before / targetBytes)` — i.e. the byte stream is
  * cut at exact target boundaries and a file belongs to the bin its first
  * byte falls in. This is the same virtual-concatenation packing Spark's
  * own `FilePartition` planner uses for `maxPartitionBytes`; unlike
  * close-when-full greedy (which needs sequential state), it is a pure
  * function of the prefix sums — embarrassingly parallel, stable under
  * re-listing, and bins overflow by at most one file tail.
  */
object Compaction {

  /** Assign each file to a compaction bin. `ordered` = deterministic total
    * order over files within each `partitionCols` group (compaction never
    * merges across partitions — partition columns are pruning boundaries).
    * Output adds (cum_before, bin).
    *
    * 100 TB shape: one hash exchange on the partition key + per-partition
    * sort (the windowed-cumsum contract shape, like q49/q67); the listing
    * frame is metadata (~100 bytes/file), so even a 10^8-file lake windows
    * in MBs per partition. */
  def binPack(listing: DataFrame, bytesCol: String, targetBytes: Long,
              partitionCols: Seq[String], ordered: Seq[String]): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(ordered.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    listing
      .withColumn("cum_before",
        (sum(col(bytesCol)).over(w) - col(bytesCol)).cast("long"))
      .withColumn("bin", (col("cum_before") / targetBytes).cast("long"))
  }

  /** List `dir`'s `part-*` files as a (path, bytes) DataFrame (driver
    * listing — bounded by file count, the same metadata scale as any
    * catalog listing; a 10^8-file lake would feed this from the table
    * metadata log instead). */
  def listPartFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (!fs.exists(p)) Seq.empty[(String, Long)]
      else fs.listStatus(p).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .map(st => (st.getPath.toString, st.getLen))
        .sortBy(_._1)
    files.toDF("path", "bytes")
  }

  /** Compact a parquet directory in place: bin-pack its part files at
    * `targetBytes`, rewrite each bin as ONE output file, and atomically
    * swap the rewritten directory over the original. Returns
    * (filesBefore, bins). No-op (returns early) when already compact.
    *
    * Per-bin rewrite instead of a global `repartition(n)`: reading a
    * bin's own files and writing them back with `coalesce(1)` moves no
    * rows between tasks — the whole rewrite is shuffle-free, and the bins
    * are independent single-task jobs submitted CONCURRENTLY (up to
    * `maxParallelBins` driver threads; Spark's scheduler interleaves
    * them — Delta OPTIMIZE semantics). Each bin writes its own staging
    * subdirectory: concurrent jobs must not share one output committer's
    * `_temporary`, so isolation is per-job directories and the files are
    * lifted into the staging root afterwards (driver renames, metadata
    * cost only). The swap reuses the staging-then-rename discipline of
    * [[graft.operators.MergeSink]]; readers see old or new, never a mix. */
  def compactParquetDir(spark: SparkSession, dir: String,
                        targetBytes: Long,
                        maxParallelBins: Int = 4): (Int, Int) =
    compactDirInto(spark, dir, dir + ".compact-staging", dir + ".compact-old",
      targetBytes, maxParallelBins)

  /** [[compactParquetDir]] for a HIVE-PARTITIONED parquet table
    * (`root/key=value/part-*`): compact each partition directory
    * independently, never merging across partitions — partition dirs are
    * replay/overwrite boundaries (dynamic partition overwrite replaces a
    * whole `key=value` dir, so rows must stay inside theirs) and pruning
    * boundaries. Already-compact partitions no-op cheaply, so calling
    * this every K batches from an ingestion loop does O(new partitions)
    * work, not O(table).
    *
    * Staging and swap directories live under SIBLINGS of the table root
    * (`root.compact-staging/key=value`), NOT inside it: a leftover
    * `root/key=value.compact-old` from a crash would parse as a bogus
    * partition value and double-read old rows; outside the root, leftover
    * state is invisible to readers and cleaned on the next pass.
    *
    * `minFiles` (0 = off) is the ADAPTIVE trigger: partitions holding
    * `minFiles` part files or fewer are skipped without planning a
    * rewrite — an ingestion loop can then call this EVERY batch and pay
    * only FS listings until a partition actually accumulates enough
    * files to hurt scan planning (the r9 cadence ablation showed
    * unconditional every-N compaction costs more than it saves at short
    * horizons; the file-count rule makes the cost proportional to the
    * problem). Returns (filesBefore, filesAfter) summed over the
    * partitions it REWROTE (skipped partitions are not counted).
    * NOTE: crash recovery ([[recoverPartitionedDir]] semantics) still
    * runs on every call, regardless of skips. */
  def compactPartitionedDir(spark: SparkSession, root: String,
                            targetBytes: Long,
                            maxParallelBins: Int = 4,
                            minFiles: Int = 0): (Int, Int) = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return (0, 0)
    // A previous pass may have died between the two swap renames of a
    // partition (or the rename itself failed — on S3A a directory rename
    // is a non-atomic copy, so the window is wide): the partition then
    // exists ONLY under the sibling dirs. It would not be listed below
    // (the fold only sees dirs present under root), so recover FIRST —
    // otherwise the end-of-pass cleanup would delete the only copies.
    recoverInterruptedSwaps(fs, rootPath)
    val parts = fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(_.getPath).sortBy(_.getName)
    val out = parts.foldLeft((0, 0)) { case ((b, a), part) =>
      val skip = minFiles > 0 && {
        val n = fs.listStatus(part).count(st => st.isFile &&
          st.getPath.getName.startsWith("part-"))
        n <= minFiles
      }
      if (skip) (b, a)
      else {
        val (pb, pa) = compactDirInto(spark, part.toString,
          s"$root.compact-staging/${part.getName}",
          s"$root.compact-old/${part.getName}", targetBytes, maxParallelBins)
        (b + pb, a + pa)
      }
    }
    // Belt and braces before the irreversible deletes: restore any
    // partition whose only copy still sits in a sibling dir, then verify
    // the pass preserved the partition set. A vanished partition here is
    // data loss in flight — fail LOUDLY rather than hand readers a
    // silently-thinner index (streaming replay reads these dirs and a
    // missing partition just looks like fewer rows).
    recoverInterruptedSwaps(fs, rootPath)
    val after = fs.listStatus(rootPath)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(_.getPath.getName).toSet
    parts.map(_.getName).foreach { n =>
      require(after.contains(n),
        s"compaction lost partition $n of $root — aborting cleanup so the " +
          s"surviving copy under $root.compact-old / .compact-staging is kept")
    }
    fs.delete(new Path(root + ".compact-staging"), true)
    fs.delete(new Path(root + ".compact-old"), true)
    out
  }

  /** Public recovery entry point for readers of a partitioned dir that is
    * ALSO compacted in place (e.g. the streaming curation loop's index +
    * sidecar): restores any partition stranded in the swap window by a
    * crashed [[compactPartitionedDir]] pass, so a replay that runs BEFORE
    * the next compaction pass never reads a silently-thinner table. No-op
    * (one FS listing) when there is nothing to recover. */
  def recoverPartitionedDir(spark: SparkSession, root: String): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(rootPath)) recoverInterruptedSwaps(fs, rootPath)
  }

  /** Complete or roll back partition swaps interrupted between
    * `rename(p, old)` and `rename(staging, p)` of [[compactDirInto]]: any
    * `key=value` dir under `root.compact-old` (preferred — it is the
    * untouched pre-swap original) or `root.compact-staging` (the fully
    * rewritten copy; staging dirs are only ever swapped after being fully
    * built, so if the partition is absent from root the staging copy is
    * complete) with no corresponding `root/key=value` is renamed back into
    * the root. Leftovers whose partition DOES exist in root are stale
    * by-products of a completed swap and are left for the caller's
    * cleanup. */
  private def recoverInterruptedSwaps(fs: org.apache.hadoop.fs.FileSystem,
                                      root: Path): Unit =
    Seq(new Path(root.toString + ".compact-old"),
        new Path(root.toString + ".compact-staging")).foreach { side =>
      if (fs.exists(side))
        fs.listStatus(side).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.contains("="))
          .foreach { st =>
            val target = new Path(root, st.getPath.getName)
            if (!fs.exists(target))
              require(fs.rename(st.getPath, target),
                s"compaction recovery: could not restore ${st.getPath} to $target")
          }
    }

  private def compactDirInto(spark: SparkSession, dir: String,
                             stagingDir: String, oldDir: String,
                             targetBytes: Long,
                             maxParallelBins: Int): (Int, Int) = {
    require(maxParallelBins >= 1, s"maxParallelBins must be >= 1, got $maxParallelBins")
    // Crash-window recovery for the UNPARTITIONED entry point (the
    // partitioned caller recovers at the root level before listing): if a
    // previous swap died between its two renames, `dir` is absent and the
    // data lives only in oldDir (pre-swap original, preferred) or
    // stagingDir (fully-built rewrite — staging is only ever swapped
    // after completion, so dir-absent implies it is complete).
    locally {
      val p0 = new Path(dir)
      val fs0 = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs0.exists(p0)) {
        val oldP = new Path(oldDir); val stg = new Path(stagingDir)
        if (fs0.exists(oldP)) {
          require(fs0.rename(oldP, p0),
            s"compaction recovery: could not restore $oldDir to $dir")
          fs0.delete(stg, true)
        } else if (fs0.exists(stg)) {
          require(fs0.rename(stg, p0),
            s"compaction recovery: could not publish $stagingDir to $dir")
        }
      }
    }
    val listing = listPartFiles(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val plan = {
      var cum = 0L
      listing.map { case (path, bytes) =>
        val bin = cum / targetBytes; cum += bytes; (path, bin)
      }
    }
    val bins = plan.map(_._2).distinct.sorted
    if (listing.length <= bins.length) return (listing.length, bins.length)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(stagingDir)
    fs.delete(staging, true)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(maxParallelBins, bins.length))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val jobs = bins.toSeq.map { b =>
        scala.concurrent.Future {
          val paths = plan.filter(_._2 == b).map(_._1)
          spark.read.parquet(paths: _*).coalesce(1)
            .write.mode(SaveMode.ErrorIfExists)
            .parquet(new Path(staging, s"bin=$b").toString)
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(jobs),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    // lift each bin's file into the staging root (bin prefix keeps names
    // collision-free), then drop the per-job dirs
    bins.foreach { b =>
      val binDir = new Path(staging, s"bin=$b")
      fs.listStatus(binDir).filter(st => st.isFile &&
          st.getPath.getName.startsWith("part-"))
        .foreach { st =>
          require(fs.rename(st.getPath,
            new Path(staging, s"part-b$b-${st.getPath.getName.stripPrefix("part-")}")),
            s"compaction: could not lift ${st.getPath}")
        }
      fs.delete(binDir, true)
    }
    val old = new Path(oldDir)
    fs.delete(old, true)
    fs.mkdirs(old.getParent)
    require(fs.rename(p, old), s"compaction swap: could not move $dir aside")
    require(fs.rename(staging, p), s"compaction swap: could not publish $staging")
    fs.delete(old, true)
    (listing.length, bins.length)
  }
}
