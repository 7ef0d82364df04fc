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
    * Returns (filesBefore, filesAfter) summed over partitions. */
  def compactPartitionedDir(spark: SparkSession, root: String,
                            targetBytes: Long,
                            maxParallelBins: Int = 4): (Int, Int) = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return (0, 0)
    val parts = fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(_.getPath).sortBy(_.getName)
    val out = parts.foldLeft((0, 0)) { case ((b, a), part) =>
      val (pb, pa) = compactDirInto(spark, part.toString,
        s"$root.compact-staging/${part.getName}",
        s"$root.compact-old/${part.getName}", targetBytes, maxParallelBins)
      (b + pb, a + pa)
    }
    fs.delete(new Path(root + ".compact-staging"), true)
    fs.delete(new Path(root + ".compact-old"), true)
    out
  }

  private def compactDirInto(spark: SparkSession, dir: String,
                             stagingDir: String, oldDir: String,
                             targetBytes: Long,
                             maxParallelBins: Int): (Int, Int) = {
    require(maxParallelBins >= 1, s"maxParallelBins must be >= 1, got $maxParallelBins")
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
