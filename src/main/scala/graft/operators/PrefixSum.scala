package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum — the primitive behind ordered corpus
  * operations (GPT-style sequence packing, ordered chunk assignment,
  * global row numbering) that are usually written as
  * `Window.orderBy(...)` with NO partition keys: Spark plans that as
  * `Exchange SinglePartition` + one task doing all the work — the
  * classic 100 TB scale killer.
  *
  * Two-phase formulation instead (the textbook parallel scan):
  *   1. range-repartition by the order column, local cumulative sum per
  *      partition (a window PARTITIONED by `spark_partition_id()` — every
  *      partition sums in parallel);
  *   2. per-partition totals (one tiny aggregate, <= numPartitions rows)
  *      get their own exclusive prefix on the driver-side-sized frame,
  *      then BROADCAST-join back as offsets.
  * Total cost: two shuffles of the data (range + pid hash) plus a
  * broadcast of numPartitions longs — no serial stage anywhere.
  *
  * Correctness notes:
  *  - `orderCol` must be globally UNIQUE: the prefix sum is then
  *    independent of where the (sampled, run-varying) range boundaries
  *    land, because addition is associative and the order is total.
  *  - the running total is INCLUSIVE (row's own value included);
  *    subtract the value column for the exclusive form.
  *  - values are summed as longs (token counts, byte sizes, row counts —
  *    the intended domains).
  */
object PrefixSum {

  /** Appends `outCol` = inclusive running total of `valueCol` in global
    * `orderCol` order. `numPartitions` defaults to the session's shuffle
    * partitioning. */
  def withRunningTotal(spark: SparkSession, df: DataFrame, orderCol: String,
                       valueCol: String, outCol: String,
                       numPartitions: Int = 0): DataFrame =
    withRunningTotalAndGrand(spark, df, orderCol, valueCol, outCol,
      numPartitions)._1

  /** [[withRunningTotal]] plus the GRAND total (Σ valueCol), which phase
    * 2 computes anyway — consumers that need N (perplexityBuckets'
    * ntile denominator) previously re-ran the whole post-checkpoint
    * window subtree under an aggregate to derive a number the prefix
    * sum already knew (the r17 q79/q95 plan dumps show the doubled
    * subtree). */
  private[graft] def withRunningTotalAndGrand(spark: SparkSession,
      df: DataFrame, orderCol: String, valueCol: String, outCol: String,
      numPartitions: Int = 0): (DataFrame, Long) = {
    import spark.implicits._
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // phase 1: range partition + parallel per-partition cumulative sums.
    // EAGERLY materialized (localCheckpoint): phases 1 and 2 both consume
    // this frame, and as two lazy branches they would each plan their OWN
    // range exchange with independently SAMPLED boundaries — a row near a
    // boundary could land in partition p for the local sums but p+1 for
    // the totals, silently corrupting the offsets. One materialization
    // pins the boundaries (and the __pid values) for both consumers.
    val ranged = df.repartitionByRange(n, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val local = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = ranged.withColumn("__local",
      sum(col(valueCol).cast("long")).over(local))
    // phase 2: exclusive prefix of the per-partition totals. The totals
    // frame has <= numPartitions rows — COLLECT it and compute the
    // exclusive prefix (and the grand total, for free) on the driver:
    // the r17 shape; the previous Window-over-totals formulation paid a
    // SinglePartition sort of a config-bounded frame plus its own job,
    // for arithmetic over ≤ numPartitions longs.
    val totalsRows = ranged.groupBy(col("__pid"))
      .agg(sum(col(valueCol).cast("long")).as("__total"))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsetsLocal = totalsRows.map { case (pid, total) =>
      val off = acc; acc += total; (pid, off)
    }.toSeq
    val out = withLocal
      .join(broadcast(offsetsLocal.toDF("__pid", "__offset")), Seq("__pid"))
      .withColumn(outCol, col("__local") + col("__offset"))
      .drop("__pid", "__local")
    (out, acc)
  }
}
