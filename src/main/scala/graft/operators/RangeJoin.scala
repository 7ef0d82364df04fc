package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — the scale-safe fix for interval predicates.
  *
  * Spark plans a bare `p.x >= r.lo AND p.x < r.hi` join as a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side fits
  * in a broadcast): every left row is tested against every right row —
  * quadratic, and a guaranteed 100 TB killer. Binning restores an
  * equi-join: quantize the domain into fixed-width bins, key left rows by
  * the single bin containing the point, replicate each right interval
  * across the bins it overlaps, equi-join on the bin, and re-check the
  * exact predicate. The shuffle is keyed by bin — cost scales with
  * rows x (interval span / binWidth), never |L| x |R|.
  *
  * binWidth is the replication/selectivity knob: width >> typical interval
  * span means ~1 bin per interval (minimal replication, coarser buckets);
  * width << span replicates intervals but keeps each bin's population
  * small. Set it near the typical interval length.
  */
object RangeJoin {

  /** Inner join of `left` points against `right` half-open intervals
    * [loCol, hiCol): rows pair when `left.pointCol` falls in the interval.
    * All three columns must be integral (convert dates/timestamps to epoch
    * days/seconds first). Each matching pair emerges exactly once — the
    * point lives in exactly one bin. Right rows with hi <= lo (empty
    * intervals) are dropped, matching the exact-predicate semantics. */
  /** Exact integral floor division: `c - pmod(c, w)` is exactly divisible
    * (pmod is the non-negative remainder, so this floors for negatives
    * too), and the decimal divide keeps values beyond 2^53 exact — a
    * double `/` would mis-bin epoch-nanos / snowflake-id magnitudes. */
  private def floorDiv(c: Column, w: Long): Column =
    ((c.cast("long") - pmod(c.cast("long"), lit(w))).cast("decimal(38,0)") / lit(w))
      .cast("long")

  def pointInRange(left: DataFrame, pointCol: String,
                   right: DataFrame, loCol: String, hiCol: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val lb = left.withColumn("__bin", floorDiv(col(pointCol), binWidth))
    val rb = right
      .filter(col(hiCol) > col(loCol)) // guard: sequence() descends when hi < lo
      .withColumn("__bin", explode(sequence(
        floorDiv(col(loCol), binWidth),
        floorDiv(col(hiCol) - 1, binWidth))))
    lb.join(rb, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
