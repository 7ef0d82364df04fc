package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical financial-data operator Spark
  * lacks natively: for every left row (key, t), attach the most recent
  * right row with the same key and t_right <= t (optionally within a
  * tolerance). The reference's domain (fund NAV/price series) makes this
  * the natural "what was the NAV on the trade date" primitive.
  *
  * Implementation is pure built-in composition (guide preference (a), no
  * custom SparkPlan): union both sides tagged, one window sorted by
  * (key, time, side) carries the last right payload forward via
  * last(ignoreNulls) — a SINGLE shuffle on the join key, no range
  * explosion, no per-row subquery. At 100 TB both sides shuffle once on
  * `keys` and stream through one window pass — the same cost envelope as
  * a sort-merge join.
  *
  * Constraint: right columns (beyond keys/time) must not collide with left
  * column names — callers alias first (enforced below).
  */
object AsOfJoin {

  /** Left as-of join. `tolerance` (in the time column's native ordering,
    * e.g. days for DateType via datediff) bounds staleness: matches older
    * than `tolerance` are nulled out. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               toleranceDays: Option[Int] = None): DataFrame = {
    val rightPayload = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTime).toSeq
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left: $collisions — alias them first")

    // tag and align both sides on (keys, __t, __side): right rows sort
    // BEFORE left rows at the same timestamp, so a same-instant right row
    // is visible to the left row (<= semantics)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rt", lit(null).cast(left.schema(leftTime).dataType))
    val lAligned = rightPayload.foldLeft(l)((d, c) =>
      d.withColumn(c, lit(null).cast(right.schema(c).dataType)))

    val r0 = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__rt", col(rightTime))
      .drop(rightTime) // before left-column alignment: names may coincide
    val rAligned = left.columns.filterNot(c =>
      keys.contains(c)).foldLeft(r0)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = lAligned.unionByName(rAligned.select(lAligned.columns.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct carries the whole latest right tuple atomically. Per-column
    // last(ignoreNulls) would skip a null payload cell and fill it from a
    // STALER right row (mixing values across right rows) — a right row with
    // e.g. a missing NAV must still win as-of its timestamp. The struct is
    // null on left rows, so ignoreNulls skips exactly the non-right rows.
    val payStruct = struct((rightPayload.map(col) :+ col("__rt")): _*)
    val carried = unioned
      .withColumn("__pay", when(col("__side") === 0, payStruct))
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))

    val joined = (rightPayload :+ "__rt").foldLeft(
        carried.filter(col("__side") === 1))((d, c) =>
      d.withColumn(c, col("__pay").getField(c)))
      .drop("__pay")
    val bounded = toleranceDays match {
      case Some(tol) =>
        val stale = col("__rt").isNull ||
          datediff(col("__t").cast("date"), col("__rt").cast("date")) > tol
        (rightPayload :+ "__rt").foldLeft(joined)((d, c) =>
          d.withColumn(c, when(stale, lit(null)).otherwise(col(c))))
      case None => joined
    }
    bounded
      .withColumn("asof_time", col("__rt"))
      .drop("__t", "__side", "__rt")
  }
}
