package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed integer-space k-means (Lloyd) building blocks — the coarse-
  * quantizer refinement behind [[Similarity.ivfTopKInt]]'s IVF index. The
  * reference has no vector ops at all; this extends the north-star
  * similarity-search family with the index-BUILD side (assignment +
  * centroid update), the part that actually runs over the full corpus.
  *
  * 100 TB shape: assignment reuses [[Similarity.centroidRanking]] — the
  * centroids are inlined literals, so the argmin is a zero-shuffle
  * whole-stage-codegen map over the corpus scan (no crossJoin against a
  * centroid table, no groupBy-argmin shuffle of vectors). The ONLY shuffle
  * per Lloyd iteration is the (centroid_id, pos) groupBy with map-side
  * partial sums, whose result is nCentroids × dim rows regardless of
  * corpus size; the new centroids are then a bounded driver-side fold,
  * exactly like broadcasting a dim table.
  *
  * All arithmetic is integer (quantized vectors, Long sums, floor-div
  * means), so every step is bit-reproducible by an external engine — the
  * q63 oracle replays [[assignmentSums]] in DuckDB.
  */
object KMeansInt {

  /** Element-wise assignment sums for ONE Lloyd iteration: each corpus
    * vector goes to its nearest centroid (squared-L2 argmin, ties to the
    * lowest cid), then per (centroid_id, dimension-pos) emit the SUM of the
    * quantized component and the member count. Division into the mean is
    * deliberately left to [[lloydStep]]: the aggregate itself stays
    * division-free, so no truncation/floor semantics can diverge between
    * engines.
    *
    * Output: (centroid_id LONG, pos INT, sum_q LONG, n LONG). */
  def assignmentSums(corpus: DataFrame, idCol: String, vecCol: String,
                     cents: Seq[(Long, Array[Long])], scale: Int): DataFrame = {
    require(cents.nonEmpty, "cents must be non-empty")
    val ranked = Similarity.centroidRanking(cents) _
    corpus
      .select(VectorFns.quantize(col(vecCol), scale).as("__qv"))
      .withColumn("centroid_id", element_at(ranked(col("__qv")), 1).getField("cid"))
      .select(col("centroid_id"), posexplode(col("__qv")).as(Seq("pos", "v")))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(sum(col("v")).as("sum_q"), count(lit(1)).as("n"))
  }

  /** One full Lloyd iteration: runs [[assignmentSums]], collects the
    * bounded nCentroids × dim sum rows, and returns the refreshed centroid
    * set (element-wise floor-div mean; a centroid that attracted no vectors
    * keeps its previous position — the standard empty-cluster rule). Call
    * iteratively from a driver loop; each iteration is one corpus scan and
    * one nCentroids × dim shuffle. */
  def lloydStep(corpus: DataFrame, idCol: String, vecCol: String,
                cents: Seq[(Long, Array[Long])], scale: Int): Seq[(Long, Array[Long])] = {
    val dim = cents.head._2.length
    val sums = assignmentSums(corpus, idCol, vecCol, cents, scale)
      .collect() // bounded: nCentroids × dim rows, not data
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    cents.map { case (cid, old) =>
      sums.get(cid) match {
        case Some(rows) =>
          val next = Array.fill(dim)(0L)
          rows.foreach { case (_, pos, s, n) => next(pos) = Math.floorDiv(s, n) }
          (cid, next)
        case None => (cid, old)
      }
    }
  }
}
