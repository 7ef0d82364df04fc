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
    corpus
      .select(VectorFns.quantize(col(vecCol), scale).as("__qv"))
      // native argmin kernel: this runs once per row per Lloyd iteration
      .withColumn("centroid_id", Similarity.centroidArgmin(cents)(col("__qv")))
      .select(col("centroid_id"), posexplode(col("__qv")).as(Seq("pos", "v")))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(sum(col("v")).as("sum_q"), count(lit(1)).as("n"))
  }

  /** k-means++-style seeding over a DETERMINISTIC bounded sample: take the
    * `sampleSize` lowest-(md5 bucket, id) rows (a hash-ordered uniform
    * sample — a pure function of the ids present, same rationale as q55/
    * q68), collect their quantized vectors (bounded driver transfer, like
    * a broadcast dim), and run classic k-means++ D²-weighted selection on
    * the driver with a seeded LCG. Deterministic end-to-end: reruns and
    * engine ports pick identical seeds.
    *
    * 100 TB: one corpus scan + a TeraSort-free top-`sampleSize` (takeOrdered
    * shape); the quadratic D² selection runs on sampleSize × n driver
    * rows, never on the cluster. Centroid ids are 0..n-1. */
  def kmeansPlusPlusInit(corpus: DataFrame, idCol: String, vecCol: String,
                         n: Int, scale: Int, sampleSize: Int = 4096,
                         seed: Long = 42L): Seq[(Long, Array[Long])] = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(sampleSize >= n, s"sampleSize ($sampleSize) must be >= n ($n)")
    val sample = corpus
      .select(col(idCol).cast("long").as("__id"),
        VectorFns.quantize(col(vecCol), scale).as("__qv"))
      .withColumn("__b", Mixture.sampleBucket(col("__id"), 1000000L))
      .orderBy(col("__b").asc, col("__id").asc).limit(sampleSize)
      .select(col("__qv")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(sample.nonEmpty, "corpus is empty — cannot seed centroids")
    @inline def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val rnd = new scala.util.Random(seed)
    val chosen = scala.collection.mutable.ArrayBuffer(sample(0))
    // nearest-chosen distance per sample row, updated incrementally
    val near = sample.map(v => d2(v, chosen(0)))
    while (chosen.length < math.min(n, sample.length)) {
      val total = near.foldLeft(0.0)(_ + _.toDouble)
      val idx =
        if (total <= 0.0) {
          // all remaining mass at distance 0 (duplicates): next unchosen row
          val i = near.indexWhere(_ > 0L)
          if (i >= 0) i else near.length - 1
        } else {
          var r = rnd.nextDouble() * total
          var i = 0
          while (i < near.length - 1 && r >= near(i).toDouble) { r -= near(i).toDouble; i += 1 }
          i
        }
      val c = sample(idx)
      chosen += c
      var i = 0
      while (i < sample.length) {
        val d = d2(sample(i), c)
        if (d < near(i)) near(i) = d
        i += 1
      }
    }
    chosen.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v) }
  }

  /** Convergence driver: iterate [[lloydStep]] until the largest centroid
    * movement (squared L2, integer) is <= `epsilon2` or `maxIters` is hit.
    * Each iteration costs one corpus scan + one nCentroids × dim shuffle;
    * the loop state is centroid literals only (driver-bounded).
    * @return (converged centroids, iterations actually run) */
  def converge(corpus: DataFrame, idCol: String, vecCol: String,
               init: Seq[(Long, Array[Long])], scale: Int,
               maxIters: Int = 20, epsilon2: Long = 0L): (Seq[(Long, Array[Long])], Int) = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    var cents = init
    var iters = 0
    var moved = Long.MaxValue
    while (iters < maxIters && moved > epsilon2) {
      val next = lloydStep(corpus, idCol, vecCol, cents, scale)
      moved = cents.zip(next).map { case ((_, a), (_, b)) =>
        var s = 0L; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      }.max
      cents = next
      iters += 1
    }
    (cents, iters)
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
