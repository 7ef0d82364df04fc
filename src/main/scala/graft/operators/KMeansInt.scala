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

  /** Per-partition assignment partials collected straight to the driver
    * — [[lloydStep]]'s kernel. The reduce side of the Lloyd aggregate is
    * nCentroids × (dim+1) longs by CONSTRUCTION (broadcast-dim-sized, the
    * same bound that makes the collect legal), so the shuffle the
    * DataFrame groupBy pays — plus the 64× posexplode row blow-up feeding
    * it — buys nothing: fold each partition into a dim+1 accumulator
    * array in one pass and merge the bounded partials driver-side
    * (guide §2.3 "aggregate before you shuffle", taken to its limit).
    * ONE job, ZERO exchanges, no explode; integer sums are order-free, so
    * the result is bit-identical to [[assignmentSums]] (which stays the
    * q63-oracled DataFrame shape). Measured (tools/QueryStats, sf0.1):
    * each iteration 2 AQE jobs → 1, and the 8-iteration converge loop in
    * the q82/q136/q137/q70 production twins drops its explode+shuffle
    * entirely. */
  private def assignmentPartials(corpus: DataFrame, idCol: String,
                                 vecCol: String,
                                 cents: Seq[(Long, Array[Long])],
                                 scale: Int): collection.Map[Long, Array[Long]] = {
    val dim = cents.head._2.length
    val assigned = corpus
      .select(VectorFns.quantize(col(vecCol), scale).as("__qv"))
      .withColumn("centroid_id", Similarity.centroidArgmin(cents)(col("__qv")))
      .select(col("centroid_id"), col("__qv"))
    // queryExecution.toRdd keeps the scan+quantize+argmin inside
    // whole-stage codegen; the per-row accumulation below is dim adds
    // into a preallocated array (cheaper than materializing 64 exploded
    // rows per vector, let alone hashing them into an aggregate map)
    // SCALE GUARD: the collected dense partials are
    // parts × touched-centroids × (dim+1) longs in the worst case —
    // driver-bounded on any sane layout, but a huge-partition-count
    // corpus with a large nlist could breach it; fall back to the
    // shuffle-aggregated frame (map-side combined, driver sees only the
    // final nCentroids × dim rows) past a 512 MB-of-longs budget.
    val rdd = assigned.queryExecution.toRdd
    if (rdd.getNumPartitions.toLong * cents.size * (dim + 1) > (1L << 26)) {
      val viaFrame = assignmentSums(corpus, idCol, vecCol, cents, scale)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      val out = new java.util.HashMap[Long, Array[Long]]()
      viaFrame.foreach { case (cid, rows) =>
        val a = new Array[Long](dim + 1)
        // member count = any pos row's n (vectors are fixed-dim by the
        // engine's embedding contract, so all pos counts agree)
        rows.foreach { case (_, pos, sq, n) =>
          a(pos) = sq
          if (n > a(dim)) a(dim) = n
        }
        out.put(cid, a)
      }
      import scala.jdk.CollectionConverters._
      return out.asScala
    }
    val partials = rdd.mapPartitions { it =>
      val acc = new java.util.HashMap[Long, Array[Long]]()
      while (it.hasNext) {
        val row = it.next()
        // a null vector contributes nothing (posexplode-drop semantics
        // in the oracled assignmentSums frame); cid is non-null whenever
        // the vector is
        if (row.isNullAt(0) || row.isNullAt(1)) { /* skip */ }
        else {
        val cid = row.getLong(0)
        val qv = row.getArray(1)
        var a = acc.get(cid)
        if (a == null) { a = new Array[Long](dim + 1); acc.put(cid, a) }
        var i = 0
        val m = math.min(dim, qv.numElements())
        while (i < m) { a(i) += qv.getLong(i); i += 1 }
        a(dim) += 1L // member count rides the last slot
        }
      }
      val out = Array.newBuilder[(Long, Array[Long])]
      acc.forEach((k, v) => out += ((k, v)))
      out.result().iterator
    }.collect() // bounded: <= partitions × nCentroids × (dim+1) longs
    val merged = new java.util.HashMap[Long, Array[Long]]()
    partials.foreach { case (cid, a) =>
      val t = merged.get(cid)
      if (t == null) merged.put(cid, a)
      else { var i = 0; while (i <= dim) { t(i) += a(i); i += 1 } }
    }
    import scala.jdk.CollectionConverters._
    merged.asScala
  }

  /** One full Lloyd iteration: one-job shuffle-free assignment partials
    * ([[assignmentPartials]]), then the refreshed centroid set
    * (element-wise floor-div mean; a centroid that attracted no vectors
    * keeps its previous position — the standard empty-cluster rule).
    * Bit-identical to folding [[assignmentSums]]' rows: same integer
    * sums, same floor division. */
  def lloydStep(corpus: DataFrame, idCol: String, vecCol: String,
                cents: Seq[(Long, Array[Long])], scale: Int): Seq[(Long, Array[Long])] = {
    val dim = cents.head._2.length
    val sums = assignmentPartials(corpus, idCol, vecCol, cents, scale)
    cents.map { case (cid, old) =>
      sums.get(cid) match {
        case Some(a) =>
          val n = a(dim)
          (cid, Array.tabulate(dim)(i => Math.floorDiv(a(i), n)))
        case None => (cid, old)
      }
    }
  }
}
