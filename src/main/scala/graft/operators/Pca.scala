package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** PCA over an embedding column: exact integer covariance aggregation,
  * a driver-side Jacobi eigensolver over the collected d×d matrix, and a
  * zero-shuffle integer projection — the whitening/compaction step
  * embedding-curation stacks run before semantic dedup or ANN indexing
  * (SemDeDup-class pipelines sphere/center embeddings first; a top-p
  * projection cuts index bytes d/p-fold while keeping the variance that
  * matters).
  *
  * Determinism discipline: the covariance is computed in INTEGER
  * arithmetic over quantized vectors (order-independent — float sums
  * are shuffle-order-sensitive, the q50 lesson), so the eigensolver's
  * input is bit-identical on every run/partitioning; Jacobi itself is a
  * fixed-order sequential double computation on the driver, and the
  * resulting eigenvectors are re-quantized to integers before any
  * distributed use. The projection is then exact long arithmetic,
  * replayable bit-for-bit by an external SQL engine given the same
  * plane constants (the q43/q44 inlined-constants discipline).
  *
  * 100 TB design: the d² work per row happens INSIDE the scan
  * (map-side hash aggregation reduces every partition to ≤ d(d+1)/2
  * groups before the only shuffle — d=1024 is 524k groups, still
  * executor-trivial); the driver holds d², never n. The projection is a
  * literal-plane map over the scan (no join, no shuffle), same shape as
  * [[Similarity.ivfTopKInt]]'s inlined-centroid assignment. */
object Pca {

  /** Exact integer covariance/moment frame of a quantized embedding
    * column: one row per coordinate pair (i ≤ j, 1-based), with the
    * count, first moments, raw second moment and the centered-covariance
    * NUMERATOR cov_num = n·s_ij − s_i·s_j (= n² · cov_pop[i,j] in
    * quantized units — integer-exact, no mean division anywhere).
    *
    * Overflow headroom: |q| ≤ scale·max|x|; cov_num needs
    * n·Σ|q_i q_j| < 2^63 — at scale=1000 and unit-normed embeddings
    * that bounds n ≲ 4.6e12 rows, checked by the caller's domain. DuckDB
    * BIGINT arithmetic errors loudly (never wraps), so the oracle would
    * catch a silent overflow here too. */
  def embedCovariance(df: DataFrame, vecCol: String,
                      scale: Int = 1000): DataFrame = {
    val base = df.select(VectorFns.quantize(col(vecCol), scale).as("__q"))
    val m1 = base
      .select(posexplode(col("__q")).as(Seq("__i0", "qi")))
      .groupBy(col("__i0"))
      .agg(count(lit(1)).as("n"), sum(col("qi")).as("s"))
    val m2 = base
      .select(col("__q"), posexplode(col("__q")).as(Seq("__i0", "qi")))
      .select(col("__i0"), col("qi"),
        posexplode(col("__q")).as(Seq("__j0", "qj")))
      .filter(col("__j0") >= col("__i0"))
      .groupBy(col("__i0"), col("__j0"))
      .agg(sum(col("qi") * col("qj")).as("sij"))
    m2
      .join(broadcast(m1.select(col("__i0"), col("n"), col("s").as("si"))),
        Seq("__i0"))
      .join(broadcast(m1.select(col("__i0").as("__j0"), col("s").as("sj"))),
        Seq("__j0"))
      .select((col("__i0") + 1).cast("int").as("i"),
        (col("__j0") + 1).cast("int").as("j"),
        col("n"), col("si"), col("sj"), col("sij"),
        (col("n") * col("sij") - col("si") * col("sj")).as("cov_num"))
      .orderBy(col("i"), col("j"))
  }

  /** A trained PCA basis: `planes(k)(j)` = component k's j-th coordinate,
    * fixed-point-quantized (×`eigQuant`, HALF_UP) from the unit-norm
    * eigenvector; `eigenvalues` descending (population covariance units
    * of the ×`scale` quantized space); `sums(j)` = Σ q_j over the
    * training corpus (the centering offsets: the centered projection of
    * component k is (n·pc_k − Σ_j sums(j)·planes(k)(j)) / (n·eigQuant·scale)
    * — a per-component CONSTANT shift, so distances and neighbor ranks
    * over raw `pc_k` already match the centered ones exactly). */
  final case class PcaModel(dim: Int, p: Int, scale: Int, eigQuant: Long,
                            n: Long, sums: Array[Long],
                            eigenvalues: Array[Double],
                            planes: Seq[Array[Long]],
                            traceVar: Double) {
    /** Fraction of total (population-covariance trace) variance the
      * leading `k` components capture — THE precondition check before
      * reducing with [[projectInt]]/[[withProjection]]: the r14 A/B
      * (scaling/r14/pca_semdedup_ab.json) measured a 62%-share
      * reduction over-flagging 39733/40000 in semantic dedup where the
      * full space flags 229, while a 98%-share reduction agrees 99.9%.
      * Reduce only when the share justifies p. */
    def varianceShare(k: Int): Double = {
      require(k >= 1 && k <= p, s"need 1 <= k <= p=$p, got $k")
      // degenerate spectrum (all-zero/constant corpus) reports share 0,
      // NOT 1: the precondition gate must fail exactly when the spectrum
      // carries no information to justify reducing on (r14 ADVICE)
      if (traceVar <= 0.0) 0.0
      else math.min(1.0, eigenvalues.take(k).sum / traceVar)
    }
  }

  /** The moment rows [[train]] consumes, (i, j, n, si, sj, sij,
    * cov_num) ordered by (i, j) — computed by a ONE-JOB shuffle-free
    * kernel (r17): per-partition dense triangular accumulators
    * collected to the driver, exactly the KMeansInt.assignmentPartials
    * discipline, since the reduce side is ≤ d(d+1)/2 cells BY
    * CONSTRUCTION. The [[embedCovariance]] DataFrame (the q115-oracled
    * shape) previously served here via collect(), paying a d²/2-fold
    * posexplode row blow-up into a hash aggregate + that aggregate's
    * exchange, twice (first + second moments), plus two joins — for
    * rows the driver was about to hold anyway. Long sums are order-free,
    * so every field is bit-identical to the frame's (PcaSpec pins it);
    * arrays are prefixes, so pair (i,j) is observed iff coordinate j is
    * (which keeps the ragged-guard behavior in [[train]] byte-for-byte).
    * Driver transfer: partitions × d(d+1)/2 longs — dim=64 is ~16 KB a
    * partition; the d=1024 scaladoc bound above stays executor- and
    * driver-trivial. */
  private[graft] def covMomentRows(df: DataFrame, vecCol: String,
      scale: Int): Seq[(Int, Int, Long, Long, Long, Long, Long)] = {
    val rdd = df.select(VectorFns.quantize(col(vecCol), scale).as("__q"))
      .queryExecution.toRdd
    // SCALE GUARD: collected partials are parts × d(d+1)/2 longs — past
    // a 512 MB-of-longs budget (extreme partition counts × large d),
    // fall back to the shuffle-aggregated q115 frame, whose driver
    // transfer is the final d(d+1)/2 rows only. d is unknown before the
    // scan; bound it by the engine's embedding ceiling (d = 1024, the
    // scaladoc bound above).
    if (rdd.getNumPartitions.toLong * (1024L * 1025L / 2L) > (1L << 26)) {
      return embedCovariance(df, vecCol, scale)
        .select("i", "j", "n", "si", "sj", "sij", "cov_num")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    }
    val partials = rdd.mapPartitions { it =>
        var cap = 0
        var cnt: Array[Long] = new Array[Long](0)
        var s: Array[Long] = new Array[Long](0)
        var sij: Array[Long] = new Array[Long](0) // triangular, idx(i,j)=j*(j+1)/2+i
        while (it.hasNext) {
          val row = it.next()
          if (!row.isNullAt(0)) {
            val q = row.getArray(0)
            val len = q.numElements()
            if (len > cap) {
              cnt = java.util.Arrays.copyOf(cnt, len)
              s = java.util.Arrays.copyOf(s, len)
              sij = java.util.Arrays.copyOf(sij, len * (len + 1) / 2)
              cap = len
            }
            var j = 0
            while (j < len) {
              val qj = q.getLong(j)
              cnt(j) += 1L
              s(j) += qj
              val base = j * (j + 1) / 2
              var i = 0
              while (i <= j) { sij(base + i) += q.getLong(i) * qj; i += 1 }
              j += 1
            }
          }
        }
        Iterator.single((cnt, s, sij))
      }.collect()
    val L = partials.iterator.map(_._1.length).foldLeft(0)(math.max)
    val cnt = new Array[Long](L)
    val s = new Array[Long](L)
    val sij = new Array[Long](L * (L + 1) / 2)
    partials.foreach { case (pc, ps, pij) =>
      var j = 0
      while (j < pc.length) { cnt(j) += pc(j); s(j) += ps(j); j += 1 }
      var x = 0
      while (x < pij.length) { sij(x) += pij(x); x += 1 }
    }
    for {
      i <- 0 until L
      j <- i until L
      if cnt(j) > 0 // pair (i,j) observed iff coordinate j is (prefix arrays)
    } yield {
      val m = sij(j * (j + 1) / 2 + i)
      (i + 1, j + 1, cnt(i), s(i), s(j), m, cnt(i) * m - s(i) * s(j))
    }
  }

  /** Train a top-`p` PCA basis: collect the d(d+1)/2 moment rows
    * ([[covMomentRows]] — driver memory is d², independent of corpus
    * size), Jacobi-diagonalize the population covariance, keep the `p`
    * leading eigenvectors under a deterministic sign convention (the
    * largest-|coordinate| entry is made positive; ties take the first
    * such index), and quantize them for exact integer projection. */
  def train(df: DataFrame, vecCol: String, dim: Int, p: Int,
            scale: Int = 1000, eigQuant: Long = 1000000L): PcaModel = {
    require(dim > 0 && p > 0 && p <= dim, s"need 0 < p <= dim, got p=$p dim=$dim")
    val rows = covMomentRows(df, vecCol, scale)
    require(rows.nonEmpty, "Pca.train: empty corpus")
    val n = rows.head._3
    val sums = new Array[Long](dim)
    val cov = Array.ofDim[Double](dim, dim)
    var nDiag = 0
    rows.foreach { r =>
      val i = r._1 - 1; val j = r._2 - 1
      require(i < dim && j < dim,
        s"Pca.train: coordinate ${math.max(i, j) + 1} exceeds dim=$dim")
      // RAGGED-INPUT GUARD (r14 verdict #1): every coordinate's count is
      // the corpus row count iff every vector has exactly `dim` entries.
      // A short/ragged vector makes some coordinate's n smaller, which
      // would silently SKEW cov_num = n·s_ij − s_i·s_j instead of
      // failing — the loud-failure policy (cf. trainTrigramLm's caps).
      require(r._3 == n,
        s"Pca.train: ragged embedding column — coordinate ${i + 1} has " +
          s"${r._3} entries, coordinate 1 has $n; every vector " +
          s"must carry exactly dim=$dim coordinates")
      if (i == j) { sums(i) = r._4; nDiag += 1 }
      val c = r._7.toDouble / (n.toDouble * n.toDouble)
      cov(i)(j) = c; cov(j)(i) = c
    }
    require(nDiag == dim,
      s"Pca.train: embedding column covers $nDiag of dim=$dim " +
        "coordinates — every vector must carry exactly dim entries")
    val (eigVals, eigVecs) = jacobiEigen(cov)
    // order components by eigenvalue descending, index ascending
    val order = eigVals.indices.sortBy(k => (-eigVals(k), k)).take(p)
    val planes = order.map { k =>
      val v = Array.tabulate(dim)(j => eigVecs(j)(k))
      // sign convention: largest-|coordinate| entry positive
      val m = v.indices.maxBy(j => (math.abs(v(j)), -j))
      val s = if (v(m) < 0) -1.0 else 1.0
      v.map(x => java.math.BigDecimal.valueOf(x * s * eigQuant)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
    }
    PcaModel(dim, p, scale, eigQuant, n, sums,
      order.map(eigVals(_)).toArray, planes,
      traceVar = (0 until dim).map(i => cov(i)(i)).sum)
  }

  /** Project every vector onto the model's `p` components in exact long
    * arithmetic: pc_k = Σ_j q_j · planes(k)(j) (raw, un-centered —
    * centering is a constant per-component shift, see [[PcaModel]]).
    * Zero-shuffle: quantize + p native dot products inside the scan's
    * codegen span against inlined literal planes. */
  def projectInt(df: DataFrame, idCol: String, vecCol: String,
                 model: PcaModel): DataFrame = {
    val q = VectorFns.quantize(col(vecCol), model.scale)
    val pcs = model.planes.zipWithIndex.map { case (plane, k) =>
      VectorFns.quantizedDot(q,
          array(plane.map(lit(_)).toIndexedSeq: _*))
        .as(s"pc${k + 1}")
    }
    df.select((col(idCol) +: pcs): _*)
  }

  /** [[projectInt]] as an appended ARRAY column in the original value
    * scale (pc_int / (scale·eigQuant) ≈ the de-quantized principal
    * coordinate) — the composition shape: downstream embedding operators
    * ([[Similarity.semDedup]], ANN indexing) consume the reduced vector
    * exactly like a raw embedding column, at p/d of the per-pair dot
    * cost. Values derive from exact long arithmetic followed by one
    * IEEE division, so an external SQL engine replays them bit-for-bit
    * from the same plane constants. */
  def withProjection(df: DataFrame, vecCol: String, model: PcaModel,
                     outCol: String = "pca_vec"): DataFrame = {
    val q = VectorFns.quantize(col(vecCol), model.scale)
    val denom = model.scale.toDouble * model.eigQuant
    val pcs = model.planes.map { plane =>
      VectorFns.quantizedDot(q, array(plane.map(lit(_)).toIndexedSeq: _*))
        .cast("double") / lit(denom)
    }
    df.withColumn(outCol, array(pcs: _*))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector-column matrix). Fixed sweep order and a
    * fixed convergence threshold make it deterministic for a given
    * input; O(d³) per sweep on the driver (d ≤ a few thousand — the
    * embedding-dim regime; corpus size never enters). */
  private[operators] def jacobiEigen(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    // RELATIVE convergence threshold (r14 ADVICE): an absolute 1e-14 is
    // unreachable when entries sit at ~1e6 (quantized-unit covariance —
    // the floating-point floor of the off-diagonal norm is ~1e-8 there),
    // so the solver always burned all 100 sweeps. Scaling by the input's
    // Frobenius norm keeps the criterion input-deterministic and
    // magnitude-invariant; typical convergence is 5-10 sweeps.
    var frob = 0.0
    var fi = 0
    while (fi < d) {
      var fj = 0
      while (fj < d) { frob += a(fi)(fj) * a(fi)(fj); fj += 1 }
      fi += 1
    }
    val eps = 1e-14 * math.sqrt(frob)
    var sweep = 0
    var off = offDiagNorm(a)
    while (off > eps && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // t = sign(θ)/(|θ| + √(θ²+1)); θ = 0 takes t = 1 (45° rotation)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    val d = a.length
    var s = 0.0
    var i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
