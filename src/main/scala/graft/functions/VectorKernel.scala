package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Java-callable static kernels behind the vector expressions
  * ([[SrpBucketIntExpr]]/[[SrpBucketExpr]]) — tight primitive loops over
  * `ArrayData`, no boxing, no encoder round-trip. Null vector -> bucket 0
  * (matching the UDF kernels these replaced). */
object VectorKernel {

  /** ±1-plane integer SRP bucket over a quantized (`array<long>`) vector:
    * bit i = sign of Σ_j plane_ij * q_j. */
  def srpBucketInt(v: ArrayData, planes: Array[Array[Int]]): Long = {
    if (v == null) return 0L
    val n = v.numElements()
    var bucket = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var acc = 0L
      var j = 0
      val m = math.min(p.length, n)
      while (j < m) { acc += v.getLong(j) * p(j); j += 1 }
      if (acc >= 0L) bucket |= (1L << i)
      i += 1
    }
    bucket
  }

  /** Exact comparison of the two triple products `a*b*c` vs `d*e*f` for
    * NON-NEGATIVE long factors — the q44 cosine-threshold test
    * (`qdot² · tden² >= tnum² · |a|² · |b|²`) without BigInt allocation:
    * each side is expanded to 192-bit limbs with `Math.multiplyHigh`
    * (factors < 2^63 ⇒ product < 2^189, three limbs suffice) and compared
    * lexicographically. Exact at ANY dim/scale configuration, allocation-
    * free, callable from whole-stage codegen.
    * @return negative / zero / positive as `a*b*c` <=> `d*e*f` */
  def cmpProd3(a: Long, b: Long, c: Long, d: Long, e: Long, f: Long): Int = {
    // 192-bit limbs (r2:r1:r0) of x*y*z, all factors in [0, 2^63)
    @inline def limbs(x: Long, y: Long, z: Long): (Long, Long, Long) = {
      val ph = Math.multiplyHigh(x, y) // signed==unsigned: both < 2^63
      val pl = x * y                   // wrapping low 64
      // (ph:pl) * z = (ph*z << 64) + pl*z
      val lo = pl * z
      // unsigned high of pl*z: pl is a full unsigned 64-bit limb
      val loHi = Math.multiplyHigh(pl, z) + (if (pl < 0L) z else 0L)
      val midLo = ph * z
      val midHi = Math.multiplyHigh(ph, z)
      val r1 = midLo + loHi
      val carry = if (java.lang.Long.compareUnsigned(r1, loHi) < 0) 1L else 0L
      (midHi + carry, r1, lo)
    }
    val (l2, l1, l0) = limbs(a, b, c)
    val (m2, m1, m0) = limbs(d, e, f)
    if (l2 != m2) java.lang.Long.compareUnsigned(l2, m2)
    else if (l1 != m1) java.lang.Long.compareUnsigned(l1, m1)
    else java.lang.Long.compareUnsigned(l0, m0)
  }

  /** The q44 post-blocking threshold test as a static kernel:
    * `qdot > 0 && qdot²·tden2 >= tnum2·a2·b2` (i.e. cosine >= tnum/tden on
    * the quantized vectors, with tnum2 = tnum², tden2 = tden²
    * precomputed). a2/b2 are squared norms, hence non-negative. */
  def cosinePasses(qdot: Long, a2: Long, b2: Long,
                   tnum2: Long, tden2: Long): Boolean =
    qdot > 0L && cmpProd3(qdot, qdot, tden2, tnum2, a2, b2) >= 0

  /** Exact integer dot product of two equal-length quantized vectors —
    * the per-PAIR kernel of every embedding join (callers guarantee equal
    * lengths; [[QuantizedDotExpr]] null-guards the mismatch case). A tight
    * primitive loop over `ArrayData`: the `aggregate(zip_with(...))`
    * formulation it replaces allocated an intermediate array and
    * interpreted two lambdas per evaluation — measured 530 ns/pair across
    * the 160M-pair sf4 SemDeDup join, the dominant cost once the tiled
    * join bounded the plan. */
  def quantizedDot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Squared-L2 argmin over an inlined centroid matrix — the IVF/k-means
    * assignment kernel ([[CentroidArgminExpr]]): returns the cid of the
    * nearest centroid, ties to the LOWEST cid (cids arrive sorted
    * ascending; strict `<` keeps the first minimum — exactly the
    * `array_sort` (dist², cid) tie-break of the HOF ranking form this
    * replaces, pinned by VectorExprSpec). Runs per corpus row per scan
    * (and per Lloyd iteration in k-means), where the interpreted
    * `array_sort(transform(...))` chain allocated nlist structs per row. */
  def centroidArgmin(v: ArrayData, cents: Array[Array[Long]],
                     cids: Array[Long]): Long = {
    var best = 0
    var bestD = Long.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var d = 0L
      var j = 0
      val m = math.min(c.length, v.numElements())
      while (j < m) {
        val t = v.getLong(j) - c(j)
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    cids(best)
  }

  /** Gaussian-plane SRP bucket over a raw (`array<float>`) embedding. */
  def srpBucket(v: ArrayData, planes: Array[Array[Double]]): Long = {
    if (v == null) return 0L
    val n = v.numElements()
    var bucket = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var acc = 0.0
      var j = 0
      val m = math.min(p.length, n)
      while (j < m) { acc += v.getFloat(j).toDouble * p(j); j += 1 }
      if (acc >= 0.0) bucket |= (1L << i)
      i += 1
    }
    bucket
  }
}
