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
