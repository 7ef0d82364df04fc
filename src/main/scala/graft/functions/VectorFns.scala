package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, as pure Catalyst
  * expressions (`zip_with`/`aggregate`/`transform`) — no UDF, no MLlib Vector
  * conversion, codegen-friendly, so a 100 TB embedding scan never leaves
  * whole-stage codegen.
  */
object VectorFns {

  /** Dot product of two equal-length float arrays (double accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity; null when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na > 0 && nb > 0, dot(a, b) / (na * nb)).otherwise(lit(null))
  }

  /** Integer-quantized embedding (round(x * scale)) — used when an exact,
    * platform-portable similarity ranking is needed (integer arithmetic is
    * associative; float sums are not). */
  def quantize(a: Column, scale: Int = 10000): Column =
    transform(a, v => round(v.cast("double") * scale).cast("long"))

  /** Exact integer dot product over quantized vectors. Backed by the
    * NATIVE [[QuantizedDotExpr]] since round 9: this is the per-PAIR
    * kernel of every embedding join, and the previous
    * `aggregate(zip_with(...))` form was interpreted (higher-order
    * functions never codegen) and allocated the zipped array per
    * evaluation — measured 530 ns/pair across the sf4 SemDeDup 160M-pair
    * join. Identical null/value semantics (VectorExprSpec pins native ==
    * HOF on random, null, and length-mismatched inputs). */
  def quantizedDot(qa: Column, qb: Column): Column =
    org.apache.spark.sql.graft.ExprBridge.column(
      QuantizedDotExpr(
        org.apache.spark.sql.graft.ExprBridge.expression(qa),
        org.apache.spark.sql.graft.ExprBridge.expression(qb)))

  /** HOF form of [[quantizedDot]] — kept ONLY as the independent
    * implementation VectorExprSpec checks the native expression against. */
  private[graft] def quantizedDotHof(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Integer SRP bucket over a QUANTIZED (`array<long>`) embedding with
    * ±1 Rademacher hyperplanes: bucket bit i = sign of Σ_j plane_ij * q_j.
    * All-integer, so the bucket assignment is exactly reproducible by any
    * engine given the same constants (the DuckDB oracle replays it
    * bit-for-bit) — no float summation-order hazard at the sign boundary.
    * Rademacher projections preserve the SRP cosine-collision property
    * (random ±1 rows are an isotropic-enough projection family).
    * Backed by the NATIVE [[SrpBucketIntExpr]] since round 6 — the bucket
    * assignment runs per row × per seed on every similarity corpus scan,
    * and the previous UDF kernel paid the encoder boundary each time. */
  def srpBucketInt(vec: Column, planes: Seq[Array[Int]]): Column =
    org.apache.spark.sql.graft.ExprBridge.column(
      SrpBucketIntExpr(
        org.apache.spark.sql.graft.ExprBridge.expression(vec),
        planes.toArray))

  /** UDF form of [[srpBucketInt]] — kept ONLY as the independent
    * implementation VectorExprSpec checks the native expression against. */
  private[graft] def srpBucketIntUdf(vec: Column, planes: Seq[Array[Int]]): Column = {
    val ps = planes.toArray
    val kernel = udf { (v: Array[Long]) =>
      if (v == null) 0L
      else {
        var bucket = 0L
        var i = 0
        while (i < ps.length) {
          val p = ps(i)
          var acc = 0L
          var j = 0
          val m = math.min(p.length, v.length)
          while (j < m) { acc += v(j) * p(j); j += 1 }
          if (acc >= 0) bucket |= (1L << i)
          i += 1
        }
        bucket
      }
    }
    kernel(vec)
  }

  /** Sign-random-projection (SimHash-for-vectors) bucket id: for each
    * deterministic Gaussian hyperplane, emit the sign bit of the
    * projection; pack bits into a long. `planes` are supplied by the
    * caller (see operators.Similarity.hyperplanes). Backed by the NATIVE
    * [[SrpBucketExpr]] (the zip_with/aggregate expression-chain
    * formulation is CodegenFallback — interpreted, ~10x slower per row —
    * and a ScalaUDF pays the encoder boundary; the native kernel does
    * neither). */
  def srpBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    org.apache.spark.sql.graft.ExprBridge.column(
      SrpBucketExpr(
        org.apache.spark.sql.graft.ExprBridge.expression(vec),
        planes.toArray))

  /** UDF form of [[srpBucket]] — kept ONLY for VectorExprSpec parity. */
  private[graft] def srpBucketUdf(vec: Column, planes: Seq[Array[Double]]): Column = {
    val ps = planes.toArray
    val kernel = udf { (v: Array[Float]) =>
      if (v == null) 0L
      else {
        var bucket = 0L
        var i = 0
        while (i < ps.length) {
          val p = ps(i)
          var acc = 0.0
          var j = 0
          val m = math.min(p.length, v.length)
          while (j < m) { acc += v(j).toDouble * p(j); j += 1 }
          if (acc >= 0) bucket |= (1L << i)
          i += 1
        }
        bucket
      }
    }
    kernel(vec)
  }
}
