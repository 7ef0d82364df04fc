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

  /** Exact integer dot product over quantized vectors. */
  def quantizedDot(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Sign-random-projection (SimHash-for-vectors) bucket id: for each
    * hyperplane (a deterministic pseudo-random +-1 pattern derived from
    * xxhash64 of (seed, element index)), emit the sign bit of the projection;
    * pack bits into a long. `planes` deterministic vectors are supplied by
    * the caller (see operators.Similarity.hyperplanes). */
  def srpBucket(vec: Column, planes: Seq[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val proj = aggregate(
        zip_with(vec, typedLit(plane.toSeq), (x, p) => x.cast("double") * p),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }
}
