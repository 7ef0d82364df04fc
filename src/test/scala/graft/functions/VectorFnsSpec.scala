package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  test("dot / l2Norm / cosine match hand-computed values") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 1.0f))).toDF("a", "b")
      .select(
        VectorFns.dot(col("a"), col("b")).as("dot"),
        VectorFns.l2Norm(col("a")).as("na"),
        VectorFns.cosine(col("a"), col("b")).as("cos"))
    val r = df.collect().head
    assert(math.abs(r.getDouble(0) - 4.0) < eps)
    assert(math.abs(r.getDouble(1) - 3.0) < eps)
    assert(math.abs(r.getDouble(2) - 4.0 / (3.0 * math.sqrt(5.0))) < eps)
  }

  test("cosine of zero vector is null, identical vectors is 1") {
    val df = Seq(
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f)),
      (Seq(3.0f, 4.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .select(VectorFns.cosine(col("a"), col("b")).as("c"))
    val got = df.as[Option[Double]].collect().toSeq
    assert(got.head.isEmpty)
    assert(math.abs(got(1).get - 1.0) < eps)
  }

  test("quantize + quantizedDot: exact integer arithmetic") {
    val df = Seq((Seq(0.5f, -0.25f), Seq(1.0f, 1.0f))).toDF("a", "b")
      .select(VectorFns.quantizedDot(
        VectorFns.quantize(col("a")), VectorFns.quantize(col("b"))).as("d"))
    assert(df.as[Long].head() == 5000L * 10000L + (-2500L) * 10000L)
  }

  test("srpBucket: deterministic, equal vectors share a bucket") {
    val planes = graft.operators.Similarity.hyperplanes(4, 6)
    val df = Seq(
      Seq(1.0f, 2.0f, 3.0f, 4.0f),
      Seq(1.0f, 2.0f, 3.0f, 4.0f),
      Seq(-1.0f, -2.0f, -3.0f, -4.0f)).toDF("v")
      .select(VectorFns.srpBucket(col("v"), planes).as("b"))
    val bs = df.as[Long].collect().toSeq
    assert(bs(0) == bs(1))
    assert(bs(0) != bs(2)) // antipodal vector flips every sign bit
    assert(bs.forall(b => b >= 0 && b < 64))
  }
}
