package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(13)
    (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
  }
  private lazy val corpus = vecs.toDF("vec_id", "embedding")

  test("native srp_bucket_int matches the UDF kernel on every row") {
    val planes = Similarity.rademacherPlanes(16, 7, 42L)
    val q = VectorFns.quantize(col("embedding"), 1000)
    val both = corpus.select(col("vec_id"),
        VectorFns.srpBucketInt(q, planes).as("native"),
        VectorFns.srpBucketIntUdf(q, planes).as("viaUdf"))
      .as[(Long, Long, Long)].collect()
    both.foreach { case (id, n, u) => assert(n == u, s"vec $id: $n != $u") }
    // buckets actually spread (not a degenerate all-zero kernel)
    assert(both.map(_._2).distinct.length > 16)
  }

  test("native srp_bucket (Gaussian) matches the UDF kernel on every row") {
    val planes = Similarity.hyperplanes(16, 7, 42L)
    val both = corpus.select(col("vec_id"),
        VectorFns.srpBucket(col("embedding"), planes).as("native"),
        VectorFns.srpBucketUdf(col("embedding"), planes).as("viaUdf"))
      .as[(Long, Long, Long)].collect()
    both.foreach { case (id, n, u) => assert(n == u, s"vec $id: $n != $u") }
    assert(both.map(_._2).distinct.length > 16)
  }

  test("null vector buckets to 0 (UDF-parity), and the expression is non-nullable") {
    val withNull = Seq((1L, Option(Seq(1.0f, 2.0f))), (2L, Option.empty[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val planes = Similarity.hyperplanes(2, 3, 7L)
    val got = withNull.select(col("vec_id"),
        VectorFns.srpBucket(col("embedding"), planes).as("b"))
      .orderBy("vec_id").as[(Long, Long)].collect()
    assert(got(1)._2 == 0L)
    val planesI = Similarity.rademacherPlanes(2, 3, 7L)
    val gotI = withNull.select(col("vec_id"),
        VectorFns.srpBucketInt(VectorFns.quantize(col("embedding"), 10), planesI).as("b"))
      .orderBy("vec_id").as[(Long, Long)].collect()
    assert(gotI(1)._2 == 0L)
  }

  test("q43/q44 bucket paths execute with NO UDF (whole-stage codegen kernels)") {
    // the candidate-generation scan must not cross a UDF boundary; the
    // only allowed UDF in the near-dup family is the BigInt threshold
    // test, which runs post-blocking on candidates (q44) — assert the
    // bucket projection alone is UDF-free
    val planes = Similarity.rademacherPlanes(16, 7, 42L)
    // repartition blocks ConvertToLocalRelation from evaluating the whole
    // projection at plan time (a LocalTableScan would hide the kernel)
    val df = corpus.repartition(2).select(
      VectorFns.srpBucketInt(VectorFns.quantize(col("embedding"), 1000), planes).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("), s"UDF in the bucket projection:\n$plan")
    assert(plan.contains("srp_bucket_int"), s"native kernel absent:\n$plan")
  }
}
