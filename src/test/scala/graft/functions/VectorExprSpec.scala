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

  test("native quantized_dot matches the HOF form on random, null, and " +
      "length-mismatched inputs (value AND null semantics)") {
    val rnd = new scala.util.Random(29)
    val rows = (0L until 200L).map { i =>
      val len = if (i % 17 == 0) 8 else 16 // planted length mismatches
      (i, if (i % 23 == 0) null
          else Seq.fill(len)(rnd.nextInt(2001).toLong - 1000L))
    }
    val df = rows.toDF("id", "qa")
      .withColumn("qb", expr("transform(qa, x -> x + id % 7)"))
    // cross pair a few rows so mismatched lengths actually meet
    val a = df.select(col("id").as("ida"), col("qa"))
    val b = df.limit(20).select(col("id").as("idb"), col("qb"))
    val both = a.crossJoin(b).select(
        VectorFns.quantizedDot(col("qa"), col("qb")).as("native"),
        VectorFns.quantizedDotHof(col("qa"), col("qb")).as("hof"))
      .as[(Option[Long], Option[Long])].collect()
    both.foreach { case (n, h) => assert(n == h, s"native $n != hof $h") }
    assert(both.exists(_._1.isEmpty) && both.exists(_._1.nonEmpty))
  }

  test("native centroid_argmin matches the HOF ranking's element 1 on every row, " +
      "including planted dist ties (lowest-cid tie-break)") {
    val rnd = new scala.util.Random(31)
    // centroids drawn FROM the corpus rows -> guaranteed exact-distance
    // ties (a row vs its own centroid) plus duplicate rows for multi-way
    // ties between equal centroids at different cids
    val base = (0L until 120L).map(i =>
      (i, Seq.fill(12)(rnd.nextInt(21).toLong - 10L)))
    val rows = base ++ base.take(15).map { case (i, v) => (i + 1000L, v) }
    val df = rows.toDF("id", "qv")
    val cents = (base.take(6) ++ base.take(3)).zipWithIndex.map {
      case ((_, v), ci) => (ci.toLong, v.toArray)
    }
    val got = df.select(col("id"),
        graft.operators.Similarity.centroidArgmin(cents)(col("qv")).as("native"),
        element_at(graft.operators.Similarity.centroidRanking(cents)(col("qv")), 1)
          .getField("cid").as("hof"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, n, h) => assert(n == h, s"row $id: native $n != hof $h") }
    assert(got.map(_._2).distinct.length > 1)
  }

  test("cmpProd3 matches BigInt arithmetic on random and extreme operands") {
    def ref(a: Long, b: Long, c: Long, d: Long, e: Long, f: Long): Int =
      (BigInt(a) * b * c).compare(BigInt(d) * e * f)
    val rnd = new scala.util.Random(7)
    // magnitudes spanning the full non-negative range, incl. 0 and MaxValue
    def draw(): Long = rnd.nextInt(5) match {
      case 0 => rnd.nextInt(4).toLong                  // tiny (0..3)
      case 1 => rnd.nextInt(1 << 20).toLong            // small
      case 2 => (rnd.nextLong() >>> 1) % (1L << 40)    // mid
      case 3 => rnd.nextLong() >>> 1                   // huge (63-bit)
      case _ => Long.MaxValue
    }
    (1 to 20000).foreach { i =>
      val (a, b, c, d, e, f) = (draw(), draw(), draw(), draw(), draw(), draw())
      val got = Integer.signum(VectorKernel.cmpProd3(a, b, c, d, e, f))
      assert(got == ref(a, b, c, d, e, f),
        s"iter $i: cmpProd3($a,$b,$c, $d,$e,$f) = $got != BigInt ${ref(a, b, c, d, e, f)}")
    }
    // exact-equality paths (the >= boundary q44 depends on)
    assert(VectorKernel.cmpProd3(6, 10, 14, 14, 10, 6) == 0)
    assert(VectorKernel.cmpProd3(Long.MaxValue, Long.MaxValue, Long.MaxValue,
      Long.MaxValue, Long.MaxValue, Long.MaxValue) == 0)
  }

  test("native cosine_ge matches the BigInt UDF on candidate scalars and is UDF-free") {
    val rnd = new scala.util.Random(99)
    val rows = (1 to 2000).map { i =>
      // qdot may be negative (rejected); norms non-negative, span wide magnitudes
      val qdot = rnd.nextLong() % (1L << (4 + rnd.nextInt(58)))
      val a2 = (rnd.nextLong() >>> 1) % (1L << (4 + rnd.nextInt(59)))
      val b2 = (rnd.nextLong() >>> 1) % (1L << (4 + rnd.nextInt(59)))
      (i.toLong, qdot, a2, b2)
    }
    val df = rows.toDF("id", "qdot", "a2", "b2").repartition(2)
    val (tn, td) = (3L, 10L)
    val bigintRef = udf { (qdot: Long, a2: Long, b2: Long) =>
      qdot > 0 && BigInt(qdot) * qdot * (td * td) >= BigInt(tn) * tn * a2 * b2
    }
    import org.apache.spark.sql.graft.ExprBridge
    val nativeCol = ExprBridge.column(CosineThresholdExpr(
      ExprBridge.expression(col("qdot")), ExprBridge.expression(col("a2")),
      ExprBridge.expression(col("b2")), tn, td))
    val out = df.select(col("id"), nativeCol.as("native"),
      bigintRef(col("qdot"), col("a2"), col("b2")).as("ref"))
    out.as[(Long, Boolean, Boolean)].collect().foreach { case (id, n, r) =>
      assert(n == r, s"row $id: native $n != BigInt $r")
    }
    val plan = df.select(nativeCol).queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("), s"UDF in cosine_ge projection:\n$plan")
    assert(plan.contains("cosine_ge"), s"native kernel absent:\n$plan")
  }

  test("q43/q44 bucket paths execute with NO UDF (whole-stage codegen kernels)") {
    // the candidate-generation scan must not cross a UDF boundary —
    // incl. the threshold test, native since round 7 (CosineThresholdExpr)
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
