package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("embedCovariance: exact integer moments on a hand corpus, " +
      "partitioning-independent") {
    // 3 vectors of dim 2, scale 10 => q = (10x). cov_num = n*sij - si*sj
    val df = vecs((1L, Seq(1.0f, 2.0f)), (2L, Seq(2.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)))
    val got = Pca.embedCovariance(df, "embedding", scale = 10)
      .select("i", "j", "n", "si", "sj", "sij", "cov_num")
      .as[(Int, Int, Long, Long, Long, Long, Long)].collect().toSeq
    // q1=(10,20) q2=(20,0) q3=(0,10): s=(30,30)
    // s11=100+400+0=500, s12=200+0+0=200, s22=400+0+100=500
    val expect = Seq(
      (1, 1, 3L, 30L, 30L, 500L, 3 * 500L - 900L),
      (1, 2, 3L, 30L, 30L, 200L, 3 * 200L - 900L),
      (2, 2, 3L, 30L, 30L, 500L, 3 * 500L - 900L))
    assert(got == expect)
    val rep = Pca.embedCovariance(df.repartition(7), "embedding", scale = 10)
      .select("i", "j", "n", "si", "sj", "sij", "cov_num")
      .as[(Int, Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rep == expect, "covariance must be partitioning-independent")
  }

  test("covMomentRows (one-job kernel, r17) == embedCovariance frame, " +
      "ragged + null + empty edge cases included") {
    // the r17 optimization collects dense triangular partials straight
    // to the driver (one job, zero exchanges) for train(); this pins
    // bit-identity against the q115-oracled DataFrame it replaced
    val df = vecs((1L, Seq(1.0f, 2.0f)), (2L, Seq(2.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)))
    val frame = Pca.embedCovariance(df, "embedding", scale = 10)
      .select("i", "j", "n", "si", "sj", "sij", "cov_num")
      .as[(Int, Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(Pca.covMomentRows(df, "embedding", scale = 10) == frame)
    // ragged corpus: kernel and frame must agree on the partial pair set
    // (that agreement is what lets train()'s ragged guard fire the same)
    val ragged = vecs((1L, Seq(1.0f, 2.0f, 3.0f)), (2L, Seq(2.0f)))
    val fr = Pca.embedCovariance(ragged, "embedding", scale = 10)
      .select("i", "j", "n", "si", "sj", "sij", "cov_num")
      .as[(Int, Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(Pca.covMomentRows(ragged, "embedding", scale = 10) == fr)
    // null vector contributes nothing, like posexplode-drop
    val withNull = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, None))
      .toDF("vec_id", "embedding")
    val fn = Pca.embedCovariance(withNull, "embedding", scale = 10)
      .select("i", "j", "n", "si", "sj", "sij", "cov_num")
      .as[(Int, Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(Pca.covMomentRows(withNull, "embedding", scale = 10) == fn)
    assert(Pca.covMomentRows(vecs(), "embedding", scale = 10).isEmpty)
  }

  test("jacobiEigen: eigenvectors orthonormal, residual ~0, trace kept") {
    val rnd = new scala.util.Random(7)
    val d = 12
    val m = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextGaussian(); m(i)(j) = x; m(j)(i) = x
    }
    val (vals, vecs) = Pca.jacobiEigen(m)
    // orthonormal columns
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(k => vecs(k)(a) * vecs(k)(b)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"col $a . col $b = $dot")
    }
    // residual ||M v - lambda v||
    for (k <- 0 until d) {
      val mv = (0 until d).map(i => (0 until d).map(j => m(i)(j) * vecs(j)(k)).sum)
      val res = math.sqrt((0 until d)
        .map(i => math.pow(mv(i) - vals(k) * vecs(i)(k), 2)).sum)
      assert(res < 1e-9, s"eigenpair $k residual $res")
    }
    assert(math.abs(vals.sum - (0 until d).map(i => m(i)(i)).sum) < 1e-9,
      "similarity transform must preserve the trace")
  }

  test("train: eigenvalues descending; per-component projected variance " +
      "matches its eigenvalue; components decorrelated") {
    val rnd = new scala.util.Random(19)
    // anisotropic cloud: coordinate k has stddev ~ 1/(k+1)
    val dim = 6
    val df = vecs((1 to 400).map(i => (i.toLong,
      Seq.tabulate(dim)(k => (rnd.nextGaussian() / (k + 1)).toFloat))): _*)
    val model = Pca.train(df, "embedding", dim = dim, p = dim, scale = 1000)
    assert(model.eigenvalues.toSeq == model.eigenvalues.sortBy(-_).toSeq)
    // the full basis captures the whole trace; the share is monotone
    assert(math.abs(model.varianceShare(dim) - 1.0) < 1e-9)
    assert((1 until dim).forall(k =>
      model.varianceShare(k) <= model.varianceShare(k + 1)))
    val proj = Pca.projectInt(df, "vec_id", "embedding", model)
      .drop("vec_id").collect().map(r => Array.tabulate(dim)(r.getLong))
    val n = proj.length.toDouble
    for (k <- 0 until dim) {
      // de-quantize: pc is in (scale * eigQuant) units
      val xs = proj.map(_(k).toDouble / (model.scale * model.eigQuant))
      val mean = xs.sum / n
      val v = xs.map(x => (x - mean) * (x - mean)).sum / n
      val lambda = model.eigenvalues(k) / (model.scale.toDouble * model.scale)
      assert(math.abs(v - lambda) < math.max(1e-9, lambda * 1e-3),
        s"component $k variance $v != eigenvalue $lambda")
    }
    // decorrelated: off-diagonal covariance of projections ~ 0
    for (a <- 0 until dim; b <- a + 1 until dim) {
      val xa = proj.map(_(a).toDouble / (model.scale * model.eigQuant))
      val xb = proj.map(_(b).toDouble / (model.scale * model.eigQuant))
      val (ma, mb) = (xa.sum / n, xb.sum / n)
      val cov = xa.zip(xb).map { case (x, y) => (x - ma) * (y - mb) }.sum / n
      val bound = math.sqrt(
        model.eigenvalues(a) * model.eigenvalues(b)) /
        (model.scale.toDouble * model.scale)
      assert(math.abs(cov) < math.max(1e-9, bound * 5e-3),
        s"components $a,$b correlate: $cov")
    }
  }

  test("withProjection composes with semDedup: near-dups whose noise " +
      "lives in LOW-VARIANCE dims survive the top-8 reduction exactly") {
    val rnd = new scala.util.Random(29)
    val dim = 16
    // signal lives in dims 0-7 (unit variance, effective dimension high
    // enough that random-pair cosine stays far below the threshold);
    // dims 8-15 carry only tiny corpus noise, so the top-8 PCA basis is
    // the signal subspace
    def baseVec() = Seq.tabulate(dim)(k =>
      (if (k < 8) rnd.nextGaussian() else 0.05 * rnd.nextGaussian()).toFloat)
    val bases = (1 to 60).map(i => (i.toLong * 10, baseVec()))
    // planted near-dups: copy + noise ONLY in the low-variance dims —
    // full-dim cosine ~0.9999, and the top-8 projection annihilates the
    // perturbation almost entirely
    val dups = bases.take(20).map { case (id, v) =>
      (id + 1, v.zipWithIndex.map { case (x, k) =>
        if (k >= 8) x + 0.02f * rnd.nextGaussian().toFloat else x })
    }
    val df = vecs((bases ++ dups): _*)
    def flagged(dd: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      dd.filter(!col("kept")).select("vec_id", "dup_of")
        .as[(Long, Long)].collect().toMap
    val full = flagged(Similarity.semDedup(df, "vec_id", "embedding",
      nCentroids = 1, thresholdNum = 97, thresholdDen = 100))
    val model = Pca.train(df, "embedding", dim = dim, p = 8, scale = 1000)
    // the reduction-soundness precondition the r14 A/B documents: the
    // top-8 share must justify reducing to 8 (here ~0.998 by fixture)
    assert(model.varianceShare(8) > 0.97,
      s"fixture: top-8 share ${model.varianceShare(8)}")
    val proj = flagged(Similarity.semDedup(
      Pca.withProjection(df, "embedding", model, "pca_vec"),
      "vec_id", "pca_vec",
      nCentroids = 1, thresholdNum = 97, thresholdDen = 100))
    // every planted pair flagged in BOTH spaces, with the planted mate,
    // and nothing else
    val want = dups.map(d => d._1 -> (d._1 - 1)).toMap
    assert(full == want, s"full-dim semDedup: got $full")
    assert(proj == want, s"PCA-8 semDedup: got $proj")
  }

  test("train fails LOUDLY on ragged/short vectors (a skewed covariance " +
      "would silently corrupt every downstream reduction) and on a " +
      "column that covers fewer coordinates than dim") {
    // one short vector among dim-4: coordinate 4's count < corpus count
    val ragged = vecs((1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(5f, 6f, 7f)),
      (3L, Seq(8f, 9f, 10f, 11f)))
    val e = intercept[IllegalArgumentException] {
      Pca.train(ragged, "embedding", dim = 4, p = 2, scale = 10)
    }
    assert(e.getMessage.contains("ragged"), e.getMessage)
    // uniformly short vectors: no ragged mismatch, but dim coverage fails
    val short = vecs((1L, Seq(1f, 2f)), (2L, Seq(3f, 4f)))
    val e2 = intercept[IllegalArgumentException] {
      Pca.train(short, "embedding", dim = 3, p = 2, scale = 10)
    }
    assert(e2.getMessage.contains("covers"), e2.getMessage)
  }

  test("varianceShare reports 0 (precondition FAILS) on a degenerate " +
      "zero-variance corpus — the spectrum carries no information to " +
      "justify reducing on (r14 ADVICE)") {
    val df = vecs((1 to 10).map(i => (i.toLong, Seq(0.5f, 0.5f, 0.5f))): _*)
    val model = Pca.train(df, "embedding", dim = 3, p = 2, scale = 1000)
    assert(model.traceVar <= 1e-12, s"fixture: traceVar ${model.traceVar}")
    assert(model.varianceShare(2) == 0.0,
      "a constant corpus must FAIL the share gate, never pass it as 1.0")
  }

  test("train: deterministic across runs and partitionings; projection " +
      "plan is zero-shuffle") {
    val rnd = new scala.util.Random(23)
    val df = vecs((1 to 100).map(i => (i.toLong,
      Seq.fill(8)(rnd.nextGaussian().toFloat))): _*)
    val m1 = Pca.train(df, "embedding", dim = 8, p = 3, scale = 1000)
    val m2 = Pca.train(df.repartition(13), "embedding", dim = 8, p = 3,
      scale = 1000)
    assert(m1.planes.map(_.toSeq) == m2.planes.map(_.toSeq),
      "trained planes must not depend on partitioning")
    assert(m1.sums.toSeq == m2.sums.toSeq && m1.n == m2.n)
    val plan = Pca.projectInt(df, "vec_id", "embedding", m1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"projection must be a zero-shuffle scan:\n$plan")
    // sign convention: each plane's largest-|coordinate| entry positive
    m1.planes.foreach { pl =>
      val m = pl.indices.maxBy(j => (math.abs(pl(j).toDouble), -j))
      assert(pl(m) > 0, s"sign convention violated: ${pl.toSeq}")
    }
  }
}
