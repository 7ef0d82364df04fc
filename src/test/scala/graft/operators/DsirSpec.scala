package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target domain: legal-ish vocabulary; raw corpus mixes two target-like
  // docs, two off-domain docs, and an empty one
  private val target = Seq(
    (100L, "the court finds the defendant liable under the statute"),
    (101L, "the statute provides the court with discretion over the remedy"),
    (102L, "the defendant appeals the judgment of the court")
  ).toDF("doc_id", "text")
  private val raw = Seq(
    (1L, "the court denied the motion because the statute controls"),
    (2L, "the defendant moved the court for summary judgment"),
    (3L, "chocolate cake recipe with extra butter and sugar frosting"),
    (4L, "win free coins click here spin the wheel jackpot bonus"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("featureBuckets: unigrams + bigrams, guarded for short docs") {
    val df = Seq((1L, "a b c"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val n = df.select(col("doc_id"),
        size(Dsir.featureBuckets(col("text"), bits = 10, seed = "s")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(n == Map(1L -> 5, 2L -> 1, 3L -> 0)) // 3 uni + 2 bi; 1 uni; none
  }

  test("importanceWeights: target-like docs outscore off-domain docs; " +
      "empty doc omitted") {
    val got = Dsir.importanceWeights(raw, target, "doc_id", "text",
        bits = 10, seed = "t")
      .select("doc_id", "w").as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(Seq(1L, 2L).map(got).min > Seq(3L, 4L).map(got).max,
      s"legal docs must outscore cake/spam: $got")
  }

  test("lambdaDense (one-job kernel, r17) == lambdaTable frame") {
    // the r17 optimization collects dense per-partition bucket counts
    // straight to the driver and computes lambda locally; this pins
    // bit-identity against the SQL frame it replaced (same ln, same
    // HALF_UP quantization), absent-from-both buckets staying 0
    val bits = 6
    val fromFrame = new Array[Long](1 << bits)
    Dsir.lambdaTable(raw, target, "text", bits, "dsir-test")
      .collect().foreach { r => fromFrame(r.getLong(0).toInt) = r.getLong(1) }
    val dense = Dsir.lambdaDenseForTest(raw, target, "text", bits, "dsir-test")
    assert(dense.toSeq == fromFrame.toSeq)
  }

  test("weights are a pure function of content — partitioning-independent") {
    val a = Dsir.importanceWeights(raw, target, "doc_id", "text", bits = 10)
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceWeights(raw.repartition(7), target.repartition(3),
        "doc_id", "text", bits = 10)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("resample: exactly k rows, the top-k of score with id tie-break, " +
      "and score = w + round(gumbel, 6)") {
    val all = Dsir.importanceWeights(raw, target, "doc_id", "text",
        bits = 10, seed = "t")
      .select("doc_id", "w", "gumbel", "score")
      .as[(Long, Double, Double, Double)].collect().toSeq
    all.foreach { case (_, w, g, s) =>
      assert(math.abs(s - BigDecimal(w + g).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6) }
    val expect = all.sortBy(r => (-r._4, r._1)).take(2).map(_._1).toSet
    val got = Dsir.resample(raw, target, "doc_id", "text", k = 2,
        bits = 10, seed = "t")
      .select("doc_id").as[Long].collect().toSet
    assert(got == expect)
  }
}
