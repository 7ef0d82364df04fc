package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  // counts by construction: a=8, b=4, c=2, d=1
  private val corpus = Seq(
    (1L, "a a a a b b"), (2L, "a a a a b b c"), (3L, "c d")
  ).toDF("doc_id", "text")

  test("tokenFrequencies: counts and total-order ranks") {
    val got = CorpusStats.tokenFrequencies(corpus, "text", topN = 3)
      .select("tok", "cnt", "rank").as[(String, Long, Int)]
      .collect().toSeq.sortBy(_._3)
    assert(got == Seq(("a", 8L, 1), ("b", 4L, 2), ("c", 2L, 3)))
  }

  test("zipfStats: slope matches the closed-form integer regression") {
    // replicate the operator's fixed-point arithmetic exactly
    val pts = Seq((1, 8L), (2, 4L), (3, 2L), (4, 1L)).map { case (r, c) =>
      (math.round(math.log(r.toDouble) * 1e4),
        math.round(math.log(c.toDouble) * 1e4)) }
    val n = pts.size.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val expect = BigDecimal((n * sxy - sx * sy).toDouble /
      (n * sxx - sx * sx).toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    val got = CorpusStats.zipfStats(corpus, "text", topN = 100)
      .select("n_tokens", "vocab", "top1_cnt", "zipf_slope")
      .as[(Long, Long, Long, Double)].collect().head
    assert(got._1 == 15L && got._2 == 4L && got._3 == 8L)
    assert(math.abs(got._4 - expect) < 1e-9, s"slope ${got._4} vs $expect")
    // the constructed corpus halves each rank step: slope ~ -1.5 on ln-ln
    assert(got._4 < -1.0 && got._4 > -2.0)
  }

  test("tfidfTopK: corpus-wide tokens score zero, distinctive tokens win") {
    val df = Seq(
      (1L, "shared shared quantum"), // 'quantum' only in doc 1
      (2L, "shared recipe recipe"),  // 'recipe' only in doc 2
      (3L, "shared plain")
    ).toDF("doc_id", "text")
    val got = CorpusStats.tfidfTopK(spark, df, "doc_id", "text", k = 1)
      .select("doc_id", "tok", "score_i").as[(Long, String, Long)]
      .collect().toSeq.sortBy(_._1)
    // 'shared' appears in all 3 docs: idf = ln(4/4) = 0 -> score 0; the
    // doc-unique tokens carry tf * ln(4/2) > 0
    assert(got.map(t => (t._1, t._2)) ==
      Seq((1L, "quantum"), (2L, "recipe"), (3L, "plain")))
    assert(got.forall(_._3 > 0L))
    val full = CorpusStats.tfidfTopK(spark, df, "doc_id", "text", k = 10)
      .filter(col("tok") === "shared").select("score_i")
      .as[Long].collect().toSeq
    assert(full == Seq(0L, 0L, 0L))
  }

  test("tfidfTopK: k bounds the per-doc rows with (score desc, tok) order") {
    // two docs so idf > 0 for doc-1's tokens (a single-doc corpus has
    // idf = ln(2/2) = 0 everywhere and ranks alphabetically)
    val df = Seq((1L, "x x y z"), (2L, "other other")).toDF("doc_id", "text")
    val got = CorpusStats.tfidfTopK(spark, df, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L)
      .select("tok").as[String].collect().toSeq.sorted
    assert(got == Seq("x", "y")) // tf 2 wins; y-vs-z tie broken by tok
  }
}
