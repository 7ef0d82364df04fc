package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(text: String): (Long, Long, Long, Long, Long, Long,
      Long, Long, Long, Long) =
    Seq((1L, text)).toDF("doc_id", "text")
      .select(TextFns.repetitionStats(col("text")).as("r"))
      .select("r.n_words", "r.n_word_chars", "r.top2_cnt", "r.top2_chars",
        "r.top3_cnt", "r.top3_chars", "r.top4_cnt", "r.top4_chars",
        "r.dup5_chars", "r.dup10_chars")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .head()

  test("repetitionStats: hand-checked n-gram coverage on 'a b a b a'") {
    // 2-grams: 'a b'x2, 'b a'x2 -> top cnt 2, chars('a b')=3 -> cov 6
    // 3-grams: 'a b a'x2, 'b a b'x1 -> top cnt 2, cov 2*5=10
    // 4-grams: both singletons -> top cnt 1, cov 7
    // 5-grams: one window -> dup 0
    assert(statsOf("a b a b a") ==
      ((5L, 5L, 2L, 6L, 2L, 10L, 1L, 7L, 0L, 0L)))
  }

  test("repetitionStats: duplicated 5-gram and 10-gram coverage") {
    // 'x y z w v' repeats as a 5-gram (windows 1 and 6) -> dup5 = 2*9
    val t5 = statsOf("x y z w v x y z w v")
    assert(t5._9 == 18L, s"dup5: $t5")
    assert(t5._10 == 0L) // the single 10-gram window is unique
    // a verbatim 10-word repeat -> dup10 = 2 * chars('a b .. j') = 2*19
    val t10 = statsOf("a b c d e f g h i j a b c d e f g h i j")
    assert(t10._10 == 38L, s"dup10: $t10")
    // six 5-grams repeat across the two halves ('a b c d e' .. 'f g h i j')
    assert(t10._9 == 6L * 2L * 9L, s"dup5 (six dup 5-grams): $t10")
  }

  test("repetitionStats: code-point char counting (multibyte), casefold " +
      "through tokens(), short/empty/null inputs") {
    // tokens are lowercased; chars count CODE POINTS not UTF-16 units
    val m = statsOf("日本 語 日本 語")
    assert(m._1 == 4L && m._2 == 6L, s"$m")       // 2+1+2+1 code points
    assert(m._3 == 2L && m._4 == 8L, s"$m")       // '日本 語' x2, 4 cp each
    val upper = statsOf("AB ab AB")
    assert(upper._3 == 2L, s"'ab ab' must count as a repeat: $upper")
    assert(statsOf("one") == ((1L, 3L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(statsOf("") == ((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
    val n = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(TextFns.repetitionStats(col("text")).as("r"))
      .select("r.n_words").as[Long].head()
    assert(n == 0L)
  }

  test("charEntropy: hand-checked terms, code-point counting (emoji), " +
      "degenerate/uniform/empty/null cases") {
    def eOf(text: String): (Long, Long, Long) =
      Seq((1L, text)).toDF("doc_id", "text")
        .select(TextFns.charEntropy(col("text")).as("e"))
        .select("e.n_chars", "e.n_distinct", "e.entropy_q6")
        .as[(Long, Long, Long)].head()
    def term(k: Long, n: Long): Long =
      math.floor(k.toDouble * (java.lang.StrictMath.log(n.toDouble)
        - java.lang.StrictMath.log(k.toDouble)) / n.toDouble * 1e6 + 0.5).toLong
    // "aab": a=2, b=1, n=3
    assert(eOf("aab") == ((3L, 2L, term(2, 3) + term(1, 3))))
    // emoji count as ONE code point each: same histogram as "aab"
    assert(eOf("🙂🙂a") ==
      ((3L, 2L, term(2, 3) + term(1, 3))))
    // degenerate repetition: zero entropy
    assert(eOf("aaaaaa") == ((6L, 1L, 0L)))
    // uniform 4 distinct: ~ln(4) micro-nats
    val (_, _, u) = eOf("abcd")
    assert(math.abs(u - math.round(math.log(4.0) * 1e6)) <= 4, s"u=$u")
    assert(eOf("") == ((0L, 0L, 0L)))
    val n = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(TextFns.charEntropy(col("text")).as("e"))
      .select("e.n_chars").as[Long].head()
    assert(n == 0L)
    // the quality-signal ordering the gate relies on: random-looking hex
    // blob > natural text > degenerate repetition (entropy per char)
    val blob = eOf("f3a9c1e07b2d8456f3a9")
    val nat = eOf("the cat sat on the mat")
    def perChar(t: (Long, Long, Long)): Double = t._3.toDouble / t._1
    assert(perChar(blob) > perChar(nat) && perChar(nat) > 0.0)
  }

  test("repetitionStats: top coverage is MAX over grams of cnt*chars, " +
      "which can come from a longer less-frequent gram") {
    // 'aaaa bbbb' x2 (cov 2*9=18) beats 'x y' x3 (cov 3*3=9)
    val t = statsOf("x y x y x y aaaa bbbb cc aaaa bbbb")
    assert(t._4 == 18L, s"top2_chars must take the max coverage: $t")
    assert(t._3 == 3L, s"top2_cnt stays the max count: $t")
  }
}
