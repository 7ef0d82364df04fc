package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens + tokenCount: whitespace split, case-folded, blanks dropped") {
    val df = Seq("The  quick Brown   fox", "", "  ").toDF("text")
      .select(TextFns.tokenCount(col("text")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(4, 0, 0))
  }

  test("shingles: n-grams over tokens; short docs collapse to one shingle") {
    val got = Seq("a b c d").toDF("text")
      .select(TextFns.shingles(col("text"), 3).as("s")).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(TextFns.shingles(col("text"), 3).as("s")).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("charShingles: character n-grams over normalized text") {
    val got = Seq("AB cd").toDF("text")
      .select(TextFns.charShingles(col("text"), 3).as("s")).as[Seq[String]].head()
    assert(got == Seq("ab ", "b c", " cd"))
  }

  test("fingerprint: whitespace/case-insensitive content identity") {
    val df = Seq("Hello   World", "hello world", "hello worlds").toDF("text")
      .select(TextFns.fingerprint(col("text")).as("fp"))
    val fps = df.as[String].collect().toSeq
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("stopwordRatio / punctRatio / qualityScore bounds") {
    val df = Seq(
      "the cat sat on the mat",          // stopword-heavy, clean
      "!!! ??? ;;; ###",                 // all punctuation
      "x"
    ).toDF("text").select(
      TextFns.stopwordRatio(col("text")).as("sw"),
      TextFns.punctRatio(col("text")).as("p"),
      TextFns.qualityScore(col("text")).as("q"))
    val rows = df.collect()
    val sw = rows.map(_.getDouble(0))
    val p  = rows.map(_.getDouble(1))
    val q  = rows.map(_.getDouble(2))
    assert(sw(0) == 0.5) // the, on, the out of 6
    assert(p(1) > 0.5 && p(0) == 0.0)
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1)) // clean prose scores above punctuation soup
  }

  test("langHits counts marker words") {
    val en = Seq("the cat and the dog is here").toDF("text")
      .select(TextFns.langHits(col("text"), "\\b(the|a|is|and|of)\\b").as("n"))
      .as[Int].head()
    assert(en == 4)
  }

  test("tokenCountBpeIsh splits punctuation and digit runs apart") {
    val n = Seq("don't stop, 123 go!").toDF("text")
      .select(TextFns.tokenCountBpeIsh(col("text")).as("n")).as[Int].head()
    assert(n == 8) // don ' t stop , 123 go !
  }

  /** UTF-8 bytes of `s` decoded as latin-1/cp1252 — constructs real
    * mojibake without unprintable literals in the test source. */
  private def garbleL1(s: String): String =
    new String(s.getBytes("UTF-8"), java.nio.charset.StandardCharsets.ISO_8859_1)
  private def garbleCp1252(s: String): String =
    new String(s.getBytes("UTF-8"), java.nio.charset.Charset.forName("windows-1252"))

  test("fixMojibake repairs both cp1252 and latin-1 double-decodes") {
    val clean = "don’t “quote” café — ok…"
    for (garbled <- Seq(garbleL1(clean), garbleCp1252(clean))) {
      assert(garbled != clean, "test must start from actual mojibake")
      val got = Seq(garbled).toDF("text")
        .select(TextFns.fixMojibake(col("text")).as("t")).as[String].head()
      assert(got == clean, s"$garbled -> $got != $clean")
    }
  }

  test("cleanText: controls stripped, whitespace canonical, paragraphs kept") {
    val dirty = "  a\u0000b\tc  d \n e\n\n\n\nf  "
    val got = Seq(dirty).toDF("text")
      .select(TextFns.cleanText(col("text")).as("t")).as[String].head()
    assert(got == "ab c d\ne\n\nf", s"got ${got.replace("\n", "\\n")}")
  }

  test("cleanText is idempotent (a second pass changes nothing)") {
    val dirty = garbleL1("café — ok") + "  x\n\n\n\ny  "
    val once = Seq(dirty).toDF("text")
      .select(TextFns.cleanText(col("text")).as("t")).as[String].head()
    val twice = Seq(once).toDF("text")
      .select(TextFns.cleanText(col("text")).as("t")).as[String].head()
    assert(once == twice)
  }

  test("cleanText fused kernel == composed replace/regexp chain on " +
      "randomized garbled corpora (every fix variant, partial patterns, " +
      "control runs, pathological whitespace, astral chars)") {
    val rnd = new scala.util.Random(42)
    // atoms: every garbled pattern, every PREFIX of every pattern (the
    // partial-match paths), repaired chars (must NOT re-trigger fixes),
    // controls, whitespace shapes, ASCII words, an astral emoji
    val patterns = TextFns.MojibakeFixes.map(_._1)
    val prefixes = patterns.flatMap(p => (1 until p.length).map(p.substring(0, _)))
    val atoms: IndexedSeq[String] =
      (patterns ++ prefixes ++ TextFns.MojibakeFixes.map(_._2) ++
        Seq("word", "x", "", " ", "  ", "\t", "\n", " \n ", "\n\n\n",
          "\t \n\t", "\u0000", "\u0007", "\u000b", "\u001f", "\u007f",
          "\r", "\r\n", "\u0085", "\u00a0", "\ufffd",
          "\ud83d\ude00", "\u2028")).toIndexedSeq
    val fixtures = Seq(" \n abc \n ", "\tx\t", "\na", "a\n", " a ", "\n",
        " \n \n \n ", "", "   ") ++
      (1 to 2000).map(_ => (0 until (1 + rnd.nextInt(12)))
        .map(_ => atoms(rnd.nextInt(atoms.length))).mkString)
    val df = fixtures.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
    val got = df.select(col("id"), TextFns.cleanText(col("text")).as("a"),
        TextFns.cleanTextComposed(col("text")).as("b"))
      .collect()
    val bad = got.filter(r => r.getString(1) != r.getString(2))
    assert(bad.isEmpty, bad.take(3).map(r =>
      s"id=${r.getLong(0)} kernel=[${r.getString(1)}] chain=[${r.getString(2)}]")
      .mkString("; "))
  }

  test("tokenCount + qualityScore fused kernel == composed forms on " +
      "randomized unicode corpora (and one scan serves both signals)") {
    val rnd = new scala.util.Random(7)
    val atoms = IndexedSeq("the", "The", "THE", "with", "WITH", "a", "It",
      "word", "hello,", "x!!", "...", "line", "\u00e9clair", "na\u00efve",
      "\u0386\u03a3", "\u03a3\u03bf\u03c2", "\u212aelvin", "I\u0130",
      "\ud83d\ude00", "\ud83d\ude00!b", " ", "  ", "\t", "\n", "\u000b",
      "\f", "\r", "", "123", "[a](b)", "{x;y}", "~`^", "don\u2019t")
    val fixtures = Seq("", " ", "\t\n", "only punct !!!", "the the the",
        "\u03a3 \u03a3x x\u03a3") ++
      (1 to 1500).map(_ => (0 until (1 + rnd.nextInt(14)))
        .map(_ => atoms(rnd.nextInt(atoms.length))).mkString(
          if (rnd.nextBoolean()) " " else ""))
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        TextFns.tokenCount(col("text")).as("na"),
        TextFns.tokenCountComposed(col("text")).as("nb"),
        TextFns.qualityScore(col("text")).as("qa"),
        TextFns.qualityScoreComposed(col("text")).as("qb"))
      .collect()
    val bad = got.filter(r => r.getInt(1) != r.getInt(2) ||
      r.getDouble(3) != r.getDouble(4))
    assert(bad.isEmpty, bad.take(3).map(r =>
      s"id=${r.getLong(0)}: n ${r.getInt(1)} vs ${r.getInt(2)}, " +
        s"q ${r.getDouble(3)} vs ${r.getDouble(4)}").mkString("; "))
    // both signals over the same column must plan as ONE kernel call
    // (codegen subexpression elimination on the identical TextStatsExpr)
    // repartition first: ConvertToLocalRelation would otherwise evaluate
    // the projection at optimization time and leave nothing to codegen;
    // collect() first: an unexecuted AQE plan has no codegen subtrees yet
    val planned = df.repartition(2)
      .select(TextFns.tokenCount(col("text")).as("n"),
        TextFns.qualityScore(col("text")).as("q"))
    planned.collect()
    val gen = planned.queryExecution.executedPlan
    val code = org.apache.spark.sql.execution.debug.codegenString(gen)
    val calls = "TextStatsKernel\\.stats".r.findAllIn(code).length
    assert(calls == 1, s"expected 1 fused stats call in codegen, got $calls")
  }
}
