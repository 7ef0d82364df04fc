package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("short doc (n <= size) is one chunk equal to the normalized text") {
    val got = Chunker.chunkByTokens(docs((1L, "  Alpha  beta GAMMA ")),
        "doc_id", "text", size = 32, stride = 24)
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(got == Seq((1L, 0, "alpha beta gamma", 3)))
  }

  test("chunk count, coverage, and overlap arithmetic (size 8, stride 5)") {
    val text = (0 until 23).map(i => s"t$i").mkString(" ") // n=23
    val got = Chunker.chunkByTokens(docs((7L, text)), "doc_id", "text",
        size = 8, stride = 5)
      .orderBy("chunk_id").as[(Long, Int, String, Int)].collect().toSeq
    // ceil((23-8)/5)+1 = 4 chunks at starts 0,5,10,15
    assert(got.map(_._2) == Seq(0, 1, 2, 3))
    assert(got.map(_._4) == Seq(8, 8, 8, 8))
    assert(got(1)._3.startsWith("t5 t6 t7"), "stride offset wrong")
    // every token index is covered by at least one window
    val covered = got.zipWithIndex.flatMap { case (c, k) =>
      (k * 5) until math.min(k * 5 + 8, 23) }.toSet
    assert(covered == (0 until 23).toSet)
    // last chunk reaches the end exactly
    assert(got.last._3.endsWith("t22"))
  }

  test("non-overlapping chunks (stride == size) reconstruct the token stream") {
    val text = (0 until 50).map(i => s"w$i").mkString(" ")
    val got = Chunker.chunkByTokens(docs((3L, text)), "doc_id", "text",
        size = 16, stride = 16)
      .orderBy("chunk_id").as[(Long, Int, String, Int)].collect().toSeq
    assert(got.map(_._3).mkString(" ") ==
      (0 until 50).map(i => s"w$i").mkString(" "))
    assert(got.map(_._4).sum == 50)
  }

  test("empty and whitespace-only docs yield exactly one empty chunk") {
    val got = Chunker.chunkByTokens(docs((1L, ""), (2L, "   \t  ")),
        "doc_id", "text", size = 32, stride = 24)
      .orderBy("doc_id").as[(Long, Int, String, Int)].collect().toSeq
    assert(got == Seq((1L, 0, "", 0), (2L, 0, "", 0)))
  }

  test("invalid size/stride rejected") {
    intercept[IllegalArgumentException] {
      Chunker.chunkByTokens(docs((1L, "x")), "doc_id", "text", 8, 9)
    }
    intercept[IllegalArgumentException] {
      Chunker.chunkByTokens(docs((1L, "x")), "doc_id", "text", 8, 0)
    }
  }

  test("chunkByTokenBudget with unit counter == non-overlapping chunkByTokens") {
    val d = docs(
      (1L, (1 to 23).map(i => s"w$i").mkString(" ")),
      (2L, "solo"),
      (3L, (1 to 10).map(i => s"v$i").mkString(" ")))
    val byWindow = Chunker.chunkByTokens(d, "doc_id", "text", size = 5, stride = 5)
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Int, String)].collect().toSet
    val byBudget = Chunker.chunkByTokenBudget(d, "doc_id", "text",
        budgetTokens = 5L, tokenCounter = _ => lit(1L))
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Int, String)].collect().toSet
    assert(byBudget == byWindow)
  }

  test("chunkByTokenBudget: floor-div binning on weighted words, words intact") {
    // weights = word length; budget 6: cum_before 0,3,5 | 8,11 -> bins 0,0,0,1,1
    val d = docs((7L, "abc ab abc abc a"))
    val got = Chunker.chunkByTokenBudget(d, "doc_id", "text",
        budgetTokens = 6L, tokenCounter = w => length(w).cast("long"))
      .orderBy("chunk_id")
      .as[(Long, Int, String, Long, Int)].collect().toSeq
    assert(got == Seq(
      (7L, 0, "abc ab abc", 8L, 3),
      (7L, 1, "abc a", 4L, 2)))
    // empty docs produce no chunks (nothing to pack)
    assert(Chunker.chunkByTokenBudget(docs((8L, "   ")), "doc_id", "text",
      budgetTokens = 6L, tokenCounter = _ => lit(1L)).count() == 0L)
  }
}
