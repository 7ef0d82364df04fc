package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // Every curation stage has a designated victim:
  //   6 -> quality (too short), 7 -> quality (punctuation junk),
  //   2 -> exact dedup (identical to 1), 3 -> near-dup (1 word off 1),
  //   5 -> loses its copied 8-token span to 4's canonical occurrence,
  //   8 -> decontamination (quotes an 8-token benchmark passage verbatim),
  //   1, 4, 9 -> survive intact.
  private val span = "one two three four five six seven eight"
  private val leak = "held out eval answers nobody should train on"
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river", "srcA"),
    (2L, "the quick brown fox jumps over the lazy dog near the river", "srcA"),
    (3L, "the quick brown fox jumps over the lazy dog near the creek", "srcA"),
    (4L, s"$span and then the story continued with more detail", "srcB"),
    (5L, s"a completely different opening here $span with an original ending of its own", "srcB"),
    (6L, "tiny doc", "srcA"),
    (7L, "a$b! c#d? e%f& g(h) i*j+ k,l- m.n/ o:p; q<r= s>t@", "srcB"),
    (8L, s"this document quotes $leak verbatim in the middle of it", "srcA"),
    (9L, "an entirely ordinary document about the weather and the sea with plenty of words", "srcB")
  ).toDF("doc_id", "text", "source")
  private val benchmark =
    Seq(s"the eval set passage reads $leak and must stay unseen")
      .toDF("text")

  test("full curation run: every stage drops exactly its victims, packing is seam-correct") {
    val out = Files.createTempDirectory("corpus").toString
    val summary = CorpusPipeline.run(spark, docs, benchmark, out,
      CorpusPipeline.Config(minTokens = 8L, seqLen = 16))
    assert(summary.map(_.stage) == Seq("quality", "exact_dedup", "near_dedup",
      "span_rewrite", "decontaminate", "mixture", "pack"))
    assert(summary.forall(_.ok))
    assert(summary.forall(_.durationMs >= 0))
    val rows = summary.map(r => r.stage -> r.rows).toMap
    assert(rows("quality") == 7, s"quality kept ${rows("quality")}")      // -6, -7
    assert(rows("exact_dedup") == 6)                                      // -2
    assert(rows("near_dedup") == 5)                                       // -3
    assert(rows("span_rewrite") == 5)                                     // 5 rewritten, none emptied
    assert(rows("decontaminate") == 4)                                    // -8
    assert(rows("mixture") == 4)                                          // budget >> corpus
    assert(rows("pack") == 4)

    // quality rejects carry their reasons
    val rejects = spark.read.parquet(s"$out/rejects_quality")
      .select("doc_id", "drop_reason").as[(Long, String)].collect().toMap
    assert(rejects == Map(6L -> "too_short", 7L -> "low_quality"))

    // doc 5 lost exactly the copied span; doc 4 (canonical) kept it
    val rewritten = spark.read.parquet(s"$out/s4_rewritten")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(rewritten(4L).contains("one two three"))
    assert(!rewritten(5L).contains("one two three"))
    assert(rewritten(5L).startsWith("a completely different opening here"))

    // survivors are 1, 4, 5, 9; packing covers the token stream without
    // gaps: cum_tokens is the running sum in doc_id order
    val packed = spark.read.parquet(s"$out/s7_packed")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "cum_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(packed.map(_._1) == Seq(1L, 4L, 5L, 9L))
    assert(packed.scanLeft(0L)(_ + _._2).tail == packed.map(_._3))
  }

  test("fail-fast: a broken stage aborts with the partial summary intact") {
    val out = Files.createTempDirectory("corpus_fail").toString
    val bad = docs.withColumnRenamed("text", "body") // quality stage can't resolve `text`
    val e = intercept[DailyPipeline.PipelineFailedException] {
      CorpusPipeline.run(spark, bad, benchmark, out)
    }
    assert(e.summary.map(_.stage) == Seq("quality"))
    assert(!e.summary.head.ok && e.summary.head.error.nonEmpty)
  }
}
