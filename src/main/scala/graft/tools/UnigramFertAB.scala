package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, TextFns, UnigramLm}

/** Fertility A/B: unigram-LM tokenizer vs BPE at EQUAL VOCABULARY
  * BUDGET (the r15 verdict's #4 "Done" criterion). Both models share
  * the same word stream (lowercase + whitespace split); the budget is
  * equalized exactly: BPE's effective vocab = |code-point alphabet| +
  * merges learned, and the unigram trainer is given that number as its
  * vocabSize (its kept vocab = same alphabet + multi-char pieces).
  * Fertility = encode pieces per whitespace word, same denominator on
  * both sides (TextFns.tokenCount).
  *
  * Expected direction: unigram-LM usually segments slightly better per
  * vocab slot than greedy BPE (pieces are chosen by corpus likelihood,
  * not frozen merge order) — the reason SentencePiece defaults to it.
  *
  * Usage: runMain graft.tools.UnigramFertAB <docsDir> <numMerges> <outJson>
  */
object UnigramFertAB {
  def main(args: Array[String]): Unit = {
    val docsDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(256)
    val outJson = args.lift(2).getOrElse("unigram_fert_ab.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)

    val before = WindowProbe.sample(spark)
    // BPE side
    val t0 = System.nanoTime()
    val merges = Bpe.trainMergesLocal(docs, "text", numMerges)
    val bpeTrainSec = (System.nanoTime() - t0) / 1e9
    // exact code-point alphabet, driver-side over the Heaps-sized word
    // table (a regex char split would tear supplementary pairs)
    val alphabet = Bpe.wordCounts(docs, "text").collect()
      .iterator.flatMap(_.getString(0).codePoints().toArray.iterator)
      .toSet.size
    val vocabBudget = alphabet + merges.size
    // unigram side at the SAME budget
    val t1 = System.nanoTime()
    val uni = UnigramLm.train(docs, "text", seedSize = vocabBudget * 4,
      vocabSize = vocabBudget, emRounds = 2, maxPieceLen = 12,
      maxWordLen = 24)
    val uniTrainSec = (System.nanoTime() - t1) / 1e9
    val row = docs.select(
        sum(TextFns.tokenCount(col("text")).cast("long")).as("w"),
        sum(Bpe.tokenCount(col("text"), merges, faithful = false)).as("bpe"),
        sum(UnigramLm.pieceCount(col("text"), uni)).as("uni"))
      .collect()(0)
    val after = WindowProbe.sample(spark)
    val (w, bpeT, uniT) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val fBpe = bpeT.toDouble / w
    val fUni = uniT.toDouble / w
    val json =
      f"""{"dir":"$docsDir","merges":${merges.size},"alphabet":$alphabet,
         |"vocab_budget":$vocabBudget,"uni_vocab":${uni.pieces.size},
         |"n_words":$w,
         |"bpe":{"n_tokens":$bpeT,"fertility":$fBpe%.4f,"train_sec":$bpeTrainSec%.2f},
         |"unigram":{"n_pieces":$uniT,"fertility":$fUni%.4f,"train_sec":$uniTrainSec%.2f},
         |"uni_vs_bpe_pct":${(fUni / fBpe - 1.0) * 100}%.2f,
         |"window":${WindowProbe.windowJson(before, after)}}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    println(json)
    spark.stop()
  }
}
