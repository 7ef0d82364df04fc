package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, TextFns, UnigramLm}

/** The FIDELITY TAX of the faithful unigram tokenizer (r17 q138) — the
  * r14 BPE question re-asked for the unigram family: at EQUAL vocabulary
  * budget, how many extra pieces does byte-exact reconstructability
  * cost vs the lossy lowercasing word model? (The r14 answer for BPE on
  * the Heaps-morphology corpus: ~+4% at realistic budgets.) Both models
  * train on the same corpus at the same kept-vocab budget; fertility
  * uses the same whitespace-word denominator on both sides, so the
  * faithful side's case/space pieces show up as the tax — the honest
  * framing from the r14 artifact applies: pieces-per-word structurally
  * favors the model that discards information; the tax is the number a
  * training-file owner budgets for byte-exact decode.
  *
  * Usage: runMain graft.tools.UniFaithFert17 <docsDir> <vocabBudget> <outJson>
  */
object UniFaithFert17 {
  def main(args: Array[String]): Unit = {
    val docsDir = args.lift(0).getOrElse("/root/repo/scaledata/heaps")
    val budget = args.lift(1).map(_.toInt).getOrElse(1051)
    val outJson = args.lift(2).getOrElse("uni_faith_fert.json")
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
    val t0 = System.nanoTime()
    val word = UnigramLm.train(docs, "text", seedSize = budget * 4,
      vocabSize = budget, emRounds = 2, maxPieceLen = 12, maxWordLen = 24)
    val wordSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val faith = UnigramLm.train(docs, "text", seedSize = budget * 4,
      vocabSize = budget, emRounds = 2, maxPieceLen = 12, maxWordLen = 24,
      faithful = true)
    val faithSec = (System.nanoTime() - t1) / 1e9
    val row = docs.select(
        sum(TextFns.tokenCount(col("text")).cast("long")).as("w"),
        sum(UnigramLm.pieceCount(col("text"), word)).as("wp"),
        sum(UnigramLm.pieceCount(col("text"), faith)).as("fp"))
      .collect()(0)
    val (w, wp, fp) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // decode sanity on a sample: the faithful stream must reconstruct
    // the exact text (the property being paid for)
    val bad = docs.limit(200).select(col("text"),
        UnigramLm.decodeIdsFlat(
          UnigramLm.tokenIdsFaithful(col("text"), faith), faith).as("rt"))
      .filter(col("rt") =!= regexp_replace(col("text"),
        "[\u0001\u0002]", ""))
      .count()
    require(bad == 0, s"faithful decode failed on $bad sample docs")
    val after = WindowProbe.sample(spark)
    def f(d: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    val json = s"""{"dir":"$docsDir","vocab_budget":$budget,"n_words":$w,
      |"word_model":{"n_pieces":$wp,"fertility":${f(wp.toDouble / w)},"train_sec":${f(wordSec)}},
      |"faithful":{"n_pieces":$fp,"fertility":${f(fp.toDouble / w)},"train_sec":${f(faithSec)}},
      |"fidelity_tax_pct":${f(100.0 * (fp - wp) / wp)},
      |"decode_sample_ok":true,
      |"window_ratio":${f(math.max(before.worst, after.worst))}}""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    println(json)
    spark.stop()
  }
}
