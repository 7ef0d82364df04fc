package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, TextFns}

/** Fertility A/B of the two tokenizer word models at EQUAL merge budget —
  * the r12 verdict's "measure q98 before/after the pre-tokenizer" task.
  *
  * Both tokenizers are trained on the same corpus with the same number of
  * merges, then fertility is reported against the SAME denominator
  * (whitespace words, TextFns.tokenCount) so the numbers are comparable:
  *  - word model: lowercase + whitespace split (q87-q99's model) — no
  *    pre-tokenization, so punctuation glues to words ("dog."/"dog" are
  *    unrelated vocabulary entries and merges re-learn shared prefixes);
  *  - faithful model: GPT-2-style pretokens (case preserved, punctuation
  *    split off, single leading space attached) — merges spend on real
  *    subword structure instead.
  * Expected direction at realistic budgets: the pre-tokenizer LOWERS
  * tokens-per-word because a merge learned for "dog" also covers "dog."
  * and "dog,"; case preservation pushes the other way at tiny budgets
  * (The/the are distinct vocabulary entries). Fertility here counts
  * encode PIECES per whitespace word; the faithful stream also spends
  * pieces on standalone whitespace runs (double spaces etc.), which the
  * word model never counts — those are real ids a trainer consumes, so
  * they are IN the faithful numerator, stated plainly.
  *
  * Usage: runMain graft.tools.FertilityAB <docsDir> <numMerges> <outJson>
  */
object FertilityAB {
  def main(args: Array[String]): Unit = {
    val docsDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(512)
    val outJson = args.lift(2).getOrElse("fertility_ab.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The driver corpora are all-lowercase and punctuation-free, so the
    // effect the pre-tokenizer exists for (case variants and
    // punctuation-glued words fragmenting the vocabulary) cannot show on
    // them directly — at saturation both models hit fertility 1.0. The
    // "prose" mode derives a deterministic prosified VIEW of the same
    // corpus (md5(doc_id:pos)-keyed: ~1/5 words initcapped, ~1/7 get a
    // trailing comma, ~1/11 a period) so the measurement exercises the
    // regime real text lives in. Reported beside the raw-corpus numbers,
    // never instead of them.
    val prose = args.lift(3).contains("prose")
    val raw = spark.read.parquet(s"$docsDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs = (if (!prose) raw else {
      val ws = split(col("text"), " ")
      val prosed = concat_ws(" ", zip_with(ws,
        sequence(lit(0), greatest(size(ws) - 1, lit(0))),
        (w, i) => {
          val h = conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":"), i.cast("string"))), 1, 8), 16, 10).cast("long")
          val capped = when(h % 5 === 0, initcap(w)).otherwise(w)
          val punct = when(h % 11 === 0, lit("."))
            .when(h % 7 === 0, lit(",")).otherwise(lit(""))
          concat(capped, punct)
        }))
      raw.select(col("doc_id"), prosed.as("text"))
    }).localCheckpoint(true)

    def measure(faithful: Boolean): (Long, Long, Long, Double) = {
      val t0 = System.nanoTime()
      val merges = Bpe.trainMergesLocal(docs, "text", numMerges, 2L, faithful)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val row = docs.select(
        sum(TextFns.tokenCount(col("text")).cast("long")).as("w"),
        sum(Bpe.tokenCount(col("text"), merges, faithful)).as("t"))
        .collect()(0)
      (row.getLong(0), row.getLong(1), merges.size.toLong, trainSec)
    }
    val (w1, t1, m1, s1) = measure(faithful = false)
    val (w2, t2, m2, s2) = measure(faithful = true)
    def fert(t: Long, w: Long): Double = t.toDouble / w.toDouble
    val json =
      f"""{"dir":"$docsDir","prose":$prose,"merges_requested":$numMerges,
         |"word":{"merges":$m1,"n_words":$w1,"n_tokens":$t1,"fertility":${fert(t1, w1)}%.4f,"train_sec":$s1%.2f},
         |"faithful":{"merges":$m2,"n_words":$w2,"n_tokens":$t2,"fertility":${fert(t2, w2)}%.4f,"train_sec":$s2%.2f},
         |"fertility_delta_pct":${(fert(t2, w2) / fert(t1, w1) - 1.0) * 100}%.2f}""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    println(json)
    spark.stop()
  }
}
