package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Isolated A/B of the corpus pipeline's `clean` stage: the fused
  * one-pass [[graft.functions.CleanTextExpr]] kernel vs the composed
  * replace/regexp chain, over a documents dir, with the stage's real
  * write-both-outputs shape. Fresh-JVM reps via the shell loop (the
  * SCALING_r06 isolation lesson); this main runs `reps` in-JVM reps per
  * variant and prints per-rep seconds + equality of row counts.
  *
  * Usage: jrun graft.tools.CleanOnly <docsDir> <workDir> [reps]
  */
object CleanOnly {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CleanOnly <docsDir> <workDir> [reps]")
    val Array(docsDir, workDir) = args.take(2)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))

    def run(tag: String, cleaned: org.apache.spark.sql.DataFrame): Seq[Double] =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        cleaned.filter(length(col("text")) === 0)
          .write.mode("overwrite").parquet(s"$workDir/rejects_$tag")
        cleaned.filter(length(col("text")) > 0)
          .write.mode("overwrite").parquet(s"$workDir/keep_$tag")
        (System.nanoTime() - t0) / 1e9
      }

    val kernel = docs.select(col("doc_id"),
      TextFns.cleanText(col("text")).as("text"), col("source"))
    val chain = docs.select(col("doc_id"),
      TextFns.cleanTextComposed(col("text")).as("text"), col("source"))

    val kSec = run("kernel", kernel)
    val cSec = run("chain", chain)
    val kRows = spark.read.parquet(s"$workDir/keep_kernel").count()
    val cRows = spark.read.parquet(s"$workDir/keep_chain").count()
    // full-content equality, not just counts: anti-join both ways on
    // (doc_id, text) is overkill for a bench tool — compare text hashes
    val kHash = spark.read.parquet(s"$workDir/keep_kernel")
      .agg(sum(crc32(col("text")))).head.getLong(0)
    val cHash = spark.read.parquet(s"$workDir/keep_chain")
      .agg(sum(crc32(col("text")))).head.getLong(0)
    def fmt(xs: Seq[Double]) =
      xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(s"""{"docs":"$docsDir","kernel_sec":${fmt(kSec)},""" +
      s""""chain_sec":${fmt(cSec)},"kernel_min":${f"${kSec.min}%.2f"},""" +
      s""""chain_min":${f"${cSec.min}%.2f"},"rows_equal":${kRows == cRows},""" +
      s""""hash_equal":${kHash == cHash}}""")
    require(kRows == cRows && kHash == cHash,
      s"kernel/chain outputs diverge: rows $kRows vs $cRows, hash $kHash vs $cHash")
    spark.stop()
  }
}
