package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.QualityModel

/** One-off A/B: n-gram cross-entropy local-collected vs distributed plan
  * at a given corpus (the q114 rich1 64s reading's attribution; order 2
  * flag covers the q106 analog). */
object TriAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val order = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def run(cap: Int): Double = {
      val t0 = System.nanoTime()
      (if (order == 3)
        QualityModel.trigramCrossEntropy(docs, "doc_id", "text",
          maxLocalTrigrams = cap)
      else
        QualityModel.bigramCrossEntropy(docs, "doc_id", "text",
          maxLocalBigrams = cap))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(0); run(4000000) // warm
    val d = (1 to reps).map(_ => run(0)).min
    val l = (1 to reps).map(_ => run(4000000)).min
    val nTok = docs.select(explode(graft.functions.TextFns.tokens(col("text"))).as("t")).count()
    println(f"[triab] dir=$dir order=$order distributed_min=$d%.2f local_min=$l%.2f n_tokens=$nTok")
    spark.stop()
  }
}
