package graft.tools

import graft.Graft
import graft.functions.TextFns
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev micro-profiler: times individual stages of the text-dedup pipeline
  * so optimization targets measured cost, not guessed cost. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session("graft-profile")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm scan

    // warm-up full queries once (JIT)
    Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.2, Int.MaxValue).count()

    time("tokenize only") {
      docs.select(size(TextFns.tokens(col("text"))).as("n"))
        .agg(sum(col("n"))).collect()
    }
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("shingleSets (narrow)") { sets.selectExpr("sum(size(shset))").collect() }
    val sh = sets.select(col("doc_id").as("__id"), size(col("shset")).as("sz"),
      explode(col("shset")).as("sh"))
    time("explode postings") { println("postings=" + sh.count()) }
    val posts = sh.repartition(col("sh"))
    time("shuffle by shingle") { println("post-shuffle=" + posts.count()) }
    val joined = posts.select(col("sh"), col("__id").as("id_a"), col("sz").as("sz_a"))
      .join(posts.select(col("sh"), col("__id").as("id_b"), col("sz").as("sz_b")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
    time("self-join candidates") { println("candidates=" + joined.count()) }
    val grouped = joined.groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
    time("pair groupBy") { println("pairs=" + grouped.count()) }
    time("full jaccardPairs") {
      println("final=" + Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.2, Int.MaxValue).count())
    }
    time("full minhashDedup") {
      println("final=" + Dedup.minhashDedup(docs, "doc_id", "text", 64, 16, 3, 0.2).count())
    }
    time("minhash signatures only") {
      Dedup.minhashSignatures(docs, "doc_id", "text", 64, 3)
        .selectExpr("sum(signature[0])").collect()
    }
    spark.stop()
  }
}
