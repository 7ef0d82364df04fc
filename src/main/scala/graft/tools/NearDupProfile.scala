package graft.tools

import graft.Graft
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev micro-profiler for the corpus pipeline's near_dedup stage
  * (Dedup.dedupClusters at the CorpusPipeline config: 64 hashes,
  * 32 bands, 3-shingles, threshold 0.5, cap 1000): times each sub-step
  * in isolation so the r12 constant-cutting work aims at measured cost.
  *
  * Usage: jrun graft.tools.NearDupProfile <docsDir> */
object NearDupProfile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[ndprof] $label%-42s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/rich8")
    val (numHashes, bands, shingleN, threshold, cap) = (64, 32, 3, 0.5, 1000)
    val spark = Graft.session("graft-ndprof")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("docs=" + docs.count())

    // warm up kernels/codegen on a slice
    Dedup.minhashDedup(docs.limit(2000), "doc_id", "text",
      numHashes, bands, shingleN, threshold, cap).count()

    val sets = Dedup.shingleSets(docs, "doc_id", "text", shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingleSets materialize") {
      println("  shingles=" + sets.selectExpr("sum(size(shset))").collect()(0))
    }
    val sigs = Dedup.minhashSignaturesFromSets(sets, "doc_id", numHashes)
    time("signatures (from cached sets)") {
      sigs.selectExpr("sum(signature[0])").collect()
    }
    val buckets = Dedup.bandBuckets(sigs, "doc_id", bands, numHashes)
    time("bandBuckets (no cap)") { println("  bucketRows=" + buckets.count()) }
    val capped = buckets
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bucket"))))
      .filter(col("__n") <= cap).drop("__n")
    time("cap window (sort exchange)") { println("  capped=" + capped.count()) }
    val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", bands, numHashes, cap)
    time("candidate pairs (full, incl. re-bucket)") {
      println("  pairs=" + pairs.count())
    }
    val verified = Dedup.jaccardForPairsSets(sets, pairs, "doc_id")
      .filter(col("jaccard") >= threshold)
    time("verify (pairs x cached sets)") {
      println("  verified=" + verified.count())
    }
    val full = time("FULL minhashDedup") {
      val p = Dedup.minhashDedup(docs, "doc_id", "text",
        numHashes, bands, shingleN, threshold, cap)
      println("  pairs=" + p.count()); p
    }
    time("connectedComponents") {
      println("  comps=" + Dedup.connectedComponents(
        docs.select(col("doc_id")), "doc_id", full).count())
    }
    time("FULL dedupClusters") {
      println("  rows=" + Dedup.dedupClusters(docs, "doc_id", "text",
        numHashes, bands, shingleN, threshold, cap).count())
    }
    sets.unpersist()
    spark.stop()
  }
}
