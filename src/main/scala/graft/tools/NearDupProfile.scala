package graft.tools

import graft.Graft
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev micro-profiler for the corpus pipeline's near_dedup stage
  * (Dedup.dedupClusters at the CorpusPipeline config: 64 hashes,
  * 32 bands, 3-shingles, threshold 0.5, cap 1000). ONE step per JVM —
  * the r12 lesson: chaining steps in one session contaminates later
  * timings with accumulated cache/checkpoint state and recomputed
  * lineage, producing internally inconsistent numbers.
  *
  * Usage: jrun graft.tools.NearDupProfile <docsDir> <step>
  *   step ∈ sets | sigs | members | pairs | verify | cc | full */
object NearDupProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val step = args(1)
    val (numHashes, bands, shingleN, threshold, cap) = (64, 32, 3, 0.5, 1000)
    val spark = Graft.session("graft-ndprof")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    // warm up kernels/codegen on a slice
    Dedup.dedupClusters(docs.limit(2000), "doc_id", "text",
      numHashes, bands, shingleN, threshold, cap).count()

    def sets() = Dedup.shingleSets(docs, "doc_id", "text", shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t0 = System.nanoTime()
    step match {
      case "sets" =>
        println("shingles=" + sets().selectExpr("sum(size(shset))").collect()(0))
      case "sigs" =>
        val s = sets(); s.count() // cache it OUTSIDE the timing
        val t1 = System.nanoTime()
        Dedup.minhashSignaturesFromSets(s, "doc_id", numHashes)
          .selectExpr("sum(signature[0])").collect()
        println(f"[ndprof] sigs-only ${(System.nanoTime() - t1) / 1e9}%7.2fs")
      case "members" =>
        val s = sets(); s.count()
        val sigs = Dedup.minhashSignaturesFromSets(s, "doc_id", numHashes)
        val t1 = System.nanoTime()
        println("pairs=" + Dedup.lshCandidatePairs(sigs, "doc_id", bands,
          numHashes, cap).count())
        println(f"[ndprof] candidates-from-cached-sets ${(System.nanoTime() - t1) / 1e9}%7.2fs")
      case "countagg" => // exchange+hash-agg floor: groupBy count only
        val s = sets(); s.count()
        val sigs = Dedup.minhashSignaturesFromSets(s, "doc_id", numHashes)
        val t1 = System.nanoTime()
        println("hot=" + Dedup.bandBuckets(sigs, "doc_id", bands, numHashes)
          .groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("n")).filter(col("n") >= 2).count())
        println(f"[ndprof] countagg-only ${(System.nanoTime() - t1) / 1e9}%7.2fs")
      case "foldagg" => // same but single folded long key
        val s = sets(); s.count()
        val sigs = Dedup.minhashSignaturesFromSets(s, "doc_id", numHashes)
        val rows = numHashes / bands
        val bcols = (0 until bands).map(b =>
          xxhash64(lit(b), slice(col("signature"), b * rows + 1, rows)))
        val t1 = System.nanoTime()
        println("hot=" + sigs
          .select(col("doc_id"), explode(array(bcols: _*)).as("bk"))
          .groupBy(col("bk")).agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2).count())
        println(f"[ndprof] foldagg-only ${(System.nanoTime() - t1) / 1e9}%7.2fs")
      case "membersV2" => // count-first + broadcast semi-join + tiny collect
        val s = sets(); s.count()
        val sigs = Dedup.minhashSignaturesFromSets(s, "doc_id", numHashes)
        val t1 = System.nanoTime()
        val buckets = Dedup.bandBuckets(sigs, "doc_id", bands, numHashes)
        val hot = buckets.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") >= 2 && col("__n") <= cap)
          .select(col("band"), col("bucket"))
        val collide = buckets.join(hot, Seq("band", "bucket"), "leftsemi")
        val members = collide.groupBy(col("band"), col("bucket"))
          .agg(sort_array(collect_list(col("doc_id"))).as("__m"))
        val m = col("__m")
        val n = members
          .select(explode(flatten(transform(sequence(lit(1), size(m) - 1), i =>
            transform(slice(m, i + 1, size(m) - i), b =>
              struct(element_at(m, i).as("id_a"), b.as("id_b")))))).as("p"))
          .select(col("p.id_a"), col("p.id_b")).distinct().count()
        println("pairs=" + n)
        println(f"[ndprof] membersV2-only ${(System.nanoTime() - t1) / 1e9}%7.2fs")
      case "v2steps" =>
        val s = sets(); s.count()
        val sigs = Dedup.minhashSignaturesFromSets(s, "doc_id", numHashes)
        val buckets = Dedup.bandBuckets(sigs, "doc_id", bands, numHashes)
        def tt[A](l: String)(f: => A): A = {
          val t1 = System.nanoTime(); val r = f
          println(f"[ndprof] $l%-28s ${(System.nanoTime() - t1) / 1e9}%7.2fs"); r
        }
        val hot = buckets.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") >= 2 && col("__n") <= cap)
          .select(col("band"), col("bucket"))
        tt("hot count")(println("  hot=" + hot.count()))
        val collide = buckets.join(hot, Seq("band", "bucket"), "leftsemi")
        tt("collide count")(println("  collide=" + collide.count()))
        val members = collide.groupBy(col("band"), col("bucket"))
          .agg(sort_array(collect_list(col("doc_id"))).as("__m"))
        tt("members count")(println("  members=" + members.count()))
      case "full" =>
        println("pairs=" + Dedup.minhashDedup(docs, "doc_id", "text",
          numHashes, bands, shingleN, threshold, cap).count())
      case "cc" =>
        val pairs = Dedup.minhashDedup(docs, "doc_id", "text",
          numHashes, bands, shingleN, threshold, cap)
        pairs.count()
        val t1 = System.nanoTime()
        println("comps=" + Dedup.connectedComponents(
          docs.select(col("doc_id")), "doc_id", pairs).count())
        println(f"[ndprof] cc-only ${(System.nanoTime() - t1) / 1e9}%7.2fs")
      case "clusters" =>
        println("rows=" + Dedup.dedupClusters(docs, "doc_id", "text",
          numHashes, bands, shingleN, threshold, cap).count())
      case other => sys.error(s"unknown step $other")
    }
    println(f"[ndprof] $step TOTAL ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    spark.stop()
  }
}
