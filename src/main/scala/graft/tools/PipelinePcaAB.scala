package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.CorpusPipeline

/** One-off A/B: the CorpusPipeline sem_dedup STAGE, full-dim vs
  * share-guarded PCA-reduced (the r14 verdict's #3 "decade point" at the
  * pipeline level — the operator-level trend is
  * scaling/r14/pca_semdedup_ab.json; this measures the same composition
  * where it now actually deploys, stage-boundary write included).
  *
  * Generates n docs (realistic-entropy 20k vocabulary) with n MATCHED
  * anisotropic embeddings (e^{-k/4} spectrum decay — top-8 share ~98%,
  * the regime where the share gate passes), runs the pipeline through
  * the sem_dedup stage twice (pcaP=0 / pcaP=8), and reports per-stage
  * wall plus flagged-set agreement.
  *
  * Usage: jrun graft.tools.PipelinePcaAB <nDocs> [reps] */
object PipelinePcaAB {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(80000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = GenScaleData.documentsVocab(spark, n, 20000)
      .select(col("doc_id"), col("text"), col("source"))
    val embs = GenScaleData.embeddings(spark, n)
      .select(col("vec_id").as("doc_id"),
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, k) => (x * exp(-k.cast("double") / 4.0)).cast("float"))
          .as("embedding"))
    val nlist = graft.operators.Similarity.autoNlist(n, targetListRows = 4096L)
    val base = CorpusPipeline.Config(minTokens = 8L,
      semCentroids = nlist, semThresholdNum = 8, semThresholdDen = 10,
      semConverge = true, // the production clustering config
      budgetTokens = 100000000L) // >> corpus tokens: mixture keeps all

    // benchmark frame for decontamination: one unmatchable row
    import spark.implicits._
    val bench = Seq("decontamination reference passage zz yy xx").toDF("text")

    def runOnce(cfg: CorpusPipeline.Config, out: String): (Map[String, Long], Long) = {
      val summary = CorpusPipeline.run(spark, docs, bench, out, cfg,
        embeddings = Some(embs))
      val flagged = spark.read.parquet(s"$out/rejects_semdedup").count()
      (summary.map(r => r.stage -> r.durationMs).toMap, flagged)
    }

    val before = WindowProbe.sample(spark)
    runOnce(base, s"/tmp/ppab_warm_$n") // warm
    val full = (1 to reps).map(_ => runOnce(base, s"/tmp/ppab_full_$n"))
    val pca = (1 to reps).map(_ => runOnce(
      base.copy(pcaP = 8, embedDim = 64, pcaMinShare = 0.9),
      s"/tmp/ppab_pca_$n"))
    val after = WindowProbe.sample(spark)

    def agreeSets(): String = {
      val f = spark.read.parquet(s"/tmp/ppab_full_$n/rejects_semdedup")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val p = spark.read.parquet(s"/tmp/ppab_pca_$n/rejects_semdedup")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      s""""flagged":{"full":${f.size},"pca8":${p.size},"both":${(f & p).size}}"""
    }
    def msMin(rs: Seq[(Map[String, Long], Long)], k: String): Long =
      rs.map(_._1.getOrElse(k, -1L)).min
    val stages = Seq("clean", "quality", "ppl_gate", "exact_dedup",
      "near_dedup", "sem_dedup", "span_rewrite")
    val fullJson = stages.map(s => s""""$s":${msMin(full, s)}""").mkString(",")
    val pcaJson = stages.map(s => s""""$s":${msMin(pca, s)}""").mkString(",")
    val wr = "%.2f".formatLocal(java.util.Locale.ROOT,
      math.max(before.worst, after.worst))
    println(s"""{"n":$n,"reps":$reps,"nlist":$nlist,"window_ratio":$wr,${agreeSets()},"stage_ms_min_full":{$fullJson},"stage_ms_min_pca8":{$pcaJson}}""")
    spark.stop()
  }
}
