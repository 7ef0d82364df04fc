package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Dedup}

/** Scaling sweep for the round-15 additions (q121–q124 + the persisted
  * BM25 index lifecycle) over GenScaleData rich<N> corpora — one JVM
  * per scale point, WindowProbe bracketing in-file (the NewOpsScale
  * discipline).
  *
  * Configs are the PRODUCTION shapes: containment runs the hot-shingle
  * cap (the oracle disables it for replay exactness), more-like-this
  * seeds from a mid-corpus doc, and the BM25-index point times
  * build+save+load+query (the artifact lifecycle, not just the scan).
  *
  * usage: NewOps15Scale <docsDir> [reps] */
object NewOps15Scale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: NewOps15Scale <docsDir> [reps]")
    val docsDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-newops15-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = spark.read.parquet(s"$docsDir/documents.parquet")
    val nDocs = docs.count()

    val ops: Seq[(String, () => DataFrame)] = Seq(
      "q121_repetition_stats" -> (() =>
        docs.select(col("doc_id"),
            graft.functions.TextFns.repetitionStats(col("text")).as("r"))
          .select(col("doc_id"), col("r.n_words"), col("r.top2_chars"),
            col("r.dup5_chars"))
          .orderBy(col("doc_id"))),
      "q122_containment_p" -> (() =>
        Dedup.containmentPairs(docs, "doc_id", "text",
            shingleN = 3, thresholdNum = 5, thresholdDen = 10)
          .orderBy(col("id_a"), col("id_b"))),
      "q123_more_like_this" -> (() =>
        CorpusStats.moreLikeThis(docs, "doc_id", "text",
          seedId = nDocs / 2, nTerms = 3, topK = 15)),
      "q124_source_health" -> (() =>
        CorpusStats.sourceHealth(docs, "source", "text")
          .orderBy(col("source"))),
      "q120_bm25_index_lifecycle" -> (() => {
        val path = s"/tmp/newops15_bm25_$nDocs"
        CorpusStats.bm25SaveIndex(spark,
          CorpusStats.bm25BuildIndex(docs, "doc_id", "text"), path)
        val idx = CorpusStats.bm25LoadIndex(spark, path)
        CorpusStats.bm25TopKIndexed(docs, "doc_id", "text",
          Seq("w7", "w42", "w1234"), idx, topK = 25)
      }))

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val before = WindowProbe.sample(spark)
    ops.foreach { case (_, f) => exec(f()) } // warm-up
    val results = ops.map { case (name, f) =>
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        exec(f())
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> (ts.head, ts(ts.length / 2))
    }
    val after = WindowProbe.sample(spark)
    def fmt(d: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    val mins = results.map { case (k, v) => s""""$k":${fmt(v._1)}""" }
      .mkString("{", ",", "}")
    val meds = results.map { case (k, v) => s""""$k":${fmt(v._2)}""" }
      .mkString("{", ",", "}")
    val wr = fmt(math.max(before.worst, after.worst))
    println(s"""{"docs_dir":"$docsDir","n_docs":$nDocs,"reps":$reps,"window_ratio":$wr,"queries_min":$mins,"queries_med":$meds}""")
    spark.stop()
  }
}
