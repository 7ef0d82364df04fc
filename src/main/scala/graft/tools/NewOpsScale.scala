package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Pca, QualityModel}

/** Scaling sweep for the round-14 retrieval/LM/embedding additions
  * (q113–q117) over GenScaleData corpora — one JVM per scale point (run
  * the tool once per point; the Bench sweep discipline), WindowProbe
  * bracketing in-file.
  *
  * The BM25 query terms are corpus-appropriate (`w7 w42 w1234` exist in
  * the rich<N> 20k vocab; the testdata terms don't), and the frozen
  * trigram runs its PRODUCTION config (sample-trained, mod 16 — the
  * whole-corpus oracle config throws past the trigram cap on an
  * open-vocabulary corpus by design).
  *
  * usage: NewOpsScale <docsDir|-> <embDir|-> [reps]
  * prints one JSON line: {"docs_dir":…,"n_docs":…,"n_vectors":…,
  * "window_ratio":…,"queries_min":{…},"queries_med":{…}}
  */
object NewOpsScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: NewOpsScale <docsDir|-> <embDir|-> [reps]")
    val docsDir = args(0)
    val embDir = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-newops-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = spark.read.parquet(s"$docsDir/documents.parquet")
    def embs: DataFrame = spark.read.parquet(s"$embDir/embeddings.parquet")
    val nDocs = if (docsDir == "-") 0L else docs.count()
    val nVecs = if (embDir == "-") 0L else embs.count()

    val ops: Seq[(String, () => DataFrame)] = {
      val text: Seq[(String, () => DataFrame)] = if (docsDir == "-") Nil else Seq(
        "q113_bm25_topk" -> (() =>
          CorpusStats.bm25TopK(docs, "doc_id", "text",
            Seq("w7", "w42", "w1234"), topK = 25)),
        "q114_trigram_perplexity" -> (() =>
          QualityModel.trigramCrossEntropy(docs, "doc_id", "text")
            .orderBy(col("doc_id"))),
        "q117_frozen_trigram_lm_p" -> (() => {
          val sample = docs.filter(
            pmod(xxhash64(col("doc_id")), lit(16)) === 0)
          val lm = QualityModel.trainTrigramLm(sample, "text")
          val sc = QualityModel.frozenTrigramScore(
            concat(col("text"), lit(graft.SparkEntry.OovSuffix)), lm)
          docs.select(col("doc_id"), sc.as("__s"))
            .select(col("doc_id"),
              col("__s.n_terms").cast("int").as("n_terms"),
              floor(col("__s.lp_sum").cast("double") / col("__s.n_terms")
                + lit(0.5)).cast("long").as("xent_micro"))
            .orderBy(col("doc_id"))
        }))
      val emb: Seq[(String, () => DataFrame)] = if (embDir == "-") Nil else Seq(
        "q115_embed_cov" -> (() =>
          Pca.embedCovariance(embs, "embedding", scale = 1000)),
        "q116_pca_project" -> (() => {
          val model = Pca.train(embs, "embedding", dim = 64, p = 4,
            scale = 1000)
          Pca.projectInt(embs, "vec_id", "embedding", model)
            .orderBy(col("vec_id"))
        }))
      text ++ emb
    }

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val before = WindowProbe.sample(spark)
    ops.foreach { case (_, f) => exec(f()) } // warm-up (JIT + page cache)
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
    println(s"""{"docs_dir":"$docsDir","emb_dir":"$embDir","n_docs":$nDocs,"n_vectors":$nVecs,"reps":$reps,"window_ratio":$wr,"queries_min":$mins,"queries_med":$meds}""")
    spark.stop()
  }
}
