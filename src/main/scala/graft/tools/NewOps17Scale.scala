package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UnigramLm
import graft.operators.{CorpusStats, DenseIndex, Packer, Similarity, UrlDedup}

/** Scaling sweep for the round-17 additions (q132-q137 production
  * shapes) over GenScaleData rich<N> corpora — one JVM per scale point,
  * WindowProbe bracketing in-file (the NewOps16Scale discipline).
  *
  * Read paths run against PRE-BUILT persisted artifacts (the deployment
  * shape); artifact builds are their own timed rows. The IVF artifact
  * uses autoNlist + lowest-id seed centroids — the machinery under
  * measurement is the versioned artifact + partition-pruned probe, not
  * centroid quality (measured separately, r14
  * similarity_production_sweep). Dense vectors are deterministic
  * synthetic 64-dim (rich dirs carry documents only).
  *
  * usage: NewOps17Scale <docsDir> [reps] */
object NewOps17Scale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: NewOps17Scale <docsDir> [reps]")
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
      .appName("graft-newops17-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = spark.read.parquet(s"$docsDir/documents.parquet")
    val nDocs = docs.count()

    val uniModel = UnigramLm.train(docs, "text", seedSize = 4000,
      vocabSize = 1000, emRounds = 2, maxPieceLen = 8, maxWordLen = 24)
    def embeddings: DataFrame = docs.select(col("doc_id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (pmod(xxhash64(col("doc_id"), j, lit(7L)), lit(2000L)).cast("double")
          / 1000.0 - 1.0).cast("float")).as("embedding"))
    val nlist = Similarity.autoNlist(nDocs)
    val nProbe = math.min(4, nlist)

    // pre-built persisted artifacts (deployment read path)
    val bm25Path = s"/tmp/newops17_bm25_$nDocs"
    CorpusStats.bm25SaveIndex(spark,
      CorpusStats.bm25BuildIndex(docs, "doc_id", "text"), bm25Path)
    val bm25Ix = CorpusStats.bm25LoadIndex(spark, bm25Path, validate = false)
    val ivfPath = s"/tmp/newops17_ivf_$nDocs"
    DenseIndex.ivfSaveIndex(spark,
      DenseIndex.ivfBuildIndex(embeddings, "vec_id", "embedding",
        nlist = nlist, scale = 1000), ivfPath)
    val ivfIx = DenseIndex.ivfLoadIndex(spark, ivfPath, validate = false)

    val urlView: DataFrame = {
      val v1 = conv(substring(md5(concat(lit("graft-q133:"),
        col("doc_id").cast("string"))), 1, 2), 16, 10).cast("int")
      val host = concat(lit("site"), (col("doc_id") % 97).cast("string"),
        lit(".example.com"))
      docs.select(col("doc_id"), concat(
        element_at(array(lit("https"), lit("HTTPS")), (v1 % 2) + 1),
        lit("://"),
        when(v1 % 2 === 0, lit("www.")).otherwise(lit("")),
        host,
        lit("/page/"), (col("doc_id") % 1009).cast("string"),
        when(v1 % 3 === 0, lit("/?utm_source=feed&z=1")).otherwise(lit(""))
      ).as("url"), (v1 % 5).cast("long").as("fetch_ts"))
    }

    val ops: Seq[(String, () => DataFrame)] = Seq(
      "q132_unigram_pack_ids" -> (() =>
        Packer.packTokenIds(spark,
          docs.select(col("doc_id"),
            UnigramLm.tokenIds(col("text"), uniModel).as("ids")),
          "doc_id", "ids", budgetTokens = 8192L)),
      "q135_unigram_marked_pack" -> (() =>
        Packer.packTokenIds(spark,
          docs.select(col("doc_id"),
            UnigramLm.tokenIdsMarked(col("text"), uniModel).as("ids")),
          "doc_id", "ids", budgetTokens = 8192L)),
      "q134_unigram_marked_roundtrip" -> (() =>
        docs.select(length(UnigramLm.decodeIds(
            UnigramLm.tokenIdsMarked(col("text"), uniModel), uniModel))
          .as("n")).agg(sum(col("n")).as("total_chars"))),
      "q133_url_keep_best" -> (() =>
        UrlDedup.dedupByUrlKeepBest(urlView, "doc_id", "url",
          col("fetch_ts"))),
      "q136_ivf_build_save" -> (() => {
        import spark.implicits._
        val p = s"/tmp/newops17_ivf_build_${nDocs}_${System.nanoTime()}"
        DenseIndex.ivfSaveIndex(spark,
          DenseIndex.ivfBuildIndex(embeddings, "vec_id", "embedding",
            nlist = nlist, scale = 1000), p)
        val out = Seq(p).toDF("path")
        out
      }),
      "q136_ivf_probe" -> (() =>
        DenseIndex.ivfTopKIndexed(ivfIx,
          embeddings.filter(col("vec_id") % (nDocs / 8) === 3),
          "vec_id", "embedding", k = 20, nProbe = nProbe)),
      "q137_hybrid_indexed" -> (() =>
        DenseIndex.hybridTopKIndexed(docs, "doc_id", "text",
          Seq("w7", "w42", "w1234"), bm25Ix, ivfIx,
          queryVecId = nDocs / 2, nSparse = 50, nDense = 50,
          nProbe = nProbe, topK = 20)))

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
