package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, UnigramLm}
import graft.operators.{CorpusStats, Dedup, Retrieval, UrlDedup}

/** Scaling sweep for the round-16 additions (q126-q131) over
  * GenScaleData rich<N> corpora — one JVM per scale point, WindowProbe
  * bracketing in-file (the NewOpsScale discipline).
  *
  * Configs are the PRODUCTION shapes: containment-incremental runs the
  * hot-shingle cap over a 10% batch vs the 90% index; unigram training
  * runs a production-sized vocab; encode and more-like-this run
  * against PRE-BUILT artifacts (the deployment read path — artifact
  * build is its own timed row). q127's dense side runs over
  * deterministic synthetic 64-dim embeddings derived from doc_id
  * (rich dirs carry documents only); the probe shape — quantize, one
  * broadcast query, TakeOrdered — is what is being measured.
  *
  * usage: NewOps16Scale <docsDir> [reps] */
object NewOps16Scale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: NewOps16Scale <docsDir> [reps]")
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
      .appName("graft-newops16-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = spark.read.parquet(s"$docsDir/documents.parquet")
    val nDocs = docs.count()

    // pre-built artifacts (deployment read path; build cost is timed in
    // its own rows below)
    val uniModel = UnigramLm.train(docs, "text", seedSize = 4000,
      vocabSize = 1000, emRounds = 2, maxPieceLen = 8, maxWordLen = 24)
    // persisted ON DISK (the real artifact shape): the timing loop's
    // clearCache() must not silently turn "read the artifact" back
    // into "rebuild the stats from the corpus"
    val ixPath = s"/tmp/newops16_bm25_$nDocs"
    CorpusStats.bm25SaveIndex(spark,
      CorpusStats.bm25BuildIndex(docs, "doc_id", "text"), ixPath)
    val bm25Ix = CorpusStats.bm25LoadIndex(spark, ixPath, validate = false)
    // deterministic synthetic embeddings off doc_id (64-dim)
    def embeddings: DataFrame = docs.select(col("doc_id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (pmod(xxhash64(col("doc_id"), j, lit(7L)), lit(2000L)).cast("double")
          / 1000.0 - 1.0).cast("float")).as("embedding"))

    val urlView: DataFrame = {
      val v1 = conv(substring(md5(concat(lit("graft-q129:"),
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
      ).as("url"))
    }

    val ops: Seq[(String, () => DataFrame)] = Seq(
      "q126_unigram_train" -> (() => {
        import spark.implicits._
        val m = UnigramLm.train(docs, "text", seedSize = 4000,
          vocabSize = 1000, emRounds = 2, maxPieceLen = 8, maxWordLen = 24)
        m.pieces.map(p => (p.piece, p.freq, p.logpQ))
          .toDF("piece", "freq", "logp_q")
      }),
      "q131_unigram_encode" -> (() =>
        docs.select(col("doc_id"),
            UnigramLm.pieceCount(col("text"), uniModel).as("n_pieces"))
          .agg(sum(col("n_pieces")).as("total_pieces"))),
      "q127_hybrid_rrf" -> (() =>
        Retrieval.hybridTopK(docs, "doc_id", "text",
          Seq("w7", "w42", "w1234"), embeddings, "vec_id", "embedding",
          queryVecId = nDocs / 2, nSparse = 50, nDense = 50, topK = 20,
          index = Some(bm25Ix))),
      "q128_containment_incr" -> (() => {
        val index = Dedup.nearDupIndex(docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", numHashes = 64, shingleN = 3)
        Dedup.containmentIncremental(docs.filter(col("doc_id") % 10 === 0),
          index, "doc_id", "text", shingleN = 3, thresholdNum = 5,
          thresholdDen = 10)
      }),
      "q129_url_dedup" -> (() =>
        UrlDedup.urlGroups(urlView, "doc_id", "url")),
      "q130_mlt_indexed" -> (() =>
        CorpusStats.moreLikeThisIndexed(docs, "doc_id", "text",
          seedId = nDocs / 2, bm25Ix, nTerms = 3, topK = 15)))

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
