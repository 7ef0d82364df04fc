package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, DenseIndex, Similarity}

/** r17 attribution probe: replays the q136/q120 production-twin artifact
  * lifecycles step by step and prints the Spark-job count + wall of each
  * step, so lifecycle optimization targets measured cost (guide §1).
  * Usage: jrun graft.tools.LifecycleProbe [sfDir]
  */
object LifecycleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("PROBE_TRACE"))
          println(s"    [job ${e.jobId}] " +
            e.stageInfos.map(si => si.name.takeWhile(_ != '\n')).distinct
              .mkString(" | "))
      }
    })
    def step[A](label: String)(f: => A): A = {
      Thread.sleep(100); jobs.set(0)
      val t0 = System.nanoTime(); val r = f
      Thread.sleep(100)
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%6.2fs ${jobs.get}%3d jobs")
      r
    }

    def T(n: String) = spark.read.parquet(s"$dir/$n.parquet")

    // ---- q136 twin lifecycle, step by step (two passes: warm then timed)
    for (round <- Seq("warm", "timed")) {
      println(s"== q136 twin ($round)")
      val e = T("embeddings")
      val day1 = e.filter(col("vec_id") % 5 =!= 0)
      val day2 = e.filter(col("vec_id") % 5 === 0)
      val nlist = step("autoNlist count")(Similarity.autoNlist(day1.count()))
      val path = java.nio.file.Files.createTempDirectory("probe_ivf").toString
      val init = step("kmeans++ init")(
        graft.operators.KMeansInt.kmeansPlusPlusInit(day1, "vec_id",
          "embedding", nlist, scale = 1000))
      val cents = step("kmeans converge")(
        graft.operators.KMeansInt.converge(day1, "vec_id", "embedding",
          init, scale = 1000)._1)
      val vecs = day1.select(col("vec_id").cast("long").as("neighbor_id"),
          graft.functions.VectorFns.quantize(col("embedding"), 1000).as("cv"))
        .withColumn("centroid_id", Similarity.centroidArgmin(cents)(col("cv")))
      val built = DenseIndex.IvfIndex(cents, 1000, -1L, vecs)
      step("ivfSaveIndex (writeVersion)")(
        DenseIndex.ivfSaveIndex(spark, built, path))
      step("ivfAppendBatch day2")(
        DenseIndex.ivfAppendBatch(spark, path, day2, "vec_id", "embedding",
          batchId = 1L))
      step("ivfAppendBatch replay (no-op)")(
        DenseIndex.ivfAppendBatch(spark, path, day2, "vec_id", "embedding",
          batchId = 1L))
      val idx = step("ivfLoadIndex validate")(
        DenseIndex.ivfLoadIndex(spark, path))
      step("probe + localCheckpoint") {
        DenseIndex.ivfTopKIndexed(idx, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, nProbe = math.min(2, nlist))
          .orderBy(col("query_id"), col("rank"))
          .localCheckpoint(true)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }

    // ---- q120 lifecycle, step by step
    for (round <- Seq("warm", "timed")) {
      println(s"== q120 ($round)")
      val docs = T("documents")
      val day1 = docs.filter(col("doc_id") % 5 =!= 0)
      val day2 = docs.filter(col("doc_id") % 5 === 0)
      val path = java.nio.file.Files.createTempDirectory("probe_bm25").toString
      step("bm25BuildSaveIndex day1")(
        CorpusStats.bm25BuildSaveIndex(spark, day1, "doc_id", "text", path))
      step("bm25UpdateIndex day2")(
        CorpusStats.bm25UpdateIndex(spark, path, day2, "doc_id", "text"))
      val idx = step("bm25LoadIndex validate")(
        CorpusStats.bm25LoadIndex(spark, path))
      step("bm25TopKIndexed + noop") {
        CorpusStats.bm25TopKIndexed(docs, "doc_id", "text",
            Seq("join", "filter", "sort"), idx, topK = 25)
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
    spark.stop()
  }
}
