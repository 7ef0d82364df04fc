package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DenseIndexSpec extends SparkSpec {
  import spark.implicits._

  /** 24 vectors in 4-d, three well-separated clusters around
    * (0,0,0,0), (10,10,10,10), (-10,10,-10,10) with deterministic
    * per-id jitter. */
  private def vecs(ids: Seq[Long]) = ids.map { i =>
    val c = i % 3
    val base = c match {
      case 0 => Seq(0.0, 0.0, 0.0, 0.0)
      case 1 => Seq(10.0, 10.0, 10.0, 10.0)
      case _ => Seq(-10.0, 10.0, -10.0, 10.0)
    }
    (i, base.zipWithIndex.map { case (b, d) => b + ((i * 7 + d) % 5) * 0.1 })
  }.toDF("vec_id", "embedding")

  private def probeRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "rank")
      .as[(Long, Long, Long, Int)].collect().toSeq

  test("build/save/load roundtrip: loaded index is bit-equal (centroids, " +
      "scale, vector set); probe through the ARTIFACT equals ivfTopKInt " +
      "with the same centroids") {
    val e = vecs(1L to 24L)
    val built = DenseIndex.ivfBuildIndex(e, "vec_id", "embedding",
      nlist = 6, scale = 1000)
    val root = java.nio.file.Files.createTempDirectory("ivf_rt").toString
    DenseIndex.ivfSaveIndex(spark, built, root)
    val loaded = DenseIndex.ivfLoadIndex(spark, root)
    assert(loaded.scale == built.scale && loaded.nVectors == built.nVectors)
    assert(loaded.centroids.map(_._1) == built.centroids.map(_._1))
    assert(loaded.centroids.zip(built.centroids).forall {
      case ((_, a), (_, b)) => a.toSeq == b.toSeq })
    val vl = loaded.vectors.orderBy("neighbor_id")
      .as[(Long, Seq[Long], Long)].collect().toSeq
    val vb = built.vectors.orderBy("neighbor_id")
      .as[(Long, Seq[Long], Long)].collect().toSeq
    assert(vl == vb, "persisted vector set must be bit-equal")
    // probe parity with the oracle-checked in-memory operator
    val q = vecs(Seq(2L, 7L, 12L))
    val viaArtifact = probeRows(DenseIndex.ivfTopKIndexed(loaded, q,
      "vec_id", "embedding", k = 4, nProbe = 2))
    val direct = probeRows(Similarity.ivfTopKInt(e, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 4, nCentroids = 6, nProbe = 2,
      scale = 1000, centroids = Some(built.centroids)))
    assert(viaArtifact == direct,
      s"artifact probe diverged:\n$viaArtifact\nvs\n$direct")
  }

  test("probe plan prunes to the probed centroid PARTITIONS (the whole " +
      "point of IVF at scale): the parquet scan carries a centroid_id " +
      "partition filter") {
    val e = vecs(1L to 24L)
    val root = java.nio.file.Files.createTempDirectory("ivf_prune").toString
    DenseIndex.ivfSaveIndex(spark,
      DenseIndex.ivfBuildIndex(e, "vec_id", "embedding", nlist = 6,
        scale = 1000), root)
    val loaded = DenseIndex.ivfLoadIndex(spark, root)
    val probe = DenseIndex.ivfTopKIndexed(loaded, vecs(Seq(2L)),
      "vec_id", "embedding", k = 3, nProbe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"probe scan must partition-prune on centroid_id:\n$plan")
    assert(probe.count() > 0)
  }

  test("append under FROZEN centroids; replayed batchId is a no-op; " +
      "crash at every boundary: vectors-without-meta falls back and " +
      "recovers, two complete versions resolve newest, tampered vectors " +
      "fail the fingerprint") {
    val day1 = vecs(1L to 15L)
    val day2 = vecs(16L to 20L)
    def vecRows(i: DenseIndex.IvfIndex): Seq[(Long, Seq[Long], Long)] =
      i.vectors.orderBy("neighbor_id")
        .as[(Long, Seq[Long], Long)].collect().toSeq

    // normal append: day-2 vectors assign under the day-1 centroids
    val r0 = java.nio.file.Files.createTempDirectory("ivf_append").toString
    val built1 = DenseIndex.ivfBuildIndex(day1, "vec_id", "embedding",
      nlist = 4, scale = 1000)
    DenseIndex.ivfSaveIndex(spark, built1, r0)
    val once = DenseIndex.ivfAppendBatch(spark, r0, day2,
      "vec_id", "embedding", batchId = 7L)
    assert(once.nVectors == 20L)
    assert(once.centroids.map(_._1) == built1.centroids.map(_._1),
      "append must never move the centroids")
    // replay: ledger no-op
    val twice = DenseIndex.ivfAppendBatch(spark, r0, day2,
      "vec_id", "embedding", batchId = 7L)
    assert(twice.nVectors == 20L && vecRows(twice) == vecRows(once),
      "a replayed batch must be a no-op, not a double-insert")

    // crash point 1: vectors landed, meta did not
    val r1 = java.nio.file.Files.createTempDirectory("ivf_crash1").toString
    DenseIndex.ivfSaveIndex(spark, built1, r1)
    once.vectors.write.partitionBy("centroid_id")
      .parquet(s"$r1/v=1/ivf_vectors") // simulated interrupt
    val afterCrash1 = DenseIndex.ivfLoadIndex(spark, r1)
    assert(afterCrash1.nVectors == 15L,
      "an interrupted append must leave the pre-append state visible")
    assert(DenseIndex.ivfRecover(spark, r1) == 0L)
    assert(!new java.io.File(s"$r1/v=1").exists(),
      "recover must prune the interrupted version")
    // the retried append completes
    val retried = DenseIndex.ivfAppendBatch(spark, r1, day2,
      "vec_id", "embedding", batchId = 7L)
    assert(retried.nVectors == 20L && vecRows(retried) == vecRows(once))

    // crash point 2: two complete versions — newest wins, recover keeps it
    val r2 = java.nio.file.Files.createTempDirectory("ivf_crash2").toString
    val r2b = java.nio.file.Files.createTempDirectory("ivf_crash2b").toString
    DenseIndex.ivfSaveIndex(spark, built1, r2)
    DenseIndex.ivfSaveIndex(spark, once, r2b)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$r2b/v=0"),
      java.nio.file.Paths.get(s"$r2/v=1"))
    val afterCrash2 = DenseIndex.ivfLoadIndex(spark, r2)
    assert(afterCrash2.nVectors == 20L &&
      vecRows(afterCrash2) == vecRows(once),
      "with two complete versions the newest must win")
    assert(DenseIndex.ivfRecover(spark, r2) == 1L)
    assert(!new java.io.File(s"$r2/v=0").exists())

    // tampered vectors behind a committed meta: fingerprint is loud
    val r3 = java.nio.file.Files.createTempDirectory("ivf_tamper").toString
    DenseIndex.ivfSaveIndex(spark, built1, r3)
    Seq((999L, Seq(1L, 2L, 3L, 4L), 1L))
      .toDF("neighbor_id", "cv", "centroid_id")
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$r3/v=0/ivf_vectors")
    val e3 = intercept[IllegalArgumentException] {
      DenseIndex.ivfLoadIndex(spark, r3)
    }
    assert(e3.getMessage.contains("inconsistent"))

    // no complete version: loud at load; append to nothing: loud
    val r4 = java.nio.file.Files.createTempDirectory("ivf_none").toString
    val e4 = intercept[IllegalArgumentException] {
      DenseIndex.ivfLoadIndex(spark, r4)
    }
    assert(e4.getMessage.contains("no complete version"))
  }

  test("hybridTopKIndexed == Retrieval.hybridTopK at the same config: " +
      "the persisted-artifact fusion is result-equal to the per-call " +
      "path (both legs, fusion included)") {
    val docs = Seq(
      (1L, "merge vector stream merge"), (2L, "vector vector stream"),
      (3L, "stream join filter"), (4L, "merge filter"),
      (5L, "sort sort sort"), (7L, "vector merge stream"),
      (10L, "filter vector"), (13L, "merge stream"))
      .toDF("doc_id", "text")
    val e = vecs(Seq(1L, 2L, 3L, 4L, 5L, 7L, 10L, 13L))
    val root = java.nio.file.Files.createTempDirectory("ivf_hyb").toString
    CorpusStats.bm25SaveIndex(spark,
      CorpusStats.bm25BuildIndex(docs, "doc_id", "text"), s"$root/sparse")
    DenseIndex.ivfSaveIndex(spark,
      DenseIndex.ivfBuildIndex(e, "vec_id", "embedding", nlist = 4,
        scale = 1000), s"$root/dense")
    val got = DenseIndex.hybridTopKIndexed(docs, "doc_id", "text",
        Seq("merge", "vector", "stream"),
        CorpusStats.bm25LoadIndex(spark, s"$root/sparse"),
        DenseIndex.ivfLoadIndex(spark, s"$root/dense"),
        queryVecId = 3L, nSparse = 5, nDense = 5, nProbe = 2, topK = 6)
      .as[(Long, Long, Option[Int], Option[Int])].collect().toSeq
    // reference: the per-call path with the IVF dense leg at the same
    // (nlist, nProbe) — scale differs (hybridTopK's ivf path quantizes
    // at its own default 1000), centroids are the same lowest-id seeds
    val want = Retrieval.hybridTopK(docs, "doc_id", "text",
        Seq("merge", "vector", "stream"), e, "vec_id", "embedding",
        queryVecId = 3L, nSparse = 5, nDense = 5, topK = 6,
        denseIvf = Some((4, 2)))
      .as[(Long, Long, Option[Int], Option[Int])].collect().toSeq
    assert(got == want, s"fusion diverged:\n$got\nvs\n$want")
  }
}
