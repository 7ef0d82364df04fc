package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // Deterministic synthetic corpus: 100 vectors in 8 dims; vectors 50..59
  // are small perturbations of vector 0 (a planted near-dup cluster).
  private lazy val vecs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(8)(rnd.nextGaussian().toFloat)
    (0L until 100L).map { i =>
      val v =
        if (i == 0L) base.toSeq
        else if (i >= 50L && i < 60L)
          base.map(x => x + 0.01f * rnd.nextGaussian().toFloat).toSeq
        else Seq.fill(8)(rnd.nextGaussian().toFloat)
      (i, v)
    }
  }
  private lazy val corpus = vecs.toDF("vec_id", "embedding")

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val d  = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    d / (na * nb)
  }

  test("bruteForceTopK matches a driver-side exact ranking") {
    val queries = corpus.filter(col("vec_id") === 0)
    val got = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    val byId = vecs.toMap
    val expected = vecs.map { case (i, v) => (i, cos(byId(0L), v)) }
      .sortBy { case (i, c) => (-c, i) }.take(5).map(_._1)
    assert(got == expected)
    assert(got.head == 0L) // self is its own nearest neighbor
  }

  test("srpTopK returns bucket-restricted exact-cosine ranking; finds the planted cluster") {
    val queries = corpus.filter(col("vec_id") === 0)
    val got = Similarity.srpTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 11, dim = 8, bits = 4)
      .select("neighbor_id").as[Long].collect().toSet
    // perturbed copies land in the same SRP bucket as the query with
    // near-certainty at 0.01 noise; require most of the cluster recalled
    val cluster = (Set(0L) ++ (50L until 60L)).intersect(got)
    assert(cluster.size >= 8, s"recalled only $cluster")
  }

  test("embeddingNearDups finds the planted cluster pairs and nothing below threshold") {
    val got = Similarity.embeddingNearDups(corpus, "vec_id", "embedding",
      dim = 8, threshold = 0.999, bits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val byId = vecs.toMap
    // every reported pair truly exceeds the threshold (no false positives)
    got.foreach { case (a, b) => assert(cos(byId(a), byId(b)) >= 0.999) }
    // the planted pairs are recovered (multi-seed blocking recall)
    val planted = for {
      a <- 50L until 60L; b <- (a + 1) until 60L
      if cos(byId(a), byId(b)) >= 0.999
    } yield (a, b)
    assert(planted.nonEmpty)
    val recalled = planted.count(got.contains).toDouble / planted.size
    assert(recalled >= 0.9, s"recall $recalled of ${planted.size} planted pairs")
  }

  test("hyperplanes are deterministic across calls") {
    val a = Similarity.hyperplanes(4, 3)
    val b = Similarity.hyperplanes(4, 3)
    assert(a.flatten == b.flatten)
  }

  // ---- integer-SRP (engine-portable) variants ----

  private def quant(v: Seq[Float], scale: Int): Array[Long] =
    v.map(x => math.round(x.toDouble * scale)).toArray

  private def intBucket(q: Array[Long], planes: Seq[Array[Int]]): Long =
    planes.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
      val dot = q.zip(p).map { case (x, c) => x * c }.sum
      if (dot >= 0) acc | (1L << i) else acc
    }

  test("srpTopKInt matches a full driver-side integer replay") {
    val queries = corpus.filter(col("vec_id") < 3)
    val got = Similarity.srpTopKInt(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 4, dim = 8, bits = 4)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id", "qdot", "rank")
      .as[(Long, Long, Long, Int)].collect().toSeq
    // replay: same planes, same quantization, same bucket + ranking rules
    val planes = Similarity.rademacherPlanes(8, 4, 42L)
    val q = vecs.map { case (i, v) => (i, quant(v, 10000)) }
    val buckets = q.map { case (i, qv) => (i, intBucket(qv, planes)) }.toMap
    val byId = q.toMap
    val expected = for {
      qid <- 0L until 3L
      ranked = q.filter { case (cid, _) => buckets(cid) == buckets(qid) }
        .map { case (cid, cv) =>
          (cid, cv.zip(byId(qid)).map { case (x, y) => x * y }.sum) }
        .sortBy { case (cid, dot) => (-dot, cid) }.take(4)
      ((nid, dot), r) <- ranked.zipWithIndex
    } yield (qid, nid, dot, r + 1)
    assert(got == expected)
  }

  test("embeddingNearDupsInt: integer threshold test is exact; planted cluster recalled") {
    // scale 100 keeps qdot^2 * tden^2 far below Long overflow at tden=1000
    val got = Similarity.embeddingNearDupsInt(corpus, "vec_id", "embedding",
        dim = 8, thresholdNum = 999, thresholdDen = 1000, bits = 4, scale = 100)
      .select("id_a", "id_b", "qdot").as[(Long, Long, Long)].collect().toSeq
    val byId = vecs.map { case (i, v) => (i, quant(v, 100)) }.toMap
    // every reported pair passes the integer test exactly (no float wobble)
    got.foreach { case (a, b, qdot) =>
      val qa = byId(a); val qb = byId(b)
      val d = qa.zip(qb).map { case (x, y) => x * y }.sum
      assert(d == qdot)
      val na2 = qa.map(x => x * x).sum
      val nb2 = qb.map(x => x * x).sum
      assert(d > 0 && d * d * 1000000L >= 999L * 999L * na2 * nb2)
    }
    // planted near-identical cluster pairs survive blocking + threshold
    val ids = got.map { case (a, b, _) => (a, b) }.toSet
    val planted = for {
      a <- 50L until 60L; b <- (a + 1) until 60L
      qa = byId(a); qb = byId(b)
      d = qa.zip(qb).map { case (x, y) => x * y }.sum
      if d > 0 && d * d * 1000000L >= 999L * 999L *
        qa.map(x => x * x).sum * qb.map(x => x * x).sum
    } yield (a, b)
    assert(planted.nonEmpty)
    val recalled = planted.count(ids.contains).toDouble / planted.size
    assert(recalled >= 0.9, s"recall $recalled of ${planted.size} planted pairs")
  }

  test("rademacherPlanes are deterministic ±1 and seed-distinct") {
    val a = Similarity.rademacherPlanes(16, 4, 42L)
    val b = Similarity.rademacherPlanes(16, 4, 42L)
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    assert(a.flatten.forall(x => x == 1 || x == -1))
    val c = Similarity.rademacherPlanes(16, 4, 43L)
    assert(a.map(_.toSeq) != c.map(_.toSeq))
  }

  test("autoBits bounds expected bucket population; requireSaneBits guards") {
    // 1M rows at 256/bucket -> 4096 buckets -> 12 bits
    assert(Similarity.autoBits(1000000L, 256L) == 12)
    assert(Similarity.autoBits(100L, 256L) == 1)   // clamp floor
    assert(Similarity.autoBits(Long.MaxValue, 1L) == 62) // clamp ceiling
    Similarity.requireSaneBits(bits = 12, corpusRows = 1000000L) // fine
    val e = intercept[IllegalArgumentException] {
      // 6 bits over 10M rows -> ~156k rows/bucket: the 100 TB mega-bucket
      Similarity.requireSaneBits(bits = 6, corpusRows = 10000000L)
    }
    assert(e.getMessage.contains("raise bits"))
  }
}
