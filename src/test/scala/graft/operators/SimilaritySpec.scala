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
}
