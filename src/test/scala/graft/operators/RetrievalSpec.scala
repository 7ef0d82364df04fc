package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: exact integer contributions, absent-list zero, " +
      "(rrf desc, id) total order, topK cut") {
    val sparse = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val dense = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(sparse, dense, "doc_id", topK = 10)
      .as[(Long, Long, Option[Int], Option[Int])].collect().toSeq
    def c(r: Int) = math.floor(1000000.0 / (60 + r)).toLong
    // 20: both lists (rank 2 sparse + rank 1 dense) — the fused winner
    assert(got.head == ((20L, c(2) + c(1), Some(2), Some(1))))
    assert(got.map(_._1) == Seq(20L, 10L, 40L, 30L))
    val by = got.map(r => r._1 -> r._2).toMap
    assert(by(10L) == c(1) && by(40L) == c(2) && by(30L) == c(3))
    // topK cuts after ordering
    val cut = Retrieval.rrfFuse(sparse, dense, "doc_id", topK = 2)
      .as[(Long, Long, Option[Int], Option[Int])].collect().toSeq
    assert(cut.map(_._1) == Seq(20L, 10L))
  }

  test("rrfFuse: equal-rrf ties break by id ascending") {
    // two docs each only in one list at the same rank → equal rrf
    val sparse = Seq((7L, 1)).toDF("doc_id", "rank")
    val dense = Seq((3L, 1)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(sparse, dense, "doc_id", topK = 5)
      .as[(Long, Long, Option[Int], Option[Int])].collect().toSeq
    assert(got.map(_._1) == Seq(3L, 7L))
    assert(got(0)._2 == got(1)._2)
  }

  test("hybridTopK: fused result == hand-fused bm25TopK + brute dense " +
      "lists; indexed sparse path identical; zero corpus-keyed " +
      "exchanges beyond the two probes (plan pin)") {
    val docs = Seq(
      (1L, "merge scan merge"), (2L, "vector stream"), (3L, "scan scan"),
      (4L, "merge vector"), (5L, "stream stream stream"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(0.9f, 0.1f)), (2L, Array(0.1f, 0.9f)),
      (3L, Array(0.5f, 0.5f)), (4L, Array(0.8f, 0.2f)),
      (5L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val fused = Retrieval.hybridTopK(docs, "doc_id", "text",
      Seq("merge", "stream"), emb, "vec_id", "embedding", queryVecId = 1L,
      nSparse = 3, nDense = 3, topK = 5)
    val got = fused.as[(Long, Long, Option[Int], Option[Int])]
      .collect().toSeq
    // hand-fuse from the two primitives
    val sp = CorpusStats.bm25TopK(docs, "doc_id", "text",
        Seq("merge", "stream"), topK = 3)
      .select("doc_id").as[Long].collect().toSeq.zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
    def qz(a: Array[Float]) = a.map(x => math.round(x.toDouble * 10000))
    val q = qz(vecs(1L))
    val denseRank = vecs.toSeq
      .map { case (id, v) => id -> qz(v).zip(q).map { case (a, b) => a * b }.sum }
      .sortBy { case (id, d) => (-d, id) }.take(3).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    def c(r: Int) = math.floor(1000000.0 / (60 + r)).toLong
    got.foreach { case (id, rrf, sr, dr) =>
      assert(sr == sp.get(id) && dr == denseRank.get(id),
        s"doc $id ranks: got ($sr,$dr), expect (${sp.get(id)},${denseRank.get(id)})")
      assert(rrf == sp.get(id).map(c).getOrElse(0L) +
        denseRank.get(id).map(c).getOrElse(0L))
    }
    // indexed sparse path: same result when the artifact covers the corpus
    val ix = CorpusStats.bm25BuildIndex(docs, "doc_id", "text")
    val fusedIx = Retrieval.hybridTopK(docs, "doc_id", "text",
        Seq("merge", "stream"), emb, "vec_id", "embedding", queryVecId = 1L,
        nSparse = 3, nDense = 3, topK = 5, index = Some(ix))
      .as[(Long, Long, Option[Int], Option[Int])].collect().toSeq
    assert(fusedIx == got)
    // plan pin: the fused plan's only wide exchanges are SinglePartition
    // ones belonging to the two TakeOrdered/window probes and the tiny
    // fusion join — NO corpus-keyed hash exchange anywhere
    val plan = fused.queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning\\((doc_id|vec_id)#\\d+L, \\d+\\)"
      .r.findAllIn(plan).size
    assert(hashEx == 0,
      s"hybrid plan must not shuffle the corpus by id:\n$plan")
  }

  test("hybridTopK with the IVF dense path: at nProbe == nCentroids == 1 " +
      "(every vector in one list) the dense ranks are the exact L2 " +
      "ranking, fused identically to a hand-derived RRF") {
    val docs = Seq(
      (1L, "merge scan"), (2L, "vector stream"), (3L, "scan scan"),
      (4L, "merge vector"), (5L, "stream merge"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(0.9f, 0.1f)), (2L, Array(0.1f, 0.9f)),
      (3L, Array(0.5f, 0.5f)), (4L, Array(0.8f, 0.2f)),
      (5L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Retrieval.hybridTopK(docs, "doc_id", "text", Seq("merge"),
        emb, "vec_id", "embedding", queryVecId = 1L,
        nSparse = 3, nDense = 3, topK = 5, denseIvf = Some((1, 1)))
      .as[(Long, Long, Option[Int], Option[Int])].collect().toSeq
    // hand-derive: dense = exact integer L2 ranking (scale 1000,
    // dist2 asc, id asc), sparse = bm25 ranking
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
    def qz(a: Array[Float]) = a.map(x => math.round(x.toDouble * 1000))
    val q = qz(vecs(1L))
    val denseRank = vecs.toSeq
      .map { case (id, v) =>
        val d2 = qz(v).zip(q).map { case (a, b) =>
          (a - b) * (a - b) }.sum
        id -> d2
      }
      .sortBy { case (id, d) => (d, id) }.take(3).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val sp = CorpusStats.bm25TopK(docs, "doc_id", "text", Seq("merge"),
        topK = 3)
      .select("doc_id").as[Long].collect().toSeq.zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    def c(r: Int) = math.floor(1000000.0 / (60 + r)).toLong
    got.foreach { case (id, rrf, sr, dr) =>
      assert(sr == sp.get(id) && dr == denseRank.get(id),
        s"doc $id ranks: got ($sr,$dr), expect (${sp.get(id)},${denseRank.get(id)})")
      assert(rrf == sp.get(id).map(c).getOrElse(0L) +
        denseRank.get(id).map(c).getOrElse(0L))
    }
  }
}
