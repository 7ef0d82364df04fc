package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** HYBRID retrieval — reciprocal-rank fusion (RRF; Cormack et al.,
  * SIGIR 2009) of the engine's two shipped index families: sparse BM25
  * ([[CorpusStats.bm25TopK]] / the q120 artifact) and dense ANN
  * ([[Similarity]] / the q42 integer-dot ranking). The retrieval shape
  * deployed stacks actually run: lexical recall catches exact
  * terminology, dense recall catches paraphrase, and rank fusion needs
  * NO score calibration between the two systems (ranks are unitless).
  *
  * Determinism: RRF is computed in exact integer arithmetic —
  * contribution of rank r is floor(1e6 / (k + r)) (both factors small
  * integers; the double division is exact well past this magnitude and
  * the floor makes it an integer divide, spelled `//` in the oracle).
  * A document absent from one list contributes 0 from it. Final order:
  * (rrf_i DESC, id ASC) — a total order.
  *
  * 100 TB design: fusion itself touches only the two TOP-N LISTS
  * (driver-bounded by construction, N ≤ hundreds); the corpus-sized
  * work is exactly the two index probes that produced them — BM25's
  * zero-wide-shuffle scoring scan and the ANN probe — so the fused
  * query plan has ZERO corpus shuffles beyond what each index already
  * pays (plan-pinned in RetrievalSpec). */
object Retrieval {

  /** Fuse two ranked lists by RRF. Inputs must carry (`idCol`,
    * `rankCol`) with rank 1 = best and no duplicate ids per list.
    * Output: (idCol, rrf_i, sparse_rank, dense_rank), rank columns
    * null for a document the corresponding list did not return. */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, idCol: String,
              rankCol: String = "rank", kRrf: Int = 60,
              topK: Int = 10): DataFrame = {
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    def contrib(rank: Column): Column =
      coalesce(floor(lit(1000000.0) / (lit(kRrf) + rank)).cast("long"),
        lit(0L))
    val s = sparse.select(col(idCol), col(rankCol).as("sparse_rank"))
    val d = dense.select(col(idCol), col(rankCol).as("dense_rank"))
    s.join(d, Seq(idCol), "full_outer")
      .select(col(idCol),
        (contrib(col("sparse_rank")) + contrib(col("dense_rank")))
          .as("rrf_i"),
        col("sparse_rank").cast("int").as("sparse_rank"),
        col("dense_rank").cast("int").as("dense_rank"))
      .orderBy(col("rrf_i").desc, col(idCol))
      .limit(topK)
  }

  /** End-to-end hybrid query: BM25 over `docs` for `queryTerms` (top
    * `nSparse`, ranked by the q113 convention — score DESC, id ASC)
    * fused with brute-force integer-dot ANN over `embeddings` for the
    * stored query vector `queryVecId` (top `nDense`, qdot DESC, id ASC
    * — the q42 convention). Document identity is the shared id space
    * (`idCol` == `vecIdCol` values). Pass a [[CorpusStats.Bm25Index]]
    * to score the sparse side from the persisted artifact instead of a
    * per-call stats aggregate. */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], embeddings: DataFrame,
                 vecIdCol: String, vecCol: String, queryVecId: Long,
                 nSparse: Int = 20, nDense: Int = 20, kRrf: Int = 60,
                 topK: Int = 10,
                 index: Option[CorpusStats.Bm25Index] = None,
                 denseIvf: Option[(Int, Int)] = None): DataFrame = {
    val sparseHits = index match {
      case Some(ix) => CorpusStats.bm25TopKIndexed(docs, idCol, textCol,
        queryTerms, ix, topK = nSparse)
      case None => CorpusStats.bm25TopK(docs, idCol, textCol, queryTerms,
        topK = nSparse)
    }
    // the top-N frame is N rows; the rank window runs over those only
    val sparse = sparseHits.withColumn("rank", row_number().over(
      Window.orderBy(col("score_i").desc, col(idCol))))
    // dense side: exact brute integer-dot (the q42 oracle shape) by
    // default; `denseIvf = Some((nCentroids, nProbe))` routes through
    // the IVF-Flat scale path (q62 — centroid-list-pruned probe, L2
    // ranking; RRF consumes RANKS, so the metric swap composes cleanly)
    val dense = denseIvf match {
      case Some((nc, np)) =>
        Similarity.ivfTopKInt(embeddings, vecIdCol, vecCol,
            embeddings.filter(col(vecIdCol) === queryVecId),
            vecIdCol, vecCol, k = nDense, nCentroids = nc, nProbe = np)
          .select(col("neighbor_id").as(idCol), col("rank"))
      case None =>
        val corpus = embeddings.select(col(vecIdCol).as(idCol),
          VectorFns.quantize(col(vecCol)).as("cv"))
        val qv = embeddings.filter(col(vecIdCol) === queryVecId)
          .select(VectorFns.quantize(col(vecCol)).as("qv"))
        corpus.crossJoin(broadcast(qv))
          .select(col(idCol),
            VectorFns.quantizedDot(col("cv"), col("qv")).as("qdot"))
          .orderBy(col("qdot").desc, col(idCol))
          .limit(nDense)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("qdot").desc, col(idCol))))
    }
    rrfFuse(sparse, dense, idCol, "rank", kRrf, topK)
  }
}
