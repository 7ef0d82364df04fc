package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`array<float>`), per the north-star extension list.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k of a *small* query set against
  *    the full corpus — broadcast the queries, one corpus scan, per-query
  *    window top-k. At 100 TB this is the right baseline when |queries| is
  *    small (the corpus scan dominates and is embarrassingly parallel; no
  *    shuffle of the corpus, only of (query, topk-candidate) rows).
  *  - [[srpTopK]]: sign-random-projection LSH bucketing — corpus and queries
  *    hashed into 2^bits buckets by deterministic hyperplanes; candidates are
  *    bucket collisions (optionally multi-probe over Hamming-1 neighbor
  *    buckets), exact cosine re-rank inside the bucket. The corpus side can
  *    be pre-bucketed on write (partitionBy("bucket")) so queries prune
  *    partitions instead of scanning.
  */
object Similarity {

  /** Deterministic Gaussian hyperplanes (fixed seed -> identical across
    * executors/JVMs; java.util.Random LCG is specified). */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Exact cosine top-k per query. `queries` must be small (broadcast). */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    val scored = corpus.crossJoin(
        broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))))
      .withColumn("cosine", VectorFns.cosine(col(corpusVec), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(corpusId).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(corpusId).as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Adds a deterministic SRP LSH bucket column. */
  def withSrpBucket(df: DataFrame, vecCol: String, dim: Int, bits: Int = 12,
                    seed: Long = 42L, out: String = "bucket"): DataFrame =
    df.withColumn(out, VectorFns.srpBucket(col(vecCol), hyperplanes(dim, bits, seed)))

  /** LSH-bucketed ANN top-k: candidates share the query's SRP bucket;
    * exact cosine re-rank within bucket. Recall grows with lower `bits`
    * (bigger buckets) — callers trade recall for candidate count. */
  def srpTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, dim: Int, bits: Int = 8, seed: Long = 42L): DataFrame = {
    val c = withSrpBucket(corpus, corpusVec, dim, bits, seed)
      .select(col("bucket"), col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
    val q = withSrpBucket(queries, queryVec, dim, bits, seed)
      .select(col("bucket"), col(queryId).as("query_id"), col(queryVec).as("__qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(q, Seq("bucket"))
      .withColumn("cosine", VectorFns.cosine(col("__cv"), col("__qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Embedding near-duplicate pairs: SRP-bucket blocking + exact cosine >=
    * threshold inside each bucket (near-identical vectors collide with high
    * probability; multi-band variant = run with several seeds and union). */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                        threshold: Double = 0.95, bits: Int = 10,
                        seeds: Seq[Long] = Seq(42L, 43L, 44L)): DataFrame = {
    val pairs = seeds.map { s =>
      val b = withSrpBucket(df, vecCol, dim, bits, s)
        .select(col("bucket"), col(idCol), col(vecCol))
        // shared exchange: both self-join sides reuse one bucket computation
        .repartition(col("bucket"))
      val a = b.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("__va"))
      val c = b.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("__vb"))
      a.join(c, Seq("bucket")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("__va"), col("__vb"))
    }.reduce(_ unionByName _).dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("cosine", VectorFns.cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
