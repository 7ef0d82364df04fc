package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + fixed-size training-shard layout — the
  * last step of every pretraining data pipeline: the curated corpus is
  * permuted by a hash of its id (so the order is reproducible,
  * restart-stable, and independent of input file layout) and cut into
  * equal-size shards for the trainer's data loader.
  *
  * The naive formulation is `row_number() OVER (ORDER BY md5(id))` — an
  * `Exchange SinglePartition` that funnels 100 TB through one task. This
  * operator instead reuses [[PrefixSum]]'s two-phase parallel scan: range
  * partition by the shuffle key, per-partition parallel rank, tiny
  * per-partition totals broadcast back as offsets. No serial stage; two
  * data shuffles total, both on the 16-byte key + id only (the payload is
  * joined back — or, as in [[shardPlan]], never carried at all).
  *
  * Determinism contract: the permutation position of a row is a pure
  * function of the SET of ids in the corpus (md5 rank), not of partition
  * layout, task scheduling, or sampled range boundaries — PrefixSum pins
  * its boundaries with one materialization, and md5(id) is unique when
  * ids are, so the total order is tie-free. A re-run over the same corpus
  * yields byte-identical shards — the retry/debug property q55/q64/q68
  * establish for sampling, extended here to corpus layout.
  *
  * 100 TB design: shard count = corpus_rows / shardSize is decided by the
  * PLAN (this frame), not by writer parallelism; the physical write is
  * `repartitionByRange(shard_id)` + `partitionBy(shard_id)` so each shard
  * is one writer task's sequential output and shards stream in parallel
  * across the cluster (see ShardingSpec's write round-trip).
  */
object Sharding {

  /** Shard layout plan: appends `shuffle_key` (md5 of the id), global
    * permutation position `pos` (0-based), `shard_id` and `pos_in_shard`
    * for fixed `shardSize`. Only `idCol` is carried through the rank
    * exchanges — join the plan back to the payload on `idCol` (or pass a
    * pre-projected frame) so the two prefix-sum shuffles move 24-byte
    * rows, not documents. */
  def shardPlan(spark: SparkSession, df: DataFrame, idCol: String,
                shardSize: Long): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val keyed = df.select(col(idCol),
        md5(col(idCol).cast("string")).as("shuffle_key"))
      .withColumn("__one", lit(1L))
    val ranked = PrefixSum.withRunningTotal(spark, keyed,
      orderCol = "shuffle_key", valueCol = "__one", outCol = "__rank")
    ranked.select(
      col(idCol),
      col("shuffle_key"),
      (col("__rank") - 1).as("pos"),
      // integer `div`, not `/`: Column `/` is double division, which
      // silently loses exactness past 2^53 — at 100 TB row counts that
      // is a real, not theoretical, range.
      expr(s"(__rank - 1) div ${shardSize}L").as("shard_id"),
      ((col("__rank") - 1) % shardSize).as("pos_in_shard"))
  }

  /** Physical shard write: plan + payload → one parquet directory per
    * shard, rows inside each shard in permutation order. Each shard is
    * range-owned by one task (`repartitionByRange(shard_id)` then a
    * per-partition sort), so writers scale with shard count and a shard's
    * file is written sequentially — the trainer-facing layout. */
  def writeShards(spark: SparkSession, df: DataFrame, idCol: String,
                  shardSize: Long, outDir: String): Unit = {
    val plan = shardPlan(spark, df, idCol, shardSize)
    if (df.isEmpty) {
      // zero curated rows (an over-aggressive gate upstream, a dry
      // rerun): partitionBy over nothing writes a FILELESS directory
      // that read-back cannot even infer a schema from
      // (UNABLE_TO_INFER_SCHEMA) — the batch edition of the streaming
      // fileless-sink lesson. Write the empty frame UNPARTITIONED so
      // the full schema (shard_id included, now as a data column)
      // survives and downstream reads see zero rows, not a crash. The
      // probe is a limit-1 scan of the raw input — narrow and cheap at
      // any corpus size, unlike probing the joined plan (which would
      // force the rank shuffles just to learn the count).
      // Schema ALIGNMENT with the non-empty layout (r11 ADVICE): the
      // partitioned read infers shard_id as INT and appends it LAST, so
      // the stub frame casts and reorders to match — a consumer that
      // unions or schema-matches empty and non-empty runs sees ONE
      // shape. (Partition inference would only widen to LONG past 2^31
      // shards — beyond any realistic layout; writeShards pins INT.)
      val joined = plan.join(df, Seq(idCol))
      val aligned = joined
        .select((joined.columns.filter(_ != "shard_id").map(col) :+
          col("shard_id").cast("int")): _*)
      aligned.write.mode("overwrite").parquet(outDir)
      return
    }
    plan.join(df, Seq(idCol))
      .repartitionByRange(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("pos_in_shard"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(outDir)
  }
}
