package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialization of GPT-style packed training sequences — the OUTPUT
  * stage of the corpus pipeline: q61/q91 compute each document's packing
  * COORDINATES (which fixed-length sequence its tokens land in); this
  * operator emits the sequences themselves, each exactly `budget` token
  * ids (the last one ragged), ready to shard and train on.
  *
  * 100 TB shape — the design constraint is that the corpus is
  * TOKEN-heavy but DOCUMENT-shaped: materializing by exploding one row
  * per token would shuffle O(corpus tokens) rows. Instead each document
  * is split NARROWLY (slice on its id array, no explode of tokens) into
  * the at-most-⌈n/budget⌉+1 contiguous PIECES that land in distinct
  * sequences, and only those pieces — O(docs + sequences) rows, each
  * carrying its ids as one array value — go through the sequence-keyed
  * exchange. Reassembly is a per-sequence sort_array over the (bounded:
  * ≤ budget tokens) collected pieces. Global coordinates come from
  * [[PrefixSum]]'s two-phase scan, so no stage funnels the corpus
  * through one task. Total payload movement, counted honestly: the
  * prefix-sum phase range-exchanges AND checkpoints the sized frame
  * (ids ride along so the encode feeding [[packTokenIds]] runs exactly
  * ONCE — the materialization doubles as the boundary pin and the
  * resume point), then the pieces cross the one sequence exchange —
  * a constant number of passes over the token payload, never a
  * per-token row explosion. Trading the checkpoint for a narrow
  * prefix sum + join-back would re-run the upstream encode or shuffle
  * the payload an extra time; this shape was chosen deliberately.
  *
  * Determinism: piece start offsets are exact integers off the prefix
  * sum; sort_array orders pieces by their global start, which is unique
  * within a sequence — the output is a pure function of (idCol order,
  * ids), independent of partitioning.
  */
object Packer {

  /** Pack per-document token-id arrays into consecutive `budget`-sized
    * sequences in global `idCol` order. Input: `idCol`, `idsCol`
    * (array&lt;int&gt;). Empty documents are dropped (they own no tokens).
    * Output: `seq_id` (0-based), `n_tokens` (= budget except the tail),
    * `token_ids` (array&lt;int&gt;).
    *
    * `withBoundaries = true` adds the columns a trainer needs to build
    * CROSS-DOCUMENT ATTENTION MASKS over packed sequences (the
    * T5/LLaMA-style packing contract — without them, attention bleeds
    * across the documents sharing a sequence): `n_docs` (documents with
    * ≥1 token in this sequence) and `doc_starts` (array&lt;int&gt;, each
    * document-piece's 0-based offset within the sequence, ascending;
    * a document CONTINUING from the previous sequence contributes
    * offset 0 — its continuation is a mask segment like any other).
    * Zero extra plan cost: the piece rows already carry their global
    * start, so boundaries are one more projection of the same
    * per-sequence sorted collect. */
  def packTokenIds(spark: SparkSession, docs: DataFrame, idCol: String,
                   idsCol: String, budgetTokens: Long,
                   withBoundaries: Boolean = false): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    val B = budgetTokens
    // LOUD guard (r16 verdict #6): a negative id is an encode-side unk
    // sentinel (-1) that must NEVER land in a training file — a trainer
    // would index an embedding table with it. assert_true rides the row
    // stream inside a filter (coalesce(null-on-pass, true)) so column
    // pruning cannot drop the check.
    val sized = docs
      .select(col(idCol), col(idsCol).as("__ids"),
        size(col(idsCol)).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .filter(coalesce(assert_true(
        !exists(col("__ids"), i => i < lit(0)),
        concat(lit("packTokenIds: negative token id in document "),
          col(idCol).cast("string"),
          lit(" — an unk sentinel must not reach a packed training " +
            "file; encode under a byte-fallback vocabulary " +
            "(Bpe.vocabBytes / UnigramLm.tokenIdsBytes) or clean the " +
            "input"))), lit(true)))
    val cum = PrefixSum.withRunningTotal(spark, sized, idCol, "__n", "__cum")
      .withColumn("__start", col("__cum") - col("__n"))
    // one row per (doc, sequence-it-touches): slice the id array at the
    // sequence boundaries — narrow ops only, token count never explodes
    val pieces = cum
      .withColumn("seq_id",
        explode(sequence(expr(s"__start div $B"),
          expr(s"(__cum - 1) div $B"))))
      .withColumn("__pfrom", greatest(col("__start"), expr(s"seq_id * $B")))
      .withColumn("__plen",
        least(col("__cum"), expr(s"(seq_id + 1) * $B")) - col("__pfrom"))
      .select(col("seq_id"), col("__pfrom"),
        slice(col("__ids"), (col("__pfrom") - col("__start") + 1).cast("int"),
          col("__plen").cast("int")).as("__pids"))
    val seqs = pieces.groupBy(col("seq_id"))
      .agg(sort_array(collect_list(struct(col("__pfrom"), col("__pids"))))
        .as("__ps"))
    val base = seqs
      .withColumn("token_ids",
        flatten(transform(col("__ps"), p => p.getField("__pids"))))
    if (!withBoundaries)
      base.select(col("seq_id"),
        size(col("token_ids")).as("n_tokens"), col("token_ids"))
    else
      base.select(col("seq_id"),
        size(col("token_ids")).as("n_tokens"), col("token_ids"),
        size(col("__ps")).as("n_docs"),
        transform(col("__ps"),
          p => (p.getField("__pfrom") - col("seq_id") * B).cast("int"))
          .as("doc_starts"))
  }
}
