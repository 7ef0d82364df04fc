package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Token-window document chunking — the context-window shaping step of a
  * training / evaluation / retrieval corpus: every document is split into
  * fixed-size token windows with a configurable stride (overlap = size −
  * stride), each chunk re-materialized as text with its position
  * recorded. The reference has no text corpus at all (it is a fund-data
  * ETL; see SURVEY §2.1), so this family is part of the LLM-pipeline
  * surface the brief adds on top of reference parity.
  *
  * Semantics (deterministic, oracle-replayable):
  *  - tokens = lowercased whitespace tokens (TextFns.tokens — the
  *    engine-wide tokenization contract shared with q34/q38/q69);
  *  - number of chunks for an n-token doc: 1 if n <= size, else
  *    ceil((n − size) / stride) + 1 — i.e. windows start at 0, stride,
  *    2·stride, … and the last window is the first one that reaches the
  *    end of the doc (it may be shorter than `size` only in its overlap
  *    arithmetic, never empty);
  *  - chunk k covers tokens [k·stride, min(k·stride + size, n));
  *  - empty-document semantics DIFFER by method (each matches its
  *    oracle): [[chunkByTokens]] yields exactly one empty-text chunk, so
  *    every input row is represented downstream (drop empties with
  *    `n_chunk_tokens > 0`); [[chunkByTokenBudget]] DROPS empty docs —
  *    its word `posexplode` emits nothing for an empty word array
  *    (callers needing every row represented should left-join the output
  *    back to the input ids).
  *
  * 100 TB design: this is a pure NARROW operator — tokenize, compute the
  * chunk count, explode a `sequence`, slice — no exchange anywhere, no
  * driver state, output partitioning inherited from the scan. Work and
  * output size are linear in corpus tokens × duplication factor
  * (size/stride); with size=32, stride=24 the blow-up is bounded by 4/3.
  * All expressions are Catalyst builtins (split / sequence / explode /
  * slice / array_join), so the whole chunker lives inside one
  * WholeStageCodegen span over the parquet scan with only `textCol` and
  * `idCol` read (column pruning holds — pinned by PlanShapeSpec's q73
  * narrow-plan check).
  */
object Chunker {

  /** Appends `(chunk_id, chunk_text, n_chunk_tokens)` rows, one per token
    * window of `textCol`. `stride` must be in (0, size]. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = TextFns.tokens(col(textCol))
    // 1 chunk when n <= size; else ceil((n - size) / stride) + 1, via
    // integer `div` (Column `/` is double division) so the count is exact.
    df.select(col(idCol), toks.as("__toks"))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__toks")))
      .withColumn("__nc", when(col("__n") <= size, lit(1))
        .otherwise(expr(s"((__n - $size + $stride - 1) div $stride) + 1")))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id").cast("int").as("chunk_id"),
        array_join(slice(col("__toks"), col("chunk_id") * stride + 1,
          lit(size)), " ").as("chunk_text"),
        org.apache.spark.sql.functions.size(
          slice(col("__toks"), col("chunk_id") * stride + 1, lit(size)))
          .cast("int").as("n_chunk_tokens"))
  }

  /** BUDGET-denominated chunking: split each doc's word sequence at exact
    * cumulative TOKEN-count boundaries — floor-div binning (word with
    * `cum_before` tokens before it goes to chunk
    * `cum_before div budgetTokens`), the same virtual-concatenation rule
    * as [[graft.maintenance.Compaction.binPack]] and Spark's own
    * FilePartition packing. Words stay intact (a training pipeline never
    * splits a word's subwords across samples), so a chunk overflows the
    * budget by at most one word's tail.
    *
    * `tokenCounter` maps a WORD column to its token count — pass
    * `Bpe.tokenCount(_, merges)` for tokenizer-faithful budgets (q90), or
    * `_ => lit(1L)` to reduce to word-count budgets. `wordsFn` is the word
    * model (default [[graft.functions.TextFns.tokens]]; q90 passes
    * [[graft.functions.Bpe.words]] so the chunker and the counter agree on
    * the delimiter-stripped model). Output words are lowercased (the word
    * model's normalization).
    *
    * 100 TB shape: narrow word explode -> ONE hash exchange on the doc id
    * for the within-doc running total (the q49/q67 windowed-cumsum
    * contract shape); the (doc, chunk) aggregation REUSES that
    * partitioning (hash(doc) satisfies clustering on (doc, chunk)), so
    * the whole operator moves the corpus once — PlanShapeSpec pins the
    * single-exchange plan. Never a global sort; per-doc window state is
    * O(words-per-doc). */
  def chunkByTokenBudget(df: DataFrame, idCol: String, textCol: String,
                         budgetTokens: Long,
                         tokenCounter: Column => Column,
                         wordsFn: Column => Column = TextFns.tokens): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    val w = df
      .select(col(idCol), posexplode(wordsFn(col(textCol))).as(Seq("__pos", "__word")))
      .withColumn("__wt", tokenCounter(col("__word")).cast("long"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w.withColumn("__cum_before",
        (sum(col("__wt")).over(win) - col("__wt")).cast("long"))
      .withColumn("chunk_id",
        expr(s"__cum_before div ${budgetTokens}L").cast("int"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__word")))),
          s => s.getField("__word")), " ").as("chunk_text"),
        sum(col("__wt")).cast("long").as("n_chunk_tokens"),
        count(lit(1)).cast("int").as("n_chunk_words"))
  }
}
