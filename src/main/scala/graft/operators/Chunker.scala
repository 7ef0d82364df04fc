package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *  - an EMPTY document still yields exactly one (empty-text) chunk, so
  *    every input row is represented downstream — callers that want to
  *    drop empties filter `n_chunk_tokens > 0` explicitly.
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
}
