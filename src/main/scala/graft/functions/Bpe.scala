package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer family — tokenizer-FAITHFUL token
  * accounting for the token-denominated operators (mixture budgets,
  * chunking, packing, perplexity signals), which otherwise count
  * whitespace words and misstate budgets by multiples on code/CJK text.
  *
  * Three pieces, each independently verified:
  *  - [[trainMerges]]: DISTRIBUTED greedy BPE training — one corpus-scan
  *    word-count shuffle, then one (pair)-keyed count + argmax per merge
  *    round over the VOCABULARY frame (the classic trainer optimization:
  *    merges depend only on word frequencies, so after round 0 nothing is
  *    ever corpus-sized again). SparkEntry q87's oracle re-verifies every
  *    round's argmax in DuckDB by INDUCTION (see OracleSql).
  *  - [[tokenCount]]/[[tokens]]: native codegen expressions
  *    ([[BpeTokenCountExpr]]/[[BpeTokensExpr]]) applying a merge table on
  *    a corpus scan (q88's oracle replays them as a generated
  *    `replace()`-chain in SQL; BpeSpec pins kernel == chain == reference
  *    implementation).
  *  - [[trainMergesCached]]: per-JVM memo of trained tables, because a
  *    tokenizer is trained ONCE per corpus and then reused by every
  *    downstream query — the production shape. Bench consequence, stated
  *    plainly: q87 times TRAINING (it bypasses the memo); q88/q89 time
  *    ENCODE-side work against an already-trained table (first caller
  *    pays training once per JVM).
  *
  * Shared word model (kernel, trainer, oracle SQL — all three must agree
  * bit-for-bit): strip U+0001/U+0002, lowercase, split ASCII `\s+`, drop
  * empties. Initial symbols are Unicode code points; no end-of-word
  * marker (token counts are marker-invariant; merges never cross words).
  *
  * The U+0001/U+0002 strip is what makes the SQL replay SOUND: the oracle
  * (and the trainer) represent a symbol sequence as
  * `<L>sym<R><L>sym<R>...` (with <L>=U+0001, <R>=U+0002), where applying merge (x, y)
  * is literal-string `replace('<L>x<R><L>y<R>' -> '<L>xy<R>')`. Because <L> occurs exactly at symbol starts and
  * <R> exactly at symbol ends, a pattern match must align on WHOLE
  * symbols (no prefix/suffix false merges), and replace's
  * leftmost-nonoverlapping scan is exactly BPE's within-word application
  * order. Stripping the two delimiters from input text (they are C0
  * controls — real text loses nothing) guarantees no collision.
  *
  * 100 TB shape: training scans the corpus ONCE (word count, one hash
  * shuffle); each of the `numMerges` rounds is one vocabulary-sized
  * exchange plus a 1-row driver collect (the argmax), with the vocab
  * frame localCheckpointed every 8 rounds — bounded lineage at bounded
  * job count (rounds are job-overhead-bound: the frame is vocab-sized).
  * Encoding is a zero-shuffle in-scan expression with a per-executor
  * word memo. */
object Bpe {

  /** One learned merge: `left + right -> left+right`, learned at `rank`
    * with weighted pair count `cnt`. */
  final case class Merge(rank: Int, left: String, right: String, cnt: Long)

  private val SepL = "\u0001"
  private val SepR = "\u0002"

  /** Input text with the two delimiter code points removed (both engines:
    * they are C0 controls that cleaned text cannot contain anyway). */
  def strip(text: Column): Column =
    regexp_replace(text, "[\u0001\u0002]", "")

  /** Words of `text` under the shared BPE word model (mirrors
    * [[BpeKernel.words]] and the oracle's word snippet). */
  def words(text: Column): Column = TextFns.tokens(strip(text))

  /** (word, cnt) vocabulary frame — the single corpus-sized job of
    * training. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("cnt"))

  /** Greedy BPE training: `numMerges` rounds of (pair)-keyed weighted
    * count + deterministic argmax (count DESC, then (left, right)
    * ascending in UTF-8 byte order — Spark's UTF8String comparison and
    * DuckDB's binary collation agree). Stops early when no pair reaches
    * `minCount`. Deterministic: exact integer counts, total-order
    * tiebreak. */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
                  minCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    var vocab = wordCounts(df, textCol)
      .select(col("cnt"),
        regexp_replace(col("word"), "(.)", SepL + "$1" + SepR).as("sym"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val syms = split(
        regexp_replace(col("sym"), "^\u0001|\u0002$", ""), "\u0002\u0001")
      val n = size(col("__s"))
      val top = vocab
        .select(col("cnt"), syms.as("__s"))
        .filter(n >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("__s"), lit(1), n - 1),
          slice(col("__s"), lit(2), n - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(desc("c"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(k, l, r, c)
        // Bounded lineage, amortized checkpoints: re-planning k nested
        // replaces is cheaper than a checkpoint job per round (rounds are
        // job-overhead-bound at any sf — the frame is vocabulary-sized),
        // so cut lineage every 8 rounds and let the argmax job pay <= 8
        // replace passes of recompute.
        vocab = vocab
          .withColumn("sym", replace(col("sym"),
            lit(SepL + l + SepR + SepL + r + SepR), lit(SepL + l + r + SepR)))
        if ((k + 1) % 8 == 0) vocab = vocab.localCheckpoint(true)
        k += 1
      }
    }
    merges.toSeq
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int, Long), Seq[Merge]]()

  /** [[trainMerges]] memoized per (corpus dir, textCol, numMerges,
    * minCount) for the life of the JVM — the train-once-reuse-everywhere
    * production shape. Only sound for an IMMUTABLE corpus path (the
    * testdata dirs); a live lake should train explicitly and version the
    * table. */
  def trainMergesCached(df: DataFrame, dirKey: String, textCol: String,
                        numMerges: Int, minCount: Long = 2L): Seq[Merge] =
    cache.computeIfAbsent((dirKey, textCol, numMerges, minCount),
      _ => trainMerges(df, textCol, numMerges, minCount))

  /** Tokenizer-faithful token count of `text` under `merges` (native
    * codegen expression; null text -> 0). */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    org.apache.spark.sql.graft.ExprBridge.column(
      BpeTokenCountExpr(
        org.apache.spark.sql.graft.ExprBridge.expression(text),
        merges.map(m => (m.left, m.right))))

  /** BPE tokens of `text` under `merges` (`array<string>`, in order). */
  def tokens(text: Column, merges: Seq[Merge]): Column =
    org.apache.spark.sql.graft.ExprBridge.column(
      BpeTokensExpr(
        org.apache.spark.sql.graft.ExprBridge.expression(text),
        merges.map(m => (m.left, m.right))))
}
