package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-training-data extensions
  * (north star in BASELINE.json): tokenization, quality scoring, language-ID
  * heuristics, fingerprinting, shingling.
  *
  * All pure `Column` expressions — whole-stage-codegen'd, no UDFs — so a
  * 100 TB `documents` scan stays in one codegen stage with the parquet
  * reader's column pruning (only `text` is read when only these are used).
  */
object TextFns {

  /** Lowercased whitespace tokens. Empty/blank text -> empty array. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-count estimate: letter runs, digit runs, and single
    * punctuation marks counted separately (a cheap, deterministic proxy for
    * a real tokenizer). Stated as a match-count — RE2-compatible (no
    * lookarounds), so any engine's regex evaluates it identically. */
  def tokenCountBpeIsh(text: Column): Column =
    size(regexp_extract_all(lower(trim(text)), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Ratio of punctuation characters to total characters. Uses the explicit
    * ASCII punctuation ranges (portable: Java's \p{Punct} is POSIX-ASCII but
    * RE2 engines read it as Unicode category P). */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    when(total > 0,
      (total - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  private val EnglishStopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with", "as", "was", "at", "by")

  /** Fraction of tokens that are (English) stopwords — a standard quality
    * signal for web-scale corpus filtering. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = tokens(text)
    val n    = size(toks)
    when(n > 0, size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Mean word length over whitespace tokens. */
  def meanWordLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: rewards mid-range length, presence of
    * stopwords, low punctuation density. Deterministic and portable. */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPen  = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    round((lenScore + stopScore + punctPen) / 3.0, 6)
  }

  /** Language marker-word hit counts. N-gram/marker heuristic language ID:
    * count hits of per-language high-frequency words, predict the argmax.
    * `markers` maps lang code -> marker word regex (word-bounded). */
  def langHits(text: Column, markerRegex: String): Column =
    size(regexp_extract_all(lower(text), lit(markerRegex), lit(0)))

  /** Canonical normalized form used for fingerprinting: lowercase, collapse
    * internal whitespace, strip leading/trailing. */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized text (content identity for
    * exact dedup; SURVEY.md north-star ops). */
  def fingerprint(text: Column): Column = md5(normalizedText(text))

  /** Word n-gram shingles as an array column (for MinHash / Jaccard dedup).
    * shingles("a b c d", 3) = ["a b c", "b c d"]; fewer than n words -> the
    * whole text as one shingle (so short docs still participate). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Hashed word n-gram shingles as `array<long>`: tokens are xxhash64'd,
    * each shingle is the hash of its n token hashes (short docs: hash of the
    * whole token-hash array, mirroring [[shingles]]' one-shingle fallback).
    * Set semantics are identical to [[shingles]] modulo a ~2^-65-per-pair
    * hash collision.
    *
    * PERFORMANCE WARNING — expression-only reference form: nested
    * higher-order array lambdas are CodegenFallback and the interpreter
    * re-evaluates the token-hash subtree per output element, i.e.
    * O(tokens^2) per document (profiled 8s vs 0.9s at sf0.1 on q52). Hot
    * paths use the compiled kernels instead: `Dedup.shingleSets` (distinct)
    * / `Dedup.shingleLists` (frequency-preserving). */
  def shingleHashes(text: Column, n: Int): Column = {
    val toksH = transform(tokens(text), t => xxhash64(t))
    when(size(toksH) >= n,
      transform(sequence(lit(1), size(toksH) - (n - 1)),
        i => xxhash64(slice(toksH, i, lit(n)))))
      .otherwise(array(xxhash64(toksH)))
  }

  /** Character n-gram shingles (robust to tokenization for CJK-ish text). */
  def charShingles(text: Column, n: Int): Column = {
    val s = normalizedText(text)
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)), i => substring(s, i, lit(n))))
      .otherwise(array(s))
  }

  /** Rolling-hash style document signature: xxhash64 of each word shingle,
    * min-pooled — a 1-long cheap sketch (full MinHash lives in Dedup). */
  def docSignature(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => xxhash64(s)))

  /** Engine-portable variant of [[docSignature]]: shingle hash = first 15
    * hex chars of md5 parsed base-16 (< 2^60 — exact in any engine's
    * signed-64 SQL), min-pooled. Use where an external system must
    * reproduce signatures; [[docSignature]] is the fast path. */
  def docSignaturePortable(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))
}
