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

  /** Overlapping char n-grams of lower(text), whitespace included —
    * fastText's language-ID feature unit (subword shapes, inflections
    * and word boundaries that marker-word lists are blind to). Text
    * shorter than `n` chars -> empty array. Pure Column expression
    * (sequence + substr inside the scan's codegen span), replayed by
    * the oracle as DuckDB list_transform(generate_series(...),
    * substr). */
  def charNgrams(text: Column, n: Int): Column = {
    require(n >= 1 && n <= 8, s"charNgrams n must be in [1,8], got $n")
    val t = lower(text)
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - lit(n - 1)),
        i => t.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** Fused one-pass text statistics `(chars, n_tokens, stop_hits,
    * punct_chars)` — the integer counts behind [[tokenCount]] /
    * [[qualityScore]], computed by ONE native scan
    * ([[TextStatsExpr]]) instead of one tokenize/regex pass per
    * signal. Identical instances in a projection are merged by codegen
    * subexpression elimination, so evaluating n_tokens AND quality over
    * the same column still costs one scan. */
  def textStats(text: Column, stopwords: Seq[String] = EnglishStopwords): Column =
    org.apache.spark.sql.graft.ExprBridge.column(
      TextStatsExpr(org.apache.spark.sql.graft.ExprBridge.expression(text),
        stopwords))

  /** Word-n-gram repetition signals (Gopher-class repetitive-text
    * quality gate): top-n-gram character coverage for n = 2..4 and
    * duplicated-n-gram coverage for n = 5/10, all exact integers, ONE
    * native pass per row with per-doc hash maps — the Column-level
    * equivalent is an explode + corpus-keyed groupBy PER n (five corpus
    * shuffles for per-row arithmetic). See [[RepetitionKernel]] for the
    * field contract. */
  def repetitionStats(text: Column): Column =
    org.apache.spark.sql.graft.ExprBridge.column(
      RepetitionStatsExpr(
        org.apache.spark.sql.graft.ExprBridge.expression(tokens(text))))

  /** Per-document character-level Shannon entropy in fixed-point
    * micro-nats, (n_chars, n_distinct, entropy_q6) — the
    * gibberish/binary signal; one native pass per row (see
    * [[CharEntropyKernel]] for the per-term quantization contract). */
  def charEntropy(text: Column): Column =
    org.apache.spark.sql.graft.ExprBridge.column(
      CharEntropyExpr(org.apache.spark.sql.graft.ExprBridge.expression(text)))

  /** Token count (whitespace tokenization; fused native scan — the
    * composed `size(tokens(text))` is [[tokenCountComposed]], spec-pinned
    * equal). */
  def tokenCount(text: Column): Column =
    textStats(text).getField("n_tokens")

  /** Reference composed form of [[tokenCount]] for the equivalence
    * spec. */
  def tokenCountComposed(text: Column): Column = size(tokens(text))

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
    * stopwords, low punctuation density. Deterministic and portable.
    * Counts come from the fused [[textStats]] scan; every ratio, clamp
    * and ROUND is the same Catalyst arithmetic as
    * [[qualityScoreComposed]] (spec-pinned equal), so the DuckDB oracle
    * replay is unaffected. */
  def qualityScore(text: Column): Column = {
    val st = textStats(text)
    val chars = st.getField("chars")
    val n = st.getField("n_tokens")
    val stopRatio = when(n > 0,
      st.getField("stop_hits").cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
    val pRatio = when(chars > 0,
      st.getField("punct_chars").cast("double") / chars.cast("double"))
      .otherwise(lit(0.0))
    val lenScore  = least(chars.cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopRatio * 5.0, lit(1.0))
    val punctPen  = greatest(lit(0.0), lit(1.0) - pRatio * 4.0)
    round((lenScore + stopScore + punctPen) / 3.0, 6)
  }

  /** Reference composed form of [[qualityScore]] (one tokenize/regex
    * pass per signal) for the equivalence spec. */
  def qualityScoreComposed(text: Column): Column = {
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

  /** The q36 language predictor as one reusable Column: argmax of the
    * en/es/de marker hits with the q36 tie-break order (en ≥ es ≥ de).
    * Shared by the q36 query and the corpus pipeline's `langAllow`
    * gate so the two can never drift. */
  def langPredict(text: Column): Column = {
    val en = langHits(text, "\\b(the|a|is|and|of)\\b")
    val es = langHits(text, "\\b(el|la|de|que|es)\\b")
    val de = langHits(text, "\\b(der|die|das|und|ist)\\b")
    when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es")).otherwise(lit("de"))
  }

  /** Canonical normalized form used for fingerprinting: lowercase, collapse
    * internal whitespace, strip leading/trailing. */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Strips C0/C1 control characters except newline and tab (the scraped-
    * corpus artifacts: NUL bytes, vertical tabs, stray escapes). RE2-safe
    * character-class form — replays identically in DuckDB. */
  def stripControlChars(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")

  /** Whitespace canonicalization that PRESERVES paragraph structure
    * (unlike [[normalizedText]], which flattens for fingerprinting):
    * space/tab runs collapse to one space, 3+ newlines collapse to a
    * paragraph break, trailing space before a newline is dropped, and the
    * result is trimmed. */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(text,
      "[ \\t]+", " "), " ?\\n ?", "\n"), "\\n{3,}", "\n\n"))

  /** cp1252 mapping for bytes 0x80-0x9F (the 27 defined positions);
    * every other byte reads as itself (latin-1). Used to CONSTRUCT the
    * garbled forms programmatically -- mojibake literals in source code
    * do not survive editors. */
  private val Cp1252: Map[Int, Char] = Map(
    0x80 -> '\u20AC', 0x82 -> '\u201A', 0x83 -> '\u0192', 0x84 -> '\u201E',
    0x85 -> '\u2026', 0x86 -> '\u2020', 0x87 -> '\u2021', 0x88 -> '\u02C6',
    0x89 -> '\u2030', 0x8A -> '\u0160', 0x8B -> '\u2039', 0x8C -> '\u0152',
    0x8E -> '\u017D', 0x91 -> '\u2018', 0x92 -> '\u2019', 0x93 -> '\u201C',
    0x94 -> '\u201D', 0x95 -> '\u2022', 0x96 -> '\u2013', 0x97 -> '\u2014',
    0x98 -> '\u02DC', 0x99 -> '\u2122', 0x9A -> '\u0161', 0x9B -> '\u203A',
    0x9C -> '\u0153', 0x9E -> '\u017E', 0x9F -> '\u0178')

  /** The characters whose mojibake forms a web corpus actually contains
    * at frequency (the ftfy top offenders): curly quotes, dashes,
    * ellipsis, bullet, accented vowels, no-break space (mapped to plain
    * space).
    *
    * ORDER IS MATERIAL (anti-cascade invariant): the dashes \u2013 \u2014 come
    * BEFORE the double quotes \u201C \u201D. The cp1252 garble of \u2013 is "\u00E2\u20AC\u201C"
    * (its last char IS \u201C, cp1252's 0x93) and of \u2014 is "\u00E2\u20AC\u201D" (last char
    * \u201D, 0x94) \u2014 so a quote fix's OUTPUT dropped next to a stray "\u00E2\u20AC"
    * would complete a dash pattern, and a chain that runs the dash fix
    * LATER would then cascade (fix a pattern no scan of the original
    * text contains). With dashes first, no fix's output can complete
    * any pattern that still has a pending pass (outputs \u2013 \u2014 \u00E9 \u2026 appear
    * in no pattern), and no two patterns can overlap in original text
    * (no pattern's suffix is another's prefix: patterns start \u00E2/\u00C3/\u00C2,
    * suffixes never do) \u2014 so the sequential global-replace chain, the
    * DuckDB oracle's compiled replace chain, and the one-pass
    * longest-match scanner ([[CleanTextKernel]]) are all EXACTLY the
    * same function. TextFnsSpec fuzzes the three-way equality with
    * partial patterns and repaired-output chars in the mix. */
  private val MojibakeTargets: Seq[(Char, String)] = Seq(
    '\u2019' -> "\u2019", '\u2018' -> "\u2018", '\u2013' -> "\u2013",
    '\u2014' -> "\u2014", '\u201C' -> "\u201C", '\u201D' -> "\u201D",
    '\u2026' -> "\u2026", '\u2022' -> "\u2022", '\u00E9' -> "\u00E9",
    '\u00E8' -> "\u00E8", '\u00E1' -> "\u00E1", '\u00F3' -> "\u00F3",
    '\u00FC' -> "\u00FC", '\u00A0' -> " ")

  /** The five bytes cp1252 leaves undefined: WHATWG decoders pass them
    * through as C1 controls, strict decoders (java.nio among them) emit
    * U+FFFD. Both appear in real corpora. */
  private val Cp1252Undefined = Set(0x81, 0x8D, 0x8F, 0x90, 0x9D)

  /** Garbled forms of `c`: its UTF-8 bytes decoded as latin-1 (C1
    * controls), cp1252 per WHATWG (undefined bytes pass through), and
    * cp1252 strict (undefined bytes become U+FFFD). All three occur in
    * the wild. */
  private def garbled(c: Char): Seq[String] = {
    val bytes = c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(_ & 0xff)
    Seq(
      bytes.map(_.toChar).mkString,
      bytes.map(u => Cp1252.getOrElse(u, u.toChar)).mkString,
      bytes.map(u => if (Cp1252Undefined(u)) '\uFFFD'
        else Cp1252.getOrElse(u, u.toChar)).mkString
    ).distinct
  }

  /** (garbled, repaired) pairs — every decode variant of each target,
    * deduplicated. Shared with OracleSql, which compiles the same table
    * to a DuckDB chr()-replace chain. No garbled form is a prefix of
    * another (3-byte sequences differ in the 3rd char; 2-byte ones start
    * with a different first char), so the chain order is immaterial. */
  val MojibakeFixes: Seq[(String, String)] =
    MojibakeTargets.flatMap { case (c, fixed) =>
      garbled(c).map(_ -> fixed)
    }

  /** Repairs [[MojibakeFixes]] with a literal `replace` chain -- no
    * regex, engine-portable, whole-stage codegen. A full ftfy pass needs
    * byte-level transcoding; this covers the high-frequency artifacts. */
  def fixMojibake(text: Column): Column =
    MojibakeFixes.foldLeft(text) { case (c, (bad, good)) =>
      org.apache.spark.sql.functions.replace(c, lit(bad), lit(good)) }

  /** The full text-cleanup pass a scraped corpus gets before scoring:
    * mojibake repair -> control-char strip -> whitespace canonicalization.
    * Runs as ONE fused native scan ([[CleanTextExpr]]) — the composed
    * replace/regexp chain ([[cleanTextComposed]]) is ~40 full string
    * passes per document and was the bulk of the corpus pipeline's
    * biggest stage; the kernel is structurally equivalent (prefix-free
    * fix table, non-interacting replacements — see [[CleanTextKernel]])
    * and TextFnsSpec pins kernel == chain on randomized garbled corpora.
    * Zero exchanges either way; the DuckDB oracle replays the composed
    * chain, so the correctness gate cross-checks the fusion per run. */
  def cleanText(text: Column): Column =
    org.apache.spark.sql.graft.ExprBridge.column(
      CleanTextExpr(org.apache.spark.sql.graft.ExprBridge.expression(text)))

  /** The reference composed form of [[cleanText]] — the exact
    * replace/regexp chain the DuckDB oracle compiles, kept for the
    * kernel-equivalence spec. */
  def cleanTextComposed(text: Column): Column =
    normalizeWhitespace(stripControlChars(fixMojibake(text)))

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
