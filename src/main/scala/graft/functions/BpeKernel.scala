package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Learned merge table of a byte-pair-encoding tokenizer, in training
  * (rank) order, plus a bounded per-instance encode memo.
  *
  * The memo is the reason BPE encoding is affordable on a corpus scan: the
  * encoder runs per WORD, and corpora repeat words with Zipfian frequency,
  * so after the first few thousand rows almost every lookup is a cache
  * hit. The map is confined to this Ranks instance (one per expression
  * per executor after deserialization), concurrent because one executor
  * runs many tasks, and bounded (stops inserting at 2^20 entries — worst
  * case a few hundred MB of short strings) so adversarial high-entropy
  * corpora degrade to cache-miss CPU, not OOM. */
final class BpeRanks(val merges: Array[(String, String)]) extends Serializable {

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** (left, right) -> rank, built once per deserialized instance — the
    * dict that makes per-word encode independent of merge-table SIZE
    * (a rank-order scan over the table is O(|table|) per uncached word:
    * invisible at the 32-merge oracle config, ruinous at the 20k+-merge
    * tables [[Bpe.trainMergesLocal]] produces in well under a second). */
  @transient private lazy val rank = {
    val m = new java.util.HashMap[(String, String), Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      // first (lowest) rank wins if a pair was somehow learned twice
      if (!m.containsKey(merges(i))) m.put(merges(i), Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** BPE-encode one word: greedy lowest-rank-PRESENT-pair first, each
    * pick applied as one leftmost-nonoverlapping pass (the textbook
    * loop — see [[BpeKernel]] for the proof it equals the oracle's
    * rank-order replace chain). O(len^2) in the word's code points with
    * O(1) rank lookups; table size never enters the per-word cost. */
  def encode(word: String): Array[String] = {
    val hit = memo.get(word)
    if (hit != null) return hit
    val out = encodeUncached(word)
    if (memo.size < (1 << 20)) memo.put(word, out)
    out
  }

  private def encodeUncached(word: String): Array[String] = {
    // initial symbols: Unicode CODE POINTS (not UTF-16 chars), matching
    // RE2's '(.)' in the oracle's delimiterizer and DuckDB's length()
    var syms = {
      val cps = word.codePoints().toArray
      val a = new Array[String](cps.length)
      var i = 0
      while (i < cps.length) { a(i) = new String(Character.toChars(cps(i))); i += 1 }
      a
    }
    var go = syms.length > 1
    while (go) {
      // lowest-rank pair present among current adjacencies
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get((syms(i), syms(i + 1)))
        if (r != null && r.intValue < bestRank) bestRank = r.intValue
        i += 1
      }
      if (bestRank == Int.MaxValue) go = false
      else {
        val l = merges(bestRank)._1
        val r = merges(bestRank)._2
        // one leftmost-nonoverlapping pass (string-replace semantics)
        val out = new Array[String](syms.length)
        var n = 0
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
            out(n) = l + r; n += 1; j += 2
          } else { out(n) = syms(j); n += 1; j += 1 }
        }
        syms = java.util.Arrays.copyOf(out, n)
        go = syms.length > 1
      }
    }
    syms
  }
}

/** Static BPE kernels called from both the interpreted `eval` and the
  * generated Java of [[BpeTokenCountExpr]]/[[BpeTokensExpr]] (the
  * [[ShingleKernel]] codegen pattern).
  *
  * Encoding algorithm = the textbook greedy loop: repeatedly merge the
  * lowest-RANK pair present among the word's current adjacencies (one
  * leftmost-nonoverlapping pass per pick), ranks looked up in a
  * pair->rank dict — O(len^2) per word in its code points, INDEPENDENT
  * of merge-table size (the previous rank-order-scan formulation was
  * O(|table|) per uncached word: invisible at 32 merges, ruinous at the
  * 20k+-merge tables [[Bpe.trainMergesLocal]] produces).
  *
  * This greedy is provably identical to applying the merges IN RANK
  * ORDER, one leftmost-nonoverlapping pass each — which is exactly what
  * the oracle's generated `replace()` chain computes over the
  * delimiterized word, making the SQL replay possible at all. Proof: a
  * merge (x, y) -> xy can only create new adjacent pairs involving xy,
  * and any pair involving xy can only have been LEARNED after xy existed
  * — i.e. at a HIGHER rank — so the ascending-rank chain never skips a
  * lower-rank opportunity, and one pass per rank suffices (applying
  * (x, y) never creates another (x, y) adjacency, since xy != x).
  * PRECONDITION: the table has no duplicate (left, right) entry. A
  * duplicate is theoretically learnable (a string can re-form via a
  * different split and the pair's count resurge); the dict collapses it
  * to its FIRST rank (the ecosystem-standard semantic), while the
  * replace chain would re-apply it at the later rank too — so the oracle
  * generator REJECTS duplicate-bearing tables loudly
  * (OracleSql.bpeEntries) instead of replaying SQL that could diverge.
  *
  * Word model (shared with [[Bpe.words]] and the oracle SQL, and with
  * TextFns.tokens' conventions): strip the two delimiter code points
  * U+0001/U+0002, lowercase, split on ASCII `\s+`, drop empties. Merges
  * never cross word boundaries and there is no end-of-word marker (token
  * counts are marker-invariant; documented choice). */
object BpeKernel {

  private val Ws = "\\s+".r.pattern

  /** Character classes of the FAITHFUL pre-tokenizer, defined on explicit
    * code-point ranges (never on `\p{L}`-style Unicode categories, whose
    * tables differ across regex engines and versions — the oracle's RE2
    * and this scanner must agree on every input):
    *  - whitespace: the engine-canonical explicit class [ \t\n\x0B\f\r];
    *  - digits: 0-9;
    *  - letters: A-Z, a-z, and EVERY code point >= 0x80 (one
    *    "letter-like" class for all non-ASCII — deterministic and
    *    engine-portable; splitting non-ASCII punctuation from non-ASCII
    *    letters would re-introduce the category-table dependency);
    *  - punctuation: everything else (ASCII punctuation + the C0
    *    controls that survive the U+0001/U+0002 strip + DEL). */
  private def wsClass(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'
  private def clazz(c: Int): Int =
    if (wsClass(c)) 0
    else if (c >= '0' && c <= '9') 2
    else if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || c >= 0x80) 1
    else 3

  /** FAITHFUL pre-tokenization (the GPT-2 device, lookahead-free): strip
    * U+0001/U+0002, then split the text into a TILING of pretokens —
    * their concatenation IS the stripped text, which is what makes the
    * id stream decodable back to the original bytes (case and whitespace
    * included), unlike the lowercasing word model. Equivalent to the
    * leftmost-first regex
    * {{{ ?[letter]+| ?[0-9]+| ?[punct]+|[ws]+}}}
    * (classes above): a single space directly followed by a non-ws
    * character attaches to that character's run (" word", " 123",
    * " ,."), any other whitespace run is its own pretoken, and every
    * other maximal same-class run stands alone. BpeSpec pins this
    * scanner against a literal Java-regex implementation of the pattern;
    * the oracle replays the same pattern in RE2 (leftmost-first
    * alternation and greedy quantifiers agree across the two engines on
    * this lookaround-free pattern). */
  def pretokens(text: String): Array[String] = {
    if (text == null) return Array.empty
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c != '\u0001' && c != '\u0002') sb.append(c)
      i += 1
    }
    val s = sb.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = 0
    val n = s.length
    while (p < n) {
      val start = p
      val c0 = s.codePointAt(p)
      var runClass = clazz(c0)
      if (c0 == ' ' && p + 1 < n && !wsClass(s.codePointAt(p + 1))) {
        // attached leading space: the run class is the FOLLOWING char's
        runClass = clazz(s.codePointAt(p + 1))
        p += 1
      } else if (runClass == 0) {
        // maximal whitespace run (greedy — includes any space before the
        // next word, matching the lookahead-free regex)
        p += Character.charCount(c0)
        while (p < n && wsClass(s.codePointAt(p))) p += Character.charCount(s.codePointAt(p))
        out += s.substring(start, p)
        runClass = -1 // emitted
      }
      if (runClass >= 0) {
        // maximal run of runClass starting at p
        while (p < n && clazz(s.codePointAt(p)) == runClass)
          p += Character.charCount(s.codePointAt(p))
        out += s.substring(start, p)
      }
    }
    out.toArray
  }

  /** Words of `text` under the shared BPE word model. Lowercasing goes
    * through UTF8String — the SAME implementation Spark's `lower()`
    * Column uses — so the kernel can never disagree with the Column-based
    * trainer word model on non-ASCII text or under a non-English default
    * JVM locale (String.toLowerCase differs on e.g. Turkish dotted İ).
    * DuckDB's `lower()` agrees on ASCII and ordinary case-folding; exotic
    * locale-sensitive code points remain an oracle-comparison caveat, not
    * an engine-internal one (BpeSpec pins kernel == Column on non-ASCII). */
  def words(text: String): Array[String] = {
    if (text == null) return Array.empty
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c != '\u0001' && c != '\u0002') sb.append(c)
      i += 1
    }
    Ws.split(UTF8String.fromString(sb.toString).toLowerCase.toString.trim)
      .filter(_.nonEmpty)
  }

  /** Words of `text` under the selected model: the shared lowercasing
    * whitespace model, or the FAITHFUL pre-tokenization ([[pretokens]]). */
  def words(text: String, faithful: Boolean): Array[String] =
    if (faithful) pretokens(text) else words(text)

  /** Total BPE token count of `text` (0 for null/blank). */
  def tokenCount(text: String, ranks: BpeRanks): Long =
    tokenCount(text, ranks, faithful = false)

  def tokenCount(text: String, ranks: BpeRanks, faithful: Boolean): Long = {
    val ws = words(text, faithful)
    var total = 0L
    var i = 0
    while (i < ws.length) { total += ranks.encode(ws(i)).length; i += 1 }
    total
  }

  /** Token IDS of `text` under `vocab` — a REAL hash map, O(1) per
    * piece (Catalyst's `GetMapValue` on a literal map is a linear scan
    * per lookup: ruinous at real vocabulary sizes × corpus tokens — the
    * r11 marked-pipeline measurement that motivated this kernel).
    * `markShift > 0` selects the MARKED stream: each word's FIRST
    * emitted id is shifted by `markShift` (the word-initial twin's id is
    * exactly `unmarked + shift` by [[Bpe.vocabMarked]] construction, so
    * marking is pure arithmetic — no string allocation per token).
    *
    * `byteBase >= 0` enables UTF-8 BYTE FALLBACK (the GPT-2 device): a
    * piece absent from `vocab` that is a SINGLE code point — which is
    * the only shape encode can produce for out-of-alphabet input, since
    * merges only ever concatenate learned symbols — is emitted as its
    * UTF-8 bytes, byte b at id `byteBase + b`. This is what makes a
    * PERSISTED tokenizer artifact total over future corpora: day-2
    * ingest containing one code point the training corpus lacked must
    * tokenize, not kill the job. A multi-codepoint miss still throws
    * even with fallback on — that shape is unreachable from encode, so
    * it is always a caller bug (wrong vocab for this merge table), never
    * data. With `byteBase < 0` any miss throws (the closed-vocabulary
    * mode for corpus == training-corpus paths, where a miss means a
    * wiring bug). */
  def tokenIds(text: String, ranks: BpeRanks,
               vocab: java.util.HashMap[String, Integer],
               markShift: Int, byteBase: Int): ArrayData =
    tokenIds(text, ranks, vocab, markShift, byteBase, faithful = false)

  def tokenIds(text: String, ranks: BpeRanks,
               vocab: java.util.HashMap[String, Integer],
               markShift: Int, byteBase: Int, faithful: Boolean): ArrayData = {
    val ws = words(text, faithful)
    val buf = new scala.collection.mutable.ArrayBuffer[Int](ws.length * 2)
    var i = 0
    while (i < ws.length) {
      val enc = ranks.encode(ws(i))
      var j = 0
      while (j < enc.length) {
        val piece = enc(j)
        val id = vocab.get(piece)
        if (id != null) buf += (if (j == 0) id.intValue + markShift else id.intValue)
        else if (byteBase >= 0 &&
                 piece.codePointCount(0, piece.length) == 1) {
          val bytes = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var b = 0
          while (b < bytes.length) {
            val bid = byteBase + (bytes(b) & 0xFF)
            buf += (if (j == 0 && b == 0) bid + markShift else bid)
            b += 1
          }
        } else throw new IllegalStateException(
          s"BPE token '$piece' not in the ${vocab.size}-entry vocabulary" +
            " — vocab was derived from a different corpus or merge table")
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(buf.toArray)
  }

  /** Inverse of the MARKED [[tokenIds]] stream: ids back to word-model
    * text (lowercased, single-spaced — case/whitespace were consumed by
    * the model itself). `rev` is the base (unmarked) id -> token-string
    * array; `markShift` its length; `byteBase >= 0` marks ids
    * `[byteBase, byteBase+256)` as UTF-8 byte-fallback ids, which are
    * accumulated and decoded as one UTF-8 run per maximal byte sequence
    * (per-code-point UTF-8 concatenates, so a run of fallback pieces
    * reassembles exactly). Total: a malformed byte run (hand-crafted
    * ids, not encoder output) decodes to U+FFFD replacement characters
    * rather than throwing — decode is a read path and must not brick on
    * one bad row. Ids outside [0, 2*markShift) throw: that is artifact
    * corruption, not data. */
  def decodeIds(ids: ArrayData, rev: Array[String], markShift: Int,
                byteBase: Int): UTF8String =
    decodeIds(ids, rev, markShift, byteBase, marked = true)

  /** `marked = false` is the FAITHFUL decode: no word-initial twin range
    * exists (pretokens carry their own whitespace), so pieces concatenate
    * verbatim and ANY id >= markShift is artifact corruption — under the
    * marked decode such an id would silently read as a twin instead. */
  def decodeIds(ids: ArrayData, rev: Array[String], markShift: Int,
                byteBase: Int, marked: Boolean): UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder(n * 4)
    val run = new java.io.ByteArrayOutputStream()
    def flush(): Unit = if (run.size() > 0) {
      sb.append(new String(run.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      run.reset()
    }
    var i = 0
    while (i < n) {
      var id = ids.getInt(i)
      if (marked && id >= markShift && id < 2 * markShift) {
        // word-initial twin: flush any byte run, open a new word
        flush()
        if (sb.length > 0) sb.append(' ')
        id -= markShift
      }
      if (id < 0 || id >= markShift) throw new IllegalStateException(
        s"token id $id outside the ${markShift}-entry base vocabulary — " +
          "ids were produced under a different artifact")
      if (byteBase >= 0 && id >= byteBase && id < byteBase + 256)
        run.write(id - byteBase)
      else { flush(); sb.append(rev(id)) }
      i += 1
    }
    flush()
    UTF8String.fromString(sb.toString)
  }

  /** Pretokens of `text` as Catalyst array data (the faithful word
    * model's corpus-scan form, for training word counts and alphabet
    * derivation). */
  def pretokensData(text: String): ArrayData = {
    val ps = pretokens(text)
    val buf = new Array[AnyRef](ps.length)
    var i = 0
    while (i < ps.length) { buf(i) = UTF8String.fromString(ps(i)); i += 1 }
    new GenericArrayData(buf)
  }

  /** All BPE tokens of `text`, in order (empty array for null/blank). */
  def tokens(text: String, ranks: BpeRanks): ArrayData =
    tokens(text, ranks, faithful = false)

  def tokens(text: String, ranks: BpeRanks, faithful: Boolean): ArrayData = {
    val ws = words(text, faithful)
    val buf = new scala.collection.mutable.ArrayBuffer[AnyRef](ws.length * 2)
    var i = 0
    while (i < ws.length) {
      val enc = ranks.encode(ws(i))
      var j = 0
      while (j < enc.length) { buf += UTF8String.fromString(enc(j)); j += 1 }
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }
}
