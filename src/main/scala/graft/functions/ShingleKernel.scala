package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** The compiled shingle-set kernel, callable from BOTH the Scala UDF path
  * and generated whole-stage-codegen Java (`ShingleSetExpr`): whitespace-
  * tokenize, FNV-1a+splitmix64-hash tokens, slide an n-window combining
  * hash, distinct. Kept as a plain object with static forwarders so
  * codegen can reference `graft.functions.ShingleKernel.shingleSetData`
  * directly.
  *
  * Behavioral spec mirrors TextFns.shingles (and the DuckDB oracle's
  * fallback arm): fewer than n tokens -> the whole token sequence as ONE
  * shingle — including the empty string, whose zero tokens hash to the
  * single empty-gram sentinel; only NULL text yields an empty set. */
object ShingleKernel {

  /** splitmix64 finalizer (public-domain constant set). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-16 code units, finalized with splitmix64. */
  @inline def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    mix64(h)
  }

  /** Non-distinct hashed n-gram list (frequency-preserving sibling). */
  def shingleList(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.empty[Long]
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { th(i) = hashString(toks(i)); i += 1 }
    if (th.length >= n) {
      val m = th.length - n + 1
      val a = new Array[Long](m)
      var j = 0
      while (j < m) {
        var h = 0xcbf29ce484222325L
        var k = 0
        while (k < n) { h ^= th(j + k); h *= 0x100000001b3L; k += 1 }
        a(j) = mix64(h)
        j += 1
      }
      a
    } else {
      var h = 0xcbf29ce484222325L
      var k = 0
      while (k < th.length) { h ^= th(k); h *= 0x100000001b3L; k += 1 }
      Array(mix64(h))
    }
  }

  /** Distinct hashed n-gram set (first-occurrence order). */
  def shingleSet(text: String, n: Int): Array[Long] = {
    val out = shingleList(text, n)
    val seen = new java.util.HashSet[Long](out.length * 2)
    out.filter(seen.add)
  }

  /** Catalyst-facing form: the distinct set as an `ArrayData` (what both
    * `ShingleSetExpr.eval` and its generated code return). */
  def shingleSetData(text: String, n: Int): ArrayData =
    new GenericArrayData(shingleSet(text, n))

  /** Catalyst-facing form of the frequency-preserving list (what both
    * `ShingleListExpr.eval` and its generated code return). */
  def shingleListData(text: String, n: Int): ArrayData =
    new GenericArrayData(shingleList(text, n))

  /** 64-bit SimHash over word tokens: per bit position, ±1 votes weighted
    * by token frequency; bit = sign. Null/empty -> the zero-vote
    * signature (all bits set, matching the historical kernel). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    if (text != null) {
      val toks = text.toLowerCase.trim.split("\\s+")
      var i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty) {
          val h = hashString(toks(i))
          var k = 0
          while (k < 64) {
            if (((h >>> k) & 1L) != 0L) counts(k) += 1 else counts(k) -= 1
            k += 1
          }
        }
        i += 1
      }
    }
    var sig = 0L
    var k = 0
    while (k < 64) { if (counts(k) >= 0) sig |= (1L << k); k += 1 }
    sig
  }

  // one digest per thread, reset per token — codegen calls this once per
  // row from many task threads; MessageDigest is not thread-safe and
  // per-row getInstance() allocation is measurable at 100 TB row counts
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit ENGINE-PORTABLE SimHash: token hash = first 15 hex chars of
    * md5(utf8(token)) parsed base-16 (< 2^60 — every shift/mask stays in
    * signed-64 range on any SQL engine), frequency-weighted ±1 bit votes,
    * bit = sign. Token-less docs get sentinel -1 (outside the signature
    * space): a vote-less signature would be all-ones and pair every blank
    * doc with every other at hamming 0 — and the SQL oracle, where empty
    * token lists unnest to zero rows, would disagree. Callers filter the
    * sentinel out of near-dup consideration. */
  def simhash60Md5(text: String): Long = {
    val counts = new Array[Int](60)
    var nTokens = 0
    if (text != null) {
      val md = md5Local.get()
      val toks = text.toLowerCase.trim.split("\\s+")
      var i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty) {
          nTokens += 1
          md.reset()
          val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // first 15 hex chars == high 60 bits of the first 8 digest bytes
          var h = 0L
          var b = 0
          while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
          h = h >>> 4 // drop the 16th hex char -> 60 bits
          var k = 0
          while (k < 60) {
            if (((h >>> k) & 1L) != 0L) counts(k) += 1 else counts(k) -= 1
            k += 1
          }
        }
        i += 1
      }
    }
    if (nTokens == 0) -1L
    else {
      var sig = 0L
      var k = 0
      while (k < 60) { if (counts(k) >= 0) sig |= (1L << k); k += 1 }
      sig
    }
  }

  /** MinHash signature over a hashed shingle set: k hash functions
    * simulated as splitmix64(shingle ^ seed_i); signature_i = min over the
    * set. Null input (never produced by [[shingleSetData]], defensive) ->
    * the all-MaxValue empty-set signature. */
  def minhashSignature(shset: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (shset != null) {
      val len = shset.numElements()
      var i = 0
      while (i < len) {
        val s = shset.getLong(i)
        var h = 0
        while (h < numHashes) {
          val v = mix64(s ^ (h * 0xc2b2ae3d27d4eb4fL))
          if (v < sig(h)) sig(h) = v
          h += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }
}
