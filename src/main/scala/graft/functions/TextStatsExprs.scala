package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DataTypes, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[TextStatsExpr]] — the integer counts behind
  * [[TextFns.tokenCount]] / [[TextFns.qualityScore]] (and their
  * components [[TextFns.stopwordRatio]] / [[TextFns.punctRatio]]) in ONE
  * code-point scan of the string. The composed Column forms tokenize the
  * text once per signal (split + array filter per call) and regex-strip
  * it once more for the punctuation count — with the corpus pipeline's
  * quality stage evaluating n_tokens AND quality over the same text,
  * that is 3-4 full passes per document where one suffices.
  *
  * Exact-equivalence contract (integer counts only — every ratio, clamp
  * and ROUND stays in Catalyst so FP behavior is the composed
  * expressions', bit for bit):
  *  - chars = `length(text)` = Unicode CODE POINTS (surrogate pairs are
  *    one char, as UTF8String.numChars counts them);
  *  - n_tokens = non-empty runs between Java-`\s` separators
  *    ([ \t\n\x0B\f\r]) — `lower`/`trim` in the composed chain cannot
  *    change token boundaries (case mapping never produces or consumes
  *    whitespace; trim only sheds outer spaces the empty-filter drops
  *    anyway), so counting runs of the RAW text is the same count;
  *  - stop_hits = tokens equal to an (ASCII) stopword after
  *    lowercasing. Pure-ASCII tokens lower byte-wise; a token with any
  *    non-ASCII char falls back to `UTF8String.toLowerCase` — the very
  *    function the composed `lower()` runs — so context-free mappings
  *    that land IN ASCII (Kelvin K → k) and multi-char expansions agree
  *    by construction. Whole-string vs per-token lowering differ only
  *    through context-sensitive rules (Greek final sigma), whose
  *    contexts are word-bounded by the same whitespace that bounds our
  *    tokens — and no ASCII stopword contains a char any such rule can
  *    produce;
  *  - punct_chars = chars in the explicit ASCII ranges
  *    `[!-/:-@[-`{-~]` — exactly what
  *    `length(text) - length(regexp_replace(text, …, ''))` counts.
  * TextFnsSpec pins fused == composed on randomized corpora (Unicode,
  * astral, pathological whitespace included).
  *
  * Locale assumption: the byte-wise ASCII fast path (+32) is
  * locale-independent, but `UTF8String.toLowerCase` falls back to
  * default-locale `String.toLowerCase` whenever the string holds any
  * non-ASCII char — under a tr/az default locale 'I' lowers to dotless
  * 'ı' in the composed path only, breaking the equivalence. The repo
  * pins `-Duser.language=en -Duser.country=US` in build.sbt and
  * tools/jrun.sh; a deployment on a Turkic-locale JVM must do the same
  * (r13 ADVICE). */
object TextStatsKernel {

  def stats(s: UTF8String, stopLower: java.util.HashSet[String],
            maxStopLen: Int): InternalRow = {
    val str = s.toString
    val n = str.length
    var chars = 0
    var nTokens = 0
    var stopHits = 0
    var punct = 0
    var tokStart = -1   // UTF-16 offset of current token, -1 = in separator
    var tokAscii = true // current token is pure ASCII so far

    def closeToken(end: Int): Unit = {
      if (tokStart >= 0) {
        nTokens += 1
        val len = end - tokStart
        // stopwords are short ASCII words — length-gate before any alloc
        if (tokAscii) {
          if (len <= maxStopLen) {
            var j = 0
            val b = new java.lang.StringBuilder(len)
            while (j < len) {
              val c = str.charAt(tokStart + j)
              b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
              j += 1
            }
            if (stopLower.contains(b.toString)) stopHits += 1
          }
        } else {
          // rare path: exact parity with the composed lower() via
          // UTF8String.toLowerCase on the token slice
          val lowered = UTF8String.fromString(str.substring(tokStart, end))
            .toLowerCase.toString
          if (stopLower.contains(lowered)) stopHits += 1
        }
        tokStart = -1
        tokAscii = true
      }
    }

    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000b' ||
        c == '\f' || c == '\r'
      if (isWs) closeToken(i)
      else {
        if (tokStart < 0) tokStart = i
        if (c >= 0x80) tokAscii = false
        // ASCII punct ranges [!-/] [:-@] [[-`] [{-~]
        if ((c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
            (c >= '[' && c <= '`') || (c >= '{' && c <= '~')) punct += 1
      }
      // code-point counting: skip the low surrogate of a valid pair
      if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(str.charAt(i + 1))) i += 2
      else i += 1
      chars += 1
    }
    closeToken(n)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](chars, nTokens, stopHits, punct))
  }
}

/** Native one-pass text statistics: `(chars, n_tokens, stop_hits,
  * punct_chars)` for the quality-gate signal family (see
  * [[TextStatsKernel]] for the equivalence contract). Identical
  * instances in one projection are deduplicated by whole-stage codegen's
  * subexpression elimination, so `tokenCount` + `qualityScore` over the
  * same column cost ONE scan. */
case class TextStatsExpr(child: Expression, stopwords: Seq[String])
  extends UnaryExpression {

  @transient private lazy val stopSet = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach { w =>
      require(w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'),
        s"stopwords must be lowercase ASCII words, got '$w'")
      s.add(w)
    }
    s
  }
  private lazy val maxStopLen: Int =
    if (stopwords.isEmpty) 0 else stopwords.map(_.length).max

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"text_stats expects a STRING child, got ${other.catalogString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("chars", DataTypes.IntegerType, nullable = false),
    StructField("n_tokens", DataTypes.IntegerType, nullable = false),
    StructField("stop_hits", DataTypes.IntegerType, nullable = false),
    StructField("punct_chars", DataTypes.IntegerType, nullable = false)))
  override def prettyName: String = "text_stats"

  protected override def nullSafeEval(input: Any): Any =
    TextStatsKernel.stats(input.asInstanceOf[UTF8String], stopSet, maxStopLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("textStatsStop", stopSet, "java.util.HashSet")
    if (child.nullable) {
      ev.copy(
        code = code"""
          ${c.code}
          boolean ${ev.isNull} = ${c.isNull};
          org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
          if (!${ev.isNull}) {
            ${ev.value} = graft.functions.TextStatsKernel.stats(${c.value}, $ref, $maxStopLen);
          }
        """)
    } else {
      ev.copy(
        code = code"""
          ${c.code}
          org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
            graft.functions.TextStatsKernel.stats(${c.value}, $ref, $maxStopLen);
        """,
        isNull = FalseLiteral)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}
