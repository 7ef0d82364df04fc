package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[CleanTextExpr]] — the whole
  * [[TextFns.cleanText]] contract (mojibake repair → ASCII-control strip
  * → whitespace canonicalization → space trim) in ONE scan of the
  * string.
  *
  * The composed Column form is ~`MojibakeFixes.size` sequential
  * `replace` passes plus four regexp passes, each allocating a full
  * intermediate string — measured as the bulk of the corpus pipeline's
  * `clean` stage (its biggest single stage at rich32 after the r12/r13
  * dedup rewrites). One fused pass does the same work in O(len) with one
  * output buffer.
  *
  * Equivalence to the composed chain is STRUCTURAL, not hopeful:
  *  - mojibake: the fix table is prefix-free (at most one pattern
  *    matches at a position), patterns never overlap in original text
  *    (no pattern's suffix is another's prefix — patterns start â/Ã/Â,
  *    suffixes never do), and the table's ANTI-CASCADE ordering
  *    (TextFns.MojibakeTargets doc: dashes before quotes, because the
  *    quote outputs “ ” are the final chars of the dash patterns)
  *    guarantees no fix's output completes a pattern with a pending
  *    pass — so the global-replace chain == one left-to-right scan.
  *    The initial draft of this kernel assumed outputs never occur in
  *    patterns; the randomized spec caught the “/– and ”/— cascades on
  *    day one, which is why the ordering invariant is now explicit;
  *  - control strip `[\x00-\x08\x0B-\x1F\x7F]` → skip those code points;
  *  - whitespace: `[ \t]+`→' ', ` ?\n ?`→'\n', `\n{3,}`→"\n\n", then
  *    space-only `trim` collapses to: each maximal {space,tab,\n} run
  *    with k newlines becomes " " (k=0), "\n" (k=1) or "\n\n" (k≥2);
  *    leading/trailing k=0 runs vanish (trim removes spaces, and ONLY
  *    spaces — a leading "\n" survives the composed chain and survives
  *    here; CleanFnsSpec pins this on the probe fixtures).
  * TextFnsSpec additionally pins kernel == composed chain on randomized
  * corpora seeded with every garbled variant, partial patterns,
  * control runs and pathological whitespace. */
object CleanTextKernel {

  /** (pattern, replacement) by first pattern char. Built FROM
    * [[TextFns.MojibakeFixes]] — one source of truth with the composed
    * form and the DuckDB oracle compile. */
  private val byFirst: java.util.HashMap[Character, Array[(Array[Char], Char)]] = {
    val m = new java.util.HashMap[Character, scala.collection.mutable.ArrayBuffer[(Array[Char], Char)]]()
    TextFns.MojibakeFixes.foreach { case (bad, good) =>
      require(good.length == 1,
        s"kernel assumes 1-char replacements, got '$good' (${good.length})")
      val buf = m.computeIfAbsent(bad.charAt(0),
        _ => scala.collection.mutable.ArrayBuffer.empty)
      buf += ((bad.toCharArray, good.charAt(0)))
    }
    val out = new java.util.HashMap[Character, Array[(Array[Char], Char)]](m.size * 2)
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  /** The lowest char that can start a mojibake pattern — everything
    * below short-circuits the table probe (ASCII fast path). */
  private val minFirst: Char =
    TextFns.MojibakeFixes.iterator.map(_._1.charAt(0)).min

  def clean(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var pendingNl = 0     // newlines in the current whitespace run
    var pendingWs = false // any space/tab/newline pending
    var emitted = false   // content emitted so far (leading-trim state)
    var i = 0
    while (i < n) {
      var c = str.charAt(i)
      var adv = 1
      if (c >= minFirst) {
        val cands = byFirst.get(Character.valueOf(c))
        if (cands != null) {
          var j = 0
          while (j < cands.length && adv == 1) {
            val (pat, rep) = cands(j)
            if (i + pat.length <= n) {
              var k = 1
              while (k < pat.length && str.charAt(i + k) == pat(k)) k += 1
              if (k == pat.length) { c = rep; adv = pat.length }
            }
            j += 1
          }
        }
      }
      if (c == ' ' || c == '\t') pendingWs = true
      else if (c == '\n') { pendingWs = true; pendingNl += 1 }
      else if (c < ' ' || c == '\u007f') { /* ASCII control: strip */ }
      else {
        if (pendingWs) {
          if (pendingNl == 0) { if (emitted) sb.append(' ') }
          else { sb.append('\n'); if (pendingNl >= 2) sb.append('\n') }
          pendingWs = false; pendingNl = 0
        }
        sb.append(c)
        emitted = true
      }
      i += adv
    }
    if (pendingNl > 0) { sb.append('\n'); if (pendingNl >= 2) sb.append('\n') }
    UTF8String.fromString(sb.toString)
  }
}

/** Native one-pass text cleanup: the fused scan of
  * [[TextFns.cleanText]]'s replace/regexp chain (see
  * [[CleanTextKernel]]). Pure per-row compute — stays inside the scan's
  * whole-stage codegen span, zero exchanges, and the DuckDB oracle keeps
  * replaying the composed chain so the correctness gate cross-checks the
  * fusion on every run. */
case class CleanTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"clean_text expects a STRING child, got ${other.catalogString}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "clean_text"

  protected override def nullSafeEval(input: Any): Any =
    CleanTextKernel.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CleanTextKernel.clean($c)")

  override protected def withNewChildInternal(newChild: Expression): CleanTextExpr =
    copy(child = newChild)
}
