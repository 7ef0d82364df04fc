package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, StructField, StructType}

/** Static kernel for [[RepetitionStatsExpr]] — shared by interpreted
  * eval and generated code (the [[BpeKernel]] pattern).
  *
  * Signal definitions (all exact integers — no floating point anywhere,
  * so the DuckDB replay is bit-equal by construction):
  *  - `n_words`, `n_word_chars` = token count and Σ code points per token;
  *  - for n ∈ {2,3,4}: `topN_cnt` = the highest occurrence count of any
  *    word n-gram; `topN_chars` = MAX over n-grams of cnt · gram_chars,
  *    where gram_chars counts the SPACE-JOINED gram's code points (the
  *    max single-n-gram character coverage — the Gopher top-n-gram
  *    fraction's numerator, taken as max-coverage rather than
  *    most-frequent so ties cannot make the metric order-sensitive);
  *  - for n ∈ {5,10}: `dupN_chars` = Σ over n-grams with cnt ≥ 2 of
  *    cnt · gram_chars (the duplicated-n-gram coverage numerator;
  *    overlap-blind by definition, so consumers clamp the fraction).
  * Fractions are left to the caller (numerator/denominator both in the
  * output), keeping every emitted value an exact integer. */
object RepetitionKernel {

  private val Ns = Array(2, 3, 4, 5, 10)

  /** (n_words, n_word_chars, top2_cnt, top2_chars, top3_cnt, top3_chars,
    * top4_cnt, top4_chars, dup5_chars, dup10_chars) for one token array. */
  def stats(toks: ArrayData): InternalRow = {
    val out = Array.fill[Any](10)(0L)
    if (toks != null) {
      val n = toks.numElements()
      val words = new Array[String](n)
      var wordChars = 0L
      var i = 0
      while (i < n) {
        words(i) = toks.getUTF8String(i).toString
        wordChars += words(i).codePointCount(0, words(i).length)
        i += 1
      }
      out(0) = n.toLong
      out(1) = wordChars
      var ni = 0
      while (ni < Ns.length) {
        val g = Ns(ni)
        if (n >= g) {
          val counts = new java.util.HashMap[String, java.lang.Long](n * 2)
          val sb = new java.lang.StringBuilder
          var w = 0
          while (w + g <= n) {
            sb.setLength(0)
            var k = 0
            while (k < g) {
              if (k > 0) sb.append(' ')
              sb.append(words(w + k))
              k += 1
            }
            val key = sb.toString
            val prev = counts.get(key)
            counts.put(key, if (prev == null) 1L else prev + 1L)
            w += 1
          }
          if (g <= 4) {
            var topCnt = 0L
            var topChars = 0L
            val it = counts.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              val cnt = e.getValue.longValue
              val chars = e.getKey.codePointCount(0, e.getKey.length)
              if (cnt > topCnt) topCnt = cnt
              val cov = cnt * chars
              if (cov > topChars) topChars = cov
            }
            out(2 * ni + 2) = topCnt
            out(2 * ni + 3) = topChars
          } else {
            var dup = 0L
            val it = counts.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              val cnt = e.getValue.longValue
              if (cnt >= 2L)
                dup += cnt * e.getKey.codePointCount(0, e.getKey.length)
            }
            out(if (g == 5) 8 else 9) = dup
          }
        }
        ni += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}

/** Native word-n-gram repetition statistics — the Gopher-class
  * repetitive-text quality signals (top-n-gram character coverage for
  * n = 2..4, duplicated-n-gram coverage for n = 5 and 10) computed in
  * ONE compiled pass per row with per-doc hash maps. The Column-level
  * alternative is an explode + corpus-keyed groupBy per n — five
  * corpus shuffles for what is per-row arithmetic; this is the same
  * zero-exchange argument as [[TextStatsExpr]], one level up
  * (per-doc MAPS instead of per-doc counters). All outputs are exact
  * integers (see [[RepetitionKernel]]), so the q121 oracle replays
  * them bit-for-bit from SQL GROUP BYs. */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: org.apache.spark.sql.types.StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"repetition_stats expects an ARRAY<STRING> child, got ${other.catalogString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", DataTypes.LongType, nullable = false),
    StructField("n_word_chars", DataTypes.LongType, nullable = false),
    StructField("top2_cnt", DataTypes.LongType, nullable = false),
    StructField("top2_chars", DataTypes.LongType, nullable = false),
    StructField("top3_cnt", DataTypes.LongType, nullable = false),
    StructField("top3_chars", DataTypes.LongType, nullable = false),
    StructField("top4_cnt", DataTypes.LongType, nullable = false),
    StructField("top4_chars", DataTypes.LongType, nullable = false),
    StructField("dup5_chars", DataTypes.LongType, nullable = false),
    StructField("dup10_chars", DataTypes.LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "repetition_stats"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    RepetitionKernel.stats(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.functions.RepetitionKernel.stats(
            ${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

/** Static kernel for [[CharEntropyExpr]]. Per-TERM quantization before
  * the sum (the q76 LM discipline): each distinct code point c with
  * count k contributes floor(k·(ln n − ln k)/n · 1e6 + 0.5) — an exact
  * integer, summed over the (unordered) distinct-char set, so the
  * result is partitioning- and iteration-order-independent, and the
  * SQL replay computes the IDENTICAL per-term expression from its
  * per-(doc,char) GROUP BY. ln is StrictMath.log — the same fdlibm
  * Catalyst's own `log()` binds to, carrying the established empirical
  * parity with DuckDB's ln at 1e-6 quantization (every LM oracle rides
  * it). */
object CharEntropyKernel {

  /** (n_chars, n_distinct, entropy_q6) of one string — code-point
    * counts over the RAW text (entropy is a binary/gibberish signal;
    * casefolding would blunt it). Null/empty → (0, 0, 0). */
  def entropy(text: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    var n = 0L
    var distinct = 0L
    var eq6 = 0L
    if (text != null) {
      val s = text.toString
      val counts = new java.util.HashMap[Integer, java.lang.Long](64)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val prev = counts.get(cp)
        counts.put(cp, if (prev == null) 1L else prev + 1L)
        n += 1
        i += Character.charCount(cp)
      }
      distinct = counts.size.toLong
      if (n > 0) {
        val lnN = java.lang.StrictMath.log(n.toDouble)
        val it = counts.values().iterator()
        while (it.hasNext) {
          val k = it.next().longValue
          val term = k.toDouble * (lnN - java.lang.StrictMath.log(k.toDouble)) /
            n.toDouble * 1e6
          eq6 += math.floor(term + 0.5).toLong
        }
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, distinct, eq6))
  }
}

/** Native per-document character-level Shannon entropy (fixed-point
  * micro-nats) — the gibberish/binary/encoding-junk quality signal that
  * complements the token-level gates: random base64 and hex blobs have
  * near-maximal char entropy, degenerate repetition near-zero, natural
  * language a stable mid band. ONE compiled pass per row with a per-doc
  * code-point histogram; the Column equivalent is a per-char explode +
  * corpus-keyed groupBy (a corpus shuffle for per-row arithmetic —
  * the q121 argument at character granularity). */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_entropy expects a STRING child, got ${other.catalogString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", DataTypes.LongType, nullable = false),
    StructField("n_distinct", DataTypes.LongType, nullable = false),
    StructField("entropy_q6", DataTypes.LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "char_entropy"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    CharEntropyKernel.entropy(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.functions.CharEntropyKernel.entropy(
            ${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}
