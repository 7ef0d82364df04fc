package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The final piece table of a trained unigram-LM tokenizer
  * ([[UnigramLm.Model]]), wrapped for the broadcast ride (fetched once
  * per executor — the [[LangIdTables]] discipline) with a transient
  * lazy lookup map rebuilt per executor. */
final case class UnigramTable(pieces: Array[String], logpQ: Array[Long]) {
  @transient lazy val lookup: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), logpQ(i)); i += 1 }
    m
  }
  /** piece -> id, where id = index in the (UTF-8-byte-order-sorted)
    * `pieces` array — the [[UnigramLm.pieceIds]] assignment, which both
    * engines re-derive as `row_number() OVER (ORDER BY piece) - 1`. */
  @transient lazy val idOf: java.util.HashMap[String, java.lang.Integer] = {
    val m = new java.util.HashMap[String, java.lang.Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), i); i += 1 }
    m
  }

  /** Bounded per-table WORD MEMO (the [[BpeRanks]] encode-memo design,
    * r17: the Viterbi DP ran per word OCCURRENCE — corpora repeat words
    * with Zipfian frequency, so after the first rows almost every
    * lookup is a hit). One instance per executor (the table rides a
    * broadcast), concurrent because an executor runs many tasks,
    * bounded at 2^20 entries so high-entropy corpora degrade to
    * cache-miss CPU, never OOM. Sound per table: maxPieceLen/maxWordLen
    * are model geometry, fixed for this table's lifetime. */
  @transient private lazy val segMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  def segment(word: String, maxPieceLen: Int, maxWordLen: Int): Array[String] = {
    val hit = segMemo.get(word)
    if (hit != null) return hit
    val out = UnigramLm.viterbi(word, lookup, maxPieceLen, maxWordLen)
    if (segMemo.size < (1 << 20)) segMemo.put(word, out)
    out
  }
}

/** Static kernel for [[UnigramSegmentExpr]] — shared by interpreted
  * eval and generated code (the [[BpeKernel]] pattern). Segments each
  * word via [[UnigramLm.viterbi]] (exact integer Viterbi, the oracle's
  * DP replay) and concatenates pieces across words; the score is the
  * exact long sum of piece logpQ (unknown code points price at
  * [[UnigramLm.UnkLogpQ]]), equal to the per-word DP optima by
  * additivity. */
object UnigramSegmentKernel {

  def segment(words: ArrayData, table: UnigramTable, maxPieceLen: Int,
              maxWordLen: Int): InternalRow = {
    var n = 0L
    var score = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    if (words != null) {
      val k = words.numElements()
      var i = 0
      while (i < k) {
        val w = words.getUTF8String(i)
        if (w != null) {
          val pieces = table.segment(w.toString, maxPieceLen, maxWordLen)
          var j = 0
          while (j < pieces.length) {
            val p = pieces(j)
            val lp = table.lookup.get(p)
            score += (if (lp != null) lp.longValue() else UnigramLm.UnkLogpQ)
            out += UTF8String.fromString(p)
            n += 1
            j += 1
          }
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, score, new GenericArrayData(out.toArray[Any])))
  }
}

/** Kernel for [[UnigramIdsExpr]]: token IDS of the Viterbi
  * segmentation, in document order — the training-file encode path
  * ([[Bpe.tokenIds]]' unigram counterpart). Three id layouts (the
  * [[BpeKernel.tokenIds]] parameterization):
  *
  *  - `byteBase < 0`: CLOSED plain layout — piece id = index in the
  *    UTF-8-sorted table; unknown pieces (out-of-corpus text only)
  *    emit id -1, never a silent skip (the q131/q132 oracle surface).
  *  - `byteBase >= 0`: OPEN byte-fallback layout (the q100 device) —
  *    ids `byteBase..byteBase+255` are the 256 UTF-8 byte tokens,
  *    every piece id shifts by 256; an unknown piece — always a
  *    single code point, because [[UnigramLm.viterbi]] only emits
  *    table pieces or single-cp unk fallbacks — becomes its UTF-8
  *    bytes. Day-2 text tokenizes instead of poisoning a training
  *    file with -1 (r16 verdict #1b/#6).
  *  - `markShift > 0`: MARKED stream — each word's FIRST emitted id
  *    shifts by `markShift` (the word-initial twin id of
  *    [[UnigramLm.vocabMarkedBytes]]), making the flat stream
  *    decodable back to the word model ([[Bpe.decodeIds]] semantics).
  */
object UnigramIdsKernel {
  def ids(words: ArrayData, table: UnigramTable, maxPieceLen: Int,
          maxWordLen: Int, markShift: Int, byteBase: Int): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (words != null) {
      val k = words.numElements()
      var i = 0
      while (i < k) {
        val w = words.getUTF8String(i)
        if (w != null) {
          val pieces = table.segment(w.toString, maxPieceLen, maxWordLen)
          var j = 0
          while (j < pieces.length) {
            val p = pieces(j)
            val id = table.idOf.get(p)
            if (id != null) {
              val base = id.intValue() + (if (byteBase >= 0) 256 else 0)
              out += (if (j == 0) base + markShift else base)
            } else if (byteBase >= 0) {
              // viterbi can only emit an unknown piece as a SINGLE code
              // point; a multi-cp miss is a wiring bug, never data
              if (p.codePointCount(0, p.length) != 1)
                throw new IllegalStateException(
                  s"unigram piece '$p' not in the ${table.pieces.length}-" +
                    "entry table and not a single code point — the " +
                    "broadcast table does not match the segmenter")
              val bytes = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              var b = 0
              while (b < bytes.length) {
                val bid = byteBase + (bytes(b) & 0xFF)
                out += (if (j == 0 && b == 0) bid + markShift else bid)
                b += 1
              }
            } else out += -1
            j += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Int])
  }
}

/** Native unigram-LM token-id encode: [[UnigramIdsKernel]] behind the
  * [[UnigramSegmentExpr]] deployment shape (broadcast table, one
  * compiled pass). Output: array<int> ids, document order. */
case class UnigramIdsExpr(child: Expression,
                          table: org.apache.spark.broadcast.Broadcast[UnigramTable],
                          maxPieceLen: Int, maxWordLen: Int,
                          markShift: Int = 0, byteBase: Int = -1)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: org.apache.spark.sql.types.StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_ids expects an ARRAY<STRING> child, got ${other.catalogString}")
    }
  override def dataType: DataType =
    ArrayType(DataTypes.IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "unigram_ids"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    UnigramIdsKernel.ids(v.asInstanceOf[ArrayData], table.value,
      maxPieceLen, maxWordLen, markShift, byteBase)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("unigramIdsTableBc", table,
      "org.apache.spark.broadcast.Broadcast")
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.UnigramIdsKernel.ids(
            ${c.isNull} ? null : ${c.value},
            (graft.functions.UnigramTable) $ref.value(),
            $maxPieceLen, $maxWordLen, $markShift, $byteBase);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramIdsExpr =
    copy(child = newChild)
}

/** Native unigram-LM segmentation: one compiled pass per row — Viterbi
  * over each word of the child array<string> against the broadcast
  * piece table. Output: (n_pieces, score_q, pieces); `concat_ws("",
  * pieces)` equals the concatenated input words exactly (roundtrip by
  * construction — every segmentation tiles its word, and unknown code
  * points become their own pieces). */
case class UnigramSegmentExpr(child: Expression,
                              table: org.apache.spark.broadcast.Broadcast[UnigramTable],
                              maxPieceLen: Int, maxWordLen: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: org.apache.spark.sql.types.StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_segment expects an ARRAY<STRING> child, got ${other.catalogString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", DataTypes.LongType, nullable = false),
    StructField("score_q", DataTypes.LongType, nullable = false),
    StructField("pieces", ArrayType(DataTypes.StringType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "unigram_segment"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    UnigramSegmentKernel.segment(v.asInstanceOf[ArrayData], table.value,
      maxPieceLen, maxWordLen)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("unigramTableBc", table,
      "org.apache.spark.broadcast.Broadcast")
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.functions.UnigramSegmentKernel.segment(
            ${c.isNull} ? null : ${c.value},
            (graft.functions.UnigramTable) $ref.value(),
            $maxPieceLen, $maxWordLen);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegmentExpr =
    copy(child = newChild)
}
