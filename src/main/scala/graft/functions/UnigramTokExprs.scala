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
          val pieces = UnigramLm.viterbi(w.toString, table.lookup,
            maxPieceLen, maxWordLen)
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
  * ([[Bpe.tokenIds]]' unigram counterpart). Unknown pieces (possible
  * only on out-of-corpus text) emit id -1, never a silent skip. */
object UnigramIdsKernel {
  def ids(words: ArrayData, table: UnigramTable, maxPieceLen: Int,
          maxWordLen: Int): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (words != null) {
      val k = words.numElements()
      var i = 0
      while (i < k) {
        val w = words.getUTF8String(i)
        if (w != null) {
          val pieces = UnigramLm.viterbi(w.toString, table.lookup,
            maxPieceLen, maxWordLen)
          var j = 0
          while (j < pieces.length) {
            val id = table.idOf.get(pieces(j))
            out += (if (id != null) id.intValue() else -1)
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
                          maxPieceLen: Int, maxWordLen: Int)
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
      maxPieceLen, maxWordLen)
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
            $maxPieceLen, $maxWordLen);
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
