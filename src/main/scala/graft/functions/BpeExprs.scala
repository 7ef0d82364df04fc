package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE token-count expression — tokenizer-faithful token accounting
  * inside whole-stage codegen (the [[ShingleSetExpr]] ladder step: no
  * ScalaUDF boundary, one static call into [[BpeKernel]] per row). The
  * merge table rides along as a codegen REFERENCE OBJECT (shared
  * [[BpeRanks]] instance, so its word-encode memo is shared across every
  * row a task processes), not as inlined constants.
  *
  * `merges` is a Seq (not Array) so case-class equality — which Catalyst
  * uses for subexpression elimination and plan matching — is structural.
  * Null text -> 0, never null. */
case class BpeTokenCountExpr(child: Expression, merges: Seq[(String, String)],
                             faithful: Boolean = false)
  extends UnaryExpression {

  @transient private lazy val ranks = new BpeRanks(merges.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count expects a STRING child, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bpe_token_count"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    BpeKernel.tokenCount(
      if (v == null) null else v.asInstanceOf[UTF8String].toString, ranks,
      faithful)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "graft.functions.BpeRanks")
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = graft.functions.BpeKernel.tokenCount(
          ${c.isNull} ? null : ${c.value}.toString(), $ref, $faithful);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCountExpr =
    copy(child = newChild)
}

/** Sibling of [[BpeTokenCountExpr]] returning the tokens themselves
  * (`array<string>`, word-order preserved) — the materializing form for
  * downstream packing/chunking. Null/blank text -> EMPTY array, never
  * null. */
case class BpeTokensExpr(child: Expression, merges: Seq[(String, String)],
                         faithful: Boolean = false)
  extends UnaryExpression {

  @transient private lazy val ranks = new BpeRanks(merges.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_tokens expects a STRING child, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(DataTypes.StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bpe_tokens"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    BpeKernel.tokens(
      if (v == null) null else v.asInstanceOf[UTF8String].toString, ranks,
      faithful)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "graft.functions.BpeRanks")
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.BpeKernel.tokens(
            ${c.isNull} ? null : ${c.value}.toString(), $ref, $faithful);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokensExpr =
    copy(child = newChild)
}

/** Token-ID sibling: encode + O(1) hash-map vocabulary lookup in one
  * kernel call (`array<int>`, never null). Catalyst's own literal-map
  * `element_at` (GetMapValue) does a LINEAR scan per lookup — measured
  * superlinear on the r11 marked-pipeline decade at a 1k-merge
  * vocabulary — so the map rides as a reference object instead.
  * `markShift > 0` = marked stream (word-initial piece id + shift, the
  * decodable form); 0 = the flat unmarked stream (q97's oracle-checked
  * ids). `byteBase >= 0` = UTF-8 byte fallback for out-of-alphabet code
  * points (byte b -> id byteBase + b; see [[BpeKernel.tokenIds]]) — the
  * open-vocabulary mode a PERSISTED tokenizer needs on day-2 corpora;
  * -1 = closed vocabulary, any miss throws. */
case class BpeTokenIdsExpr(child: Expression, merges: Seq[(String, String)],
                           vocab: Seq[(String, Int)], markShift: Int,
                           byteBase: Int, faithful: Boolean = false)
  extends UnaryExpression {

  @transient private lazy val ranks = new BpeRanks(merges.toArray)
  @transient private lazy val vmap = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.foreach { case (t, i) => m.put(t, Integer.valueOf(i)) }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_token_ids expects a STRING child, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(DataTypes.IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bpe_token_ids"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    BpeKernel.tokenIds(
      if (v == null) null else v.asInstanceOf[UTF8String].toString,
      ranks, vmap, markShift, byteBase, faithful)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "graft.functions.BpeRanks")
    val vref = ctx.addReferenceObj("bpeVocab", vmap, "java.util.HashMap")
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.BpeKernel.tokenIds(
            ${c.isNull} ? null : ${c.value}.toString(), $ref, $vref, $markShift, $byteBase, $faithful);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenIdsExpr =
    copy(child = newChild)
}

/** Inverse of the MARKED [[BpeTokenIdsExpr]] stream: `array<int>` ids
  * back to word-model text in one kernel call ([[BpeKernel.decodeIds]]
  * — byte-fallback runs reassemble as UTF-8, marked twins become word
  * breaks). The reverse array rides as a reference object; the composed
  * Column alternative (literal-map `element_at` per id + a lambda
  * decode) pays GetMapValue's linear scan per token AND cannot
  * reassemble byte runs at all. Null ids -> null. */
case class BpeDecodeIdsExpr(child: Expression, vocab: Seq[(String, Int)],
                            markShift: Int, byteBase: Int,
                            marked: Boolean = true)
  extends UnaryExpression {

  @transient private lazy val rev: Array[String] = {
    val a = new Array[String](markShift)
    vocab.foreach { case (t, i) => if (i < markShift) a(i) = t }
    a
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DataTypes.IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_decode_ids expects an ARRAY<INT> child, got ${other.catalogString}")
    }
  override def dataType: DataType = DataTypes.StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_decode_ids"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else BpeKernel.decodeIds(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      rev, markShift, byteBase, marked)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rref = ctx.addReferenceObj("bpeRev", rev, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernel.decodeIds($c, $rref, $markShift, $byteBase, $marked);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDecodeIdsExpr =
    copy(child = newChild)
}

/** Pretokens of `text` under the FAITHFUL word model
  * ([[BpeKernel.pretokens]]): the tiling pre-tokenization whose
  * concatenation reproduces the (U+0001/U+0002-stripped) text exactly.
  * Used by the faithful trainer's word-count shuffle and the faithful
  * alphabet derivation; same codegen-reference-free static-call shape as
  * the other kernels. Null text -> EMPTY array, never null. */
case class BpePretokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_pretokens expects a STRING child, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(DataTypes.StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bpe_pretokens"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    BpeKernel.pretokensData(
      if (v == null) null else v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.BpeKernel.pretokensData(
            ${c.isNull} ? null : ${c.value}.toString());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BpePretokensExpr =
    copy(child = newChild)
}
