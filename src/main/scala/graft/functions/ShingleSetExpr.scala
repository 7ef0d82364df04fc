package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the hashed shingle-set kernel — the
  * step above a Scala UDF in the custom-operator ladder: `doGenCode`
  * emits a direct static call into [[ShingleKernel]], so the projection
  * stays inside the whole-stage-codegen span (no ScalaUDF
  * encoder/serializer boundary, no per-row closure dispatch — the
  * generated Java calls the same compiled loop the UDF wraps).
  *
  * Semantics are identical to the UDF form (`ShingleExprSpec` pins the
  * equality, including null/empty text -> EMPTY ARRAY, never null —
  * hence `nullable = false` and a hand-rolled eval/codegen instead of
  * the null-propagating `nullSafeEval` template). */
case class ShingleSetExpr(child: Expression, shingleN: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_set expects a STRING child, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "shingle_set"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    ShingleKernel.shingleSetData(
      if (v == null) null else v.asInstanceOf[UTF8String].toString, shingleN)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.ShingleKernel.shingleSetData(
            ${c.isNull} ? null : ${c.value}.toString(), $shingleN);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSetExpr =
    copy(child = newChild)
}

/** Native expression for the frequency-preserving shingle LIST kernel —
  * the non-distinct sibling of [[ShingleSetExpr]], same codegen strategy
  * (static call into [[ShingleKernel]] inside the whole-stage span).
  * Closes the last hot-path ScalaUDF in the dedup family: the q52
  * corpus-frequency pass now shingles 100 TB without crossing the UDF
  * encoder boundary per row. */
case class ShingleListExpr(child: Expression, shingleN: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_list expects a STRING child, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "shingle_list"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    ShingleKernel.shingleListData(
      if (v == null) null else v.asInstanceOf[UTF8String].toString, shingleN)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.ShingleKernel.shingleListData(
            ${c.isNull} ? null : ${c.value}.toString(), $shingleN);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleListExpr =
    copy(child = newChild)
}

/** Native MinHash-signature expression over a hashed shingle set
  * (`array<long>` -> `array<long>` of length `numHashes`) — the second
  * compute-bound per-row kernel of the dedup family, same codegen
  * strategy as [[ShingleSetExpr]]: a static call into [[ShingleKernel]]
  * inside the whole-stage span. */
case class MinHashSigExpr(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects ARRAY<BIGINT>, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def eval(input: InternalRow): Any =
    ShingleKernel.minhashSignature(
      child.eval(input).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.ShingleKernel.minhashSignature(
            ${c.isNull} ? null : ${c.value}, $numHashes);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Native 64-bit SimHash expression (string -> long) — the FNV fast-path
  * kernel of the SimHash family as a codegen expression; the md5-based
  * 60-bit portable variant is [[SimHash60Md5Expr]]. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects a STRING child, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash64"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    ShingleKernel.simhash64(
      if (v == null) null else v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = graft.functions.ShingleKernel.simhash64(
          ${c.isNull} ? null : ${c.value}.toString());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Native 60-bit engine-portable md5 SimHash expression (string -> long) —
  * same codegen strategy as [[SimHash64Expr]] (static call into
  * [[ShingleKernel.simhash60Md5]] inside the whole-stage span). Exists for
  * external-engine parity (the DuckDB oracle reproduces signatures
  * bit-exactly); promoted from a ScalaUDF so even the oracle-portable q41
  * plan carries no UDF encoder boundary. */
case class SimHash60Md5Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash60_md5 expects a STRING child, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash60_md5"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    ShingleKernel.simhash60Md5(
      if (v == null) null else v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = graft.functions.ShingleKernel.simhash60Md5(
          ${c.isNull} ? null : ${c.value}.toString());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60Md5Expr =
    copy(child = newChild)
}
