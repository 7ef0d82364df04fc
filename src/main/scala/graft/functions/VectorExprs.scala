package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native SRP-bucket expressions — the LSH blocking kernels of the
  * similarity family as whole-stage-codegen expressions, same ladder step
  * as [[ShingleSetExpr]]/[[MinHashSigExpr]]: `doGenCode` emits a direct
  * static call into [[VectorKernel]], eliminating the ScalaUDF
  * encoder/deserializer boundary the previous UDF kernels paid PER ROW ×
  * PER SEED on every corpus scan (q43/q44's bucket assignment — a 100 TB
  * hot path). The hyperplane matrix rides along as a codegen reference
  * object, not inlined constants, so any bits/dim sizing compiles to the
  * same generated code shape.
  *
  * Null vector -> bucket 0 (never null), matching the UDFs these replace;
  * VectorExprSpec pins UDF-vs-expression equality. */
case class SrpBucketIntExpr(child: Expression, planes: Array[Array[Int]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"srp_bucket_int expects ARRAY<BIGINT>, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "srp_bucket_int"

  override def eval(input: InternalRow): Any =
    VectorKernel.srpBucketInt(
      child.eval(input).asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("srpPlanesInt", planes, "int[][]")
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = graft.functions.VectorKernel.srpBucketInt(
          ${c.isNull} ? null : ${c.value}, $ref);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucketIntExpr =
    copy(child = newChild)
}

/** Gaussian-plane sibling of [[SrpBucketIntExpr]] (`array<float>` input). */
case class SrpBucketExpr(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"srp_bucket expects ARRAY<FLOAT>, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "srp_bucket"

  override def eval(input: InternalRow): Any =
    VectorKernel.srpBucket(
      child.eval(input).asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = graft.functions.VectorKernel.srpBucket(
          ${c.isNull} ? null : ${c.value}, $ref);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucketExpr =
    copy(child = newChild)
}
