package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, FloatType, LongType}

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

/** Native q44 cosine-threshold test — `qdot > 0 && qdot²·tden² >=
  * tnum²·a2·b2` evaluated EXACTLY at any dim/scale via
  * [[VectorKernel.cmpProd3]]'s 192-bit limb compare (`Math.multiplyHigh`),
  * replacing the last ScalaUDF in the 68 oracle plans (a BigInt
  * cross-multiply). Runs post-blocking on candidate scalars, now inside
  * the whole-stage span with zero allocation.
  *
  * Null inputs -> false (never produced by the q44 pipeline — norms and
  * dots of non-null quantized vectors — but total anyway). */
case class CosineThresholdExpr(qdot: Expression, a2: Expression, b2: Expression,
                               thresholdNum: Long, thresholdDen: Long)
  extends TernaryExpression {

  require(thresholdNum >= 0 && thresholdDen > 0 &&
    thresholdNum < Int.MaxValue && thresholdDen < Int.MaxValue,
    s"threshold must be a non-negative int ratio, got $thresholdNum/$thresholdDen")
  private val tnum2 = thresholdNum * thresholdNum
  private val tden2 = thresholdDen * thresholdDen

  override def first: Expression = qdot
  override def second: Expression = a2
  override def third: Expression = b2
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_ge expects three BIGINT children, got ${children.map(_.dataType.catalogString).mkString(", ")}")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "cosine_ge"

  override def eval(input: InternalRow): Any = {
    val q = qdot.eval(input)
    val a = a2.eval(input)
    val b = b2.eval(input)
    q != null && a != null && b != null &&
      VectorKernel.cosinePasses(q.asInstanceOf[Long], a.asInstanceOf[Long],
        b.asInstanceOf[Long], tnum2, tden2)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = qdot.genCode(ctx)
    val a = a2.genCode(ctx)
    val b = b2.genCode(ctx)
    ev.copy(
      code = code"""
        ${q.code}
        ${a.code}
        ${b.code}
        boolean ${ev.value} = !${q.isNull} && !${a.isNull} && !${b.isNull} &&
          graft.functions.VectorKernel.cosinePasses(
            ${q.value}, ${a.value}, ${b.value}, ${tnum2}L, ${tden2}L);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CosineThresholdExpr =
    copy(qdot = newFirst, a2 = newSecond, b2 = newThird)
}
