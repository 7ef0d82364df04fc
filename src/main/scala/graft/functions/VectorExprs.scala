package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
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

/** Native exact integer dot product over two quantized (`array<long>`)
  * vectors — the per-PAIR kernel of every embedding join (q42/q43/q44/
  * q62/q65/q70/q82/q85), via [[VectorKernel.quantizedDot]]'s tight
  * primitive loop. Replaces the `aggregate(zip_with(...))` higher-order
  * formulation, which is interpreted (HOFs have no `doGenCode`) and
  * allocates the zipped intermediate array per evaluation — measured
  * 530 ns/pair on the sf4 SemDeDup 160M-pair join, where the dot is
  * evaluated once per CANDIDATE PAIR, not once per row.
  *
  * Null semantics match the HOF form exactly (VectorExprSpec pins it):
  * null if either side is null OR the lengths differ (zip_with null-pads
  * the shorter side, which nulls the product sum) — so swapping the
  * kernel can never flip a result. */
case class QuantizedDotExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_dot expects two ARRAY<BIGINT> children, got ${children.map(_.dataType.catalogString).mkString(", ")}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_dot"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else VectorKernel.quantizedDot(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${l.isNull} && !${r.isNull} &&
          ${l.value}.numElements() == ${r.value}.numElements()) {
        ${ev.value} = graft.functions.VectorKernel.quantizedDot(${l.value}, ${r.value});
        ${ev.isNull} = false;
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 argmin over an inlined centroid matrix — the
  * assignment step of the IVF/k-means family (q62/q63/q70/q82), via
  * [[VectorKernel.centroidArgmin]]. The HOF form it replaces
  * (`element_at(array_sort(transform(centLits, ...)), 1).getField("cid")`)
  * is interpreted and allocates nlist structs PLUS a sort per row per
  * scan — at the sf4 profile it dominated the 8-iteration k-means
  * converge (14.8 s of a 23.6 s q70). Centroids ride along as a codegen
  * reference object (like the SRP planes), so any nlist compiles to the
  * same generated code. `cids` must be sorted ascending: ties then break
  * to the lowest cid exactly like the (dist², cid) struct sort
  * (VectorExprSpec pins native == HOF). Null vector -> null, matching
  * the HOF chain. */
case class CentroidArgminExpr(child: Expression, cents: Array[Array[Long]],
                              cids: Array[Long])
  extends UnaryExpression {

  require(cents.nonEmpty && cents.length == cids.length,
    s"need matching non-empty cents/cids, got ${cents.length}/${cids.length}")
  require(cids.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "cids must be sorted strictly ascending (the tie-break contract)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"centroid_argmin expects ARRAY<BIGINT>, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "centroid_argmin"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else VectorKernel.centroidArgmin(v.asInstanceOf[ArrayData], cents, cids)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val centsRef = ctx.addReferenceObj("argminCents", cents, "long[][]")
    val cidsRef = ctx.addReferenceObj("argminCids", cids, "long[]")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.VectorKernel.centroidArgmin(
          ${c.value}, $centsRef, $cidsRef);
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidArgminExpr =
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
