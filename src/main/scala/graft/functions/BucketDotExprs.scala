package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType, StructType}

/** Static kernel for [[BucketDotExpr]] — shared by interpreted eval and
  * generated code (the [[BpeKernel]] pattern).
  *
  * K exact integer dot products of one document's sparse bucket-count
  * vector against K weight tables: Σ_j c_j · w_k[b_j] for each table k.
  * This is the GD trainer's per-doc margin (QualityModel
  * .trainLogisticOnFeatsMulti) — previously a groupBy-sum over
  * `element_at(typedlit(w), b)` probes, which rode the K weight arrays
  * as PLAN LITERALS deserialized per task (K × 8 MB at the bits=21
  * ceiling × 32 concurrent tasks — the FrozenBigramTables OOM pattern
  * the engine banished from its scoring kernels, r15 verdict #3 applied
  * it to the trainer). Here the tables ride ONE broadcast fetched once
  * per executor, and the margin needs no aggregation at all: the pairs
  * are already packed per document. All arithmetic is exact long
  * multiply-add of int weights — no floating point, so the kernel and
  * the groupBy-sum it replaced cannot diverge (the q105/q107/q112
  * oracle hashes pin it cross-engine). */
object BucketDotKernel {

  /** `pairs` = array of (b: long, c: long) structs; returns array of K
    * longs. A null/empty pairs array yields all-zero margins, exactly
    * like the empty groupBy-sum. */
  def dots(pairs: ArrayData, tables: LangIdTables): ArrayData = {
    val k = tables.weights.length
    val ws = new Array[Long](k)
    if (pairs != null) {
      val m = pairs.numElements()
      var i = 0
      while (i < m) {
        val row = pairs.getStruct(i, 2)
        val b = row.getLong(0).toInt
        val c = row.getLong(1)
        var j = 0
        while (j < k) { ws(j) += c * tables.weights(j)(b); j += 1 }
        i += 1
      }
    }
    new GenericArrayData(ws)
  }
}

/** Native per-document margin probe for the GD trainer: one compiled
  * pass over the packed (bucket, count) pairs, probing all K broadcast
  * weight tables — see [[BucketDotKernel]]. Output: array<long> of the
  * K margins, index-aligned with [[LangIdTables.weights]]. */
case class BucketDotExpr(child: Expression,
                         tables: org.apache.spark.broadcast.Broadcast[LangIdTables])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
          if s.length == 2 && s.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bucket_dot expects ARRAY<STRUCT<long, long>>, got ${other.catalogString}")
    }
  override def dataType: DataType =
    ArrayType(DataTypes.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bucket_dot"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    BucketDotKernel.dots(v.asInstanceOf[ArrayData], tables.value)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("bucketDotTablesBc", tables,
      "org.apache.spark.broadcast.Broadcast")
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.BucketDotKernel.dots(
            ${c.isNull} ? null : ${c.value},
            (graft.functions.LangIdTables) $ref.value());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BucketDotExpr =
    copy(child = newChild)
}
