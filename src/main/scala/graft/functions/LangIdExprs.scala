package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DataTypes, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The K weight tables of a trained lang-ID model, wrapped for the
  * broadcast ride (the [[FrozenBigramTables]] discipline: a reference
  * object deserializes once per TASK; a broadcast is fetched once per
  * executor — at the 2^21-bucket ceiling × K languages that difference
  * is measured OOM territory, the r14 lesson applied engine-wide). */
final case class LangIdTables(weights: Array[Array[Int]])

/** Static kernel for [[LangMarginsExpr]] — shared by interpreted eval
  * and generated code (the [[BpeKernel]] pattern).
  *
  * Exact-parity contract with the Column composition it replaces
  * (`transform(charNgrams(text,n), t -> h32(seed:t) % 2^bits)` folded
  * through K `element_at` probes — QualityModel.langMargins through
  * r14): the text is ALREADY lowercased by the caller (the child wraps
  * Spark's own `lower`, so collation semantics can never diverge);
  * windows step code points exactly like `substringSQL`
  * (UTF8String.numBytesForFirstByte boundaries over the same bytes);
  * each window hashes as md5 over (seed ++ ":" ++ window-bytes) with the
  * bucket = first-4-digest-bytes-unsigned mod nBuckets — bit-identical
  * to `conv(substring(md5(concat(seed,':',t)),1,8),16,10) % nBuckets`.
  * All sums are exact long adds of int weights: no floating point
  * anywhere, so kernel and HOF cannot diverge (the q112 oracle hash
  * pins it). */
object LangIdKernel {

  /** Margins of one document: returns packed (n, ws_0 .. ws_{K-1}) —
    * n-gram count plus one summed weight per language. A null/short text
    * yields (0, 0...) exactly like the empty-array fold. */
  def margins(lowered: UTF8String, seedColon: Array[Byte], charN: Int,
              nBuckets: Int, tables: LangIdTables): InternalRow = {
    val k = tables.weights.length
    val out = new Array[Any](1 + k)
    var n = 0L
    val ws = new Array[Long](k)
    if (lowered != null) {
      val bytes = lowered.getBytes
      // code-point start offsets, the substringSQL walk
      var cpCount = 0
      var p = 0
      while (p < bytes.length) {
        p += UTF8String.numBytesForFirstByte(bytes(p))
        cpCount += 1
      }
      if (cpCount >= charN) {
        val offs = new Array[Int](cpCount + 1)
        var i = 0
        p = 0
        while (p < bytes.length) {
          offs(i) = p
          p += UTF8String.numBytesForFirstByte(bytes(p))
          i += 1
        }
        offs(cpCount) = bytes.length
        val md = java.security.MessageDigest.getInstance("MD5")
        var w = 0
        while (w + charN <= cpCount) {
          md.reset()
          md.update(seedColon)
          md.update(bytes, offs(w), offs(w + charN) - offs(w))
          val d = md.digest()
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          val b = (h % nBuckets).toInt
          var j = 0
          while (j < k) { ws(j) += tables.weights(j)(b); j += 1 }
          n += 1
          w += 1
        }
      }
    }
    out(0) = n
    var j = 0
    while (j < k) { out(1 + j) = ws(j); j += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}

/** Native K-language margin scan of a trained hashed char-n-gram
  * classifier (QualityModel.LangIdModel): ONE compiled pass per row —
  * slice windows, hash each ONCE, probe all K weight tables — replacing
  * the `aggregate` higher-order fold (CodegenFallback, and measured
  * re-evaluating under multi-field extraction in the q112 bench shape:
  * 8.2 s vs 4.3 s for the same scan at sf0.1). Output struct matches
  * the fold's exactly: (n, ws_<lang>...), so
  * [[graft.operators.QualityModel.langPredictFromMargins]] and the q112
  * projection consume it unchanged. */
case class LangMarginsExpr(child: Expression,
                           tables: org.apache.spark.broadcast.Broadcast[LangIdTables],
                           langs: Seq[String], seed: String, charN: Int,
                           nBuckets: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lang_margins expects a STRING child (pre-lowercased), got ${other.catalogString}")
    }
  override def dataType: DataType = StructType(
    StructField("n", DataTypes.LongType, nullable = false) +:
      langs.map(l => StructField(s"ws_$l", DataTypes.LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "lang_margins"

  @transient private lazy val seedColon =
    (seed + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    LangIdKernel.margins(v.asInstanceOf[UTF8String], seedColon, charN,
      nBuckets, tables.value)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("langIdTablesBc", tables,
      "org.apache.spark.broadcast.Broadcast")
    val seedRef = ctx.addReferenceObj("langIdSeed", seedColon, "byte[]")
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.functions.LangIdKernel.margins(
            ${c.isNull} ? null : ${c.value}, $seedRef, $charN, $nBuckets,
            (graft.functions.LangIdTables) $ref.value());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangMarginsExpr =
    copy(child = newChild)
}
