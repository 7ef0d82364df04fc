package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, StructField, StructType}

/** Static kernel for [[HashedProbeExpr]] — shared by interpreted eval
  * and generated code (the [[BpeKernel]] pattern).
  *
  * The hashed-feature scoring primitive shared by the fastText-style
  * quality scorer (q75), its trained-weights variant, and DSIR's
  * importance weights (q77/q78): per feature (token, plus space-joined
  * word bigrams when `bigrams`), bucket = md5(seed ++ ":" ++ feature)
  * first-4-digest-bytes-unsigned mod nBuckets — bit-identical to the
  * Column composition `conv(substr(md5(concat(seed,':',t)),1,8),16,10)
  * % nBuckets` — then one table probe and an exact long add. Returns
  * (n_feats, sum). Integer-only: kernel and fold cannot diverge. */
object HashedProbeKernel {

  def probe(toks: ArrayData, seedColon: Array[Byte], nBuckets: Int,
            bigrams: Boolean, table: Array[Long]): InternalRow = {
    var n = 0L
    var sum = 0L
    if (toks != null) {
      val k = toks.numElements()
      val words = new Array[Array[Byte]](k)
      var i = 0
      while (i < k) {
        words(i) = toks.getUTF8String(i).getBytes
        i += 1
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      def add(update: java.security.MessageDigest => Unit): Unit = {
        md.reset()
        md.update(seedColon)
        update(md)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        sum += table((h % nBuckets).toInt)
        n += 1
      }
      i = 0
      while (i < k) {
        val w = words(i)
        add(m => m.update(w))
        i += 1
      }
      if (bigrams && k >= 2) {
        i = 0
        while (i + 1 < k) {
          val a = words(i); val b = words(i + 1)
          add { m => m.update(a); m.update(' '.toByte); m.update(b) }
          i += 1
        }
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, sum))
  }
}

/** Native hashed-feature table probe: ONE compiled pass per row —
  * hash each feature once, probe the broadcast table, exact long sum —
  * replacing the `transform` + `aggregate` higher-order fold
  * (CodegenFallback, and measured re-evaluating under multi-field
  * extraction — the q112 lesson) AND, for DSIR, the corpus-keyed
  * explode + lambda-table join + per-doc groupBy (a full corpus
  * exchange for what is per-row arithmetic against a ≤ 2^20-entry
  * table). The table rides a BROADCAST — fetched once per executor,
  * never deserialized per task (the FrozenBigramTables OOM lesson).
  *
  * NULL-INPUT CONTRACT (r15 ADVICE, intentional divergence from the
  * fold it replaced): a null text/array scores as an EMPTY document —
  * (n_feats = 0, sum = 0), and the consumer's `when(n > 0, …)` guard
  * yields a null score — where the Column fold propagated NULL into
  * w_sum and legacy `size(null) = -1` into n_tokens. "No evidence" is
  * one state, not two: downstream count/threshold logic treats absent
  * and empty text identically (QualityModelSpec pins both behaviors). */
case class HashedProbeExpr(child: Expression,
                           table: org.apache.spark.broadcast.Broadcast[Array[Long]],
                           seed: String, nBuckets: Int, bigrams: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: org.apache.spark.sql.types.StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hashed_probe expects an ARRAY<STRING> child, got ${other.catalogString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", DataTypes.LongType, nullable = false),
    StructField("sum", DataTypes.LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "hashed_probe"

  @transient private lazy val seedColon =
    (seed + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    HashedProbeKernel.probe(v.asInstanceOf[ArrayData], seedColon, nBuckets,
      bigrams, table.value)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("hashedProbeTableBc", table,
      "org.apache.spark.broadcast.Broadcast")
    val seedRef = ctx.addReferenceObj("hashedProbeSeed", seedColon, "byte[]")
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.functions.HashedProbeKernel.probe(
            ${c.isNull} ? null : ${c.value}, $seedRef, $nBuckets, $bigrams,
            (long[]) $ref.value());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedProbeExpr =
    copy(child = newChild)
}

/** Static kernel for [[HashedCountsExpr]] — the TRAINER-side sibling of
  * [[HashedProbeKernel]]: instead of probing a weight table, it
  * aggregates the per-document (bucket, count) pairs the gradient
  * trainer consumes, in ONE compiled pass with a per-doc hash map.
  * Bucketing is bit-identical to the probe kernel (md5(seed ++ ":" ++
  * feature), first 4 digest bytes unsigned, mod nBuckets == the Column
  * composition `conv(substr(md5(concat(seed,':',t)),1,8),16,10) %
  * nBuckets`), and bigram features are derived from the token byte
  * arrays exactly as there. Pairs emit sorted by bucket (deterministic;
  * the trainer's multiply-add consumers are order-free regardless). */
object HashedCountsKernel {

  def counts(toks: ArrayData, seedColon: Array[Byte], nBuckets: Int,
             bigrams: Boolean): InternalRow = {
    val m = new java.util.HashMap[Long, Long]()
    var n = 0L
    if (toks != null) {
      val k = toks.numElements()
      val words = new Array[Array[Byte]](k)
      var i = 0
      while (i < k) {
        words(i) = toks.getUTF8String(i).getBytes
        i += 1
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      def add(update: java.security.MessageDigest => Unit): Unit = {
        md.reset()
        md.update(seedColon)
        update(md)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val b = h % nBuckets
        m.merge(b, 1L, (x, y) => x + y)
        n += 1
      }
      i = 0
      while (i < k) {
        val w = words(i)
        add(m2 => m2.update(w))
        i += 1
      }
      if (bigrams && k >= 2) {
        i = 0
        while (i + 1 < k) {
          val a = words(i); val b = words(i + 1)
          add { m2 => m2.update(a); m2.update(' '.toByte); m2.update(b) }
          i += 1
        }
      }
    }
    val bs = new Array[Long](m.size())
    val it = m.keySet().iterator()
    var j = 0
    while (it.hasNext) { bs(j) = it.next().longValue(); j += 1 }
    java.util.Arrays.sort(bs)
    val rows = new Array[Any](bs.length)
    j = 0
    while (j < bs.length) {
      rows(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bs(j), m.get(bs(j)).longValue()))
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)))
  }
}

/** Native per-document hashed-feature COUNTS: `(n_feats, pairs)` where
  * `pairs` is the bucket-sorted `array<struct<__b,__c>>` the gradient
  * trainer's doc frame stores — built in ONE codegen scan, replacing
  * the explode → (doc, bucket) groupBy → doc groupBy collect_list →
  * label join chain (two corpus-keyed exchanges + a join) AND the
  * CodegenFallback `zip_with` bigram derivation that fed it (r16
  * verdict #4: the one-time bigram feature-frame build was the
  * trainer's named residual). Null/empty input → (0, []), the
  * [[HashedProbeExpr]] null contract. */
case class HashedCountsExpr(child: Expression, seed: String, nBuckets: Int,
                            bigrams: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: org.apache.spark.sql.types.StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hashed_counts expects an ARRAY<STRING> child, got ${other.catalogString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("__n", DataTypes.LongType, nullable = false),
    StructField("__f", ArrayType(StructType(Seq(
      StructField("__b", DataTypes.LongType, nullable = false),
      StructField("__c", DataTypes.LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "hashed_counts"

  @transient private lazy val seedColon =
    (seed + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    HashedCountsKernel.counts(v.asInstanceOf[ArrayData], seedColon,
      nBuckets, bigrams)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val seedRef = ctx.addReferenceObj("hashedCountsSeed", seedColon, "byte[]")
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.functions.HashedCountsKernel.counts(
            ${c.isNull} ? null : ${c.value}, $seedRef, $nBuckets, $bigrams);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedCountsExpr =
    copy(child = newChild)
}
