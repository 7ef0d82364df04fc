package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class ShingleExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "one two"),            // fewer than n tokens -> one shingle
    (3L, ""),                   // empty -> the single empty-gram sentinel
    (4L, "   "),                // whitespace-only -> same sentinel
    (5L, "a a a a a")           // repeats -> distinct collapses
  ).toDF("doc_id", "text")

  test("native expression matches the UDF kernel exactly (incl. empty/short docs)") {
    val kernel = udf((t: String) => ShingleKernel.shingleSet(t, 3))
    val both = docs.select(col("doc_id"),
        Dedup.shingleSetCol(col("text"), 3).as("native"),
        kernel(col("text")).as("viaUdf"))
      .orderBy("doc_id")
      .as[(Long, Seq[Long], Seq[Long])].collect().toSeq
    both.foreach { case (id, n, u) => assert(n == u, s"doc $id diverged") }
    // empty and whitespace-only text fall into the one-shingle arm (the
    // empty token sequence's gram), exactly like TextFns.shingles and
    // the oracle's ELSE [array_to_string(toks, ' ')] fallback
    assert(both.find(_._1 == 3L).get._2.length == 1)
    assert(both.find(_._1 == 3L).get._2 == both.find(_._1 == 4L).get._2)
    assert(both.find(_._1 == 5L).get._2.length == 1)
  }

  test("null text evaluates to an EMPTY array, not null (UDF-parity semantics)") {
    val withNull = Seq((1L, Option("x y z w")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = withNull.select(col("doc_id"),
        Dedup.shingleSetCol(col("text"), 3).as("sh"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    assert(got(1)._2 == Seq.empty[Long])
  }

  test("the projection stays inside whole-stage codegen with NO ScalaUDF boundary") {
    // parquet-backed scan: a LocalTableScan would be constant-folded via
    // the interpreted eval path and show no codegen span at all
    val dir = java.nio.file.Files.createTempDirectory("shexpr").toString
    docs.write.mode("overwrite").parquet(s"$dir/docs")
    val df = spark.read.parquet(s"$dir/docs").select(col("doc_id"),
      size(Dedup.shingleSetCol(col("text"), 3)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"UDF boundary present:\n$plan")
    // "*(1) Project [... shingle_set(...)]" — the *(n) star marks the
    // whole-stage-codegen span containing the native expression
    assert("\\*\\(\\d+\\) Project \\[[^\n]*shingle_set".r.findFirstIn(plan).nonEmpty,
      s"shingle_set not inside a codegen span:\n$plan")
    // the interpreted eval path agrees with codegen (a constant-folded
    // Literal child exercises eval directly)
    val expr = ShingleSetExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "p q r s", org.apache.spark.sql.types.StringType), 3)
    val folded = expr.eval(null)
    assert(folded.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == ShingleKernel.shingleSet("p q r s", 3).toSeq)
  }

  test("native shingle_list matches the UDF kernel exactly (frequency-preserving)") {
    val kernel = udf((t: String) => ShingleKernel.shingleList(t, 2))
    val both = docs.select(col("doc_id"),
        Dedup.shingleListCol(col("text"), 2).as("native"),
        kernel(col("text")).as("viaUdf"))
      .orderBy("doc_id")
      .as[(Long, Seq[Long], Seq[Long])].collect().toSeq
    both.foreach { case (id, n, u) => assert(n == u, s"doc $id diverged") }
    // repeats are PRESERVED (the point of the list sibling): doc 5 has
    // 5 tokens -> 4 bigrams, all identical
    val d5 = both.find(_._1 == 5L).get._2
    assert(d5.length == 4 && d5.distinct.length == 1)
  }

  test("native minhash signature matches the reference formula exactly") {
    val shset = ShingleKernel.shingleSet("alpha beta gamma delta epsilon", 3)
    val got = ShingleKernel.minhashSignature(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(shset), 16)
      .toLongArray().toSeq
    // driver-side replay of the k-seed min formula
    val expected = (0 until 16).map { h =>
      shset.map(s => ShingleKernel.mix64(s ^ (h * 0xc2b2ae3d27d4eb4fL))).min
    }
    assert(got == expected)
    // empty set -> all-MaxValue signature (same as the old UDF on Array())
    val empty = ShingleKernel.minhashSignature(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long]), 4)
      .toLongArray().toSeq
    assert(empty == Seq.fill(4)(Long.MaxValue))
  }

  test("native simhash64 matches the driver-side replay (incl. empty/null)") {
    def replay(text: String): Long = {
      val counts = new Array[Int](64)
      text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        val h = ShingleKernel.hashString(tok)
        (0 until 64).foreach(k =>
          if (((h >>> k) & 1L) != 0L) counts(k) += 1 else counts(k) -= 1)
      }
      (0 until 64).foldLeft(0L)((s, k) => if (counts(k) >= 0) s | (1L << k) else s)
    }
    val texts = Seq("the quick brown fox", "", "a b a b a")
    texts.foreach(t => assert(ShingleKernel.simhash64(t) == replay(t), s"'$t'"))
    assert(ShingleKernel.simhash64(null) == replay(""))
    // through the Dedup operator (native expression path)
    val got = Dedup.simhash(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val expected = docs.orderBy("doc_id").as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, replay(t)) }
    assert(got == expected)
  }

  test("native simhash60_md5 matches a BigInt/hex driver replay (incl. blank-doc sentinel)") {
    // independent replay: parse md5 hex with BigInt — no shared shift code
    def replay(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val toks = Option(text).getOrElse("").toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) -1L
      else {
        val counts = new Array[Int](60)
        toks.foreach { tok =>
          val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
          val h = BigInt(hex.take(15), 16).toLong
          (0 until 60).foreach(k =>
            if (((h >>> k) & 1L) != 0L) counts(k) += 1 else counts(k) -= 1)
        }
        (0 until 60).foldLeft(0L)((s, k) => if (counts(k) >= 0) s | (1L << k) else s)
      }
    }
    Seq("the quick brown fox", "", "   ", "a b a b a", null).foreach(t =>
      assert(ShingleKernel.simhash60Md5(t) == replay(t), s"'$t'"))
    // through the operator (native expression path), and UDF-free
    // (repartition blocks ConvertToLocalRelation from evaluating the
    // projection at plan time, which would hide the kernel in the plan)
    val port = Dedup.simhashPortable(docs.repartition(2), "doc_id", "text")
    val got = port.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val expected = docs.orderBy("doc_id").as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, replay(t)) }
    assert(got == expected)
    val plan = port.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("), s"UDF in simhashPortable plan:\n$plan")
    assert(plan.contains("simhash60_md5"), s"native kernel absent:\n$plan")
  }

  test("downstream dedup family is unchanged through the native kernel (q40 shape)") {
    val pairs = Dedup.minhashDedup(
        Seq((0L, "alpha beta gamma delta epsilon"),
          (1L, "alpha beta gamma delta epsilon"),
          (2L, "totally unrelated content here now")).toDF("doc_id", "text"),
        "doc_id", "text", numHashes = 32, bands = 16, shingleN = 3,
        threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }
}
