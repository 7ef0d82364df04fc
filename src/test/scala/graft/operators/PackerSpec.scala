package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackerSpec extends SparkSpec {
  import spark.implicits._

  test("packTokenIds: hand-checked boundaries — straddling docs split, " +
      "sequences reassemble in order, tail ragged") {
    // budget 4; docs in id order: a=[1,2,3] b=[4,5] c=[6] d=[] e=[7,8,9,10,11]
    // stream: 1 2 3 4 | 5 6 7 8 | 9 10 11
    val docs = Seq(
      (1L, Seq(1, 2, 3)), (2L, Seq(4, 5)), (3L, Seq(6)),
      (4L, Seq.empty[Int]), (5L, Seq(7, 8, 9, 10, 11)))
      .toDF("doc_id", "ids")
    val got = Packer.packTokenIds(spark, docs, "doc_id", "ids", 4L)
      .orderBy("seq_id")
      .as[(Long, Int, Seq[Int])].collect().toSeq
    assert(got == Seq(
      (0L, 4, Seq(1, 2, 3, 4)),
      (1L, 4, Seq(5, 6, 7, 8)),
      (2L, 3, Seq(9, 10, 11))))
  }

  test("packTokenIds: a negative id (encode unk sentinel) fails LOUDLY — " +
      "it must never land in a training file (r16 verdict #6)") {
    val docs = Seq((1L, Seq(1, 2, 3)), (2L, Seq(4, -1, 5)))
      .toDF("doc_id", "ids")
    val e = intercept[Exception] {
      Packer.packTokenIds(spark, docs, "doc_id", "ids", 4L).collect()
    }
    // Spark wraps the assert_true failure; the actionable message rides it
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("negative token id") &&
      m.contains("byte-fallback")), s"unexpected: ${msgs(e)}")
    // a clean frame still packs (the guard is pass-through on success)
    val ok = Packer.packTokenIds(spark,
      Seq((1L, Seq(1, 2, 3, 4, 5))).toDF("doc_id", "ids"),
      "doc_id", "ids", 4L).orderBy("seq_id")
      .as[(Long, Int, Seq[Int])].collect().toSeq
    assert(ok == Seq((0L, 4, Seq(1, 2, 3, 4)), (1L, 1, Seq(5))))
  }

  test("packTokenIds withBoundaries: per-sequence doc offsets for " +
      "attention masking — continuations start at 0, tail ragged") {
    // budget 4; docs a=[1,2,3] b=[4,5] c=[6] e=[7..11]
    // seq0: a(0) b(3)      -> starts 0,3
    // seq1: b-cont(0) c(1) e(2) -> starts 0,1,2
    // seq2: e-cont(0)      -> starts 0
    val docs = Seq(
      (1L, Seq(1, 2, 3)), (2L, Seq(4, 5)), (3L, Seq(6)),
      (5L, Seq(7, 8, 9, 10, 11)))
      .toDF("doc_id", "ids")
    val got = Packer.packTokenIds(spark, docs, "doc_id", "ids", 4L,
        withBoundaries = true)
      .orderBy("seq_id")
      .select("seq_id", "n_tokens", "n_docs", "doc_starts", "token_ids")
      .as[(Long, Int, Int, Seq[Int], Seq[Int])].collect().toSeq
    assert(got == Seq(
      (0L, 4, 2, Seq(0, 3), Seq(1, 2, 3, 4)),
      (1L, 4, 3, Seq(0, 1, 2), Seq(5, 6, 7, 8)),
      (2L, 3, 1, Seq(0), Seq(9, 10, 11))), s"got $got")
  }

  test("packTokenIds: a hash ORDER KEY packs the seeded permutation — " +
      "document blocks reorder, nothing is lost or split differently") {
    // the q101 device: order by md5(seed || id) instead of id. Each
    // doc's ids stay one contiguous block in the stream; the block
    // ORDER follows the hash permutation.
    val docs = Seq(
      (1L, Seq(1, 2, 3)), (2L, Seq(4, 5)), (3L, Seq(6)),
      (5L, Seq(7, 8, 9, 10, 11)))
      .toDF("doc_id", "ids")
    val keyed = docs.select(
      md5(concat(lit("s:"), col("doc_id").cast("string"))).as("ord"),
      col("ids"))
    val stream = Packer.packTokenIds(spark, keyed, "ord", "ids", 4L)
      .orderBy("seq_id").as[(Long, Int, Seq[Int])].collect().toSeq
      .flatMap(_._3)
    // expected: doc blocks concatenated in md5-of-id order
    val order = docs.select(col("doc_id"),
        md5(concat(lit("s:"), col("doc_id").cast("string"))).as("ord"))
      .orderBy("ord").as[(Long, String)].collect().map(_._1).toSeq
    val blocks = Map(1L -> Seq(1, 2, 3), 2L -> Seq(4, 5), 3L -> Seq(6),
      5L -> Seq(7, 8, 9, 10, 11))
    assert(stream == order.flatMap(blocks), s"got $stream in order $order")
    assert(order != Seq(1L, 2L, 3L, 5L), "hash order degenerated to id order")
  }

  test("packTokenIds: result independent of input partitioning; every " +
      "token lands exactly once in stream order") {
    val rnd = new scala.util.Random(7)
    val docs = (0L until 200L).map(i =>
      (i, Seq.fill(rnd.nextInt(40))(rnd.nextInt(1000))))
    val expectStream = docs.sortBy(_._1).flatMap(_._2)
    for (parts <- Seq(1, 7)) {
      val df = docs.toDF("doc_id", "ids").repartition(parts)
      val got = Packer.packTokenIds(spark, df, "doc_id", "ids", 64L)
        .orderBy("seq_id")
        .as[(Long, Int, Seq[Int])].collect().toSeq
      assert(got.flatMap(_._3) == expectStream, s"parts=$parts")
      assert(got.map(_._1) == got.indices.map(_.toLong), "seq ids contiguous")
      got.dropRight(1).foreach { case (_, n, ids) =>
        assert(n == 64 && ids.size == 64)
      }
      assert(got.last._2 == expectStream.size % 64 ||
        got.last._2 == 64)
    }
  }

  test("packTokenIds: stream an exact multiple of the budget — no phantom " +
      "empty tail sequence; budget 1 degenerates to one token per sequence") {
    val docs = Seq((1L, Seq(1, 2)), (2L, Seq(3, 4))).toDF("doc_id", "ids")
    val exact = Packer.packTokenIds(spark, docs, "doc_id", "ids", 2L)
      .orderBy("seq_id").as[(Long, Int, Seq[Int])].collect().toSeq
    assert(exact == Seq((0L, 2, Seq(1, 2)), (1L, 2, Seq(3, 4))))
    val unit = Packer.packTokenIds(spark, docs, "doc_id", "ids", 1L)
      .orderBy("seq_id").as[(Long, Int, Seq[Int])].collect().toSeq
    assert(unit == Seq((0L, 1, Seq(1)), (1L, 1, Seq(2)),
      (2L, 1, Seq(3)), (3L, 1, Seq(4))))
    intercept[IllegalArgumentException] {
      Packer.packTokenIds(spark, docs, "doc_id", "ids", 0L)
    }
  }

  test("EOS-separated packing (the q108 contract): splitting the " +
      "concatenated stream on the reserved id recovers every document's " +
      "id stream in order, empty docs included") {
    val eos = 999
    val docs = Seq(
      (1L, Seq(5, 6, 7)), (2L, Seq.empty[Int]), (3L, Seq(8)),
      (4L, Seq(9, 10, 11, 12, 13))).toDF("doc_id", "ids")
    val withEos = docs.select(col("doc_id"),
      concat(col("ids"), array(lit(eos))).as("ids"))
    val packed = Packer.packTokenIds(spark, withEos, "doc_id", "ids",
        budgetTokens = 4L)
      .orderBy("seq_id")
      .select("token_ids").as[Seq[Int]].collect().toSeq
    val stream = packed.flatten
    // stream = doc1 ‖ EOS ‖ (empty) EOS ‖ doc3 ‖ EOS ‖ doc4 ‖ EOS
    assert(stream.count(_ == eos) == 4, "every doc contributes its EOS")
    assert(stream.last == eos, "stream ends at a document boundary")
    val segments = {
      val out = Seq.newBuilder[Seq[Int]]
      var cur = Vector.empty[Int]
      stream.foreach { id =>
        if (id == eos) { out += cur; cur = Vector.empty }
        else cur :+= id
      }
      out.result()
    }
    assert(segments == Seq(Seq(5, 6, 7), Seq.empty, Seq(8),
      Seq(9, 10, 11, 12, 13)),
      s"EOS-split segments must be the documents in order: $segments")
  }

  test("Bpe.vocab fails loudly on an ambiguous merge table (two merges " +
      "producing the same token string)") {
    import graft.functions.Bpe
    val docs = Seq((1L, "abc abc ab bc")).toDF("doc_id", "text")
    // hand-built pathological table: (a,bc) and (ab,c) both yield "abc" —
    // a real greedy trainer cannot learn this, and string-keyed ids would
    // be ambiguous if it ever appeared in a loaded artifact
    val bad = Seq(Bpe.Merge(0, "a", "b", 3L), Bpe.Merge(1, "b", "c", 2L),
      Bpe.Merge(2, "a", "bc", 1L), Bpe.Merge(3, "ab", "c", 1L))
    val e = intercept[IllegalArgumentException] {
      Bpe.vocab(docs, "text", bad)
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("Bpe.vocab ids: alphabet in codepoint order then merge products; " +
      "tokenIds == tokens mapped through it") {
    import graft.functions.Bpe
    val docs = Seq((1L, "abba bab cab"), (2L, "abba abba bc"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMergesLocal(docs, "text", 8, 2L)
    val vocab = Bpe.vocab(docs, "text", merges)
    val vm = vocab.toMap
    // alphabet = distinct letters, codepoint-sorted, ids 0..|A|-1
    val alpha = "abc".map(_.toString)
    alpha.zipWithIndex.foreach { case (c, i) => assert(vm(c) == i) }
    merges.foreach(m => assert(vm(m.left + m.right) == alpha.size + m.rank))
    val a = docs.select(Bpe.tokenIds(col("text"), merges, vocab).as("x"))
      .orderBy(col("x")).as[Seq[Int]].collect().toSeq
    val b = docs.select(transform(Bpe.tokens(col("text"), merges),
        t => element_at(typedlit(vm), t)).as("x"))
      .orderBy(col("x")).as[Seq[Int]].collect().toSeq
    assert(a == b && a.forall(_.forall(_ >= 0)))
  }
}
