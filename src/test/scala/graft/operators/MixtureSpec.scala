package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // driver-side replay of Mixture.sampleBucket: first 15 hex digits of
  // md5(id) as base-16, mod granularity
  private def bucket(id: String, granularity: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % granularity
  }

  // two sources: "hot" (weight 9) with 900 tokens total, "cold" (weight 1)
  // with 100 tokens — budget 500 of weight-total 10 gives
  //   hot : threshold = 500*9*10000 div (10*900) = 5000  (keep ~50%)
  //   cold: threshold = 500*1*10000 div (10*100) = 5000  (keep ~50%)
  private lazy val docs = (0 until 90).map(i => (s"h$i", "hot", 10L)) ++
    (0 until 10).map(i => (s"c$i", "cold", 10L))

  test("tokenBudgetSample keeps exactly the rows whose md5 bucket clears the integer threshold") {
    val df = docs.toDF("doc_id", "source", "n_tokens")
    val w = when(col("source") === "hot", 9L).otherwise(1L)
    val got = Mixture.tokenBudgetSample(df, "doc_id", "source", "n_tokens",
        weightCol = w, weightTotal = 10L, budgetTokens = 500L)
      .select("doc_id", "keep_threshold", "sample_bucket")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    val expected = docs.map(_._1).filter(id => bucket(id, 10000L) < 5000L).sorted
    assert(got.map(_._1) == expected)
    got.foreach { case (id, thr, b) =>
      assert(thr == 5000L)
      assert(b == bucket(id, 10000L) && b < thr)
    }
    // the kept fraction is near the 50% target (exact set pinned above)
    assert(math.abs(got.size / 100.0 - 0.5) < 0.15)
  }

  test("keep-whole branch: budget*w >= W*tokens keeps every row of the source") {
    val df = docs.toDF("doc_id", "source", "n_tokens")
    val w = when(col("source") === "hot", 9L).otherwise(1L)
    // budget 10000: cold threshold = 10000*1*10000 div (10*100) = 100000
    // > granularity -> keep all; hot = 10000*9*10000 div (10*900) = 10^5 too
    val got = Mixture.tokenBudgetSample(df, "doc_id", "source", "n_tokens",
        weightCol = w, weightTotal = 10L, budgetTokens = 10000L)
    assert(got.count() == 100)
  }

  test("zero budget keeps nothing; invalid args fail fast") {
    val df = docs.toDF("doc_id", "source", "n_tokens")
    val w = lit(1L)
    assert(Mixture.tokenBudgetSample(df, "doc_id", "source", "n_tokens",
      w, 10L, 0L).count() == 0)
    intercept[IllegalArgumentException] {
      Mixture.tokenBudgetSample(df, "doc_id", "source", "n_tokens", w, 0L, 1L)
    }
    intercept[IllegalArgumentException] {
      Mixture.tokenBudgetSample(df, "doc_id", "source", "n_tokens", w, 1L, -1L)
    }
  }

  test("tokenBudgetResample upsamples above-data targets and downsamples below-data ones") {
    val df = docs.toDF("doc_id", "source", "n_tokens")
    val w = when(col("source") === "hot", 9L).otherwise(1L)
    // budget 2500, W=10: hot rate = 2500*9*10000 div (10*900) = 25000
    //   -> 2 full copies + bucket < 5000 chance of a 3rd
    // cold rate = 2500*1*10000 div (10*100) = 25000 -> same by construction
    val got = Mixture.tokenBudgetResample(df, "doc_id", "source", "n_tokens",
        weightCol = w, weightTotal = 10L, budgetTokens = 2500L)
      .select("doc_id", "n_copies", "epoch")
      .as[(String, Long, Long)].collect().toSeq
    // every row gets >= 2 epochs; a 3rd iff its bucket < 5000 (replay)
    val byId = got.groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    docs.map(_._1).foreach { id =>
      val expectCopies = 2L + (if (bucket(id, 10000L) < 5000L) 1L else 0L)
      assert(byId(id) == (0L until expectCopies),
        s"$id: epochs ${byId.get(id)} != 0 until $expectCopies")
    }
    // expected kept tokens ~= budget per source (quantization < 1 token)
    val kept = got.map(_._1).groupBy(s => s.head).view.mapValues(_.size).toMap
    assert(math.abs(kept('h') * 10 - 2250) < 250, s"hot tokens ${kept('h') * 10}")
  }

  test("tokenBudgetResample epoch-0 slice equals tokenBudgetSample when rates are subunit") {
    val df = docs.toDF("doc_id", "source", "n_tokens")
    val w = when(col("source") === "hot", 9L).otherwise(1L)
    // budget 500 -> rate 5000 myriad (< 10000): resample emits 0 or 1 copy,
    // exactly the sample operator's kept set
    val resampled = Mixture.tokenBudgetResample(df, "doc_id", "source", "n_tokens",
        w, 10L, 500L).select("doc_id").as[String].collect().toSeq
    val sampled = Mixture.tokenBudgetSample(df, "doc_id", "source", "n_tokens",
        w, 10L, 500L).select("doc_id").as[String].collect().toSeq
    assert(resampled.sorted == sampled.sorted)
  }

  test("temperatureResampleSqrt: α=1/2 rates hand-computed, upsamples the " +
      "small source relative to its natural share") {
    // big: 4 docs × 400 tokens = 1600; small: 4 docs × 25 tokens = 100.
    // sq_big = round(√1600·1000) = 40000; sq_small = round(√100·1000)
    // = 10000; Z = 50000. Budget 1700 (= corpus):
    //   rate_big   = 1700·40000·10000 div (50000·1600) = 8500  (~0.85)
    //   rate_small = 1700·10000·10000 div (50000·100)  = 34000 (3 copies
    //     + 40% chance of a 4th) — the small source upsamples 3.4× while
    //     the big one trims, exactly the temperature rule's point.
    val df = ((0 until 4).map(i => (s"b$i", "big", 400L)) ++
      (0 until 4).map(i => (s"s$i", "small", 25L)))
      .toDF("doc_id", "source", "n_tokens")
    val got = Mixture.temperatureResampleSqrt(df, "doc_id", "source",
        "n_tokens", budgetTokens = 1700L)
      .select("doc_id", "source_tokens", "rate_myriad", "n_copies", "epoch")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val byDoc = got.groupBy(_._1)
    byDoc.foreach { case (id, rows) =>
      val (_, st, rate, n, _) = rows.head
      val b = bucket(id, 10000L)
      if (id.startsWith("b")) {
        assert(st == 1600L && rate == 8500L)
        assert(n == (if (b < 8500L) 1L else 0L))
      } else {
        assert(st == 100L && rate == 34000L)
        assert(n == 3L + (if (b < 4000L) 1L else 0L))
      }
      // epochs are exactly 0..n-1
      assert(rows.map(_._5).sorted == (0L until n))
    }
    // every emitted doc has n_copies > 0; zero-copy docs are absent
    val expectedDocs = (0 until 4).map(i => s"s$i").toSet ++
      (0 until 4).map(i => s"b$i").filter(i => bucket(i, 10000L) < 8500L)
    assert(byDoc.keySet == expectedDocs)
  }

  test("stratifiedK keeps exactly min(k, stratum size) rows, ranked by md5 bucket") {
    val df = docs.toDF("doc_id", "source", "n_tokens")
    val got = Mixture.stratifiedK(df, "doc_id", "source", k = 4)
      .select("doc_id", "source", "sample_rank")
      .as[(String, String, Int)].collect().toSeq
    assert(got.count(_._2 == "hot") == 4)
    assert(got.count(_._2 == "cold") == 4)
    // driver-side replay: the 4 lowest (bucket, id) per stratum
    val expected = docs.groupBy(_._2).flatMap { case (_, rows) =>
      rows.map(_._1).sortBy(id => (bucket(id, 1000000L), id)).take(4)
    }.toSet
    assert(got.map(_._1).toSet == expected)
    // k larger than the stratum keeps the whole stratum
    assert(Mixture.stratifiedK(df.filter(col("source") === "cold"),
      "doc_id", "source", k = 100).count() == 10)
  }

  test("sampling is retry-stable: same ids -> same kept set on a reshuffled frame") {
    val df = docs.toDF("doc_id", "source", "n_tokens")
    val w = when(col("source") === "hot", 9L).otherwise(1L)
    def kept(d: org.apache.spark.sql.DataFrame) =
      Mixture.tokenBudgetSample(d, "doc_id", "source", "n_tokens", w, 10L, 500L)
        .select("doc_id").as[String].collect().toSet
    assert(kept(df) == kept(df.repartition(7, col("n_tokens"))))
  }

  test("deterministicSplit: exhaustive, mutually exclusive, ~proportional, " +
      "stable under partitioning and corpus growth") {
    val ids = (1L to 2000L).map(i => (i, s"row$i")).toDF("doc_id", "payload")
    val splits = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val got = Mixture.deterministicSplit(ids, "doc_id", splits, seed = "s")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got.size == 2000, "every row assigned exactly once")
    val sizes = got.values.groupBy(identity).map { case (k, v) => (k, v.size) }
    assert(sizes.keySet == Set("train", "val", "test"))
    // multinomial bounds: 3.5 sigma around the expected sizes
    assert(math.abs(sizes("train") - 1800) < 3.5 * math.sqrt(2000 * .9 * .1),
      s"train ${sizes("train")}")
    assert(math.abs(sizes("val") - 100) < 3.5 * math.sqrt(2000 * .05 * .95))
    assert(math.abs(sizes("test") - 100) < 3.5 * math.sqrt(2000 * .05 * .95))

    // partition-layout independence
    val re = Mixture.deterministicSplit(ids.repartition(13), "doc_id",
        splits, seed = "s")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(re == got)

    // growth stability: adding rows never moves an existing row's split
    val grown = (1L to 3000L).map(i => (i, s"row$i")).toDF("doc_id", "payload")
    val after = Mixture.deterministicSplit(grown, "doc_id", splits, seed = "s")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got.forall { case (id, s) => after(id) == s })

    // a different seed draws a genuinely different assignment
    val other = Mixture.deterministicSplit(ids, "doc_id", splits, seed = "t")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(other != got)
  }
}
