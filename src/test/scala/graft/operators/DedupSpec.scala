package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // Small corpus with a known near-dup structure: 0≈1 (one word changed),
  // 2≈3 (identical), 4 unrelated, 5 short.
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (4L, "completely different content about spark distributed query engines and shuffles"),
    (5L, "tiny doc")
  ).toDF("doc_id", "text")

  /** Exact Jaccard over distinct word-3-shingles, computed naively. */
  private def bruteJaccard(a: String, b: String): Double = {
    def sh(t: String): Set[String] = {
      val toks = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }

  test("keyedKeepFirst keeps exactly the ordered survivor per key") {
    val df = Seq((1, "b", 2), (1, "a", 1), (2, "c", 9)).toDF("k", "v", "ord")
    val out = Dedup.keyedKeepFirst(df, Seq("k"), Seq(col("ord").asc))
      .orderBy("k").select("v").as[String].collect().toSeq
    assert(out == Seq("a", "c"))
  }

  test("exact dedup groups identical normalized content") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() == 5) // 2 and 3 collapse
    val dup = out.filter(col("dup_count") === 2).select("keep_id").as[Long].head()
    assert(dup == 2L)
  }

  test("sizedPairPartitions: floor / proportional / clamp regimes") {
    val base = spark.sessionState.conf.numShufflePartitions
    // expected values derive from the plan's OWN Catalyst size estimate —
    // the regime boundaries are the thing under test, not Spark's stats
    // model for any particular plan shape (which a version upgrade may
    // change without sizedPairPartitions misbehaving)
    def statsBytes(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    // tiny input: the floor regime — keep the session default width
    assert(Dedup.sizedPairPartitions(docs) == base)
    assert(statsBytes(docs) / (24 * 1024) < base,
      "floor-regime fixture no longer small enough to exercise the floor")
    // mid-size estimate: the bytes-proportional regime — one task per
    // 24 KiB, above the floor, below the clamp
    val midDf = spark.range(1L << 20).toDF("id")
    val expectMid = (statsBytes(midDf) / (24 * 1024)).toInt
    assert(expectMid > base && expectMid < 1024 * base,
      s"mid fixture left the proportional regime (expect=$expectMid)")
    assert(Dedup.sizedPairPartitions(midDf) == expectMid)
    // huge estimate: the clamp regime — capped at 1024x session width
    val bigDf = spark.range(200L << 20).toDF("id")
    assert(statsBytes(bigDf) / (24 * 1024) > 1024L * base,
      "clamp-regime fixture no longer large enough to exercise the clamp")
    assert(Dedup.sizedPairPartitions(bigDf) == 1024 * base)
  }

  test("jaccardPairs matches brute-force ground truth") {
    val texts = docs.as[(Long, String)].collect().toMap
    val expected = (for {
      a <- texts.keys; b <- texts.keys if a < b
      j = bruteJaccard(texts(a), texts(b)) if j >= 0.3
    } yield (a, b)).toSet
    val got = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3, Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(expected.contains((0L, 1L)) && expected.contains((2L, 3L)))
  }

  test("jaccardPairs reports exact jaccard values") {
    val j01 = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3, Int.MaxValue)
      .filter(col("id_a") === 0 && col("id_b") === 1)
      .select("jaccard").as[Double].head()
    val texts = docs.as[(Long, String)].collect().toMap
    assert(math.abs(j01 - bruteJaccard(texts(0L), texts(1L))) < 1e-6)
  }

  test("containmentPairs flags a verbatim-embedded quote Jaccard is " +
      "blind to; integer threshold boundary exact; cap suppresses hot " +
      "shingles only") {
    // doc 2 = a short passage; doc 1 = a long page EMBEDDING it verbatim;
    // doc 3 = unrelated filler of similar length to 1
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val page = s"intro words before the passage $quote and a long tail " +
      "of unrelated trailing filler content extending the page much " +
      "further with many distinct tokens one two three four five six"
    val corp = Seq((1L, page), (2L, quote),
      (3L, "totally different content about other topics entirely with " +
        "plenty of words to match the page length roughly seven eight"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(corp, "doc_id", "text",
        shingleN = 3, thresholdNum = 9, thresholdDen = 10,
        maxPostings = Int.MaxValue)
      .select("id_a", "id_b", "containment")
      .as[(Long, Long, Double)].collect().toSeq
    assert(cont.map(t => (t._1, t._2)) == Seq((1L, 2L)),
      s"only the embedded quote qualifies: $cont")
    assert(cont.head._3 == 1.0,
      s"verbatim embedding must have containment 1.0: $cont")
    // Jaccard at the same 0.9 bar finds NOTHING (inter/union is tiny)
    assert(Dedup.jaccardPairs(corp, "doc_id", "text", 3, 0.9, Int.MaxValue)
      .count() == 0L)
    // integer boundary: sets sized 4 and 8 sharing exactly 2 shingles ->
    // containment exactly 2/4; the 5/10 threshold keeps it, 6/10 drops it
    val boundary = Seq(
      (10L, "a b c d e f"),          // 4 shingles: abc bcd cde def
      (11L, "a b c d x y z w v u")). // 8 shingles, shares abc bcd
      toDF("doc_id", "text")
    def at(num: Int) = Dedup.containmentPairs(boundary, "doc_id", "text",
      shingleN = 3, thresholdNum = num, thresholdDen = 10,
      maxPostings = Int.MaxValue).count()
    assert(at(5) == 1L && at(6) == 0L,
      "the inter*den >= num*min boundary must be exact")
  }

  test("incrementalNearDups == full-corpus run restricted to pairs touching the batch") {
    // richer corpus: planted near-dup pairs that straddle the batch/index
    // split (odd/even ids), live only in the batch, and live only in the
    // index — plus noise docs
    val rnd = new scala.util.Random(3)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    def sentence(n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val base = (0L until 30L).map(i => (i, sentence(20)))
    // near-dup of doc i at id 100+i (100+i is in the batch iff (100+i)%3==0)
    val dups = (0L until 30L by 5L).map { i =>
      (100L + i, base(i.toInt)._2.replaceFirst("\\w+$", "changed"))
    }
    // 99 and 0 are both ≡0 mod 3: a planted BATCH-BATCH pair (the 100+i
    // dups can only straddle or live in the index at this modulus)
    val batchPair = Seq((99L, base(0)._2.replaceFirst("^\\w+", "changed")))
    val all = (base ++ dups ++ batchPair).toDF("doc_id", "text")
    val isBatch = col("doc_id") % 3 === 0
    val batch = all.filter(isBatch)
    val existing = all.filter(!isBatch)
    val index = Dedup.nearDupIndex(existing, "doc_id", "text",
      numHashes = 64, shingleN = 3)
    val inc = Dedup.incrementalNearDups(batch, index, "doc_id", "text",
        numHashes = 64, bands = 32, shingleN = 3, threshold = 0.5,
        maxBucketSize = Int.MaxValue)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.minhashDedup(all, "doc_id", "text",
        numHashes = 64, bands = 32, shingleN = 3, threshold = 0.5,
        maxBucketSize = Int.MaxValue)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val expected = full.filter { case (a, b, _) => a % 3 == 0 || b % 3 == 0 }
    assert(inc == expected, s"incremental=$inc expected=$expected")
    // the split actually exercises all three pair origins
    assert(inc.exists { case (a, b, _) => a % 3 == 0 && b % 3 == 0 },
      "no batch-batch pair in the corpus")
    assert(inc.exists { case (a, b, _) => (a % 3 == 0) != (b % 3 == 0) },
      "no batch-index pair in the corpus")
    assert(full.exists { case (a, b, _) => a % 3 != 0 && b % 3 != 0 },
      "no index-index pair existed, so the exclusion is untested")
    // and index-vs-index pairs are excluded
    inc.foreach { case (a, b, _) => assert(a % 3 == 0 || b % 3 == 0) }

    // the sidecar-probing variant returns the SAME pair set: buckets
    // materialized once (as an ingestion loop would write them, spread
    // over two "batch" partitions) + partition-pruned set fetch. No
    // executed-plan pin, same reason as q85 (the operator localCheckpoints
    // its result, which hides the join from the executed plan) — the
    // load-bearing property is pinned DIRECTLY instead: the fetch callback
    // observes exactly which partitions were requested, so a regression to
    // an unpruned full-index fetch fails the `fetched` assertion below
    val idx = index.persist()
    try {
      val sidecar = Dedup.bandBuckets(idx, "doc_id", bands = 32, numHashes = 64)
        .withColumn("batch_id", (col("doc_id") % 2).cast("long"))
      val fetched = scala.collection.mutable.ArrayBuffer.empty[Any]
      val fetchSets = (parts: Seq[Any]) => {
        fetched ++= parts
        idx.filter(col("doc_id") % 2 === 0 && lit(parts.contains(0L)) ||
          col("doc_id") % 2 === 1 && lit(parts.contains(1L)))
      }
      val viaSidecar = Dedup.incrementalNearDupsIndexed(batch, sidecar,
          fetchSets, "doc_id", "batch_id", numHashes = 64, bands = 32,
          shingleN = 3, threshold = 0.5, maxBucketSize = Int.MaxValue)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(viaSidecar == expected, s"sidecar=$viaSidecar expected=$expected")
      assert(fetched.nonEmpty && fetched.toSet.subsetOf(Set[Any](0L, 1L)),
        s"fetch callback got unexpected partitions: $fetched")
    } finally idx.unpersist()
  }

  test("incremental variants agree on the CAPPED branch (production maxBucketSize)") {
    // a hot bucket that the cap actually truncates: 12 identical docs all
    // land in the same bucket in EVERY band; plus one well-behaved
    // near-dup pair (200, 201) straddling the batch/index split whose
    // buckets stay under the cap. curateBatch's default (maxBucketSize =
    // 1000) exercises this branch in production, so the
    // plain-vs-sidecar equality must hold here too, not just uncapped.
    val hot = (0L until 12L).map(i =>
      (i, "same same same same same text repeated for the hot bucket"))
    val pair = Seq(
      (200L, "the quick brown fox jumps over the lazy dog near the river"),
      (201L, "the quick brown fox jumps over the lazy cat near the river"))
    val all = (hot ++ pair).toDF("doc_id", "text")
    val isBatch = col("doc_id") % 3 === 0 || col("doc_id") === 201L
    val batch = all.filter(isBatch)
    val existing = all.filter(!isBatch)
    val index = Dedup.nearDupIndex(existing, "doc_id", "text",
      numHashes = 64, shingleN = 3)
    def runPlain(cap: Int) =
      Dedup.incrementalNearDups(batch, index, "doc_id", "text",
          numHashes = 64, bands = 32, shingleN = 3, threshold = 0.5,
          maxBucketSize = cap)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val uncapped = runPlain(Int.MaxValue)
    val capped = runPlain(8)
    // the cap really bit: hot-bucket pairs are gone, the honest pair stays
    assert(capped != uncapped, "cap did not truncate any bucket — fixture broken")
    assert(capped.contains((200L, 201L)))
    assert(!capped.exists { case (a, b) => a < 12L && b < 12L })
    val idx = index.persist()
    try {
      val sidecar = Dedup.bandBuckets(idx, "doc_id", bands = 32, numHashes = 64)
        .withColumn("batch_id", (col("doc_id") % 2).cast("long"))
      val fetchSets = (parts: Seq[Any]) =>
        idx.filter(col("doc_id") % 2 === 0 && lit(parts.contains(0L)) ||
          col("doc_id") % 2 === 1 && lit(parts.contains(1L)))
      val viaSidecar = Dedup.incrementalNearDupsIndexed(batch, sidecar,
          fetchSets, "doc_id", "batch_id", numHashes = 64, bands = 32,
          shingleN = 3, threshold = 0.5, maxBucketSize = 8)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(viaSidecar == capped,
        s"capped sidecar=$viaSidecar differs from capped plain=$capped")
    } finally idx.unpersist()
  }

  test("minhashDedup finds the true near-dup pairs (LSH recall on strong pairs)") {
    // threshold 0.3; identical pair (2,3) MUST collide in every band;
    // (0,1) at jaccard ~0.45 collides with overwhelming probability at 64/16
    val got = Dedup.minhashDedup(docs, "doc_id", "text",
      numHashes = 64, bands = 16, shingleN = 3, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((2L, 3L)))
    assert(got.contains((0L, 1L)))
    // verification step guarantees no false positives vs exact jaccard
    val texts = docs.as[(Long, String)].collect().toMap
    got.foreach { case (a, b) =>
      assert(bruteJaccard(texts(a), texts(b)) >= 0.3)
    }
  }

  test("minhashSignatures: identical docs get identical signatures") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 32, 3)
      .filter(col("doc_id").isin(2, 3))
      .select("signature").as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
  }

  test("simhashNearDups: identical docs at hamming 0; unrelated docs absent") {
    val got = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val pairs = got.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((2L, 3L)))
    assert(got.find(t => t._1 == 2L && t._2 == 3L).get._3 == 0)
    assert(!pairs.contains((0L, 4L)) && !pairs.contains((2L, 4L)))
  }

  test("lshCandidatePairs caps pathological hot buckets") {
    // 50 identical docs -> one bucket of 50; cap at 10 suppresses it
    val many = (0L until 50L).map(i => (i, "same same same same text"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(many, "doc_id", "text", 16, 3)
    val capped = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 4,
      numHashes = 16, maxBucketSize = 10)
    assert(capped.count() == 0)
    val uncapped = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 4,
      numHashes = 16, maxBucketSize = 1000)
    assert(uncapped.count() == 50L * 49L / 2L)
  }

  test("lshCandidatePairs on an empty corpus returns empty (no head() crash)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(empty, "doc_id", "text", 16, 3)
    assert(Dedup.lshCandidatePairs(sigs, "doc_id", bands = 4, numHashes = 16).count() == 0)
    assert(Dedup.minhashDedup(empty, "doc_id", "text", 16, 4, 3, 0.3).count() == 0)
  }

  test("simhashNearDupsPortable matches brute-force 60-bit md5 hamming pairs exactly") {
    // driver-side replay of the portable simhash (md5 -> high 60 bits,
    // frequency-weighted bit votes)
    def sim60(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val counts = new Array[Int](60)
      text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        md.reset()
        val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        (0 until 8).foreach(b => h = (h << 8) | (d(b) & 0xffL))
        h = h >>> 4
        (0 until 60).foreach(k =>
          if (((h >>> k) & 1L) != 0L) counts(k) += 1 else counts(k) -= 1)
      }
      (0 until 60).foldLeft(0L)((sig, k) => if (counts(k) >= 0) sig | (1L << k) else sig)
    }
    val texts = docs.orderBy("doc_id").as[(Long, String)].collect().toSeq
    val hashes = texts.map { case (id, t) => (id, sim60(t)) }
    // pigeonhole blocking is EXACT for hamming <= maxHamming: expect the
    // full brute-force pair set, not a recall fraction
    val expected = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    val got = Dedup.simhashNearDupsPortable(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got.map { case (a, b, d) => (a, b, d.toLong) } ==
      expected.map { case (a, b, d) => (a, b, d.toLong) })
    assert(got.exists { case (a, b, d) => a == 2L && b == 3L && d == 0 })
  }

  test("simhashNearDupsFrom rejects bits not divisible by chunk count") {
    val sh = Dedup.simhashPortable(docs, "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashNearDupsFrom(sh, "doc_id", bits = 60, maxHamming = 6) // 7 chunks
    }
    assert(e.getMessage.contains("divisible"))
  }

  test("connectedComponents: chain merges transitively, singleton maps to itself") {
    // chain 1-2, 2-3 plus pair 10-11 and singleton 20
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, "doc_id", pairs)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (20L, 20L)))
  }

  test("connectedComponents: local union-find fast path == distributed " +
      "pointer-jumping loop on randomized graphs") {
    val rnd = new scala.util.Random(13)
    val n = 400L
    val nodes = (0L until n).toDF("doc_id")
    // random edges incl. chains and cliques; ~half the nodes untouched
    val pairs = (0 until 300).map { _ =>
      val a = rnd.nextLong(n / 2); val b = rnd.nextLong(n / 2)
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(nodes, "doc_id", pairs)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val dist = Dedup.connectedComponents(nodes, "doc_id", pairs,
        maxLocalEdges = 0L) // force the distributed loop
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(local == dist, "union-find fast path diverged from the loop")
  }

  test("connectedComponents: 64-node path converges in O(log n) rounds (pointer jumping)") {
    // worst case for plain min-propagation: a single path 0-1-2-...-63
    // needs 63 rounds; path halving must land in ~log2(64) + slack
    val n = 64
    val nodes = (0L until n.toLong).toDF("doc_id")
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    val (labels, rounds) =
      Dedup.connectedComponentsFromSym(nodes, "doc_id", sym, maxIterations = 20)
    val got = labels.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == (0L until n.toLong).map(i => (i, 0L)))
    // 6 propagate+jump rounds collapse 64 hops; +1 round to witness the
    // fixpoint via the unchanged label sum, +1 slack
    assert(rounds <= 8, s"expected O(log n) convergence, took $rounds rounds")
  }

  test("caps at production defaults change nothing on a corpus without hot buckets") {
    // benchQueries times the capped configuration; on corpora where no
    // bucket/posting list exceeds the cap it must equal the uncapped
    // oracle-parity configuration exactly
    val jCapped = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3, maxPostings = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val jUncapped = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3, Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(jCapped == jUncapped)
    val cCapped = Dedup.dedupClusters(docs, "doc_id", "text", threshold = 0.9,
        maxBucketSize = 1000)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val cUncapped = Dedup.dedupClusters(docs, "doc_id", "text", threshold = 0.9,
        maxBucketSize = Int.MaxValue)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(cCapped == cUncapped)
  }

  test("MEASURED recall of the production cap (maxBucketSize=1000) on a " +
       "corpus with a deliberate hot bucket") {
    // Corpus, ground truth BY CONSTRUCTION:
    //  - hot cluster: 1100 IDENTICAL docs -> one LSH bucket of 1100 per
    //    band, overflowing the production cap -> its C(1100,2) = 604,450
    //    true pairs are deliberately suppressed;
    //  - 50 scattered near-dup pairs (41-word doc, one word changed ->
    //    word-3-shingle Jaccard ~0.85) in buckets of size 2, untouched by
    //    the cap;
    //  - 200 unrelated noise docs (disjoint per-doc vocabularies).
    val hotText = "annual disclosure boilerplate " +
      (1 to 38).map(i => s"hw$i").mkString(" ")
    val hot = (0L until 1100L).map(i => (i, hotText))
    val scatteredBase = (0 until 50).map { p =>
      (1 to 41).map(i => s"p${p}w$i").mkString(" ")
    }
    val scattered = scatteredBase.zipWithIndex.flatMap { case (base, p) =>
      val twin = base.replace(s"p${p}w20", s"p${p}xCHANGED")
      Seq((2000L + 2 * p, base), (2001L + 2 * p, twin))
    }
    val noise = (0 until 200).map { i =>
      (5000L + i, (1 to 30).map(j => s"n${i}w$j").mkString(" "))
    }
    val corpus = (hot ++ scattered ++ noise).toDF("doc_id", "text")

    val threshold = 0.8
    // scattered ground truth verified through the ENGINE's own kernel
    val truthScattered = (0 until 50).flatMap { p =>
      val a = graft.functions.ShingleKernel.shingleSet(scatteredBase(p), 3).toSet
      val b = graft.functions.ShingleKernel.shingleSet(
        scatteredBase(p).replace(s"p${p}w20", s"p${p}xCHANGED"), 3).toSet
      val j = a.intersect(b).size.toDouble / a.union(b).size.toDouble
      if (j >= threshold) Some((2000L + 2 * p, 2001L + 2 * p)) else None
    }.toSet
    assert(truthScattered.size == 50, "construction must yield 50 true pairs")
    val truthHot = 1100L * 1099L / 2L

    val found = Dedup.minhashDedup(corpus, "doc_id", "text",
        numHashes = 64, bands = 16, shingleN = 3, threshold = threshold,
        maxBucketSize = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    val scatteredFound = found.intersect(truthScattered)
    val hotFound = found.count(_._1 < 1100L)
    val recallOutsideHot = scatteredFound.size.toDouble / truthScattered.size
    val recallOverall = found.size.toDouble / (truthHot + truthScattered.size)
    info(f"capped-config recall: outside hot bucket = $recallOutsideHot%.3f " +
      f"(${scatteredFound.size}/${truthScattered.size}); overall = " +
      f"$recallOverall%.5f (hot cluster's $truthHot pairs deliberately " +
      "suppressed by the cap)")
    // the cap is surgical: every pair OUTSIDE the hot bucket survives,
    // every pair INSIDE it is suppressed (the documented tradeoff — a
    // >1000-member near-identical cluster is boilerplate you drop wholesale,
    // not pairs you enumerate)
    assert(recallOutsideHot == 1.0,
      s"cap harmed pairs outside the hot bucket: $recallOutsideHot")
    assert(hotFound == 0, s"hot bucket not fully suppressed: $hotFound pairs")
    // and with the cap disabled the same corpus yields FULL recall
    val uncapped = Dedup.minhashDedup(corpus, "doc_id", "text",
        numHashes = 64, bands = 16, shingleN = 3, threshold = threshold,
        maxBucketSize = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size.toLong == truthHot + truthScattered.size,
      s"uncapped recall not 1.0: ${uncapped.size} of ${truthHot + truthScattered.size}")
  }

  test("duplicatedSpans: corpus-wide window counting, short docs, within-doc repeats") {
    val corpus = Seq(
      (0L, "a b c d e"),     // windows(3): "a b c" "b c d" "c d e"
      (1L, "x y a b c"),     // shares "a b c" with doc 0
      (2L, "p q"),           // < spanTokens -> zero windows
      (3L, "m m m m")        // "m m m" twice WITHIN one doc -> both dup
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(corpus, "doc_id", "text",
        spanTokens = 3, hashWindows = false)
      .orderBy("doc_id").as[(Long, Int, Int, Int)].collect().toSeq
    assert(got == Seq(
      (0L, 3, 1, 3333),  // floor(10000/3 + .5)
      (1L, 3, 1, 3333),
      (2L, 0, 0, 0),
      (3L, 2, 2, 10000)))
  }

  test("duplicatedSpans: both adaptive shapes (probe join vs window " +
      "exchange) compute identical results") {
    // windowShapeMaxBytes = 0 forces the large-corpus probe shape;
    // MaxValue forces the small-corpus window shape — same answers
    val a = Dedup.duplicatedSpans(docs, "doc_id", "text", spanTokens = 3,
      hashWindows = true, windowShapeMaxBytes = 0L)
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.duplicatedSpans(docs, "doc_id", "text", spanTokens = 3,
      hashWindows = true, windowShapeMaxBytes = Long.MaxValue)
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "adaptive branches diverged")
  }

  test("duplicatedSpans: hashed production path equals the portable string path") {
    val s = Dedup.duplicatedSpans(docs, "doc_id", "text",
      spanTokens = 4, hashWindows = false).orderBy("doc_id").collect().toSeq
    val h = Dedup.duplicatedSpans(docs, "doc_id", "text",
      spanTokens = 4, hashWindows = true).orderBy("doc_id").collect().toSeq
    assert(s == h)
    // the identical pair 2/3 must show full-coverage duplication
    val d2 = s.find(_.getLong(0) == 2L).get
    assert(d2.getInt(2) == d2.getInt(1) && d2.getInt(3) == 10000)
  }

  test("removeDuplicateSpans: keeps the canonical occurrence, rewrites the rest") {
    val corpus = Seq(
      (0L, "a b c d e"),   // canonical "a b c" (doc 0, pos 0) survives
      (1L, "x y a b c"),   // its "a b c" at pos 2 is removed
      (2L, "p q"),         // < spanTokens: untouched
      (3L, "m m m m")      // "m m m" at pos 0 canonical; pos 1 removed,
                           //  but its tokens 1..3 overlap the canonical —
                           //  removal covers indices 1,2,3
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(corpus, "doc_id", "text",
        spanTokens = 3, hashWindows = false)
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (0L, 5, 0, "a b c d e"),
      (1L, 5, 3, "x y"),
      (2L, 2, 0, "p q"),
      (3L, 4, 3, "m")))
    // hashed production path agrees
    val h = Dedup.removeDuplicateSpans(corpus, "doc_id", "text",
        spanTokens = 3, hashWindows = true)
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect().toSeq
    assert(h == got)
    // the rewrite is idempotent: a second pass removes nothing
    val again = Dedup.removeDuplicateSpans(
        got.toDF("doc_id", "n_tokens", "n_removed", "text")
          .select($"doc_id", $"text"),
        "doc_id", "text", spanTokens = 3, hashWindows = false)
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect().toSeq
    assert(again.forall(_._3 == 0), s"second pass removed tokens: $again")
  }

  test("dedupClusters: identical docs cluster under the min id with correct size") {
    val got = Dedup.dedupClusters(docs, "doc_id", "text", threshold = 0.9,
        maxBucketSize = Int.MaxValue)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // docs 2 and 3 are identical -> canonical 2, size 2; everything else solo
    assert(got.filter(_._1 == 2L).head == ((2L, 2L, 2L)))
    assert(got.filter(_._1 == 3L).head == ((3L, 2L, 2L)))
    assert(got.filter(_._1 == 4L).head == ((4L, 4L, 1L)))
    assert(got.length == 6)
  }

  test("dedupClustersKeepBest: the survivor is the max-priority member " +
      "(NOT the min id), ties break to min id, singletons untouched") {
    import org.apache.spark.sql.functions._
    // cluster {1,2,3}: near-identical long docs; doc 3 planted as best
    val base = "the common shared sentence repeats across these documents " +
      "with enough overlapping shingles to cluster together every time"
    val d = Seq(
      (1L, base, 1.0),
      (2L, base + " tail", 2.0),
      (3L, base + " tip", 9.0),   // highest priority — must win
      (7L, "a completely different singleton document about other things entirely", 5.0),
      // cluster {8,9}: equal priority — tie-break keeps the MIN id
      (8L, "entirely separate narrative where sailors navigate stormy oceans " +
        "guided by constellations and weathered charts drawn long ago", 4.0),
      (9L, "entirely separate narrative where sailors navigate stormy oceans " +
        "guided by constellations and weathered charts drawn long ago again", 4.0)
    ).toDF("doc_id", "text", "prio")
    val got = Dedup.dedupClustersKeepBest(d, "doc_id", "text",
        priority = col("prio"), threshold = 0.5,
        maxBucketSize = Int.MaxValue)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, 3L, 3L)) && byId(2L) == ((2L, 3L, 3L)) &&
      byId(3L) == ((3L, 3L, 3L)),
      s"cluster {1,2,3} must keep max-priority doc 3: $got")
    assert(byId(7L) == ((7L, 7L, 1L)), "singleton keeps itself")
    assert(byId(8L) == ((8L, 8L, 2L)) && byId(9L) == ((9L, 8L, 2L)),
      s"priority tie must keep the min id: $got")
    // the min-id shape would have kept doc 1 — prove the relabel differs
    val minId = Dedup.dedupClusters(d, "doc_id", "text", threshold = 0.5,
        maxBucketSize = Int.MaxValue)
      .filter(col("doc_id") === 1L).select("canonical_id").as[Long].head()
    assert(minId == 1L, "fixture broken: min-id canonical should be 1")
  }

  test("dedupClustersKeepBest: a NULL priority never wins its cluster " +
      "(r13 ADVICE); an all-null cluster keeps the min-id canonical; a " +
      "non-numeric priority fails loudly with guidance") {
    import org.apache.spark.sql.functions._
    val base = "the common shared sentence repeats across these documents " +
      "with enough overlapping shingles to cluster together every time"
    val sail = "entirely separate narrative where sailors navigate stormy " +
      "oceans guided by constellations and weathered charts drawn long ago"
    val d = Seq(
      // cluster {1,2,3}: doc 1 has NULL priority (e.g. qualityScore of a
      // null text) — under the naive struct-min it would silently win
      (1L, base, None: Option[Double]),
      (2L, base + " tail", Some(2.0)),
      (3L, base + " tip", Some(9.0)),
      // cluster {8,9}: ALL priorities null -> min-id canonical survives
      (8L, sail, None: Option[Double]),
      (9L, sail + " again", None: Option[Double])
    ).toDF("doc_id", "text", "prio")
    val got = Dedup.dedupClustersKeepBest(d, "doc_id", "text",
        priority = col("prio"), threshold = 0.5,
        maxBucketSize = Int.MaxValue)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == 3L && byId(2L)._2 == 3L && byId(3L)._2 == 3L,
      s"null-priority doc 1 must not beat doc 3: $got")
    assert(byId(8L)._2 == 8L && byId(9L)._2 == 8L,
      s"all-null cluster keeps the min-id canonical: $got")
    // string priority: loud analysis-time error with guidance, not a
    // binary-op failure deep inside the plan
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupClustersKeepBest(d.withColumn("p2", lit("high")),
        "doc_id", "text", priority = col("p2"), threshold = 0.5,
        maxBucketSize = Int.MaxValue).collect()
    }
    assert(e.getMessage.contains("must be numeric"))
  }
  test("containmentIncremental == full containmentPairs restricted to " +
      "batch-touching pairs, in BOTH cap regimes (uncapped, and a cap " +
      "that truncates a hot shingle)") {
    val rnd = new scala.util.Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    def sentence(n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val base = (0L until 24L).map(i => (i, sentence(18)))
    // planted containments: short doc embedded in a long one, straddling
    // and within the batch split (batch = id % 3 == 0)
    val embeds = Seq(
      (100L, base(1)._2.split(" ").take(6).mkString(" ")),  // index short in index long
      (102L, base(2)._2.split(" ").take(6).mkString(" ")),  // batch short (102%3=0) in index long
      (105L, base(0)._2.split(" ").take(6).mkString(" ")))  // batch short in batch long (0%3=0)
    // hot shingle: many docs sharing one 3-gram so a cap actually bites
    val hot = (200L until 230L).map(i =>
      (i, "hot hot hot " + sentence(4)))
    val all = (base ++ embeds ++ hot).toDF("doc_id", "text")
    val isBatch = col("doc_id") % 3 === 0
    val batch = all.filter(isBatch)
    val index = Dedup.nearDupIndex(all.filter(!isBatch), "doc_id", "text",
      numHashes = 64, shingleN = 3)
    for (cap <- Seq(Int.MaxValue, 8)) {
      val inc = Dedup.containmentIncremental(batch, index, "doc_id", "text",
          shingleN = 3, thresholdNum = 5, thresholdDen = 10,
          maxPostings = cap)
        .select("id_a", "id_b", "inter", "sz_a", "sz_b", "containment")
        .as[(Long, Long, Long, Int, Int, Double)].collect().toSet
      val full = Dedup.containmentPairs(all, "doc_id", "text",
          shingleN = 3, thresholdNum = 5, thresholdDen = 10,
          maxPostings = cap)
        .select("id_a", "id_b", "inter", "sz_a", "sz_b", "containment")
        .as[(Long, Long, Long, Int, Int, Double)].collect().toSet
      val expected = full.filter { case (a, b, _, _, _, _) =>
        a % 3 == 0 || b % 3 == 0 }
      assert(inc == expected,
        s"cap=$cap: incremental=$inc expected=$expected")
      if (cap == Int.MaxValue) {
        // the corpus exercises all three pair origins
        assert(inc.exists { case (a, b, _, _, _, _) => a % 3 == 0 && b % 3 == 0 })
        assert(inc.exists { case (a, b, _, _, _, _) => (a % 3 == 0) != (b % 3 == 0) })
        assert(full.exists { case (a, b, _, _, _, _) => a % 3 != 0 && b % 3 != 0 },
          "full run must have index-index pairs the incremental run skips")
      }
    }
    // the cap regimes genuinely differ on this corpus (the hot shingle)
    val capped = Dedup.containmentPairs(all, "doc_id", "text", shingleN = 3,
      thresholdNum = 5, thresholdDen = 10, maxPostings = 8).count()
    val uncapped = Dedup.containmentPairs(all, "doc_id", "text", shingleN = 3,
      thresholdNum = 5, thresholdDen = 10, maxPostings = Int.MaxValue).count()
    assert(capped < uncapped, "the cap must actually truncate a hot shingle")
  }

}
