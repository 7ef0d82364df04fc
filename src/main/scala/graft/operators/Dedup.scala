package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: the reference's keyed dedups (SURVEY.md §2.6
  * A3–A5, §2.5 J4) plus the LLM-corpus near-dup family (exact, MinHash+LSH,
  * SimHash, n-gram Jaccard) from the north star.
  *
  * Scale design (100 TB):
  *  - every candidate-generation step is a key-partitioned shuffle (band
  *    bucket / bit chunk / content hash), never a cross join;
  *  - signatures are computed in one pass over an exploded shingle frame —
  *    map-side partial min aggregation means the shuffle carries k longs per
  *    doc, not the shingles;
  *  - pathological LSH buckets (stopword-like shingles, near-constant docs)
  *    are capped by `maxBucketSize` — a documented recall/robustness tradeoff
  *    that prevents a single hot bucket from producing O(n^2) pairs.
  */
object Dedup {

  /** A3/A4 (00_performance_data_cleaner.py:110, 00_master_list_cleaner.py:75-77):
    * keyed dedup with explicit deterministic priority — `keep first by order`.
    * Spark's dropDuplicates is nondeterministic under shuffle; a window +
    * row_number pins the survivor. */
  def keyedKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact content dedup: group by fingerprint, keep the lowest id.
    * Output: one row per distinct content with its surviving id and the
    * duplicate count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFns.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // ---------------------------------------------------------------- MinHash

  /** MinHash signatures: k independent hash functions simulated as
    * xxhash64(seed_i, shingle); signature_i = min over the doc's shingle set.
    * One explode + one groupBy(id) — the classic scalable formulation. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, shingleN: Int = 3): DataFrame = {
    val sh = df
      .select(col(idCol), explode(array_distinct(TextFns.shingles(col(textCol), shingleN))).as("sh"))
    val mins = (0 until numHashes).map(i => min(xxhash64(lit(i), col("sh"))).as(s"h$i"))
    sh.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"h$i")): _*).as("signature"))
  }

  /** LSH banding: signature split into `bands` bands of k/bands rows; docs
    * sharing any band bucket become candidate pairs. Returns distinct
    * (id_a, id_b) with id_a < id_b. */
  def lshCandidatePairs(signatures: DataFrame, idCol: String,
                        bands: Int, maxBucketSize: Int = 1000): DataFrame = {
    val numHashes = signatures.select(size(col("signature"))).head().getInt(0)
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(col("signature"), b * rows + 1, rows)).as("bucket"))
    }
    val buckets = signatures
      .select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
    val capped = buckets
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("__n") <= maxBucketSize)
      .drop("__n")
    val a = capped.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = capped.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exhaustive-on-candidates n-gram Jaccard dedup: candidate pairs are docs
    * sharing at least one shingle (inverted-index join — shuffle keyed by
    * shingle, hot shingles capped), then exact Jaccard >= threshold. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, threshold: Double = 0.8,
                   maxPostings: Int = 1000): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      explode(array_distinct(TextFns.shingles(col(textCol), shingleN))).as("sh"))
    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("sz"))
    val capped = sh
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("__n") <= maxPostings).drop("__n")
    val inter = capped.select(col("sh"), col("__id").as("id_a"))
      .join(capped.select(col("sh"), col("__id").as("id_b")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("__id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Full MinHash+LSH near-dup pipeline: signatures -> banded candidates ->
    * exact-Jaccard verification -> pairs >= threshold. */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   shingleN: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sigs  = minhashSignatures(df, idCol, textCol, numHashes, shingleN)
    val pairs = lshCandidatePairs(sigs, idCol, bands)
    jaccardForPairsShared(df, pairs, idCol, textCol, shingleN)
      .filter(col("jaccard") >= threshold)
  }

  /** Preferred pair-verification: joins each side's shingle set and counts
    * matches (equi-join on (pair, shingle)). */
  def jaccardForPairsShared(df: DataFrame, pairs: DataFrame, idCol: String,
                            textCol: String, shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      explode(array_distinct(TextFns.shingles(col(textCol), shingleN))).as("sh"))
    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("sz"))
    val shA = sh.select(col("__id").as("id_a"), col("sh"))
    val shB = sh.select(col("__id").as("id_b"), col("sh"))
    val inter = pairs.join(shA, Seq("id_a")).join(shB, Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    pairs.join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col("__id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word tokens: per bit position, sum +1/-1 weighted by
    * token frequency; bit = sign. Single explode + one groupBy. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(TextFns.tokens(col(textCol))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { k =>
      sum(when(col("h").bitwiseAND(lit(1L << k)) =!= 0, 1).otherwise(-1)).as(s"b$k")
    }
    tok.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 64).map(k => when(col(s"b$k") >= 0, lit(1L << k)).otherwise(lit(0L)))
          .reduce((a: Column, b: Column) => a.bitwiseOR(b)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, using the
    * standard pigeonhole blocking: split 64 bits into (maxHamming+1) chunks;
    * any pair within distance must agree on >= 1 chunk -> equi-join per chunk. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val chunks   = maxHamming + 1
    val width    = 64 / chunks
    val sh       = simhash(df, idCol, textCol)
    val chunkCol = (c: Int) => shiftright(col("simhash"), c * width)
      .bitwiseAND(lit((1L << width) - 1)).as("chunk_val")
    val blocked = sh.select(
      col(idCol), col("simhash"),
      explode(array((0 until chunks).map(c =>
        struct(lit(c).as("chunk_id"), chunkCol(c))): _*)).as("c"))
      .select(col(idCol), col("simhash"), col("c.chunk_id"), col("c.chunk_val"))
    val a = blocked.select(col("chunk_id"), col("chunk_val"),
      col(idCol).as("id_a"), col("simhash").as("sim_a"))
    val b = blocked.select(col("chunk_id"), col("chunk_val"),
      col(idCol).as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("chunk_id", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
