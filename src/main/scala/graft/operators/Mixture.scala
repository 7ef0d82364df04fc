package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture sampling — the data-mixing stage of a large-scale
  * training pipeline: given relative weights per source domain and a total
  * token budget, downsample each domain deterministically so the kept
  * corpus approaches the target token mix (the Pile/DoReMi-style domain
  * weighting, applied as hash sampling).
  *
  * Semantics (the keep test IS the contract, all integer arithmetic):
  *  - per source s: `keep_threshold_s =
  *    (budgetTokens * w_s * granularity) div (weightTotal * tokens_s)`
  *  - per row: keep iff `md5bucket(id) < keep_threshold_s`, where
  *    md5bucket(id) = first 15 hex digits of md5(id) as a base-16 integer,
  *    mod granularity — i.e. each source keeps ~min(1, B*w_s/(W*T_s)) of
  *    its rows, quantized down to 1/granularity.
  *
  * Hash-derived sampling (vs rand()) is retry-stable, engine-portable and
  * composable: a row's fate is a pure function of its id (same rationale
  * as SparkEntry q55).
  *
  * 100 TB shape: the heavy exact math runs on the per-source TOTALS frame
  * (|sources| rows — map-side partial `sum` then one tiny shuffle), which
  * then broadcast-joins back onto the fact scan; the per-row hot path is
  * md5 of the id plus ONE integer compare, inside whole-stage codegen,
  * with zero possibility of overflow (bucket and threshold are both <=
  * granularity). Threshold-numerator overflow is confined to the tiny
  * frame: budgetTokens * w_s * granularity must fit in a Long — at
  * granularity 10^4 and weights <= 100 that allows budgets to ~9*10^12
  * tokens; beyond that, lift the threshold expression to DECIMAL(38,0)
  * (a one-line change costing nothing on a |sources|-row frame).
  */
object Mixture {

  /** Deterministic md5-derived sample bucket in [0, granularity). */
  def sampleBucket(id: Column, granularity: Long = 10000L): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(granularity))

  /** Downsample `df` so each source's kept token mass approaches
    * `budgetTokens * w_s / weightTotal`.
    *
    * The input feeds BOTH the totals aggregation and the fact-side join;
    * without a persist each consumer re-runs df's lineage — when tokensCol
    * is derived inline from text (q64) that is a second full corpus scan +
    * tokenize. This overload therefore persists the (usually narrow) input
    * (same discipline as q60's sentence frame; PlanShapeSpec pins the
    * single-scan plan).
    *
    * @param weightCol relative weight per source — an expression over
    *                  `sourceCol` ONLY (it is evaluated on the aggregated
    *                  per-source frame)
    * @return kept rows of `df`, with `source_tokens` (the source's total),
    *         `keep_threshold` (kept fraction, per granularity-myriad) and
    *         `sample_bucket` appended for auditability.
    *         CACHING CONTRACT: `df` is persisted MEMORY_AND_DISK by this
    *         call and NOT released — in a long-running application use
    *         [[withTokenBudgetSample]] (scoped release) or
    *         [[tokenBudgetSampleOn]] (caller-managed persistence) instead;
    *         otherwise release via `df.unpersist()` after the first action
    *         (Bench runs `spark.catalog.clearCache()` between queries).
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, sourceCol: String,
                        tokensCol: String, weightCol: Column,
                        weightTotal: Long, budgetTokens: Long,
                        granularity: Long = 10000L): DataFrame =
    tokenBudgetSampleOn(
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      idCol, sourceCol, tokensCol, weightCol, weightTotal, budgetTokens,
      granularity)

  /** Loan-pattern twin of [[tokenBudgetSample]]: persists `df`, hands the
    * sampled frame to `use` (which must run its actions inside), then
    * unpersists — the release handle the bare overload cannot give. */
  def withTokenBudgetSample[T](df: DataFrame, idCol: String,
                               sourceCol: String, tokensCol: String,
                               weightCol: Column, weightTotal: Long,
                               budgetTokens: Long,
                               granularity: Long = 10000L)
                              (use: DataFrame => T): T = {
    val in = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try use(tokenBudgetSampleOn(in, idCol, sourceCol, tokensCol, weightCol,
      weightTotal, budgetTokens, granularity))
    finally in.unpersist()
  }

  /** [[tokenBudgetSample]] over an input whose persistence the CALLER
    * manages (pre-persisted, or already materialized) — adds no caching of
    * its own. Prefer this in long-running services. */
  def tokenBudgetSampleOn(in: DataFrame, idCol: String, sourceCol: String,
                          tokensCol: String, weightCol: Column,
                          weightTotal: Long, budgetTokens: Long,
                          granularity: Long = 10000L): DataFrame = {
    require(weightTotal > 0, s"weightTotal must be > 0, got $weightTotal")
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(granularity > 0 && granularity <= 1000000L,
      s"granularity must be in (0, 10^6], got $granularity")
    val totals = in.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol)).cast("long").as("source_tokens"))
      .withColumn("__w", weightCol.cast("long"))
      // integer floor-division on both engines (all operands positive)
      .withColumn("keep_threshold",
        expr(s"($budgetTokens * __w * $granularity) div " +
             s"($weightTotal * source_tokens)"))
      .drop("__w")
    in.join(broadcast(totals), sourceCol)
      .withColumn("sample_bucket", sampleBucket(col(idCol), granularity))
      .filter(col("sample_bucket") < col("keep_threshold"))
  }

  /** Up/down-RESAMPLING variant of [[tokenBudgetSample]]: a source whose
    * target share exceeds its data is UPSAMPLED (rows repeated — epochs
    * over the domain, the standard move when the high-quality domain is
    * small), and one below is downsampled as before. Per source,
    * `rate_myriad = (B * w_s * granularity) div (W * T_s)` (NOT capped at
    * granularity); every row emits `rate_myriad div granularity` full
    * copies plus one more iff its md5 bucket < `rate_myriad mod
    * granularity` — so expected kept tokens = B*w_s/W exactly, and a
    * row's copy count is a pure function of its id. Output rows carry
    * `epoch` (0-based copy index): downstream packing shuffles copies
    * apart naturally; dedup-sensitive consumers can filter epoch = 0.
    *
    * Same 100 TB shape as [[tokenBudgetSample]] — tiny-totals math,
    * broadcast join, codegen hot path; `explode(sequence(...))` emits
    * copies without re-reading the row.
    *
    * @return resampled rows; SAME CACHING CONTRACT as [[tokenBudgetSample]]
    *         — `df` stays persisted; use [[tokenBudgetResampleOn]] to
    *         manage persistence yourself. */
  def tokenBudgetResample(df: DataFrame, idCol: String, sourceCol: String,
                          tokensCol: String, weightCol: Column,
                          weightTotal: Long, budgetTokens: Long,
                          granularity: Long = 10000L): DataFrame =
    tokenBudgetResampleOn(
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      idCol, sourceCol, tokensCol, weightCol, weightTotal, budgetTokens,
      granularity)

  /** [[tokenBudgetResample]] over a caller-managed input — no caching of
    * its own (see [[tokenBudgetSampleOn]]). */
  def tokenBudgetResampleOn(in: DataFrame, idCol: String, sourceCol: String,
                            tokensCol: String, weightCol: Column,
                            weightTotal: Long, budgetTokens: Long,
                            granularity: Long = 10000L): DataFrame = {
    require(weightTotal > 0, s"weightTotal must be > 0, got $weightTotal")
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(granularity > 0 && granularity <= 1000000L,
      s"granularity must be in (0, 10^6], got $granularity")
    val totals = in.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol)).cast("long").as("source_tokens"))
      .withColumn("__w", weightCol.cast("long"))
      .withColumn("rate_myriad",
        expr(s"($budgetTokens * __w * $granularity) div " +
             s"($weightTotal * source_tokens)"))
      .drop("__w")
    // integral div/mod (not double division) — exact at any magnitude
    val copies = expr(s"rate_myriad div $granularity") +
      when(col("sample_bucket") < pmod(col("rate_myriad"), lit(granularity)), 1L)
        .otherwise(0L)
    in.join(broadcast(totals), sourceCol)
      .withColumn("sample_bucket", sampleBucket(col(idCol), granularity))
      .withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("n_copies") - 1)))
  }

  /** Exactly min(k, |stratum|) rows per stratum, chosen DETERMINISTICALLY:
    * rank rows within each stratum by (md5 bucket, id) and keep the first
    * k — a fixed-size per-stratum uniform sample whose membership is a
    * pure function of the ids present (eval/holdout-set construction:
    * reruns, engine ports, and audits pick the identical rows). Appends
    * `sample_bucket` and `sample_rank`.
    *
    * 100 TB shape: one hash exchange on the stratum key + per-stratum
    * sort (the q67 window contract shape). When k << |stratum| a
    * deployment can pre-filter with [[tokenBudgetSample]]-style bucket
    * thresholding (keep ~2k/|stratum| by bucket, then rank only the
    * survivors) so the sort touches a sliver — membership is unchanged
    * because bucket-rank is what both steps order by. */
  def stratifiedK(df: DataFrame, idCol: String, stratumCol: String, k: Int,
                  granularity: Long = 1000000L): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("sample_bucket").asc, col(idCol).asc)
    df.withColumn("sample_bucket", sampleBucket(col(idCol), granularity))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic mutually-exclusive split assignment (train/val/test):
    * each row's md5 bucket (seeded, so different splits of the same
    * corpus are independent) lands in one of the `splits` bands, sized by
    * integer weight out of the weight total. Appends a `split` column.
    * Membership is a pure function of (seed, id) — retry-stable,
    * partition-layout-independent, and adding rows later never moves an
    * existing row across splits. Zero exchanges: one md5 + a when-chain
    * inside the scan's codegen span.
    *
    * Exact integer semantics (the q55/q64 discipline): bucket in
    * [0, weightTotal) via pmod of the 60-bit md5 prefix; band k covers
    * [sum(w_0..k-1), sum(w_0..k)). Expected sizes are proportional to the
    * weights with the usual multinomial variance — for EXACT-k splits use
    * [[stratifiedK]]. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         splits: Seq[(String, Int)],
                         seed: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"split weights must be positive: $splits")
    val total = splits.map(_._2.toLong).sum
    val bucket = pmod(conv(substring(md5(
        concat(lit(seed), lit(":"), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long"), lit(total))
    val bands = splits.scanLeft(0L) { case (acc, (_, w)) => acc + w }
    val expr = splits.zip(bands.sliding(2).toSeq).foldLeft(
        lit(null).cast("string")) { case (acc, ((name, _), Seq(lo, hi))) =>
      when(bucket >= lo && bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Temperature-scaled mixture resampling at α = 1/2 — the multilingual
    * sampling rule (mBERT / XLM-R / mT5): sources are re-weighted
    * p_s ∝ n_s^α so low-resource domains UPsample and high-resource ones
    * DOWNsample relative to their natural shares, with the total kept
    * mass targeting `budgetTokens`. Unlike [[tokenBudgetResampleOn]] the
    * weights are DERIVED FROM THE DATA (w_s = √n_s), not supplied.
    *
    * Exactness across engines: α = 1/2 is computed with IEEE-754 `sqrt`,
    * which is CORRECTLY ROUNDED by spec — bit-identical in the JVM and
    * DuckDB — then quantized to 1e-3 fixed point (`sq_s =
    * round(√n_s · 1000)`) so everything downstream is integer:
    * `rate_myriad_s = (B · sq_s · granularity) div (Z · n_s)` with
    * Z = Σ sq_t. The one product that can exceed 64 bits at petascale
    * (B · sq · granularity with B ~ 10^13, sq ~ 5·10^9) runs in
    * DECIMAL(38,0) (DuckDB: HUGEINT) — exact integer arithmetic at any
    * realistic magnitude, result cast back to BIGINT (< granularity ·
    * n_copies_max, always small). Per-row copy semantics are exactly
    * [[tokenBudgetResampleOn]]'s: `n_copies = rate div g + [bucket <
    * rate mod g]`, epochs exploded.
    *
    * 100 TB shape: per-source totals frame (map-side partial sum, tiny
    * shuffle) → one-row Z frame (broadcast) → rates broadcast-joined back
    * onto the fact scan; per-row hot path is one md5 + integer compares
    * in codegen. Same single-persisted-scan discipline as
    * [[tokenBudgetSampleOn]] — pass a caller-persisted `in`. */
  def temperatureResampleSqrt(in: DataFrame, idCol: String,
                              sourceCol: String, tokensCol: String,
                              budgetTokens: Long,
                              granularity: Long = 10000L): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(granularity > 0 && granularity <= 1000000L,
      s"granularity must be in (0, 10^6], got $granularity")
    val totals = in.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol)).cast("long").as("source_tokens"))
      // a source whose docs all tokenize to zero has no defined rate
      // (non-ANSI div would yield NULL and silently drop its rows, while
      // an ANSI oracle raises) — filter it on BOTH engines so the edge
      // behaves identically: zero-token docs can never be sampled anyway
      .filter(col("source_tokens") > 0)
      .withColumn("sq",
        round(sqrt(col("source_tokens").cast("double")) * 1000.0)
          .cast("long"))
    val z = totals.agg(sum(col("sq")).as("z"))
    val rates = totals.crossJoin(broadcast(z))
      .withColumn("rate_myriad",
        expr(s"CAST((CAST($budgetTokens AS DECIMAL(38,0)) * sq * $granularity)" +
             s" div (CAST(z AS DECIMAL(38,0)) * source_tokens) AS BIGINT)"))
      .select(col(sourceCol), col("source_tokens"), col("rate_myriad"))
    val copies = expr(s"rate_myriad div $granularity") +
      when(col("sample_bucket") < pmod(col("rate_myriad"), lit(granularity)), 1L)
        .otherwise(0L)
    in.join(broadcast(rates), sourceCol)
      .withColumn("sample_bucket", sampleBucket(col(idCol), granularity))
      .withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("n_copies") - 1)))
  }
}
