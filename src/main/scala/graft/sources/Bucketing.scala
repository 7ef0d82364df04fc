package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-registered bucketed tables — the shuffle-elimination layer on
  * top of MergeSink's directory bucketing.
  *
  * MergeSink's `__bucket=N` partitioning prunes I/O (an upsert touches
  * only its keys' buckets), but Spark doesn't KNOW the layout, so a join
  * on the natural key still shuffles both sides. Writing through
  * `bucketBy(...).sortBy(...).saveAsTable` records the hash-distribution
  * in the catalog: two tables co-bucketed on the same key and count join
  * with ZERO exchanges (each bucket pair joins in place), and single-table
  * aggregations on the bucket key skip their shuffle too.
  *
  * At 100 TB this is the difference between re-shuffling the fact table
  * on every warehouse join and never shuffling it after load: pick bucket
  * counts once per table family (same count on both join sides — Spark
  * requires equal counts, or one being a multiple with
  * spark.sql.bucketing.coalesceBucketsInJoin.enabled), bucket on the join
  * key, sort within buckets so merge-joins skip their sort as well.
  */
object Bucketing {

  /** Writes `df` as a bucketed + in-bucket-sorted catalog table (parquet).
    * Same key order for every table that will co-join. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int): Unit = {
    require(keys.nonEmpty, "bucketing requires at least one key column")
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Reads a catalog table (bucket metadata rides along automatically —
    * joins/aggregations on the bucket keys plan without an Exchange). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
