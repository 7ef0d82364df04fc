package graft.streaming

import graft.operators.MergeSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingest (SURVEY.md §2.10): the reference's daily
  * cron + repair-pass + hash-upsert incremental semantics, re-expressed as
  * a file-source stream with foreachBatch MERGE.
  *
  * Mapping (SURVEY.md §2.10 table):
  *  - T1 daily batch trigger    -> Trigger.AvailableNow over the landing dir
  *    (drains everything present, then stops — a cron-able micro-batch run);
  *  - T2 row_hash change-detect -> MergeSink.merge inside foreachBatch;
  *  - T3 at-least-once + dedup  -> merge keyed on the natural key absorbs
  *    replayed files; checkpoint gives exactly-once per batch;
  *  - T4 late/failed repair     -> late files simply arrive in a later batch
  *    and MERGE (no watermark needed for upsert paths).
  *
  * Scale: the file source lists incrementally (maxFilesPerTrigger bounds a
  * batch); each micro-batch is one shuffle on the natural key. For a
  * 100 TB warehouse the foreachBatch body targets Delta `MERGE INTO`
  * instead of the parquet-swap sink — same call shape.
  */
object StreamingIngest {

  /** CSV landing-dir stream with the engine's header/BOM conventions. */
  def csvStream(spark: SparkSession, landingDir: String, schema: StructType,
                maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(landingDir)
      .withColumn("origin_file", input_file_name())

  /** Hash-guarded continuous upsert: every micro-batch MERGEs into the
    * parquet warehouse at `targetPath` on `keys`. */
  def upsertStream(spark: SparkSession, stream: DataFrame, targetPath: String,
                   keys: Seq[String], checkpoint: String,
                   hashCol: Option[String] = Some("row_hash"),
                   availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MergeSink.upsertParquet(spark, targetPath, batch, keys, hashCol)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Tumbling-window event aggregation with a watermark — the streaming
    * twin of SparkEntry q31; late events beyond the watermark are dropped,
    * on-time aggregates emit incrementally (append mode). */
  def windowedCounts(events: DataFrame, tsCol: String, watermark: String,
                     window_ : String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("total_value"))

  /** Sessionization with idle-gap timeout via the built-in session_window —
    * the streaming twin of SparkEntry q32's batch computation. */
  def sessionized(events: DataFrame, tsCol: String, watermark: String,
                  gap: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .select(col("user_id"), col("n_events"),
        col("session_start"), col("session_end"))
}
