package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Parquet reads for ENGINE-WRITTEN artifacts (frozen LMs, tokenizers,
  * retrieval indexes): every schema here mirrors the writer in the same
  * file, so the read passes it explicitly instead of paying a Spark job
  * to re-infer what the engine itself defined. The r17 job-count profile
  * (tools/QueryStats + LifecycleProbe) measured one "parquet at" job per
  * schema-inferred read — for artifact-lifecycle queries that inference
  * was a double-digit share of total Spark jobs. Layout-DETECTING loads
  * (loadLm's lm_order probe, UnigramLm.load's word_model presence check)
  * keep inference on their meta read: the column set is the information.
  *
  * Declared types must match the writer exactly (parquet refuses silent
  * int32→int64 widening), which is itself a guard: a foreign file in an
  * artifact slot fails at read, not as garbage rows. */
object ArtifactIO {
  def readParquet(spark: SparkSession, path: String,
                  fields: (String, DataType)*): DataFrame =
    spark.read.schema(StructType(fields.map { case (n, t) =>
      StructField(n, t)
    })).parquet(path)
}
