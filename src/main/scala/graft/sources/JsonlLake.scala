package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) lake source/sink — the interchange format
  * of LLM training-data pipelines (one document object per line; what
  * web-scale corpus distributions actually ship as). The reference's lake
  * is CSV (SURVEY.md §2.1); this is the additional source format a user
  * moving that pipeline to corpus work needs first.
  *
  * Design rules, all scale-driven:
  *  - **Schema is ALWAYS explicit.** `spark.read.json` without a schema
  *    runs a full inference pre-scan — at 100 TB that is a second read of
  *    the lake before the first real job. Callers pass the contract schema;
  *    drifted fields are quarantined, not silently merged.
  *  - **Corrupt lines are data, not exceptions.** PERMISSIVE mode with a
  *    named corrupt-record column splits the scan into (good, quarantine)
  *    the same way Validate.withReasons splits domain failures — bad lines
  *    keep their raw text for repair instead of killing a 1000-executor job
  *    (FAILFAST) or vanishing (DROPMALFORMED).
  *  - One scan serves both outputs: the split is two filters over the same
  *    cached-metadata read, not two passes over the lake.
  */
object JsonlLake {

  val CorruptCol = "_corrupt_line"

  /** Read a JSONL path against an explicit contract schema. Returns the
    * parsed frame with `CorruptCol` attached: NULL for clean lines, the
    * raw line text for malformed ones (parse errors, not schema drift —
    * missing fields are NULL per JSON-reader semantics).
    *
    * Implemented as a TEXT scan + `from_json`, not `spark.read.json`:
    * same whole-stage-codegen parse, but (a) the raw line is retained for
    * quarantine at zero extra cost, (b) the JSON datasource's
    * corrupt-column-only projection restriction (it would have to
    * re-parse) never applies, and (c) there is structurally no schema
    * inference to accidentally trigger. Blank lines are skipped like the
    * JSON reader does; directory partition columns (e.g. `lang=fr/`)
    * still come back via standard partition discovery on the text scan. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"contract schema must not declare $CorruptCol")
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .withColumn("origin_file", input_file_name())
      .withColumn("__parsed", from_json(col("value"),
        schema.add(CorruptCol, StringType),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))
    // everything that isn't the raw line or the parse struct is a
    // partition-discovery column (plus lineage) — carry it through
    val carried = parsed.columns.toSeq.filterNot(Set("value", "__parsed"))
    parsed.select(col("__parsed.*") +: carried.map(col): _*)
  }

  /** One-scan (good, quarantine) split. `good` drops the corrupt column;
    * `quarantine` carries (origin_file, raw line) for the repair pass
    * (SURVEY.md §2.10 T4 shape). */
  def readSplit(spark: SparkSession, path: String,
                schema: StructType): (DataFrame, DataFrame) = {
    val all = read(spark, path, schema)
    val good = all.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val quarantine = all.filter(col(CorruptCol).isNotNull)
      .select(col("origin_file"), col(CorruptCol).as("raw_line"))
    (good, quarantine)
  }

  /** Write a frame as JSONL, one object per line. `partitionByCols` maps
    * straight onto directory partition pruning for downstream scans. */
  def write(df: DataFrame, path: String,
            partitionByCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w)
      .json(path)
  }
}
