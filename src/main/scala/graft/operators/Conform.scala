package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Schema-conform operators (SURVEY.md §2.3 P1–P3): the reference's
  * "absorb per-source schema drift" machinery, table-driven.
  *
  * Reference behavior re-expressed:
  *  - P1 header normalize: 01_master_sync/00_master_list_cleaner.py:37
  *  - P2 rename maps:      00_master_list_cleaner.py:39-45 et al.
  *  - P3 add-missing + select-exact: 00_master_list_cleaner.py:47-51
  */
object Conform {

  /** P1: lowercase/trim headers; spaces and dashes -> underscores. */
  def normHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(c => c.trim.toLowerCase.replaceAll("[ \\-]+", "_")): _*)

  /** P2: source-specific -> canonical column names (missing keys ignored). */
  def rename(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping.filter { case (from, _) => df.columns.contains(from) })

  /** P3: conform to an expected (name -> type) list: add missing columns as
    * typed nulls, cast present ones, select exactly and in order. */
  def conform(df: DataFrame, expected: Seq[(String, DataType)]): DataFrame = {
    val have = df.columns.toSet
    df.select(expected.map { case (name, dt) =>
      if (have(name)) col(name).cast(dt).as(name) else lit(null).cast(dt).as(name)
    }: _*)
  }

  /** Declarative per-source spec: one table-driven cleaner replaces the
    * reference's ~10 near-identical `process_*` functions (SURVEY.md §7.4.1). */
  final case class SourceSpec(
      renameMap: Map[String, String] = Map.empty,
      expected: Seq[(String, DataType)] = Nil,
      constants: Map[String, String] = Map.empty) {
    def apply(raw: DataFrame): DataFrame = {
      val named = rename(normHeaders(raw), renameMap)
      val withConsts = constants.foldLeft(named) { case (d, (k, v)) =>
        if (d.columns.contains(k)) d else d.withColumn(k, lit(v))
      }
      if (expected.isEmpty) withConsts else conform(withConsts, expected)
    }
  }
}
