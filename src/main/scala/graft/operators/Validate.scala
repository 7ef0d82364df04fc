package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level rule validation with reject capture (SURVEY.md §2.4 F2/F5).
  *
  * The reference validates row-by-row with `iterrows` and writes failures plus
  * a reason string to a reject file (02_master_list_validator.py:37-88;
  * 01_performance_validator.py:42-78). Re-expressed vectorized: one pass
  * builds an issues column, one cached DataFrame splits into valid/reject.
  *
  * Reason ordering is explicit (rule list order) — the reference's
  * mask-overwrite bug (SURVEY.md §2.12) made the LAST failing mask win; here
  * every failing rule is reported, joined in declared priority order.
  */
object Validate {

  /** A named validity predicate: rows where `valid` is false get `name`
    * appended to their issue list. */
  final case class Rule(name: String, valid: Column)

  /** Adds `validation_issues` (';'-joined failing rule names; null when row
    * is clean). concat_ws drops nulls, so this is portable to the SQL oracle. */
  def withIssues(df: DataFrame, rules: Seq[Rule], issuesCol: String = "validation_issues"): DataFrame = {
    val parts = rules.map(r => when(!coalesce(r.valid, lit(false)), lit(r.name)))
    df.withColumn(issuesCol, nullif(concat_ws(";", parts: _*), lit("")))
  }

  /** Splits into (valid, rejects-with-reasons). Caller should persist `df`
    * upstream if both sides are consumed (one scan, two filters). */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val tagged = withIssues(df, rules)
    (tagged.filter(col("validation_issues").isNull).drop("validation_issues"),
     tagged.filter(col("validation_issues").isNotNull))
  }
}
