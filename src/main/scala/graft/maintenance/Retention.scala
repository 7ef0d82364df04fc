package graft.maintenance

import org.apache.spark.sql.SparkSession
import java.time.LocalDate
import java.time.format.DateTimeFormatter
import scala.util.Try

/** Retention maintenance (SURVEY.md §2.10 T6; reference:
  * maintenance/retention_cleaner.py:16-47, cleanup_old_data.py:16-47):
  * purge date-named partition directories older than a cutoff.
  *
  * The reference walks zip archives and raw scrape folders; here the lake
  * is parquet/CSV directories named `YYYY-MM-DD`, so retention is a
  * partition-directory drop — the same operation a Delta VACUUM or
  * `ALTER TABLE DROP PARTITION` performs on a real warehouse.
  */
object Retention {

  private val fmt = DateTimeFormatter.ISO_LOCAL_DATE

  /** Deletes immediate subdirectories of `root` whose name parses as a date
    * strictly older than `keepDays` before `today`. Returns deleted names. */
  def purgeDatedDirs(spark: SparkSession, root: String, today: LocalDate,
                     keepDays: Int = 60): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val cutoff = today.minusDays(keepDays.toLong)
    fs.listStatus(p).filter(_.isDirectory).toSeq
      .flatMap { st =>
        val name = st.getPath.getName
        Try(LocalDate.parse(name, fmt)).toOption
          .filter(_.isBefore(cutoff))
          .map { _ => fs.delete(st.getPath, true); name }
      }.sorted
  }
}
