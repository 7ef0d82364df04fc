package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.UrlDedup

/** Isolated q129-shape measure (used once for the r16 sweep's q129
  * attribution; kept for re-measurement). */
object UrlOnly16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
    val v1 = conv(substring(md5(concat(lit("graft-q129:"),
      col("doc_id").cast("string"))), 1, 2), 16, 10).cast("int")
    val host = concat(lit("site"), (col("doc_id") % 97).cast("string"),
      lit(".example.com"))
    val urlView = docs.select(col("doc_id"), concat(
      element_at(array(lit("https"), lit("HTTPS")), (v1 % 2) + 1),
      lit("://"),
      when(v1 % 2 === 0, lit("www.")).otherwise(lit("")), host,
      lit("/page/"), (col("doc_id") % 1009).cast("string"),
      when(v1 % 3 === 0, lit("/?utm_source=feed&z=1")).otherwise(lit(""))
    ).as("url"))
    val ts = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      UrlDedup.urlGroups(urlView, "doc_id", "url")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"""{"dir":"${args(0)}","times":[${ts.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
