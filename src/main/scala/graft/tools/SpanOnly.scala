package graft.tools
import graft.Graft
import graft.operators.Dedup
import org.apache.spark.sql.functions._
object SpanOnly {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Graft.session("graft-spanonly")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    Dedup.removeDuplicateSpans(docs.limit(2000), "doc_id", "text", 8).agg(sum("n_removed")).collect()
    for (rep <- 1 to 3) {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val r = Dedup.removeDuplicateSpans(docs, "doc_id", "text", 8)
        .agg(sum("n_removed"), sum(length(col("kept_text")))).collect()(0)
      println(f"[spanonly] rep$rep removed=${r.getLong(0)} chars=${r.getLong(1)} ${(System.nanoTime()-t0)/1e9}%7.2fs")
    }
    spark.stop()
  }
}
