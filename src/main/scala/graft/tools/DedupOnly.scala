package graft.tools
import graft.Graft
import graft.operators.Dedup
import org.apache.spark.sql.functions._
object DedupOnly {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Graft.session("graft-deduponly")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    Dedup.dedupClusters(docs.limit(2000), "doc_id", "text", 64, 32, 3, 0.5, 1000).count()
    for (rep <- 1 to 3) {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = Dedup.dedupClusters(docs, "doc_id", "text", 64, 32, 3, 0.5, 1000).count()
      println(f"[deduponly] rep$rep rows=$n ${(System.nanoTime()-t0)/1e9}%7.2fs")
    }
    spark.stop()
  }
}
