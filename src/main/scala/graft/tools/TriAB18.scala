package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 interleaved A/B: q114's HYBRID trigram-perplexity plan (broadcast
  * uni/bigram side tables + one distributed trigram join) vs the r17
  * 5-join distributed plan, alternated in ONE JVM through the noop sink
  * so JIT/host drift hits both arms equally (the trainer_ab
  * methodology — cross-session subset benches measured ±40-170% on
  * untouched queries in r17, interleaved minima are the trustworthy
  * signal). Usage: jrun graft.tools.TriAB18 [sfDir] [reps] */
object TriAB18 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def run(sideCap: Int): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      graft.operators.QualityModel.trigramCrossEntropy(docs, "doc_id",
          "text", maxLocalSideTables = sideCap)
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both arms once (JIT/classload outside the measurements)
    run(500000); run(0)
    val hyb = collection.mutable.ArrayBuffer.empty[Double]
    val dist = collection.mutable.ArrayBuffer.empty[Double]
    for (i <- 1 to reps) {
      hyb += run(500000)
      dist += run(0)
      println(f"[rep $i] hybrid ${hyb.last}%.3f  distributed ${dist.last}%.3f")
    }
    def st(xs: Seq[Double]) =
      f"min ${xs.min}%.3f median ${xs.sorted.apply(xs.size / 2)}%.3f"
    println(s"hybrid      ${st(hyb.toSeq)}")
    println(s"distributed ${st(dist.toSeq)}")
  }
}
