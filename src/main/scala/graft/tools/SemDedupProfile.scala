package graft.tools

import graft.operators.{KMeansInt, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-profiler for the q70/q82 family: times each stage of the
  * tiled SemDeDup / label-noise pipeline at a given SF dir and prints the
  * per-centroid occupancy histogram, so cliff diagnosis targets measured
  * stage costs (k-means build vs counts job vs pair join) and measured
  * skew, not guesses. Usage: jrun graft.tools.SemDedupProfile <sfDir> */
object SemDedupProfile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("semdedup-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = time("count")(e.count())
    val nlist = Similarity.autoNlist(n, targetListRows = 4096L)
    println(s"[profile] n=$n nlist=$nlist")

    val init = time("kmeans++ init")(
      KMeansInt.kmeansPlusPlusInit(e, "vec_id", "embedding", nlist, scale = 1000))
    val (cents, iters) = time("kmeans converge (<=8 iters)")(
      KMeansInt.converge(e, "vec_id", "embedding", init, scale = 1000, maxIters = 8))
    println(s"[profile] kmeans iters=$iters")

    // occupancy histogram + implied pair work, converged vs seed centroids
    for ((label, cs) <- Seq("converged" -> cents,
        "seed" -> Similarity.seedCentroidsInt(e, "vec_id", "embedding", nlist, 1000))) {
      val occ = KMeansInt.assignmentSums(e, "vec_id", "embedding", cs, scale = 1000)
        .filter(col("pos") === 0).select(col("n"))
        .collect().map(_.getLong(0)).sorted.reverse
      val pairs = occ.map(c => c * (c - 1) / 2).sum
      println(s"[profile] $label occupancy: max=${occ.head} min=${occ.last} " +
        s"top5=${occ.take(5).mkString(",")} pairs=$pairs")
    }

    time("semDedup FULL (converged cents)")(
      exec(Similarity.semDedup(e, "vec_id", "embedding", nCentroids = nlist,
        thresholdNum = 3, thresholdDen = 10, scale = 1000,
        centroids = Some(cents))))
    time("semDedup FULL again (warm)")(
      exec(Similarity.semDedup(e, "vec_id", "embedding", nCentroids = nlist,
        thresholdNum = 3, thresholdDen = 10, scale = 1000,
        centroids = Some(cents))))
    val nlist2 = Similarity.autoNlist(n, targetListRows = 1024L)
    val init2 = time("kmeans++ init (q82 sizing)")(
      KMeansInt.kmeansPlusPlusInit(e, "vec_id", "embedding", nlist2, scale = 1000))
    val (cents2, _) = time("kmeans converge (q82 sizing)")(
      KMeansInt.converge(e, "vec_id", "embedding", init2, scale = 1000, maxIters = 8))
    time("labelNoiseKnn FULL (converged cents)")(
      exec(Similarity.labelNoiseKnn(e, "vec_id", "embedding", "label", k = 5,
        nCentroids = nlist2, scale = 1000, centroids = Some(cents2))))
    spark.stop()
  }
}
