package graft.tools

import graft.functions.VectorFns
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: SRP bucket occupancy distribution of an embeddings
  * table at a given bits/bands config — answers "is the within-bucket
  * self-join cost occupancy-bound or skew-bound?".
  * Usage: jrun graft.tools.BucketSkew <dir> <bits> <bands> */
object BucketSkew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/sf2")
    val bits = args.lift(1).map(_.toInt).getOrElse(10)
    val bands = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), VectorFns.quantize(col("embedding"), 1000).as("__qv"))
    val n = e.count()
    val seedBuckets = (0 until bands).map { i =>
      struct(lit(i).as("seed"),
        VectorFns.srpBucketInt(col("__qv"),
          Similarity.rademacherPlanes(64, bits, 42L + i)).as("bucket"))
    }
    val occ = e.select(explode(array(seedBuckets: _*)).as("sb"))
      .groupBy(col("sb.seed"), col("sb.bucket")).count()
    val stats = occ.agg(
      count(lit(1)).as("nonempty_buckets"),
      max(col("count")).as("max_occ"),
      expr("percentile_approx(count, 0.5)").as("p50"),
      expr("percentile_approx(count, 0.99)").as("p99"),
      sum(col("count") * col("count")).as("sum_occ_sq")).collect()(0)
    println(s"n=$n bits=$bits bands=$bands buckets=2^$bits=${1L << bits}")
    println(s"nonempty=${stats.getLong(0)} max=${stats.getLong(1)} " +
      s"p50=${stats.getLong(2)} p99=${stats.getLong(3)}")
    val pairs = stats.getLong(4) / 2
    val uniform = bands.toLong * n * n / (2L * (1L << bits))
    println(f"candidate pairs ~= $pairs%,d (uniform expectation ~= $uniform%,d, skew x${pairs.toDouble / uniform}%.1f)")
    spark.stop()
  }
}
