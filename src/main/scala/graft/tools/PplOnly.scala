package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.QualityModel

/** Isolated interleaved A/B of the corpus pipeline's perplexity gate
  * over a materialized s1_quality dir: (a) the r12 join shape
  * (unigramCrossEntropy + corpus left join), (b) inline xent column +
  * persist across the rejects/keep split, (c) inline naive (no persist —
  * demonstrates the pushdown double-eval). Variants run round-robin so
  * host-noise windows hit all three equally; report minima.
  *
  * Usage: jrun graft.tools.PplOnly <s1Dir> <workDir> [reps]
  */
object PplOnly {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PplOnly <s1Dir> <workDir> [reps]")
    val Array(s1Dir, workDir) = args.take(2)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val maxXent = 12.0
    val minXent = 0.05

    def gate(df: DataFrame): DataFrame =
      df.withColumn("drop_reason",
        when(col("xent") > maxXent, lit("high_perplexity"))
          .when(col("xent") < minXent, lit("low_perplexity")))

    def writes(tag: String, gated: DataFrame): Unit = {
      gated.filter(col("drop_reason").isNotNull)
        .write.mode("overwrite").parquet(s"$workDir/rej_$tag")
      gated.filter(col("drop_reason").isNull).drop("drop_reason")
        .write.mode("overwrite").parquet(s"$workDir/keep_$tag")
    }

    def joinShape(): Unit = {
      val in = spark.read.parquet(s1Dir)
      val xent = QualityModel.unigramCrossEntropy(in, "doc_id", "text")
        .select(col("doc_id"), col("xent"))
      writes("join", gate(in.join(xent, Seq("doc_id"), "left")))
    }
    def inlinePersist(): Unit = {
      val in = spark.read.parquet(s1Dir)
      val gated = gate(QualityModel.withUnigramXent(in, "doc_id", "text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      try writes("persist", gated) finally gated.unpersist()
    }
    def inlineNaive(): Unit = {
      val in = spark.read.parquet(s1Dir)
      writes("naive", gate(QualityModel.withUnigramXent(in, "doc_id", "text")))
    }

    val variants = Seq("join" -> (joinShape _), "persist" -> (inlinePersist _),
      "naive" -> (inlineNaive _))
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      variants.foreach { case (tag, f) =>
        val t0 = System.nanoTime()
        f()
        times(tag) = times(tag) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    val rows = Seq("join", "persist", "naive").map { t =>
      val keep = spark.read.parquet(s"$workDir/keep_$t").count()
      s""""${t}_keep":$keep"""
    }.mkString(",")
    def fmt(t: String) = times(t).map(x => f"$x%.2f").mkString("[", ",", "]")
    println(s"""{"s1":"$s1Dir","join_sec":${fmt("join")},""" +
      s""""persist_sec":${fmt("persist")},"naive_sec":${fmt("naive")},""" +
      s""""join_min":${f"${times("join").min}%.2f"},""" +
      s""""persist_min":${f"${times("persist").min}%.2f"},""" +
      s""""naive_min":${f"${times("naive").min}%.2f"},$rows}""")
    spark.stop()
  }
}
