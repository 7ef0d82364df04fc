package graft.tools

import graft.{Graft, SparkEntry}

/** Dev tool: re-times selected queries N times in one JVM so real cost
  * separates from machine noise (single Bench runs vary ±25% here). */
object BenchRepeat {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q44_embed_neardup", "q39_dedup_jaccard", "q40_dedup_minhash",
        "q19_star_join", "q13_dedup_keep_first", "q21_window_topk")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = Graft.session("graft-bench-repeat")
    spark.sparkContext.setLogLevel("WARN")
    // same harness as Bench: production (benchQueries) config, noop-sink
    // materialization so sorts/projections are billed
    def exec(n: String): Unit = SparkEntry.benchQueries(n)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    // warm-up at the target sf (JIT + page cache)
    names.foreach(exec)
    names.foreach { n =>
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        exec(n)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[rep] $n%-24s min=${ts.min}%6.2f med=${ts.sorted.apply(reps / 2)}%6.2f max=${ts.max}%6.2f")
    }
    spark.stop()
  }
}
