package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.QualityModel

/** One-off A/B: q112 phase attribution — feature-frame build (epochs=0
  * trainer run), the fused epoch loop (epochs=3 minus that), and the
  * whole-corpus margin scoring scan, timed separately at a given sf dir
  * (the r15 follow-through on the r14 verdict's q112 task: the trainer
  * fusion landed; this measures what remains). */
object LangAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val labeled = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"),
        TextFns.langPredict(col("text")).as("lang"))

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def train(epochs: Int) = QualityModel.trainLangId(labeled, "doc_id",
      "text", "lang", Seq("en", "es", "de"), bits = 8, seed = "graft-q112",
      epochs = epochs, lrMyriad = 20000L, charN = 3)

    val model = train(3) // warm + the scoring model
    def score(): Unit = docs.select(col("doc_id"),
        QualityModel.langMargins(col("text"), model).as("__m"))
      .select(col("doc_id"), col("__m.n").as("n"), col("__m.ws_en").as("e"))
      .write.format("noop").mode("overwrite").save()
    score() // warm

    // the full q112 output shape: every margin field + argmax + sort
    def scoreFull(): Unit = docs.select(col("doc_id"),
        QualityModel.langMargins(col("text"), model).as("__m"))
      .select(col("doc_id"),
        col("__m.n").cast("int").as("n_feats"),
        col("__m.ws_en").as("ws_en"),
        col("__m.ws_es").as("ws_es"),
        col("__m.ws_de").as("ws_de"))
      .withColumn("lang_pred",
        when(col("ws_en") >= col("ws_es") && col("ws_en") >= col("ws_de"),
          lit("en"))
          .when(col("ws_es") >= col("ws_de"), lit("es"))
          .otherwise(lit("de")))
      .orderBy(col("doc_id"))
      .write.format("noop").mode("overwrite").save()
    scoreFull() // warm

    val tFeat = (1 to reps).map(_ => time(train(0))._2).min
    val tTrain = (1 to reps).map(_ => time(train(3))._2).min
    val tScore = (1 to reps).map(_ => time(score())._2).min
    val tFull = (1 to reps).map(_ => time(scoreFull())._2).min
    println(f"[langab] dir=$dir feat_build=$tFeat%.2f " +
      f"train3=$tTrain%.2f epochs=${tTrain - tFeat}%.2f score=$tScore%.2f " +
      f"score_full=$tFull%.2f")
    spark.stop()
  }
}
