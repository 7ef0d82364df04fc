package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Steady-state measurement of the streaming corpus-curation loop
  * ([[graft.streaming.StreamingIngest.curateStream]]): N fixed-size
  * micro-batches drain through the REAL file-source stream
  * (`maxFilesPerTrigger=1`, AvailableNow), and every batch's wall time is
  * captured from the StreamingQueryListener's progress events — the
  * O(batch) claim ("per-batch cost depends on batch size, never on
  * accumulated index size") as a measured flat line instead of a spec
  * assertion. The near-dup index grows by ~batchRows every batch; if the
  * probe were index-vs-index, per-batch time would trend UP linearly —
  * the artifact shows whether it does.
  *
  * Batch corpus: GenScaleData's documents generator sliced into
  * contiguous id ranges (one parquet file per batch), so content, dup
  * rate (~0.2% adjacent replays) and length distribution are identical
  * across batches — any wall-time drift is the loop, not the data.
  *
  * Usage: jrun graft.tools.CurateSteadyState <workDir> <nBatches> <batchRows> [<outJson>]
  */
object CurateSteadyState {

  private final class ProgressCapture extends StreamingQueryListener {
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      // triggerExecution spans the whole foreachBatch body (all sinks)
      val ms = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(-1L)
      batches.add((p.batchId, ms, p.numInputRows))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: CurateSteadyState <workDir> <nBatches> <batchRows> [<outJson>]")
    val workDir = args(0)
    val nBatches = args(1).toInt
    val batchRows = args(2).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one single-file parquet per batch: contiguous GenScaleData id slices
    val incoming = s"$workDir/incoming"
    val all = GenScaleData.documents(spark, nBatches * batchRows)
    (0 until nBatches).foreach { b =>
      all.filter(col("doc_id") >= b * batchRows &&
          col("doc_id") < (b + 1) * batchRows)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$workDir/stage_b$b")
      // move the part file in under a stable name so the file source sees
      // exactly one new file per batch, in id order
      val part = new java.io.File(s"$workDir/stage_b$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(f"$incoming/batch_$b%04d.parquet")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    val capture = new ProgressCapture
    spark.streams.addListener(capture)
    val stream = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val indexPath = s"$workDir/index"
    val q = graft.streaming.StreamingIngest.curateStream(spark, stream,
      "doc_id", "text", indexPath, s"$workDir/curated", s"$workDir/rejects",
      s"$workDir/ckpt")
    q.awaitTermination()
    Thread.sleep(2000) // let the last progress event drain the listener bus
    spark.streams.removeListener(capture)

    // index size after each batch: the index partitions by batch_id, so
    // the cumulative row count per batch is a metadata-cheap group-by
    // partition-column inference reads batch_id back as int — go through
    // Number rather than assuming the written long survived
    val perBatch = spark.read.parquet(indexPath)
      .groupBy("batch_id").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.get(0).asInstanceOf[Number].longValue -> r.getLong(1)).toMap
    import scala.jdk.CollectionConverters._
    val rows = capture.batches.asScala.toSeq.sortBy(_._1)
    var cum = 0L
    val entries = rows.map { case (bid, ms, inRows) =>
      cum += perBatch.getOrElse(bid, 0L)
      s"""{"batch_id":$bid,"wall_ms":$ms,"input_rows":$inRows,"index_rows_after":$cum}"""
    }
    // drift fit: least-squares slope of wall_ms over batch_id, batches
    // 3+ (first batches carry JIT/codegen warm-up)
    val steady = rows.drop(3).filter(_._2 >= 0)
    val drift =
      if (steady.size < 2) 0.0
      else {
        val xs = steady.map(_._1.toDouble); val ys = steady.map(_._2.toDouble)
        val mx = xs.sum / xs.size; val my = ys.sum / ys.size
        xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
          math.max(1e-9, xs.map(x => (x - mx) * (x - mx)).sum)
      }
    def f(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val line = s"""{"n_batches":$nBatches,"batch_rows":$batchRows,""" +
      s""""drift_ms_per_batch":${f(drift)},"batches":[${entries.mkString(",")}]}"""
    args.lift(3).foreach { out =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    }
    println(line)
    spark.stop()
  }
}
