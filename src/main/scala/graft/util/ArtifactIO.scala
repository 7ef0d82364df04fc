package graft.util

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, IntegerType, LongType, StringType}

/** DRIVER-LOCAL parquet reads for ENGINE-WRITTEN artifacts (frozen LMs,
  * tokenizers, retrieval-index metas/centroids): every declared schema
  * here mirrors the writer in the same file. The r17 job-count profile
  * (tools/QueryStats + LifecycleProbe) measured one Spark job per
  * artifact read — schema inference was eliminated in r17 by explicit
  * schemas, and r18 removes the remaining collect round-trip: these
  * tables are driver-sized by construction (every caller collects them
  * anyway), so they are read in-process via parquet-hadoop, zero Spark
  * jobs. Layout-DETECTING loads (loadLm's lm_order probe,
  * UnigramLm.load's word_model presence check) key on [[localColumns]]:
  * the column set is the information, and the footer already holds it.
  *
  * Declared types must match the writer exactly (the reader refuses
  * silent int32→int64 widening), which is itself a guard: a foreign
  * file in an artifact slot fails at read, not as garbage rows. */
object ArtifactIO {
  private def hadoopConf(spark: SparkSession) =
    spark.sparkContext.hadoopConfiguration

  /** All parquet part files under `path` (recursive — covers both flat
    * artifact dirs and partitioned ones like `bm25_meta_parts/batch_id=N`),
    * name-sorted so multi-file reads are deterministic (part file names
    * carry the writer task id, so name order IS the frame's task order).
    * A `path` that is itself a single parquet FILE (the testdata layout)
    * is returned as-is. */
  private def partFiles(fs: FileSystem, root: Path): Seq[Path] = {
    if (fs.getFileStatus(root).isFile) return Seq(root)
    val buf = ArrayBuffer.empty[Path]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.startsWith("part-")) buf += p
    }
    buf.sortBy(_.toString).toSeq
  }

  /** DRIVER-LOCAL read of an ENGINE-WRITTEN artifact table: the same
    * rows `readParquet(...).select(fields).collect()` returns, with ZERO
    * Spark jobs — artifact metas / centroid lists / frozen-LM count
    * tables are driver-sized by construction (every caller collects them
    * anyway), yet each Spark-side read was paying a full job launch +
    * task round-trip to move a handful of rows (the r17/r18 QueryStats
    * profile: lifecycle queries spent most of their wall on exactly
    * these tiny jobs; at cluster scale each is a scheduler barrier and
    * an executor round-trip for driver-bound data). Reads the parquet
    * footers + pages in-process via parquet-hadoop — the Delta-log
    * discipline: an engine reads its own driver-sized metadata directly.
    *
    * Supported field types: int, long, double, boolean, string, and
    * arrays of long/string — the full artifact-schema inventory. A
    * missing column or a physically different type fails LOUDLY with
    * the path and field named (the explicit-schema guard, kept). */
  def readLocal(spark: SparkSession, path: String,
                fields: (String, DataType)*): Seq[Row] = {
    val conf = hadoopConf(spark)
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(fs.exists(root), s"artifact path $path does not exist")
    val out = ArrayBuffer.empty[Row]
    partFiles(fs, root).foreach { file =>
      val reader = ParquetReader.builder(new GroupReadSupport(), file)
        .withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          out += Row.fromSeq(fields.map { case (n, t) =>
            readField(g, n, t, file.toString)
          })
          g = reader.read()
        }
      } finally reader.close()
    }
    out.toSeq
  }

  private def readField(g: Group, name: String, t: DataType,
                        file: String): Any = {
    require(g.getType.containsField(name),
      s"artifact file $file has no column '$name' " +
        s"(columns: ${fieldNames(g).mkString(", ")})")
    if (g.getFieldRepetitionCount(name) == 0) return null
    try t match {
      case IntegerType => g.getInteger(name, 0)
      case LongType    => g.getLong(name, 0)
      case DoubleType  => g.getDouble(name, 0)
      case BooleanType => g.getBoolean(name, 0)
      case StringType  => g.getString(name, 0)
      case ArrayType(et, _) =>
        // Spark's parquet LIST encoding: optional group <name> (LIST)
        // { repeated group list { optional <et> element } } — an empty
        // array is a present outer group with zero `list` repetitions
        val outer = g.getGroup(name, 0)
        val n = outer.getFieldRepetitionCount("list")
        Seq.tabulate(n) { i =>
          val el = outer.getGroup("list", i)
          if (el.getFieldRepetitionCount("element") == 0) null
          else et match {
            case LongType    => el.getLong("element", 0)
            case IntegerType => el.getInteger("element", 0)
            case StringType  => el.getString("element", 0)
            case other => throw new IllegalArgumentException(
              s"ArtifactIO.readLocal: unsupported array element type $other")
          }
        }
      case other => throw new IllegalArgumentException(
        s"ArtifactIO.readLocal: unsupported field type $other")
    } catch {
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.startsWith("ArtifactIO.readLocal") => throw e
      case e: RuntimeException =>
        throw new IllegalStateException(
          s"artifact file $file column '$name' cannot be read as " +
            s"${t.simpleString} — a foreign file in an artifact slot? " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage})", e)
    }
  }

  private def fieldNames(g: Group): Seq[String] = {
    import scala.jdk.CollectionConverters._
    g.getType.getFields.asScala.map(_.getName).toSeq
  }

  /** The column names of an artifact table, from the parquet FOOTER of
    * its first part file — zero Spark jobs. This is the layout-detection
    * primitive (loadLm's lm_order probe, UnigramLm.load's word_model
    * presence check): the column SET is the information those loads
    * previously paid a schema-inference job to learn. */
  def localColumns(spark: SparkSession, path: String): Seq[String] = {
    val conf = hadoopConf(spark)
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(fs.exists(root), s"artifact path $path does not exist")
    val files = partFiles(fs, root)
    require(files.nonEmpty, s"artifact path $path has no parquet part files")
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(files.head, conf))
    try {
      import scala.jdk.CollectionConverters._
      r.getFooter.getFileMetaData.getSchema.getFields.asScala
        .map(_.getName).toSeq
    } finally r.close()
  }

  /** EXACT row count of a parquet table from its footers — zero Spark
    * jobs, zero data pages read (the row count is block metadata parquet
    * writers record; `spark.sql.parquet.aggregatePushDown` serves
    * unfiltered COUNTs the same way, but flipping that moves every scan
    * to DSv2 planning — this helper applies the same idea ONLY where an
    * unfiltered whole-table count is what's asked). */
  def footerRowCount(spark: SparkSession, path: String): Long = {
    val conf = hadoopConf(spark)
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(fs.exists(root), s"parquet path $path does not exist")
    partFiles(fs, root).iterator.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }
}
