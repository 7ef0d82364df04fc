package graft.maintenance

import java.io.{BufferedInputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import scala.jdk.CollectionConverters._

/** K6 archive sink (SURVEY.md §2.2; reference: 06_master_data_archiver.py:44-77,
  * 04_performance_archiver.py:42-76): zip a completed stage directory for
  * traceability, then purge the source. A filesystem lifecycle op, not a
  * relational one — on a Delta/iceberg warehouse, time travel replaces it.
  */
object Archive {

  /** Zips `srcDir` (recursively) to `zipPath`; deletes the source tree when
    * `purge`. Returns the number of files archived. */
  def zipAndPurge(srcDir: String, zipPath: String, purge: Boolean = true): Int = {
    val src = Paths.get(srcDir)
    require(Files.isDirectory(src), s"not a directory: $srcDir")
    Files.createDirectories(Paths.get(zipPath).getParent)
    val zos = new ZipOutputStream(new FileOutputStream(zipPath))
    var n = 0
    try {
      val files = Files.walk(src).iterator().asScala
        .filter(Files.isRegularFile(_)).toSeq.sortBy(_.toString)
      files.foreach { f =>
        zos.putNextEntry(new ZipEntry(src.relativize(f).toString))
        val in = new BufferedInputStream(new FileInputStream(f.toFile))
        try {
          val buf = new Array[Byte](64 * 1024)
          Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
            .foreach(r => if (r > 0) zos.write(buf, 0, r))
        } finally in.close()
        zos.closeEntry()
        n += 1
      }
    } finally zos.close()
    if (purge) deleteRecursively(src)
    n
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
