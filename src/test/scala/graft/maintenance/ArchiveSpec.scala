package graft.maintenance

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

class ArchiveSpec extends AnyFunSuite {
  test("zipAndPurge archives all files and removes the source tree") {
    val src = Files.createTempDirectory("arch_src")
    Files.createDirectories(src.resolve("sub"))
    Files.writeString(src.resolve("a.csv"), "x,y\n1,2\n")
    Files.writeString(src.resolve("sub/b.csv"), "z\n3\n")
    val zip = src.getParent.resolve("out/archive.zip").toString

    val n = Archive.zipAndPurge(src.toString, zip)
    assert(n == 2)
    assert(!Files.exists(src))
    val zf = new ZipFile(zip)
    try {
      val names = zf.entries().asScala.map(_.getName).toSet
      assert(names == Set("a.csv", "sub/b.csv"))
      val content = new String(zf.getInputStream(zf.getEntry("a.csv")).readAllBytes())
      assert(content == "x,y\n1,2\n")
    } finally zf.close()
  }
}
