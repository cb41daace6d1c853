package graft.sinks

import java.io.{BufferedInputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import scala.jdk.CollectionConverters._

/** Output archiving, the reference's `organize_and_compress_output`
  * (`/root/reference/src/compressor.py:90-120`): zip a day folder and
  * remove the workdir. Driver-side by design — it packages final small
  * exports, never dataset-scale files. */
object Archiver {

  /** Zip `dir` (recursively, relative paths) into `zipPath`; optionally
    * delete the source dir afterwards. Returns the number of entries. */
  def zipDirectory(dir: String, zipPath: String, removeSource: Boolean = false): Int = {
    val root = Paths.get(dir)
    require(Files.isDirectory(root), s"$dir is not a directory")
    // Files.walk requires try-with-resources — close after materializing.
    val files = scala.util.Using.resource(Files.walk(root)) { w =>
      w.iterator().asScala.filter(Files.isRegularFile(_)).toList
    }
    val zos = new ZipOutputStream(new FileOutputStream(zipPath))
    try {
      files.foreach { f =>
        zos.putNextEntry(new ZipEntry(root.relativize(f).toString))
        val in = new BufferedInputStream(new FileInputStream(f.toFile))
        try in.transferTo(zos) finally in.close()
        zos.closeEntry()
      }
    } finally zos.close()
    if (removeSource) deleteRecursively(root)
    files.size
  }

  private def deleteRecursively(p: Path): Unit = {
    val all = scala.util.Using.resource(Files.walk(p))(_.iterator().asScala.toList)
    all.reverse.foreach(Files.deleteIfExists(_))
  }
}
