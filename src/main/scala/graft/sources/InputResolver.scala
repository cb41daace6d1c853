package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Newest-file-by-pattern resolution, the reference's `_find_latest_file`
  * (`/root/reference/src/data_loader.py:12-25`), against any Hadoop-visible
  * filesystem (local, HDFS, object stores) — driver-side metadata only,
  * never lists file contents. */
object InputResolver {

  /** Latest (by modification time) path matching `glob` under `dir`;
    * None when nothing matches and `optional`, error otherwise. */
  def findLatest(spark: SparkSession, dir: String, glob: String, optional: Boolean = false): Option[String] = {
    val p = new Path(dir, glob)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(p)).getOrElse(Array.empty)
    if (matches.isEmpty) {
      if (optional) None
      else throw new java.io.FileNotFoundException(s"no critical input matches '$glob' in $dir")
    } else Some(matches.maxBy(_.getModificationTime).getPath.toString)
  }
}
