package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Batch-versioned lake directories with commit markers — the shared
  * mechanics of the "state in the lake, not the state store" streaming
  * family ([[StreamScd2]] S10, [[StreamDedupAdmit]] S17,
  * [[StreamSketch]] S19): each micro-batch publishes `b<batchId>` with a
  * `_GRAFT_COMMIT` marker written AFTER the data, so at-least-once
  * `foreachBatch` replays detect their committed version and skip
  * (exactly-once effects), and torn writes are invisible to readers. */
object VersionedStore {

  val Commit = "_GRAFT_COMMIT"

  def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version directories, oldest → newest. */
  def committedVersions(spark: SparkSession, baseDir: String): Seq[Path] = {
    val dir = new Path(baseDir)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("b\\d{12}") &&
        f.exists(new Path(s.getPath, Commit)))
      .map(_.getPath).sortBy(_.getName)
  }

  /** Target dir for a batch id. */
  def versionDir(baseDir: String, batchId: Long): Path =
    new Path(new Path(baseDir), f"b$batchId%012d")

  /** True if this batch already committed (a replay — skip the work). */
  def isCommitted(spark: SparkSession, baseDir: String, batchId: Long): Boolean = {
    val target = versionDir(baseDir, batchId)
    fs(spark, target).exists(new Path(target, Commit))
  }

  /** Run `write(target)` then drop the commit marker. Deletes any torn
    * earlier attempt first. */
  def publish(spark: SparkSession, baseDir: String, batchId: Long)
             (write: Path => Unit): Unit = {
    val target = versionDir(baseDir, batchId)
    val f = fs(spark, target)
    if (f.exists(target)) f.delete(target, true)
    write(target)
    f.create(new Path(target, Commit), true).close()
  }
}
