package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-versioned lake directories with commit markers — the shared
  * mechanics of the "state in the lake, not the state store" streaming
  * family ([[StreamScd2]] S10, [[StreamDedupAdmit]] S17,
  * [[StreamSketch]] S19): each micro-batch publishes `b<batchId>` with a
  * `_GRAFT_COMMIT` marker written AFTER the data, so at-least-once
  * `foreachBatch` replays detect their committed version and skip
  * (exactly-once effects), and torn writes are invisible to readers.
  *
  * LOG COMPACTION (round-17): sub-stores with LOG semantics (released
  * rows, dead letters, allocations, verdicts — appended per batch,
  * unioned at read) grow one directory per batch for the stream's
  * lifetime — an unbounded small-files walk at production lifetimes.
  * [[compactLogs]] rewrites every committed version EXCEPT the newest
  * into one `c<coveredId>` directory (marker-last, same torn-write
  * discipline as [[publish]]) and [[readLog]] reads compaction +
  * b-versions with id > coveredId, so a crash between the compaction
  * marker and the covered-directory deletes can never double-count —
  * superseded directories are excluded BY ID, not by absence, and the
  * next compaction sweeps the stragglers. The newest b-version is never
  * covered: state reads ([[committedVersions]].last) and the
  * at-least-once replay check (`isCommitted` of the one batch Spark can
  * re-run after a crash — the last one, whose own publish committed
  * before the streaming checkpoint did) both stay intact across a
  * compaction at any point. */
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

  /** Numeric id of a `b…`/`c…` version directory. */
  def versionId(p: Path): Long = p.getName.drop(1).toLong

  /** Newest committed compaction directory (`c<coveredId>`), if any. */
  def latestCompaction(spark: SparkSession, baseDir: String): Option[Path] = {
    val dir = new Path(baseDir)
    val f = fs(spark, dir)
    if (!f.exists(dir)) None
    else f.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("c\\d{12}") &&
        f.exists(new Path(s.getPath, Commit)))
      .map(_.getPath).sortBy(_.getName).lastOption
  }

  /** The directories a LOG sub-store reads: the compaction's sub (when
    * present) plus b-versions with id > coveredId. Superseded b-versions
    * are excluded by ID even when a crashed compaction left them on disk
    * — re-reading them would double-count rows the compaction already
    * absorbed. */
  def logDirs(spark: SparkSession, baseDir: String, sub: String): Seq[String] = {
    val comp = latestCompaction(spark, baseDir)
    val covered = comp.map(versionId).getOrElse(-1L)
    val f = fs(spark, new Path(baseDir))
    val compSub = comp.map(new Path(_, sub)).filter(f.exists)
    val live = committedVersions(spark, baseDir)
      .filter(versionId(_) > covered)
      .map(new Path(_, sub)).filter(f.exists)
    (compSub.toSeq ++ live).map(_.toString)
  }

  /** Union of a LOG sub-store across the compaction and live versions;
    * None when nothing has committed rows for it yet. mergeSchema because
    * a log's schema may evolve across versions (the rejects-added-later
    * precedent): a single footer's schema would silently drop columns
    * only newer versions carry. Log directories are small (one file set
    * per micro-batch, bounded by compaction), so the extra footer reads
    * are noise. */
  def readLog(spark: SparkSession, baseDir: String, sub: String): Option[DataFrame] = {
    val dirs = logDirs(spark, baseDir, sub)
    if (dirs.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true").parquet(dirs: _*))
  }

  /** Rewrite every committed version EXCEPT the newest into one
    * compaction directory carrying the unioned `logSubs`. Returns true
    * when a new compaction was published. Safe to call between any two
    * batches (e.g. from the foreachBatch body AFTER applyBatch: the
    * just-committed version is the newest, so it is never covered and
    * the crash-replay check stays intact); idempotent — a re-run with
    * nothing new only sweeps directories a previous pass superseded.
    *
    * READER GRACE (round-17 advice): a pass deletes only directories the
    * PREVIOUS pass already superseded (b ≤ prevCovered, c < prevCovered)
    * — never the set it supersedes itself. A concurrent reader (a
    * monitor calling readLog while the sink compacts) that resolved
    * [[logDirs]] just before this pass's marker commit holds exactly
    * {c_prev} ∪ b(prevCovered, newest]; all of it survives the pass, so
    * the listing-to-open race can't hit FileNotFoundException. The
    * just-superseded directories are swept by the NEXT pass (or the next
    * no-op call), so disk stays bounded at ≤ two compaction intervals of
    * versions. Readers are correct either way: superseded directories
    * are excluded BY ID, not by absence. State sub-stores of covered
    * versions are superseded by the newest version's and are dropped on
    * the same schedule. */
  def compactLogs(spark: SparkSession, baseDir: String,
                  logSubs: Seq[String]): Boolean = {
    val f = fs(spark, new Path(baseDir))
    val prev = latestCompaction(spark, baseDir)
    val prevCovered = prev.map(versionId).getOrElse(-1L)
    def sweep(coveredId: Long): Unit = {
      committedVersions(spark, baseDir)
        .filter(versionId(_) <= coveredId).foreach(f.delete(_, true))
      // straggler c-dirs older than the winning one (crash between a
      // compaction's marker and its deletes, then another compaction)
      if (!f.exists(new Path(baseDir))) return
      f.listStatus(new Path(baseDir)).toSeq
        .filter(s => s.getPath.getName.matches("c\\d{12}") &&
          versionId(s.getPath) < coveredId)
        .foreach(s => f.delete(s.getPath, true))
    }
    val versions = committedVersions(spark, baseDir)
    val coveredId = if (versions.size < 2) -1L else versionId(versions.init.last)
    if (coveredId <= prevCovered) { sweep(prevCovered); return false }
    val covered = versions.init.filter(versionId(_) > prevCovered)
    val target = new Path(new Path(baseDir), f"c$coveredId%012d")
    if (f.exists(target)) f.delete(target, true) // torn earlier attempt
    logSubs.foreach { sub =>
      val srcs = (prev.map(new Path(_, sub)).toSeq ++ covered.map(new Path(_, sub)))
        .filter(f.exists).map(_.toString)
      // mergeSchema: the rewrite is PERMANENT (sources are later swept) —
      // taking one file's footer schema would silently drop columns only
      // newer versions carry (round-17 advice; the rejects-added-later
      // schema-evolution precedent).
      if (srcs.nonEmpty)
        spark.read.option("mergeSchema", "true").parquet(srcs: _*)
          .write.parquet(new Path(target, sub).toString)
    }
    f.create(new Path(target, Commit), true).close()
    // Grace sweep: only what the PREVIOUS pass superseded (see scaladoc).
    sweep(prevCovered)
    true
  }
}
