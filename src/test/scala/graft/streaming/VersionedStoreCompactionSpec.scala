package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Log compaction over the versioned store (round-16 verdict task 4: the
  * released/dead-letter unions walked EVERY committed version directory —
  * unbounded small-files growth over a production stream's lifetime).
  * Pins: read-equivalence across a compaction, replay safety, crash
  * recovery (marker present, deletes lost), and compaction-of-compaction.
  * Driven through the REAL StreamNetting batches so the equivalence is
  * the operator's, not a synthetic store's. */
class VersionedStoreCompactionSpec extends SparkSpec {
  import ss.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_cmp_").toString

  private def payDf(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("cust", "pid", "t0", "amt")
      .select(col("cust"), col("pid"), col("t0").cast("timestamp").as("ts"), col("amt"))

  private val DAY = 86400L

  private def apply1(base: String, rows: Seq[(Long, Long, String, Double)],
                     batchId: Long): DataFrame =
    StreamNetting.applyBatch(payDf(rows), col("cust"), col("pid"), col("ts"),
      col("amt"), DAY, base, batchId)

  private def released(base: String) =
    StreamNetting.readReleased(ss, base).get
      .select("key", "id", "net_cents").as[(Long, Long, Long)].collect().toSet
  private def deadLetters(base: String) =
    StreamNetting.readDeadLetters(ss, base).fold(Set.empty[(Long, Long)])(
      _.select("id", "cents").as[(Long, Long)].collect().toSet)

  private def dirNames(base: String): Seq[String] = {
    val p = new Path(base)
    val f = VersionedStore.fs(ss, p)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath.getName).sorted
  }

  /** Four netting batches: cash, a netting refund, a dead-lettering
    * refund past its window, and a far-future clock advance. */
  private def drive(base: String): Unit = {
    apply1(base, Seq((1L, 1L, "2024-01-01 00:00:00", 100.00),
      (1L, 2L, "2024-01-02 00:00:00", 50.00)), 0L)
    apply1(base, Seq((1L, 3L, "2024-01-02 06:00:00", -120.00)), 1L)
    apply1(base, Seq((2L, 4L, "2024-01-05 00:00:00", -30.00)), 2L)
    apply1(base, Seq((1L, 9L, "2024-02-20 00:00:00", 0.00),
      (2L, 8L, "2024-02-20 00:00:00", 0.00)), 3L)
  }

  test("compaction is read-equivalent and collapses the version walk to two directories") {
    val base = tmp()
    drive(base)
    val (relBefore, dlBefore) = (released(base), deadLetters(base))
    assert(relBefore.nonEmpty && dlBefore.nonEmpty, "the drive must exercise both logs")
    assert(dirNames(base) == Seq("b000000000000", "b000000000001",
      "b000000000002", "b000000000003"))

    assert(StreamNetting.compact(ss, base), "a 4-version store must compact")
    assert(released(base) == relBefore, "released log read-equivalent")
    assert(deadLetters(base) == dlBefore, "dead-letter log read-equivalent")
    // READER GRACE (round-17 advice): the pass that publishes c0002 keeps
    // the directories it just superseded — a concurrent reader that
    // resolved logDirs a moment earlier still opens them — but the READ
    // walk is already collapsed: compaction + newest only.
    assert(dirNames(base) == Seq("b000000000000", "b000000000001",
      "b000000000002", "b000000000003", "c000000000002"),
      s"just-superseded versions graced for in-flight readers: ${dirNames(base)}")
    assert(VersionedStore.logDirs(ss, base, "released").size == 2,
      "read walk is compaction + newest, graced dirs excluded by id")
    // the NEXT pass (here a no-op call) sweeps the graced directories
    assert(!StreamNetting.compact(ss, base), "nothing new to cover")
    assert(dirNames(base) == Seq("b000000000003", "c000000000002"),
      s"graced versions swept by the following pass: ${dirNames(base)}")
    assert(released(base) == relBefore && deadLetters(base) == dlBefore)
    // state reads still land on the newest version
    assert(VersionedStore.committedVersions(ss, base).map(_.getName)
      == Seq("b000000000003"))
  }

  test("single-version and freshly-compacted stores are a no-op (idempotent)") {
    val base = tmp()
    apply1(base, Seq((1L, 1L, "2024-01-01 00:00:00", 5.00)), 0L)
    assert(!StreamNetting.compact(ss, base), "one version: nothing to cover")
    apply1(base, Seq((1L, 2L, "2024-01-09 00:00:00", 1.00)), 1L)
    assert(StreamNetting.compact(ss, base))
    val rel = released(base)
    // first no-op call sweeps what the real pass graced, data unchanged
    assert(!StreamNetting.compact(ss, base), "nothing new to cover")
    assert(released(base) == rel, "no-op sweep changes no data")
    val snap = (released(base), dirNames(base))
    assert(!StreamNetting.compact(ss, base), "still nothing to cover")
    assert((released(base), dirNames(base)) == snap, "steady state: re-run changes nothing")
  }

  test("replay of the newest batch after a compaction is still a committed no-op") {
    val base = tmp()
    apply1(base, Seq((1L, 1L, "2024-01-01 00:00:00", 50.00)), 0L)
    val first = apply1(base, Seq((1L, 2L, "2024-01-10 00:00:00", 5.00)), 1L)
      .select("id", "net_cents").as[(Long, Long)].collect().toSet
    assert(StreamNetting.compact(ss, base))
    // the at-least-once crash window: Spark re-runs the LAST batch whose
    // checkpoint didn't commit — its version is the newest, never covered
    val replay = apply1(base, Seq((1L, 2L, "2024-01-10 00:00:00", 5.00)), 1L)
      .select("id", "net_cents").as[(Long, Long)].collect().toSet
    assert(replay == first && first == Set((1L, 5000L)))
    assert(released(base).count(_._2 == 1L) == 1, "no double-append across compaction")
    // and the stream continues: a post-compaction batch appends normally
    apply1(base, Seq((1L, 5L, "2024-03-01 00:00:00", 7.00)), 2L)
    apply1(base, Seq((1L, 6L, "2024-04-01 00:00:00", 0.00)), 3L)
    assert(released(base).contains((1L, 5L, 700L)),
      "post-compaction rows union with the compacted log")
  }

  test("crash between the compaction marker and the deletes cannot double-count") {
    val base = tmp()
    drive(base)
    val (relBefore, dlBefore) = (released(base), deadLetters(base))
    // snapshot a covered version; compact (grace keeps it); let the next
    // pass sweep it; then restore it — the on-disk state a crash between
    // a sweeping pass's start and its deletes leaves behind
    val src = java.nio.file.Paths.get(base, "b000000000001")
    val bak = java.nio.file.Paths.get(tmp(), "b000000000001")
    copyTree(src, bak)
    assert(StreamNetting.compact(ss, base))
    assert(dirNames(base).contains("b000000000001"),
      "grace: the publishing pass keeps what it just superseded")
    assert(!StreamNetting.compact(ss, base), "sweep pass covers nothing new")
    assert(!dirNames(base).contains("b000000000001"), "then the sweep lands")
    copyTree(bak, src)
    assert(dirNames(base).contains("b000000000001"), "straggler restored")
    assert(released(base) == relBefore && deadLetters(base) == dlBefore,
      "superseded versions are excluded by id, not by absence")
    // a later pass sweeps the straggler without re-absorbing it
    assert(!StreamNetting.compact(ss, base), "nothing new to cover")
    assert(!dirNames(base).contains("b000000000001"), "straggler swept")
    assert(released(base) == relBefore && deadLetters(base) == dlBefore)
  }

  test("compaction of a compaction: logs stay exact across two passes") {
    val base = tmp()
    drive(base)
    assert(StreamNetting.compact(ss, base))
    apply1(base, Seq((1L, 20L, "2024-03-01 00:00:00", 9.00)), 4L)
    apply1(base, Seq((1L, 21L, "2024-04-01 00:00:00", 0.00)), 5L)
    val (rel, dl) = (released(base), deadLetters(base))
    assert(rel.contains((1L, 20L, 900L)))
    assert(StreamNetting.compact(ss, base), "new versions to cover")
    assert(released(base) == rel && deadLetters(base) == dl)
    // the second pass absorbed c0002 into c0004 but graces it (a reader
    // in flight during the pass still holds it); its sweep deleted only
    // what the FIRST pass superseded (b0000-b0002)
    assert(dirNames(base) == Seq("b000000000003", "b000000000004",
      "b000000000005", "c000000000002", "c000000000004"),
      s"old compaction graced, first pass's covered set swept: ${dirNames(base)}")
    assert(!StreamNetting.compact(ss, base), "sweep pass")
    assert(dirNames(base) == Seq("b000000000005", "c000000000004"),
      s"old compaction absorbed and deleted: ${dirNames(base)}")
    assert(released(base) == rel && deadLetters(base) == dl)
  }

  test("a log sub-store absent from covered versions stays readable (rejects precedent)") {
    val base = tmp()
    // StreamAbTest's verdicts exist in every version; drive it as the
    // second consumer to prove the shared path isn't netting-specific
    def batch(rows: Seq[(String, Int)], id: Long): Unit =
      StreamAbTest.applyBatch(rows.toDF("v", "s"), col("v"), col("s"), base, id)
    batch(Seq(("a", 1), ("b", 0)), 0L)
    batch(Seq(("a", 0), ("b", 1)), 1L)
    batch(Seq(("a", 1), ("b", 1)), 2L)
    val before = StreamAbTest.verdictsAll(ss, base).get.count()
    assert(before == 3, "one verdict row per batch")
    assert(StreamAbTest.compact(ss, base))
    assert(StreamAbTest.verdictsAll(ss, base).get.count() == before)
    assert(StreamAbTest.readLatestArms(ss, base).nonEmpty,
      "state (latest arms) survives on the kept newest version")
  }

  test("60-batch drive: directory count stays bounded across six compactions (r18 task)") {
    // The production-lifetime claim, asserted not narrated: with
    // compactEvery = 10, the store's directory count is bounded by
    // 2·compactEvery + 3 at every point in a 60-batch stream (graced
    // dirs from the previous interval + live dirs + two c-dirs), and
    // returns to ≤ compactEvery + 3 right after each pass — flat
    // forever, not merely slower-growing. Driven through StreamAbTest
    // (one verdict row per batch) so the read walk stays exact too.
    val base = tmp()
    val every = 10
    var worstEver = 0
    (0 until 60).foreach { i =>
      StreamAbTest.applyBatch(
        Seq(("a", (i % 2).toInt), ("b", ((i + 1) % 2).toInt)).toDF("v", "s"),
        col("v"), col("s"), base, i.toLong)
      worstEver = math.max(worstEver, dirNames(base).size)
      if ((i + 1) % every == 0) {
        StreamAbTest.compact(ss, base): Unit
        assert(dirNames(base).size <= 2 * every + 3,
          s"post-compaction bound blown at batch $i: ${dirNames(base)}")
      }
      assert(dirNames(base).size <= 2 * every + 3,
        s"directory bound blown at batch $i: ${dirNames(base)}")
      // the read walk never exceeds one c-dir + the live interval
      assert(VersionedStore.logDirs(ss, base, "verdicts").size <= every + 1,
        s"read walk grew at batch $i")
    }
    assert(worstEver <= 2 * every + 3, s"lifetime worst $worstEver")
    // read equivalence across all six compactions: one verdict per batch
    assert(StreamAbTest.verdictsAll(ss, base).get.count() == 60)
    // replay spanning the last compaction boundary stays a committed no-op
    StreamAbTest.applyBatch(Seq(("a", 1), ("b", 0)).toDF("v", "s"),
      col("v"), col("s"), base, 59L)
    assert(StreamAbTest.verdictsAll(ss, base).get.count() == 60,
      "replayed batch must not double-append across a compaction")
    assert(StreamAbTest.readLatestArms(ss, base).nonEmpty)
  }

  private def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    scala.util.Using.resource(Files.walk(from)) { s =>
      s.iterator().forEachRemaining { p =>
        val t = to.resolve(from.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else {
          Files.createDirectories(t.getParent)
          Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
  }
}
