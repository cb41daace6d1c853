package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver stdout contract: the harness parses the bench JSON out
  * of the last 2000 chars of stdout, so the rendered line must stay well
  * under that as queries are added (round 6 shipped an unparseable bench
  * when the 75-query line crossed 2000 chars). */
class BenchContractSpec extends AnyFunSuite {

  test("worst-case bench line fits the driver's 2000-char stdout tail") {
    // Round-17 lesson: the old qNN keys + 4-char values ("0.39") put 177
    // real queries OVER 2000 — BENCH_r17.json has parsed:null with the
    // tail clipped mid-line; the old worst-case model here (all "999",
    // 3 chars) underestimated the realistic all-sub-10s case. The format
    // is now bare-number keys (lineKey) + ≤3-char values (fmtLine), and
    // THIS test models the true worst value width (3 chars, "9.9"). The
    // worst LINE is all-success + hot: an err entry is strictly shorter
    // than a timing entry, and hot is included here. At 183 queries this
    // reads ~1810; per-entry cost is ~10 chars, so the registry hard-
    // caps near ~198 queries — crossing that needs a further scheme
    // (e.g. base-36 keys), not a precision tweak.
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 9.9)
    val line = Bench.renderLine(results, "/root/testdata/sf0.1", hot = true)
    assert(line.length < 1900, s"bench line ${line.length} chars — driver tail is 2000")
  }

  test("line precision: 0.1 s below 10 s, whole seconds above") {
    assert(Bench.fmtLine(0.391) == "0.4")
    assert(Bench.fmtLine(0.04) == "0.0")
    assert(Bench.fmtLine(9.94) == "9.9")
    assert(Bench.fmtLine(9.96) == "10")
    assert(Bench.fmtLine(12.3456) == "12")
    assert(Bench.fmtLine(999.4) == "999")
  }

  test("line keys drop the q prefix and leading zeros; non-qNN names fall back") {
    assert(Bench.lineKey("q07_segment_flag") == "7")
    assert(Bench.lineKey("q177_robot_slots_roundtrip") == "177")
    assert(Bench.lineKey("q100_prefix_jaccard") == "100")
    assert(Bench.lineKey("warmup_thing") == "warmup")
    assert(Bench.lineKey("q0_x") == "0")
  }

  test("every oracle key names a registered query (no orphaned oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle entries without a query would crash the driver compare: $orphans")
  }

  test("short keys and line keys stay unique across the registry") {
    val keys = SparkEntry.queries.keys.toSeq.map(Bench.shortKey)
    assert(keys.distinct.size == keys.size, "qNN prefixes collide — driver line would drop a query")
    val lkeys = SparkEntry.queries.keys.toSeq.map(Bench.lineKey)
    assert(lkeys.distinct.size == lkeys.size, "line keys collide — driver line would drop a query")
  }

  test("rendered line is valid JSON-shaped and carries the hot flag only when hot") {
    val res = Seq("q01_agg" -> 0.391, "q02_per_key_totals" -> 12.3456)
    val quiet = Bench.renderLine(res, "/root/testdata/sf0.1", hot = false)
    assert(quiet == """{"metric":"total","value":12.74,"unit":"sec","queries":{"1":0.4,"2":12},"sf":"sf0.1","err":[]}""")
    val hot = Bench.renderLine(res, "/root/testdata/sf0.1", hot = true)
    assert(hot.endsWith(""","err":[],"hot":1}"""))
  }

  test("SPARK_GRAFT_BENCH_ONLY selects by short key, line key, or full name; blank runs all") {
    val names = Seq("q01_agg", "q72_bm25", "q76_ivf_multiprobe")
    assert(Bench.selectOnly(None, names) == names)
    assert(Bench.selectOnly(Some("  "), names) == names)
    assert(Bench.selectOnly(Some("q72,q76"), names) == Seq("q72_bm25", "q76_ivf_multiprobe"))
    assert(Bench.selectOnly(Some(" q72_bm25 , q01 "), names) == Seq("q01_agg", "q72_bm25"))
    assert(Bench.selectOnly(Some("72,1"), names) == Seq("q01_agg", "q72_bm25"))
    assert(Bench.selectOnly(Some("q99,bogus"), names) == Nil)
  }

  test("hot and subset captures route away from the quiet local artifact") {
    val base = "/root/repo/BENCH_LOCAL.json"
    assert(Bench.localArtifactPath(base, hot = false, subset = false) == base)
    assert(Bench.localArtifactPath(base, hot = true, subset = false) == "/root/repo/BENCH_LOCAL_HOT.json")
    assert(Bench.localArtifactPath(base, hot = false, subset = true) == "/root/repo/BENCH_LOCAL_SUBSET.json")
    // a hot SUBSET is still a subset — it must not claim the HOT name a
    // full-suite capture would want to compare against
    assert(Bench.localArtifactPath(base, hot = true, subset = true) == "/root/repo/BENCH_LOCAL_SUBSET.json")
    assert(Bench.localArtifactPath("/x/custom", hot = true, subset = false) == "/x/custom_HOT")
  }

  test("waitForQuiet polls until the load drops and caps at the wait budget") {
    // load settles on the 3rd sample: waits 2 polls, reports the quiet load
    val samples = Iterator(9.0, 4.0, 0.4)
    var slept = 0
    val (l1, w1) = Bench.waitForQuiet(300, 15, () => samples.next(), s => slept += s)
    assert(l1 == 0.4 && w1 == 30 && slept == 30)
    // never settles: waits exactly the budget (13 -> polls 10 + 3), stays hot
    var slept2 = 0
    val (l2, w2) = Bench.waitForQuiet(13, 10, () => 8.0, s => slept2 += s)
    assert(l2 == 8.0 && w2 == 13 && slept2 == 13)
    // already quiet: no sleep at all
    val (l3, w3) = Bench.waitForQuiet(300, 15, () => 0.2, _ => fail("must not sleep"))
    assert(l3 == 0.2 && w3 == 0)
  }

  test("failed queries surface in err, not in queries or total") {
    val res = Seq("q01_agg" -> 0.391)
    val line = Bench.renderLine(res, "/root/testdata/sf0.1", hot = false, errs = Seq("q04_blocklist", "q11_stream_window"))
    assert(line.contains(""""err":["4","11"]"""))
    assert(!line.contains("q04\":"), "failed query must not carry a timing")
    assert(line.contains(""""value":0.39"""), "total must exclude failed queries")
    // An err entry ("qNN") is strictly shorter than a timing entry
    // ("qNN":999.99), so the all-success line in the first test remains the
    // worst case for the 2000-char stdout-tail bound.
    val full = Bench.renderFull(res, "/root/testdata/sf0.1", 0.1, 0.2, errs = Seq("q04_blocklist"))
    assert(full.contains(""""err":["q04_blocklist"]"""))
  }

  test("renderFull carries per-query shuffle/spill MB; bytes omitted when not captured") {
    val res = Seq("q01_agg" -> 0.391, "q02_x" -> 1.5)
    val bytes = Map(
      "q01_agg" -> ((10_500_000L, 2_000_000L, 0L)), // 12.5 MB shuffle r+w
      "q02_x" -> ((0L, 0L, 64_000_000L)))           // spill-only
    val full = Bench.renderFull(res, "sf0.1", 0.1, 0.2, bytes = bytes)
    assert(full.contains(""""q01_agg":{"sh_mb":12.50,"spill_mb":0.00}"""), full)
    assert(full.contains(""""q02_x":{"sh_mb":0.00,"spill_mb":64.00}"""), full)
    // valid JSON with the expected structure (jackson ships with Spark)
    val om = new com.fasterxml.jackson.databind.ObjectMapper
    val parsed = om.readTree(full)
    assert(parsed.get("bytes").get("q01_agg").get("sh_mb").asDouble == 12.5)
    // legacy form (no bytes captured): field absent entirely, still JSON
    val bare = Bench.renderFull(res, "sf0.1", 0.1, 0.2)
    assert(!bare.contains("\"bytes\""))
    om.readTree(bare)
  }

  test("renderFull carries the task-skew triple when captured (whale-key gate feed)") {
    val res = Seq("q01_agg" -> 0.391)
    val bytes = Map("q01_agg" -> ((10_500_000L, 2_000_000L, 0L)))
    val skew = Map("q01_agg" -> ((4_210L, 350L, 120L))) // ms → s in the artifact
    val full = Bench.renderFull(res, "sf0.1", 0.1, 0.2, bytes = bytes, skew = skew)
    assert(full.contains(
      """"q01_agg":{"sh_mb":12.50,"spill_mb":0.00,"max_task_s":4.210,"med_task_s":0.350,"peer_med_s":0.120}"""),
      full)
    val om = new com.fasterxml.jackson.databind.ObjectMapper
    assert(om.readTree(full).get("bytes").get("q01_agg").get("max_task_s").asDouble == 4.21)
    assert(om.readTree(full).get("bytes").get("q01_agg").get("peer_med_s").asDouble == 0.12)
  }

  test("renderFull carries the ambient-CPU block when fenced (mid-run-hot gate feed)") {
    val res = Seq("q01_agg" -> 0.391)
    // 500 foreign cpu-s over 140 s wall = 3.57 cores avg — the round-16
    // phantom-regression shape benchgate must rule UNUSABLE
    val full = Bench.renderFull(res, "sf0.1", 0.1, 4.5, ambient = Some((500.0, 140.0)))
    assert(full.contains(""""ambient":{"cpu_s":500.0,"wall_s":140.0,"avg_cores":3.57}"""), full)
    val om = new com.fasterxml.jackson.databind.ObjectMapper
    assert(om.readTree(full).get("ambient").get("avg_cores").asDouble == 3.57)
    // pre-ambient form: field absent entirely, still JSON
    val bare = Bench.renderFull(res, "sf0.1", 0.1, 0.2)
    assert(!bare.contains("\"ambient\""))
    om.readTree(bare)
  }

  test("taskSkew: max, upper-median, and same-stage peer median; empty reads (0,0,0)") {
    assert(Bench.taskSkew(Nil) == ((0L, 0L, 0L)))
    assert(Bench.taskSkew(Seq((1, 100L))) == ((100L, 100L, 100L)))
    // even count: upper middle (biases against flagging). THE BLIND SPOT
    // GUARD (review r14): a max task ALONE in its stage must not be its
    // own peer (peer == max would read 1x forever — the AQE one-task
    // funnel could never flag); a peerless max falls back to the window
    // median, here 30 → 4000 vs 30 flags exactly like the old comparator
    assert(Bench.taskSkew(Seq((1, 10L), (1, 20L), (1, 30L), (9, 4000L))) ==
      ((4000L, 30L, 30L)))
    // single-stage window: max excluded from its peers → peer median of
    // the OTHER tasks [1,5] = upper middle 5 (same as the query median)
    assert(Bench.taskSkew(Seq((2, 5L), (2, 1L), (2, 9L))) == ((9L, 5L, 5L)))
    // THE 2-TASK BLIND SPOT (advice r15): with the max included, a 2-task
    // stage's upper median IS the max (ratio ~1x forever); excluding it,
    // the sole remaining peer is the comparator and the whale flags
    assert(Bench.taskSkew(Seq((1, 5L), (1, 6L), (9, 4000L), (9, 10L))) ==
      ((4000L, 10L, 10L)))
    // a TIED co-max is a genuine peer — only one max instance is dropped
    assert(Bench.taskSkew(Seq((3, 4000L), (3, 4000L))) ==
      ((4000L, 4000L, 4000L)))
    // whale key: one 4s task among its own stage's 10ms peers — query
    // median is diluted by another stage's mid tasks, peer median is not
    val whale = Seq((5, 4000L), (5, 10L), (5, 12L), (5, 11L),
      (7, 300L), (7, 310L), (7, 320L))
    assert(Bench.taskSkew(whale) == ((4000L, 300L, 11L)))
    // uniform heavy stage: max ~= peers even though tiny bookkeeping
    // tasks in other stages crush the whole-query median
    val uniform = Seq((5, 1900L), (5, 2000L), (5, 1950L),
      (7, 5L), (7, 6L), (7, 4L), (7, 5L))
    assert(Bench.taskSkew(uniform) == ((2000L, 6L, 1950L)))
  }
}
