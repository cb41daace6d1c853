package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver stdout contract: the harness parses the bench JSON out
  * of the last 2000 chars of stdout, so the rendered line must stay well
  * under that as queries are added (round 6 shipped an unparseable bench
  * when the 75-query line crossed 2000 chars). */
class BenchContractSpec extends AnyFunSuite {

  test("worst-case bench line fits the driver's 2000-char stdout tail") {
    // Worst-case value width at 2 decimals: 999.99 (no query should ever
    // take 1000s; if one does, line length is the least of our problems).
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 999.99)
    val line = Bench.renderLine(results, "/root/testdata/sf0.1", hot = true)
    assert(line.length < 1900, s"bench line ${line.length} chars — driver tail is 2000")
  }

  test("short keys stay unique across the registry") {
    val keys = SparkEntry.queries.keys.toSeq.map(Bench.shortKey)
    assert(keys.distinct.size == keys.size, "qNN prefixes collide — driver line would drop a query")
  }

  test("rendered line is valid JSON-shaped and carries the hot flag only when hot") {
    val res = Seq("q01_agg" -> 0.391, "q02_per_key_totals" -> 12.3456)
    val quiet = Bench.renderLine(res, "/root/testdata/sf0.1", hot = false)
    assert(quiet == """{"metric":"total","value":12.74,"unit":"sec","queries":{"q01":0.39,"q02":12.35},"sf":"sf0.1","err":[]}""")
    val hot = Bench.renderLine(res, "/root/testdata/sf0.1", hot = true)
    assert(hot.endsWith(""","err":[],"hot":1}"""))
  }

  test("failed queries surface in err, not in queries or total") {
    val res = Seq("q01_agg" -> 0.391)
    val line = Bench.renderLine(res, "/root/testdata/sf0.1", hot = false, errs = Seq("q04_blocklist", "q11_stream_window"))
    assert(line.contains(""""err":["q04","q11"]"""))
    assert(!line.contains("q04\":"), "failed query must not carry a timing")
    assert(line.contains(""""value":0.39"""), "total must exclude failed queries")
    // An err entry ("qNN") is strictly shorter than a timing entry
    // ("qNN":999.99), so the all-success line in the first test remains the
    // worst case for the 2000-char stdout-tail bound.
    val full = Bench.renderFull(res, "/root/testdata/sf0.1", 0.1, 0.2, errs = Seq("q04_blocklist"))
    assert(full.contains(""""err":["q04_blocklist"]"""))
  }
}
