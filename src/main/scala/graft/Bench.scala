package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every registered query at SPARK_GRAFT_SF_DIR,
  * prints one JSON line (driver contract). Session uses the engine's scale
  * defaults (AQE, broadcast threshold); a warmup action runs first so JVM /
  * codegen / scan-init cost isn't attributed to the first query.
  *
  * Driver stdout contract: the harness keeps only the LAST 2000 chars of
  * stdout and parses the JSON line out of that tail. Round 6 shipped an
  * unparseable bench because 75 queries at full double precision pushed the
  * line past 2000 chars. The line is therefore built for compactness:
  *   - per-query keys are the unique `qNN` prefix (the contract example
  *     itself uses short keys: `{"q1":sec,...}`); full-name timings go to
  *     BENCH_LOCAL.json next to the repo for human/judge consumption.
  *   - times print at 2 decimals (10 ms — same precision BASELINE.md pins).
  *   - `sf` is the directory basename, not the full path.
  * `BenchContractSpec` asserts the worst-case rendered line stays < 1900
  * chars as queries are added.
  *
  * Capture hygiene: ambient host load has produced 10-100x phantom outliers
  * in past rounds (see BASELINE.md). /proc/loadavg is sampled BEFORE the
  * run; past that point the bench's own local[32] work dominates the
  * 1-minute loadavg, so an end sample self-triggers on every capture (seen
  * in r08: hot:1 on a host at 0.04). Only the start sample decides `hot`;
  * the end sample is still recorded in the local artifact for diagnostics.
  *
  * Error honesty: a query that throws in BOTH timed passes is excluded from
  * `queries` and `total` and listed in the always-present `"err"` array —
  * r08 recorded 17 crashed queries as innocent 60 ms timings, masking a
  * total outage as a speedup. A clean run carries `"err":[]`.
  */
object Bench {
  val LoadHotThreshold = 1.5

  /** 1-minute loadavg, or -1 where /proc is unavailable (non-Linux test). */
  def loadAvg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** `q07_segment_flag` -> `q07`; names without an underscore pass through. */
  def shortKey(name: String): String = name.takeWhile(_ != '_')

  /** Render the driver-contract JSON line. Pure so the spec can bound its
    * length against the live query registry. Failed queries appear only in
    * `err` (short keys), never in `queries`/`value`, so the line can't read
    * a crash as a fast timing — and worst-case length stays bounded by the
    * all-success case. */
  def renderLine(results: Seq[(String, Double)], sfDir: String, hot: Boolean,
                 errs: Seq[String] = Nil): String = {
    val qs = results
      .map { case (k, v) => "\"" + shortKey(k) + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.2f"
    val sf = new java.io.File(sfDir).getName
    val errField = errs.map("\"" + shortKey(_) + "\"").mkString(""","err":[""", ",", "]")
    val hotField = if (hot) ",\"hot\":1" else ""
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sf"$errField$hotField}"""
  }

  /** Full-name 3-decimal timings for the committed local artifact. */
  def renderFull(results: Seq[(String, Double)], sfDir: String, loadStart: Double, loadEnd: Double,
                 errs: Seq[String] = Nil): String = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.3f"
    val errField = errs.map("\"" + _ + "\"").mkString(""","err":[""", ",", "]")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","load":[$loadStart,$loadEnd]$errField}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val loadStart = loadAvg()
    if (loadStart > LoadHotThreshold)
      System.err.println(f"[bench] WARNING ambient load $loadStart%.2f > $LoadHotThreshold at start; capture will be flagged hot")

    // Warm every query once at the TARGET SF: whole-stage codegen compiles
    // per physical plan shape, and AQE picks different join strategies at
    // different data sizes — warming at a smaller SF compiles the wrong
    // shapes and the timed run still pays multi-second JIT. Steady state
    // means the exact plans have run once (JMH-style same-workload warmup).
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }

    spark.catalog.clearCache() // drop warmup-scale cached data before timing

    // Two timed passes, report the per-query MIN: a single pass is at the
    // mercy of transient host stalls (observed 2-8× outliers on individual
    // queries with identical plans); the min of two runs reflects the plan,
    // not the noise.
    // Each pass records (name, elapsed, succeeded). A query counts as timed
    // only on passes where it completed; crashing is not a timing.
    def timedPass(): Seq[(String, Double, Boolean)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case t: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${t.getClass.getSimpleName}: ${String.valueOf(t.getMessage).take(200)}")
            false
        }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    // Release dropped checkpoint/broadcast blocks between passes so pass 2
    // measures the plans, not the first pass's garbage.
    def cleanup(): Unit = { spark.catalog.clearCache(); System.gc() }
    val pass1 = timedPass(); cleanup()
    val pass2 = timedPass()
    val byName = (pass1 ++ pass2).groupBy(_._1).toSeq.sortBy(_._1)
    val results = byName.flatMap { case (name, runs) =>
      val good = runs.collect { case (_, t, true) => t }
      if (good.nonEmpty) Some(name -> good.min) else None
    }
    val errs = byName.collect { case (name, runs) if !runs.exists(_._3) => name }
    val loadEnd = loadAvg()
    val hot = loadStart > LoadHotThreshold

    // Full-name artifact for humans/judges (the driver line uses short keys).
    val localPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOCAL", "/root/repo/BENCH_LOCAL.json")
    try {
      val w = new java.io.PrintWriter(localPath)
      try w.println(renderFull(results, sfDir, loadStart, loadEnd, errs)) finally w.close()
    } catch { case _: Throwable => () }

    // Stop Spark BEFORE printing: the JSON line must be the last thing on
    // stdout (shutdown logs go to stderr, but keep the ordering airtight for
    // last-line parsers; first-line parsers see it unprefixed either way).
    spark.stop()
    println(renderLine(results, sfDir, hot, errs))
    System.out.flush()
  }
}
