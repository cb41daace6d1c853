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
  * line past 2000 chars; round 17's qNN-keyed line overflowed again at
  * 177 queries (BENCH_r17.json parsed:null). The line is therefore built
  * for compactness:
  *   - per-query keys are the bare registry number ([[lineKey]]: q44_… ->
  *     `44`); full-name timings go to BENCH_LOCAL.json next to the repo
  *     for human/judge consumption.
  *   - times print at ≤3 chars ([[fmtLine]]: 0.1 s below 10 s, whole
  *     seconds above — pins adjudicate at 2x, and BENCH_LOCAL.json keeps
  *     3 decimals).
  *   - `sf` is the directory basename, not the full path.
  * `BenchContractSpec` asserts the worst-case rendered line stays < 1900
  * chars as queries are added.
  *
  * Capture hygiene: ambient host load has produced 10-100x phantom outliers
  * in past rounds (see BASELINE.md). The bench first WAITS for the host to
  * go quiet (up to SPARK_GRAFT_QUIET_WAIT_SECS, default 300, poll 15 s) —
  * two driver captures (r8, r9) were hot-flagged by transient co-tenant
  * load that a grace window would have outlasted. /proc/loadavg is sampled
  * BEFORE the run; past that point the bench's own local[32] work dominates
  * the 1-minute loadavg, so an end sample self-triggers on every capture
  * (seen in r08: hot:1 on a host at 0.04). Only the post-grace start sample
  * decides `hot`; the end sample is still recorded in the local artifact
  * for diagnostics. A hot capture writes BENCH_LOCAL_HOT.json, never
  * overwriting the committed quiet artifact.
  *
  * Re-time protocol: SPARK_GRAFT_BENCH_ONLY=q72,q76 (short keys or full
  * names) runs just those queries — the standalone re-time BASELINE.md's
  * outlier adjudication calls for, without ad-hoc scala. Subset captures
  * write BENCH_LOCAL_SUBSET.json.
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

  /** Driver-LINE key: the registry number alone (`q07_segment_flag` ->
    * `7`, `q177_robot_slots_roundtrip` -> `177`); non-qNN names fall back
    * to [[shortKey]]. Round 17 proved the qNN-keyed line OVERFLOWS the
    * driver's 2000-char stdout tail at 177 queries (BENCH_r17.json:
    * `parsed: null`, tail clipped mid-line) — the q prefix and leading
    * zeros cost ~230 chars the tail doesn't have. The mapping back is
    * mechanical (`"44"` = q44's row in BASELINE.md / BENCH_LOCAL.json);
    * the committed local artifact keeps FULL names at 3 decimals. */
  def lineKey(name: String): String = {
    val s = shortKey(name)
    if (s.length > 1 && s.head == 'q' && s.tail.forall(_.isDigit))
      s.tail.dropWhile(_ == '0') match { case "" => "0"; case d => d }
    else s
  }

  /** Host-wide busy CPU seconds since boot (user+nice+system+irq+softirq+
    * steal from /proc/stat, USER_HZ=100), or -1 where /proc is unavailable.
    * Deltaed around the timed passes and netted against the JVM's own
    * process CPU, this measures AMBIENT (other-process) CPU during the
    * capture — the signal the start/end loadavg samples can't give: the
    * 1-minute loadavg at END is dominated by the bench's own local[N]
    * work (a quiet sf1 capture legitimately ends at load ~19), so the
    * round-16 hot tail (end 4.5 on an sf0.1 run, six phantom >2x rows)
    * sailed through the start-only flag. */
  def hostBusyCpuSecs(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      val cols = try src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        finally src.close()
      // col layout: user nice system idle iowait irq softirq steal guest
      // guest_nice. Only the first 8 count: the kernel already folds guest
      // and guest_nice into user/nice, so summing every non-idle column
      // double-counts VM guest time — and benchgate hard-gates on this
      // number (round-17 advice).
      val busy = cols.take(8).zipWithIndex.collect {
        case (v, i) if i != 3 && i != 4 => v
      }.sum
      busy / 100.0
    } catch { case _: Throwable => -1.0 }

  /** This JVM's cumulative process CPU seconds, or -1 if unsupported. */
  def ownCpuSecs(): Double =
    try {
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          val t = os.getProcessCpuTime
          if (t < 0) -1.0 else t / 1e9
        case _ => -1.0
      }
    } catch { case _: Throwable => -1.0 }

  /** Self-defense against ambient host load: poll until the 1-minute
    * loadavg drops below the hot threshold or `maxWaitSecs` elapses.
    * Returns (finalLoad, secondsWaited). Two consecutive driver captures
    * (r8, r9) were hot-flagged by transient co-tenant load and needed
    * manual judge exoneration; waiting out the transient is cheaper than
    * adjudicating a 10-100x phantom outlier after the fact. Injectable
    * load/sleep so the spec can drive it without /proc or wall-clock. */
  def waitForQuiet(maxWaitSecs: Int, pollSecs: Int,
                   load: () => Double = loadAvg _,
                   sleep: Int => Unit = s => Thread.sleep(s * 1000L)): (Double, Int) = {
    var waited = 0
    var l = load()
    while (l > LoadHotThreshold && waited < maxWaitSecs) {
      val step = math.min(pollSecs, maxWaitSecs - waited)
      sleep(step)
      waited += step
      l = load()
    }
    (l, waited)
  }

  /** `SPARK_GRAFT_BENCH_ONLY` filter: comma-separated short keys (`q72`)
    * or full names (`q72_bm25`), whitespace-tolerant, unknown keys
    * ignored. None/blank → run everything. Makes BASELINE.md's
    * single-query re-time adjudication protocol runnable by anyone
    * without ad-hoc scala. */
  def selectOnly(spec: Option[String], names: Seq[String]): Seq[String] =
    spec.map(_.trim).filter(_.nonEmpty) match {
      case None => names
      case Some(s) =>
        val wanted = s.split(",").map(_.trim).filter(_.nonEmpty).toSet
        names.filter(n => wanted.contains(n) || wanted.contains(shortKey(n)) ||
          wanted.contains(lineKey(n)))
    }

  /** Local-artifact routing: a SUBSET re-time or a HOT capture must never
    * overwrite the committed quiet full-suite artifact — r9's quiet
    * BENCH_LOCAL.json was clobbered by the driver's hot run and only git
    * history preserved the trustworthy numbers. */
  def localArtifactPath(base: String, hot: Boolean, subset: Boolean): String = {
    val suffix = if (subset) "_SUBSET" else if (hot) "_HOT" else ""
    if (suffix.isEmpty) base
    else if (base.endsWith(".json")) base.stripSuffix(".json") + suffix + ".json"
    else base + suffix
  }

  /** Render the driver-contract JSON line. Pure so the spec can bound its
    * length against the live query registry. Failed queries appear only in
    * `err` (short keys), never in `queries`/`value`, so the line can't read
    * a crash as a fast timing — and worst-case length stays bounded by the
    * all-success case. */
  def renderLine(results: Seq[(String, Double)], sfDir: String, hot: Boolean,
                 errs: Seq[String] = Nil): String = {
    // Compact keys + ≤3-char values keep the line inside the driver's
    // 2000-char stdout tail as the registry grows. History: 137 queries
    // at flat %.2f hit 1910 worst-case (round 6 shipped unparseable);
    // round 17's qNN keys + 4-char values overflowed FOR REAL at 177
    // queries (BENCH_r17.json parsed: null). Now: bare registry-number
    // keys (lineKey) and 0.1 s / whole-second precision (fmtLine) put
    // 183 queries at ~1810 worst-case, cap ~198. Pins compare at 2x and
    // the committed BENCH_LOCAL.json keeps full names at 3 decimals, so
    // the tail precision loses nothing adjudication needs.
    val qs = results
      .map { case (k, v) => "\"" + lineKey(k) + "\":" + fmtLine(v) }
      .mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.2f"
    val sf = new java.io.File(sfDir).getName
    val errField = errs.map("\"" + lineKey(_) + "\"").mkString(""","err":[""", ",", "]")
    val hotField = if (hot) ",\"hot\":1" else ""
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sf"$errField$hotField}"""
  }

  /** ≤3-char rendering: 0.4 / 9.9 / 12 / 999 (+1 char past 1000 s). */
  def fmtLine(v: Double): String =
    if (v < 9.95) f"$v%.1f" else f"$v%.0f"

  /** Full-name 3-decimal timings for the committed local artifact, plus the
    * per-query BYTES block: shuffle read+write MB, spill MB, and the task
    * SKEW pair (max / median task seconds). Seconds at sf0.1 are
    * ambient-noise-limited (identical code has drifted ±15% between
    * rounds); bytes are a property of the PLAN — deterministic run to run
    * — so the bytes gate (`tools/benchgate.py`) catches a lost broadcast
    * or a new exchange exactly, where the 2x seconds gate reads it as
    * noise. The skew pair catches the remaining plan-regression class
    * bytes can't: a whale key funneling a partition's work through one
    * task moves max/median where totals and bytes look healthy (the q157
    * pre-banding shape) — benchgate fails max > 3x median + 1 s. */
  def renderFull(results: Seq[(String, Double)], sfDir: String, loadStart: Double, loadEnd: Double,
                 errs: Seq[String] = Nil,
                 bytes: Map[String, (Long, Long, Long)] = Map.empty,
                 skew: Map[String, (Long, Long, Long)] = Map.empty,
                 ambient: Option[(Double, Double)] = None): String = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.3f"
    val errField = errs.map("\"" + _ + "\"").mkString(""","err":[""", ",", "]")
    val bytesField =
      if (bytes.isEmpty) ""
      else results.flatMap { case (k, _) => bytes.get(k).map { case (sr, sw, sp) =>
        val skewField = skew.get(k).fold("") { case (mx, md, pm) =>
          ",\"max_task_s\":" + f"${mx / 1e3}%.3f" + ",\"med_task_s\":" + f"${md / 1e3}%.3f" +
            ",\"peer_med_s\":" + f"${pm / 1e3}%.3f"
        }
        "\"" + k + "\":{\"sh_mb\":" + f"${(sr + sw) / 1e6}%.2f" +
          ",\"spill_mb\":" + f"${sp / 1e6}%.2f" + skewField + "}"
      }}.mkString(""","bytes":{""", ",", "}")
    // Ambient block: other-process CPU during the timed passes. avg_cores
    // is what benchgate adjudicates on — the honest "was the host quiet"
    // number the end-loadavg sample (self-load-dominated) can't give.
    val ambField = ambient.fold("") { case (cpuS, wallS) =>
      val cores = if (wallS > 0) cpuS / wallS else 0.0
      ",\"ambient\":{\"cpu_s\":" + f"$cpuS%.1f" + ",\"wall_s\":" + f"$wallS%.1f" +
        ",\"avg_cores\":" + f"$cores%.2f" + "}"
    }
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","load":[$loadStart,$loadEnd]$errField$bytesField$ambField}"""
  }

  /** (max_ms, median_ms, peer_median_ms) of one query's (stageId,
    * duration) task window; (0, 0, 0) for an empty window (fully cached /
    * metadata-only). `peer_median_ms` is the median duration of the tasks
    * in the SAME STAGE as the max task — the honest whale-key comparator:
    * a multi-stage iterative query runs hundreds of sub-100ms bookkeeping
    * tasks that drag the whole-query median down, so max-vs-query-median
    * flags every honest uniform heavy stage (q109's 32-task edge stages at
    * sf1 read as 190x while no task outran its peers — round 14). A whale
    * key shows up as max ≫ its own stage's median; a uniform stage reads
    * ~1x. The max task itself is EXCLUDED from its peer set (round-15
    * advice): with the max included, a 2-task stage's upper median IS the
    * max (sorted pair → peers(1)), the ratio reads ~1x, and a whale
    * funneled into a 2-task stage could never flag — the same blind-spot
    * class the 1-task fallback closed in round 14. When excluding the max
    * leaves no peers (the max is alone in its stage), fall back to the
    * whole-window median (legitimate single-task stages are sub-second
    * and the gates' +1 s slack exempts them). Exactly ONE instance of the
    * max is dropped — a tied co-max task is a genuine peer. Medians are
    * the upper middle — bias AGAINST flagging. */
  def taskSkew(window: Seq[(Int, Long)]): (Long, Long, Long) =
    if (window.isEmpty) (0L, 0L, 0L)
    else {
      val s = window.map(_._2).sorted
      val med = s(s.size / 2)
      val maxStage = window.maxBy(_._2)._1
      val peers = window.collect { case (st, d) if st == maxStage => d }
        .sorted.dropRight(1)
      (s.last, med, if (peers.isEmpty) med else peers(peers.size / 2))
    }

  /** Cumulative shuffle/spill task-metric counters plus the task-duration
    * log. Per-query deltas are taken between
    * [[org.apache.spark.graftbench.BusDrain]]-fenced snapshots, so a
    * query's tail events can't bleed into the next row. */
  final class BytesListener extends org.apache.spark.scheduler.SparkListener {
    private val sr = new java.util.concurrent.atomic.AtomicLong
    private val sw = new java.util.concurrent.atomic.AtomicLong
    private val sp = new java.util.concurrent.atomic.AtomicLong
    private val durs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        sp.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
      if (te.taskInfo != null)
        durs.synchronized { durs += ((te.stageId, te.taskInfo.duration)) }
    }
    def snapshot: (Long, Long, Long) = (sr.get, sw.get, sp.get)
    /** Fence index into the duration log — O(1), no copy. */
    def durationCount: Int = durs.synchronized(durs.size)
    /** One query's (stageId, duration) window by fence indexes —
      * O(window), copied under the lock so a late straggler append can't
      * tear the slice. */
    def durationWindow(from: Int, until: Int): Seq[(Int, Long)] =
      durs.synchronized(durs.slice(from, until).toVector)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val onlySpec = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
    val allNames = SparkEntry.queries.keys.toSeq.sorted
    val names = selectOnly(onlySpec, allNames)
    val subset = names.size != allNames.size
    if (names.isEmpty) {
      System.err.println(s"[bench] SPARK_GRAFT_BENCH_ONLY='${onlySpec.getOrElse("")}' matches no query")
      println(renderLine(Nil, sfDir, hot = false, Nil))
      return
    }
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Wait out transient ambient load before sampling the start loadavg:
    // the bench flags itself hot only if the host is STILL loaded after
    // the grace window (default 5 min, poll 15 s; 0 disables).
    val maxWait = sys.env.getOrElse("SPARK_GRAFT_QUIET_WAIT_SECS", "300").toInt
    val (loadStart, waited) = waitForQuiet(maxWait, 15)
    if (waited > 0)
      System.err.println(f"[bench] waited ${waited}s for ambient load to settle (now $loadStart%.2f)")
    if (loadStart > LoadHotThreshold)
      System.err.println(f"[bench] WARNING ambient load $loadStart%.2f > $LoadHotThreshold after ${waited}s grace; capture will be flagged hot")

    val queries = names.map(n => n -> SparkEntry.queries(n))

    // Warm every query once at the TARGET SF: whole-stage codegen compiles
    // per physical plan shape, and AQE picks different join strategies at
    // different data sizes — warming at a smaller SF compiles the wrong
    // shapes and the timed run still pays multi-second JIT. Steady state
    // means the exact plans have run once (JMH-style same-workload warmup).
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }

    spark.catalog.clearCache() // drop warmup-scale cached data before timing

    // Per-query shuffle/spill bytes ride along with the timings: snapshot
    // the cumulative listener counters before and after each query, with
    // the listener bus drained at both fences so deltas are exact.
    val bytesListener = new BytesListener
    spark.sparkContext.addSparkListener(bytesListener)
    def fencedSnapshot(): ((Long, Long, Long), Int) = {
      org.apache.spark.graftbench.BusDrain.drain(spark.sparkContext)
      (bytesListener.snapshot, bytesListener.durationCount)
    }

    // Two timed passes, report the per-query MIN: a single pass is at the
    // mercy of transient host stalls (observed 2-8× outliers on individual
    // queries with identical plans); the min of two runs reflects the plan,
    // not the noise. Bytes take the per-query min total too — the plan's
    // bytes are identical across passes, so min sheds stray concurrent
    // events rather than averaging them in.
    // Each pass records (name, elapsed, succeeded, bytes, task skew). A
    // query counts as timed only on passes where it completed; crashing is
    // not a timing.
    def timedPass(): Seq[(String, Double, Boolean, (Long, Long, Long), (Long, Long, Long))] =
      queries.map { case (name, fn) =>
        val (b0, n0) = fencedSnapshot()
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case t: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${t.getClass.getSimpleName}: ${String.valueOf(t.getMessage).take(200)}")
            false
        }
        val elapsed = (System.nanoTime() - t0) / 1e9
        val (b1, n1) = fencedSnapshot()
        val skew = taskSkew(bytesListener.durationWindow(n0, n1))
        (name, elapsed, ok, (b1._1 - b0._1, b1._2 - b0._2, b1._3 - b0._3), skew)
      }
    // Release dropped checkpoint/broadcast blocks between passes so pass 2
    // measures the plans, not the first pass's garbage.
    def cleanup(): Unit = { spark.catalog.clearCache(); System.gc() }
    // Ambient-CPU fences around the timed region: host busy CPU minus this
    // JVM's own CPU = other-process interference while the passes ran.
    val ambWall0 = System.nanoTime()
    val ambBusy0 = hostBusyCpuSecs()
    val ambOwn0 = ownCpuSecs()
    val pass1 = timedPass(); cleanup()
    val pass2 = timedPass()
    val ambient: Option[(Double, Double)] =
      if (ambBusy0 < 0 || ambOwn0 < 0) None
      else {
        val busy = hostBusyCpuSecs() - ambBusy0
        val own = ownCpuSecs() - ambOwn0
        val wall = (System.nanoTime() - ambWall0) / 1e9
        if (busy < 0 || own < 0 || wall <= 0) None
        else Some((math.max(0.0, busy - own), wall))
      }
    ambient.foreach { case (cpuS, wallS) =>
      if (cpuS / wallS > 1.0)
        System.err.println(f"[bench] WARNING ambient CPU ${cpuS / wallS}%.2f cores avg " +
          "during the timed passes — capture is adjudication-unusable (benchgate gates on this)")
    }
    val byName = (pass1 ++ pass2).groupBy(_._1).toSeq.sortBy(_._1)
    val results = byName.flatMap { case (name, runs) =>
      val good = runs.collect { case (_, t, true, _, _) => t }
      if (good.nonEmpty) Some(name -> good.min) else None
    }
    val bytesByName: Map[String, (Long, Long, Long)] = byName.flatMap {
      case (name, runs) =>
        val good = runs.collect { case (_, _, true, b, _) => b }
        if (good.isEmpty) None
        else Some(name -> good.minBy { case (a, b, c) => a + b + c })
    }.toMap
    // Skew from the pass with the SMALLER max task — a transient host
    // stall inflates one pass's max; the plan's real hot task shows up in
    // both (the min-of-two discipline applied to the skew pair).
    val skewByName: Map[String, (Long, Long, Long)] = byName.flatMap {
      case (name, runs) =>
        val good = runs.collect { case (_, _, true, _, s) => s }
        if (good.isEmpty) None else Some(name -> good.minBy(_._1))
    }.toMap
    val errs = byName.collect { case (name, runs) if !runs.exists(_._3) => name }
    val loadEnd = loadAvg()
    val hot = loadStart > LoadHotThreshold

    // Full-name artifact for humans/judges (the driver line uses short
    // keys). Hot and subset captures route to sibling files so they can
    // never clobber the committed quiet full-suite artifact.
    val localBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOCAL", "/root/repo/BENCH_LOCAL.json")
    val localPath = localArtifactPath(localBase, hot, subset)
    try {
      val w = new java.io.PrintWriter(localPath)
      try w.println(renderFull(results, sfDir, loadStart, loadEnd, errs, bytesByName, skewByName, ambient)) finally w.close()
    } catch { case _: Throwable => () }

    // Stop Spark BEFORE printing: the JSON line must be the last thing on
    // stdout (shutdown logs go to stderr, but keep the ordering airtight for
    // last-line parsers; first-line parsers see it unprefixed either way).
    spark.stop()
    println(renderLine(results, sfDir, hot, errs))
    System.out.flush()
  }
}
