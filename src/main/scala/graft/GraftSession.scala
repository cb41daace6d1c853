package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale defaults.
  *
  * Local testing runs `local[32]`; on a real cluster the same settings hold:
  * AQE re-plans shuffles at runtime (coalescing small partitions, splitting
  * skewed ones), and the broadcast threshold keeps dimension joins off the
  * shuffle path.
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE coalescing is byte-based and cannot see CPU-dense shuffles:
      // an iterative op's dedup/min-agg over edge-scale input compresses
      // to ~1MB of (node, label) partials, and the default 1MB
      // minPartitionSize floor then funnels a multi-million-row final
      // aggregate into ONE task (q109's 7s hot task at sf1 — round 14).
      // A 16KB floor lets parallelismFirst spread small-byte shuffles to
      // ~defaultParallelism tasks; large shuffles still follow the 64MB
      // advisory, so only the tiny-byte/CPU-heavy class changes shape.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "16k"))
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // TIMESTAMP(NANOS) parquet (produced by some writers; the events
      // testdata has flip-flopped types across regenerations) reads as
      // LongType instead of failing; Tables.events normalizes from
      // whichever type loaded. Set ONCE here — a per-read conf mutation
      // would silently change how unrelated nanos parquet in the same
      // session reads.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Local session sized like the driver's harness. The graft function
    * set (graft_md5_fold48, graft_jaro_winkler, …) registers here so
    * column helpers like `DistinctSketch.portableHash48` resolve even
    * when used before any operator entry point (which also register,
    * idempotently, for sessions built elsewhere). */
  def local(appName: String = "graft", cores: Int = 32): SparkSession = {
    val s = builder(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(s)
    s
  }
}
