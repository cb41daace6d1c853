package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for a scale-factor directory.
  *
  * Reads stay fully declarative so Catalyst prunes columns and pushes filters
  * into the parquet scan — callers should `.select`/`.filter` immediately and
  * let the optimizer collapse it into the read.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    // TIMESTAMP(NANOS) files open because GraftSession sets
    // spark.sql.legacy.parquet.nanosAsLong once at session build (set-once
    // by design: a per-read conf mutation here would silently change how
    // unrelated nanos parquet in the same session reads); events()
    // normalizes from whatever type actually loaded.
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  /** Normalizes `ts` to session-zone TimestampType regardless of the parquet
    * physical type: nanos-read-as-long (legacy flag) truncates to micros —
    * the same conversion DuckDB applies casting TIMESTAMP_NS → TIMESTAMP —
    * while native timestamp/TIMESTAMP_NTZ reads just cast (identical
    * instants under the engine's UTC session zone). Schema-adaptive so a
    * regenerated testdata drop can't break every downstream events query. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(spark, sfDir, "events")
    val tsNorm = raw.schema("ts").dataType match {
      case LongType => timestamp_micros(expr("ts DIV 1000"))
      case _        => col("ts").cast(TimestampType)
    }
    raw.withColumn("ts", tsNorm)
  }
  /** Time-windowed events read `[from, until)` that keeps parquet filter
    * pushdown ALIVE on legacy nanos-typed files. [[events]] wraps a
    * legacy long `ts` in `timestamp_micros(ts DIV 1000)`, which no parquet
    * filter can see through — a time-windowed scan over a legacy-written
    * 100 TB events lake would read every row group. Here the window is
    * applied to the RAW column in the file's own physical domain (epoch
    * nanos on the legacy branch, timestamp on the native one) BEFORE
    * normalizing, so row-group stats prune on both branches. */
  def eventsBetween(spark: SparkSession, sfDir: String,
                    from: java.time.Instant, until: java.time.Instant): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        def nanos(i: java.time.Instant): Long =
          Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000000L), i.getNano.toLong)
        raw.filter(col("ts") >= nanos(from) && col("ts") < nanos(until))
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        raw.filter(col("ts") >= lit(from) && col("ts") < lit(until))
          .withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
}
