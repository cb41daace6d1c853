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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Generator versions have flip-flopped the events `ts` physical type
    // between TIMESTAMP(NANOS) and TIMESTAMP(US); keep the nanos-as-long
    // legacy read enabled so either file opens, and let events() normalize
    // from whatever type actually loaded.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

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
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
}
