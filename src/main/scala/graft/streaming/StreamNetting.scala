package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming refund netting (SURVEY §2b S24) — the watermark-horizon form
  * of [[graft.operators.Remittance.netAdjustments]]: postings are held in
  * a per-key pending buffer for the watermark horizon; a refund arriving
  * while the postings it claws are still pending nets against them
  * EXACTLY as the batch suffix-min envelope would, and a posting's netted
  * amount is released downstream only once the watermark passes its event
  * time — at which point it is FINAL (released cash is never clawed
  * back). A refund whose claw-back exceeds what the buffer can absorb —
  * it targeted postings that already released, i.e. it arrived PAST the
  * horizon of its prior postings — dead-letters the unabsorbed remainder
  * instead of suppressing cash forever.
  *
  * This closes the round-14 boundary where [[StreamRemittance]]
  * dead-lettered EVERY negative row: netting needs per-row posting
  * history, and the horizon is what bounds that history. State per key is
  * the pending rows inside the horizon (bounded by the horizon's row
  * volume, the same bound every watermarked stateful operator carries)
  * plus TWO longs — `c_raw` (released raw cumulative) and `f_net`
  * (released net cumulative, the floor released cash puts under the
  * envelope). `f_net − c_raw ≥ 0` is the outstanding claw deficit future
  * pending postings may still absorb (the batch operator's
  * refund-deducts-from-subsequent-postings rule), re-examined every
  * batch: whatever the remaining buffer cannot cover is dead-lettered.
  *
  * Equivalence contract (spec-pinned): when every refund arrives while
  * the postings it claws are still inside the horizon, the released
  * stream equals batch `netAdjustments` on the same rows, row for row.
  * Past-horizon claws surface as dead-letter rows, and conservation
  * holds: released net + dead-lettered = what batch netting would have
  * floored away plus released cash. Late rows (event time already behind
  * the watermark) release immediately, netted against the current axis
  * only — the standard best-effort late-data discipline.
  *
  * Scale shape per batch: one per-key sort window over (pending ∪ batch)
  * — horizon-bounded, the same class as the batch operator's two
  * in-partition sorts — one release aggregation, one axis merge. The only
  * driver-side value is the global max event time (one row, metadata).
  * Delivery is effective-once via [[VersionedStore]] commit markers.
  */
object StreamNetting {

  /** Latest committed state substore, if any; state reads the LAST
    * version only (pending/axis/meta are state, not logs). */
  private def readLatest(spark: SparkSession, baseDir: String,
                         sub: String): Option[DataFrame] =
    VersionedStore.committedVersions(spark, baseDir).lastOption
      .map(p => spark.read.parquet(new Path(p, sub).toString))

  /** Union of a LOG substore across committed versions. */
  private def readLog(spark: SparkSession, baseDir: String,
                      sub: String): Option[DataFrame] = {
    val dirs = VersionedStore.committedVersions(spark, baseDir)
      .map(p => new Path(p, sub)).map(_.toString)
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** Released netted rows so far — (key, id, ts, net_cents, net_amount),
    * every net_cents ≥ 0, ready for [[StreamRemittance.applyBatch]].
    * None before the first commit. */
  def readReleased(spark: SparkSession, baseDir: String): Option[DataFrame] =
    readLog(spark, baseDir, "released")

  /** Past-horizon claw remainders dead-lettered so far — (key, id, ts,
    * cents), cents > 0 = unabsorbed claw-back, id/ts = the latest
    * released refund row the remainder is attributed to. */
  def readDeadLetters(spark: SparkSession, baseDir: String): Option[DataFrame] =
    readLog(spark, baseDir, "deadletter")

  /** One micro-batch: buffer, net, release, dead-letter, publish.
    * Returns THIS batch's released rows (read back from the committed
    * version, so a foreachBatch replay returns the already-committed
    * delta instead of recomputing against advanced state).
    *
    * @param horizonSec watermark horizon in seconds: a row releases once
    *   max-seen event time exceeds its event time by more than this. */
  def applyBatch(batch: DataFrame, keyCol: Column, idCol: Column,
                 tsCol: Column, amountCol: Column, horizonSec: Long,
                 baseDir: String, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val target = new Path(VersionedStore.versionDir(baseDir, batchId), "released").toString
    if (VersionedStore.isCommitted(spark, baseDir, batchId))
      return spark.read.parquet(target)

    val newRows = batch.select(keyCol.as("key"), idCol.as("id"),
      tsCol.as("ts"), round(amountCol * 100).cast("long").as("c"))
    val rows = readLatest(spark, baseDir, "pending").fold(newRows)(_.unionByName(newRows))
    val axis = readLatest(spark, baseDir, "axis").getOrElse {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("key", rows.schema("key").dataType),
          StructField("c_raw", LongType), StructField("f_net", LongType))))
    }

    // Global max event time (epoch millis) = the watermark clock (one-row
    // metadata collect; mirrors Spark's global watermark semantics).
    val prevMax = readLatest(spark, baseDir, "meta")
      .flatMap(_.collect().headOption).map(_.getLong(0))
    val batchMax = rows.agg(max(col("ts"))).collect().head match {
      case r if r.isNullAt(0) => prevMax
      case r => Some((Seq(r.getTimestamp(0).getTime) ++ prevMax).max)
    }
    val wm = batchMax.map(ms => new java.sql.Timestamp(ms - horizonSec * 1000L))

    // Suffix-min envelope over (axis carry + rows), floored at f_net:
    // released cash is the one thing a pending claw can never touch.
    val wAsc = Window.partitionBy("key").orderBy(col("ts"), col("id"))
    val wRev = Window.partitionBy("key").orderBy(col("ts").desc, col("id").desc)
    val wAll = Window.partitionBy("key")
    val netted = rows
      .join(axis, Seq("key"), "left")
      .na.fill(0L, Seq("c_raw", "f_net"))
      .withColumn("__cum", col("c_raw") + sum(col("c")).over(wAsc))
      .withColumn("__rmin", min(col("__cum")).over(wRev))
      .withColumn("__env", greatest(col("f_net"), col("__rmin")))
      // prev row's env; the virtual axis row's env for the first row
      .withColumn("__prev", coalesce(lead(col("__env"), 1).over(wRev),
        greatest(col("f_net"), least(col("c_raw"), min(col("__cum")).over(wAll)))))
      .withColumn("net_cents", col("__env") - col("__prev"))
      .withColumn("__rel", wm.map(col("ts") <= lit(_)).getOrElse(lit(false)))
      .localCheckpoint(true)

    val released = netted.where(col("__rel"))
      .select(col("key"), col("id"), col("ts"), col("net_cents"),
        (col("net_cents").cast("decimal(38,2)") / 100).cast("decimal(38,2)").as("net_amount"))
    val pendingOut = netted.where(!col("__rel"))
      .select(col("key"), col("id"), col("ts"), col("c"))

    // Axis merge + dead-letter: deficit (f_net' − c_raw') is the claw the
    // released rows left outstanding; pending postings may absorb it, the
    // rest dead-letters NOW (attributed to the latest released refund).
    val deltas = netted.groupBy(col("key"))
      .agg(first(col("c_raw")).as("c_raw"), first(col("f_net")).as("f_net"),
        sum(when(col("__rel"), col("c")).otherwise(0L)).as("rel_raw"),
        sum(when(col("__rel"), col("net_cents")).otherwise(0L)).as("rel_net"),
        sum(when(!col("__rel"), greatest(col("c"), lit(0L))).otherwise(0L)).as("absorb_pos"),
        max(when(col("__rel") && col("c") < 0, struct(col("ts"), col("id")))).as("last_refund"))
      .withColumn("c1", col("c_raw") + col("rel_raw"))
      .withColumn("f1", col("f_net") + col("rel_net"))
      .withColumn("dl", greatest(col("f1") - col("c1") - col("absorb_pos"), lit(0L)))
    val deadLetters = deltas.where(col("dl") > 0)
      .select(col("key"), col("last_refund.id").as("id"),
        col("last_refund.ts").as("ts"), col("dl").as("cents"))
    val axisTouched = deltas.select(col("key"),
      (col("c1") + col("dl")).as("c_raw"), col("f1").as("f_net"))
    // keys with no rows this batch carry their axis forward unchanged
    val axisOut = axis.join(deltas.select("key"), Seq("key"), "left_anti")
      .unionByName(axisTouched)

    val relOut = released.localCheckpoint(true)
    val pendOut = pendingOut.localCheckpoint(true)
    val dlOut = deadLetters.localCheckpoint(true)
    val axOut = axisOut.localCheckpoint(true)
    import spark.implicits._
    val metaOut = batchMax.toSeq.toDF("max_ts_ms")
    VersionedStore.publish(spark, baseDir, batchId) { v =>
      relOut.write.parquet(new Path(v, "released").toString)
      pendOut.write.parquet(new Path(v, "pending").toString)
      dlOut.write.parquet(new Path(v, "deadletter").toString)
      axOut.write.parquet(new Path(v, "axis").toString)
      metaOut.write.parquet(new Path(v, "meta").toString)
    }
    spark.read.parquet(target)
  }

  /** Wire the netting stage alone: raw postings/refunds in, horizon-held
    * netted releases + past-horizon dead-letters out. */
  def sink(payments: DataFrame, keyCol: Column, idCol: Column,
           tsCol: Column, amountCol: Column, horizonSec: Long,
           baseDir: String, checkpointDir: String): StreamingQuery =
    payments.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, keyCol, idCol, tsCol, amountCol, horizonSec,
          baseDir, batchId): Unit
      }
      .start()
}
