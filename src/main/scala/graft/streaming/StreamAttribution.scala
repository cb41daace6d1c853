package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming marketing-touch attribution (SURVEY §2b S13) — the streaming
  * sibling of the batch [[graft.operators.Attribution]]: per user, keep the
  * touch events (view/click/…) of the last `lookbackUs` micros in keyed
  * state; when a conversion arrives, emit its last-touch attribution row
  * immediately — the real-time "which campaign gets credit" feed a
  * mailing/campaign shop alerts on.
  *
  * State is the per-user touch buffer PRUNED to the lookback horizon on
  * every batch (and capped at `maxTouches` newest — a bot firehose cannot
  * grow the store): O(touches-in-window · active users), the same bounded-
  * state discipline as the S6 interval join, with the lookback playing the
  * role of the watermark horizon.
  *
  * Ordering contract (shared with S9): within a batch, events process in
  * event-time order with touches before conversions at equal timestamps
  * (matching the batch operator's `touch_us <= conv_us` inclusive bound);
  * a touch arriving in a LATER batch than its conversion cannot
  * retroactively re-attribute (the row was already emitted). Batch
  * [[graft.operators.Attribution]] over the settled log is the
  * replay/repair path; the spec pins agreement on in-order arrival.
  */
object StreamAttribution {

  final case class TouchEvent(user: Long, id: Long, tsUs: Long, typ: String, cents: Long)
  final case class AttributionRow(convId: Long, user: Long, convUs: Long, cents: Long,
                                  nTouches: Long, lastTouchId: Long, lastTouchType: String,
                                  lastTouchUs: Long)

  /** Touch buffer: (tsUs, id, typ) tuples, newest-last. */
  private type Buf = Vector[(Long, Long, String)]

  private[streaming] def process(buf: Buf, events: Seq[TouchEvent],
                                 conversionType: String, touchTypes: Set[String],
                                 lookbackUs: Long, maxTouches: Int): (Buf, Seq[AttributionRow]) = {
    var b = buf
    val out = Seq.newBuilder[AttributionRow]
    // event-time order; at equal ts a touch sorts before a conversion so
    // the batch operator's inclusive bound is reproduced
    events.sortBy(e => (e.tsUs, if (e.typ == conversionType) 1 else 0, e.id)).foreach { e =>
      if (touchTypes.contains(e.typ)) {
        b = (b :+ ((e.tsUs, e.id, e.typ))).takeRight(maxTouches)
      } else if (e.typ == conversionType) {
        val inWindow = b.filter(t => t._1 >= e.tsUs - lookbackUs && t._1 <= e.tsUs)
        if (inWindow.nonEmpty) {
          val last = inWindow.maxBy(t => (t._1, t._2))
          out += AttributionRow(e.id, e.user, e.tsUs, e.cents,
            inWindow.size.toLong, last._2, last._3, last._1)
        }
        // prune everything the NEXT conversion (ts >= this one, in-order)
        // can no longer see
        b = b.dropWhile(_._1 < e.tsUs - lookbackUs)
      }
    }
    // horizon prune for never-converting users too: under in-order arrival
    // nothing before (batch max ts − lookback) can enter a future window
    if (events.nonEmpty) {
      val horizon = events.map(_.tsUs).max - lookbackUs
      b = b.dropWhile(_._1 < horizon)
    }
    (b, out.result())
  }

  def attributeStream(ds: Dataset[TouchEvent], conversionType: String,
                      touchTypes: Seq[String], lookbackUs: Long,
                      maxTouches: Int = 10000): Dataset[AttributionRow] = {
    require(lookbackUs > 0, s"lookbackUs must be positive, got $lookbackUs")
    val touchSet = touchTypes.toSet
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.kryo[Buf]
    implicit val outEnc = Encoders.product[AttributionRow]
    ds.groupByKey(_.user)
      .flatMapGroupsWithState[Buf, AttributionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[Buf]) =>
          val prev = state.getOption.getOrElse(Vector.empty)
          val (next, out) = process(prev, rows.toSeq, conversionType, touchSet,
            lookbackUs, maxTouches)
          if (next.isEmpty) state.remove() else state.update(next)
          out.iterator
      }
  }

  /** Start a memory-sink Append-mode query — the common harness shape. */
  def start(ds: Dataset[TouchEvent], conversionType: String, touchTypes: Seq[String],
            lookbackUs: Long, queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    attributeStream(ds, conversionType, touchTypes, lookbackUs).writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .start()
}
