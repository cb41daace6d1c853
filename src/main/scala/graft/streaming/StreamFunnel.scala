package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel (SURVEY §2b S9) — the streaming sibling of
  * the batch [[graft.operators.Funnel]]: per key, advance a strict
  * step1 → step2 → … → stepK state machine as events arrive, emitting the
  * key's funnel row whenever a batch advanced it.
  *
  * Keyed state is the k-slot timestamp vector — O(k·advanced keys),
  * independent of stream length; a key that has never advanced the funnel
  * stores NO state at all (state is written only on progress), so
  * step-2-only noise keys cannot grow the store. Emitted in Update mode
  * (same contract as [[StreamTopK]]: a key re-emits only in batches where
  * it progressed).
  *
  * Caveat shared with every low-watermark-free fold: within a micro-batch
  * events are processed in event-time order, but a step event arriving in
  * a LATER batch than a logically-later event cannot retroactively rewire
  * the chain (state is already advanced past it). Batch [[graft.operators.Funnel]]
  * over the settled log is the replay/repair path; the spec proves the
  * two agree when events arrive in order.
  */
object StreamFunnel {

  final case class StepEvent(key: Long, tsUs: Long, step: String)
  final case class FunnelRow(key: Long, times: Seq[Option[Long]], stepsCompleted: Int)

  /** Advance the k-slot vector with a batch of events (processed in
    * (tsUs, step-index) order — deterministic within the batch). */
  private[streaming] def advance(state: IndexedSeq[Option[Long]],
                                 events: Seq[StepEvent],
                                 steps: IndexedSeq[String]): IndexedSeq[Option[Long]] = {
    var st = state
    events.sortBy(e => (e.tsUs, steps.indexOf(e.step))).foreach { e =>
      val p = st.count(_.isDefined)
      if (p < steps.length && e.step == steps(p) &&
          (p == 0 || st(p - 1).exists(e.tsUs > _)))
        st = st.updated(p, Some(e.tsUs))
    }
    st
  }

  /** @param idleTimeout optional processing-time idle eviction; evicted
    *   keys emit nothing (the sink holds their last row) and re-seed from
    *   scratch if they return — the [[StreamTopK]] contract. */
  def funnelStream(ds: Dataset[StepEvent], steps: Seq[String],
                   idleTimeout: Option[String] = None): Dataset[FunnelRow] = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct, got $steps")
    val stepsIx = steps.toIndexedSeq
    implicit val stateEnc = Encoders.kryo[IndexedSeq[Option[Long]]]
    implicit val outEnc = Encoders.product[FunnelRow]
    import ds.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[IndexedSeq[Option[Long]], FunnelRow](
        OutputMode.Update(), timeoutConf) {
        (key, rows, state: GroupState[IndexedSeq[Option[Long]]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(IndexedSeq.fill(stepsIx.length)(Option.empty[Long]))
            val next = advance(prev, rows.toSeq, stepsIx)
            if (next != prev) {
              state.update(next)
              idleTimeout.foreach(state.setTimeoutDuration)
              Iterator.single(FunnelRow(key, next, next.count(_.isDefined)))
            } else {
              // No progress: persist NOTHING for never-advanced keys (a
              // purchase-only user must not pin a k-slot empty vector
              // forever — an absent key re-derives the same empty vector
              // next batch), and for live keys just refresh the idle clock.
              if (state.exists) idleTimeout.foreach(state.setTimeoutDuration)
              Iterator.empty
            }
          }
      }
  }

  /** Start a memory-sink Update-mode query — the common harness shape. */
  def start(ds: Dataset[StepEvent], steps: Seq[String], queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    funnelStream(ds, steps).writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .start()
}
