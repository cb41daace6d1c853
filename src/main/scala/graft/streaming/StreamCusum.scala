package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM level-shift monitor (SURVEY §2b S18) — the streaming
  * sibling of [[graft.operators.Changepoints.cusumFixedRef]]: per key, the
  * one-sided CUSUM against a FROZEN reference level (trained on the settled
  * corpus, same frozen-stats discipline as S12/S15) is maintained
  * incrementally and every observation emits its (cusum_q, alarm) verdict
  * as it arrives — the real-time "this metric's level shifted" alert.
  *
  * The batch closed form is `s_t = p_t − min(0, min_{j≤t} p_j)` over
  * prefix sums of `x − ref`; both terms are left-folds, so the ENTIRE
  * per-key state is two Longs — (p, minP) — O(active keys), no buffer,
  * no timeout eviction needed. That a textbook-sequential detector
  * compresses to two Longs of keyed state is exactly why the fixed-ref
  * form (not the in-sample-mean form, which needs the key's full history)
  * is the streaming variant.
  *
  * Ordering contract (shared with S9/S13): within a batch, rows process in
  * (ord, tiebreak) order; across batches, arrival order must respect ord
  * per key. Batch [[graft.operators.Changepoints]] over the settled log is
  * the replay/repair path; the spec pins stream == batch on in-order
  * arrival across a multi-batch feed.
  */
object StreamCusum {

  final case class Obs(key: String, ord: Long, x: Long)
  final case class CusumRow(key: String, ord: Long, x: Long, cusumQ: Long, alarm: Long)

  /** (prefix sum p, running min of p). */
  private type St = (Long, Long)

  private[streaming] def step(st: St, ref: Long, h: Long,
                              rows: Seq[Obs]): (St, Seq[CusumRow]) = {
    var (p, minP) = st
    val out = rows.sortBy(r => (r.ord, r.x)).map { r =>
      p += r.x - ref
      minP = math.min(minP, p)
      val s = p - math.min(0L, minP)
      CusumRow(r.key, r.ord, r.x, s, if (s >= h) 1L else 0L)
    }
    ((p, minP), out)
  }

  def monitor(ds: Dataset[Obs], ref: Long, h: Long): Dataset[CusumRow] = {
    require(h >= 1, "h >= 1")
    monitorWith(ds, _ => (ref, h))
  }

  /** Per-key frozen parameters — production monitors freeze a DIFFERENT
    * reference level and alarm threshold per metric (a purchase stream's
    * mean is not a click stream's). `params` maps key → (ref, h); a key
    * with no entry fails the task loudly (an unconfigured alert silently
    * defaulting its threshold is worse than a crash). The map is one
    * entry per monitored metric — closure-shipped bounded metadata. */
  def monitorKeyed(ds: Dataset[Obs], params: Map[String, (Long, Long)]): Dataset[CusumRow] = {
    require(params.values.forall(_._2 >= 1), "h >= 1 for every key")
    monitorWith(ds, k => params.getOrElse(k,
      throw new IllegalArgumentException(s"StreamCusum: no (ref, h) configured for key '$k'")))
  }

  private def monitorWith(ds: Dataset[Obs],
                          paramsOf: String => (Long, Long)): Dataset[CusumRow] = {
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc = Encoders.product[CusumRow]
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[St, CusumRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[St]) =>
          val (ref, h) = paramsOf(key)
          val (st, out) = step(state.getOption.getOrElse((0L, 0L)), ref, h, rows.toSeq)
          state.update(st)
          out.iterator
      }
  }
}
