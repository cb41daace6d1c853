package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running top-k per key over a stream (SURVEY §2b S7) — the streaming
  * sibling of the batch [[graft.plans.TopKPerKey]] operator.
  *
  * Keyed state holds ONLY the current k best (item, score) pairs per key —
  * O(k·keys) state, independent of stream length — and each micro-batch
  * folds its new rows into that bounded list with the same
  * keep-the-k-best discipline as the batch operator's heaps. Emitted in
  * Update mode: a key re-emits its refreshed top-k only in batches where
  * it received rows.
  *
  * Scale shape: `groupByKey` hash-partitions each micro-batch by key (the
  * one shuffle), then state lookups are local to the partition's state
  * store — the standard `mapGroupsWithState` scaling story. An optional
  * processing-time timeout evicts idle keys so an unbounded key domain
  * (e.g. per-session rankings) cannot grow state forever.
  */
object StreamTopK {

  final case class Scored(key: String, item: String, score: Double)
  final case class TopK(key: String, items: Seq[String], scores: Seq[Double])

  /** Fold `fresh` rows into the k best seen. Total order (score desc, item
    * asc) keeps results deterministic under ties; duplicate items keep
    * their best score. */
  private[streaming] def merge(current: Seq[(String, Double)], fresh: Iterator[Scored],
                               k: Int): Seq[(String, Double)] = {
    val best = scala.collection.mutable.Map[String, Double](current: _*)
    fresh.foreach { s =>
      if (best.get(s.item).forall(_ < s.score)) best(s.item) = s.score
    }
    best.toSeq.sortBy { case (item, score) => (-score, item) }.take(k)
  }

  /** @param idleTimeout optional processing-time idle eviction (e.g.
    *   "1 hour"); None keeps every key's state for the query lifetime.
    *
    * Timeout semantics: eviction emits NOTHING — the sink already holds the
    * key's last top-k, and re-emitting it would be a duplicate Update row
    * indistinguishable from a real change. Eviction also RESETS the key:
    * rows arriving after a timeout re-seed an empty top-k, so a long-idle
    * key's ranking can appear to regress to only recently-seen items. That
    * is the price of bounded state over an unbounded key domain; size
    * `idleTimeout` to the longest gap worth remembering. */
  def runningTopK(ds: Dataset[Scored], k: Int,
                  idleTimeout: Option[String] = None): Dataset[TopK] = {
    require(k > 0, s"k must be positive, got $k")
    implicit val stateEnc = Encoders.kryo[Seq[(String, Double)]]
    implicit val outEnc = Encoders.product[TopK]
    import ds.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Seq[(String, Double)], TopK](
        OutputMode.Update(), timeoutConf) {
        (key, rows, state: GroupState[Seq[(String, Double)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val merged = merge(state.getOption.getOrElse(Seq.empty), rows, k)
            state.update(merged)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(TopK(key, merged.map(_._1), merged.map(_._2)))
          }
      }
  }

  /** Start a memory-sink Update-mode query — the common harness shape. */
  def start(ds: Dataset[Scored], k: Int, queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    runningTopK(ds, k).writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .start()
}
