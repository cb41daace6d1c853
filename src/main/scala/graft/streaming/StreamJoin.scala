package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Stream-stream join with bounded state (SURVEY §2b S6).
  *
  * The canonical attribution shape: match right-stream events (clicks) to
  * left-stream events (impressions) on a key, with the right timestamp
  * inside `[leftTs, leftTs + within]`. BOTH sides carry watermarks and the
  * join condition constrains the two event times relative to each other —
  * that pair is what lets Structured Streaming bound its symmetric join
  * state: each side's buffered rows are evicted as soon as the other
  * side's watermark passes the end of their match window, so state size is
  * O(events per watermark horizon), not O(stream history). Without the
  * time-range conjunct the state grows forever — the classic
  * stream-stream-join OOM.
  *
  * Executes as `StreamingSymmetricHashJoin`: each micro-batch
  * hash-partitions both sides by the key, so scale-out is the same
  * shuffle-on-key story as a batch join, plus per-partition keyed state.
  */
object StreamJoin {

  /** Interval join. `within` is a SQL interval literal body, e.g.
    * `"10 minutes"`; `watermark` is the lateness bound for both sides.
    * Column names must be distinct across the two sides.
    *
    * `joinType` "inner" emits matches as they arrive; "left_outer" ALSO
    * emits each unmatched left row null-padded — but only once the right
    * watermark has passed the end of its match window (before that a match
    * could still arrive), so outer results trail live matches by the
    * watermark delay. That is the attribution-report shape: impressions
    * with their click, or with NULL once no click can come. */
  def intervalJoin(left: DataFrame, leftTs: String, leftKey: String,
                   right: DataFrame, rightTs: String, rightKey: String,
                   within: String, watermark: String,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"interval $within"),
      joinType)
  }
}
