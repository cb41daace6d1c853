package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Stream-static enrichment (dimension join on a live stream).
  *
  * The static side is broadcast: every micro-batch joins against the
  * executor-local copy, so the stream never shuffles — the canonical shape
  * for enriching an event stream with a small dimension table at any scale.
  * For dimensions too large to broadcast, pre-bucket the static side on the
  * join key ([[graft.operators.Bucketing]]) instead and drop the hint. */
object StreamEnrich {

  def withDimension(stream: DataFrame, dim: DataFrame, joinCols: Seq[String],
                    joinType: String = "left_outer"): DataFrame =
    stream.join(broadcast(dim), joinCols, joinType)
}
