package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Per-stage audit counts, the reference's `ExecutionReporter`
  * (`/root/reference/src/logger_setup.py`) re-expressed without extra
  * actions: each stage registers a `df.observe(name, count(*))` so row
  * counts ride along with whatever action the caller eventually runs —
  * no O(stages) extra passes over 100 TB like calling `.count()` per
  * stage would cost. */
final class StageReport {
  private val stages = mutable.ArrayBuffer.empty[String]

  def track(name: String, df: DataFrame): DataFrame = {
    stages += name
    df.observe(name, count(lit(1)).as("rows"))
  }

  /** Collect observed counts. Observed metrics attach to the QueryExecution
    * that actually ran, so this executes the frame's own plan once (a later
    * `df.count()` builds a different QueryExecution and would leave this
    * one's accumulators empty). In a long-lived service, register a
    * QueryExecutionListener instead and let metrics ride the normal action. */
  def collect(df: DataFrame): Seq[(String, Long)] = {
    df.queryExecution.toRdd.count()
    val listed = df.queryExecution.observedMetrics
    stages.toSeq.flatMap(n => listed.get(n).map(r => n -> r.getAs[Long]("rows")))
  }
}
