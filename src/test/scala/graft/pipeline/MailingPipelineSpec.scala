package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MailingPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("full pipeline produces the canonical layout, both channels, and rejects") {
    val r = MailingPipeline.full(ss, sfDir, humanCutoff = 1500000.0)
    val human = r.human.cache()
    assert(human.columns.toSeq == MailingPipeline.CanonicalColumns)
    val nHuman = human.count()
    val nRobot = r.robot.count()
    assert(nHuman > 0 && nRobot > 0)
    // segmentation is a real partition of the kept set
    assert(human.filter(col("valorDivida") < 1500000.0).count() == 0)
    // rejected side-output carries the reason
    val rej = r.rejected.collect()
    assert(rej.nonEmpty && rej.forall(_.getAs[String]("motivo_remocao") == "AUTOMOBILE"))
    // blocklisted customers (≥3 error events) are gone from both channels
    val blockedIds = graft.sources.Tables.events(ss, sfDir)
      .filter(col("event_type") === "error").groupBy("user_id").count()
      .filter(col("count") >= 3).select("user_id").collect().map(_.getLong(0)).toSet
    val humanIds = human.select("CPF").collect().map(_.getLong(0)).toSet
    assert(blockedIds.intersect(humanIds).isEmpty)
    human.unpersist()
  }

  test("stage report observes real per-stage row counts") {
    val r = MailingPipeline.full(ss, sfDir)
    val counts = r.report.collect(r.human).toMap
    assert(counts.keySet == Set("blocklist", "aggregates", "status_filter"))
    // sf0.001: 150 customers, 15 blocklisted, then AUTOMOBILE segment rejected
    assert(counts("blocklist") == 135L)
    assert(counts("aggregates") == 135L)
    assert(counts("status_filter") > 0L && counts("status_filter") < 135L)
  }
}
