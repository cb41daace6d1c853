package graft.pipeline

import graft.SparkSpec
import scala.collection.immutable.ListMap

class GraftConfigSpec extends SparkSpec {

  private val ini =
    """; reference-shaped config for the test schema
      |[BLOCKLIST]
      |critical_statuses =
      |    error
      |    fatal
      |threshold = 2
      |
      |[FILTERS]
      |statuses_to_remove = automobile, machinery
      |
      |[SEGMENTACAO]
      |human_cutoff = 250000.5
      |
      |[PRIORITIES]
      |order =
      |    HOUSEHOLD,
      |    BUILDING
      |
      |[EXPORT_COLUMNS]
      |columns = NOME_CLIENTE, PRODUTO, CPF, valorDivida, segmento
      |
      |[ROBO]
      |grupos_08hrs = EPB,EMR
      |grupos_09hrs = ERO
      |""".stripMargin

  test("fromIni parses multi-line lists, scalars, and slot groups") {
    val c = GraftConfig.fromIni(ini)
    assert(c.criticalStatuses == Seq("error", "fatal"))
    assert(c.blockThreshold == 2)
    assert(c.statusesToRemove == Set("automobile", "machinery"))
    assert(c.humanCutoff == 250000.5)
    assert(c.priorityOrder == Seq("HOUSEHOLD", "BUILDING"))
    assert(c.exportColumns == Seq("NOME_CLIENTE", "PRODUTO", "CPF", "valorDivida", "segmento"))
    assert(c.slotGroups == ListMap("08HRS" -> Seq("EPB", "EMR"), "09HRS" -> Seq("ERO")))
  }

  test("malformed lines raise instead of silently running on defaults") {
    intercept[IllegalArgumentException] {
      GraftConfig.fromIni("[BLOCKLIST]\nthreshold 5\n")
    }
  }

  test("absent sections fall back to the pinned defaults") {
    val c = GraftConfig.fromIni("[SEGMENTACAO]\nhuman_cutoff = 1.0\n")
    assert(c.humanCutoff == 1.0)
    assert(c.criticalStatuses == GraftConfig.default.criticalStatuses)
    assert(c.exportColumns == MailingPipeline.CanonicalColumns)
    assert(c.slotGroups.isEmpty)
  }

  test("a config actually drives the pipeline (columns, cutoff, threshold)") {
    val c = GraftConfig.fromIni(ini)
    val r = MailingPipeline.full(ss, "/root/testdata/sf0.001", c)
    // export columns narrowed by config
    assert(r.human.columns.toSeq == c.exportColumns)
    // cutoff 250000.5: the human channel only keeps debts at/above it
    import org.apache.spark.sql.functions.col
    assert(r.human.filter(col("valorDivida") < 250000.5).count() == 0)
    // threshold 2 blocks at least as many clients as the default 3
    val defaultKept = MailingPipeline.full(ss, "/root/testdata/sf0.001").human.count() +
      MailingPipeline.full(ss, "/root/testdata/sf0.001").robot.count()
    val strictKept = r.human.count() + r.robot.count()
    assert(strictKept <= defaultKept)
  }
}
