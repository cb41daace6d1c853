package graft.pipeline

import graft.SparkSpec
import graft.operators.Audit
import graft.sinks.{Archiver, BrCsvSink}
import graft.sources.Tables
import graft.state.StateStore
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** The reference's `main.py` flow as ONE green case: pipeline → per-product
  * human export + per-slot robot export → laudo-style forbidden-value audit
  * → zip archive → run-state metrics, with the blocklist / priority / slot
  * invariants re-derived INDEPENDENTLY from the source tables (not from the
  * pipeline's own intermediates) and asserted on the exported artifacts.
  * The pieces each have their own spec; this is the proof the chain
  * composes.
  */
class MailingE2ESpec extends SparkSpec {
  import ss.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("mailing chain: pipeline -> exports -> audit -> archive -> state") {
    val out = java.nio.file.Files.createTempDirectory("mailing-e2e").toString
    val config = GraftConfig.default.copy(
      humanCutoff = 1500000.0,
      slotGroups = ListMap(
        "08HRS" -> Seq("BUILDING", "MACHINERY"),
        "09HRS" -> Seq("HOUSEHOLD"),
        "10HRS" -> Seq("FURNITURE")))
    val r = MailingPipeline.full(ss, sfDir, config)
    val human = r.human.localCheckpoint(true)
    val robot = r.robot.localCheckpoint(true)

    // --- Blocklist invariant, re-derived from the raw events log ---
    val blocked = Tables.events(ss, sfDir)
      .filter(lower(trim(col("event_type"))) === "error")
      .groupBy("user_id").count().filter(col("count") >= 3)
      .select(col("user_id")).as[Long].collect().toSet
    assert(blocked.nonEmpty, "sf0.001 must contain blockable customers or the test is vacuous")
    val humanKeys = human.select(col("CPF").cast("long")).as[Long].collect().toSet
    val robotKeys = robot.select(col("CPF").cast("long")).as[Long].collect().toSet
    assert(humanKeys.intersect(blocked).isEmpty, "blocked customers leaked into the human mailing")
    assert(robotKeys.intersect(blocked).isEmpty, "blocked customers leaked into the robot mailing")
    assert(humanKeys.intersect(robotKeys).isEmpty, "segmentation split must be a partition")

    // --- Status-filter invariant: no removed status in any export ---
    assert(human.unionByName(robot)
      .filter(lower(col("PRODUTO")).isin(config.statusesToRemove.toSeq: _*))
      .isEmpty, "statusesToRemove must never reach an export")
    assert(r.rejected.count() > 0, "sf0.001 has AUTOMOBILE customers; rejected must be non-empty")

    // --- Priority invariant: level == index in the configured order ---
    val prioMismatch = human.unionByName(robot)
      .select("PRODUTO", "priority_level").as[(String, Int)].collect()
      .filter { case (p, l) =>
        val idx = config.priorityOrder.indexOf(p)
        l != (if (idx < 0) config.priorityOrder.length else idx)
      }
    assert(prioMismatch.isEmpty, s"priority levels off: ${prioMismatch.take(5).toSeq}")

    // --- Segmentation invariant on the raw (pre-format) debt column ---
    assert(human.filter(col("valorDivida") < config.humanCutoff).isEmpty,
      "human segment must be at/above the cutoff")
    assert(robot.filter(col("valorDivida") >= config.humanCutoff).isEmpty,
      "robot segment must be below the cutoff")

    // --- Exports (the RunMailing shapes) ---
    val humanCsv = BrCsvSink.polish(human,
      moneyCols = Seq("valorDivida"),
      idCols = Seq("CPF", "CONTATO_01", "CONTATO_02", "CONTATO_03", "CONTATO_04"),
      textCols = Seq("NOME_CLIENTE", "Cliente_Regulariza"))
    BrCsvSink.writePartitioned(humanCsv, s"$out/human", "PRODUTO", sep = ";")
    BrCsvSink.writeBySlots(
      BrCsvSink.polish(robot, moneyCols = Seq("valorDivida"), idCols = Seq("CPF")),
      col("PRODUTO"), config.slotGroups, s"$out/robot", sep = "|")

    val humanBack = ss.read.option("header", "true").option("sep", ";").csv(s"$out/human")
    assert(humanBack.count() == human.count(), "human export round-trip row count")

    // --- Slot invariant: each slot file holds only its group's products ---
    val robotBack = ss.read.option("header", "true").option("sep", "|").csv(s"$out/robot")
    val slotProducts = robotBack.select(col("slot").cast("string"), col("PRODUTO"))
      .distinct().as[(String, String)].collect()
    assert(slotProducts.nonEmpty, "robot slots must not be empty")
    slotProducts.foreach { case (slot, product) =>
      assert(config.slotGroups(slot).contains(product),
        s"product $product exported into wrong slot $slot")
    }

    // --- Laudo-style audit over the exported values ---
    val forbidden = Audit.forbiddenScan(humanBack, humanBack.columns.toSeq,
      config.statusesToRemove.map(_.toLowerCase))
    assert(forbidden.isEmpty, "audit found forbidden statuses in the exported CSVs")

    // --- Archive ---
    val entries = Archiver.zipDirectory(s"$out/human", s"$out/mailing_human.zip")
    assert(entries > 0 && java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/mailing_human.zip")))

    // --- Run state + metric deltas across two runs ---
    val state = new StateStore(s"$out/state.json")
    state.saveSuccess(Map("human" -> humanKeys.size.toLong, "robot" -> robotKeys.size.toLong))
    assert(state.status.contains("COMPLETED"))
    val first = state.lastMetrics
    assert(first("human") == humanKeys.size.toLong && first("robot") == robotKeys.size.toLong)
    state.saveSuccess(Map("human" -> (humanKeys.size + 7).toLong, "robot" -> robotKeys.size.toLong))
    val delta = state.lastMetrics("human") - first("human")
    assert(delta == 7L, s"metric delta across runs must be readable, got $delta")
    state.saveFailure("boom")
    assert(state.status.contains("FAILED"))
  }

  test("RunMailing.execute ships the run log inside the archive (compressor.py:98)") {
    val out = java.nio.file.Files.createTempDirectory("mailing-runlog").toString
    val state = new StateStore(s"$out/state.json")
    val config = GraftConfig.default.copy(humanCutoff = 1500000.0,
      slotGroups = ListMap("08HRS" -> Seq("BUILDING", "MACHINERY"),
        "09HRS" -> Seq("HOUSEHOLD"), "10HRS" -> Seq("FURNITURE")))
    val s = graft.RunMailing.execute(ss, sfDir, out, config, state)
    assert(s.human > 0 && s.zipEntries > 0 && state.status.contains("COMPLETED"))
    val zf = new java.util.zip.ZipFile(s"$out/mailing_human.zip")
    try {
      val entries = scala.jdk.CollectionConverters.EnumerationHasAsScala(zf.entries())
        .asScala.map(_.getName).toSeq
      assert(entries.exists(e => e.contains("automacao_") && e.endsWith(".log")),
        s"zip must carry the run log, got: ${entries.take(10)}")
    } finally zf.close()
    val logText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s.logPath)), "UTF-8")
    assert(logText.contains("PROCESSO CONCLUIDO COM SUCESSO"))
  }

  test("RunMailing.execute on failure saves FAILED state and logs the stack trace") {
    val out = java.nio.file.Files.createTempDirectory("mailing-fail").toString
    val state = new StateStore(s"$out/state.json")
    intercept[Throwable] {
      graft.RunMailing.execute(ss, s"$out/does-not-exist", out, GraftConfig.default, state)
    }
    assert(state.status.contains("FAILED"), "failure must persist FAILED state")
    val logs = new java.io.File(s"$out/logs").listFiles()
    assert(logs != null && logs.nonEmpty, "run log must exist even on failure")
    val text = new String(java.nio.file.Files.readAllBytes(logs.head.toPath), "UTF-8")
    assert(text.contains("ERRO CRITICO NO FLUXO PRINCIPAL"),
      "failure must be written to the run log")
    assert(graft.RunMailing.OperatorFailureMessage.startsWith("FALHA NA AUTOMA"))
  }
}
