package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{GraftConfig, MailingPipeline}
import graft.sinks.{Archiver, BrCsvSink}
import graft.state.StateStore

/** End-to-end mailing run, the engine's analog of the reference's
  * `main.py`: process → export per-product human CSVs + per-TIME-SLOT
  * robot CSVs (the `gerador_robo_mestre` grouping) → archive → persist
  * run state. Usage: `sbt "runMain graft.RunMailing <sfDir> <outDir>
  * [config.ini]"` — the optional INI config drives status sets,
  * thresholds, cutoff and the product→slot groups. */
object RunMailing {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = GraftSession.local("graft-mailing", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val state = new StateStore(s"$outDir/state.json")
    try {
      val config = args.drop(2).headOption.map(GraftConfig.fromFile).getOrElse(
        GraftConfig.default.copy(
          humanCutoff = 1500000.0,
          // test-schema analog of [ROBO] grupos_08hrs/09hrs/10hrs
          slotGroups = scala.collection.immutable.ListMap(
            "08HRS" -> Seq("BUILDING", "MACHINERY"),
            "09HRS" -> Seq("HOUSEHOLD"),
            "10HRS" -> Seq("FURNITURE"))))
      val r = MailingPipeline.full(spark, sfDir, config)

      val human = BrCsvSink.polish(r.human,
        moneyCols = Seq("valorDivida"),
        idCols = Seq("CPF", "CONTATO_01", "CONTATO_02", "CONTATO_03", "CONTATO_04"),
        textCols = Seq("NOME_CLIENTE", "Cliente_Regulariza"))
      BrCsvSink.writePartitioned(human, s"$outDir/human", "PRODUTO", sep = ";")

      val robot = BrCsvSink.polish(r.robot, moneyCols = Seq("valorDivida"), idCols = Seq("CPF"))
      if (config.slotGroups.nonEmpty)
        BrCsvSink.writeBySlots(robot, col("PRODUTO"), config.slotGroups, s"$outDir/robot", sep = "|")
      else
        BrCsvSink.writePartitioned(robot, s"$outDir/robot", "PRODUTO", sep = "|")

      r.rejected.coalesce(1).write.mode("overwrite")
        .option("header", "true").option("sep", ";").csv(s"$outDir/rejected")

      val nHuman = spark.read.option("header", "true").option("sep", ";").csv(s"$outDir/human").count()
      val nRobot = spark.read.option("header", "true").option("sep", "|").csv(s"$outDir/robot").count()
      val stageCounts = r.report.collect(r.human)

      val entries = Archiver.zipDirectory(s"$outDir/human", s"$outDir/mailing_human.zip")
      state.saveSuccess(Map("human" -> nHuman, "robot" -> nRobot, "zip_entries" -> entries.toLong))

      println(s"STAGES=${stageCounts.map { case (n, c) => s"$n:$c" }.mkString(",")}")
      println(s"HUMAN=$nHuman ROBOT=$nRobot ZIP_ENTRIES=$entries")
      println(s"STATE=${state.status.getOrElse("?")} METRICS=${state.lastMetrics.toSeq.sorted.mkString(",")}")
    } catch {
      case e: Throwable =>
        state.saveFailure(e.getMessage)
        throw e
    } finally spark.stop()
  }
}
