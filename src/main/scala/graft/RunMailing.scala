package graft

import org.apache.spark.sql.functions._
import graft.pipeline.MailingPipeline
import graft.sinks.{Archiver, BrCsvSink}
import graft.state.StateStore

/** End-to-end mailing run, the engine's analog of the reference's
  * `main.py`: process → export per-product human CSVs + robot file →
  * archive → persist run state. Usage:
  * `sbt "runMain graft.RunMailing <sfDir> <outDir>"`. */
object RunMailing {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = GraftSession.local("graft-mailing", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val state = new StateStore(s"$outDir/state.json")
    try {
      val r = MailingPipeline.full(spark, sfDir, humanCutoff = 1500000.0)

      val human = BrCsvSink.polish(r.human,
        moneyCols = Seq("valorDivida"),
        idCols = Seq("CPF", "CONTATO_01", "CONTATO_02", "CONTATO_03", "CONTATO_04"),
        textCols = Seq("NOME_CLIENTE", "Cliente_Regulariza"))
      BrCsvSink.writePartitioned(human, s"$outDir/human", "PRODUTO", sep = ";")

      val robot = BrCsvSink.polish(r.robot, moneyCols = Seq("valorDivida"), idCols = Seq("CPF"))
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
