package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-granularity profile of ONE registered query: wall time per Spark
  * job (description, duration, gap to previous job's end) — the view the
  * stage profilers (Prof/ProfGraph) can't give for DRIVER-LOOP queries
  * (streaming drives, iterative graph ops) whose cost is many small jobs
  * plus driver-side gaps (planning, fs round trips, collects) between
  * them. Usage: `sbt "runMain graft.ProfJobs <sfDir> <cpus> <query>"`.
  * Runs the query twice (cold, warm) and prints per-job lines + a
  * jobs-total vs wall-total summary; the difference IS the driver-side
  * gap the job view exists to expose. */
object ProfJobs {
  final case class J(id: Int, desc: String, t0: Long, var t1: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = if (args.length > 1) args(1).toInt else 32
    val name = if (args.length > 2) args(2) else "q168_stream_netting"
    val spark = GraftSession.local(s"graft-profjobs-$name", cpus)
    val fn = SparkEntry.queries(name)

    val jobs = scala.collection.mutable.ArrayBuffer.empty[J]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs += J(js.jobId, d, js.time)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == je.jobId).foreach(_.t1 = je.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    (1 to 2).foreach { run =>
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbench.BusDrain.drain(spark.sparkContext)
      val js = jobs.synchronized(jobs.toVector).sortBy(_.t0)
      val jobSum = js.map(j => math.max(0L, j.t1 - j.t0)).sum / 1e3
      println(f"== $name run$run wall=$wall%.2fs rows=$n jobs=${js.size} jobSum=$jobSum%.2fs gap=${wall - jobSum}%.2fs")
      var prevEnd = js.headOption.map(_.t0).getOrElse(0L)
      js.foreach { j =>
        val gap = (j.t0 - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, j.t1)
        println(f"  job ${j.id}%4d ${(j.t1 - j.t0) / 1e3}%7.3fs gap=$gap%7.3fs ${j.desc.take(80)}")
      }
    }
    spark.stop()
  }
}
