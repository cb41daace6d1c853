package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

import scala.collection.mutable

/** Dev profiling harness for the iterative graph family: run a query's
  * sub-stages at a given SF and print, per Spark STAGE, the task count,
  * max task, and median task — the hot-task locator the per-query skew
  * numbers in the bench capture can't give (they aggregate all stages).
  * Usage: `sbt "runMain graft.ProfGraph <sfDir> [cpus] [what]"`. */
object ProfGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("data/sf1")
    val cpus = if (args.length > 1) args(1).toInt else 32
    val what = if (args.length > 2) args(2) else "bfs"
    val spark = GraftSession.local("graft-prof-graph", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val durs = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    val names = mutable.Map.empty[Int, String]
    val bytes = mutable.Map.empty[Int, (Long, Long)] // shuffle (read, write)
    val gc = mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        durs.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) +=
          t.taskInfo.duration
        val m = t.taskMetrics
        if (m != null) {
          val (r, w) = bytes.getOrElse(t.stageId, (0L, 0L))
          bytes(t.stageId) = (r + m.shuffleReadMetrics.totalBytesRead,
            w + m.shuffleWriteMetrics.bytesWritten)
          gc(t.stageId) = gc.getOrElse(t.stageId, 0L) + m.jvmGCTime
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized {
          names(s.stageInfo.stageId) = s.stageInfo.rddInfos
            .sortBy(_.id).map(r => r.scope.map(_.name).getOrElse(r.name))
            .distinct.mkString(">").take(160)
        }
    })

    def report(tag: String)(body: => Long): Unit = {
      org.apache.spark.graftbench.BusDrain.drain(spark.sparkContext)
      durs.synchronized { durs.clear() }; names.clear(); bytes.clear(); gc.clear()
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus so this section's tail TaskEnd events
      // are printed here, not leaked into the next section (the Bench
      // fence discipline)
      org.apache.spark.graftbench.BusDrain.drain(spark.sparkContext)
      println(f"== $tag: ${sec}%.2fs rows=$n")
      durs.toSeq.sortBy(-_._2.sum).take(20).foreach { case (sid, ds) =>
        val s = ds.sorted
        val (r, w) = bytes.getOrElse(sid, (0L, 0L))
        println(f"   stage $sid%5d tasks=${s.size}%4d sum=${s.sum / 1e3}%8.2fs " +
          f"max=${s.last / 1e3}%7.2fs med=${s(s.size / 2) / 1e3}%6.2fs " +
          f"shR=${r / 1e6}%8.1fMB shW=${w / 1e6}%8.1fMB " +
          f"gc=${gc.getOrElse(sid, 0L) / 1e3}%7.2fs  ${names.getOrElse(sid, "?")}")
      }
    }

    var und: DataFrame = null
    report("coOccurrenceEdges") {
      und = graft.operators.Graph.coOccurrenceEdges(
        Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey")
      und.count()
    }

    what match {
      case "bfs" =>
        val seeds = und.select(col("u").as("node")).union(und.select(col("v")))
          .distinct().where(col("node") % 100 === 0)
        report("seeds") { seeds.count() }
        val sym = graft.operators.Graph.symmetrize(und)
        report("bfs_3rounds") {
          graft.operators.Graph.seedDistances(sym, seeds, maxDepth = 3).count()
        }
      case "kcore" =>
        // k/rounds env-overridable so the q126 shape (k=80, 5 full rounds)
        // can be stage-profiled too — the default k=10 fixpoints in 1.
        val k = sys.env.getOrElse("SPARK_GRAFT_PROF_K", "10").toInt
        val rounds = sys.env.getOrElse("SPARK_GRAFT_PROF_ROUNDS", "5").toInt
        report(s"kcore_k${k}_r$rounds") {
          graft.operators.Graph.kCorePeel(und, k = k, rounds = rounds).count()
        }
      case "pagerank" =>
        report("pagerank") {
          graft.operators.Graph.pageRank(
            graft.operators.Graph.symmetrize(und), 5).count()
        }
      case "triangles" =>
        // A/B the documented broadcast-adjacency escape hatch in ONE
        // session: broadcastDegrees=true is the small-graph fast path
        // (adjacency ~96 MB at sf1), =false the billion-node shuffle
        // degrade — the sf10 scale point measures where the cliff sits.
        (1 to 2).foreach { i =>
          report(s"tri_broadcast_$i") {
            graft.operators.Graph.triangleCounts(und).count()
          }
          report(s"tri_shuffle_$i") {
            graft.operators.Graph.triangleCounts(und, broadcastDegrees = false).count()
          }
        }
      case "neardup" =>
        val docs = Tables.documents(spark, sfDir)
        (1 to 2).foreach { i =>
          report(s"q146_weighted_$i") {
            graft.operators.NearDup.weightedJaccardPairs(docs, col("doc_id"),
              col("text"), k = 3, threshold = 0.5).count()
          }
        }
      case "edgesab" =>
        // A/B the pair-expansion strategies in ONE session (same host
        // window, fair under ambient load): in-row HOF expansion
        // (interpreted transform/slice/flatten) vs codegen'd self-join.
        import org.apache.spark.sql.expressions.Window
        def selfJoinEdges(): DataFrame = {
          val items = Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey").as("gk"), col("l_partkey").cast("long").as("item"))
            .distinct()
          val sized = items
            .withColumn("__n", count(lit(1)).over(Window.partitionBy("gk")))
            .where(col("__n").between(2, 1000)).drop("__n")
          sized.as("a").join(sized.as("b"),
              col("a.gk") === col("b.gk") && col("a.item") < col("b.item"))
            .select(col("a.item").as("u"), col("b.item").as("v"))
            .distinct()
        }
        (1 to 2).foreach { i =>
          report(s"hof_expand_$i") {
            graft.operators.Graph.coOccurrenceEdges(
              Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey").count()
          }
          report(s"self_join_$i") { selfJoinEdges().count() }
        }
      case "degab" =>
        // A/B the endpoint-degree primitive over the checkpointed edge
        // base, interleaved ×2: union-of-two-projections (two cached
        // scans) vs explode(array(u,v)) (one scan, codegen'd Generate).
        // The degree count runs 6× per q126 peel and once per q103 —
        // if the scan is the cost, halving passes shows here.
        (1 to 2).foreach { i =>
          report(s"deg_union_$i") {
            und.select(col("u").as("node")).unionAll(und.select(col("v").as("node")))
              .groupBy("node").agg(count(lit(1)).as("deg")).count()
          }
          report(s"deg_explode_$i") {
            und.select(explode(array(col("u"), col("v"))).as("node"))
              .groupBy("node").agg(count(lit(1)).as("deg")).count()
          }
        }
      case "plans" =>
        // Build-side audit (load-insensitive): materialize, then print the
        // AQE-final plan's join/broadcast lines. An edge-scale frame on the
        // BUILD side of a BroadcastHashJoin is the q109 inversion class.
        def joins(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
          df.count()
          val plan = df.queryExecution.executedPlan.toString
          println(s"---- $tag ----")
          plan.linesIterator.filter(l =>
            l.contains("Join") || l.contains("BroadcastExchange") ||
              l.contains("Exchange") || l.contains("Scan")).foreach(l =>
            println("  " + l.take(150)))
        }
        // DupClusters round-1 one-hop push (replicated shape)
        val e0 = und.select(col("u").as("src"), col("v").as("dst")).localCheckpoint(true)
        val symE = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        val labels = symE.groupBy(col("src").as("id"))
          .agg(least(col("src").as("id"), min(col("dst"))).as("cluster_id"))
          .localCheckpoint(true)
        joins("dupclusters_push", labels.join(symE, col("id") === col("src"))
          .select(col("dst").as("id2"), col("cluster_id")))
        // PageRank degree join + contribution join
        val sym2 = graft.operators.Graph.symmetrize(und)
        val e = graft.operators.Checkpoints.materializeOnce(sym2)
        val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        joins("pagerank_edgesDeg", e.join(deg, col("src") === col("node")))
        val scores = deg.select(col("node"), lit(1000000L).as("score"))
        val edgesDeg = e.join(deg, col("src") === col("node"))
          .select(col("src"), col("dst"), col("deg"))
        joins("pagerank_recv", scores.join(edgesDeg, col("node") === col("src")))
        // kCore round-1 degree count + drop anti joins
        val drop = graft.operators.Graph.kCorePeel(und, k = 10, rounds = 1)
        joins("kcore_r1", drop)
      case "symprobe" =>
        val sym = graft.operators.Graph.symmetrize(und)
        report("sym_count") { sym.count() }
        report("sym_checkpoint") { sym.localCheckpoint(true).count() }
        report("sym_persist_ser") {
          val p = sym.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
          val n = p.count(); p.unpersist(true); n
        }
      case _ => ()
    }
    spark.stop()
  }
}
