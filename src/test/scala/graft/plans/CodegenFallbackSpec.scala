package graft.plans

import graft.SparkSpec

/** Regression net for SILENT whole-stage-codegen fallback (SURVEY §5).
  *
  * When a generated stage fails to compile (Janino CompileException), Spark
  * by default logs and re-runs the stage interpreted — correctness holds,
  * throughput quietly drops (this is how q53's fused-join duplication bug
  * shipped unnoticed in round 5). With `spark.sql.codegen.fallback=false`
  * the compile error THROWS instead, so executing every registered verify
  * query under that flag turns any future codegen regression into a red
  * test rather than a perf mystery.
  */
class CodegenFallbackSpec extends SparkSpec {

  test("every registered query executes with codegen fallback disabled") {
    val prev = ss.conf.get("spark.sql.codegen.fallback", "true")
    ss.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try { fn(ss, "/root/testdata/sf0.001").collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}") }
      }
      assert(failures.isEmpty, s"queries failed under codegen-only execution:\n${failures.mkString("\n")}")
    } finally ss.conf.set("spark.sql.codegen.fallback", prev)
  }
}
