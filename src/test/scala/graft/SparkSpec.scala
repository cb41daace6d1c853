package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps the test
  * run fast; Test/fork gives a clean JVM per `sbt test`). Suites do
  * `import ss.implicits._` via the stable `ss` val. */
object SparkSpec {
  lazy val session: SparkSession = GraftSession.local("graft-test", 4)
}

abstract class SparkSpec extends AnyFunSuite {
  val ss: SparkSession = SparkSpec.session
}
