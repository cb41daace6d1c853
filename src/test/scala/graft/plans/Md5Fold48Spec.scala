package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** [[Md5Fold48]] — byte-fold equality with the column-algebra hex fold it
  * replaced (the contract every SQL oracle still spells out), plus
  * codegen-path equivalence and null handling. */
class Md5Fold48Spec extends SparkSpec {
  import ss.implicits._

  /** The original 12×(instr+substring) hex fold, kept here as the spec's
    * independent reference implementation. */
  private def hexFold12(c: org.apache.spark.sql.Column) =
    (1 to 12).map(i =>
      (instr(lit("0123456789abcdef"), substring(md5(c.cast("string")), i, 1)) - 1).cast("long"))
      .reduce((acc, d) => acc * 16L + d)

  test("native fold equals the hex-digit column fold on varied inputs") {
    GraftExtensions.register(ss)
    val rows = Seq("", "a", "hello world", "NÃO", "😀 surrogate", "1234567890",
      "the quick brown fox", "x" * 500)
    val df = rows.toDF("s")
    val got = df.select(call_function("graft_md5_fold48", col("s")).as("h"))
      .as[Long].collect().toSeq
    val ref = df.select(hexFold12(col("s")).as("h")).as[Long].collect().toSeq
    assert(got == ref, s"native $got != column fold $ref")
    assert(got.forall(h => h >= 0L && h < 281474976710656L), "48-bit range")
  }

  test("interpreted eval matches codegen and a known md5 vector") {
    val rows = Seq("abc", "", "graft")
    GraftExtensions.register(ss)
    val viaCodegen = rows.toDF("s")
      .select(call_function("graft_md5_fold48", col("s"))).as[Long].collect().toSeq
    val interpreted = rows.map(s => Md5Fold48.compute(UTF8String.fromString(s)))
    assert(viaCodegen == interpreted)
    // md5("abc") = 900150983cd24fb0... → first 12 hex digits 900150983cd2
    assert(Md5Fold48.compute(UTF8String.fromString("abc")) == 0x900150983cd2L)
  }

  test("null input yields null, not a crash") {
    GraftExtensions.register(ss)
    val out = Seq(Some("a"), None).toDF("s")
      .select(call_function("graft_md5_fold48", col("s")).as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out(0).isDefined && out(1).isEmpty)
  }
}
