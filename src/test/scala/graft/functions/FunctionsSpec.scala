package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextCleanSpec extends SparkSpec {
  import ss.implicits._

  test("digitsOnly strips non-digits and nulls empties") {
    val out = Seq("(11) 98765-4321", "abc", null)
      .toDF("v").select(TextClean.digitsOnly(col("v")).as("d"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("11987654321", null, null))
  }

  test("stripDotZero only strips a trailing .0") {
    val out = Seq("123.0", "123.01", "1.0.0")
      .toDF("v").select(TextClean.stripDotZero(col("v"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("123", "123.01", "1.0"))
  }

  test("fixMojibake repairs the reference's corruption pairs") {
    val out = Seq("NÃƒO pagou AtÃ© 10")
      .toDF("v").select(TextClean.fixMojibake(col("v"))).collect().head.getString(0)
    assert(out == "NÃO pagou Até 10")
  }

  test("nanToNull maps pandas missing markers to null") {
    val out = Seq("nan", "NaT", "ok", "None", "NAN")
      .toDF("v").select(TextClean.nanToNull(col("v"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq(null, null, "ok", null, null))
  }
}

class BrFormatsSpec extends SparkSpec {
  import ss.implicits._

  test("brMoney renders 2-decimal comma format") {
    val out = Seq(1234.5, 0.0, 99.999).toDF("v")
      .select(BrFormats.brMoney(col("v"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("1234,50", "0,00", "100,00"))
  }

  test("brMoneyCompact drops decimals for integral values") {
    val out = Seq(1234.0, 1234.5).toDF("v")
      .select(BrFormats.brMoneyCompact(col("v"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("1234", "1234,50"))
  }

  test("parseCommaDecimal and parseBrDate round-trip; errors coerce to null") {
    val row = Seq(("1234,56", "31/12/2023", "99/99/2024")).toDF("m", "d", "bad")
      .select(
        BrFormats.parseCommaDecimal(col("m")).as("m"),
        BrFormats.brDate(BrFormats.parseBrDate(col("d"))).as("d"),
        BrFormats.parseBrDate(col("bad")).as("bad"))
      .collect().head
    assert(row.getDouble(0) == 1234.56)
    assert(row.getString(1) == "31/12/2023")
    assert(row.isNullAt(2))
  }
}
