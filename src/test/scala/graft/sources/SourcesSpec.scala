package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import ss.implicits._

  test("InputResolver picks the newest file matching the pattern") {
    val dir = Files.createTempDirectory("resolver").toString
    Files.write(java.nio.file.Paths.get(dir, "MAILING_A.csv"), "x".getBytes)
    Thread.sleep(1100) // local FS mtime granularity is 1s
    Files.write(java.nio.file.Paths.get(dir, "MAILING_B.csv"), "y".getBytes)
    val found = InputResolver.findLatest(ss, dir, "MAILING_*.csv")
    assert(found.exists(_.endsWith("MAILING_B.csv")))
    assert(InputResolver.findLatest(ss, dir, "NOPE_*.csv", optional = true).isEmpty)
    intercept[java.io.FileNotFoundException] {
      InputResolver.findLatest(ss, dir, "NOPE_*.csv")
    }
  }

  test("Ingest normalizes headers (case, whitespace, BOM)") {
    val df = Seq((1, 2)).toDF(" Empresa ", "﻿NCPF")
    val out = Ingest.normalizeColumns(df)
    assert(out.columns.toSeq == Seq("empresa", "ncpf"))
  }

  test("Ingest.readCsv reads ;-separated headers back normalized") {
    val dir = Files.createTempDirectory("csv").toString
    Files.write(java.nio.file.Paths.get(dir, "in.csv"), "NOME;Valor\nana;10\n".getBytes("UTF-8"))
    val df = Ingest.readCsv(ss, dir + "/in.csv")
    assert(df.columns.toSeq == Seq("nome", "valor"))
    assert(df.count() == 1)
  }

  test("SchemaValidator flags missing and extra columns") {
    val df = Seq((1, "x")).toDF("ncpf", "surprise")
    val r = SchemaValidator.check(df, Seq("ncpf", "valor"))
    assert(r.missing == Seq("valor") && r.extras == Seq("surprise"))
    intercept[SchemaValidator.SchemaValidationError] {
      SchemaValidator.validate(df, Seq("ncpf", "valor"), "mailing.csv")
    }
    SchemaValidator.validate(df, Seq("ncpf"), "mailing.csv") // extras alone pass
  }
}
