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

  // Hand-authored minimal OOXML workbook: two sheets, shared + inline
  // strings, a numeric cell, a skipped cell (gap → null), a BOM'd header.
  private def writeFixtureXlsx(path: java.nio.file.Path): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Mailing" sheetId="1" r:id="rId1"/>
        |        <sheet name="Extra" sheetId="2" r:id="rId2"/></sheets>
        |</workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="w" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    // style 0: General; style 1: builtin date (14); style 2: custom date;
    // style 3: custom money format (NOT a date despite the quoted 'd')
    put("xl/styles.xml",
      """<?xml version="1.0"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<numFmts count="2">
        |  <numFmt numFmtId="164" formatCode="dd/mm/yyyy hh:mm"/>
        |  <numFmt numFmtId="165" formatCode="#,##0.00&quot;d&quot;"/>
        |</numFmts>
        |<cellXfs count="4">
        |  <xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/><xf numFmtId="165"/>
        |</cellXfs>
        |</styleSheet>""".stripMargin)
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |<si><t>﻿ Empresa </t></si><si><t>NCPF</t></si>
        |<si><r><t>An</t></r><r><t>a</t></r><rPh sb="0" eb="3"><t>アナ</t></rPh><phoneticPr fontId="1"/></si>
        |</sst>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>Valor</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>123</v></c><c r="C2"><v>10.5</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>Bea</t></is></c><c r="C3"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    put("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>K</t></is></c><c r="B1" t="inlineStr"><is><t>D</t></is></c><c r="C1" t="inlineStr"><is><t>T</t></is></c><c r="D1" t="inlineStr"><is><t>M</t></is></c></row>
        |<row r="2"><c r="A2" t="b"><v>1</v></c><c r="B2" s="1"><v>45000</v></c><c r="C2" s="2"><v>45000.5</v></c><c r="D2" s="3"><v>45000</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
  }

  test("XlsxReader reads shared/inline strings, numbers, gaps, multi-sheet") {
    val dir = Files.createTempDirectory("xlsx")
    val f = dir.resolve("MAILING_NUCLEO_1.xlsx")
    writeFixtureXlsx(f)
    assert(XlsxReader.sheetNames(f.toString) == Seq("Mailing", "Extra"))
    val df = Ingest.readXlsx(ss, f.toString) // first sheet, normalized headers
    assert(df.columns.toSeq == Seq("empresa", "ncpf", "valor"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("Ana", "123", "10.5"), ("Bea", null, "7")))
    // multi-sheet: pd.read_excel(sheet_name=None) analog, order preserved
    val all = Ingest.readXlsxAll(ss, f.toString)
    assert(all.keys.toSeq == Seq("Mailing", "Extra"))
    assert(all("Extra").columns.toSeq == Seq("k", "d", "t", "m"))
    val extra = all("Extra").collect().head
    assert(extra.getString(0) == "TRUE")
    // styles-aware dates: builtin style 14 → date, custom dd/mm/yyyy hh:mm
    // → timestamp, money format with a QUOTED 'd' → raw number
    assert(extra.getString(1) == "2023-03-15")
    assert(extra.getString(2) == "2023-03-15 12:00:00")
    assert(extra.getString(3) == "45000")
    // named-sheet selection + find-latest wiring
    val named = Ingest.readXlsx(ss, f.toString, Some("Extra"))
    assert(named.columns.toSeq == Seq("k", "d", "t", "m"))
    val latest = Ingest.readLatestXlsx(ss, dir.toString, "MAILING_NUCLEO_*.xlsx")
    assert(latest.exists(_.columns.toSeq == Seq("empresa", "ncpf", "valor")))
    intercept[IllegalArgumentException] {
      Ingest.readXlsx(ss, f.toString, Some("Nope"))
    }
  }

  // One-sheet workbook ("S"), inline strings only — the knob the dir-read
  // tests need is header/row content per file, not cell-type coverage
  // (writeFixtureXlsx owns that).
  private def writeSimpleXlsx(path: java.nio.file.Path, header: Seq[String],
                              rows: Seq[Seq[String]]): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    def row(r: Int, cells: Seq[String]) = cells.zipWithIndex.collect {
      case (v, i) if v != null =>
        s"""<c r="${('A' + i).toChar}$r" t="inlineStr"><is><t>$v</t></is></c>"""
    }.mkString(s"""<row r="$r">""", "", "</row>")
    val body = (header +: rows).zipWithIndex
      .map { case (cells, i) => row(i + 1, cells) }.mkString
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$body</sheetData></worksheet>""".stripMargin)
    zos.close()
  }

  test("readXlsxDir: distributed parse equals union of per-file readSheet") {
    val dir = Files.createTempDirectory("xlsxdir")
    writeSimpleXlsx(dir.resolve("a.xlsx"), Seq("Empresa", "NCPF", "Valor"),
      Seq(Seq("Ana", "1", "10"), Seq("Bea", "2", "20")))
    writeSimpleXlsx(dir.resolve("b.xlsx"), Seq("Empresa", "NCPF", "Valor"),
      Seq(Seq("Cid", "3", "30")))
    // c: same columns, DIFFERENT order, one column missing → aligned by
    // name, missing reads null
    writeSimpleXlsx(dir.resolve("c.xlsx"), Seq("Valor", "Empresa"),
      Seq(Seq("40", "Didi")))
    Files.write(dir.resolve("ignored.csv"), "Empresa\nzz\n".getBytes("UTF-8"))

    val df = XlsxReader.readXlsxDir(ss, dir.toString)
    assert(df.columns.toSeq == Seq("Empresa", "NCPF", "Valor"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // oracle: per-file readSheet, aligned to a's header by name
    val expect = Set(("Ana", "1", "10"), ("Bea", "2", "20"), ("Cid", "3", "30"),
      ("Didi", null, "40"))
    assert(got == expect)
    val perFile = Seq("a", "b").flatMap { f =>
      XlsxReader.readSheet(ss, dir.resolve(s"$f.xlsx").toString)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    }.toSet ++ Set(("Didi", null, "40"))
    assert(got == perFile, "dir read must equal the union of per-file reads")

    // parse runs as a TRANSFORMATION over the distributed binaryFile scan —
    // the lineage bottoms out in FileScanRDD, not a driver-parallelized
    // collection (which would print ParallelCollectionRDD)
    val lineage = df.rdd.toDebugString
    assert(lineage.contains("FileScanRDD"), s"expected scan-rooted lineage:\n$lineage")
    assert(!lineage.contains("ParallelCollectionRDD"), s"driver-side parse:\n$lineage")

    // provenance column + Ingest normalization wrapper
    val src = Ingest.readXlsxDir(ss, dir.toString, sourceFileColumn = Some("_src_file"))
    assert(src.columns.toSeq == Seq("empresa", "ncpf", "valor", "_src_file"))
    val bySrc = src.collect().map(r => (r.getString(0), new java.io.File(r.getString(3)).getName))
    assert(bySrc.toSet == Set(("Ana", "a.xlsx"), ("Bea", "a.xlsx"),
      ("Cid", "b.xlsx"), ("Didi", "c.xlsx")))

    // schema drift (a column the schema-fixing workbook lacks) fails fast,
    // naming the file and the column
    writeSimpleXlsx(dir.resolve("d.xlsx"), Seq("Empresa", "Sorpresa"),
      Seq(Seq("Eva", "x")))
    val e = intercept[Exception] {
      XlsxReader.readXlsxDir(ss, dir.toString).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    val all = messages(e).mkString("\n")
    assert(all.contains("d.xlsx") && all.contains("Sorpresa"), s"got: $all")
  }

  test("readXlsxDir: an empty sheet fails fast in ANY workbook, naming the file") {
    val dir = Files.createTempDirectory("xlsxdir_empty")
    writeSimpleXlsx(dir.resolve("a.xlsx"), Seq("Empresa", "Valor"),
      Seq(Seq("Ana", "10")))
    writeSimpleXlsx(dir.resolve("b.xlsx"), Seq.empty, Seq.empty) // empty sheet
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    // as a non-schema-fixing workbook (executor path): fails, not a silent drop
    val e = intercept[Exception] { XlsxReader.readXlsxDir(ss, dir.toString).collect() }
    assert(messages(e).mkString("\n").contains("b.xlsx"),
      s"got: ${messages(e).mkString("\n")}")
    // as the schema-fixing workbook (driver path): same verdict
    Files.delete(dir.resolve("a.xlsx"))
    val e2 = intercept[Exception] { XlsxReader.readXlsxDir(ss, dir.toString).collect() }
    assert(messages(e2).mkString("\n").contains("b.xlsx"),
      s"got: ${messages(e2).mkString("\n")}")
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
