package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.immutable.ListMap
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal `.xlsx` reader — the reference's primary input format
  * (`/root/reference/src/data_loader.py:26-41`, `pd.read_excel` with
  * `sheet_name=None` for multi-sheet workbooks).
  *
  * Built from the public OOXML SpreadsheetML layout only: a `.xlsx` is a
  * zip containing `xl/workbook.xml` (sheet names + relationship ids),
  * `xl/_rels/workbook.xml.rels` (relationship id → worksheet part),
  * `xl/sharedStrings.xml` (the interned string table) and
  * `xl/worksheets/sheetN.xml` (rows of cells with A1-style references).
  * Parsed with JDK StAX — no external dependency, streaming (never
  * materializes the XML DOM).
  *
  * Scale note: xlsx is an inherently non-splittable single-file format.
  * For the reference's shape — ONE mailing drop measured in MBs
  * ([[readSheet]]/[[readAllSheets]]) — the parse runs once driver-side and
  * the resulting frame is distributed for everything downstream, the same
  * boundary the reference's pandas read sits at. For a DIRECTORY of
  * workbooks, [[readXlsxDir]] moves the identical StAX parse inside
  * executor tasks over `spark.read.format("binaryFile")` — one task per
  * workbook, the driver touching only one header for the schema — so a
  * lake of thousands of drops parallelizes instead of serializing through
  * the driver. A 100 TB pipeline still lands parquet
  * ([[Ingest.readParquet]]); these sources exist for reference-compatible
  * ingest of operator drops.
  *
  * All cells surface as strings (like [[Ingest.readCsv]] with
  * `inferSchema=false`): numerics keep their raw lexical form, booleans
  * become "TRUE"/"FALSE", missing cells are null. The first row is the
  * header; downstream normalization is [[Ingest.normalizeColumns]].
  */
object XlsxReader {

  // per-thread: XMLInputFactory makes no thread-safety promise, and
  // readXlsxDir parses concurrently across executor task threads
  private val factory = ThreadLocal.withInitial[XMLInputFactory](() => {
    val f = XMLInputFactory.newInstance()
    // no DTDs / external entities in workbook parts — also hardens the parse
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  })

  /** The parser's view of a workbook zip: [[FileZip]] wraps a local-path
    * `java.util.zip.ZipFile` (driver-side single-file reads); [[BytesZip]]
    * indexes the parse-relevant entries of an in-memory workbook (the
    * `binaryFile` content column, executor-side). Both hand the SAME StAX
    * code identical streams, so dir-scale and single-file reads cannot
    * drift apart. */
  private[sources] sealed trait ZipSource {
    def has(entry: String): Boolean
    def open(entry: String): InputStream
  }

  private final class FileZip(zip: ZipFile) extends ZipSource {
    def has(entry: String): Boolean = zip.getEntry(entry) != null
    def open(entry: String): InputStream = {
      val e = zip.getEntry(entry)
      require(e != null, s"missing zip entry $entry")
      zip.getInputStream(e)
    }
  }

  /** Parse-relevant entries of a workbook held as bytes. Only the parts the
    * parser reads are retained (workbook/rels/sharedStrings/styles/
    * worksheets), so memory is bounded by the workbook's own data, and a
    * single sequential `ZipInputStream` scan suffices (no random access
    * needed over an in-memory array anyway). */
  private[sources] final class BytesZip(content: Array[Byte]) extends ZipSource {
    private val entries: Map[String, Array[Byte]] = {
      val out = mutable.Map[String, Array[Byte]]()
      val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(content))
      try {
        var e = zin.getNextEntry
        while (e != null) {
          val name = e.getName
          // every xl/ XML part is retained (workbook, rels, sharedStrings,
          // styles, worksheets — and chartsheets or nonstandard sheet
          // paths a rels target may point at, so FileZip and BytesZip hand
          // the parser the same entries); only binary parts (xl/media
          // images etc.) are dropped, which is what bounds memory
          if (name.startsWith("xl/") && name.endsWith(".xml") ||
              name.endsWith(".rels"))
            out(name) = zin.readAllBytes()
          e = zin.getNextEntry
        }
      } finally zin.close()
      out.toMap
    }
    def has(entry: String): Boolean = entries.contains(entry)
    def open(entry: String): InputStream = {
      val bytes = entries.getOrElse(entry,
        throw new IllegalArgumentException(s"missing zip entry $entry"))
      new java.io.ByteArrayInputStream(bytes)
    }
  }

  /** Sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] = withZip(path) { zip =>
    parseWorkbook(zip).map(_._1)
  }

  /** (name, relationship id) pairs in workbook order. */
  private def parseWorkbook(zip: ZipSource): Seq[(String, String)] = {
    val out = mutable.ListBuffer[(String, String)]()
    eachElement(zip, "xl/workbook.xml") { r =>
      if (r.getLocalName == "sheet") {
        val name = attr(r, "name").getOrElse("")
        // r:id is namespaced; match on local name
        val rid = attr(r, "id").getOrElse("")
        out += name -> rid
      }
    }
    out.toList
  }

  /** `<workbookPr date1904="1"/>` → the 1904 date system is in force. */
  private def parseDate1904(zip: ZipSource): Boolean = {
    var flag = false
    eachElement(zip, "xl/workbook.xml") { r =>
      if (r.getLocalName == "workbookPr")
        flag = attr(r, "date1904").exists(v => v == "1" || v == "true")
    }
    flag
  }

  /** relationship id → worksheet zip entry path. */
  private def parseRels(zip: ZipSource): Map[String, String] = {
    val out = mutable.Map[String, String]()
    eachElement(zip, "xl/_rels/workbook.xml.rels") { r =>
      if (r.getLocalName == "Relationship") {
        (attr(r, "Id"), attr(r, "Target")) match {
          case (Some(id), Some(t)) =>
            val target = if (t.startsWith("/")) t.drop(1) else "xl/" + t
            out += id -> target
          case _ =>
        }
      }
    }
    out.toMap
  }

  /** The shared-string table, index order. An `<si>` is either one `<t>` or
    * styled runs `<r><t>…</t></r>…` — concatenate every `<t>` under it,
    * EXCEPT text inside phonetic runs (`<rPh><t>…</t></rPh>`, furigana
    * annotations in Japanese workbooks): openpyxl/pandas exclude those, so
    * including them would duplicate text relative to `pd.read_excel`. */
  private def parseSharedStrings(zip: ZipSource): IndexedSeq[String] = {
    if (!zip.has("xl/sharedStrings.xml")) return IndexedSeq.empty
    val out = mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inT = false
    var inRPh = false
    stream(zip, "xl/sharedStrings.xml") { r =>
      r.getEventType match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si"  => sb.clear(); inRPh = false
            case "rPh" => inRPh = true
            case "t"   => inT = !inRPh
            case _     =>
          }
        case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si"  => out += sb.toString
            case "rPh" => inRPh = false
            case "t"   => inT = false
            case _     =>
          }
        case _ =>
      }
    }
    out.toIndexedSeq
  }


  /** Style index → is-a-date-format, from `xl/styles.xml`. A cell's `s`
    * attribute indexes `cellXfs`; its `numFmtId` is a date format when it
    * is one of the builtin date ids (14-22, 45-47) or a custom `numFmt`
    * whose code (ignoring quoted text, escapes and [$…] locale prefixes)
    * contains day/month/year/hour/second tokens — the same detection
    * openpyxl/pandas apply. Missing styles part → nothing is a date. */
  private def parseDateStyles(zip: ZipSource): IndexedSeq[Boolean] = {
    if (!zip.has("xl/styles.xml")) return IndexedSeq.empty
    val builtinDate = (14 to 22).toSet ++ (45 to 47).toSet
    val customDate = mutable.Set[Int]()
    val xfIds = mutable.ArrayBuffer[Int]()
    var inCellXfs = false
    stream(zip, "xl/styles.xml") { r =>
      r.getEventType match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "numFmt" =>
              (attr(r, "numFmtId"), attr(r, "formatCode")) match {
                case (Some(id), Some(code)) if isDateFormatCode(code) => customDate += id.trim.toInt
                case _ =>
              }
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              xfIds += attr(r, "numFmtId").map(_.trim.toInt).getOrElse(0)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
    }
    xfIds.map(id => builtinDate(id) || customDate(id)).toIndexedSeq
  }

  /** True when a custom number-format code formats dates/times. */
  private[sources] def isDateFormatCode(code: String): Boolean = {
    val cleaned = code
      .replaceAll("\"[^\"]*\"", "")      // quoted literals
      .replaceAll("\\\\.", "")           // escaped chars
      .replaceAll("\\[[^\\]]*\\]", "")   // [$-409] / [Red] / [h] sections
    cleaned.exists(c => "dmyhs".indexOf(c.toLower) >= 0) && !cleaned.contains("#")
  }

  /** Excel date serial → ISO string. Serials count days from 1899-12-30
    * (or 1904-01-01 when the workbook sets date1904); the fraction is the
    * time of day. Whole days render as dates, the rest as timestamps. */
  private[sources] def serialToIso(raw: String, date1904: Boolean): String = {
    val serial = raw.trim.toDouble
    val epoch = if (date1904) java.time.LocalDate.of(1904, 1, 1)
      else java.time.LocalDate.of(1899, 12, 30)
    val days = math.floor(serial).toLong
    val secs = math.round((serial - days) * 86400.0)
    val dt = epoch.atStartOfDay.plusDays(days).plusSeconds(secs)
    if (secs == 0) dt.toLocalDate.toString
    else dt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
  }

  /** "BC" → 54 (0-based column index from an A1 cell reference). */
  private[sources] def colIndex(cellRef: String): Int = {
    var i = 0
    var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** One worksheet part → rows of (possibly null) cell strings. Numeric
    * cells whose style is a date format are rendered as ISO date/timestamp
    * strings (what `pd.read_excel` hands the reference). */
  private def parseSheet(zip: ZipSource, entry: String, shared: IndexedSeq[String],
                         dateStyles: IndexedSeq[Boolean], date1904: Boolean): Seq[Array[String]] = {
    val rows = mutable.ListBuffer[Array[String]]()
    var row: mutable.ArrayBuffer[String] = null
    var cellCol = 0
    var cellType = ""
    var cellDate = false
    var inV = false
    var inIsT = false
    val sb = new StringBuilder
    def endCell(): Unit = {
      // a valueless <c/> contributes nothing — the gap-fill below nulls it
      if (row != null && sb.nonEmpty) {
        val raw = sb.toString
        val value = cellType match {
          case "s" => shared.lift(raw.trim.toInt).orNull
          case "b" => if (raw.trim == "1") "TRUE" else "FALSE"
          case "" | "n" if cellDate =>
            try serialToIso(raw, date1904) catch { case _: NumberFormatException => raw }
          case _   => raw // n (default), str, inlineStr: lexical form
        }
        while (row.length < cellCol) row += null
        if (row.length == cellCol) row += value else row(cellCol) = value
      }
      sb.clear(); cellType = ""
    }
    stream(zip, entry) { r =>
      r.getEventType match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer[String]()
            case "c" =>
              cellCol = attr(r, "r").map(colIndex).getOrElse(if (row == null) 0 else row.length)
              cellType = attr(r, "t").getOrElse("")
              cellDate = attr(r, "s").exists(ix =>
                dateStyles.lift(ix.trim.toInt).getOrElse(false))
              sb.clear()
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inIsT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" => if (row != null) { rows += row.toArray; row = null }
            case "c"   => endCell()
            case "v"   => inV = false
            case "t"   => inIsT = false
            case _     =>
          }
        case _ =>
      }
    }
    rows.toList
  }

  /** Read one sheet (by name, or the first sheet when `sheet` is None) into
    * an all-string DataFrame, first row as header. */
  def readSheet(spark: SparkSession, path: String, sheet: Option[String] = None): DataFrame =
    withZip(path) { zip =>
      val (header, rows) = tableOf(zip, sheet, path)
      tableToDf(spark, header, rows)
    }

  /** Resolve the requested sheet (first sheet when None) and parse its
    * header + data rows. Pure of Spark — runs identically on the driver
    * (single-file reads) and inside executor tasks ([[readXlsxDir]]). */
  private def tableOf(zip: ZipSource, sheet: Option[String],
                      desc: String): (Array[String], Seq[Array[String]]) = {
    val sheets = parseWorkbook(zip)
    require(sheets.nonEmpty, s"no sheets in $desc")
    val (name, rid) = sheet match {
      case Some(s) => sheets.find(_._1 == s)
        .getOrElse(throw new IllegalArgumentException(
          s"sheet '$s' not in $desc (has: ${sheets.map(_._1).mkString(", ")})"))
      case None => sheets.head
    }
    sheetTable(zip, parseRels(zip), parseSharedStrings(zip),
      parseDateStyles(zip), parseDate1904(zip), rid, name)
  }

  /** Directory-scale ingest: every workbook matching `pathGlob` under
    * `dir`, parsed INSIDE executor tasks over
    * `spark.read.format("binaryFile")` — the distributed form of
    * [[readSheet]] for a lake of daily drops. The driver reads exactly one
    * workbook's header (the lexicographically first match) to fix the
    * frame's schema; every task then aligns its workbook's columns BY NAME
    * to that header — a column missing in some workbook reads null, and a
    * column the schema-fixing workbook lacks fails fast with the file and
    * column names (silent drop would hide schema drift; [[SchemaDrift]] is
    * the diagnosis tool for that situation). Workbooks whose header order
    * merely differs align correctly. An EMPTY sheet fails fast in any
    * workbook — schema-fixing or not — never a silent whole-file drop.
    *
    * `sourceFileColumn` (e.g. `Some("_src_file")`) appends each row's
    * originating file path — per-drop provenance for the audit reports.
    *
    * Scale shape: one task per workbook (xlsx is non-splittable), no
    * driver-side data loop, no shuffle — parallelism = file count, the
    * best possible for this format. */
  def readXlsxDir(spark: SparkSession, dir: String, sheet: Option[String] = None,
                  pathGlob: String = "*.xlsx",
                  sourceFileColumn: Option[String] = None): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob).load(dir)
      .select("path", "content")
    // The schema-fixing workbook comes from binaryFile's OWN listing (its
    // first path in sort order), never from a separate driver-side glob:
    // two listings can disagree on hidden files ('_'/'.'-prefixed, which
    // Hadoop sources skip) and directory recursion, and a schema fixed
    // from a file the tasks never parse — or a nonempty task set behind an
    // empty driver glob — is exactly the silent drift this method exists
    // to prevent. Only the one schema workbook's bytes come to the driver.
    val first = bin.select(org.apache.spark.sql.functions.min("path"))
      .head().getString(0)
    require(first != null, s"no files match $pathGlob under $dir")
    val header: Array[String] = {
      val bytes = bin.where(org.apache.spark.sql.functions.col("path") === first)
        .select("content").head().getAs[Array[Byte]](0)
      tableOf(new BytesZip(bytes), sheet, first)._1
    }
    require(header.nonEmpty,
      s"$first has an empty sheet — cannot fix the directory's schema from it")
    val base = StructType(header.map(StructField(_, StringType, nullable = true)))
    val schema = sourceFileColumn.fold(base)(c => base.add(StructField(c, StringType)))
    val hdr = header // capture the plain array, not the surrounding state
    val sheetSel = sheet
    val withSrc = sourceFileColumn.isDefined
    val rows = bin.rdd.flatMap { row =>
      val path = row.getString(0)
      val (h, data) = tableOf(new BytesZip(row.getAs[Array[Byte]](1)), sheetSel, path)
      // an empty sheet fails as loudly in EVERY workbook as it does in the
      // schema-fixing one — a silent whole-file drop is exactly the schema
      // drift this method exists to surface
      require(h.nonEmpty, s"$path has an empty sheet — a lake drop with no " +
        "header row is corrupt, not skippable; remove the file or fix the drop")
      // identical headers (the normal lake case) align positionally, which
      // also tolerates duplicate column names; otherwise align by name
      val idx: Array[Int] =
        if (h.sameElements(hdr)) Array.tabulate(h.length)(identity)
        else {
          val pos = hdr.zipWithIndex.toMap
          // by-name alignment is only well-defined for distinct names on
          // BOTH sides: zipWithIndex.toMap keeps the last index per name,
          // so a duplicate would silently route two source cells into one
          // slot (data loss) — duplicates are fine only on the
          // identical-header positional path above
          require(pos.size == hdr.length, s"$path: header order differs from " +
            s"the schema-fixing workbook, which has DUPLICATE column names — " +
            "by-name alignment is ambiguous; make headers identical or rename")
          require(h.distinct.length == h.length, s"$path: duplicate column " +
            "names with a reordered header — by-name alignment is ambiguous")
          val unknown = h.filterNot(pos.contains)
          require(unknown.isEmpty, s"$path: columns not in the schema-fixing " +
            s"workbook (${unknown.mkString(", ")}) — reconcile with SchemaDrift")
          h.map(pos)
        }
      data.iterator.map { r =>
        val out = new Array[Any](hdr.length + (if (withSrc) 1 else 0))
        var i = 0
        while (i < r.length) { out(idx(i)) = r(i); i += 1 }
        if (withSrc) out(hdr.length) = path
        Row.fromSeq(out.toIndexedSeq)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Every sheet, workbook order preserved — `pd.read_excel(sheet_name=None)`.
    * The rels part and the shared-string table (which typically holds most
    * of a text-heavy workbook's data) are parsed ONCE, not once per sheet. */
  def readAllSheets(spark: SparkSession, path: String): ListMap[String, DataFrame] =
    withZip(path) { zip =>
      val rels = parseRels(zip)
      val shared = parseSharedStrings(zip)
      val dateStyles = parseDateStyles(zip)
      val date1904 = parseDate1904(zip)
      ListMap(parseWorkbook(zip).map { case (name, rid) =>
        name -> toDf(spark, zip, rels, shared, dateStyles, date1904, rid, name)
      }: _*)
    }

  private def toDf(spark: SparkSession, zip: ZipSource, rels: Map[String, String],
                   shared: IndexedSeq[String], dateStyles: IndexedSeq[Boolean],
                   date1904: Boolean, rid: String, name: String): DataFrame = {
    val (header, rows) = sheetTable(zip, rels, shared, dateStyles, date1904, rid, name)
    tableToDf(spark, header, rows)
  }

  /** Header (blank/missing names → `_cN`) + width-padded data rows of one
    * sheet. Pure of Spark so [[readXlsxDir]] can run it inside tasks. */
  private def sheetTable(zip: ZipSource, rels: Map[String, String],
                         shared: IndexedSeq[String], dateStyles: IndexedSeq[Boolean],
                         date1904: Boolean, rid: String,
                         name: String): (Array[String], Seq[Array[String]]) = {
    val entry = rels.getOrElse(rid,
      throw new IllegalArgumentException(s"unresolvable sheet relationship $rid for '$name'"))
    val rows = parseSheet(zip, entry, shared, dateStyles, date1904)
    if (rows.isEmpty) return (Array.empty, Seq.empty)
    val width = rows.map(_.length).max
    val header = rows.head.padTo(width, null: String).zipWithIndex.map {
      case (h, i) => if (h == null || h.trim.isEmpty) s"_c$i" else h
    }
    (header, rows.tail.map(_.padTo(width, null: String)))
  }

  private def tableToDf(spark: SparkSession, header: Array[String],
                        rows: Seq[Array[String]]): DataFrame = {
    if (header.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[Row](), StructType(Nil))
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data = new java.util.ArrayList[Row](rows.size)
    rows.foreach(r => data.add(Row.fromSeq(r.toIndexedSeq)))
    spark.createDataFrame(data, schema)
  }

  // --- plumbing ---

  private def withZip[A](path: String)(f: ZipSource => A): A = {
    val zip = new ZipFile(path)
    try f(new FileZip(zip)) finally zip.close()
  }

  private def attr(r: XMLStreamReader, local: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local) return Some(r.getAttributeValue(i))
      i += 1
    }
    None
  }

  /** Stream every event of a zip entry through `f`. */
  private def stream(zip: ZipSource, entry: String)(f: XMLStreamReader => Unit): Unit = {
    val in: InputStream = zip.open(entry)
    val r = factory.get().createXMLStreamReader(in)
    try {
      while (r.hasNext) { r.next(); f(r) }
    } finally { r.close(); in.close() }
  }

  /** Start-elements only. */
  private def eachElement(zip: ZipSource, entry: String)(f: XMLStreamReader => Unit): Unit =
    stream(zip, entry) { r =>
      if (r.getEventType == XMLStreamConstants.START_ELEMENT) f(r)
    }
}
