package graft

/** Generated operator index (VERDICT r11 task 8): one discoverability
  * table mapping every SURVEY.md §2 row → its `graft` API entry point →
  * its verify query. The library is 191 rows deep; this is the page a
  * user scans instead of the survey's engineering commentary.
  *
  * Single-source discipline: [[render]] derives the table FROM SURVEY.md
  * (the coverage ground truth), `main` writes `docs/OPERATORS.md`, and
  * `OperatorIndexSpec` regenerates + diffs the committed file (stale or
  * hand-edited copies fail) and validates every reference — verify keys
  * must exist in [[SparkEntry.queries]], API entry points must resolve to
  * a source file (dangling refs fail).
  */
object OperatorIndex {

  /** One §2 row: id (R/L/S/B/C-prefixed), title, API entry point (first
    * `pkg.Object[.member]` token of the re-expression cell), verify keys
    * (empty = spec-verified). */
  final case class Row(id: String, title: String, api: String, verify: Seq[String])

  private val RowStart = """^\|\s*([RLSBC]\d+)\s*\|""".r
  private val ApiRef =
    """`((?:sources|operators|functions|plans|sinks|streaming|pipeline|state|queries)\.[A-Za-z0-9_]+)""".r

  /** Split a markdown table row on `|`, ignoring pipes inside backtick
    * spans (R20's `` `;`/`|` `` separator cell). Pipes OUTSIDE backticks in
    * the re-expression cell (L4's set-math) over-split that cell; callers
    * re-join the middle. */
  private[graft] def splitCells(line: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inTick = false
    line.foreach {
      case '`' => inTick = !inTick; cur += '`'
      case '|' if !inTick => out += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    out += cur.toString.trim
    out.result().drop(1) match { // leading empty cell before first |
      case cells if cells.lastOption.contains("") => cells.dropRight(1)
      case cells => cells
    }
  }

  /** Parse every §2 operator row of a SURVEY.md text, document order. */
  def parse(survey: String): Seq[Row] =
    survey.linesIterator.flatMap { line =>
      // (pattern-matching a Regex requires a WHOLE-line match; this is a prefix)
      RowStart.findFirstMatchIn(line).map(_.group(1)).map { id =>
        val cells = splitCells(line)
        // layout: id | title | [reference (§2a only)] | re-expression... |
        // verify key | oracle — the re-expression may have over-split
        val title = cells(1)
        val verifyCell = if (cells.length >= 2) cells(cells.length - 2) else ""
        val middle = cells.slice(2, cells.length - 2).mkString("|")
        val api = ApiRef.findFirstMatchIn(middle).map(_.group(1))
          .orElse(ApiRef.findFirstMatchIn(line).map(_.group(1)))
          .getOrElse("")
        // a leading em-dash marks a spec-verified row; any q-mentions after
        // it are commentary ("drives q03-class plans"), not verify keys
        val verify =
          if (verifyCell.startsWith("—") || verifyCell.startsWith("-")) Nil
          else "\\bq\\d+\\w*".r.findAllIn(verifyCell).toSeq.distinct ++
            (if (verifyCell.contains("entry")) Seq("entry") else Nil)
        Row(id, title, api, verify)
      }
    }.toSeq

  /** True when a streaming suite name resolves under the test tree
    * (render runs from the repo root in both `main` and the spec). */
  private def suiteFileExists(s: String): Boolean =
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"src/test/scala/graft/streaming/$s.scala"))

  /** The docs/OPERATORS.md content for a SURVEY.md text. */
  def render(survey: String,
             suiteExists: String => Boolean = suiteFileExists): String = {
    val rows = parse(survey)
    val header =
      s"""# Operator index
         |
         |Every operator the library ships, one line each: SURVEY.md §2 row →
         |`graft` API entry point → the query that verifies it against the
         |DuckDB oracle (rows with no verify query are covered by their
         |ScalaTest spec instead — streaming sinks, codecs, drivers).
         |Oracle-keyed streaming rows ALSO name the suite that pins the
         |behaviors the oracle drive bypasses (incremental release,
         |dead-letter, replay) — both verifications hold per row.
         |
         |GENERATED from SURVEY.md by `sbt "runMain graft.OperatorIndex"` —
         |do not hand-edit; `OperatorIndexSpec` fails on a stale or dangling
         |copy. Families: R = reference-surface, L = LLM-data/scale,
         |S = streaming, B = lake layout, C = custom Catalyst plans.
         |
         |${rows.length} operators.
         |
         || # | operator | API | verified by |
         ||---|---|---|---|
         |""".stripMargin
    val body = rows.map { r =>
      // rows with no single entry point are query-level compositions of
      // other rows' operators (their verify query IS the recipe)
      val api = if (r.api.isEmpty) "composition" else s"`graft.${r.api}`"
      val verify =
        if (r.verify.nonEmpty)
          // oracle-keyed streaming rows keep their spec listed too: the
          // oracle drive checks batch==stream on one arrival order; the
          // suite pins the paths the drive bypasses (round-16 advice)
          r.verify.mkString(", ") +
            specRef(r).filter(suiteExists).fold("")(s => s" + spec: `$s`")
        else specRef(r).fold("spec")(s => s"spec: `$s`")
      s"| ${r.id} | ${r.title} | $api | $verify |"
    }.mkString("", "\n", "\n")
    header + body
  }

  /** The ScalaTest suite that pins a spec-verified STREAMING row's
    * batch==stream equivalence: every `streaming.X` object is spec'd in
    * `streaming/XSpec.scala` (the suite-per-object convention the whole
    * S-family follows), so the index can NAME the evidence instead of a
    * bare "spec" — the round-12 discoverability gap for the streaming
    * half. `OperatorIndexSpec` validates each ref resolves to a test
    * file, so a renamed suite fails the staleness gate, not the reader. */
  def specRef(r: Row): Option[String] =
    if (r.id.startsWith("S") && r.api.startsWith("streaming."))
      Some(r.api.stripPrefix("streaming.") + "Spec")
    else None

  def main(args: Array[String]): Unit = {
    val surveyPath = java.nio.file.Paths.get(args.headOption.getOrElse("SURVEY.md"))
    val outPath = java.nio.file.Paths.get(
      if (args.length > 1) args(1) else "docs/OPERATORS.md")
    val survey = new String(java.nio.file.Files.readAllBytes(surveyPath), "UTF-8")
    java.nio.file.Files.createDirectories(outPath.getParent)
    java.nio.file.Files.write(outPath, render(survey).getBytes("UTF-8"))
    System.err.println(s"[index] wrote $outPath")
  }
}
