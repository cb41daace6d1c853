package graft.pipeline

import scala.collection.immutable.ListMap

/** Typed pipeline configuration — the surface the reference drives from
  * `config.ini` via `configparser` (`/root/reference/src/config_manager.py`,
  * `config.ini`): critical-status sets and removal thresholds
  * (`[SCHEMA_TABULACOES]`), status blocklists (`status_de_bloqueio_para_
  * remover`), the human/robot segmentation cutoff (`[SEGMENTACAO]`), export
  * column lists (`[EXPORT_COLUMNS]`), priority order (`[PRIORITIES]`) and
  * the robot's product→time-slot groups (`[ROBO] grupos_08hrs…`).
  *
  * [[MailingPipeline.full]] accepts one of these; [[GraftConfig.default]]
  * pins the values the test-schema pipeline has always used, so config is
  * additive, not breaking.
  */
final case class GraftConfig(
    criticalStatuses: Seq[String],
    blockThreshold: Int,
    statusesToRemove: Set[String],
    humanCutoff: Double,
    priorityOrder: Seq[String],
    exportColumns: Seq[String],
    slotGroups: ListMap[String, Seq[String]])

object GraftConfig {

  /** The test-schema defaults (what `full` hardcoded before config). */
  val default: GraftConfig = GraftConfig(
    criticalStatuses = Seq("error"),
    blockThreshold = 3,
    statusesToRemove = Set("automobile"),
    humanCutoff = 1500000.0,
    priorityOrder = Seq("BUILDING", "MACHINERY", "HOUSEHOLD"),
    exportColumns = MailingPipeline.CanonicalColumns,
    slotGroups = ListMap.empty)

  /** Parse an INI-shaped config text with `configparser` semantics for the
    * subset the reference uses: `[SECTION]` headers, `key = value` entries,
    * indented continuation lines appended to the previous entry (how the
    * reference encodes its multi-line lists), `;`/`#` comment lines. Values
    * that are lists may be comma- or newline-separated. */
  def parseIni(text: String): Map[String, Map[String, String]] = {
    val out = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.LinkedHashMap[String, StringBuilder]]()
    var section: String = ""
    var lastKey: String = null
    for (raw <- text.linesIterator) {
      val line = raw.replaceAll("\\s+$", "")
      val trimmed = line.trim
      if (trimmed.isEmpty || trimmed.startsWith(";") || trimmed.startsWith("#")) {
        // blank/comment: ends any continuation run (configparser allows blank
        // continuation only when the line is fully empty; keep it simple)
        if (trimmed.isEmpty) lastKey = null
      } else if (trimmed.startsWith("[") && trimmed.endsWith("]")) {
        section = trimmed.substring(1, trimmed.length - 1).trim
        out.getOrElseUpdate(section, scala.collection.mutable.LinkedHashMap())
        lastKey = null
      } else if (line.head.isWhitespace && lastKey != null) {
        out(section)(lastKey).append('\n').append(trimmed)
      } else {
        val eq = line.indexOf('=')
        if (eq < 0)
          // configparser raises ParsingError here; silently dropping the
          // line would run the pipeline on defaults after a typo AND
          // attach following continuation lines to the wrong key
          throw new IllegalArgumentException(
            s"malformed config line (no '='): '$trimmed'")
        val k = line.substring(0, eq).trim.toLowerCase
        val v = line.substring(eq + 1).trim
        out.getOrElseUpdate(section, scala.collection.mutable.LinkedHashMap())(k) = new StringBuilder(v)
        lastKey = k
      }
    }
    out.map { case (s, kv) => s -> kv.map { case (k, v) => k -> v.toString }.toMap }.toMap
  }

  /** Split a list value on commas and newlines, dropping empties — covers
    * both list encodings the reference's config uses. */
  def listValue(v: String): Seq[String] =
    v.split("[,\n]").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Build a typed config from INI text, falling back to [[default]] for
    * anything absent. Section/key layout mirrors the reference's
    * `config.ini` families, renamed to this engine's test schema:
    *
    * {{{
    * [BLOCKLIST]   critical_statuses, threshold
    * [FILTERS]     statuses_to_remove
    * [SEGMENTACAO] human_cutoff
    * [PRIORITIES]  order
    * [EXPORT_COLUMNS] columns
    * [ROBO]        grupos_<slot> = P1,P2   (one key per time slot)
    * }}} */
  def fromIni(text: String): GraftConfig = {
    val ini = parseIni(text)
    def get(section: String, key: String): Option[String] =
      ini.get(section).flatMap(_.get(key)).filter(_.nonEmpty)
    val slots = ini.getOrElse("ROBO", Map.empty).collect {
      case (k, v) if k.startsWith("grupos_") =>
        k.stripPrefix("grupos_").toUpperCase -> listValue(v)
    }
    GraftConfig(
      criticalStatuses = get("BLOCKLIST", "critical_statuses").map(listValue)
        .getOrElse(default.criticalStatuses),
      blockThreshold = get("BLOCKLIST", "threshold").map(_.toInt)
        .getOrElse(default.blockThreshold),
      statusesToRemove = get("FILTERS", "statuses_to_remove").map(listValue(_).toSet)
        .getOrElse(default.statusesToRemove),
      humanCutoff = get("SEGMENTACAO", "human_cutoff").map(_.toDouble)
        .getOrElse(default.humanCutoff),
      priorityOrder = get("PRIORITIES", "order").map(listValue)
        .getOrElse(default.priorityOrder),
      exportColumns = get("EXPORT_COLUMNS", "columns").map(listValue)
        .getOrElse(default.exportColumns),
      slotGroups = ListMap(slots.toSeq.sortBy(_._1): _*))
  }

  /** Load from a local file path. */
  def fromFile(path: String): GraftConfig =
    fromIni(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}
