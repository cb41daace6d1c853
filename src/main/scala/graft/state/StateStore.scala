package graft.state

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.Instant

/** Run-state persistence, the reference's `StateManager`
  * (`/root/reference/src/state_manager.py`): success/failure + metrics of
  * the last run, atomically written JSON (write-temp-then-rename so a
  * crashed run never leaves a corrupt state file — the reference instead
  * resets corrupted state to empty on read, which we also tolerate). */
final class StateStore(path: String) {

  def saveSuccess(metrics: Map[String, Long], now: Instant = Instant.now()): Unit =
    write(Map(
      "status" -> "\"COMPLETED\"",
      "last_successful_run" -> s""""$now"""",
      "last_metrics" -> metrics.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")))

  def saveFailure(error: String, now: Instant = Instant.now()): Unit =
    write(Map(
      "status" -> "\"FAILED\"",
      "last_failed_run" -> s""""$now"""",
      "error_message" -> jsonString(error)))

  // Spark exception messages are routinely multi-line — escape control chars
  // too, or the state file is invalid JSON for any external consumer.
  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def status: Option[String] = field("status")

  def lastMetrics: Map[String, Long] = {
    val content = read()
    val m = """"last_metrics"\s*:\s*\{([^}]*)\}""".r
    m.findFirstMatchIn(content).map(_.group(1)).toSeq.flatMap { body =>
      """"([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(body).map(x => x.group(1) -> x.group(2).toLong)
    }.toMap
  }

  private def field(name: String): Option[String] =
    (s""""$name"\\s*:\\s*"([^"]*)"""").r.findFirstMatchIn(read()).map(_.group(1))

  private def read(): String = {
    val p = Paths.get(path)
    if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8") else ""
  }

  private def write(fields: Map[String, String]): Unit = {
    val json = fields.map { case (k, v) => s""""$k": $v""" }.mkString("{\n  ", ",\n  ", "\n}")
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}
