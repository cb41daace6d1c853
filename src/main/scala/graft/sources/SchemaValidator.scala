package graft.sources

import org.apache.spark.sql.DataFrame

/** Required-column schema validation, the reference's `validate_schema`
  * (`/root/reference/src/schema_validator.py:23-52`): missing required
  * columns abort; unexpected extras are reported but kept. */
object SchemaValidator {

  final case class SchemaValidationError(message: String) extends RuntimeException(message)

  final case class Report(missing: Seq[String], extras: Seq[String]) {
    def ok: Boolean = missing.isEmpty
  }

  def check(df: DataFrame, required: Seq[String]): Report = {
    val present = df.columns.map(_.toLowerCase).toSet
    val req = required.map(_.toLowerCase)
    Report(
      missing = req.filterNot(present),
      extras = (present -- req).toSeq.sorted)
  }

  /** Throws on missing required columns (mirrors the reference's hard stop). */
  def validate(df: DataFrame, required: Seq[String], name: String): Report = {
    val r = check(df, required)
    if (!r.ok)
      throw SchemaValidationError(s"invalid schema in '$name': missing required columns: ${r.missing.mkString(", ")}")
    r
  }
}
