package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String-cleaning column functions re-expressing the reference's pandas
  * cleanup helpers as codegen-friendly Catalyst expressions (no UDFs).
  *
  * Refs: `/root/reference/src/processing_pipeline.py:15-33` (mojibake, phone),
  * `/root/reference/src/final_polisher.py` (`.0` strip, NÃƒO repair),
  * `/root/reference/src/compressor.py:24-35` (nan-string → null).
  */
object TextClean {

  /** Keep digits only (reference `_clean_phone_number`); empty → null. */
  def digitsOnly(c: Column): Column = {
    val cleaned = regexp_replace(c, "[^0-9]", "")
    when(cleaned === "", lit(null)).otherwise(cleaned)
  }

  /** Strip a trailing `.0` left by float-typed identifiers. */
  def stripDotZero(c: Column): Column = regexp_replace(c, "\\.0$", "")

  /** Strip UTF-8 BOM characters leaked into values. */
  def stripBom(c: Column): Column = regexp_replace(c, "\\uFEFF", "")

  /** Filesystem-safe name: keep Unicode letters/digits, space and `_`,
    * drop everything else, trim trailing spaces — the reference's
    * `"".join(c for c in s if c.isalnum() or c in (' ', '_')).rstrip()`
    * (`/root/reference/src/data_loader.py:86`). Python `isalnum` is
    * Unicode-aware, hence `\p{L}\p{N}` rather than ASCII classes. */
  def safeFileName(c: Column): Column =
    rtrim(regexp_replace(c, "[^\\p{L}\\p{N} _]", ""), " ")

  /** Repair the two mojibake patterns the reference fixes (UTF-8 read as
    * latin-1): `NÃƒO` → `NÃO`, `AtÃ©` → `Até`. The reference's generic
    * latin1→utf8 re-decode is not expressible as a column function; these
    * fixed pairs are the cases its final polish actually applies. */
  def fixMojibake(c: Column): Column = {
    val pairs = Seq("N\u00c3\u0192O" -> "N\u00c3O", "At\u00c3\u00a9" -> "At\u00e9")
    pairs.foldLeft(c) { case (acc, (bad, good)) => regexp_replace(acc, java.util.regex.Pattern.quote(bad), good) }
  }

  /** Replace pandas' stringified missing markers with real nulls. */
  def nanToNull(c: Column): Column =
    when(c.isin("nan", "NaT", "None", "NAN"), lit(null)).otherwise(c)

  /** Lower-case + trim, the reference's column/key normalization. */
  def normKey(c: Column): Column = lower(trim(c))
}
