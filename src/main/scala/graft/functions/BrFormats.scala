package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Brazilian-locale output formatting, re-expressing the reference's
  * `_formatar_valor_para_duas_casas` / `_formatar_valor_para_robo` /
  * `%d/%m/%Y` date rendering as native expressions.
  *
  * Refs: `/root/reference/src/formatador_dados.py:12-31`,
  * `/root/reference/src/gerador_robo_mestre.py:11-19`,
  * `/root/reference/src/data_exporter.py:36-40`.
  */
object BrFormats {

  /** 2-decimal money with comma separator: 1234.5 → "1234,50"; null → null. */
  def brMoney(c: Column): Column =
    when(c.isNull, lit(null))
      .otherwise(regexp_replace(format_string("%.2f", c.cast("double")), "\\.", ","))

  /** Robot-file money: integral values render without decimals
    * (1234.0 → "1234"), otherwise like [[brMoney]]. */
  def brMoneyCompact(c: Column): Column = {
    val d = c.cast("double")
    when(c.isNull, lit(null))
      .when(d === floor(d), d.cast("long").cast("string"))
      .otherwise(regexp_replace(format_string("%.2f", d), "\\.", ","))
  }

  /** dd/MM/yyyy rendering of a date/timestamp column. */
  def brDate(c: Column): Column = date_format(c, "dd/MM/yyyy")

  /** Parse a BR decimal string ("1.234,56" or "1234,56") to double;
    * unparseable → null (reference `_safe_to_float`). */
  def parseBrDecimal(c: Column): Column = {
    val normalized = regexp_replace(regexp_replace(trim(c), "\\.", ""), ",", ".")
    normalized.cast("double")
  }

  /** Simple comma-decimal parse (no thousands separators), the shape
    * `_safe_to_float` actually handles: "1234,56" → 1234.56. */
  def parseCommaDecimal(c: Column): Column =
    regexp_replace(trim(c), ",", ".").cast("double")

  /** Day-first date parse, errors → null (reference `_tratar_datas` with
    * `dayfirst=True, errors='coerce'`). */
  def parseBrDate(c: Column): Column = try_to_timestamp(c, lit("d/M/yyyy")).cast("date")
}
