package graft.operators

import org.apache.spark.sql.DataFrame

/** Schema-drift detection and the diagnostic report, the reference's
  * `schema.py` + `diagnostico.py`: compare the newest file's columns
  * against a base schema (added / removed / common-order-changed) and
  * render the per-file markdown diagnostic (schema + distinct values of
  * investigated columns).
  *
  * Schemas are column NAME lists — driver-side metadata, never data — so
  * the comparison itself is plain Scala; the distinct-value listing for
  * the diagnostic runs through [[Audit.topColumnValues]] (one distributed
  * pass however many columns are investigated). */
object SchemaDrift {

  final case class Drift(added: Seq[String], removed: Seq[String], orderChanged: Boolean) {
    def isDrift: Boolean = added.nonEmpty || removed.nonEmpty || orderChanged
  }

  /** `schema.py`'s compare_schemas: set differences plus an order check
    * over the COMMON columns (each projected in its own original order). */
  def compare(base: Seq[String], next: Seq[String]): Drift = {
    val (baseSet, nextSet) = (base.toSet, next.toSet)
    val commonInBase = base.filter(nextSet.contains)
    val commonInNext = next.filter(baseSet.contains)
    Drift(
      added = next.filterNot(baseSet.contains).sorted,
      removed = base.filterNot(nextSet.contains).sorted,
      orderChanged = commonInBase != commonInNext)
  }

  /** `diagnostico.py`'s per-file analysis: full sorted column list plus the
    * distinct values of each investigated column (bounded at `maxValues`,
    * most-frequent first, ties value-asc), computed in ONE pass via the
    * Audit machinery. Every PRESENT column gets a map entry — an all-null
    * or empty column reports an empty listing, distinct from a column
    * that is genuinely absent from the schema. */
  def diagnose(df: DataFrame, investigate: Seq[String],
               maxValues: Int = 50): (Seq[String], Map[String, Seq[String]]) = {
    val present = investigate.filter(df.columns.contains)
    val collected: Map[String, Seq[String]] =
      if (present.isEmpty) Map.empty
      else Audit.topColumnValues(df, present, maxValues)
        .collect()
        .groupBy(_.getString(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(r => (-r.getLong(2), r.getString(1))).map(_.getString(1)).toSeq
        }
    val values = present.map(c => c -> collected.getOrElse(c, Seq.empty)).toMap
    (df.columns.sorted.toSeq, values)
  }

  /** The RELATORIO_DIAGNOSTICO.md shape: per file, schema + per-column
    * value listing (or absence), then a drift section vs the base file. */
  def report(files: Seq[(String, (Seq[String], Map[String, Seq[String]]))],
             investigate: Seq[String],
             drift: Option[(String, String, Drift)] = None): String = {
    val sb = new StringBuilder
    sb ++= "# Relatório de Diagnóstico de Arquivos\n\n"
    files.foreach { case (name, (schema, values)) =>
      sb ++= s"## `$name`\n\n"
      sb ++= s"Colunas (${schema.size}): ${schema.map(c => s"`$c`").mkString(", ")}\n\n"
      investigate.foreach { c =>
        values.get(c) match {
          case Some(vs) =>
            sb ++= s"- **`$c`** (${vs.size} valores): ${vs.map(v => s"`$v`").mkString(", ")}\n"
          case None =>
            sb ++= s"- **`$c`**: Coluna não encontrada\n"
        }
      }
      sb ++= "\n"
    }
    drift.foreach { case (baseName, nextName, d) =>
      sb ++= s"## Comparação de Schema: `$baseName` → `$nextName`\n\n"
      if (!d.isDrift) sb ++= "Nenhuma diferença de schema.\n"
      else {
        if (d.added.nonEmpty) sb ++= s"- Adicionadas: ${d.added.map(c => s"`$c`").mkString(", ")}\n"
        if (d.removed.nonEmpty) sb ++= s"- Removidas: ${d.removed.map(c => s"`$c`").mkString(", ")}\n"
        if (d.orderChanged) sb ++= "- Ordem das colunas comuns ALTERADA\n"
      }
    }
    sb.result()
  }
}
