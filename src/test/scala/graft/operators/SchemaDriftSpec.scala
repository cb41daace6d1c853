package graft.operators

import graft.SparkSpec

class SchemaDriftSpec extends SparkSpec {
  import ss.implicits._

  test("compare flags added, removed, and reordered-common columns") {
    val base = Seq("cpf", "nome", "valor", "bloq")
    assert(!SchemaDrift.compare(base, base).isDrift)
    val d = SchemaDrift.compare(base, Seq("nome", "cpf", "valor", "just"))
    assert(d.added == Seq("just"))
    assert(d.removed == Seq("bloq"))
    assert(d.orderChanged) // cpf/nome swapped among the common columns
    // pure addition at the end keeps the common order intact
    val add = SchemaDrift.compare(base, base :+ "extra")
    assert(add.added == Seq("extra") && add.removed.isEmpty && !add.orderChanged)
  }

  test("diagnose lists the schema and distinct values of present columns") {
    val df = Seq(("1", "ATIVO", "a", null: String), ("2", "FRAUDE", "b", null: String),
      ("3", "ATIVO", "c", null: String)).toDF("cpf", "bloq", "nome", "vazio")
    val (schema, values) = SchemaDrift.diagnose(df, Seq("bloq", "vazio", "just"))
    assert(schema == Seq("bloq", "cpf", "nome", "vazio"))
    assert(values("bloq") == Seq("ATIVO", "FRAUDE")) // most-frequent first
    // present-but-all-null is an EMPTY listing, not "column not found"
    assert(values("vazio") == Seq.empty)
    assert(!values.contains("just"))
    val md = SchemaDrift.report(
      Seq("MAILING_1.xlsx" -> ((schema, values))), Seq("bloq", "just"),
      drift = Some(("MAILING_0.xlsx", "MAILING_1.xlsx",
        SchemaDrift.compare(Seq("nome", "cpf"), schema))))
    assert(md.contains("`bloq`** (2 valores): `ATIVO`, `FRAUDE`"))
    assert(md.contains("`just`**: Coluna não encontrada"))
    assert(md.contains("Adicionadas: `bloq`"))
    assert(md.contains("Ordem das colunas comuns ALTERADA"))
  }
}
