package graft.operators

import graft.SparkSpec

class AuditSpec extends SparkSpec {
  import ss.implicits._

  private def mailing = Seq(
    ("ANA", "ATIVO", "SP"),
    ("BEA", "FRAUDE", "RJ"),
    ("CLA", "ATIVO", "SP"),
    ("DEA", "\u00c3\u0093BITO", "SP"), // ÓBITO's UTF-8 bytes mis-read as latin-1
    ("EVA", null, "MG")
  ).toDF("nome", "bloqueio", "uf")

  test("topColumnValues lists per-column top values by frequency, one pass") {
    val out = Audit.topColumnValues(mailing, Seq("bloqueio", "uf"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // nulls dropped; ties broken by value asc
    assert(out == Set(
      ("bloqueio", "ATIVO", 2L), ("bloqueio", "FRAUDE", 1L),
      ("uf", "SP", 3L), ("uf", "MG", 1L)))
    // the rank filter is rewritten to the native bounded-heap plan
    val plan = Audit.topColumnValues(mailing, Seq("bloqueio", "uf"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), plan)
  }

  test("distinctStatuses sanitizes mojibake like the laudo input phase") {
    val st = Audit.distinctStatuses(mailing, "bloqueio")
      .collect().map(_.getString(0)).toSet
    assert(st == Set("ATIVO", "FRAUDE", "ÓBITO"))
  }

  test("forbiddenScan finds forbidden values across ALL columns in one pass") {
    val found = Audit.forbiddenScan(mailing, mailing.columns.toSeq,
      Set("óbito", "fraude", "sp"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(found == Set(
      ("bloqueio", "óbito"), ("bloqueio", "fraude"), ("uf", "sp")))
  }

  test("report renders input markers and per-file OK/ALERTA sections") {
    val md = Audit.report(
      inputStatuses = Seq("ATIVO", "ÓBITO"),
      toRemove = Set("ÓBITO"), // any case — report normalizes like forbiddenScan
      outputFindings = Map(
        "mailing_EPB.csv" -> Nil,
        "mailing_EMR.csv" -> Seq("óbito")))
    assert(md.contains("| `ÓBITO` | **Sim** |"))
    assert(md.contains("| `ATIVO` | Não |"))
    assert(md.contains("`mailing_EPB.csv`:** OK"))
    assert(md.contains("`mailing_EMR.csv`:** ALERTA"))
    assert(md.contains("  - óbito"))
  }
}
