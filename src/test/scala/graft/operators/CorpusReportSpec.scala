package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusReportSpec extends SparkSpec {
  import ss.implicits._

  private val docs = Seq(
    // source web: 4 docs, one exact dup pair, two langs (en dominant)
    (1L, "web", "en", "the cat sat"),
    (2L, "web", "en", "the cat sat"),
    (3L, "web", "en", "a dog ran far"),
    (4L, "web", "pt", "o gato sentou"),
    // source mail: 1 doc, clean
    (5L, "mail", "en", "hello world")
  ).toDF("doc_id", "source", "lang", "text")

  private def report = CorpusReport.summary(docs, col("source"), col("doc_id"),
    col("text"), col("lang"))
    .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, String, Long)]
    .collect().map(r => r._1 -> r).toMap

  test("volume, dup rate, and language concentration are exact") {
    val web = report("web")
    assert(web._2 == 4L, "n_docs")
    // tokens: 3+3+4+3 = 13; types: the,cat,sat,a,dog,ran,far,o,gato,sentou = 10
    assert(web._3 == 13L && web._4 == 10L)
    assert(web._8 == 250000L, "1 dup doc of 4 = 250000 ppm")
    assert(web._9 == 2L && web._10 == "en" && web._11 == 750000L)
    val mail = report("mail")
    assert(mail._2 == 1L && mail._8 == 0L && mail._10 == "en" && mail._11 == 1000000L)
  }

  test("vocabulary health matches the standalone vocabStats numbers") {
    val standalone = CorpusStats.vocabStats(
      docs.select(col("source"), col("text")), col("source"), col("text"), 10)
      .select(col("grp"), col("ttr_ppm"), col("hapax_ppm"), col("top_mass_ppm"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val rep = report
    standalone.foreach { case (src, (ttr, hapax, mass)) =>
      assert((rep(src)._5, rep(src)._6, rep(src)._7) == ((ttr, hapax, mass)),
        s"composite must not drift from the primitive it composes ($src)")
    }
  }

  test("a token-less source stays on the card with zero vocabulary") {
    val broken = docs.unionByName(
      Seq((9L, "broken", "xx", ""), (10L, "broken", "xx", ""))
        .toDF("doc_id", "source", "lang", "text"))
    val rep = CorpusReport.summary(broken, col("source"), col("doc_id"),
      col("text"), col("lang"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    val b = rep("broken")
    assert(b._2 == 2L, "the broken source must appear")
    assert(b._3 == 0L && b._4 == 0L && b._5 == 0L, "zero tokens/types/ttr")
    assert(b._8 == 500000L, "two identical empty texts: one is a dup")
  }

  test("language ties break to the lexicographically smallest language") {
    val tied = Seq((1L, "s", "en", "x"), (2L, "s", "de", "y")).toDF("doc_id", "source", "lang", "text")
    val top = CorpusReport.summary(tied, col("source"), col("doc_id"), col("text"), col("lang"))
      .select("top_lang").as[String].head()
    assert(top == "de")
  }
}
