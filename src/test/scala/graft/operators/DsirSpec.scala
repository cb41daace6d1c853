package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dsir.importanceScore]] sanity on a corpus with a clear domain split:
  * grams exclusive to the target domain must pull weights above grams
  * exclusive to the rest. */
class DsirSpec extends SparkSpec {
  import ss.implicits._

  test("target-domain documents out-weigh off-domain documents") {
    val target = (1 to 10).map(i => (i.toLong, "clean english prose sample", "en"))
    val other = (11 to 20).map(i => (i.toLong, "ruido fuera del dominio objetivo", "es"))
    val df = (target ++ other).toDF("doc_id", "text", "lang")
    val scored = Dsir.importanceScore(df, col("doc_id"), col("text"), col("lang") === "en")
      .select("doc_id", "dsir_q").as[(Long, Long)].collect().toMap
    assert(target.forall { case (tid, _, _) => other.forall { case (oid, _, _) =>
      scored(tid) > scored(oid) } },
      s"every target doc must out-weigh every off-domain doc, got $scored")
  }

  test("a shared-vocabulary doc scores between the domain extremes") {
    val df = Seq(
      (1L, "alpha beta gamma delta", "en"),
      (2L, "alpha beta gamma delta", "en"),
      (3L, "omega psi chi phi", "es"),
      (4L, "alpha beta omega psi", "es") // half target-grams, half off-domain
    ).toDF("doc_id", "text", "lang")
    val s = Dsir.importanceScore(df, col("doc_id"), col("text"), col("lang") === "en")
      .select("doc_id", "dsir_q").as[(Long, Long)].collect().toMap
    assert(s(1L) > s(4L) && s(4L) > s(3L), s"mixed doc must rank between, got $s")
  }

  test("documents below the gram threshold emit nothing; is_target rides along") {
    val df = Seq((1L, "two words", "en"), (2L, "single", "en")).toDF("doc_id", "text", "lang")
    val out = Dsir.importanceScore(df, col("doc_id"), col("text"), col("lang") === "en").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    assert(out.head.getBoolean(1))
  }
}
