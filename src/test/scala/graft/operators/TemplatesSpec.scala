package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemplatesSpec extends SparkSpec {
  import ss.implicits._

  private val docs = Seq(
    // one template: same 2-word prefix and 1-word suffix, different middles
    (1L, "web", "dear customer we owe you nothing regards"),
    (2L, "web", "dear customer your invoice is overdue regards"),
    (3L, "mail", "dear customer please ignore this regards"),
    // different suffix — different template
    (4L, "web", "dear customer hello goodbye"),
    // unique doc
    (5L, "web", "completely different text here")
  ).toDF("doc_id", "source", "text")

  test("shared affixes group; the middle does not matter") {
    val out = Templates.templateGroups(docs, col("doc_id"), col("source"),
      col("text"), kPrefix = 2, kSuffix = 1, minDocs = 2L)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length == 1, s"exactly one group >= 2 docs, got ${out.toSeq}")
    assert(out.head._2 == 3L && out.head._3 == 2L &&
      out.head._4 == 1L && out.head._5 == 3L)
  }

  test("minDocs filters singletons; lowering it surfaces them") {
    val strict = Templates.templateGroups(docs, col("doc_id"), col("source"),
      col("text"), 2, 1, minDocs = 4L).count()
    assert(strict == 0L)
    val loose = Templates.templateGroups(docs, col("doc_id"), col("source"),
      col("text"), 2, 1, minDocs = 1L).count()
    assert(loose == 3L, "three distinct fingerprints in the corpus")
  }

  test("docs shorter than the affixes fingerprint deterministically") {
    val shorties = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "a", "y"))
      .toDF("doc_id", "source", "text")
    val out = Templates.templateGroups(shorties, col("doc_id"), col("source"),
      col("text"), kPrefix = 3, kSuffix = 3, minDocs = 2L)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length == 1 && out.head._2 == 2L, "the two 'x' docs group")
  }

  test("null and empty texts share the defined empty-affix group") {
    val docs = Seq((1L, "s", null.asInstanceOf[String]), (2L, "s", ""), (3L, "s", "  "))
      .toDF("doc_id", "source", "text")
    val out = Templates.templateGroups(docs, col("doc_id"), col("source"),
      col("text"), 1, 1, 2L).as[(String, Long, Long, Long, Long)].collect()
    assert(out.length == 1 && out.head._2 == 3L,
      "null normalizes to empty; all three docs share one fingerprint")
  }

  test("multiple spaces and empty tokens do not change the fingerprint") {
    val a = Seq((1L, "s", "hello  world   end"), (2L, "s", "hello world mid end"))
      .toDF("doc_id", "source", "text")
    val out = Templates.templateGroups(a, col("doc_id"), col("source"),
      col("text"), 1, 1, 2L).count()
    assert(out == 1L, "double spaces filter out; both docs share hello|end")
  }
}
