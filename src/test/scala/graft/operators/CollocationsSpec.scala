package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Collocations.topCollocations]] on a corpus with one glued phrase, one
  * independent co-occurrence, and a hapax pair below support. */
class CollocationsSpec extends SparkSpec {
  import ss.implicits._

  test("a glued phrase out-lifts independent co-occurrence; hapax pairs drop") {
    // "new york" always adjacent (5×); "the" pairs with many words
    // (frequent but independent); "rare once" appears a single time
    val df = Seq(
      "the city of new york is the place",
      "new york has the views and the bridges",
      "they left new york for the coast",
      "new york was cold but the sun was out",
      "the map of new york sat on the desk rare once"
    ).toDF("text")
    val top = Collocations.topCollocations(df, col("text"), k = 10, minSupport = 2L)
      .select("prev", "cur", "n_pair", "lift_q")
      .as[(String, String, Long, Long)].collect()
    val byPair = top.map(r => (r._1, r._2) -> r).toMap
    assert(byPair.contains(("new", "york")), s"glued phrase missing from $top")
    assert(byPair(("new", "york"))._3 == 5L)
    assert(!top.exists(r => r._1 == "rare"), "support-1 pair must be dropped")
    // the glued phrase must out-lift every pair involving the stopword
    val phraseLift = byPair(("new", "york"))._4
    top.filter(r => r._1 == "the" || r._2 == "the").foreach { r =>
      assert(phraseLift > r._4, s"phrase must out-lift stopword pair $r")
    }
  }

  test("ranking is a total order: k results, deterministic under repartition") {
    val df = Seq.tabulate(30)(i => s"pair a$i b$i pair a$i b$i").toDF("text")
    val a = Collocations.topCollocations(df, col("text"), 7)
      .as[(String, String, Long, Long)].collect().toSeq
    val b = Collocations.topCollocations(df.repartition(13), col("text"), 7)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(a.size == 7 && a.toSet == b.toSet)
  }
}
