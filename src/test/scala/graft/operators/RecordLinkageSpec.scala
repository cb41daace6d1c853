package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[RecordLinkage]] — FastSS deletion-neighborhood blocking must find
  * EVERY pair within the edit-distance bound (the Bocek et al. theorem),
  * and only verified pairs survive. */
class RecordLinkageSpec extends SparkSpec {
  import ss.implicits._

  private def pairs(rows: Seq[(Long, String)], d: Int, cap: Long = 0L) =
    RecordLinkage.editDistancePairs(rows.toDF("id", "s"), col("id"), col("s"), d, cap)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3).toMap

  test("finds substitution, insertion and deletion neighbors at d=1") {
    val p = pairs(Seq(
      1L -> "maria silva",   // 1<->2 substitution (i/y)
      2L -> "marya silva",
      3L -> "maria silvas",  // 1<->3 insertion
      4L -> "mara silva",    // 1<->4 deletion (and 2<->4: delete the y)
      5L -> "joao souza"), d = 1)
    assert(p.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 4L)))
    assert(p.values.forall(_ == 1))
  }

  test("d=1 misses distance-2 pairs; d=2 finds them with exact distances") {
    val rows = Seq(1L -> "charlie", 2L -> "charlye", 3L -> "charlyee")
    val p1 = pairs(rows, d = 1)
    assert(p1.keySet == Set((1L, 2L), (2L, 3L)))
    val p2 = pairs(rows, d = 2)
    assert(p2 == Map((1L, 2L) -> 1, (2L, 3L) -> 1, (1L, 3L) -> 2))
  }

  test("brute-force equivalence on a random short-string corpus (d=1 and d=2)") {
    val rnd = new scala.util.Random(7)
    val words = (0 until 80).map { i =>
      i.toLong -> (0 until (3 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => i.max(j)))
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    for (d <- Seq(1, 2)) {
      val expected = (for {
        (ia, sa) <- words; (ib, sb) <- words if ia < ib
        dist = lev(sa, sb) if dist <= d
      } yield (ia, ib) -> dist).toMap
      assert(pairs(words, d) == expected, s"mismatch at d=$d")
    }
  }

  test("identical strings pair at distance 0; duplicates across many rows all pair") {
    val p = pairs(Seq(1L -> "ana", 2L -> "ana", 3L -> "ana"), d = 1)
    assert(p == Map((1L, 2L) -> 0, (1L, 3L) -> 0, (2L, 3L) -> 0))
  }

  test("empty and single-char strings are safe") {
    val p = pairs(Seq(1L -> "", 2L -> "a", 3L -> "b", 4L -> ""), d = 1)
    // "" <-> "a"/"b" are distance 1 (insertion); "a" <-> "b" substitution; "" <-> "" identical
    assert(p == Map((1L, 2L) -> 1, (1L, 3L) -> 1, (1L, 4L) -> 0,
      (2L, 3L) -> 1, (2L, 4L) -> 1, (3L, 4L) -> 1))
  }

  test("maxVariantFreq drops pairs that only share degenerate blocks") {
    // ten identical strings: every variant block has freq 10 > cap 5
    val rows = (1L to 10L).map(_ -> "dup") :+ (11L -> "unique")
    assert(pairs(rows, d = 1, cap = 5L).isEmpty)
    // and a generous cap keeps them all: C(10,2) pairs
    assert(pairs(rows, d = 1, cap = 100L).size == 45)
  }

  test("goldenRecords resolves transitive chains and keeps singletons") {
    // a ≈ b ≈ c chain (a and c are distance 2 apart — only transitivity
    // links them) plus an exact-dup pair and a singleton
    val df = Seq(1L -> "anna", 2L -> "annd", 3L -> "abnd",
      10L -> "solo", 20L -> "dup", 21L -> "dup").toDF("id", "s")
    val out = RecordLinkage.goldenRecords(df, col("id"), col("s"), maxDist = 1)
      .as[(Long, Long, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out == Map(
      1L -> (3L, "anna"),   // chain entity: min id 1 canonical
      10L -> (1L, "solo"),  // singleton
      20L -> (2L, "dup")))  // exact-dup entity
  }

  test("jaroWinklerPairs ranks candidates and filters by basis points") {
    val df = Seq(1L -> "martha", 2L -> "marhta", 3L -> "marthas").toDF("id", "s")
    val out = RecordLinkage.jaroWinklerPairs(df, col("id"), col("s"),
        maxDist = 2, minJwBp = 9000)
      .as[(Long, Long, Int, Int)].collect().map(t => (t._1, t._2) -> t._4).toMap
    assert(out.keySet.contains((1L, 2L)))
    assert(out((1L, 2L)) == 9611) // the classic MARTHA/MARHTA value
    assert(out.values.forall(_ >= 9000))
  }
}
