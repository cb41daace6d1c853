package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[JaroWinkler]] — pinned against the classic literature vectors
  * (Winkler 1990 / the values every published implementation reproduces)
  * plus edge cases and codegen-path equivalence. */
class JaroWinklerSpec extends SparkSpec {
  import ss.implicits._

  private def bp(a: String, b: String): Int = {
    GraftExtensions.register(ss)
    Seq((a, b)).toDF("a", "b")
      .select(call_function("graft_jaro_winkler", col("a"), col("b")).as("bp"))
      .as[Int].head()
  }

  test("classic reference vectors") {
    assert(bp("MARTHA", "MARHTA") == 9611)
    assert(bp("DIXON", "DICKSONX") == 8133)
    assert(bp("DWAYNE", "DUANE") == 8400)
    assert(bp("JELLYFISH", "SMELLYFISH") == 8962)
  }

  test("identity, disjoint and empty edges") {
    assert(bp("abc", "abc") == 10000)
    assert(bp("abc", "xyz") == 0)
    assert(bp("", "") == 10000)
    assert(bp("", "abc") == 0)
    assert(bp("abc", "") == 0)
  }

  test("symmetry") {
    for ((a, b) <- Seq(("DIXON", "DICKSONX"), ("martha", "marhta"), ("ab", "ba")))
      assert(bp(a, b) == bp(b, a), s"asymmetric on ($a, $b)")
  }

  test("prefix boost: shared prefix scores above the same letters scrambled") {
    // same lengths, one substitution each — but only the first pair shares
    // a prefix, so only it gets the Winkler boost
    assert(bp("prefixes", "prefixed") > bp("sexiferp", "dexiferp"))
  }

  test("supplementary-plane code points compare as single characters") {
    // U+1F600 as a pair of surrogates must not half-match
    assert(bp("😀ab", "😀ab") == 10000)
    assert(bp("😀", "😁") == 0)
  }

  test("interpreted eval matches codegen") {
    val rows = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", "x"), ("same", "same"))
    val df = rows.toDF("a", "b")
    GraftExtensions.register(ss)
    val viaCodegen = df.select(call_function("graft_jaro_winkler", col("a"), col("b")))
      .as[Int].collect().toSeq
    val interpreted = rows.map { case (a, b) =>
      JaroWinkler.computeBp(org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    }
    assert(viaCodegen == interpreted)
  }
}
