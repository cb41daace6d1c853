package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the generated operator index (docs/OPERATORS.md): stale copies and
  * dangling references fail. No Spark session needed — the registry and
  * the filesystem are the ground truth. */
class OperatorIndexSpec extends AnyFunSuite {

  private def read(p: String) = new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
  private lazy val survey = read("SURVEY.md")
  private lazy val rows = OperatorIndex.parse(survey)

  test("committed docs/OPERATORS.md matches regeneration from SURVEY.md") {
    val expected = OperatorIndex.render(survey)
    val actual = read("docs/OPERATORS.md")
    assert(actual == expected,
      "docs/OPERATORS.md is stale — regenerate: sbt \"runMain graft.OperatorIndex\"")
  }

  test("every §2 row parsed, ids unique, families as surveyed") {
    assert(rows.length >= 191, s"parsed only ${rows.length} §2 rows")
    assert(rows.map(_.id).distinct.length == rows.length, "duplicate row ids")
    val families = rows.map(_.id.head).toSet
    assert(families == Set('R', 'L', 'S', 'B', 'C'), s"families: $families")
  }

  test("every verify key in the index exists in SparkEntry.queries") {
    val known = SparkEntry.queries.keySet + "entry"
    val dangling = rows.flatMap(r => r.verify.filterNot(known).map(k => s"${r.id}: $k"))
    assert(dangling.isEmpty, s"dangling verify keys:\n${dangling.mkString("\n")}")
  }

  test("every streaming spec ref resolves to a test suite file") {
    val specRows = rows.filter(r => r.id.startsWith("S") && r.verify.isEmpty)
    assert(specRows.nonEmpty, "no spec-verified S rows parsed — layout drift?")
    val missing = specRows.flatMap { r =>
      OperatorIndex.specRef(r) match {
        case None => Some(s"${r.id}: no spec ref derivable from api '${r.api}'")
        case Some(spec) =>
          val p = Paths.get(s"src/test/scala/graft/streaming/$spec.scala")
          if (Files.exists(p)) None else Some(s"${r.id}: $p missing")
      }
    }
    assert(missing.isEmpty, s"dangling streaming spec refs:\n${missing.mkString("\n")}")
  }

  test("every API entry point resolves to a source file") {
    import scala.jdk.CollectionConverters._
    // each package directory is read ONCE into a symbol cache (and the
    // Files.list stream closed via Using) — the per-row declaration grep
    // was O(rows x files) full-file re-reads with a leaked directory fd
    // per miss
    val declCache = scala.collection.mutable.Map.empty[String, String]
    def pkgSource(pkg: String): String = declCache.getOrElseUpdate(pkg, {
      scala.util.Using.resource(Files.list(Paths.get(s"src/main/scala/graft/$pkg"))) {
        _.iterator.asScala
          .filter(_.toString.endsWith(".scala"))
          .map(p => new String(Files.readAllBytes(p), "UTF-8"))
          .mkString("\n")
      }
    })
    val missing = rows.filter(_.api.nonEmpty).flatMap { r =>
      val Array(pkg, obj) = r.api.split("\\.", 3).take(2)
      val exact = Paths.get(s"src/main/scala/graft/$pkg/$obj.scala")
      // symbols hosted in a sibling file (e.g. plans.TopKRewriteRule lives
      // in TopKRewrite.scala) resolve by declaration grep over the cache
      def declared = s"\\b(object|class|trait) ${java.util.regex.Pattern.quote(obj)}\\b"
        .r.findFirstIn(pkgSource(pkg)).isDefined
      if (Files.exists(exact) || declared) None
      else Some(s"${r.id}: ${r.api} -> $exact")
    }
    assert(missing.isEmpty, s"dangling API refs:\n${missing.mkString("\n")}")
    // ...and composition rows (no single entry point) stay the exception;
    // every one must at least carry a verify query as its recipe
    val blank = rows.filter(_.api.isEmpty)
    assert(blank.length <= 12, s"too many rows without an API ref: ${blank.map(_.id)}")
    val recipeless = blank.filter(_.verify.isEmpty).map(_.id)
    assert(recipeless.isEmpty, s"composition rows with no verify recipe: $recipeless")
  }
}
