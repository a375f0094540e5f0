package graft

import org.scalatest.funsuite.AnyFunSuite

/** OPERATORS.md must stay in sync with SparkEntry.queries: every query
  * has a catalog row and every catalog row is a live query (VERDICT
  * r13 #6 — the catalog is generated, and this spec is what makes
  * "generated" an invariant rather than a habit). */
class CatalogSpec extends AnyFunSuite {

  private def catalogNames(): Set[String] = {
    val f = new java.io.File("OPERATORS.md")
    assert(f.isFile, "OPERATORS.md missing — run `sbt \"runMain graft.Catalog\"`")
    val row = """\|\s*`([A-Za-z0-9_]+)`\s*\|.*""".r
    scala.io.Source.fromFile(f, "UTF-8").getLines().collect {
      case row(name) => name
    }.toSet
  }

  test("every SparkEntry query appears in OPERATORS.md") {
    val missing = SparkEntry.queries.keySet -- catalogNames()
    assert(missing.isEmpty,
      s"queries missing from OPERATORS.md (regenerate): ${missing.toSeq.sorted.take(10)}")
  }

  test("every OPERATORS.md row is a live query") {
    val stale = catalogNames() -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"stale OPERATORS.md rows (regenerate): ${stale.toSeq.sorted.take(10)}")
  }

  test("oracle markers match SparkEntry.oracleSql") {
    val f = scala.io.Source.fromFile("OPERATORS.md", "UTF-8").getLines().toSeq
    val row = """\|\s*`([A-Za-z0-9_]+)`\s*\|\s*(oracle|spec)\s*\|.*""".r
    val marked = f.collect { case row(n, o) => n -> o }.toMap
    val oracle = SparkEntry.oracleSql.keySet
    val wrong = marked.filter { case (n, o) =>
      (o == "oracle") != oracle.contains(n) }
    assert(wrong.isEmpty,
      s"oracle/spec markers out of date (regenerate): ${wrong.keys.toSeq.sorted.take(10)}")
  }

  test("every query definition site in the catalog points at a real line") {
    val sites = Catalog.definitionSites()
    SparkEntry.queries.keySet.foreach { n =>
      assert(sites.contains(n), s"no definition site found for $n")
    }
  }
}
