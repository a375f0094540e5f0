package graft

import graft.queries.OracleRounding
import org.scalatest.funsuite.AnyFunSuite

/** The half-boundary rounding convention rewriter (VERDICT r13 #1/#2):
  * `round(expr, dp)` in exposed oracles must become the DECIMAL-cast
  * form so DuckDB rounds the same decimal digits Spark's shortest-repr
  * BigDecimal HALF_UP does. */
class OracleRoundingSpec extends AnyFunSuite {

  test("simple two-arg round is wrapped in the DECIMAL-cast convention") {
    assert(OracleRounding.decimalRound("SELECT round(x, 6) AS r FROM t") ===
      "SELECT CAST(round(CAST(x AS DECIMAL(38,18)), 6) AS DOUBLE) AS r FROM t")
  }

  test("single-arg round gets explicit scale 0") {
    assert(OracleRounding.decimalRound("round(x)") ===
      "CAST(round(CAST(x AS DECIMAL(38,18)), 0) AS DOUBLE)")
  }

  test("nested parens and commas inside the first arg are preserved") {
    val in = "round(sse / (CAST(n AS DOUBLE) - 2), 6)"
    assert(OracleRounding.decimalRound(in) ===
      "CAST(round(CAST(sse / (CAST(n AS DOUBLE) - 2) AS DECIMAL(38,18)), 6) AS DOUBLE)")
  }

  test("nested round calls are rewritten innermost too") {
    val out = OracleRounding.decimalRound("round(round(x, 8) + y, 6)")
    assert(out === "CAST(round(CAST(CAST(round(CAST(x AS DECIMAL(38,18))" +
      ", 8) AS DOUBLE) + y AS DECIMAL(38,18)), 6) AS DOUBLE)")
  }

  test("identifiers containing 'round' and quoted literals are untouched") {
    val in = "SELECT background, 'round(1.5, 0)' AS s, wraparound FROM t"
    assert(OracleRounding.decimalRound(in) === in)
  }

  test("case-insensitive match, original dp spacing trimmed") {
    assert(OracleRounding.decimalRound("ROUND(x,   3)") ===
      "CAST(round(CAST(x AS DECIMAL(38,18)), 3) AS DOUBLE)")
  }

  test("every exposed name has an oracle, and its SQL carries the convention") {
    val oracle = SparkEntry.oracleSql
    OracleRounding.exposed.foreach { name =>
      assert(oracle.contains(name), s"$name missing from oracleSql")
      assert(oracle(name).contains("AS DECIMAL(38,18)"),
        s"$name oracle not rewritten")
      // the raw FP round form must be gone: every round( in the
      // rewritten SQL opens the convention's CAST( immediately
      """(?i)(?<![\w])round\(""".r.findAllMatchIn(oracle(name)).foreach { m =>
        assert(oracle(name).regionMatches(m.end, "CAST(", 0, 5),
          s"$name has a bare FP round( at offset ${m.start}")
      }
    }
  }

  test("q_influence's oracle rounds resid/leverage/cooks_d through DECIMAL") {
    val sql = SparkEntry.oracleSql("q_influence")
    Seq("resid", "leverage", "cooks_d").foreach { c =>
      assert(sql.contains(s"AS DOUBLE) AS $c"), s"$c not DECIMAL-rounded")
    }
  }
}
