package graft

import graft.queries.{OracleRounding, CheckQueries, RelationalQueries, PipelineQueries}
import org.scalatest.funsuite.AnyFunSuite

/** The half-boundary rounding convention rewriter (VERDICT r13 #1/#2,
  * hardened r15): `round(expr, dp)` in exposed oracles must become the
  * finiteness-guarded DECIMAL-cast form so DuckDB rounds the same
  * decimal digits Spark's shortest-repr BigDecimal HALF_UP does, while
  * NaN/±∞/huge values (which would crash or overflow the DECIMAL cast)
  * pass through bare round. Plus the r15 exposure-decision guard:
  * every rounded raw oracle must be explicitly exposed or audited. */
class OracleRoundingSpec extends AnyFunSuite {

  /** The exact guarded-convention text the rewriter emits. */
  private def conv(e: String, dp: String): String =
    s"CASE WHEN isfinite(CAST($e AS DOUBLE)) AND abs(CAST($e AS DOUBLE)) < 1e18" +
      s" THEN CAST(round(CAST($e AS DECIMAL(38,18)), $dp) AS DOUBLE)" +
      s" ELSE CAST(round(CAST($e AS DOUBLE), $dp) AS DOUBLE) END"

  test("simple two-arg round is wrapped in the guarded DECIMAL-cast convention") {
    assert(OracleRounding.decimalRound("SELECT round(x, 6) AS r FROM t") ===
      s"SELECT ${conv("x", "6")} AS r FROM t")
  }

  test("single-arg round gets explicit scale 0") {
    assert(OracleRounding.decimalRound("round(x)") === conv("x", "0"))
  }

  test("nested parens and commas inside the first arg are preserved") {
    val in = "round(sse / (CAST(n AS DOUBLE) - 2), 6)"
    assert(OracleRounding.decimalRound(in) ===
      conv("sse / (CAST(n AS DOUBLE) - 2)", "6"))
  }

  test("nested round calls are rewritten innermost too") {
    val out = OracleRounding.decimalRound("round(round(x, 8) + y, 6)")
    assert(out === conv(s"${conv("x", "8")} + y", "6"))
  }

  test("identifiers containing 'round' and quoted literals are untouched") {
    val in = "SELECT background, 'round(1.5, 0)' AS s, wraparound FROM t"
    assert(OracleRounding.decimalRound(in) === in)
  }

  test("doubled '' escapes inside literals do not re-enter SQL scanning") {
    // ADVICE r14: under the old scanner the second quote of '' closed
    // the literal, so the rest of the literal text was rewritten as SQL
    val in = "SELECT 'it''s round(1, 0) ok' AS s, round(x, 6) AS r FROM t"
    assert(OracleRounding.decimalRound(in) ===
      s"SELECT 'it''s round(1, 0) ok' AS s, ${conv("x", "6")} AS r FROM t")
    // and inside a round(...) argument list too
    val in2 = "round(CASE WHEN s = 'a''b' THEN x ELSE y END, 6)"
    assert(OracleRounding.decimalRound(in2) ===
      conv("CASE WHEN s = 'a''b' THEN x ELSE y END", "6"))
  }

  test("rewriter is idempotent on its own output") {
    val once = OracleRounding.decimalRound("SELECT round(x, 6) FROM t")
    // every round( in the output opens CAST( — a second pass only
    // re-wraps guarded forms identically if it never sees a bare round
    """(?i)(?<![\w])round\(""".r.findAllMatchIn(once).foreach { m =>
      assert(once.regionMatches(m.end, "CAST(", 0, 5))
    }
  }

  test("every exposed name has an oracle, and its SQL carries the convention") {
    val oracle = SparkEntry.oracleSql
    OracleRounding.exposed.foreach { name =>
      assert(oracle.contains(name), s"$name missing from oracleSql")
      assert(oracle(name).contains("AS DECIMAL(38,18)"),
        s"$name oracle not rewritten")
      // the raw FP round form must be gone: every round( in the
      // rewritten SQL opens a CAST( immediately (both guard branches)
      """(?i)(?<![\w])round\(""".r.findAllMatchIn(oracle(name)).foreach { m =>
        assert(oracle(name).regionMatches(m.end, "CAST(", 0, 5),
          s"$name has a bare FP round( at offset ${m.start}")
      }
    }
  }

  test("exposure decision is total: every rounded raw oracle is exposed or audited") {
    // VERDICT r14 #1: q_eb_shrink landed in the half-boundary exposure
    // class without an exposure decision. This guard makes the decision
    // part of landing any oracle: a raw oracle containing a bare
    // round( must be on exactly one of the two lists.
    val raw = CheckQueries.oracleSql ++ RelationalQueries.oracleSql ++
      PipelineQueries.oracleSql
    val re = """(?i)(?<![A-Za-z0-9_])round\s*\(""".r
    val bare = raw.filter { case (_, v) => re.findFirstIn(v).isDefined }.keySet
    val undecided = bare -- OracleRounding.exposed -- OracleRounding.auditedBareRound
    assert(undecided.isEmpty,
      s"rounded oracles with NO exposure decision (add to OracleRounding." +
        s"exposed or AuditedRound.names): ${undecided.toSeq.sorted.mkString(", ")}")
    val staleAudit = OracleRounding.auditedBareRound -- bare
    assert(staleAudit.isEmpty,
      s"audited names whose oracle no longer has a bare round(: $staleAudit")
    val staleExposed = OracleRounding.exposed -- bare
    assert(staleExposed.isEmpty,
      s"exposed names whose raw oracle has no round( to rewrite: $staleExposed")
    val both = OracleRounding.exposed & OracleRounding.auditedBareRound
    assert(both.isEmpty, s"names on BOTH exposure lists: $both")
  }

  test("q_influence's oracle rounds resid/leverage/cooks_d through DECIMAL") {
    val sql = SparkEntry.oracleSql("q_influence")
    Seq("resid", "leverage", "cooks_d").foreach { c =>
      assert(sql.contains(s"END AS $c"), s"$c not convention-rounded")
    }
  }

  test("q_conformal's infinite-interval corner survives the guard") {
    // the oracle synthesizes qhat = +∞ when the calibration half is too
    // small for the level; the guarded convention must route ∞ through
    // bare round (the DECIMAL cast would hard-error in DuckDB)
    val sql = SparkEntry.oracleSql("q_conformal")
    assert(sql.contains("isfinite"), "q_conformal not guard-rewritten")
    assert(sql.toLowerCase.contains("'infinity'"),
      "q_conformal oracle lost its empty-calibration ∞ sentinel")
  }
}
