package graft.queries

/** Half-boundary rounding convention for the DuckDB oracle (VERDICT r13
  * findings #1/#2).
  *
  * The engine rounds doubles two ways, both equivalent to Scala
  * `BigDecimal(d).setScale(dp, HALF_UP)` = Java `Double.toString`
  * (shortest decimal repr) then HALF_UP: Spark's `round(col, dp)` on
  * DoubleType, and the driver-side `rd()` helpers that freeze fit
  * scalars (Analytics.scala). DuckDB's `round(DOUBLE, dp)` instead
  * scale-multiplies in FP (x·10^dp, round half-away, divide), which
  * disagrees exactly when the shortest repr sits at/near a half
  * boundary: r13's one red row was q_influence's residual
  * 44.643944499999996 — ·1e6 lands on exactly 44643944.5 in FP, DuckDB
  * says 44.643945, Spark says 44.643944. Probed in spark-shell 4.1.2
  * (r14): Spark round(1.9999995, 6) = 2.0 (shortest repr, NOT the
  * exact binary expansion 1.99999949…), matching DuckDB's
  * DECIMAL-cast route on the same probe set.
  *
  * Fix (the judge-prescribed compare convention): rewrite every
  * `round(expr, dp)` in the EXPOSED oracles to
  * `CAST(round(CAST(expr AS DECIMAL(38,18)), dp) AS DOUBLE)` — the
  * DECIMAL cast goes through the double's decimal repr so DuckDB
  * rounds the same digits Spark does, and the cast back to DOUBLE
  * keeps downstream arithmetic (and the compared column type) FP,
  * like the engine's broadcast `lit(...)` scalars.
  *
  * Exposure criterion (VERDICT r13 #2): oracles whose rounded values
  * derive from FP moment sums over modulo fixtures and 6dp-rounded fit
  * scalars — the regression/causal family. Integer-derived rounds
  * (counts, exact-integer moments per the q_anova discipline) cannot
  * land on a boundary and are left alone.
  */
object OracleRounding {

  /** Oracles in the half-boundary-exposed class: FP fit scalars +
    * modulo fixtures + rounded emitted values. Grep-auditable single
    * list; add any new regression-family oracle here. */
  val exposed: Set[String] = Set(
    "q_influence",      // r13's red row: residual on the 1e-6 half boundary
    "eval_ols_robust",  // HC0 sandwich from FP moment sums
    "eval_ridge",       // 3x3 ridge solve, FP determinant path
    "eval_platt",       // GD-fit scalars rounded at dp
    "q_rdd",            // local-linear fits both sides of the cutoff
    "q_oaxaca",         // two group fits + decomposition products
    "q_granger",        // lagged OLS SSE ratios
    "q_cuped",          // theta from FP covariance ratio
    "q_did",            // four FP group means + interaction
    "q_ipw",            // propensity-weighted FP sums
    "q_aipw",           // doubly-robust: propensity + outcome fits
    "q_event_study",    // per-period FP coefficient path
    "eval_logreg",      // unrolled GD chain, rounded weights
    // (pipeline_quality_clf is the same GD shape but its oracle emits
    // integer counts only — nothing rounded, nothing exposed)
    "q_elasticity",     // log-log OLS slope from FP moments
    "q_theil_sen"       // median-of-slopes FP ratios, rounded outputs
  )

  /** Rewrite every `round(expr[, dp])` call in `sql` (case-insensitive,
    * balanced-paren aware, quote-aware) to the DECIMAL-cast convention.
    * Nested rounds are rewritten innermost-first. */
  def decimalRound(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') { // skip string literals verbatim
        val close = sql.indexOf('\'', i + 1)
        val end = if (close < 0) n else close + 1
        sb.append(sql.substring(i, end)); i = end
      } else if ((c == 'r' || c == 'R') && sql.regionMatches(true, i, "round", 0, 5)
          && (i == 0 || !isWordChar(sql.charAt(i - 1)))) {
        // find '(' after optional whitespace
        var j = i + 5
        while (j < n && sql.charAt(j).isWhitespace) j += 1
        if (j < n && sql.charAt(j) == '(') {
          // scan to matching ')', tracking depth and quotes; note the
          // top-level comma splitting expr from dp (if present)
          var depth = 1; var k = j + 1; var comma = -1
          while (k < n && depth > 0) {
            val ch = sql.charAt(k)
            if (ch == '\'') { val q = sql.indexOf('\'', k + 1); k = if (q < 0) n - 1 else q }
            else if (ch == '(') depth += 1
            else if (ch == ')') depth -= 1
            else if (ch == ',' && depth == 1 && comma < 0) comma = k
            k += 1
          }
          val close = k - 1 // index of matching ')'
          val (expr, dpPart) =
            if (comma >= 0) (sql.substring(j + 1, comma), sql.substring(comma + 1, close))
            else (sql.substring(j + 1, close), "0")
          sb.append("CAST(round(CAST(").append(decimalRound(expr))
            .append(" AS DECIMAL(38,18)), ").append(dpPart.trim)
            .append(") AS DOUBLE)")
          i = close + 1
        } else { sb.append(sql.substring(i, j)); i = j }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Apply the convention to the exposed subset of an oracle map. */
  def apply(oracle: Map[String, String]): Map[String, String] =
    oracle.map { case (k, v) => k -> (if (exposed(k)) decimalRound(v) else v) }
}
