package graft.ops

/** DuckDB CTE-materialization rewrite for the heavier oracle twins.
  *
  * DuckDB inlines every non-recursive CTE into each reference site by
  * default. For oracles whose CTE chains reference the previous step
  * more than once (the unrolled k-core peels, the per-band MinHash
  * signature fan-out, label-propagation supersteps, the Lloyd quantizer
  * unrolls), inlining re-evaluates the whole upstream pipeline per
  * reference — 3^rounds plan copies for the 4-round peel — which is
  * what exhausted the replay box's spill disk at sf1 (60–90 GB temp for
  * a 1.2 M-edge graph that materializes in MBs). The same lesson the
  * Spark side already encodes with eager `localCheckpoint(true)` per
  * superstep is expressed here with DuckDB's `AS MATERIALIZED` hint:
  * identical semantics, single evaluation per CTE.
  *
  * The rewrite is a small scanner over the WITH prologue, not a global
  * regex: it tracks paren depth and string literals, rewrites only
  * depth-0 `name AS (` definitions, and stops at the first depth-0
  * `SELECT` (the main query). That makes it structurally impossible to
  * touch a `WINDOW w1 AS (...), w2 AS (...)` clause (always inside a
  * SELECT — either at depth > 0 in a CTE body or after the stop
  * point), an `x AS (` inside a string literal, or any alias in the
  * main query. Recursive column-list CTEs (`reach(a, b) AS (`) never
  * match the `name AS (` shape; plain-named members of a WITH
  * RECURSIVE chain DO get the hint (DuckDB accepts MATERIALIZED on
  * non-self-referencing members — pinned by the DuckDB parse check in
  * OracleCtesSpec so a grammar change surfaces as a test failure, not
  * a silent replay break).
  */
object OracleCtes {

  /** Rewrite every top-level `name AS (` CTE definition in the WITH
    * prologue of `sql` to `name AS MATERIALIZED (`. Idempotent:
    * `name AS MATERIALIZED (` no longer matches the `name AS (` shape. */
  def materialize(sql: String): String = {
    val n = sql.length
    val sb = new StringBuilder(n + 64)
    var i = 0
    var depth = 0
    var done = false // past the WITH prologue (depth-0 SELECT seen)
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        // copy the quoted literal/identifier verbatim ('' / "" escape)
        val quote = c
        var j = i + 1
        var end = -1
        while (end < 0 && j < n) {
          if (sql.charAt(j) == quote) {
            if (j + 1 < n && sql.charAt(j + 1) == quote) j += 2 else end = j
          } else j += 1
        }
        val stop = if (end < 0) n - 1 else end
        sb.append(sql.substring(i, stop + 1)); i = stop + 1
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        // copy a -- comment to end-of-line (parens inside don't count)
        var j = i
        while (j < n && sql.charAt(j) != '\n') j += 1
        sb.append(sql.substring(i, j)); i = j
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') { depth -= 1; sb.append(c); i += 1 }
      else if (!done && depth == 0 && isWordChar(c) &&
        (i == 0 || !isWordChar(sql.charAt(i - 1)))) {
        var j = i
        while (j < n && isWordChar(sql.charAt(j))) j += 1
        val w = sql.substring(i, j)
        if (w.equalsIgnoreCase("SELECT")) { done = true; sb.append(w); i = j }
        else if (sql.regionMatches(j, " AS (", 0, 5)) {
          sb.append(w).append(" AS MATERIALIZED (")
          i = j + 5
          depth += 1
        } else { sb.append(w); i = j }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
