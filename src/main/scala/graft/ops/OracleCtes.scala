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
  * The rewrite targets exactly the top-level CTE shape `name AS (`:
  * recursive CTEs with a column list (`reach(a, b) AS (`) don't match
  * (they can't be materialized), and `WINDOW w AS (...)` clauses are
  * excluded explicitly.
  */
object OracleCtes {
  private val CteDef = """(?<!WINDOW )\b(\w+) AS \(""".r

  /** Rewrite every top-level `name AS (` CTE definition in `sql` to
    * `name AS MATERIALIZED (`. Idempotent (already-materialized CTEs
    * are left alone). */
  def materialize(sql: String): String =
    CteDef.replaceAllIn(sql, m =>
      if (sql.regionMatches(m.end, "MATERIALIZED", 0, 12)) m.matched
      else s"${m.group(1)} AS MATERIALIZED (")
}
