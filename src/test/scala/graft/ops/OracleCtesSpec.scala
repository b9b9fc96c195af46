package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The CTE-materialization rewrite must hit exactly the top-level
  * `name AS (` definitions: recursive column-list CTEs and WINDOW
  * clauses stay untouched, and re-running the rewrite is a no-op. */
class OracleCtesSpec extends AnyFunSuite {

  test("rewrites plain CTE definitions") {
    val sql = "WITH a AS (SELECT 1),\nb AS (SELECT * FROM a) SELECT * FROM b"
    assert(OracleCtes.materialize(sql) ==
      "WITH a AS MATERIALIZED (SELECT 1),\nb AS MATERIALIZED (SELECT * FROM a) SELECT * FROM b")
  }

  test("leaves recursive column-list CTEs inline") {
    val sql = """WITH RECURSIVE pairs AS (SELECT 1 AS a, 2 AS b),
                |reach(a, b) AS (
                |  SELECT a, b FROM pairs
                |  UNION SELECT r.a, e.b FROM reach r JOIN pairs e ON r.b = e.a)
                |SELECT * FROM reach""".stripMargin
    val out = OracleCtes.materialize(sql)
    assert(out.contains("pairs AS MATERIALIZED (SELECT 1"))
    assert(out.contains("reach(a, b) AS (\n"))
  }

  test("leaves WINDOW clauses untouched") {
    val sql = "SELECT SUM(x) OVER w FROM t WINDOW w AS (PARTITION BY k)"
    assert(OracleCtes.materialize(sql) == sql)
  }

  test("does not rewrite column aliases or derived tables") {
    val sql = "SELECT md5(c) AS bucket FROM (SELECT 1 AS c) q"
    assert(OracleCtes.materialize(sql) == sql)
  }

  test("idempotent") {
    val sql = "WITH a AS (SELECT 1) SELECT * FROM a"
    val once = OracleCtes.materialize(sql)
    assert(OracleCtes.materialize(once) == once)
  }

  test("every registered oracle still parses cleanly after rewrite: no double keywords") {
    graft.SparkEntry.oracleSql.values.foreach { sql =>
      assert(!sql.contains("MATERIALIZED MATERIALIZED"))
      assert(!sql.contains("AS MATERIALIZED MATERIALIZED"))
    }
  }
}
