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

  test("leaves comma-continued multi-definition WINDOW clauses untouched") {
    val sql = "SELECT SUM(x) OVER w1, AVG(x) OVER w2 FROM t " +
      "WINDOW w1 AS (PARTITION BY k), w2 AS (ORDER BY ts)"
    assert(OracleCtes.materialize(sql) == sql)
  }

  test("leaves `AS (` inside string literals untouched") {
    val sql = "WITH a AS (SELECT 'x AS (' AS s) SELECT * FROM a"
    assert(OracleCtes.materialize(sql) ==
      "WITH a AS MATERIALIZED (SELECT 'x AS (' AS s) SELECT * FROM a")
  }

  test("WINDOW inside a CTE body is at depth > 0 and untouched") {
    val sql = "WITH a AS (SELECT SUM(x) OVER w FROM t WINDOW w AS (PARTITION BY k)) " +
      "SELECT * FROM a"
    assert(OracleCtes.materialize(sql) ==
      "WITH a AS MATERIALIZED (SELECT SUM(x) OVER w FROM t WINDOW w AS (PARTITION BY k)) " +
        "SELECT * FROM a")
  }

  test("idempotent") {
    val sql = "WITH a AS (SELECT 1) SELECT * FROM a"
    val once = OracleCtes.materialize(sql)
    assert(OracleCtes.materialize(once) == once)
  }

  test("full-gate contract: every registered query has an oracle; benchOnly disjoint") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries without oracle: ${q.diff(o).toSeq.sorted}")
    assert(o.diff(q).isEmpty, s"oracles without query: ${o.diff(q).toSeq.sorted}")
    assert(graft.SparkEntry.benchOnly.keySet.intersect(q).isEmpty)
  }

  test("every registered oracle still parses cleanly after rewrite: no double keywords") {
    graft.SparkEntry.oracleSql.values.foreach { sql =>
      assert(!sql.contains("MATERIALIZED MATERIALIZED"))
      assert(!sql.contains("AS MATERIALIZED MATERIALIZED"))
    }
  }

  /** Real grammar gate (ADVICE r11): every registered oracle must PARSE
    * in DuckDB itself — including the MATERIALIZED hints on plain-named
    * members of WITH RECURSIVE chains, which rely on DuckDB's grammar
    * accepting the hint on non-self-referencing members. json.dumps the
    * oracle map, bind views over the sf0.001 parquet, and EXPLAIN each
    * (plans, never executes). Cancels cleanly if the driver-side python
    * duckdb isn't on this box. */
  test("every registered oracle parses in DuckDB (EXPLAIN over sf0.001 views)") {
    import scala.sys.process._
    val probe = try {
      Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ()))
    } catch { case _: java.io.IOException => 127 }
    assume(probe == 0, "python3+duckdb not available on this box")
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "sf0.001 testdata not present")

    val tmp = java.nio.file.Files.createTempFile("oracles", ".json")
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(tmp, json)
    val py =
      """import json, os, sys, duckdb
        |con = duckdb.connect()
        |sf = "/root/testdata/sf0.001"
        |for t in ["region","nation","customer","supplier","part","orders",
        |          "lineitem","events","documents","embeddings"]:
        |    p = os.path.join(sf, t + ".parquet")
        |    if os.path.exists(p):
        |        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        |bad = []
        |for name, sql in json.load(open(sys.argv[1])).items():
        |    try:
        |        con.execute("EXPLAIN " + sql)
        |    except Exception as e:
        |        bad.append(f"{name}: {type(e).__name__}: {e}")
        |print("\n".join(bad))
        |sys.exit(1 if bad else 0)
        |""".stripMargin
    val out = new StringBuilder
    val rc = Process(Seq("python3", "-c", py, tmp.toString))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    java.nio.file.Files.deleteIfExists(tmp)
    assert(rc == 0, s"oracles failed DuckDB parse:\n$out")
  }
}
