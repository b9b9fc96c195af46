package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-integrity guards for SparkEntry. Scala Map literals
  * silently keep the LAST entry for a duplicated key — in r14 a new
  * "text_fertility" registration shadowed the existing one without any
  * compile- or test-time signal (caught only by an unfamiliar test
  * name in the suite output). These tests make that bug class loud by
  * comparing the SOURCE-level registration count against the runtime
  * Map sizes. */
class SparkEntrySpec extends AnyFunSuite {

  private lazy val source: String = {
    val p = java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("no duplicate keys in the queries map (source count == map size)") {
    // every query registration is written as `"name" -> ((s, dir)` —
    // the per-map source counts must equal the runtime key counts, or
    // a duplicate key silently shadowed an operator (benchOnly uses
    // the same registration shape, so count it in its own section)
    val benchOnlyStart = source.indexOf("def benchOnly")
    assert(benchOnlyStart > 0)
    val pat = raw""""[a-z0-9_]+" -> \(\(s, dir\)""".r
    val qCount = pat.findAllIn(source.substring(0, benchOnlyStart)).size
    val bCount = pat.findAllIn(source.substring(benchOnlyStart)).size
    assert(qCount == SparkEntry.queries.size,
      s"$qCount source registrations vs ${SparkEntry.queries.size} " +
        "queries keys — a duplicated query name is shadowing an operator")
    assert(bCount == SparkEntry.benchOnly.size,
      s"$bCount source registrations vs ${SparkEntry.benchOnly.size} " +
        "benchOnly keys — a duplicated name is shadowing an entry")
  }

  test("no duplicate keys in oracleSql (every source key is distinct)") {
    // oracle entries are `"name" -> <expr>` inside the oracleSql map;
    // extract the literal keys between the map's braces and require
    // they are pairwise distinct
    val start = source.indexOf("def oracleSql")
    assert(start > 0)
    val body = source.substring(start)
    val keys = raw""""([a-z0-9_]+)" ->""".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
    val dups = keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty,
      s"duplicated oracleSql keys shadow earlier entries: $dups")
    assert(keys.toSet.size == SparkEntry.oracleSql.size ||
      keys.size >= SparkEntry.oracleSql.size)
  }

  test("every oracle key has a query; benchOnly does not overlap queries") {
    val q = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- q
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
    val overlap = SparkEntry.benchOnly.keySet & q
    assert(overlap.isEmpty,
      s"benchOnly names shadowed by gated queries: $overlap")
  }
}
