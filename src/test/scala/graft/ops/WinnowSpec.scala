package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing (Schleimer et al. 2003) — the local-selection guarantee,
  * density law, rightmost tie-break, and the capped pair join. */
class WinnowSpec extends SparkSpec {

  private def docsOf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("fingerprints are valid gram positions with 30-bit hashes") {
    val docs = docsOf(Seq("the quick brown fox jumps over the lazy dog"))
    val fp = Winnow.fingerprints(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(fp.nonEmpty)
    val maxPos = 43 - Winnow.K + 1
    fp.foreach { case (pos, h) =>
      assert(pos >= 1 && pos <= maxPos)
      assert(h >= 0 && h < (1L << 30))
    }
    // every selected fingerprint is the hash of the gram at its position
    val txt = "the quick brown fox jumps over the lazy dog"
    import spark.implicits._
    val gramHash = fp.map { case (pos, _) =>
      txt.substring(pos.toInt - 1, pos.toInt - 1 + Winnow.K)
    }.toSeq.toDF("g").select(Dedup.md5Base30(col("g"))).collect().map(_.getLong(0))
    assert(gramHash.toSeq == fp.map(_._2).toSeq)
  }

  test("winnowing guarantee: shared substring of length >= k+w-1 shares a fingerprint") {
    val common = "zqxjkvbnmwpfhdlg" // k+w-1 = 11 < 16 chars, rare grams
    val docs = docsOf(Seq(
      s"aaaa bbbb $common cccc dddd",
      s"eeee $common ffff gggg hhhh iiii"))
    val fp = Winnow.fingerprints(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val d0 = fp.filter(_._1 == 0L).map(_._2).toSet
    val d1 = fp.filter(_._1 == 1L).map(_._2).toSet
    assert((d0 & d1).nonEmpty, "common substring must yield a shared fingerprint")
  }

  test("density: selected count stays near 2/(w+1) of the gram stream") {
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val c = Winnow.census(docs).agg(
      sum("n_grams").cast("double"), sum("n_fp").cast("double"))
      .collect()(0)
    val density = c.getDouble(1) / c.getDouble(0)
    // theory: 2/(w+1) = 0.4 for w=4 on random streams; real text
    // repeats grams, so allow a generous band
    assert(density > 0.15 && density < 0.6, s"density $density out of band")
  }

  test("selection is deterministic and partitioning-invariant") {
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val a = Winnow.fingerprints(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = Winnow.fingerprints(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a == b)
  }

  test("pairs: identical docs share all fingerprints; cap silences hot grams") {
    val base = "the common boilerplate header that every document carries along"
    val docs = docsOf(Seq(base, base, "totally unrelated text with zero overlap qqq"))
    val p = Winnow.pairs(docs, minShared = 2, dfCap = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(p.map(t => (t._1, t._2)).toSeq == Seq((0L, 1L)))
    // with dfCap=1 every shared fingerprint is dropped -> no pairs
    assert(Winnow.pairs(docs, minShared = 1, dfCap = 1).count() == 0L)
  }

  test("oversized docs (>= 2^20 chars) are excluded, small twins keep working") {
    // past PosBase the packed (h asc, pos desc) key's position term
    // goes negative and silently corrupts the argmin (r13 advice) —
    // fingerprints() must exclude such docs, identically in the SQL
    // twin (the same `length(text) < 1048576` predicate in both).
    val big = new String(Array.fill(1 << 20)('a')) + "bcdefgh"
    val docs = docsOf(Seq(big, "the quick brown fox jumps over the lazy dog"))
    val fp = Winnow.fingerprints(docs).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(fp == Set(1L), s"oversized doc must be excluded, got $fp")
    // census excludes it too (not reported as a lying n_fp=0 row)
    val cen = Winnow.census(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cen == Set(1L))
    // and the SQL twins carry the identical predicate
    assert(Winnow.censusSql().contains("length(text) < 1048576") ||
      Winnow.censusSql().contains("length(d.text) < 1048576"))
    assert(Winnow.pairsSql().contains("length(text) < 1048576"))
  }

  test("registered query/oracle pairs exist") {
    Seq("text_winnow", "dedup_winnow").foreach { q =>
      assert(graft.SparkEntry.queries.contains(q))
      assert(graft.SparkEntry.oracleSql.contains(q))
    }
  }
}
