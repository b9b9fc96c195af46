package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The r14 sub-document dedup family: content-defined chunking census,
  * sentence-level census, and truncation (strict token-prefix) pairs.
  * CDC is checked against an independent pure-Scala reference
  * implementation of the boundary hash and chunk assembly. */
class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  // --- pure-Scala reference twin of Dedup.md5Base30 / cdcChunkCensus ---
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def md5Base30Ref(tok: String): Long =
    java.lang.Long.parseLong(md5Hex("0|" + tok).take(15), 16) & ((1L << 30) - 1)

  private def refChunks(text: String, div: Long = 8L): Seq[String] = {
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = scala.collection.mutable.ArrayBuffer.empty[String]
    toks.foreach { t =>
      cur += t
      if (md5Base30Ref(t) % div == 0L) { out += cur.mkString(" "); cur.clear() }
    }
    if (cur.nonEmpty) out += cur.mkString(" ")
    out.toSeq
  }

  private val baseText = (1 to 120).map(i => s"tok$i").mkString(" ")

  test("CDC chunks of identical docs all reach n_docs=2 and match the reference chunking") {
    val docs = Seq((1L, baseText), (2L, baseText)).toDF("doc_id", "text")
    val census = Dedup.cdcChunkCensus(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = refChunks(baseText).groupBy(identity).map { case (c, occ) =>
      (md5Hex(c), c.split(" ").length.toLong, 2L, 2L * occ.size)
    }.toSet
    assert(refChunks(baseText).size > 3, "fixture must produce several chunks")
    assert(census.toSet == expected)
  }

  test("CDC boundaries re-align after an insertion: shared suffix chunks survive") {
    val mutated = "inserted words here " + baseText
    val docs = Seq((1L, baseText), (2L, mutated)).toDF("doc_id", "text")
    val shared = Dedup.cdcChunkCensus(docs).collect()
    val expectShared = refChunks(baseText).toSet
      .intersect(refChunks(mutated).toSet).map(md5Hex)
    assert(expectShared.nonEmpty, "fixture must re-align")
    assert(shared.map(_.getString(0)).toSet == expectShared)
  }

  test("sentence census finds exactly the planted cross-doc sentence") {
    val docs = Seq(
      (1L, "Alpha beta gamma. Shared Sentence here! Unique tail one."),
      (2L, "Other opening text? shared sentence here! Different ending.")
    ).toDF("doc_id", "text")
    val rows = Dedup.sentenceCensus(docs).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == md5Hex("shared sentence here"))
    assert(rows.head.getLong(1) == "shared sentence here".length.toLong)
    assert(rows.head.getLong(2) == 2L && rows.head.getLong(3) == 2L)
  }

  test("truncation pairs: strict token-prefix detected, divergent and sub-floor pairs excluded") {
    val a = (1 to 20).map(i => s"w$i").mkString(" ")
    val b = a + " extra tokens beyond the prefix"
    // same first 16 tokens as a, diverges at token 18
    val c = (1 to 17).map(i => s"w$i").mkString(" ") + " DIVERGED w19 w20"
    val shortDoc = (1 to 10).map(i => s"w$i").mkString(" ") // below the k=16 floor
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, shortDoc))
      .toDF("doc_id", "text")
    val pairs = Dedup.truncationPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pairs.toSet == Set((1L, 2L, 20L, 25L)))
  }
}
