package graft.ops

import graft.SparkSpec

/** r14 scoring/pruning additions: readability formulas on hand-counted
  * fixtures and the diversity prune's rank/parity contract. */
class ScoringOpsSpec extends SparkSpec {
  import spark.implicits._

  test("readability counts words, sentences, vowel-group syllables and applies FK exactly") {
    val docs = Seq((1L, "The cat sat. The dog ran!")).toDF("doc_id", "text")
    val r = TextOps.readability(docs).collect().head
    // tokens: the, cat, sat., the, dog, ran!  -> 6
    assert(r.getLong(1) == 6L)
    assert(r.getLong(2) == 2L) // two [.!?]+ runs
    assert(r.getLong(3) == 6L) // one vowel group per word
    val fk = 0.39 * (6.0 / 2.0) + 11.8 * (6.0 / 6.0) - 15.59
    val ease = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert(r.getDouble(5) == fk)
    assert(r.getDouble(4) == ease)
  }

  test("readability floors sentence count at 1 for punctuation-free docs") {
    val docs = Seq((1L, "no punctuation at all here")).toDF("doc_id", "text")
    val r = TextOps.readability(docs).collect().head
    assert(r.getLong(2) == 1L)
  }

  test("lang mix flags a planted code-switching doc and not monolingual ones") {
    val docs = Seq(
      // 2 en + 2 de sentences -> top_share 0.5, mixed
      (1L, "The cat is in the house. Der Hund ist nicht hier! " +
        "It is a good day for the park. Die Katze ist mit der Maus."),
      // pure en
      (2L, "The dog is in the garden. It is a fine day for a walk."),
      // no markers at all -> single 'und' language
      (3L, "zzz qqq. xxx yyy www!")
    ).toDF("doc_id", "text")
    val m = TextOps.langMix(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getBoolean(5))).toMap
    assert(m(1L)._2 == 2L && m(1L)._4 == 0.5 && m(1L)._5) // mixed en/de
    assert(m(2L) == ((2L, 1L, "en", 1.0, false)))
    assert(m(3L) == ((2L, 1L, "und", 1.0, false)))
  }

  test("diversity prune ranks by centroid distance desc and keeps odd ranks") {
    // label 0: four points on a line; centroid at 2.5 (dim0), rest 0
    def v(x: Double) = Array.tabulate(4)(i => if (i == 0) x.toFloat else 0f)
    val embs = Seq(
      (1L, v(1.0), 0), (2L, v(2.0), 0), (3L, v(3.0), 0), (4L, v(4.0), 0),
      (10L, v(10.0), 1), (11L, v(11.0), 1), (12L, v(12.0), 1)
    ).toDF("vec_id", "embedding", "label")
    val rows = EmbeddingOps.diversityPrune(embs).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    // label 0: ids 1 and 4 are the rim (d=1.5), 2 and 3 the core (d=0.5);
    // ties break by vec_id asc
    assert(rows(1L) == (1L, true) && rows(4L) == (2L, false))
    assert(rows(2L) == (3L, true) && rows(3L) == (4L, false))
    // label 1: centroid 11, rim = 10 and 12 (d=1), core = 11 (d=0)
    assert(rows(10L) == (1L, true) && rows(12L) == (2L, false))
    assert(rows(11L) == (3L, true))
    // parity keep = ceil(n/2) per label
    val kept = EmbeddingOps.diversityPrune(embs)
      .filter("kept").groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(kept == Map(0 -> 2L, 1 -> 2L))
  }
}
