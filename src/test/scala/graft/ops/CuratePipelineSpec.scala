package graft.ops

import graft.SparkSpec

class CuratePipelineSpec extends SparkSpec {
  import spark.implicits._

  private val longText =
    "the quick brown fox jumps over the lazy dog and runs far away home tonight " +
      "while the moon rises slowly over the quiet hills and the river bends north"

  test("curation gates on quality, dedups exact copies, and tags language") {
    val docs = Seq(
      (0L, longText),               // keeper
      (5L, longText),               // exact copy → dropped (0 kept)
      (7L, "too short"),            // fails min-token gate
      (9L, "the the the the the the the the the the the the the the the the the the the the the")
      // 21 tokens but stopword_ratio 1.0 → dropped
    ).toDF("doc_id", "text")
    val out = CuratePipeline.curate(docs, minTokens = 20, maxStopwordRatio = 0.5)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L))
    assert(out(0).getAs[String]("pred_lang") == "en")
    assert(out(0).getAs[Long]("n_tokens") == 29L)
  }

  test("funnel: stage counts are monotone and agree with the stage pipelines") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val f = CuratePipeline.funnel(docs).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(f.keySet == Set("input", "quality_gate", "exact_dedup", "near_dedup"))
    // monotone: each gate can only shrink the corpus
    val order = Seq("input", "quality_gate", "exact_dedup", "near_dedup")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(f(b)._1 <= f(a)._1 && f(b)._2 <= f(a)._2, s"$a -> $b")
    }
    assert(f("input")._1 == docs.count())
    // the final stage equals the pretrain keeper count
    assert(f("near_dedup")._1 == CuratePipeline.pretrain(docs).count())
    // something must actually be dropped on the fixture corpus
    assert(f("near_dedup")._1 < f("input")._1)
  }

  test("pretrain composition: curate gate, near-dup removal, and split assignment agree with the stages") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = CuratePipeline.pretrain(docs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // kept = curated minus near-dup losers, exactly
    val curated = CuratePipeline.curate(docs).collect().map(_.getLong(0)).toSet
    val losers = graft.ops.Dedup.nearDupGroups(docs)
      .filter(org.apache.spark.sql.functions.col("doc_id") =!=
        org.apache.spark.sql.functions.col("group_id"))
      .collect().map(_.getLong(0)).toSet
    assert(out.keySet == curated.diff(losers))
    // split values come verbatim from the standalone split operator
    val split = Sampling.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    out.foreach { case (id, s) => assert(split(id) == s) }
    assert(out.nonEmpty)
  }

  test("pretrain sequences: only train-split survivors, all their tokens, nothing else") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val seqs = CuratePipeline.pretrainSequences(docs).collect()
    val seqDocs = seqs.map(_.getLong(0)).toSet
    val expect = CuratePipeline.pretrain(docs)
      .filter(col("split") === "train").collect().map(_.getLong(0)).toSet
    assert(seqDocs == expect)
    // token conservation: packed chunk tokens re-add to each doc's
    // scrubbed token count (the corpus has no PII, so == raw count)
    val nTokens = docs
      .select(col("doc_id"), org.apache.spark.sql.functions
        .size(org.apache.spark.sql.functions.split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    seqs.groupBy(_.getLong(0)).foreach { case (id, cs) =>
      assert(cs.map(_.getInt(3)).sum == nTokens(id), s"token loss in doc $id")
    }
  }

  test("decontam summary: fractions agree with the flag relation per split") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = CuratePipeline.decontamSummary(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows.nonEmpty && !rows.contains("train"))
    val contam = CuratePipeline.decontaminate(docs).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    rows.foreach { case (split, (nDocs, nCont, nHeavy, frac)) =>
      val flagged = contam.filter(_._1 == split)
      assert(nCont == flagged.size, split)
      assert(nHeavy == flagged.count(_._2 >= 10L), split)
      assert(nCont <= nDocs && frac == nCont.toDouble / nDocs, split)
    }
  }

  test("decontamination flags exactly the non-train docs sharing n-grams with train") {
    import org.apache.spark.sql.functions.col
    // enough docs that the 98/1/1 split leaves a non-train remainder;
    // vocabulary engineered so overlaps are knowable in plain Scala
    val rows = (0L until 60L).map { i =>
      val text =
        if (i % 3 == 0) s"common phrase alpha w$i extra" // shares "common phrase alpha"
        else s"u${i}a u${i}b u${i}c u${i}d u${i}e"       // all-unique 3-grams
      (i, text, "s")
    }
    val d = rows.toDF("doc_id", "text", "source")
    val split = Sampling.splitAssign(d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    def shingles(t: String): Set[String] =
      t.toLowerCase.split(" ").filter(_.nonEmpty).sliding(3).map(_.mkString(" ")).toSet
    val trainSh = rows.filter(r => split(r._1) == "train").flatMap(r => shingles(r._2)).toSet
    val expected = rows.filter(r => split(r._1) != "train")
      .map(r => r._1 -> shingles(r._2).count(trainSh.contains))
      .filter(_._2 > 0).toMap
    val got = CuratePipeline.decontaminate(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected.map { case (k, v) => k -> v.toLong })
    assert(rows.exists(r => split(r._1) != "train" && r._1 % 3 == 0),
      "fixture must produce at least one contaminated non-train doc")
  }

  test("top tokens per lang ranks by count with deterministic ties") {
    val docs = Seq(
      (1L, "apple apple banana", "en"),
      (2L, "apple cherry", "en"),
      (3L, "zebra zebra yak", "de")
    ).toDF("doc_id", "text", "lang")
    // rank is LongType since the TopKPerKey routing (heap-drain rank)
    val got = CuratePipeline.topTokensPerLang(docs, topN = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(got.toSeq == Seq(
      ("de", "zebra", 2L, 1L), ("de", "yak", 1L, 2L),
      ("en", "apple", 3L, 1L), ("en", "banana", 1L, 2L)))
  }
}
