package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RetrievalOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
  }

  test("tfidf: rare terms outweigh common ones, idf tracks ln((N+1)/(df+1))+1") {
    val d = docs(
      0L -> "alpha beta beta", 1L -> "alpha gamma", 2L -> "alpha delta",
      3L -> "alpha epsilon")
    val out = RetrievalOps.tfidf(d).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    // alpha: df=4 (all docs) → idf = plog(5/5)+1 = 1 exactly
    val (tfA, dfA, idfA, tfidfA) = out((0L, "alpha"))
    assert(tfA == 1L && dfA == 4L && idfA == 1.0 && tfidfA == 1.0)
    // beta: df=1, tf=2 → idf = plog(5/2)+1, within portable-log error
    val (tfB, dfB, idfB, tfidfB) = out((0L, "beta"))
    assert(tfB == 2L && dfB == 1L)
    assert(math.abs(idfB - (StrictMath.log(2.5) + 1.0)) < 1e-12)
    assert(tfidfB == 2.0 * idfB)
    assert(idfB > idfA)
  }

  test("bm25: higher tf ranks first; shorter doc wins at equal tf") {
    val filler = Seq.fill(30)("filler").mkString(" ")
    val d = docs(
      0L -> s"spark spark spark $filler",
      1L -> s"spark $filler",
      2L -> s"spark filler",
      3L -> filler)
    val top = RetrievalOps.bm25TopK(d, Seq("spark"), k = 10).collect()
    // k1=1.2 saturates tf, so the 2-token doc's length normalization
    // outweighs doc 0's tf=3 over 33 tokens; the no-match doc is absent
    assert(top.map(_.getLong(0)).toSeq == Seq(2L, 0L, 1L))
    assert(top.forall(_.getDouble(1) > 0.0))
  }

  test("bm25 score is the fixed-order fold of per-term contributions") {
    val d = docs(0L -> "spark join", 1L -> "spark", 2L -> "other words")
    val top = RetrievalOps.bm25TopK(d, Seq("spark", "join"), k = 3).collect()
    // doc 0 matches both terms — its score must strictly exceed doc 1's
    assert(top.head.getLong(0) == 0L)
    assert(top(1).getLong(0) == 1L)
    assert(top.head.getDouble(1) > top(1).getDouble(1))
  }

  test("bm25 top-k plans as TakeOrderedAndProject (no global sort)") {
    val d = docs((0L to 40L).map(i => i -> s"spark doc $i words"): _*)
    val plan = RetrievalOps.bm25TopK(d, Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("hybrid RRF: a doc ranked by both lists beats single-list docs") {
    import spark.implicits._
    // corpus: doc 1 is the lexical hit; embeddings: vec 1 is also the
    // nearest neighbor of the query vec 0 → doc 1 fuses two ranks
    val d = docs(
      1L -> "spark spark spark", 2L -> "spark other", 3L -> "unrelated text")
    val embs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 0),
      (3L, Array(0.0f, 0.9f, 0.5f), 0)).toDF("vec_id", "embedding", "label")
    val out = RetrievalOps.hybridRrfTopK(d, embs, Seq("spark"),
      queryVecId = 0L, kEach = 3, k = 4).collect()
    assert(out.head.getLong(0) == 1L)
    // rrf of doc1 = 1/(60+lex_rank) + 1/(60+vec_rank), both rank 1
    assert(out.head.getDouble(3) == 1.0 / 61 + 1.0 / 61)
    // every returned doc carries at least one rank
    assert(out.forall(r => !r.isNullAt(1) || !r.isNullAt(2)))
  }

  test("cosine pairs: self-similarity 1, disjoint absent, threshold respected") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",      // identical to 1
      3L -> "alpha beta gamma zeta eta theta",     // shares a prefix
      4L -> "iota kappa lambda mu nu")             // disjoint
    val r = RetrievalOps.cosinePairs(d, minCos = 0.0).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(math.abs(r((1L, 2L)) - 1.0) < 1e-9, s"identical docs: ${r((1L, 2L))}")
    assert(r((1L, 3L)) > 0.0 && r((1L, 3L)) < 1.0)
    assert(r((1L, 3L)) == r((2L, 3L)), "identical docs score identically")
    assert(!r.keySet.exists(p => p._1 == 4L || p._2 == 4L), "disjoint doc pairs with nobody")
    val strict = RetrievalOps.cosinePairs(d, minCos = 0.9).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(strict == Set((1L, 2L)))
  }

  test("cosine pairs: the DF cap drops boilerplate shingles from the pair space") {
    // every doc shares the same 3-gram header; only 1-2 share real content
    val d = docs(
      1L -> "the common header unique one content",
      2L -> "the common header unique one content",
      3L -> "the common header other words here",
      4L -> "the common header more filler text")
    // cap 3 < df("the common header")=4: pairs exist only via non-header
    // shingles — docs 3,4 share nothing else and drop out entirely
    val capped = RetrievalOps.cosinePairs(d, maxDf = 3, minCos = 0.0)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
  }

  test("registered query/oracle pairs agree on column names") {
    for (n <- Seq("text_tfidf", "text_bm25_topk", "hybrid_rrf_topk",
        "text_cosine_pairs")) {
      assert(graft.SparkEntry.queries.contains(n), n)
      assert(graft.SparkEntry.oracleSql.contains(n), n)
    }
  }

  test("QL-Dirichlet: term-bearing docs outrank, smoothing scores every doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark hash join vector window"),   // all 5 query terms
      (2L, "spark spark spark pad pad pad"),   // one term, repeated
      (3L, "utterly unrelated words only here")
    ).toDF("doc_id", "text")
    val got = RetrievalOps.qlTopK(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // every doc scored (smoothing), ranked 1 > 2 > 3
    assert(got.length == 3)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L), s"got ${got.toSeq}")
    // scores are finite negative log-likelihoods
    assert(got.forall(t => t._2 < 0.0 && !t._2.isInfinite))
    // absent-from-corpus query terms contribute 0, not -inf
    val gotAbsent = RetrievalOps.qlTopK(docs,
      terms = Seq("spark", "zzz_nowhere"), k = 3).collect()
    assert(gotAbsent.forall(r => !r.getDouble(1).isInfinite))
  }

  test("keyphrases: rare terms outrank ubiquitous ones; ranks dense per doc") {
    import spark.implicits._
    // "common" appears in every doc (idf floor); each doc also has a
    // unique term that must win rank 1
    val docs = Seq(
      (1L, "common alpha"),
      (2L, "common beta"),
      (3L, "common gamma gamma")
    ).toDF("doc_id", "text")
    val got = RetrievalOps.keyphrases(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getString(1)).toMap
    assert(got((1L, 1L)) == "alpha" && got((2L, 1L)) == "beta"
      && got((3L, 1L)) == "gamma", got.toString)
    assert(got((1L, 2L)) == "common" && got((2L, 2L)) == "common")
  }

  test("keyphrases plan routes through TopKPerKey with no Window") {
    import spark.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = RetrievalOps.keyphrases(docs, k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    // tfidf's df count itself uses a term window — assert only that
    // the per-doc top-k is not window-ranked
    assert(!plan.contains("row_number"), plan)
  }
}
