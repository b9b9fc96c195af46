package graft.ops

import graft.SparkSpec

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("metrics: hand-computed P@k / MRR / AP / NDCG on a 3-deep ranking") {
    val queries = Seq("q", "z").toDF("query")
    val ranked = Seq(
      ("q", 100L, 1L), ("q", 101L, 2L), ("q", 102L, 3L)
    ).toDF("query", "doc_id", "rank")
    // doc 103 is relevant but unranked; doc 100 is ranked but irrelevant
    val truth = Seq(
      ("q", 101L, 3L), ("q", 102L, 7L), ("q", 103L, 15L)
    ).toDF("query", "doc_id", "gain")
    val m = RankEval.metrics(queries, ranked, truth, k = 3).collect()
      .map(r => r.getString(0) -> r).toMap

    val r = m("q")
    assert(r.getAs[Long]("n_rel") == 3L)
    assert(r.getAs[Double]("p_at_3") == 2.0 / 3.0)
    assert(r.getAs[Double]("mrr") == 0.5)
    // AP: hit at 2 (prefix 1) and 3 (prefix 2), n_rel = 3
    val ap = (1.0 * 0.5 + 2.0 * (1.0 / 3.0)) / 3.0
    assert(math.abs(r.getAs[Double]("ap_3") - ap) < 1e-15)
    val dcg = 3.0 / log2(3.0) + 7.0 / log2(4.0)
    val idcg = 15.0 + 7.0 / log2(3.0) + 3.0 / log2(4.0)
    assert(math.abs(r.getAs[Double]("ndcg_3") - dcg / idcg) < 1e-15)

    // query with no ranked rows and no truth: total, all-zero
    val z = m("z")
    assert(z.getAs[Long]("n_rel") == 0L)
    assert(z.getAs[Double]("p_at_3") == 0.0 && z.getAs[Double]("mrr") == 0.0
      && z.getAs[Double]("ap_3") == 0.0 && z.getAs[Double]("ndcg_3") == 0.0)
  }

  test("metrics: perfect ranking scores 1.0 everywhere") {
    val queries = Seq("q").toDF("query")
    val ranked = Seq(("q", 1L, 1L), ("q", 2L, 2L)).toDF("query", "doc_id", "rank")
    val truth = Seq(("q", 1L, 7L), ("q", 2L, 3L)).toDF("query", "doc_id", "gain")
    val r = RankEval.metrics(queries, ranked, truth, k = 2).collect()(0)
    assert(r.getAs[Double]("p_at_2") == 1.0 && r.getAs[Double]("mrr") == 1.0)
    assert(r.getAs[Double]("ap_2") == 1.0 && r.getAs[Double]("ndcg_2") == 1.0)
  }

  test("bm25Eval: per-term metrics are total over the query list and bounded") {
    implicit val s = spark
    val docs = Seq(
      (0L, "spark spark spark join", "en"),
      (1L, "spark join window", "en"),
      (2L, "spark spark other words here", "fr"),
      (3L, "nothing relevant at all", "en")
    ).toDF("doc_id", "text", "lang")
    val rows = RankEval.bm25Eval(docs, Seq("spark", "join", "absent"), k = 5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("spark", "join", "absent"))
    // 'absent' never occurs: zero relevant, zero metrics
    assert(rows("absent").getAs[Long]("n_rel") == 0L)
    assert(rows("absent").getAs[Double]("ndcg_5") == 0.0)
    // 'spark': docs 0 (tf 3, en) relevant; doc 2 (tf 2) is fr -> not
    assert(rows("spark").getAs[Long]("n_rel") == 1L)
    // every metric within [0, 1]
    rows.values.foreach { r =>
      Seq("p_at_5", "mrr", "ap_5", "ndcg_5").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c = $v")
      }
    }
  }
}
