package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableMath

/** Ranking-quality evaluation — the offline IR metrics a retrieval /
  * RAG pipeline reports for its rankers: Precision@k, MRR, AP@k, and
  * NDCG@k (Järvelin & Kekäläinen 2002) per query, from a ranked
  * relation and a graded-relevance truth relation.
  *
  * Cross-engine exactness: every metric is a FIXED left-to-right fold
  * over the k pivoted rank positions (never a float groupBy-sum, whose
  * addition order would be partitioning-dependent), and the 1/i and
  * 1/log2(i+1) discount factors are embedded as identical double
  * literals in the Column tree and the SQL twin — so the discounted
  * sums are bit-identical and the oracle gate is hash-exact.
  *
  * 100 TB posture: rankings are per-query top-k (TopKPerKey — partial
  * bounded heaps, no global sort), the metric algebra runs on the
  * k·|queries| pivoted relation (tiny), and the only corpus-sized
  * shuffles are the ones that produce the ranking itself. Nothing
  * collects to the driver.
  */
object RankEval {

  val K = 10

  /** 1/log2(i+1) NDCG discounts and 1/i AP/MRR discounts as double
    * literals — computed once here and stringified into BOTH engines,
    * so no runtime log/ division disagreement can exist. */
  private def invLog2(i: Int): Double = 1.0 / (math.log(i + 1.0) / math.log(2.0))
  private def inv(i: Int): Double = 1.0 / i

  /** Double literal for the SQL twin in E-NOTATION: DuckDB types a bare
    * 17-significant-digit decimal literal as DECIMAL(38,17), and its
    * DECIMAL→DOUBLE conversion double-rounds (scaled-int > 2^53 / 1e17)
    * — measured one ulp off the JVM's parse of the same digits. An
    * exponent suffix makes the literal DOUBLE at parse time, which is
    * round-to-nearest and bit-identical to the JVM constant. */
  private def dlit(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  // -------------------------------------------------------------------
  // Generic metric kernel: (query, doc_id, rank<=k) system ranking +
  // (query, doc_id, gain>0) graded truth -> one metrics row per query
  // in `queries` (total: queries with no relevant docs or no ranked
  // rows get all-zero metrics).
  // -------------------------------------------------------------------
  def metrics(queries: DataFrame, ranked: DataFrame, truth: DataFrame,
      k: Int = K): DataFrame = {
    require(k >= 1)
    // system side: gain and hit flag at each rank position
    val sys = ranked.join(truth, Seq("query", "doc_id"), "left")
      .select(col("query"), col("rank"),
        coalesce(col("gain"), lit(0L)).as("gain"))
    val sysPiv = sys.groupBy("query").agg(
      coalesce(max(when(col("rank") === 1, col("gain"))), lit(0L)).as("g1"),
      (2 to k).map(i =>
        coalesce(max(when(col("rank") === i, col("gain"))), lit(0L)).as(s"g$i")): _*)
    // ideal side: gains in ideal order (gain DESC, doc_id ASC) -> IDCG
    val ideal = org.apache.spark.sql.graft.TopKPerKey(
      truth, Seq("query"), Seq(("gain", false), ("doc_id", true)), k,
      rankCol = Some("irank"))
    val idealPiv = ideal.groupBy("query").agg(
      coalesce(max(when(col("irank") === 1, col("gain"))), lit(0L)).as("ig1"),
      (2 to k).map(i =>
        coalesce(max(when(col("irank") === i, col("gain"))), lit(0L)).as(s"ig$i")): _*)
    val nrel = truth.groupBy("query").agg(count(lit(1)).as("n_rel"))

    val j = queries
      .join(sysPiv, Seq("query"), "left")
      .join(idealPiv, Seq("query"), "left")
      .join(nrel, Seq("query"), "left")
    def g(i: Int): Column = coalesce(col(s"g$i"), lit(0L))
    def ig(i: Int): Column = coalesce(col(s"ig$i"), lit(0L))
    def h(i: Int): Column = when(g(i) > 0L, 1L).otherwise(0L)

    val nRel = coalesce(col("n_rel"), lit(0L))
    val hitsSum = (1 to k).map(h).reduceLeft(_ + _)
    val p = hitsSum.cast("double") / lit(k.toDouble)
    // MRR: first-hit case fold with 1/i literals
    val mrr = (1 to k).foldRight(lit(0.0): Column) { (i, rest) =>
      when(h(i) === 1L, lit(inv(i))).otherwise(rest)
    }
    // AP@k: sum_i hit_i * (prefix_hits_i / i), denominator min(n_rel, k)
    val apNum = (1 to k).map { i =>
      val prefix = (1 to i).map(h).reduceLeft(_ + _)
      (h(i) * prefix).cast("double") * lit(inv(i))
    }.reduceLeft(_ + _)
    val apDen = least(nRel, lit(k.toLong))
    val ap = when(apDen === 0L, lit(0.0))
      .otherwise(apNum / apDen.cast("double"))
    // NDCG@k with literal 1/log2(i+1) discounts
    val dcg = (1 to k).map(i => g(i).cast("double") * lit(invLog2(i)))
      .reduceLeft(_ + _)
    val idcg = (1 to k).map(i => ig(i).cast("double") * lit(invLog2(i)))
      .reduceLeft(_ + _)
    val ndcg = when(idcg === 0.0, lit(0.0)).otherwise(dcg / idcg)

    j.select(col("query"), nRel.as("n_rel"), p.as(s"p_at_$k"),
      mrr.as("mrr"), ap.as(s"ap_$k"), ndcg.as(s"ndcg_$k"))
  }

  // -------------------------------------------------------------------
  // The registered benchmark: per-term BM25 rankings over the fixed
  // query terms, judged against an INDEPENDENT graded truth (rel = tf
  // when tf >= 2, gain = 2^min(tf,4) - 1). BM25's length normalization
  // reorders docs relative to raw tf and admits tf = 1 docs the truth
  // calls irrelevant, so every metric is non-trivial. One token pass
  // feeds both sides.
  // -------------------------------------------------------------------
  def bm25Eval(docs: DataFrame,
      terms: Seq[String] = RetrievalOps.DefaultQuery, k: Int = K)(
      implicit spark: SparkSession): DataFrame = {
    require(terms.nonEmpty && terms == terms.distinct)
    import spark.implicits._
    val queries = terms.toDF("query")

    val tok = TextOps.explodedTokens(docs, "term", col("doc_id"))
    val tf = tok.filter(col("term").isin(terms: _*))
      .groupBy(col("term").as("query"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("sumdl"))
    val df = tf.groupBy("query").agg(count(lit(1)).as("df"))

    val nD = col("n").cast("double")
    val dfD = col("df").cast("double")
    val idf = PortableMath.plog(
      lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val tfD = col("tf").cast("double")
    val avgdl = col("sumdl").cast("double") / col("n").cast("double")
    val score = idf * ((tfD * lit(RetrievalOps.K1 + 1.0)) /
      (tfD + lit(RetrievalOps.K1) * (lit(1.0 - RetrievalOps.B) +
        lit(RetrievalOps.B) * (col("dl").cast("double") / avgdl))))
    val scored = tf
      .join(dl, Seq("doc_id"))
      .join(broadcast(df), Seq("query"))
      .crossJoin(broadcast(stats))
      .select(col("query"), col("doc_id"), score.as("score"), col("tf"))
    val ranked = org.apache.spark.sql.graft.TopKPerKey(
      scored.select(col("query"), col("doc_id"), col("score")),
      Seq("query"), Seq(("score", false), ("doc_id", true)), k,
      rankCol = Some("rank"))
    // graded gain 2^min(tf,4) - 1 as an explicit case fold (identical
    // literal mapping in the SQL twin). Relevance carries a facet the
    // ranker does not model — only ENGLISH docs with tf >= 2 are
    // relevant — so P/MRR/AP/NDCG are all non-degenerate (a pure-tf
    // truth is saturated by BM25's own top-10 on this corpus).
    val truth = scored.filter(col("tf") >= 2L)
      .join(docs.filter(col("lang") === "en").select("doc_id"),
        Seq("doc_id"), "left_semi")
      .select(col("query"), col("doc_id"),
        when(col("tf") >= 4L, 15L)
          .when(col("tf") === 3L, 7L).otherwise(3L).as("gain"))
    metrics(queries, ranked.select("query", "doc_id", "rank"), truth, k)
  }

  def bm25EvalSql(terms: Seq[String] = RetrievalOps.DefaultQuery,
      k: Int = K): String = {
    val k1 = java.lang.Double.toString(RetrievalOps.K1)
    val k1p1 = java.lang.Double.toString(RetrievalOps.K1 + 1.0)
    val oneMb = java.lang.Double.toString(1.0 - RetrievalOps.B)
    val bS = java.lang.Double.toString(RetrievalOps.B)
    val termVals = terms.map(t => s"('$t')").mkString(", ")
    val inList = terms.map(t => s"'$t'").mkString(", ")
    def gPiv(rk: String, pre: String) = (1 to k).map(i =>
      s"COALESCE(MAX(CASE WHEN $rk = $i THEN gain END), 0) AS $pre$i")
      .mkString(",\n|    ")
    def g(i: Int) = s"COALESCE(g$i, 0)"
    def ig(i: Int) = s"COALESCE(ig$i, 0)"
    def h(i: Int) = s"(CASE WHEN ${g(i)} > 0 THEN 1 ELSE 0 END)"
    val hitsSum = (1 to k).map(h).reduceLeft((a, b) => s"($a + $b)")
    val mrr = {
      val cases = (1 to k).map(i =>
        s"WHEN ${h(i)} = 1 THEN ${dlit(inv(i))}")
        .mkString("\n|      ")
      s"CASE $cases ELSE 0.0 END"
    }
    val apNum = (1 to k).map { i =>
      val prefix = (1 to i).map(h).reduceLeft((a, b) => s"($a + $b)")
      s"(CAST(${h(i)} * $prefix AS DOUBLE) * ${dlit(inv(i))})"
    }.reduceLeft((a, b) => s"($a + $b)")
    val dcg = (1 to k).map(i =>
      s"(CAST(${g(i)} AS DOUBLE) * ${dlit(invLog2(i))})")
      .reduceLeft((a, b) => s"($a + $b)")
    val idcg = (1 to k).map(i =>
      s"(CAST(${ig(i)} AS DOUBLE) * ${dlit(invLog2(i))})")
      .reduceLeft((a, b) => s"($a + $b)")
    s"""WITH qs(query) AS (VALUES $termVals),
       |tok AS (SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS term FROM documents),
       |tf AS (SELECT term AS query, doc_id, COUNT(*) AS tf FROM tok
       |  WHERE term IN ($inList) GROUP BY term, doc_id),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
       |stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM dl),
       |df AS (SELECT query, COUNT(*) AS df FROM tf GROUP BY query),
       |dfr AS (SELECT query,
       |    (1.0 + ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE)) + 0.5)
       |      / (CAST(df AS DOUBLE) + 0.5)) AS r
       |  FROM df CROSS JOIN stats),
       |scored AS (SELECT tf.query, tf.doc_id, tf.tf,
       |    (${PortableMath.plogSql("r")})
       |    * ((CAST(tf AS DOUBLE) * $k1p1) /
       |       (CAST(tf AS DOUBLE) + $k1 * ($oneMb + $bS *
       |         (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))))
       |    AS score
       |  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
       |  JOIN dfr ON tf.query = dfr.query CROSS JOIN stats),
       |ranked AS (SELECT query, doc_id, rank FROM (
       |    SELECT query, doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY query
       |        ORDER BY score DESC, doc_id ASC) AS rank
       |    FROM scored) r WHERE rank <= $k),
       |truth AS (SELECT query, s.doc_id,
       |    CAST(CASE WHEN tf >= 4 THEN 15 WHEN tf = 3 THEN 7 ELSE 3 END
       |      AS BIGINT) AS gain
       |  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
       |  WHERE tf >= 2 AND d.lang = 'en'),
       |syspiv AS (SELECT r.query,
       |    ${gPiv("r.rank", "g")}
       |  FROM ranked r LEFT JOIN truth t
       |    ON r.query = t.query AND r.doc_id = t.doc_id
       |  GROUP BY r.query),
       |ideal AS (SELECT query, gain,
       |    ROW_NUMBER() OVER (PARTITION BY query
       |      ORDER BY gain DESC, doc_id ASC) AS irank
       |  FROM truth),
       |idealpiv AS (SELECT query,
       |    ${gPiv("irank", "ig")}
       |  FROM ideal WHERE irank <= $k GROUP BY query),
       |nrel AS (SELECT query, COUNT(*) AS n_rel FROM truth GROUP BY query)
       |SELECT qs.query,
       |  COALESCE(n_rel, 0) AS n_rel,
       |  CAST($hitsSum AS DOUBLE) / ${dlit(k.toDouble)} AS p_at_$k,
       |  $mrr AS mrr,
       |  CASE WHEN LEAST(COALESCE(n_rel, 0), $k) = 0 THEN 0.0
       |    ELSE $apNum / CAST(LEAST(COALESCE(n_rel, 0), $k) AS DOUBLE)
       |  END AS ap_$k,
       |  CASE WHEN $idcg = 0.0 THEN 0.0 ELSE $dcg / ($idcg) END AS ndcg_$k
       |FROM qs
       |LEFT JOIN syspiv ON qs.query = syspiv.query
       |LEFT JOIN idealpiv ON qs.query = idealpiv.query
       |LEFT JOIN nrel ON qs.query = nrel.query""".stripMargin
  }
}
