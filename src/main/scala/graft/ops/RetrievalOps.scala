package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableMath

/** Ranked retrieval over the `documents` corpus — tf-idf weighting, BM25
  * scoring, and hybrid lexical+vector fusion (reciprocal-rank fusion).
  * A training-data pipeline uses these for quality-weighted sampling,
  * targeted corpus search, and retrieval-based decontamination triage.
  *
  * Every score is built exclusively from IEEE-exact ops (integer counts,
  * correctly-rounded `+ - * / sqrt`) plus [[PortableMath.plog]] for the
  * idf logs, so all three queries sit under the driver's hash-exact
  * DuckDB gate — including the log-weighted scores, which a raw `ln()`
  * could not (Spark's StrictMath.log vs DuckDB libm disagree by 1 ulp on
  * ~8% of the idf domain; see PortableMath).
  *
  * 100 TB posture: tf and df are token-keyed aggregates with map-side
  * partials (the vocabulary, not the corpus, crosses the wire); the
  * per-term idf join keys on `term` — the df relation is |vocab|-sized
  * and already partitioned by term from its own aggregate, so Catalyst
  * reuses the exchange. BM25 restricts to the (few) query terms before
  * aggregating — a pushed-down `isin` filter at the scan — and the final
  * top-k is TakeOrderedAndProject, never a global sort. Nothing
  * collects to the driver.
  */
object RetrievalOps {

  /** Fixed BM25 free parameters (Robertson et al.; the standard Lucene
    * defaults). Emitted into both engines as identical double literals. */
  val K1 = 1.2
  val B = 0.75

  /** Default fixed query-term list for the registered queries: present
    * in the synthetic corpus at mid frequency. */
  val DefaultQuery: Seq[String] = Seq("spark", "hash", "join", "vector", "window")

  private def tok(docs: DataFrame, keep: Column*): DataFrame =
    TextOps.explodedTokens(docs, "term", keep: _*)

  private val tokSql =
    "SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS term FROM documents"

  // -------------------------------------------------------------------
  // Smoothed tf-idf (sklearn-style): idf = plog((N+1)/(df+1)) + 1,
  // tfidf = tf * idf. Two token-keyed aggregates + one |vocab|-sized
  // join; N rides along as a 1-row broadcast.
  // -------------------------------------------------------------------
  def tfidf(docs: DataFrame): DataFrame = {
    val tf = tok(docs, col("doc_id"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val ratio = (col("n") + lit(1L)).cast("double") /
      (col("df") + lit(1L)).cast("double")
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("idf", PortableMath.plog(ratio) + lit(1.0))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("idf"), (col("tf").cast("double") * col("idf")).as("tfidf"))
  }

  def tfidfSql: String =
    s"""WITH tok AS ($tokSql),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |j AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |        CAST(n.n + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE) AS r
       |      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
       |SELECT doc_id, term, tf, df,
       |  (${PortableMath.plogSql("r")} + 1.0) AS idf,
       |  CAST(tf AS DOUBLE) * (${PortableMath.plogSql("r")} + 1.0) AS tfidf
       |FROM j""".stripMargin

  // -------------------------------------------------------------------
  // BM25 top-k for a fixed term list. Per-doc score
  //   Σ_t idf_t · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl)),
  // idf_t = plog(1 + (N-df+0.5)/(df+0.5)).
  // The Σ is NOT a float groupBy-sum (addition order would be
  // partitioning-dependent): each term's contribution lands in its own
  // pivoted column — max() over a singleton group — and the final score
  // folds those columns in one fixed left-to-right chain, identical in
  // the SQL twin. doc lengths come from one corpus-wide token count.
  // -------------------------------------------------------------------
  def bm25TopK(docs: DataFrame, terms: Seq[String] = DefaultQuery,
      k: Int = 10): DataFrame = {
    require(terms.nonEmpty && terms == terms.distinct)
    val dl = tok(docs, col("doc_id")).groupBy("doc_id")
      .agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("sumdl"))
    val tf = tok(docs, col("doc_id"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))

    val nD = col("n").cast("double")
    val dfD = col("df").cast("double")
    val idf = PortableMath.plog(
      lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val avgdl = col("sumdl").cast("double") / col("n").cast("double")
    val tfD = col("tf").cast("double")
    val contrib = col("idf") * ((tfD * lit(K1 + 1.0)) /
      (tfD + lit(K1) * (lit(1.0 - B) + lit(B) * (col("dl").cast("double") / col("avgdl")))))

    val scored = tf
      .join(df.crossJoin(broadcast(stats))
        .withColumn("idf", idf)
        .withColumn("avgdl", avgdl)
        .select("term", "idf", "avgdl"), "term")
      .join(dl, "doc_id")
      .withColumn("contrib", contrib)
    // pivot into fixed per-term columns (singleton max), then fold in a
    // fixed order — bit-stable under any partitioning
    val pivots = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("contrib"))).as(s"c$i")
    }
    val folded = terms.indices
      .map(i => coalesce(col(s"c$i"), lit(0.0)))
      .reduceLeft[Column](_ + _)
    scored.groupBy("doc_id").agg(pivots.head, pivots.tail: _*)
      .select(col("doc_id"), folded.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  def bm25TopKSql(terms: Seq[String] = DefaultQuery, k: Int = 10): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val idfArg = "(1.0 + ((CAST(s.n AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))"
    val k1p1 = java.lang.Double.toString(K1 + 1.0)
    val oneMb = java.lang.Double.toString(1.0 - B)
    val pivots = terms.zipWithIndex.map { case (t, i) =>
      s"MAX(CASE WHEN term = '$t' THEN contrib END) AS c$i"
    }.mkString(", ")
    val folded = terms.indices
      .map(i => s"COALESCE(c$i, 0.0)")
      .reduceLeft((a, b) => s"($a + $b)")
    s"""WITH tok AS ($tokSql),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
       |s AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM dl),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
       |       WHERE term IN ($termList) GROUP BY doc_id, term),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |w AS (SELECT x.term,
       |        (${PortableMath.plogSql("r")}) AS idf, avgdl
       |      FROM (SELECT df.term, df.df, $idfArg AS r,
       |              CAST(s.sumdl AS DOUBLE) / CAST(s.n AS DOUBLE) AS avgdl
       |            FROM df CROSS JOIN s) x),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    w.idf * ((CAST(tf.tf AS DOUBLE) * $k1p1) /
       |      (CAST(tf.tf AS DOUBLE) + ${java.lang.Double.toString(K1)} *
       |        ($oneMb + ${java.lang.Double.toString(B)} *
       |          (CAST(dl.dl AS DOUBLE) / w.avgdl)))) AS contrib
       |  FROM tf JOIN w ON tf.term = w.term JOIN dl ON tf.doc_id = dl.doc_id),
       |piv AS (SELECT doc_id, $pivots FROM scored GROUP BY doc_id)
       |SELECT doc_id, $folded AS score FROM piv
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  // -------------------------------------------------------------------
  // Hybrid retrieval: BM25 lexical ranks ⊕ cosine vector ranks via
  // reciprocal-rank fusion, rrf = Σ_lists 1/(rrfK + rank) (Cormack et
  // al. 2009). Ranks are integers, 1/(60+r) is one exact division, and
  // the two-list sum is a fixed two-term add — hash-exact end to end.
  // The vector half keys on vec_id = doc_id (the corpus embedding).
  // -------------------------------------------------------------------
  def hybridRrfTopK(docs: DataFrame, embs: DataFrame,
      terms: Seq[String] = DefaultQuery, queryVecId: Long = 0L,
      kEach: Int = 20, k: Int = 10, rrfK: Int = 60): DataFrame = {
    val lex = bm25TopK(docs, terms, kEach)
      .select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id").asc))
          .cast("long").as("lex_rank"))
    val vec = EmbeddingOps.cosineTopK(embs, queryVecId, kEach + 1)
      .filter(col("vec_id") =!= queryVecId) // drop the query itself
      .select(col("vec_id").as("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cosine").desc, col("vec_id").asc))
          .cast("long").as("vec_rank"))
      .filter(col("vec_rank") <= kEach)
    val rrf =
      coalesce(lit(1.0) / (lit(rrfK).cast("double") + col("lex_rank").cast("double")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK).cast("double") + col("vec_rank").cast("double")), lit(0.0))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"), rrf.as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }

  def hybridRrfTopKSql(terms: Seq[String] = DefaultQuery,
      queryVecId: Long = 0L, kEach: Int = 20, k: Int = 10,
      rrfK: Int = 60): String = {
    val lexTop = bm25TopKSql(terms, kEach)
    val cosTop = EmbeddingOps.cosineTopKSql(queryVecId, kEach + 1)
    s"""WITH lex0 AS ($lexTop),
       |lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS lex_rank FROM lex0),
       |cos0 AS ($cosTop),
       |vec AS (SELECT vec_id AS doc_id,
       |          ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS vec_rank
       |        FROM cos0 WHERE vec_id <> $queryVecId
       |        ORDER BY cosine DESC, vec_id ASC LIMIT $kEach)
       |SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
       |  lex.lex_rank, vec.vec_rank,
       |  (COALESCE(1.0 / (CAST($rrfK AS DOUBLE) + CAST(lex.lex_rank AS DOUBLE)), 0.0) +
       |   COALESCE(1.0 / (CAST($rrfK AS DOUBLE) + CAST(vec.vec_rank AS DOUBLE)), 0.0)) AS rrf
       |FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
       |ORDER BY rrf DESC, doc_id ASC LIMIT $k""".stripMargin
  }
}
