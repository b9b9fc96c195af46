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
  * 100 TB posture: tf-idf is two shuffles — the (doc,term) aggregate
  * with map-side partials (the vocabulary, not the corpus, crosses the
  * wire) and a term-partitioned window for df (no second aggregate, no
  * join). BM25 is ONE corpus pass: the doc_id aggregate emits dl plus
  * every per-term tf as pivoted columns, corpus stats (N, Σdl, df_t)
  * reduce that to a single broadcast row, and the final top-k is
  * TakeOrderedAndProject, never a global sort. Nothing collects to
  * the driver.
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
    // df as a term-partitioned window over the tf relation: one term
    // shuffle instead of a separate aggregate + term join (2 shuffles
    // total — the (doc_id,term) agg and the term window)
    val df = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("term"))
    val n = docs.agg(count(lit(1)).as("n"))
    val ratio = (col("n") + lit(1L)).cast("double") /
      (col("df") + lit(1L)).cast("double")
    tf.withColumn("df", df).crossJoin(broadcast(n))
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

  /** Per-document keyphrase extraction: the top-k terms by tf-idf —
    * the cheap summary/tagging primitive (what is this doc about?).
    * Routed through the custom TopKPerKey physical operator: partial
    * k-row heaps per partition, a doc_id exchange of ≤ k·partitions
    * rows per doc, final heap merge emitting the rank — no Window, no
    * per-doc sort over the full posting relation. Order (tfidf DESC,
    * term ASC) is total, so both engines agree on every rank. */
  def keyphrases(docs: DataFrame, k: Int = 3): DataFrame =
    org.apache.spark.sql.graft.TopKPerKey(
      tfidf(docs).select(col("doc_id"), col("term"), col("tfidf")),
      Seq("doc_id"), Seq(("tfidf", false), ("term", true)), k,
      rankCol = Some("rank"))

  def keyphrasesSql(k: Int = 3): String =
    s"""WITH base AS ($tfidfSql)
       |SELECT doc_id, term, tfidf, rank FROM (
       |  SELECT doc_id, term, tfidf,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rank
       |  FROM base) r
       |WHERE rank <= $k""".stripMargin

  // -------------------------------------------------------------------
  // BM25 top-k for a fixed term list. Per-doc score
  //   Σ_t idf_t · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl)),
  // idf_t = plog(1 + (N-df+0.5)/(df+0.5)).
  //
  // ONE corpus pass: the doc_id aggregate produces dl AND every
  // per-term tf as pivoted columns (the term list is fixed); the
  // corpus stats (N, Σdl, every df) reduce that relation to a single
  // broadcast row. Two shuffles total — the per-doc aggregate and the
  // 1-row stats reduction — and the final top-k is
  // TakeOrderedAndProject. The Σ over terms is a fixed left-to-right
  // column fold (never a float groupBy-sum, whose addition order would
  // be partitioning-dependent), identical in the SQL twin.
  // -------------------------------------------------------------------
  def bm25TopK(docs: DataFrame, terms: Seq[String] = DefaultQuery,
      k: Int = 10): DataFrame = {
    require(terms.nonEmpty && terms == terms.distinct)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    val perDoc = tok(docs, col("doc_id")).groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val statCols = Seq(count(lit(1)).as("n"), sum("dl").as("sumdl")) ++
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0L, 1L).otherwise(0L)).as(s"df$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)

    val nD = col("n").cast("double")
    val avgdl = col("sumdl").cast("double") / col("n").cast("double")
    def idf(i: Int): Column = {
      val dfD = col(s"df$i").cast("double")
      PortableMath.plog(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    }
    def contrib(i: Int): Column = {
      val tfD = col(s"tf$i").cast("double")
      when(col(s"tf$i") > 0L,
        idf(i) * ((tfD * lit(K1 + 1.0)) /
          (tfD + lit(K1) * (lit(1.0 - B) + lit(B) * (col("dl").cast("double") / avgdl)))))
        .otherwise(lit(0.0))
    }
    val score = terms.indices.map(contrib).reduceLeft(_ + _)
    val matched = terms.indices.map(i => col(s"tf$i") > 0L).reduce(_ || _)
    perDoc.crossJoin(broadcast(stats))
      .filter(matched)
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  def bm25TopKSql(terms: Seq[String] = DefaultQuery, k: Int = 10): String = {
    val k1 = java.lang.Double.toString(K1)
    val k1p1 = java.lang.Double.toString(K1 + 1.0)
    val oneMb = java.lang.Double.toString(1.0 - B)
    val bS = java.lang.Double.toString(B)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS tf$i"
    }.mkString(", ")
    val dfCols = terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val rCols = terms.indices.map(i =>
      s"(1.0 + ((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE)) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) AS r$i")
      .mkString(", ")
    def contrib(i: Int): String =
      s"""CASE WHEN tf$i > 0 THEN
         |  (${PortableMath.plogSql(s"r$i")}) * ((CAST(tf$i AS DOUBLE) * $k1p1) /
         |    (CAST(tf$i AS DOUBLE) + $k1 * ($oneMb + $bS *
         |      (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))))
         |  ELSE 0.0 END""".stripMargin
    val score = terms.indices.map(contrib).reduceLeft((a, b) => s"($a + $b)")
    val matched = terms.indices.map(i => s"tf$i > 0").mkString(" OR ")
    s"""WITH tok AS ($tokSql),
       |perdoc AS (SELECT doc_id, COUNT(*) AS dl, $tfCols FROM tok GROUP BY doc_id),
       |stats0 AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl, $dfCols FROM perdoc),
       |stats AS (SELECT n, sumdl, $rCols FROM stats0)
       |SELECT doc_id, $score AS score
       |FROM perdoc CROSS JOIN stats
       |WHERE $matched
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  // -------------------------------------------------------------------
  // Query-likelihood retrieval with Dirichlet smoothing (Ponte & Croft
  // 1998; Zhai & Lafferty 2001) — the LANGUAGE-MODEL member of the
  // retrieval family (tf-idf: vector space, BM25: probabilistic
  // relevance, QL: generative): score(d) = Σ_t ln((tf_t,d + μ·P(t|C))
  // / (dl_d + μ)), P(t|C) = cf_t/|C|. Unlike BM25, EVERY document is
  // scored (smoothing gives unmatched docs mass) — the filter-free
  // ranking is the point. Same one-pass pivoted shape as BM25: per-doc
  // (dl, tf_t) aggregate, 1-row corpus stats broadcast (adds cf_t),
  // TakeOrdered top-k. Ratios are < 1, so each ln goes through the
  // SIGNED portable log (ln x = −plog(1/x) for x < 1); query terms
  // absent from the corpus (cf = 0) contribute 0 in both engines
  // rather than −∞.
  // -------------------------------------------------------------------
  val DirichletMu = 100.0

  def qlTopK(docs: DataFrame, terms: Seq[String] = DefaultQuery,
      k: Int = 10): DataFrame = {
    require(terms.nonEmpty && terms == terms.distinct)
    val mu = lit(DirichletMu)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    val perDoc = tok(docs, col("doc_id")).groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val statCols = Seq(sum("dl").as("sumdl")) ++
      terms.indices.map(i => sum(col(s"tf$i")).as(s"cf$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    def slog(x: Column): Column =
      when(x >= 1.0, PortableMath.plog(x))
        .otherwise(lit(0.0) - PortableMath.plog(lit(1.0) / x))
    def contrib(i: Int): Column = {
      val x = (col(s"tf$i").cast("double")
        + mu * (col(s"cf$i").cast("double") / col("sumdl").cast("double"))) /
        (col("dl").cast("double") + mu)
      when(col(s"cf$i") > 0L, slog(x)).otherwise(lit(0.0))
    }
    val score = terms.indices.map(contrib).reduceLeft(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  def qlTopKSql(terms: Seq[String] = DefaultQuery, k: Int = 10): String = {
    val mu = java.lang.Double.toString(DirichletMu)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS tf$i"
    }.mkString(", ")
    val cfCols = terms.indices.map(i => s"SUM(tf$i) AS cf$i").mkString(", ")
    val xCols = terms.indices.map(i =>
      s"""(CAST(tf$i AS DOUBLE) + $mu *
         | (CAST(cf$i AS DOUBLE) / CAST(sumdl AS DOUBLE))) /
         | (CAST(dl AS DOUBLE) + $mu) AS x$i""".stripMargin).mkString(", ")
    def contrib(i: Int): String =
      s"""CASE WHEN cf$i > 0 THEN
         |  CASE WHEN x$i >= 1.0 THEN (${PortableMath.plogSql(s"x$i")})
         |       ELSE 0.0 - (${PortableMath.plogSql(s"1.0 / x$i")}) END
         |  ELSE 0.0 END""".stripMargin
    val score = terms.indices.map(contrib).reduceLeft((a, b) => s"($a + $b)")
    val cfPass = terms.indices.map(i => s"cf$i").mkString(", ")
    s"""WITH tok AS ($tokSql),
       |perdoc AS (SELECT doc_id, COUNT(*) AS dl, $tfCols FROM tok GROUP BY doc_id),
       |stats AS (SELECT SUM(dl) AS sumdl, $cfCols FROM perdoc),
       |xs AS (SELECT doc_id, $cfPass, $xCols
       |       FROM perdoc CROSS JOIN stats)
       |SELECT doc_id, $score AS score
       |FROM xs
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

  // -------------------------------------------------------------------
  // All-pairs sparse cosine similarity join over tf-idf shingle
  // vectors (the inverted-index similarity join of Bayardo et al.,
  // WWW 2007 — "all-pairs"). Word 3-gram shingles (WITH multiplicity,
  // unlike the Jaccard path's distinct sets) are tf-idf weighted and
  // L2-normalized; the pair space is generated ONLY through the
  // shingle inverted index, so two docs meet iff they share a posting
  // — never a doc×doc cross product. A document-frequency cap drops
  // corpus-boilerplate shingles (df > cap contributes O(df²) candidate
  // pairs and ~zero idf weight), bounding the join's fan-out by
  // cap·|postings| — the same blocking contract as
  // Dedup.ngramJaccardPairs, here defining cosine over the KEPT
  // shingle space (exact whenever no shingle in either doc exceeds
  // the cap).
  //
  // Hash-exactness: idf is PortableMath.plog; the two float SUMs (per-
  // doc ‖w‖² and the per-pair dot product) are snapped to the 1e-12
  // integer grid and summed as DECIMAL(38,0) (corpusJsDivergence
  // recipe), so neither accumulation order nor engine can shift a bit.
  //
  // 100 TB posture: four keyed shuffles — the (doc,shingle) tf agg,
  // the shingle-partitioned df window, the doc-keyed norm agg, and the
  // inverted-index pair join feeding a map-side-combined (a,b) sum.
  // State per stage is postings-sized or pair-output-sized; nothing is
  // driver-side. (A Bayardo prefix-filter variant — candidates from a
  // bounded index prefix, pair-bounded verify — was built and measured
  // in r14: value-identical, but STRICTLY SLOWER on near-dup-heavy
  // corpora like this fixture, where the qualifying pair set itself is
  // ~replica² and the verify join pays |pairs|·|postings-per-doc|
  // intermediates. On such corpora the direct inverted-index sum IS
  // the right plan; prefix filtering only wins when few pairs qualify.)
  // -------------------------------------------------------------------
  def cosinePairs(
      docs: DataFrame, n: Int = 3, maxDf: Long = 1000,
      minCos: Double = 0.5): DataFrame = {
    val Grid = 1.0e12
    val DecInt = org.apache.spark.sql.types.DecimalType(38, 0)
    val grams = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), greatest(size(col("tk")) - (n - 1), lit(0))),
        i => array_join(slice(col("tk"), i, lit(n)), " "))).as("shingle"))
    val tf = grams.groupBy("doc_id", "shingle").agg(count(lit(1)).as("tf"))
    val dfW = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("shingle"))
    val nRow = docs.agg(count(lit(1)).as("n"))
    val w = tf.withColumn("df", dfW).filter(col("df") <= maxDf)
      .crossJoin(broadcast(nRow))
      .select(col("doc_id"), col("shingle"),
        (col("tf").cast("double") *
          (PortableMath.plog((col("n") + lit(1L)).cast("double") /
            (col("df") + lit(1L)).cast("double")) + lit(1.0))).as("w"))
    val norms = w
      .select(col("doc_id"),
        round(col("w") * col("w") * lit(Grid)).cast(DecInt).as("sq"))
      .groupBy("doc_id")
      .agg(sqrt(sum("sq").cast("string").cast("double") / lit(Grid)).as("nrm"))
    val u = w.join(norms, "doc_id")
      .select(col("doc_id"), col("shingle"), (col("w") / col("nrm")).as("u"))
    val a = u.select(col("doc_id").as("doc_a"), col("shingle"), col("u").as("ua"))
    val b = u.select(col("doc_id").as("doc_b"), col("shingle"), col("u").as("ub"))
    a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("ua") * col("ub") * lit(Grid)).cast(DecInt).as("c"))
      .groupBy("doc_a", "doc_b")
      .agg((sum("c").cast("string").cast("double") / lit(Grid)).as("cosine"))
      .filter(col("cosine") >= lit(minCos))
  }

  def cosinePairsSql(
      n: Int = 3, maxDf: Long = 1000, minCos: Double = 0.5): String = {
    val g = "1000000000000.0"
    val idf =
      s"(${PortableMath.plogSql("CAST(n + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)")} + 1.0)"
    s"""WITH grams AS (
       |  SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(tk) - ${n - 1}),
       |      i -> array_to_string(list_slice(tk, i, i + ${n - 1}), ' '))) AS shingle
       |  FROM (SELECT doc_id,
       |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
       |    FROM documents) d),
       |tf AS (SELECT doc_id, shingle, COUNT(*) AS tf FROM grams GROUP BY 1, 2),
       |dfr AS (SELECT shingle, COUNT(*) AS df FROM tf GROUP BY 1),
       |nn AS (SELECT COUNT(*) AS n FROM documents),
       |w AS (
       |  SELECT tf.doc_id, tf.shingle,
       |    CAST(tf.tf AS DOUBLE) * $idf AS w
       |  FROM tf JOIN dfr ON tf.shingle = dfr.shingle CROSS JOIN nn
       |  WHERE dfr.df <= $maxDf),
       |norms AS (
       |  SELECT doc_id,
       |    SQRT(CAST(CAST(SUM(CAST(ROUND(w * w * $g) AS DECIMAL(38,0)))
       |      AS VARCHAR) AS DOUBLE) / $g) AS nrm
       |  FROM w GROUP BY 1),
       |u AS (SELECT w.doc_id, w.shingle, w.w / norms.nrm AS u
       |      FROM w JOIN norms ON w.doc_id = norms.doc_id),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(ROUND(a.u * b.u * $g) AS DECIMAL(38,0)) AS c
       |  FROM u a JOIN u b ON a.shingle = b.shingle AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       |  CAST(CAST(SUM(c) AS VARCHAR) AS DOUBLE) / $g AS cosine
       |FROM p GROUP BY 1, 2
       |HAVING CAST(CAST(SUM(c) AS VARCHAR) AS DOUBLE) / $g >= $minCos""".stripMargin
  }
}
