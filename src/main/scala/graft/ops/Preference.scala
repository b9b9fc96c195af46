package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bradley–Terry preference aggregation: reduce pairwise "A beat B"
  * judgments to one latent strength score per item — the standard
  * reduction for preference / reward-model data (which source, model,
  * or document variant wins head-to-heads), fit by the classic
  * minorization–maximization update (Hunter 2004):
  *
  *   s'_a = (W_a + ε) / Σ_b n_ab / (s_a + s_b),  then rescaled to mean 1
  *
  * Judgments here are synthesized deterministically from the corpus:
  * each document faces its doc_id+1 neighbor (an equi join, never a
  * window over a global order), cross-source pairs only, and the doc
  * with the higher TextStats lexical-diversity ratio wins (tie → the
  * lower doc_id). That reduces the corpus to a ≤ k² pair-count matrix
  * over the k sources.
  *
  * Shape at 100 TB: ONE shuffle — the (winner, loser)-keyed count
  * aggregate with map-side partials (≤ k² rows per partition on the
  * wire) — then the MM iteration runs on the collected k×k matrix on
  * the driver (k = |sources|, constant), like the codebook and
  * centroid collects elsewhere. Zero terms are folded too (adding 0.0
  * to an IEEE sum is the identity), so both engines fold the identical
  * full k-length sequences; the DuckDB twin unrolls the same fixed
  * iterations over list-of-list matrices exactly like the PCA twin.
  */
object Preference {

  private val Iters = 5
  private val Eps = 0.5

  /** The pairwise outcomes relation: (sa, sb, win_a) — one row per
    * cross-source (doc, doc_id+1) match. */
  private def matches(docs: DataFrame): DataFrame = {
    val st = graft.functions.VecFunctions.textStats(
      lower(col("text")), TextOps.stopwords)
    val scored = docs.select(col("doc_id"), col("source"), st.as("st"))
      .select(col("doc_id"), col("source"),
        (col("st").getItem(3).cast("double") / col("st").getItem(0)).as("ttr"))
    val a = scored.select(col("doc_id").as("ida"), col("source").as("sa"),
      col("ttr").as("ta"))
    val b = scored.select((col("doc_id") - 1L).as("ida"),
      col("source").as("sb"), col("ttr").as("tb"))
    a.join(b, Seq("ida"))
      .filter(col("sa") =!= col("sb"))
      .select(col("sa"), col("sb"),
        // a is the lower doc_id: ties go to a (first-wins)
        when(col("ta") >= col("tb"), 1L).otherwise(0L).as("win_a"))
  }

  /** Per-source BT scores after [[Iters]] MM rounds:
    * (source, score, wins, n_matches). */
  def bradleyTerry(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    // symmetrize: one row per ordered (s, o) with win counts
    val m = matches(docs)
    val sym = m.select(col("sa").as("s"), col("sb").as("o"), col("win_a").as("w"))
      .unionAll(m.select(col("sb").as("s"), col("sa").as("o"),
        (lit(1L) - col("win_a")).as("w")))
    val counts = sym.groupBy("s", "o")
      .agg(count(lit(1)).as("n"), sum("w").as("w"))
      .collect() // ≤ k² rows, k = |sources| (constant, like a codebook)
    val srcs = counts.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted
    val k = srcs.length
    val idx = srcs.zipWithIndex.toMap
    val n = Array.ofDim[Double](k, k)
    val w = Array.ofDim[Long](k)
    val nTot = Array.ofDim[Long](k)
    counts.foreach { r =>
      val i = idx(r.getString(0)); val j = idx(r.getString(1))
      n(i)(j) = r.getLong(2).toDouble
      w(i) += r.getLong(3)
      nTot(i) += r.getLong(2)
    }
    var x = Array.fill(k)(1.0)
    var t = 0
    while (t < Iters) {
      val x1 = Array.tabulate(k) { a =>
        var denom = 0.0; var b = 0
        while (b < k) { denom += n(a)(b) / (x(a) + x(b)); b += 1 }
        (w(a).toDouble + Eps) / denom
      }
      var s = 0.0
      locally { var a = 0; while (a < k) { s += x1(a); a += 1 } }
      val r = k.toDouble / s
      x = x1.map(_ * r)
      t += 1
    }
    import spark.implicits._
    srcs.indices.map(a => (srcs(a), x(a), w(a), nTot(a))).toSeq
      .toDF("source", "score", "wins", "n_matches")
  }

  /** DuckDB twin: same matches, same symmetrized counts, the matrices
    * as ordered list-of-lists, and the same [[Iters]] unrolled MM
    * rounds with identical left-to-right folds. */
  def bradleyTerrySql: String = {
    def fold(body: String, series: String) =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  list_transform($series, $body)), (p, q) -> p + q)""".stripMargin
    val steps = (1 to Iters).map { t =>
      s"""x$t AS MATERIALIZED (SELECT list_transform(r, v ->
         |  v * (CAST(k AS DOUBLE) / ${fold("a -> r[a]", "generate_series(1, k)")}))
         |  AS xv, k FROM (
         |    SELECT list_transform(generate_series(1, mats.k), a ->
         |      (CAST(wv[a] AS DOUBLE) + $Eps) /
         |        ${fold("b -> nm[a][b] / (xv[a] + xv[b])", "generate_series(1, mats.k)")})
         |      AS r, mats.k AS k
         |    FROM mats, x${t - 1}) t$t)""".stripMargin
    }.mkString(", ")
    s"""WITH scored AS MATERIALIZED (SELECT doc_id, source,
       |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
       |  FROM (SELECT doc_id, source, ${TextOps.tokensSql} AS toks
       |        FROM documents) d),
       |m AS (SELECT a.source AS sa, b.source AS sb,
       |  CASE WHEN a.ttr >= b.ttr THEN 1 ELSE 0 END AS win_a
       |  FROM scored a JOIN scored b ON b.doc_id = a.doc_id + 1
       |  WHERE a.source <> b.source),
       |sym AS (SELECT sa AS s, sb AS o, win_a AS w FROM m
       |  UNION ALL SELECT sb, sa, 1 - win_a FROM m),
       |cnt AS (SELECT s, o, COUNT(*) AS n, SUM(w) AS w
       |  FROM sym GROUP BY s, o),
       |srcs AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS i
       |  FROM (SELECT DISTINCT s FROM sym) t),
       |mats AS MATERIALIZED (SELECT
       |  (SELECT list(rw ORDER BY i) FROM (
       |    SELECT a.i, list(COALESCE(CAST(c.n AS DOUBLE), 0.0) ORDER BY b.i) AS rw
       |    FROM srcs a CROSS JOIN srcs b
       |    LEFT JOIN cnt c ON c.s = a.s AND c.o = b.s
       |    GROUP BY a.i) rws) AS nm,
       |  (SELECT list(wa ORDER BY i) FROM (
       |    SELECT a.i, CAST(COALESCE(SUM(c.w), 0) AS BIGINT) AS wa
       |    FROM srcs a LEFT JOIN cnt c ON c.s = a.s GROUP BY a.i) ws) AS wv,
       |  (SELECT COUNT(*) FROM srcs) AS k),
       |x0 AS (SELECT list_transform(generate_series(1, k), a ->
       |  CAST(1.0 AS DOUBLE)) AS xv, k FROM mats),
       |$steps,
       |tots AS (SELECT a.s AS source, a.i,
       |  CAST(COALESCE(SUM(c.w), 0) AS BIGINT) AS wins,
       |  CAST(COALESCE(SUM(c.n), 0) AS BIGINT) AS n_matches
       |  FROM srcs a LEFT JOIN cnt c ON c.s = a.s GROUP BY a.s, a.i)
       |SELECT t.source, x.xv[t.i] AS score, t.wins, t.n_matches
       |FROM tots t, x$Iters x""".stripMargin
  }
}
