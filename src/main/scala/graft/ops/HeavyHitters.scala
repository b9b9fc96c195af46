package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact φ-heavy-hitters by the classic two-pass scheme: per-partition
  * Misra–Gries summaries (bounded state) propose a candidate superset,
  * then one exact counting pass over ONLY the candidates verifies.
  *
  * Why this shape at 100 TB: a plain `GROUP BY token HAVING count >
  * n/(s+1)` shuffles the whole Zipf-tailed vocabulary; here pass 1
  * holds at most `s` counters per partition (Misra–Gries 1982) and
  * emits ≤ s keys per partition — the wire carries the tiny candidate
  * relation, never the tail. The output is EXACT and deterministic
  * regardless of partitioning:
  *
  *  - superset guarantee: an item with global count > n/(s+1) must, by
  *    pigeonhole, have count_p > n_p/(s+1) in at least one partition
  *    (if count_p ≤ n_p/(s+1) everywhere, summing gives count ≤
  *    n/(s+1) — contradiction), and Misra–Gries with s counters keeps
  *    every item of local frequency > n_p/(s+1);
  *  - the verify pass computes EXACT counts for candidates only (the
  *    candidate set broadcast-semi-joins the token scan, so the
  *    big-side filter runs before any exchange) and applies the
  *    integer-exact threshold `cnt·(s+1) > n` — false candidates from
  *    unlucky partitions are filtered, so the result is the exact
  *    heavy-hitter set however the data was partitioned.
  *
  * The DuckDB twin is the direct one-pass HAVING query — same rows by
  * the exactness argument; the sketch is a physical-plan strategy, not
  * a semantic one (the same contract as the CMS/HLL families).
  *
  * Reference anchor: extension surface (SURVEY §2.2 text-analysis
  * family); the algorithmic pattern is Misra & Gries, "Finding
  * repeated elements", Sci. Comput. Program. 2 (1982).
  */
object HeavyHitters {

  /** Per-partition Misra–Gries: at most `s` counters; emits the
    * surviving keys (candidate heavy hitters) of each partition. */
  private[ops] def mgCandidates(tokens: Dataset[String], s: Int): Dataset[String] = {
    import tokens.sparkSession.implicits._
    tokens.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        m.get(t) match {
          case Some(c) => m.update(t, c + 1L)
          case None if m.size < s => m.update(t, 1L)
          case None =>
            // decrement-all; evict zeros (the MG overflow step)
            val dead = List.newBuilder[String]
            m.foreach { case (k, c) =>
              if (c == 1L) dead += k else m.update(k, c - 1L)
            }
            dead.result().foreach(m.remove)
        }
      }
      m.keysIterator
    }
  }

  /** Exact heavy hitters of the corpus token stream: every token with
    * count·(s+1) > n, with its exact count. Default s=64 ⇒ the
    * φ > 1/65 ≈ 1.5% frequency floor. */
  def heavyHitters(docs: DataFrame, s: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = TextOps.explodedTokens(docs, "token")
    val cands = mgCandidates(toks.select("token").as[String], s)
      .toDF("token").distinct()
    val verified = toks
      .join(broadcast(cands), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val n = toks.groupBy().agg(count(lit(1)).as("n"))
    verified.crossJoin(broadcast(n))
      .where(col("cnt") * lit((s + 1).toLong) > col("n"))
      .select("token", "cnt")
  }

  /** DuckDB twin — the direct exact HAVING form. */
  def heavyHittersSql(s: Int = 64): String =
    s"""WITH tok AS (SELECT t AS token FROM (
       |    SELECT unnest(${TextOps.tokensSql}) AS t FROM documents) u)
       |SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
       |FROM tok
       |GROUP BY token
       |HAVING COUNT(*) * ${s + 1} > (SELECT COUNT(*) FROM tok)""".stripMargin
}
