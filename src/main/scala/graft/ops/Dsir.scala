package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
  * arXiv:2302.03169): score every raw-pool document by how much more
  * likely its hashed bag-of-words is under a target-domain unigram
  * model than under the raw-pool model, then keep the top-k.
  *
  * The hashed-feature trick is the whole scale story: both "models"
  * are bucket-count vectors of FIXED width B, so the statistics stage
  * is one keyed aggregation whose key space never grows with the
  * corpus (unlike a vocabulary), and the B-row log-ratio table
  * broadcasts back onto the token stream no matter how large the
  * corpus gets. 100 TB posture:
  *  - one pass computes target and raw bucket counts together
  *    (conditional sums, map-side combined — the corpusJsDivergence
  *    shape), shuffling at most B rows per partition;
  *  - scoring is explode → broadcast-join (B rows) → one doc_id agg;
  *    the text itself never shuffles, only (doc_id, bucket);
  *  - selection is TakeOrderedAndProject (no global sort).
  *
  * Determinism: per-bucket log ratios are plog differences snapped to
  * the 1e-12 integer grid, so the per-doc sum is an exact DECIMAL
  * integer sum — accumulation order can't shift a bit and the scores
  * hash-match the DuckDB twin (the corpusJsDivergence recipe).
  */
object Dsir {

  private val Grid = 1.0e12
  private val DecInt = DecimalType(38, 0)

  val Buckets = 4096
  val Seed = 7
  val Alpha = 1.0 // add-α smoothing per bucket

  private def bucket(tok: Column): Column =
    pmod(Dedup.md5Hash60(Seed, tok), lit(Buckets))

  private def bucketSql(expr: String): String =
    s"((${Dedup.md5Hash60Sql(Seed, expr)}) % $Buckets)"

  /** Per-document log importance weights for every raw-pool document
    * (source != targetSource): logw = Σ_tokens log p̂(b)/q̂(b) with
    * p̂ fit on the target source and q̂ on the rest of the corpus,
    * both add-α smoothed over B hash buckets. Output: (doc_id,
    * n_tokens, logw). */
  def importanceWeights(docs: DataFrame, targetSource: String): DataFrame = {
    import graft.functions.PortableMath.plog
    val toks = TextOps
      .explodedTokens(docs, "token", col("doc_id"), col("source"))
      .select(col("doc_id"), col("source"), bucket(col("token")).as("bucket"))
    val counts = toks.groupBy("bucket").agg(
      sum(when(col("source") === targetSource, 1L).otherwise(0L)).as("ct"),
      sum(when(col("source") =!= targetSource, 1L).otherwise(0L)).as("cr"))
    val tot = counts.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    def smoothed(c: Column, t: Column): Column =
      (c.cast("double") + lit(Alpha)) /
        (t.cast("double") + lit(Alpha * Buckets))
    val logRatio = counts.crossJoin(broadcast(tot)).select(
      col("bucket"),
      round((plog(smoothed(col("ct"), col("tt"))) -
        plog(smoothed(col("cr"), col("tr")))) * Grid).cast(DecInt).as("li"))
    toks.filter(col("source") =!= targetSource)
      .join(broadcast(logRatio), Seq("bucket"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("li")).cast("string").cast("double") / lit(Grid)).as("logw"))
  }

  /** Top-k raw-pool documents by importance weight (the deterministic
    * argmax-k variant of DSIR's Gumbel resample — ties broken by
    * doc_id so selection is reproducible). */
  def select(docs: DataFrame, targetSource: String, k: Int): DataFrame =
    importanceWeights(docs, targetSource)
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(k)

  /** Effective-sample-size diagnostics for the importance weights
    * (Kong 1992; Owen, Monte Carlo §9.3) — the number a pipeline owner
    * reads BEFORE trusting any weighted resample: ESS = (Σw)²/Σw² is
    * the equivalent count of equally-weighted docs, ess_frac = ESS/n
    * is the fraction of the pool doing any work, and top_share =
    * max(w)/Σw exposes one-doc domination (the failure mode where the
    * "resampled corpus" is a single document repeated). Weights are
    * max-normalized in log space (w'_i = pexp(logw_i − max logw) ∈
    * (0,1], ESS is scale-invariant) — exactness then follows the house
    * recipe: each w' snaps to the 1e-12 grid, sums are exact
    * DECIMAL(38,0), doubles only at the final divisions. Deltas below
    * −30 are clamped BEFORE pexp — value-identical (e⁻³⁰·10¹² < 0.5
    * rounds to 0 with or without the clamp) while keeping the
    * portable-exp argument inside its |k| < 2048 range at any scale.
    * One extra 1-row max + one 4-column aggregate over the existing
    * weights relation. */
  def essReport(docs: DataFrame, targetSource: String): DataFrame = {
    import graft.functions.PortableMath.pexp
    val w = importanceWeights(docs, targetSource)
    val mx = w.agg(max("logw").as("mx"))
    val g = w.crossJoin(broadcast(mx))
      .select(round(pexp(greatest(col("logw") - col("mx"),
        lit(-30.0))) * lit(Grid)).cast(DecInt).as("g"))
    def d(c: Column) = c.cast("string").cast("double")
    g.agg(count(lit(1)).as("n_docs"), sum("g").as("sg"),
        sum(col("g") * col("g")).as("sg2"), max("g").as("gmax"))
      .select(col("n_docs"),
        (d(col("sg")) * d(col("sg")) / d(col("sg2"))).as("ess"),
        (d(col("sg")) * d(col("sg")) / d(col("sg2"))
          / col("n_docs").cast("double")).as("ess_frac"),
        (d(col("gmax")) / d(col("sg"))).as("top_share"))
  }

  def essReportSql(targetSource: String): String = {
    import graft.functions.PortableMath.pexpSql
    s"""WITH ${weightsCte(targetSource)},
       |mx AS (SELECT MAX(logw) AS mx FROM docw),
       |gr0 AS (SELECT GREATEST(logw - mx, CAST(-30.0 AS DOUBLE)) AS dlt
       |  FROM docw, mx),
       |gr AS (SELECT CAST(ROUND((${pexpSql("dlt")})
       |    * 1000000000000.0) AS DECIMAL(38,0)) AS g
       |  FROM gr0),
       |agg AS (SELECT COUNT(*) AS n_docs, SUM(g) AS sg,
       |    SUM(g * g) AS sg2, MAX(g) AS gmax FROM gr)
       |SELECT CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(CAST(sg AS VARCHAR) AS DOUBLE) * CAST(CAST(sg AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(sg2 AS VARCHAR) AS DOUBLE) AS ess,
       |  CAST(CAST(sg AS VARCHAR) AS DOUBLE) * CAST(CAST(sg AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(sg2 AS VARCHAR) AS DOUBLE)
       |    / CAST(n_docs AS DOUBLE) AS ess_frac,
       |  CAST(CAST(gmax AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(sg AS VARCHAR) AS DOUBLE) AS top_share
       |FROM agg""".stripMargin
  }

  private def weightsCte(targetSource: String): String = {
    import graft.functions.PortableMath.plogSql
    val aB = Alpha * Buckets
    def smoothed(c: String, t: String) =
      s"(CAST($c AS DOUBLE) + ${Alpha}) / (CAST($t AS DOUBLE) + ${aB})"
    s"""flat AS (SELECT doc_id, source,
       |    ${bucketSql("t")} AS bucket FROM (
       |    SELECT doc_id, source, unnest(
       |      list_filter(string_split(lower(text), ' '), t -> t <> '')) AS t
       |    FROM documents) u),
       |counts AS (SELECT bucket,
       |    SUM(CASE WHEN source = '$targetSource' THEN 1 ELSE 0 END) AS ct,
       |    SUM(CASE WHEN source <> '$targetSource' THEN 1 ELSE 0 END) AS cr
       |  FROM flat GROUP BY bucket),
       |tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM counts),
       |lr AS (SELECT bucket, CAST(ROUND(
       |    ((${plogSql(smoothed("ct", "tt"))}) -
       |     (${plogSql(smoothed("cr", "tr"))})) * 1000000000000.0)
       |    AS DECIMAL(38,0)) AS li
       |  FROM counts, tot),
       |docw AS (SELECT f.doc_id, COUNT(*) AS n_tokens,
       |    CAST(CAST(SUM(l.li) AS VARCHAR) AS DOUBLE)
       |      / 1000000000000.0 AS logw
       |  FROM flat f JOIN lr l USING (bucket)
       |  WHERE f.source <> '$targetSource'
       |  GROUP BY f.doc_id)""".stripMargin
  }

  def importanceWeightsSql(targetSource: String): String =
    s"""WITH ${weightsCte(targetSource)}
       |SELECT doc_id, n_tokens, logw FROM docw""".stripMargin

  def selectSql(targetSource: String, k: Int): String =
    s"""WITH ${weightsCte(targetSource)}
       |SELECT doc_id, n_tokens, logw FROM docw
       |ORDER BY logw DESC, doc_id LIMIT $k""".stripMargin
}
