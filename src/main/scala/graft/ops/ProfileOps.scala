package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the validation pass a 100 TB ingest
  * runs before anything downstream trusts the data: per column, row
  * count, null count, exact distinct count, and lexicographic min/max
  * (every value viewed through a canonical string cast so one schema
  * covers heterogeneous column types).
  *
  * Shape: ONE scan of the table no matter how many columns are
  * profiled — each row explodes into (col_name, value) pairs in the
  * scan stage (projection only, no shuffle), then a single
  * (col_name)-grouped aggregate computes all five stats. The exact
  * distinct count is the expensive one: Spark plans it as a two-phase
  * aggregate over (col_name, value), so the shuffle carries each
  * DISTINCT pair once (map-side partial dedup), not each row — wire
  * volume is Σ per-column cardinalities, which for id-like columns is
  * O(rows) worst case. A production profiler at 100 TB swaps
  * `countDistinct` for `approx_count_distinct` (HLL partials, O(1)
  * per column on the wire) — kept exact here because exactness is
  * what the DuckDB oracle can hash-check, and the repo's HLL surface
  * (EventOps.hllUsers) already covers the approximate variant.
  *
  * Min/max over the string cast compare byte-wise in both engines
  * (Spark UTF8String and DuckDB's default binary collation are both
  * memcmp on UTF-8), so the oracle match is exact; numeric columns
  * are profiled lexicographically by design (canonical cast), not
  * numerically.
  */
object ProfileOps {

  /** One (col_name, …stats) row per profiled column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
        .as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.v").as("v"))
    stacked.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col("v"))).as("n_null"),
      countDistinct(col("v")).as("n_distinct"),
      min(col("v")).as("min_val"),
      max(col("v")).as("max_val"))
  }

  def profileSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT(CAST($c AS VARCHAR)) AS n_null,
         |  COUNT(DISTINCT CAST($c AS VARCHAR)) AS n_distinct,
         |  MIN(CAST($c AS VARCHAR)) AS min_val,
         |  MAX(CAST($c AS VARCHAR)) AS max_val
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")

  // -------------------------------------------------------------------
  // Corpus datacard: the one tall (metric, value) relation a dataset
  // RELEASE ships (cf. "Datasheets for Datasets", Gebru et al. 2021 —
  // the composition/size section, computed instead of hand-written):
  // corpus totals, exact-dup rate, language/source composition shares,
  // and token-length location stats, in one artifact. Everything is a
  // recipe already proven hash-exact elsewhere: integer counts,
  // DECIMAL-exact sums (string→double at the boundary), COUNT(DISTINCT
  // md5), exact interpolated percentiles (Spark `percentile` ≡ DuckDB
  // `quantile_cont`), and int/int double divisions in matching shapes.
  //
  // Shape: ONE checkpointed pass derives the (lang, source, n_chars,
  // n_toks, digest) projection, then a single global agg + two
  // |langs|-/|sources|-group aggs read it — three small aggregates
  // over a fixed-width relation, never the text again. At 100 TB the
  // card costs one corpus scan plus group-count-sized shuffles.
  // -------------------------------------------------------------------
  def datacard(docs: DataFrame): DataFrame = {
    val Dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def d(c: Column) = c.cast("string").cast("double")
    val base = docs.select(col("lang"), col("source"), col("n_chars"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_toks"),
        md5(col("text").cast("binary")).as("digest"))
      .localCheckpoint(true)
    val core = base.agg(
      count(lit(1)).as("n"),
      sum(col("n_chars").cast(Dec)).as("sc"),
      sum(col("n_toks").cast(Dec)).as("st"),
      countDistinct(col("digest")).as("dd"),
      countDistinct(col("lang")).as("nl"),
      countDistinct(col("source")).as("ns"),
      expr("percentile(n_toks, 0.5)").as("p50"),
      expr("percentile(n_toks, 0.9)").as("p90"))
    def row(name: String, v: Column) =
      core.select(lit(name).as("metric"), v.as("value"))
    val scalars =
      row("n_docs", col("n").cast("double"))
        .unionAll(row("n_tokens", d(col("st"))))
        .unionAll(row("n_chars", d(col("sc"))))
        .unionAll(row("n_langs", col("nl").cast("double")))
        .unionAll(row("n_sources", col("ns").cast("double")))
        .unionAll(row("exact_dup_frac",
          (col("n") - col("dd")).cast("double") / col("n").cast("double")))
        .unionAll(row("tokens_p50", col("p50")))
        .unionAll(row("tokens_p90", col("p90")))
        .unionAll(row("tokens_mean", d(col("st")) / col("n").cast("double")))
        .unionAll(row("chars_mean", d(col("sc")) / col("n").cast("double")))
    def shares(keyCol: String, prefix: String) =
      base.groupBy(keyCol).agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(core.select("n")))
        .select(concat(lit(prefix), col(keyCol)).as("metric"),
          (col("c").cast("double") / col("n").cast("double")).as("value"))
    scalars
      .unionAll(shares("lang", "lang_share:"))
      .unionAll(shares("source", "source_share:"))
  }

  val datacardSql: String = {
    val base =
      """SELECT lang, source, n_chars,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      t -> t <> '')) AS BIGINT) AS n_toks,
        |    md5(text) AS digest
        |  FROM documents""".stripMargin
    s"""WITH base AS ($base),
       |core AS (SELECT COUNT(*) AS n,
       |    SUM(CAST(n_chars AS DECIMAL(38,0))) AS sc,
       |    SUM(CAST(n_toks AS DECIMAL(38,0))) AS st,
       |    COUNT(DISTINCT digest) AS dd,
       |    COUNT(DISTINCT lang) AS nl,
       |    COUNT(DISTINCT source) AS ns,
       |    quantile_cont(n_toks, 0.5) AS p50,
       |    quantile_cont(n_toks, 0.9) AS p90
       |  FROM base)
       |SELECT 'n_docs' AS metric, CAST(n AS DOUBLE) AS value FROM core
       |UNION ALL SELECT 'n_tokens', CAST(CAST(st AS VARCHAR) AS DOUBLE) FROM core
       |UNION ALL SELECT 'n_chars', CAST(CAST(sc AS VARCHAR) AS DOUBLE) FROM core
       |UNION ALL SELECT 'n_langs', CAST(nl AS DOUBLE) FROM core
       |UNION ALL SELECT 'n_sources', CAST(ns AS DOUBLE) FROM core
       |UNION ALL SELECT 'exact_dup_frac',
       |  CAST(n - dd AS DOUBLE) / CAST(n AS DOUBLE) FROM core
       |UNION ALL SELECT 'tokens_p50', p50 FROM core
       |UNION ALL SELECT 'tokens_p90', p90 FROM core
       |UNION ALL SELECT 'tokens_mean',
       |  CAST(CAST(st AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) FROM core
       |UNION ALL SELECT 'chars_mean',
       |  CAST(CAST(sc AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) FROM core
       |UNION ALL SELECT concat('lang_share:', lang),
       |  CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
       |FROM (SELECT lang, COUNT(*) AS c FROM base GROUP BY lang) g, core
       |UNION ALL SELECT concat('source_share:', source),
       |  CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
       |FROM (SELECT source, COUNT(*) AS c FROM base GROUP BY source) g, core""".stripMargin
  }
}
