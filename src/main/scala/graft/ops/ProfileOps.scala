package graft.ops

import org.apache.spark.sql.DataFrame
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
}
