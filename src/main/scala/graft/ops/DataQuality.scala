package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deequ-style declarative data-quality validation — the constraint
  * suite a production pipeline runs on every ingested partition before
  * letting it into the lake (null rates, key uniqueness, value
  * domains, range windows, cross-table referential integrity).
  *
  * Shape: ALL single-table metrics come out of ONE scan + one
  * partial/final aggregate (a 1-row relation, unpivoted driver-free
  * with `stack`), so adding a constraint costs an expression, not a
  * pass. The two referential checks are anti-join counts that shuffle
  * on the FK; at 100 TB those are the same exchanges the first real
  * join of the day would pay, and AQE sizes them. Nothing here
  * collects more than the fixed constraint rows.
  *
  * Output: one row per constraint — (check_name, value, pass) with
  * `value` the exact BIGINT metric and `pass` an INT 0/1 (row_count
  * must be positive; every other metric counts violations and must be
  * zero). INT rather than BOOLEAN keeps the cross-engine canonical
  * form trivial.
  */
object DataQuality {

  def ordersChecks(orders: DataFrame, customer: DataFrame,
      lineitem: DataFrame): DataFrame = {
    // NULL-hostile domains: a NULL status/date is a violation, not a
    // skip — fold IS NULL into the predicate before the negation.
    val statusBad = col("o_orderstatus").isNull ||
      !col("o_orderstatus").isin("O", "F", "P")
    val dateBad = col("o_orderdate").isNull ||
      col("o_orderdate") < lit("1992-01-01").cast("timestamp") ||
      col("o_orderdate") >= lit("1999-01-01").cast("timestamp")
    val m = orders.agg(
      count(lit(1)).as("row_count"),
      count(when(col("o_orderkey").isNull, 1)).as("orderkey_nulls"),
      (count(col("o_orderkey")) - countDistinct(col("o_orderkey")))
        .as("orderkey_dupes"),
      count(when(col("o_custkey").isNull, 1)).as("custkey_nulls"),
      count(when(col("o_totalprice").isNull ||
        col("o_totalprice") <= 0.0, 1)).as("totalprice_nonpos"),
      count(when(statusBad, 1)).as("status_domain"),
      count(when(dateBad, 1)).as("orderdate_range"))
    val long = m.selectExpr(
      """stack(7,
        |  'row_count', row_count,
        |  'orderkey_nulls', orderkey_nulls,
        |  'orderkey_dupes', orderkey_dupes,
        |  'custkey_nulls', custkey_nulls,
        |  'totalprice_nonpos', totalprice_nonpos,
        |  'status_domain', status_domain,
        |  'orderdate_range', orderdate_range) AS (check_name, value)
        |""".stripMargin)
    val orphanOrders = orders
      .join(customer, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("value"))
      .select(lit("ri_orders_customer").as("check_name"), col("value"))
    val orphanLines = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("value"))
      .select(lit("ri_lineitem_orders").as("check_name"), col("value"))
    long.unionByName(orphanOrders).unionByName(orphanLines)
      .select(col("check_name"), col("value"),
        when(col("check_name") === "row_count", col("value") > 0)
          .otherwise(col("value") === 0).cast("int").as("pass"))
  }

  /** The same Deequ-style suite shape over the CORPUS table — the DQ
    * gate a training pipeline runs before ingest: completeness of
    * text/lang/source, doc_id uniqueness, a lang domain check, and a
    * non-degenerate length bound (n_chars must match length(text) —
    * catching a stale derived column, the classic silent corruption).
    * One scan + one 1-row aggregate; stack-unpivoted like the orders
    * suite. */
  def documentsChecks(docs: DataFrame): DataFrame = {
    val langBad = col("lang").isNull ||
      !col("lang").isin("en", "de", "es", "fr", "zh")
    val m = docs.agg(
      count(lit(1)).as("row_count"),
      count(when(col("doc_id").isNull, 1)).as("docid_nulls"),
      (count(col("doc_id")) - countDistinct(col("doc_id")))
        .as("docid_dupes"),
      count(when(col("text").isNull || length(col("text")) === 0, 1))
        .as("text_empty"),
      count(when(langBad, 1)).as("lang_domain"),
      count(when(col("source").isNull, 1)).as("source_nulls"),
      count(when(col("n_chars").isNull ||
        col("n_chars") =!= length(col("text")).cast("long"), 1))
        .as("nchars_stale"))
    m.selectExpr(
      """stack(7,
        |  'row_count', row_count,
        |  'docid_nulls', docid_nulls,
        |  'docid_dupes', docid_dupes,
        |  'text_empty', text_empty,
        |  'lang_domain', lang_domain,
        |  'source_nulls', source_nulls,
        |  'nchars_stale', nchars_stale) AS (check_name, value)
        |""".stripMargin)
      .select(col("check_name"), col("value"),
        when(col("check_name") === "row_count", col("value") > 0)
          .otherwise(col("value") === 0).cast("int").as("pass"))
  }

  def documentsChecksSql(): String =
    """WITH m AS (
      |  SELECT COUNT(*) AS row_count,
      |    COUNT(CASE WHEN doc_id IS NULL THEN 1 END) AS docid_nulls,
      |    COUNT(doc_id) - COUNT(DISTINCT doc_id) AS docid_dupes,
      |    COUNT(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 END)
      |      AS text_empty,
      |    COUNT(CASE WHEN lang IS NULL
      |      OR lang NOT IN ('en','de','es','fr','zh') THEN 1 END)
      |      AS lang_domain,
      |    COUNT(CASE WHEN source IS NULL THEN 1 END) AS source_nulls,
      |    COUNT(CASE WHEN n_chars IS NULL
      |      OR n_chars <> CAST(length(text) AS BIGINT) THEN 1 END)
      |      AS nchars_stale
      |  FROM documents),
      |u AS (
      |  SELECT 'row_count' AS check_name, row_count AS value FROM m
      |  UNION ALL SELECT 'docid_nulls', docid_nulls FROM m
      |  UNION ALL SELECT 'docid_dupes', docid_dupes FROM m
      |  UNION ALL SELECT 'text_empty', text_empty FROM m
      |  UNION ALL SELECT 'lang_domain', lang_domain FROM m
      |  UNION ALL SELECT 'source_nulls', source_nulls FROM m
      |  UNION ALL SELECT 'nchars_stale', nchars_stale FROM m)
      |SELECT check_name, value,
      |  CAST(CASE WHEN check_name = 'row_count' THEN value > 0
      |    ELSE value = 0 END AS INT) AS pass
      |FROM u""".stripMargin

  def ordersChecksSql(): String =
    """WITH m AS (
      |  SELECT COUNT(*) AS row_count,
      |    COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS orderkey_nulls,
      |    COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS orderkey_dupes,
      |    COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS custkey_nulls,
      |    COUNT(CASE WHEN o_totalprice IS NULL
      |      OR o_totalprice <= 0.0 THEN 1 END) AS totalprice_nonpos,
      |    COUNT(CASE WHEN o_orderstatus IS NULL
      |      OR o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS status_domain,
      |    COUNT(CASE WHEN o_orderdate IS NULL
      |      OR o_orderdate < TIMESTAMP '1992-01-01 00:00:00'
      |      OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00' THEN 1 END)
      |      AS orderdate_range
      |  FROM orders),
      |u AS (
      |  SELECT 'row_count' AS check_name, row_count AS value FROM m
      |  UNION ALL SELECT 'orderkey_nulls', orderkey_nulls FROM m
      |  UNION ALL SELECT 'orderkey_dupes', orderkey_dupes FROM m
      |  UNION ALL SELECT 'custkey_nulls', custkey_nulls FROM m
      |  UNION ALL SELECT 'totalprice_nonpos', totalprice_nonpos FROM m
      |  UNION ALL SELECT 'status_domain', status_domain FROM m
      |  UNION ALL SELECT 'orderdate_range', orderdate_range FROM m
      |  UNION ALL SELECT 'ri_orders_customer',
      |    (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
      |       ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
      |  UNION ALL SELECT 'ri_lineitem_orders',
      |    (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
      |       ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL))
      |SELECT check_name, value,
      |  CAST(CASE WHEN check_name = 'row_count' THEN value > 0
      |    ELSE value = 0 END AS INT) AS pass
      |FROM u""".stripMargin

  // -------------------------------------------------------------------
  // Join-key skew report — the "will this shuffle melt at 1000
  // executors" audit, run BEFORE committing a plan, not after a 4-hour
  // straggler. For every join/groupBy key family the schema actually
  // uses, one row: distinct keys, total rows, the hottest key's count,
  // its row share (top_share — a 0.3 here means one reducer gets 30%
  // of the shuffle), and the Herfindahl concentration index
  // (hhi = Σ(c_k/N)²; 1/n_keys for uniform keys, →1 as one key
  // absorbs everything — the scalar you trend per ingest day).
  // Everything is one count-per-key aggregate per family (map-side
  // combinable, key-cardinality-sized output) folded to a 1-row
  // summary; Σc² runs in DECIMAL(38,0)/HUGEINT because squared hot-key
  // counts pass 2^63 long before a 100 TB table does.
  // -------------------------------------------------------------------
  def keySkewReport(
      events: DataFrame, lineitem: DataFrame, orders: DataFrame,
      docs: DataFrame): DataFrame = {
    val Dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def family(name: String, keyed: DataFrame): DataFrame =
      keyed.groupBy("k").agg(count(lit(1)).as("cnt"))
        .agg(
          count(lit(1)).as("n_keys"),
          sum("cnt").as("n_rows"),
          max("cnt").as("max_cnt"),
          sum(col("cnt").cast(Dec) * col("cnt").cast(Dec)).as("s2"))
        .select(lit(name).as("family"), col("n_keys"), col("n_rows"),
          col("max_cnt"),
          (col("max_cnt").cast("double") / col("n_rows").cast("double"))
            .as("top_share"),
          (col("s2").cast("double") /
            (col("n_rows").cast("double") * col("n_rows").cast("double")))
            .as("hhi"))
    family("events.user_id", events.select(col("user_id").as("k")))
      .unionAll(family("events.event_type",
        events.select(col("event_type").as("k"))))
      .unionAll(family("lineitem.l_orderkey",
        lineitem.select(col("l_orderkey").as("k"))))
      .unionAll(family("orders.o_custkey",
        orders.select(col("o_custkey").as("k"))))
      .unionAll(family("documents.shingle3",
        Dedup.shingles(docs, 3).select(col("shingle").as("k"))))
  }

  def keySkewReportSql: String = {
    def family(name: String, keyedSql: String): String =
      s"""SELECT '$name' AS family,
         |  COUNT(*) AS n_keys,
         |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |  CAST(MAX(cnt) AS BIGINT) AS max_cnt,
         |  CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_share,
         |  CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS DOUBLE)
         |    / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)) AS hhi
         |FROM (SELECT k, COUNT(*) AS cnt FROM ($keyedSql) q GROUP BY k) c"""
        .stripMargin
    Seq(
      family("events.user_id", "SELECT user_id AS k FROM events"),
      family("events.event_type", "SELECT event_type AS k FROM events"),
      family("lineitem.l_orderkey", "SELECT l_orderkey AS k FROM lineitem"),
      family("orders.o_custkey", "SELECT o_custkey AS k FROM orders"),
      family("documents.shingle3",
        s"SELECT shingle AS k FROM (${Dedup.shinglesSql(3)}) s")
    ).mkString("\nUNION ALL ")
  }
}
