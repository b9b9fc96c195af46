package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Substring-level (span) duplicate detection — the training-data
  * pattern of Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better": memorization-prone corpora contain exact
  * token spans repeated across documents (boilerplate, licenses,
  * templated text) that whole-document dedup never sees. The reference
  * approach builds a suffix array; the Spark-native equivalent is a
  * sliding token window keyed by a content hash — every w-token window
  * of every doc, grouped corpus-wide:
  *
  *   windows:  (doc_id, pos, key = md5(window text))  — zero shuffle,
  *             explode is scan-stage
  *   dup keys: group by key, count occurrences / distinct docs
  *   stats:    per-doc fraction of windows that are duplicated
  *
  * 100 TB posture: the only shuffle keys on the 128-bit window hash
  * with map-side partial aggregation (repeated boilerplate collapses on
  * the map side by construction — the hotter the span, the fewer rows
  * cross the wire per partition). The per-doc stats reuse the doc_id
  * partitioning of the window relation. Window text itself never
  * shuffles — only the fixed-width key does. A production variant would
  * key on a 60-bit prefix of the digest to halve shuffle width
  * (collision math as in Dedup.exactByFingerprint); the md5 hex key
  * here keeps the whole pipeline DuckDB-expressible.
  */
object SpanDedup {

  /** Sliding w-token windows as (doc_id, pos, key). `pos` is 1-based
    * token index of the window start (generate_series/sequence agree). */
  def windows(docs: DataFrame, w: Int): DataFrame = {
    val tk = TextOps.tokens(col("text"))
    docs
      .select(col("doc_id"), tk.as("tk"))
      .filter(size(col("tk")) >= w)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("tk")) - (w - 1)),
        i => struct(i.as("pos"),
          md5(array_join(slice(col("tk"), i, lit(w)), " ").cast("binary")).as("key"))))
        .as("win"))
      .select(col("doc_id"), col("win.pos").cast("long").as("pos"), col("win.key"))
  }

  def windowsSql(w: Int): String =
    s"""SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |  md5(array_to_string(list_slice(tk, i, i + ${w - 1}), ' ')) AS key
       |FROM (SELECT doc_id,
       |        list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
       |      FROM documents) d
       |CROSS JOIN unnest(generate_series(1, len(tk) - ${w - 1})) AS u(i)
       |WHERE len(tk) >= $w""".stripMargin

  /** Default window width. Lee et al. use 50 BPE tokens; the synthetic
    * fixture's docs are ~30 whitespace tokens, so the registered query
    * uses a width that actually produces cross-doc repeats. */
  val DefaultW = 8

  // -------------------------------------------------------------------
  // Corpus-wide duplicated spans: every window key occurring more than
  // once, with occurrence/doc counts and the canonical (lowest doc_id,
  // lowest pos) witness — integer mins, order-independent.
  // -------------------------------------------------------------------
  def dupSpans(docs: DataFrame, w: Int = DefaultW, minOcc: Int = 2): DataFrame =
    // Two-level aggregate instead of a single groupBy with
    // countDistinct: the distinct-aggregate plan EXPANDs every window
    // row 2x into one giant hash aggregate, which SpanDedupBench
    // measured super-linear (7.4s -> 246s for 100k -> 400k docs) once
    // the per-partition hash maps outgrew memory. Pre-aggregating on
    // (key, doc_id) first computes the identical result — n_occ as a
    // sum of per-doc counts, n_docs as a plain count — with map-side
    // combine at BOTH levels and no row expansion (246s -> ~13s at
    // 400k docs / 21M windows in the same SpanDedupBench session).
    windows(docs, w)
      .groupBy("key", "doc_id").agg(
        count(lit(1)).as("c"),
        min("pos").as("mp"))
      .groupBy("key").agg(
        sum("c").as("n_occ"),
        count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"),
        min("mp").as("min_pos"))
      .filter(col("n_occ") >= minOcc)

  def dupSpansSql(w: Int = DefaultW, minOcc: Int = 2): String =
    s"""SELECT key, COUNT(*) AS n_occ,
       |  COUNT(DISTINCT doc_id) AS n_docs,
       |  MIN(doc_id) AS first_doc, MIN(pos) AS min_pos
       |FROM (${windowsSql(w)}) win
       |GROUP BY key HAVING COUNT(*) >= $minOcc""".stripMargin

  // -------------------------------------------------------------------
  // Per-document span-duplication profile: how much of each doc is
  // covered by corpus-duplicated spans. Docs shorter than w tokens have
  // no windows and report 0. dup_frac is one exact integer division.
  // -------------------------------------------------------------------
  def spanStats(docs: DataFrame, w: Int = DefaultW): DataFrame = {
    val win = windows(docs, w)
    val dupKeys = win.groupBy("key").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2).select("key")
    val perDoc = win
      .join(dupKeys, Seq("key"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_windows"))
    val totals = win.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
    docs.select("doc_id")
      .join(totals, Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        when(coalesce(col("n_windows"), lit(0L)) === 0L, lit(0.0))
          .otherwise(coalesce(col("n_dup_windows"), lit(0L)).cast("double")
            / col("n_windows").cast("double")).as("dup_frac"))
  }

  def spanStatsSql(w: Int = DefaultW): String =
    s"""WITH win AS (${windowsSql(w)}),
       |dupkeys AS (SELECT key FROM win GROUP BY key HAVING COUNT(*) >= 2),
       |perdoc AS (SELECT doc_id, COUNT(*) AS n_dup_windows FROM win
       |           WHERE key IN (SELECT key FROM dupkeys) GROUP BY doc_id),
       |totals AS (SELECT doc_id, COUNT(*) AS n_windows FROM win GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(t.n_windows, 0) AS n_windows,
       |  COALESCE(p.n_dup_windows, 0) AS n_dup_windows,
       |  CASE WHEN COALESCE(t.n_windows, 0) = 0 THEN 0.0
       |       ELSE CAST(COALESCE(p.n_dup_windows, 0) AS DOUBLE)
       |            / CAST(t.n_windows AS DOUBLE) END AS dup_frac
       |FROM documents d
       |LEFT JOIN totals t ON d.doc_id = t.doc_id
       |LEFT JOIN perdoc p ON d.doc_id = p.doc_id""".stripMargin
}
