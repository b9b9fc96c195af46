package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pre-training corpus *shaping* operators — the step after curation
  * ([[CuratePipeline]]) where cleaned documents are turned into the
  * fixed-length training sequences a model actually consumes:
  *
  *  - [[chunkDocs]]: split each document into overlapping fixed-token
  *    context windows (the "chunk to sequence length" pass);
  *  - [[packSequences]]: assign documents to fixed-capacity token bins
  *    (the "sequence packing" pass that keeps batches dense);
  *  - [[scrubPii]]: regex redaction of emails / URLs / phone numbers
  *    (the safety scrub that runs before any text leaves curation).
  *
  * Everything is a declarative column pipeline (whole-stage codegen, no
  * UDFs) with an exact DuckDB SQL twin. 100 TB posture: chunking and
  * scrubbing are per-row projections — zero shuffle, scan-parallel;
  * packing windows over (shard, doc_id), so the only shuffle is one
  * hash partition per shard and no global ordering bottleneck exists.
  */
object PretrainOps {

  /** Single-spaced token stream: trim + collapse runs of spaces, then
    * split. Stays inside whole-stage codegen (no array-lambda filter). */
  private def normTokens(text: Column): Column =
    split(regexp_replace(trim(text), " +", " "), " ")

  private val normTokensSql =
    "string_split(regexp_replace(trim(text), ' +', ' ', 'g'), ' ')"

  // -------------------------------------------------------------------
  // Chunking: one row per (doc, window) with stride = size - overlap.
  // Chunk starts are 0, stride, 2*stride, ... < n_tokens, so the final
  // window may be shorter than `size` (standard sliding-window
  // semantics). Pure projection + Generate: zero shuffle; the explode
  // multiplies rows ~n_tokens/stride-fold but never moves them.
  // -------------------------------------------------------------------
  def chunkDocs(docs: DataFrame, size: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < size, s"need 0 <= overlap < size, got $overlap/$size")
    val stride = size - overlap
    docs
      .select(col("doc_id"), normTokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0),
          org.apache.spark.sql.functions.size(col("toks")) - 1, lit(stride)))
          .as(Seq("chunk_id", "start")))
      .select(
        col("doc_id"),
        col("chunk_id"),
        org.apache.spark.sql.functions.size(
          slice(col("toks"), col("start") + 1, lit(size))).as("n_chunk_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(size)), " ")
          .as("chunk_text"))
  }

  def chunkDocsSql(size: Int = 64, overlap: Int = 16): String = {
    val stride = size - overlap
    s"""SELECT doc_id,
       |  CAST(s / $stride AS INTEGER) AS chunk_id,
       |  CAST(len(list_slice(toks, s + 1, s + $size)) AS INTEGER) AS n_chunk_tokens,
       |  array_to_string(list_slice(toks, s + 1, s + $size), ' ') AS chunk_text
       |FROM (
       |  SELECT doc_id, toks,
       |    unnest(generate_series(0, len(toks) - 1, $stride)) AS s
       |  FROM (SELECT doc_id, $normTokensSql AS toks FROM documents) t) w""".stripMargin
  }

  // -------------------------------------------------------------------
  // Sequence packing: each document gets a deterministic (bin_id,
  // offset) inside its shard from the running token total in doc_id
  // order — the greedy concat-and-fill layout LLM loaders use to keep
  // batches dense. Documents longer than the capacity simply straddle
  // bins (the chunker above splits them downstream).
  //
  // The window partitions by shard (`source`), NOT a global ORDER BY:
  // per-shard prefix sums run in parallel, one hash shuffle total, and
  // the per-shard sort is exactly the order a per-worker packer
  // consumes — no single-partition bottleneck at any scale.
  // -------------------------------------------------------------------
  def packSequences(docs: DataFrame, capacity: Int = 512): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.size(normTokens(col("text")))
          .cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col("doc_id"), col("source"), col("n_tokens"),
        floor(col("cum_before") / lit(capacity)).cast("long").as("bin_id"),
        (col("cum_before") % lit(capacity)).as("offset_in_bin"))
  }

  def packSequencesSql(capacity: Int = 512): String =
    s"""SELECT doc_id, source, n_tokens,
       |  CAST(FLOOR(cum_before / $capacity) AS BIGINT) AS bin_id,
       |  cum_before % $capacity AS offset_in_bin
       |FROM (
       |  SELECT doc_id, source, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM (SELECT doc_id, source,
       |          CAST(len($normTokensSql) AS BIGINT) AS n_tokens
       |        FROM documents) t) w""".stripMargin

  // -------------------------------------------------------------------
  // PII scrub: redact emails, then URLs, then phone-shaped numbers
  // (email first — its local part would otherwise survive inside a
  // URL-ish token). Pure per-row projection, zero shuffle. Patterns
  // stay inside the Java-regex ∩ RE2 common subset so the DuckDB twin
  // is bit-identical.
  // -------------------------------------------------------------------
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val UrlRe = "https?://[^\\s]+"
  private val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Redacted text + per-kind match counts for every input row. */
  def scrubPii(docs: DataFrame, textCol: Column = col("text")): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(textCol, EmailRe, "<EMAIL>"),
          UrlRe, "<URL>"),
        PhoneRe, "<PHONE>").as("clean_text"),
      org.apache.spark.sql.functions.size(
        regexp_extract_all(textCol, lit(EmailRe), lit(0))).as("n_emails"),
      org.apache.spark.sql.functions.size(
        regexp_extract_all(textCol, lit(UrlRe), lit(0))).as("n_urls"),
      org.apache.spark.sql.functions.size(
        regexp_extract_all(textCol, lit(PhoneRe), lit(0))).as("n_phones"))

  def scrubPiiSql(textExpr: String = "text"): String =
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace($textExpr,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$UrlRe', '<URL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g') AS clean_text,
       |  CAST(len(regexp_extract_all($textExpr, '$EmailRe')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all($textExpr, '$UrlRe')) AS INTEGER) AS n_urls,
       |  CAST(len(regexp_extract_all($textExpr, '$PhoneRe')) AS INTEGER) AS n_phones
       |FROM documents""".stripMargin

  /** The testdata corpus contains no PII by construction, which would
    * make a scrub oracle vacuous — so the registered query deterministically
    * plants an email + URL on every row and a second email on every third
    * row (doc_id-derived, identical in the SQL twin), then proves the
    * scrub removes exactly what was planted. */
  def scrubPlanted(docs: DataFrame): DataFrame = {
    val planted = concat(
      col("text"),
      lit(" reach user"), col("doc_id").cast("string"),
      lit("@example.com via https://ex.org/p?id="), col("doc_id").cast("string"),
      lit(" or 555-123-4567"),
      when(pmod(col("doc_id"), lit(3)) === 0, " cc admin@ex.net").otherwise(""))
    scrubPii(docs, planted)
  }

  def scrubPlantedSql(): String = {
    val planted =
      """text || ' reach user' || CAST(doc_id AS VARCHAR)
        | || '@example.com via https://ex.org/p?id=' || CAST(doc_id AS VARCHAR)
        | || ' or 555-123-4567'
        | || CASE WHEN doc_id % 3 = 0 THEN ' cc admin@ex.net' ELSE '' END"""
        .stripMargin.replace("\n", "")
    scrubPiiSql(s"($planted)")
  }
}
