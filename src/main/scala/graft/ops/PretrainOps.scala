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
  def chunkDocs(
      docs: DataFrame, size: Int = 64, overlap: Int = 16,
      keep: Seq[String] = Nil, textCol: Column = col("text")): DataFrame = {
    require(overlap >= 0 && overlap < size, s"need 0 <= overlap < size, got $overlap/$size")
    val stride = size - overlap
    val kept = keep.map(col)
    docs
      .select(col("doc_id") +: kept :+ normTokens(textCol).as("toks"): _*)
      .select(col("doc_id") +: kept :+ col("toks") :+
        posexplode(sequence(lit(0),
          org.apache.spark.sql.functions.size(col("toks")) - 1, lit(stride)))
          .as(Seq("chunk_id", "start")): _*)
      .select(col("doc_id") +: kept :+
        col("chunk_id") :+
        org.apache.spark.sql.functions.size(
          slice(col("toks"), col("start") + 1, lit(size))).as("n_chunk_tokens") :+
        array_join(slice(col("toks"), col("start") + 1, lit(size)), " ")
          .as("chunk_text"): _*)
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
  /** Generic packer: appends (bin_id, offset_in_bin) to `rows` from the
    * running total of `tokenCol` over `orderCols` within each
    * `shardCol` partition. */
  def packBy(
      rows: DataFrame, tokenCol: String, shardCol: String,
      orderCols: Seq[String], capacity: Int): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    rows
      .withColumn("cum_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("cum_before") / lit(capacity)).cast("long"))
      .withColumn("offset_in_bin", col("cum_before") % lit(capacity))
      .drop("cum_before")
  }

  def packSequences(docs: DataFrame, capacity: Int = 512): DataFrame =
    packBy(
      docs.select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.size(normTokens(col("text")))
          .cast("long").as("n_tokens")),
      "n_tokens", "source", Seq("doc_id"), capacity)

  def packSequencesSql(capacity: Int = 512): String =
    s"""SELECT doc_id, source, n_tokens,
       |  CAST(FLOOR(cum_before / $capacity) AS BIGINT) AS bin_id,
       |  CAST(cum_before % $capacity AS BIGINT) AS offset_in_bin
       |FROM (
       |  SELECT doc_id, source, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM (SELECT doc_id, source,
       |          CAST(len($normTokensSql) AS BIGINT) AS n_tokens
       |        FROM documents) t) w""".stripMargin

  // -------------------------------------------------------------------
  // Packing efficiency report: per shard, how many bins the greedy
  // concat-and-fill layout produced, the token utilization (1 minus
  // the last bin's tail waste), and the BOUNDARY-STRADDLE rate — the
  // fraction of documents split across two bins, i.e. the sequences
  // whose attention either crosses a document boundary or pays a mask
  // reset. The loader-quality dials a pretraining run tunes capacity
  // against. One source-keyed agg over the (already windowed) pack
  // layout; n_bins folds from the token total (the layout is dense by
  // construction), never from a distinct-count over bins.
  // -------------------------------------------------------------------
  def packStats(docs: DataFrame, capacity: Int = 512): DataFrame =
    packSequences(docs, capacity)
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum(when(col("offset_in_bin") + col("n_tokens") > capacity, 1L)
          .otherwise(0L)).as("n_straddle"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr(s"(n_tokens + ${capacity - 1}) div $capacity").as("n_bins"),
        (col("n_tokens").cast("double") /
          (expr(s"(n_tokens + ${capacity - 1}) div $capacity")
            .cast("double") * lit(capacity.toDouble))).as("utilization"),
        col("n_straddle"),
        (col("n_straddle").cast("double") / col("n_docs").cast("double"))
          .as("straddle_frac"))

  def packStatsSql(capacity: Int = 512): String = {
    val capD = graft.functions.PortableMath.dlitE(capacity.toDouble)
    s"""WITH packed AS (${packSequencesSql(capacity)}),
       |agg AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |    CAST(SUM(CASE WHEN offset_in_bin + n_tokens > $capacity
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
       |  FROM packed GROUP BY source)
       |SELECT source, n_docs, n_tokens,
       |  (n_tokens + ${capacity - 1}) // $capacity AS n_bins,
       |  CAST(n_tokens AS DOUBLE)
       |    / (CAST((n_tokens + ${capacity - 1}) // $capacity AS DOUBLE)
       |       * $capD) AS utilization,
       |  n_straddle,
       |  CAST(n_straddle AS DOUBLE) / CAST(n_docs AS DOUBLE) AS straddle_frac
       |FROM agg""".stripMargin
  }

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

  /** The redaction chain as a column expression (email → URL → phone). */
  def scrubText(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"),
      PhoneRe, "<PHONE>")

  def scrubTextSql(textExpr: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($textExpr,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$UrlRe', '<URL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g')""".stripMargin

  /** Redacted text + per-kind match counts for every input row. */
  def scrubPii(docs: DataFrame, textCol: Column = col("text")): DataFrame =
    docs.select(
      col("doc_id"),
      scrubText(textCol).as("clean_text"),
      org.apache.spark.sql.functions.size(
        regexp_extract_all(textCol, lit(EmailRe), lit(0))).as("n_emails"),
      org.apache.spark.sql.functions.size(
        regexp_extract_all(textCol, lit(UrlRe), lit(0))).as("n_urls"),
      org.apache.spark.sql.functions.size(
        regexp_extract_all(textCol, lit(PhoneRe), lit(0))).as("n_phones"))

  def scrubPiiSql(textExpr: String = "text"): String =
    s"""SELECT doc_id,
       |  ${scrubTextSql(textExpr)} AS clean_text,
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

  // -------------------------------------------------------------------
  // The full shaping composition: documents in, packed training
  // sequences out — scrub → chunk (overlap 0: training sequences must
  // not repeat tokens) → pack the chunks. Scrub and chunk fuse into one
  // zero-shuffle scan stage; packing adds the single per-shard window
  // shuffle, so the whole pipeline is scan + one exchange.
  // -------------------------------------------------------------------
  def makeSequences(
      docs: DataFrame, size: Int = 64, capacity: Int = 256): DataFrame = {
    val cleaned = docs.select(
      col("doc_id"), col("source"), scrubText(col("text")).as("text"))
    val chunks = chunkDocs(cleaned, size, overlap = 0, keep = Seq("source"))
    packBy(chunks, "n_chunk_tokens", "source", Seq("doc_id", "chunk_id"), capacity)
  }

  def makeSequencesSql(
      size: Int = 64, capacity: Int = 256,
      docsRel: String = "documents"): String =
    s"""WITH cleaned AS (
       |  SELECT doc_id, source, ${scrubTextSql("text")} AS text FROM $docsRel),
       |toks AS (
       |  SELECT doc_id, source, $normTokensSql AS toks FROM cleaned),
       |chunks AS (
       |  SELECT doc_id, source,
       |    CAST(s / $size AS INTEGER) AS chunk_id,
       |    CAST(len(list_slice(toks, s + 1, s + $size)) AS INTEGER) AS n_chunk_tokens,
       |    array_to_string(list_slice(toks, s + 1, s + $size), ' ') AS chunk_text
       |  FROM (SELECT doc_id, source, toks,
       |          unnest(generate_series(0, len(toks) - 1, $size)) AS s
       |        FROM toks) w)
       |SELECT doc_id, source, chunk_id, n_chunk_tokens, chunk_text,
       |  CAST(FLOOR(cum_before / $capacity) AS BIGINT) AS bin_id,
       |  CAST(cum_before % $capacity AS BIGINT) AS offset_in_bin
       |FROM (
       |  SELECT *, COALESCE(SUM(n_chunk_tokens) OVER (
       |    PARTITION BY source ORDER BY doc_id, chunk_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM chunks) p""".stripMargin

  // -------------------------------------------------------------------
  // k-anonymity census (Sweeney 2002) over the quasi-identifier tuple
  // a released corpus actually leaks — (lang, source, length bucket):
  // every equivalence class with its size and an at_risk flag for
  // classes smaller than k, i.e. the rows a linkage attacker can
  // narrow below k candidates. The census (not a silent drop) is the
  // auditable artifact privacy review wants NEXT TO pii_scrub: scrub
  // removes direct identifiers, this measures the residual
  // quasi-identifier risk. One partial/final agg on a low-cardinality
  // composite key — class count is |langs|·|sources|·|buckets|,
  // independent of corpus size.
  // -------------------------------------------------------------------
  def kAnonymityCensus(
      docs: DataFrame, k: Long = 5L, bucket: Long = 100L): DataFrame =
    docs.select(col("lang"), col("source"),
        (col("n_chars") - (col("n_chars") % bucket)).as("chars_bucket"))
      .groupBy("lang", "source", "chars_bucket")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("at_risk", col("n_docs") < k)

  def kAnonymityCensusSql(k: Long = 5L, bucket: Long = 100L): String =
    s"""SELECT lang, source, n_chars - (n_chars % $bucket) AS chars_bucket,
       |  COUNT(*) AS n_docs, COUNT(*) < $k AS at_risk
       |FROM documents
       |GROUP BY 1, 2, 3""".stripMargin
}
