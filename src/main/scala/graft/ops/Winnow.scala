package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: local algorithms for document fingerprinting",
  * SIGMOD 2003; the MOSS algorithm). Each doc's char k-gram hash
  * stream is reduced to the per-window minima: in every window of w
  * consecutive gram hashes keep the minimum, ties to the RIGHTMOST
  * occurrence. The guarantee: any shared substring of length ≥
  * k + w − 1 yields at least one shared fingerprint (local selection
  * means the same gram neighborhood selects the same minimum in both
  * docs), while expected density is only 2/(w+1) of the gram stream.
  *
  * Both engines compute the identical selection:
  *  - gram hash h = md5-60 of the lower-cased k-gram, folded to 30
  *    bits (the Dedup base-hash convention);
  *  - the (h asc, pos desc) argmin is packed order-isomorphically into
  *    ONE BIGINT `h·2²¹ + (2²⁰ − pos)` (docs are ≤ 2²⁰ chars — the
  *    fixture maxes at ~600; a 100 TB corpus chunks long docs first,
  *    `PretrainOps.docChunks`), so the rolling min is a plain integer
  *    `MIN OVER (PARTITION BY doc ORDER BY pos ROWS w−1 PRECEDING)` —
  *    no struct-typed window aggregate (which DuckDB lacks and Spark
  *    de-codegens);
  *  - full windows only (gram position ≥ w), then DISTINCT packed
  *    values per doc.
  *
  * Scale shape: the gram stream never shuffles — hashing and packing
  * are scan projections; the window partitions by doc_id (bounded by
  * doc length); the pair join runs on the winnowed relation (~2/(w+1)
  * of the grams) with a DF cap on ubiquitous fingerprints (the
  * self-disarming `dedup_ngram_jaccard` convention) so no hot
  * fingerprint can go quadratic.
  */
object Winnow {

  val K = 8 // k-gram width (chars)
  val W = 4 // winnowing window (grams)
  private val PosSpan = 2097152L // 2^21
  private val PosBase = 1048576L // 2^20

  /** (doc_id, pos, fp): the selected fingerprints, pos = gram start
    * (1-based), fp = the 30-bit gram hash.
    *
    * Docs of ≥ 2²⁰ chars are EXCLUDED (identically in
    * [[fingerprintsSql]]): past PosBase the packed key's position term
    * goes negative, silently corrupting both the rightmost-tie
    * ordering and the unpacked pos/fp (r13 advice). The exclusion is
    * the same hard-cap convention as `Dedup.editDistancePairs`'s
    * MaxBlockNames — at 100 TB long docs are chunked first
    * (`PretrainOps.docChunks`), so the filter is a no-op on shaped
    * corpora and a loud, observable census gap on unshaped ones. */
  def fingerprints(docs: DataFrame, k: Int = K, w: Int = W): DataFrame = {
    val txt = lower(col("text"))
    val grams = docs
      .where(length(col("text")) >= lit(k + w - 1) &&
        length(col("text")) < lit(PosBase))
      // Pre-partition the DOCS by doc_id before exploding (r17, guide
      // §2.3/§2.4): every downstream clustering requirement — the
      // rolling-min window, the (doc_id, sel) distinct, census's
      // per-doc count — is on doc_id, and hash(doc_id) satisfies all
      // of them. Established here, the one exchange moves n document
      // rows; established at the window (the previous shape), it moved
      // the ~|text|-per-doc exploded gram stream (doc_id, pos, h) —
      // hundreds of rows per doc. Result-identical: partitioning does
      // not enter the window/distinct semantics. The partition count
      // is EXPLICIT (shuffle-partitions), because a keyless-count
      // repartition is AQE-coalesced by input bytes — n docs look tiny
      // and the whole gram-explode+md5 pass landed on ~1 core (§2.5's
      // "tiny input, heavy compute" trap; measured 5.8 → 14.1 s before
      // the explicit count).
      .repartition(
        docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_id"))
      .select(col("doc_id"), txt.as("txt"),
        explode(sequence(lit(1), length(txt) - lit(k - 1))).as("pos"))
      .select(col("doc_id"), col("pos"),
        Dedup.md5Base30(col("txt").substr(col("pos"), lit(k))).as("h"))
    val packed = (col("h") * lit(PosSpan) + (lit(PosBase) - col("pos"))).as("pk")
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    grams
      .select(col("doc_id"), col("pos"), min(packed).over(win).as("sel"))
      .where(col("pos") >= lit(w)) // full windows only
      .select(col("doc_id"), col("sel")).distinct()
      .select(col("doc_id"),
        (lit(PosBase) - pmod(col("sel"), lit(PosSpan))).cast("long").as("pos"),
        ((col("sel") - pmod(col("sel"), lit(PosSpan))) / lit(PosSpan))
          .cast("long").as("fp"))
  }

  private def fingerprintsSql(k: Int, w: Int): String =
    s"""grams AS MATERIALIZED (
       |  SELECT d.doc_id, gs.pos,
       |    ${Dedup.md5Base30Sql(s"substr(d.txt, CAST(gs.pos AS INT), $k)")} AS h
       |  FROM (SELECT doc_id, lower(text) AS txt FROM documents
       |        WHERE length(text) >= ${k + w - 1}
       |          AND length(text) < $PosBase) d,
       |  LATERAL (SELECT unnest(generate_series(1, length(d.txt) - ${k - 1})) AS pos) gs),
       |sel AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, sel FROM (
       |    SELECT doc_id, pos,
       |      MIN(h * $PosSpan + ($PosBase - pos)) OVER (
       |        PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS sel
       |    FROM grams) q WHERE pos >= $w),
       |fps AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST($PosBase - (sel % $PosSpan) AS BIGINT) AS pos,
       |    CAST((sel - (sel % $PosSpan)) / $PosSpan AS BIGINT) AS fp
       |  FROM sel)""".stripMargin

  /** Per-doc fingerprint census: gram count vs selected count — the
    * 2/(w+1) density law made observable (`text_winnow`). */
  def census(docs: DataFrame, k: Int = K, w: Int = W): DataFrame = {
    val txt = col("text")
    val nGrams = (length(txt) - lit(k - 1)).cast("long")
    val fp = fingerprints(docs, k, w)
      .groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    docs.where(length(txt) >= lit(k + w - 1) && length(txt) < lit(PosBase))
      .select(col("doc_id"), nGrams.as("n_grams"))
      .join(fp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"))
  }

  def censusSql(k: Int = K, w: Int = W): String =
    s"""WITH ${fingerprintsSql(k, w)}
       |SELECT d.doc_id,
       |  CAST(length(d.text) - ${k - 1} AS BIGINT) AS n_grams,
       |  CAST(COALESCE(f.n_fp, 0) AS BIGINT) AS n_fp
       |FROM documents d
       |LEFT JOIN (SELECT doc_id, COUNT(*) AS n_fp FROM fps GROUP BY doc_id) f
       |  ON d.doc_id = f.doc_id
       |WHERE length(d.text) >= ${k + w - 1}
       |  AND length(d.text) < $PosBase""".stripMargin

  /** The exclusion census for [[fingerprints]]'s hard size gates —
    * the docs the fingerprint relation OMITS (r14 verdict: the
    * exclusion was identical in both engines but silent): shorter than
    * one full window (k + w − 1 chars, nothing to winnow) or ≥ 2²⁰
    * chars (the packed-key position bound). On a shaped corpus the
    * long side is empty (`PretrainOps.docChunks` first); any row here
    * names a doc the winnow-based dedup cannot see.
    * `dedup_winnow_excluded`. */
  def excluded(docs: DataFrame, k: Int = K, w: Int = W): DataFrame =
    docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"))
      .where(col("n_chars") < lit((k + w - 1).toLong) ||
        col("n_chars") >= lit(PosBase))
      .select(col("doc_id"), col("n_chars"),
        when(col("n_chars") < lit((k + w - 1).toLong), lit("too_short"))
          .otherwise(lit("too_long")).as("reason"))

  def excludedSql(k: Int = K, w: Int = W): String =
    s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       |  CASE WHEN length(text) < ${k + w - 1} THEN 'too_short'
       |       ELSE 'too_long' END AS reason
       |FROM documents
       |WHERE length(text) < ${k + w - 1} OR length(text) >= $PosBase""".stripMargin

  /** Near-dup candidate pairs: docs sharing ≥ `minShared` distinct
    * fingerprint HASHES (position-independent — winnowing's detection
    * contract is content overlap wherever it moved). Fingerprints in
    * more than `dfCap` docs are dropped before the pair join (the
    * self-disarming hot-key cap: boilerplate grams winnow into
    * ubiquitous fingerprints, and an uncapped join on one of those is
    * the n² bomb — measured on the fixture, dfCap=64/minShared=2
    * returned 91k of the 125k possible pairs, i.e. noise). The
    * defaults (16, 8) keep only discriminative fingerprints: grams in
    * >3% of the 500-doc fixture are corpus idiom, not duplication. At
    * corpus scale the cap is a FRACTION of n (pass dfCap ≈ 3%·n);
    * `dedup_winnow`. */
  def pairs(docs: DataFrame, k: Int = K, w: Int = W,
            minShared: Int = 8, dfCap: Int = 16): DataFrame = {
    val fph = fingerprints(docs, k, w).select("doc_id", "fp").distinct()
    val kept = fph.groupBy("fp").agg(count(lit(1)).as("df"))
      .where(col("df") <= lit(dfCap.toLong)).select("fp")
    val f = fph.join(kept, Seq("fp"), "left_semi")
    f.as("a").join(f.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= lit(minShared.toLong))
  }

  def pairsSql(k: Int = K, w: Int = W,
               minShared: Int = 8, dfCap: Int = 16): String =
    s"""WITH ${fingerprintsSql(k, w)},
       |fph AS MATERIALIZED (SELECT DISTINCT doc_id, fp FROM fps),
       |kept AS (SELECT fp FROM (
       |  SELECT fp, COUNT(*) AS df FROM fph GROUP BY fp) q
       |  WHERE df <= $dfCap),
       |f AS MATERIALIZED (
       |  SELECT doc_id, fp FROM fph WHERE fp IN (SELECT fp FROM kept))
       |SELECT a.doc_id AS da, b.doc_id AS db,
       |  CAST(COUNT(*) AS BIGINT) AS shared
       |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING COUNT(*) >= $minShared""".stripMargin
}
