package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning primitive a managed
  * data lake runs between ingest revisions: given two snapshots of the
  * same logical corpus, classify every doc id as `added` (new snapshot
  * only), `removed` (old only), `changed` (both, content hash differs),
  * or `unchanged`, and report per-(status, lang) counts. Training-data
  * governance needs exactly this relation (what moved between the
  * corpus my last model saw and today's?), and incremental pipelines
  * key re-work off it (re-dedup/re-score only `added`+`changed`).
  *
  * The fixture has one documents table, so the two snapshots are
  * deterministic VIEWS of it, derived — identically in the SQL twin —
  * from the [[Sampling.bucket]] id hash:
  *   - OLD  = buckets  < 9500             (the top 5% "arrives later");
  *   - NEW  = buckets >= 500              (the bottom 5% "was deleted");
  *   - docs in the overlap with bucket % 20 == 7 carry a deterministic
  *     revision edit (text ++ " (rev2)") in NEW — the `changed` class.
  * In production the two sides are two real parquet snapshots and the
  * bucket scaffolding disappears; the diff core is unchanged.
  *
  * Change detection compares md5(text) — never the text itself — so at
  * 100 TB the full-outer join shuffles (id, 32-byte hash, lang), not
  * payloads; the join key is the doc id (co-partitioned snapshots make
  * it shuffle-free); the output agg is ≤ |status|·|langs| rows.
  */
object SnapshotDiff {

  val RemovedBp = 500  // NEW drops buckets [0, 500)
  val AddedBp = 9500   // OLD lacks buckets [9500, 10000)
  val EditMod = 20     // overlap docs with bucket % 20 == EditRem change
  val EditRem = 7
  val EditSuffix = " (rev2)"

  private def bucketed(docs: DataFrame, seed: Int): DataFrame =
    docs.select(col("doc_id"), col("text"), col("lang"),
      Sampling.bucket(col("doc_id"), seed).as("b"))

  /** The two derived snapshots (exposed for the spec). */
  def oldSnapshot(docs: DataFrame, seed: Int = 42): DataFrame =
    bucketed(docs, seed).filter(col("b") < AddedBp)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))

  def newSnapshot(docs: DataFrame, seed: Int = 42): DataFrame =
    bucketed(docs, seed).filter(col("b") >= RemovedBp)
      .select(col("doc_id"), col("lang"),
        md5(when(col("b") % EditMod === EditRem,
            concat(col("text"), lit(EditSuffix)))
          .otherwise(col("text"))).as("h"))

  /** (status, lang, n_docs) — the per-class census of the diff. */
  def diff(docs: DataFrame, seed: Int = 42): DataFrame = {
    val o = oldSnapshot(docs, seed)
      .select(col("doc_id"), col("lang").as("lang_o"), col("h").as("h_o"))
    val n = newSnapshot(docs, seed)
      .select(col("doc_id"), col("lang").as("lang_n"), col("h").as("h_n"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(
        when(col("h_o").isNull, lit("added"))
          .when(col("h_n").isNull, lit("removed"))
          .when(col("h_o") =!= col("h_n"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        coalesce(col("lang_n"), col("lang_o")).as("lang"))
      .groupBy("status", "lang")
      .agg(count(lit(1)).as("n_docs"))
  }

  def diffSql(seed: Int = 42): String = {
    val b = Sampling.bucketSql("doc_id", seed)
    s"""WITH bk AS MATERIALIZED (
       |  SELECT doc_id, text, lang, $b AS b FROM documents),
       |o AS MATERIALIZED (
       |  SELECT doc_id, lang AS lang_o, md5(text) AS h_o
       |  FROM bk WHERE b < $AddedBp),
       |n AS MATERIALIZED (
       |  SELECT doc_id, lang AS lang_n,
       |    md5(CASE WHEN b % $EditMod = $EditRem
       |      THEN text || '$EditSuffix' ELSE text END) AS h_n
       |  FROM bk WHERE b >= $RemovedBp)
       |SELECT CASE WHEN h_o IS NULL THEN 'added'
       |            WHEN h_n IS NULL THEN 'removed'
       |            WHEN h_o <> h_n THEN 'changed'
       |            ELSE 'unchanged' END AS status,
       |  COALESCE(lang_n, lang_o) AS lang,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM o FULL OUTER JOIN n USING (doc_id)
       |GROUP BY 1, 2""".stripMargin
  }
}
