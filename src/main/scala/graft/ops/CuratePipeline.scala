package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Composed training-data curation pipeline — the end-to-end shape a
  * 100 TB corpus job actually runs, built entirely from the §2.2
  * operators: quality gate → exact dedup (fingerprint) → language tag.
  * Every stage is individually oracle-verified; this query verifies the
  * COMPOSITION against one DuckDB twin.
  *
  * 100 TB posture: quality + fingerprint are zero-shuffle projections
  * over one shared scan; the dedup group-by shuffles 8-byte keys; the
  * language join shuffles only the (tiny) marker-hit aggregates. Three
  * shuffles total for the whole pipeline.
  */
object CuratePipeline {

  def curate(
      docs: DataFrame,
      minTokens: Long = 20,
      maxStopwordRatio: Double = 0.5): DataFrame = {
    val q = TextOps.qualityScore(docs)
      .filter(col("n_tokens") >= minTokens &&
        col("stopword_ratio") <= maxStopwordRatio)
    val fp = TextOps.fingerprints(docs)
    val keepers = fp.join(q.select("doc_id"), "doc_id")
      .groupBy("fp").agg(min("doc_id").as("doc_id"))
    val lang = TextOps.langId(docs)
    keepers
      .join(q.select(col("doc_id"), col("n_tokens"), col("type_token_ratio")), "doc_id")
      .join(lang.select(col("doc_id"), col("pred_lang")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("fp"),
        col("n_tokens"), col("type_token_ratio"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"))
  }

  def curateSql(minTokens: Long = 20, maxStopwordRatio: Double = 0.5): String =
    s"""WITH q AS (${TextOps.qualityScoreSql}),
       |fp AS (${TextOps.fingerprintsSql}),
       |lid AS (${TextOps.langIdSql}),
       |keep AS (SELECT doc_id, n_tokens, type_token_ratio FROM q
       |  WHERE n_tokens >= $minTokens AND stopword_ratio <= $maxStopwordRatio),
       |keepers AS (
       |  SELECT f.fp, MIN(f.doc_id) AS doc_id
       |  FROM fp f JOIN keep k ON f.doc_id = k.doc_id GROUP BY f.fp)
       |SELECT c.doc_id, c.fp, k.n_tokens, k.type_token_ratio,
       |       COALESCE(l.pred_lang, 'und') AS pred_lang
       |FROM keepers c
       |JOIN keep k ON c.doc_id = k.doc_id
       |LEFT JOIN lid l ON c.doc_id = l.doc_id""".stripMargin

  /** The COMPLETE pre-training data-prep composition — what a 100 TB
    * corpus job actually runs end to end: quality gate + exact dedup +
    * language tag ([[curate]]) → transitive near-dup removal
    * ([[Dedup.nearDupGroups]]) → deterministic train/valid/test
    * assignment ([[Sampling.splitAssign]]). Every stage is individually
    * oracle-verified; this query verifies the composition.
    *
    * 100 TB posture = the sum of its parts (each documented at its
    * definition): projections share one scan, dedup shuffles keys not
    * documents, the loser set is broadcast for the anti-join, the split
    * is a zero-shuffle hash bucket. */
  def pretrain(
      docs: DataFrame,
      minTokens: Long = 20,
      maxStopwordRatio: Double = 0.5,
      nearDupThreshold: Double = 0.8): DataFrame = {
    val curated = curate(docs, minTokens, maxStopwordRatio)
    val losers = Dedup.nearDupGroups(docs, threshold = nearDupThreshold)
      .filter(col("doc_id") =!= col("group_id")).select("doc_id")
    val split = Sampling.splitAssign(docs).select("doc_id", "split")
    curated.join(losers, Seq("doc_id"), "left_anti")
      .join(split, "doc_id")
      .select("doc_id", "pred_lang", "n_tokens", "split")
  }

  def pretrainSql(
      minTokens: Long = 20, maxStopwordRatio: Double = 0.5,
      nearDupThreshold: Double = 0.8): String =
    s"""WITH curated AS (SELECT * FROM (${curateSql(minTokens, maxStopwordRatio)}) cu),
       |losers AS (SELECT doc_id
       |  FROM (${Dedup.nearDupGroupsSql(threshold = nearDupThreshold)}) g
       |  WHERE doc_id <> group_id),
       |split AS (${Sampling.splitAssignSql()})
       |SELECT c.doc_id, c.pred_lang, c.n_tokens, s.split
       |FROM curated c JOIN split s ON c.doc_id = s.doc_id
       |WHERE c.doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin

  /** The WHOLE data-prep path in one declarative plan — what "switch
    * your pipeline to this library" means end to end: curate (quality
    * gate + exact dedup + language tag) → transitive near-dup removal →
    * deterministic split assignment → take the train split → PII-scrub
    * → chunk to context windows → pack into fixed-capacity bins.
    * Documents in, packed training sequences out, every stage the same
    * operator that is individually oracle-verified.
    *
    * 100 TB posture: the shaping tail adds one doc_id-keyed join (the
    * keeper set arrives already hash-partitioned on doc_id from the
    * split projection) and the single per-shard packing window on top
    * of [[pretrain]]'s documented shuffles. */
  def pretrainSequences(
      docs: DataFrame, size: Int = 64, capacity: Int = 256): DataFrame = {
    val kept = pretrain(docs)
      .filter(col("split") === "train").select("doc_id")
    PretrainOps.makeSequences(docs.join(kept, "doc_id"), size, capacity)
  }

  def pretrainSequencesSql(size: Int = 64, capacity: Int = 256): String =
    s"""WITH pre AS (SELECT * FROM (${pretrainSql()}) q),
       |kept_docs AS (
       |  SELECT d.* FROM documents d
       |  JOIN pre p ON d.doc_id = p.doc_id WHERE p.split = 'train')
       |SELECT * FROM (
       |  ${PretrainOps.makeSequencesSql(size, capacity, docsRel = "kept_docs")}) seqs""".stripMargin

  /** Train/eval decontamination: every non-train document that shares
    * at least one word n-gram with the train split, with its overlap
    * count — the contamination check run before any eval set is
    * trusted (the published recipes use 13-grams; n is a parameter and
    * the testdata's short docs use 3). Built from the verified pieces:
    * [[Sampling.splitAssign]] buckets + [[Dedup.shingles]] n-grams.
    *
    * 100 TB posture: the split is a zero-shuffle projection; shingles
    * explode then immediately `distinct` per doc; the contamination
    * join is keyed on the shingle (two hash shuffles of fixed-width
    * keys + the per-doc count) — never a doc×doc comparison. */
  def decontaminate(docs: DataFrame, n: Int = 3): DataFrame = {
    val split = Sampling.splitAssign(docs).select("doc_id", "split")
    val sh = Dedup.shingles(docs, n)
    val trainShingles = sh
      .join(split.filter(col("split") === "train"), "doc_id")
      .select("shingle").distinct()
    sh.join(split.filter(col("split") =!= "train"), "doc_id")
      .join(trainShingles, "shingle")
      .groupBy("doc_id", "split")
      .agg(count(lit(1)).as("n_shared_ngrams"))
  }

  def decontaminateSql(n: Int = 3): String =
    s"""WITH split AS (SELECT doc_id, split FROM (${Sampling.splitAssignSql()}) s),
       |sh AS (${Dedup.shinglesSql(n)}),
       |train_sh AS (
       |  SELECT DISTINCT sh.shingle FROM sh
       |  JOIN split ON sh.doc_id = split.doc_id AND split.split = 'train')
       |SELECT sh.doc_id, split.split, COUNT(*) AS n_shared_ngrams
       |FROM sh
       |JOIN split ON sh.doc_id = split.doc_id AND split.split <> 'train'
       |JOIN train_sh ON sh.shingle = train_sh.shingle
       |GROUP BY sh.doc_id, split.split""".stripMargin

  /** Per-split contamination summary — the eval-integrity number a
    * release review asks for: of each held-out split, how many docs
    * share ANY word n-gram with train ([[decontaminate]]'s flag set),
    * how many share ≥ `heavy` of them (the "effectively leaked" tier
    * that must be dropped, not just noted), and both as fractions of
    * the split. Two split-keyed 1-row-per-split aggs joined on the
    * (≤3-row) split key. */
  def decontamSummary(
      docs: DataFrame, n: Int = 3, heavy: Long = 10): DataFrame = {
    val split = Sampling.splitAssign(docs).select("doc_id", "split")
      .filter(col("split") =!= "train")
    val contam = decontaminate(docs, n)
    val base = split.groupBy("split").agg(count(lit(1)).as("n_docs"))
    val c = contam.groupBy("split").agg(
      count(lit(1)).as("n_contaminated"),
      sum(when(col("n_shared_ngrams") >= heavy, 1L).otherwise(0L))
        .as("n_heavy"))
    base.join(c, Seq("split"), "left")
      .select(col("split"), col("n_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        coalesce(col("n_heavy"), lit(0L)).as("n_heavy"),
        (coalesce(col("n_contaminated"), lit(0L)).cast("double")
          / col("n_docs").cast("double")).as("contam_frac"),
        (coalesce(col("n_heavy"), lit(0L)).cast("double")
          / col("n_docs").cast("double")).as("heavy_frac"))
  }

  def decontamSummarySql(n: Int = 3, heavy: Long = 10): String =
    s"""WITH contam AS (${decontaminateSql(n)}),
       |split AS (SELECT doc_id, split
       |  FROM (${Sampling.splitAssignSql()}) s WHERE split <> 'train'),
       |base AS (SELECT split, COUNT(*) AS n_docs FROM split GROUP BY split),
       |c AS (SELECT split, COUNT(*) AS n_contaminated,
       |    CAST(SUM(CASE WHEN n_shared_ngrams >= $heavy THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_heavy
       |  FROM contam GROUP BY split)
       |SELECT b.split, b.n_docs,
       |  COALESCE(c.n_contaminated, 0) AS n_contaminated,
       |  COALESCE(c.n_heavy, 0) AS n_heavy,
       |  CAST(COALESCE(c.n_contaminated, 0) AS DOUBLE)
       |    / CAST(b.n_docs AS DOUBLE) AS contam_frac,
       |  CAST(COALESCE(c.n_heavy, 0) AS DOUBLE)
       |    / CAST(b.n_docs AS DOUBLE) AS heavy_frac
       |FROM base b LEFT JOIN c ON b.split = c.split""".stripMargin

  /** Curation yield funnel: how many documents (and how many TOKENS —
    * the unit the training run actually buys) survive each gate of the
    * [[pretrain]] composition: input → quality gate → exact dedup →
    * near-dup removal. This is the report a corpus owner reads before
    * committing a 100 TB run: a stage whose yield collapses (or
    * doesn't move) is misconfigured, and token-yield ≠ doc-yield when
    * a gate preferentially drops long docs. Four 1-row aggregates over
    * the (already scale-shaped) stage pipelines — the funnel adds no
    * data-sized shuffle of its own. */
  def funnel(
      docs: DataFrame,
      minTokens: Long = 20,
      maxStopwordRatio: Double = 0.5,
      nearDupThreshold: Double = 0.8): DataFrame = {
    // All three stage checkpoints are LAZY or gone (r17, guide §1.2
    // step 1: remove passes): q materializes once inside the final
    // four-branch job (all four aggregates share its blocks there)
    // instead of in a standalone serial pass; keepQ is a pure filter
    // over q's materialized rows (its former eager checkpoint
    // re-copied them in another standalone job); exactKeep
    // materializes in the final job too, shared by stages 2 and 3.
    val q = TextOps.qualityScore(docs)
      .select(col("doc_id"), col("n_tokens"), col("stopword_ratio"))
      .localCheckpoint(false)
    val keepQ = q.filter(col("n_tokens") >= minTokens &&
      col("stopword_ratio") <= maxStopwordRatio)
    val exactKeep = TextOps.fingerprints(docs)
      .join(keepQ.select("doc_id"), "doc_id")
      .groupBy("fp").agg(min("doc_id").as("doc_id"))
      .join(keepQ.select("doc_id", "n_tokens"), "doc_id")
      .localCheckpoint(false)
    val losers = Dedup.nearDupGroups(docs, threshold = nearDupThreshold)
      .filter(col("doc_id") =!= col("group_id")).select("doc_id")
    val nearKeep = exactKeep.join(losers, Seq("doc_id"), "left_anti")
    def stage(ord: Int, name: String, rel: DataFrame) =
      rel.agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
        .select(lit(ord.toLong).as("stage_ord"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    stage(0, "input", q)
      .unionAll(stage(1, "quality_gate", keepQ))
      .unionAll(stage(2, "exact_dedup", exactKeep))
      .unionAll(stage(3, "near_dedup", nearKeep))
  }

  def funnelSql(
      minTokens: Long = 20, maxStopwordRatio: Double = 0.5,
      nearDupThreshold: Double = 0.8): String =
    s"""WITH q AS (${TextOps.qualityScoreSql}),
       |fp AS (${TextOps.fingerprintsSql}),
       |keepq AS (SELECT doc_id, n_tokens FROM q
       |  WHERE n_tokens >= $minTokens
       |    AND stopword_ratio <= $maxStopwordRatio),
       |keepers AS (
       |  SELECT MIN(f.doc_id) AS doc_id
       |  FROM fp f JOIN keepq k ON f.doc_id = k.doc_id GROUP BY f.fp),
       |exact_keep AS (
       |  SELECT k.doc_id, k.n_tokens
       |  FROM keepers c JOIN keepq k ON c.doc_id = k.doc_id),
       |losers AS (SELECT doc_id
       |  FROM (${OracleCtes.materialize(
              Dedup.nearDupGroupsSql(threshold = nearDupThreshold))}) g
       |  WHERE doc_id <> group_id),
       |near_keep AS (
       |  SELECT doc_id, n_tokens FROM exact_keep
       |  WHERE doc_id NOT IN (SELECT doc_id FROM losers))
       |SELECT CAST(0 AS BIGINT) AS stage_ord, 'input' AS stage,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
       |FROM q
       |UNION ALL SELECT CAST(1 AS BIGINT), 'quality_gate',
       |  COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM keepq
       |UNION ALL SELECT CAST(2 AS BIGINT), 'exact_dedup',
       |  COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM exact_keep
       |UNION ALL SELECT CAST(3 AS BIGINT), 'near_dedup',
       |  COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM near_keep"""
      .stripMargin

  /** Top-n tokens per corpus language: one token-count aggregate, then
    * a per-lang top-k through the custom TopKPerKey operator (partial
    * heaps → key exchange of ≤ k·partitions rows per lang → final merge
    * emitting the rank) — no Window, no per-group sort over the
    * |vocab|-sized count relation. */
  def topTokensPerLang(docs: DataFrame, topN: Int = 5): DataFrame = {
    val counts = TextOps.explodedTokens(docs, "token", col("lang"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
    org.apache.spark.sql.graft.TopKPerKey(
      counts, Seq("lang"), Seq(("cnt", false), ("token", true)), topN,
      rankCol = Some("rank"))
  }

  /** Percentile-threshold quality filter — the production filter shape:
    * instead of a hand-tuned cutoff, LEARN the threshold from the
    * corpus's own score distribution (here: drop the bottom decile of
    * unigram-LM scores) and filter in the same plan. The threshold
    * comes from the fixed-bin histogram quantile (deterministic,
    * merge-order-independent — see EventOps.binnedQuantiles), so the
    * whole learn-then-filter composition is oracle-exact. Cost at
    * scale: the lmScore aggregates + a ≤bins-row histogram + a 1-row
    * threshold broadcast back onto the score stream — the corpus is
    * scanned, never reshuffled. Learn-then-filter is inherently two
    * passes over the SCORE relation (the threshold must see the full
    * distribution before any row can be kept), so the score relation
    * (doc_id + one double — tiny next to the corpus) is materialized
    * ONCE here via an eager localCheckpoint: the learn pass (histogram
    * → threshold) and the filter pass both read the checkpointed rows
    * instead of re-running lmScore's token-keyed shuffles twice. */
  def qualityFilter(docs: DataFrame, keepFrac: Double = 0.9): DataFrame = {
    val lo = -16.0; val bins = 1600L; val width = 0.01
    val dropFrac = 1.0 - keepFrac
    val scores = TextOps.lmScore(docs).select("doc_id", "avg_logp")
      .localCheckpoint(true)
    val bin = least(greatest(
      floor((col("avg_logp") - lit(lo)) / lit(width)), lit(0L)), lit(bins - 1))
    val hist = scores.groupBy(bin.as("bin")).agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum("c").over(Window.orderBy("bin")))
      .crossJoin(broadcast(scores.agg(count(lit(1)).as("n"))))
    val thr = cum
      .filter(col("cum") >= ceil(lit(dropFrac) * col("n")))
      .agg(min((col("bin") + lit(1L)) * lit(width) + lit(lo)).as("thr"))
    scores.crossJoin(broadcast(thr))
      .filter(col("avg_logp") >= col("thr"))
      .select("doc_id", "avg_logp")
  }

  def qualityFilterSql(keepFrac: Double = 0.9): String = {
    val lo = -16.0; val bins = 1600L; val width = 0.01
    val dropFrac = 1.0 - keepFrac
    s"""WITH scores AS (SELECT doc_id, avg_logp FROM (
       |    ${TextOps.lmScoreSql}) s),
       |hist AS (SELECT
       |    LEAST(GREATEST(CAST(FLOOR((avg_logp - $lo) / $width) AS BIGINT), 0),
       |          ${bins - 1}) AS bin,
       |    COUNT(*) AS c
       |  FROM scores GROUP BY 1),
       |cum AS (SELECT bin, CAST(SUM(c) OVER (ORDER BY bin) AS BIGINT) AS cum
       |        FROM hist),
       |tot AS (SELECT COUNT(*) AS n FROM scores),
       |thr AS (SELECT MIN((bin + 1) * $width + $lo) AS thr
       |        FROM cum, tot WHERE cum >= CEIL($dropFrac * n))
       |SELECT doc_id, avg_logp FROM scores, thr WHERE avg_logp >= thr""".stripMargin
  }

  def topTokensPerLangSql(topN: Int = 5): String =
    s"""SELECT lang, token, cnt, rank FROM (
       |  SELECT lang, token, cnt,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY cnt DESC, token ASC) AS rank
       |  FROM (
       |    SELECT lang, token, COUNT(*) AS cnt FROM (
       |      SELECT lang,
       |        unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS token
       |      FROM documents) t
       |    GROUP BY lang, token) c) r
       |WHERE rank <= $topN""".stripMargin
}
