package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.kmeans.KMeansOps
import graft.ops.{Dedup, EmbeddingOps, EventOps, Multimodal, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` composes the operator kernels in
  * [[graft.kmeans.KMeansOps]] / [[graft.Tables]] over the shared testdata
  * parquet; every entry in `oracleSql` is the exact DuckDB twin the driver
  * hash-compares against. Column names are aliased identically on both
  * sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  private val K = 8

  /** Fixture mix weights for `corpus_mix` (shared by query + twin):
    * integer+fraction upsample, pure-fraction downsample, drop, and
    * default pass-through for the remaining sources. */
  private val mixWeights: Seq[(String, Double)] = Seq(
    "src0" -> 2.5, "src1" -> 0.4, "src2" -> 0.0, "src3" -> 1.0)

  /** Per-language keep rates (basis points) for `sample_stratified`. */
  private val stratRates: Seq[(String, Int)] = Seq(
    "en" -> 10000, "de" -> 5000, "es" -> 2500, "fr" -> 1000)

  /** Probe tokens for `text_cms` (shared by query + twin): three
    * corpus-frequent words + one absent (estimate 0 unless collision). */
  private val CmsProbes: Seq[String] = Seq("data", "table", "the", "zzz_absent")

  /** assigned = nearest-centroid assignment of the shared points relation
    * to the deterministic k lowest-pid initial centroids. */
  private def assigned(s: SparkSession, dir: String): DataFrame =
    KMeansOps.assign(Tables.points(s, dir), Tables.initCentroids(s, dir, K))

  /** Oracle-side WITH scaffold: pts, cents, assigned. */
  private def withAssigned(tail: String): String =
    Tables.withPtsCents(s", assigned AS (${KMeansOps.assignSql()}) $tail", K)

  /** DuckDB twin of a full `iters`-superstep fixed-init fit: the Lloyd
    * step SQL chained through `iters` CTEs (c0 = init, c_i = step(c_i-1)),
    * then the decimal-exact SSE against the final centroids. */
  private def fitObjectiveSql(iters: Int): String = {
    val steps = (1 to iters)
      .map(i => s"c$i AS (${KMeansOps.stepSql("pts", s"c${i - 1}")})")
      .mkString(", ")
    Tables.withPtsCents(
      s""", c0 AS (SELECT cid, x, y FROM cents), $steps,
         |fin AS (${KMeansOps.assignSql("pts", s"c$iters")})
         |${KMeansOps.objectiveSql("fin")}""".stripMargin, K)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full fixed-init Lloyd fit (10 iterations) returning the final
    * centroids — the reference's EP1 (KMeans.java:148-186) end-to-end. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val cfg = kmeans.KMeansConfig(k = K, maxIter = 10, tol = 1e-9)
    val res = kmeans.KMeansFit.fit(
      Tables.points(spark, dir), Tables.initCentroids(spark, dir, K), cfg)
    Tables.centroidsDF(spark, res.centroids)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ §2.2). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1 — parquet/points scan (projection + derived key)
    "scan_points" -> ((s, dir) => Tables.points(s, dir)),
    // O3 — deterministic in-memory centroid source
    "init_centroids" -> ((s, dir) =>
      Tables.centroidsDF(s, Tables.initCentroids(s, dir, K))),
    // O6-a — zero-shuffle codegen argmin assignment (production path)
    "assign_nearest" -> ((s, dir) => assigned(s, dir)),
    // O6-b — broadcast-join + min(struct) variant (oracle-checkable twin)
    "assign_join" -> ((s, dir) =>
      KMeansOps.assignJoin(
        Tables.points(s, dir),
        Tables.centroidsDF(s, Tables.initCentroids(s, dir, K)))),
    // O7 — count-append map
    "count_append" -> ((s, dir) => KMeansOps.countAppend(assigned(s, dir))),
    // O8 — keyed sum/count aggregate (partial+final combiner)
    "sum_count_agg" -> ((s, dir) => KMeansOps.sumCount(assigned(s, dir))),
    // O9 — mean recompute (one full Lloyd step = assign + recompute)
    "kmeans_step" -> ((s, dir) => KMeansOps.recompute(assigned(s, dir))),
    // simplified (centroid-based) silhouette per cluster
    "kmeans_silhouette" -> ((s, dir) => KMeansOps.silhouette(
      Tables.points(s, dir), Tables.initCentroids(s, dir, K))),
    // O14 — per-point squared distance
    "objective_sqdist" -> ((s, dir) => KMeansOps.objSqdist(assigned(s, dir))),
    // O13 — global sum → scalar SSE
    "objective_sum" -> ((s, dir) => KMeansOps.objective(assigned(s, dir))),
    // O11 — convergence equi join (new centroids vs old, k rows each)
    "converge_pairs" -> ((s, dir) => {
      val init = Tables.centroidsDF(s, Tables.initCentroids(s, dir, K))
      KMeansOps.convergePairs(KMeansOps.recompute(assigned(s, dir)), init)
    }),
    // O12 — theta filter: centroids that moved > epsilon (strict)
    "converge_filter" -> ((s, dir) => {
      val init = Tables.centroidsDF(s, Tables.initCentroids(s, dir, K))
      val pairs = KMeansOps.convergePairs(KMeansOps.recompute(assigned(s, dir)), init)
      KMeansOps.convergeFilter(pairs, epsilon = 1.0).drop("displacement")
    }),
    // O10 — the flagship Lloyd loop itself, oracle-checked: SSE after
    // exactly 10 fixed-init supersteps (the DuckDB twin unrolls the same
    // 10 decimal-exact steps as chained CTEs)
    "kmeans_fit10_obj" -> ((s, dir) => {
      val pts = Tables.points(s, dir)
      val res = kmeans.KMeansFit.fit(pts, Tables.initCentroids(s, dir, K),
        kmeans.KMeansConfig(k = K, maxIter = 10, convergence = false))
      // small local parquet comes up under-split (~3 partitions on 32
      // cores) — rebalance for the final full-scan objective pass
      val balanced = pts.repartition(s.sparkContext.defaultParallelism)
      KMeansOps.objective(KMeansOps.assign(balanced, res.centroids))
    }),

    // O15∘O1 — the reference CSV sink (single-file, header-less,
    // overwrite; KMeans.java:231-233) composed with the positional-schema
    // CSV scan (KMeans.java:73-77): write the shared points relation out,
    // read it back, hash it against the parquet original. Closes the
    // "file sinks have no oracle row" gap — the round trip is value-exact.
    "csv_roundtrip" -> ((s, dir) =>
      Tables.csvRoundtrip(Tables.points(s, dir),
        "target/csv_points_" + dir.replaceAll("[^A-Za-z0-9.]", "_"))),
    // O15∘O2 — same round trip for the centroid schema (cid INT, x, y):
    // one Lloyd step's output through the sink and back
    "csv_rt_cents" -> ((s, dir) =>
      Tables.csvRoundtrip(
        KMeansOps.recompute(assigned(s, dir)),
        "target/csv_cents_" + dir.replaceAll("[^A-Za-z0-9.]", "_"))),

    // JSONL sink ∘ scan — the LLM corpus interchange format: write the
    // documents relation as newline-delimited JSON shards, read back
    // with the explicit schema, hash against the parquet original
    "jsonl_roundtrip" -> ((s, dir) =>
      Tables.jsonlRoundtrip(Tables.table(s, dir, "documents"),
        "target/jsonl_docs_" + dir.replaceAll("[^A-Za-z0-9.]", "_"))),
    // ORC sink ∘ scan over the same relation (typed columnar round trip)
    "orc_roundtrip" -> ((s, dir) =>
      Tables.orcRoundtrip(Tables.table(s, dir, "documents"),
        "target/orc_docs_" + dir.replaceAll("[^A-Za-z0-9.]", "_"))),

    // ----- LLM-data-pipeline surface (SURVEY.md §2.2) -----
    // Text analysis over `documents`
    "text_tokens" -> ((s, dir) => TextOps.tokenCounts(Tables.table(s, dir, "documents"))),
    "text_quality" -> ((s, dir) => TextOps.qualityScore(Tables.table(s, dir, "documents"))),
    // Flesch reading-ease + FK grade (vowel-group syllable heuristic)
    "text_readability" -> ((s, dir) => TextOps.readability(Tables.table(s, dir, "documents"))),
    // per-sentence langid + per-doc mixing census (code-switch alarm)
    "text_lang_mix" -> ((s, dir) => TextOps.langMix(Tables.table(s, dir, "documents"))),
    "text_langid" -> ((s, dir) => TextOps.langId(Tables.table(s, dir, "documents"))),
    // langid precision/recall/F1 vs the gold lang column (per-language)
    "text_langid_eval" -> ((s, dir) =>
      TextOps.langIdEval(Tables.table(s, dir, "documents"))),
    // TextRank keywords: PageRank supersteps over token co-occurrence
    "text_textrank" -> ((s, dir) =>
      TextOps.textRank(Tables.table(s, dir, "documents"))),
    // Dunning G² collocations — calibrated at low counts where PMI isn't
    "text_llr" -> ((s, dir) =>
      TextOps.llrTopK(Tables.table(s, dir, "documents"))),
    // Church-Gale burstiness: VMR of per-doc counts for the top tokens
    "text_burstiness" -> ((s, dir) =>
      TextOps.burstiness(Tables.table(s, dir, "documents"))),
    // Heaps-law vocabulary-growth exponent over bounded checkpoints
    "text_heaps" -> ((s, dir) =>
      TextOps.heapsFit(Tables.table(s, dir, "documents"))),
    "text_token_stats" -> ((s, dir) => TextOps.tokenStats(Tables.table(s, dir, "documents"))),
    // Zipf-law OLS fit over the top-100 token frequencies (plog +
    // integer-grid sufficient statistics — corpus-health stat)
    "text_zipf" -> ((s, dir) => TextOps.zipfSlope(Tables.table(s, dir, "documents"))),
    "text_fingerprint" -> ((s, dir) => TextOps.fingerprints(Tables.table(s, dir, "documents"))),
    // Unicode NFC composition over a derived decomposed-accent variant
    "text_nfc" -> ((s, dir) => TextOps.nfcNormalized(Tables.table(s, dir, "documents"))),
    // per-source Gopher pass-rate ranked by the 95% Wilson lower bound
    "source_wilson" -> ((s, dir) =>
      TextOps.sourceQualityWilson(Tables.table(s, dir, "documents"))),
    // PSI distribution drift of value between the stream's two halves
    "events_psi" -> ((s, dir) => EventOps.psiDrift(Tables.events(s, dir))),
    // greedy quality-first selection under a 50%-of-corpus token budget
    "corpus_budget" -> ((s, dir) =>
      TextOps.budgetSelect(Tables.table(s, dir, "documents"))),
    // Bradley-Terry strengths from pairwise cross-source quality duels
    "source_bt" -> ((s, dir) =>
      graft.ops.Preference.bradleyTerry(Tables.table(s, dir, "documents"))),
    // KMV sketch set algebra: pairwise user-overlap estimates + exact
    "events_kmv_overlap" -> ((s, dir) => EventOps.kmvOverlap(Tables.events(s, dir))),
    // local clustering coefficient from the shared triangle machinery;
    // r15: duplication-calibrated support threshold (see graph_triangles)
    "graph_clustering" -> ((s, dir) =>
      graft.ops.GraphOps.coOrderClusteringAuto(Tables.table(s, dir, "lineitem"))),
    // deterministic k-means++ (exponential-race D^2 sampling)
    "init_kmeanspp" -> ((s, dir) =>
      KMeansOps.kmeansPlusPlus(Tables.points(s, dir))),
    // winnowing fingerprint census (MOSS local-minimum selection)
    "text_winnow" -> ((s, dir) =>
      graft.ops.Winnow.census(Tables.table(s, dir, "documents"))),
    // near-dup candidates sharing winnowed fingerprints (DF-capped)
    "dedup_winnow" -> ((s, dir) =>
      graft.ops.Winnow.pairs(Tables.table(s, dir, "documents"))),
    // the winnow size gates made observable: docs the fingerprint
    // relation omits (too short to winnow / over the 2^20 packed bound)
    "dedup_winnow_excluded" -> ((s, dir) =>
      graft.ops.Winnow.excluded(Tables.table(s, dir, "documents"))),
    // exact heavy hitters via bounded-state Misra-Gries + verify pass
    "text_heavy_hitters" -> ((s, dir) =>
      graft.ops.HeavyHitters.heavyHitters(Tables.table(s, dir, "documents"))),
    // k-means|| oversampling sweep (Bahmani 2012) — weighted candidates
    "init_kmeansbb" -> ((s, dir) =>
      graft.kmeans.KMeansParallel.candidates(Tables.points(s, dir))),
    // k-means||: weighted k-means++ recluster of the candidates to k seeds
    "init_kmeansbb_final" -> ((s, dir) =>
      graft.kmeans.KMeansParallel.finalCenters(Tables.points(s, dir))),
    // connected components of the co-order graph (min-label + doubling)
    "graph_cc" -> ((s, dir) =>
      graft.ops.GraphOps.coOrderComponents(Tables.table(s, dir, "lineitem"))),
    // Poisson(1) bootstrap replicate weights (online-bootstrap trick)
    "sample_bootstrap" -> ((s, dir) =>
      graft.ops.Sampling.bootstrapWeights(Tables.table(s, dir, "documents"))),
    // D²-sensitivity k-means coreset with unbiased estimator weights
    "sample_coreset" -> ((s, dir) =>
      graft.ops.Sampling.coresetSample(
        Tables.points(s, dir), Tables.initCentroids(s, dir, K))),
    // degree assortativity of the co-order graph
    "graph_assortativity" -> ((s, dir) =>
      graft.ops.GraphOps.coOrderAssortativity(Tables.table(s, dir, "lineitem"))),
    // link prediction: top-k neighborhood-Jaccard non-edges
    "graph_linkpred" -> ((s, dir) =>
      graft.ops.GraphOps.coOrderLinkPrediction(Tables.table(s, dir, "lineitem"))),
    // differentially-private per-type counts (deterministic Laplace)
    "events_dp_counts" -> ((s, dir) => EventOps.dpCounts(Tables.events(s, dir))),
    // Markov stationary distribution of the event-type chain
    "events_stationary" -> ((s, dir) =>
      EventOps.stationaryDistribution(Tables.events(s, dir))),
    // Markov entropy rate: predictability of the next event type
    "events_entropy_rate" -> ((s, dir) =>
      EventOps.entropyRate(Tables.events(s, dir))),
    // Kaplan-Meier view->purchase survival curve with censoring
    "events_survival" -> ((s, dir) =>
      EventOps.survivalCurve(Tables.events(s, dir))),
    // multi-touch attribution: first/last/linear channel credits
    "events_attribution" -> ((s, dir) =>
      EventOps.attributionCredits(Tables.events(s, dir))),
    // next-hour volume forecast: exponential smoothing per type
    "events_forecast" -> ((s, dir) =>
      EventOps.sesForecast(Tables.events(s, dir))),
    // rank / dense_rank / percent_rank / cume_dist in one window pass
    "events_rank_suite" -> ((s, dir) =>
      EventOps.rankSuite(Tables.events(s, dir))),
    // Welch unequal-variance t-test between two event cohorts
    "events_ab_ttest" -> ((s, dir) =>
      graft.ops.StatsOps.welchTTest(
        Tables.events(s, dir),
        org.apache.spark.sql.functions.col("value"),
        org.apache.spark.sql.functions.col("event_type"),
        "click", "view")),
    // majority-vote ensemble of gopher + NB + logreg quality gates
    "pipe_ensemble" -> ((s, dir) =>
      TextOps.ensembleGate(Tables.table(s, dir, "documents"))),
    // tokenizer fertility (chars/bytes per token) by source
    "text_fertility" -> ((s, dir) =>
      TextOps.tokenizerFertility(Tables.table(s, dir, "documents"))),
    // logistic regression trained in-engine (3 full-batch GD steps)
    "text_logreg" -> ((s, dir) =>
      TextOps.logregScore(Tables.table(s, dir, "documents"))),
    "text_repetition" -> ((s, dir) => TextOps.repetitionStats(Tables.table(s, dir, "documents"))),
    // full Gopher Table-A1 repetition gate: top-{2..4}-gram and
    // dup-{5..10}-gram CHAR fractions + the paper's threshold verdict
    "text_gopher_rep" -> ((s, dir) => TextOps.gopherRepetition(Tables.table(s, dir, "documents"))),
    // offline IR eval: P@10 / MRR / AP@10 / NDCG@10 of per-term BM25
    // rankings against graded term-frequency relevance
    "rank_eval" -> ((s, dir) =>
      graft.ops.RankEval.bm25Eval(Tables.table(s, dir, "documents"))(s)),
    // corpus-trained top-V vocab (TakeOrdered + broadcast id map) ->
    // per-position token ids, OOV -> 0
    "text_tok_ids" -> ((s, dir) =>
      TextOps.tokenizeIds(Tables.table(s, dir, "documents"))),
    // unigram-LM mean log-prob quality score (CCNet-style proxy)
    "text_lm_score" -> ((s, dir) =>
      TextOps.lmScore(Tables.table(s, dir, "documents"))),
    // interpolated bigram LM (Jelinek-Mercer): word-ORDER plausibility,
    // scan-side pair stream + two map-combined aggs + pair-key join
    "text_lm2_score" -> ((s, dir) =>
      TextOps.lm2Score(Tables.table(s, dir, "documents"))),
    // interpolated Kneser-Ney bigram LM: continuation-count smoothing
    "text_kn_score" -> ((s, dir) =>
      TextOps.knScore(Tables.table(s, dir, "documents"))),
    // CCNet perplexity gate: per-language rank-tertile buckets over the
    // KN LM score; keep = head+middle
    "text_ppl_buckets" -> ((s, dir) =>
      TextOps.pplBuckets(Tables.table(s, dir, "documents"))),
    // lexical diversity: per-doc token entropy (grid-snapped plog terms)
    "text_entropy" -> ((s, dir) =>
      TextOps.tokenEntropy(Tables.table(s, dir, "documents"))),
    // per-source z-scored doc length (exact integer stats, float only
    // at the final divide/sqrt)
    "text_znorm" -> ((s, dir) =>
      TextOps.lengthZNorm(Tables.table(s, dir, "documents"))),
    // per-source percentile clipping — exact rank-based percentiles
    // (no interpolation arithmetic), one window shuffle + S-row bounds
    "text_winsorize" -> ((s, dir) =>
      TextOps.winsorize(Tables.table(s, dir, "documents"))),
    // cross-source shingle contamination matrix: per-pair shared
    // shingles + Jaccard; per-shingle fan-out bounded by sources²
    "corpus_overlap" -> ((s, dir) =>
      TextOps.sourceOverlap(Tables.table(s, dir, "documents"))),
    // difficulty-interleaved training order: fixed-width LM-score
    // bands (no global ntile/SinglePartition), pos round-robins bands
    "curriculum_order" -> ((s, dir) =>
      TextOps.curriculumOrder(Tables.table(s, dir, "documents"),
        scoreLo = -3.7, scoreHi = -3.35)),
    // BPE tokenizer-training inner loop: top adjacent-pair merge
    // candidates (scan-stage pair stream, one pair shuffle, TopK)
    "text_bpe_pairs" -> ((s, dir) =>
      TextOps.bpePairs(Tables.table(s, dir, "documents"))),
    // the full trainer: count -> argmax -> MERGE into the corpus,
    // repeated (ordered merge table, Lloyd-loop driver shape)
    "text_bpe_train" -> ((s, dir) =>
      TextOps.bpeTrain(Tables.table(s, dir, "documents"))),
    // word2vec-style +/-2-window co-occurrence counts (scan-side pair
    // stream per offset, one pair shuffle, TopK)
    "text_skipgrams" -> ((s, dir) =>
      TextOps.skipgramPairs(Tables.table(s, dir, "documents"))),
    // PMI word association (Levy & Goldberg 2014's implicit SGNS
    // target): integer-product log arguments keep every score exact
    "text_pmi" -> ((s, dir) =>
      TextOps.pmiTopK(Tables.table(s, dir, "documents"))),
    // drift diagnostic: JS divergence between the train split's and the
    // holdout's token distributions (signed portable log, decimal sums)
    "corpus_jsd" -> ((s, dir) =>
      TextOps.corpusJsDivergence(Tables.table(s, dir, "documents"))),
    // DSIR importance resampling (Xie 2023): hashed-ngram log ratios
    // vs a target domain; B-bucket stats pass + broadcast scoring
    "dsir_weights" -> ((s, dir) =>
      graft.ops.Dsir.importanceWeights(
        Tables.table(s, dir, "documents"), "src0")),
    "dsir_select" -> ((s, dir) =>
      graft.ops.Dsir.select(
        Tables.table(s, dir, "documents"), "src0", 100)),
    // ESS + weight-concentration diagnostics over the DSIR weights —
    // the "is this weighted resample statistically real?" dial
    "dsir_ess" -> ((s, dir) =>
      graft.ops.Dsir.essReport(
        Tables.table(s, dir, "documents"), "src0")),
    // variance-optimal weighted sample: zero-shuffle priorities + TopK
    // A-ES weighted reservoir (exact PPS-WOR): ln(u)/w keys via plog,
    // TakeOrdered top-k — prioritySample's sampling-law sibling
    "sample_ares" -> ((s, dir) =>
      graft.ops.Sampling.aresSample(Tables.table(s, dir, "documents"), k = 256)),
    // per-stratum weighted reservoir: A-ES keys + the custom
    // bounded-heap TopKPerKey operator (never a full stratum sort)
    "sample_ares_grouped" -> ((s, dir) =>
      graft.ops.Sampling.aresSamplePerSource(
        Tables.table(s, dir, "documents"), k = 64)),
    "sample_priority" -> ((s, dir) =>
      graft.ops.Sampling.prioritySample(
        Tables.table(s, dir, "documents"), 100)),
    // Ranked retrieval: portable-log tf-idf / BM25 / hybrid RRF fusion
    // (PortableMath.plog keeps the log-weighted scores hash-exact
    // against DuckDB — raw ln() differs by 1 ulp on ~8% of idf inputs)
    "text_tfidf" -> ((s, dir) =>
      graft.ops.RetrievalOps.tfidf(Tables.table(s, dir, "documents"))),
    "text_bm25_topk" -> ((s, dir) =>
      graft.ops.RetrievalOps.bm25TopK(Tables.table(s, dir, "documents"))),
    // query-likelihood LM retrieval (Dirichlet smoothing) — the
    // generative member of the retrieval family; signed portable log
    "text_ql_topk" -> ((s, dir) =>
      graft.ops.RetrievalOps.qlTopK(Tables.table(s, dir, "documents"))),
    // all-pairs sparse cosine join (Bayardo 2007): tf-idf shingle
    // vectors, pairs generated only through the DF-capped inverted
    // index — grid-snapped dot products keep it hash-exact
    "text_cosine_pairs" -> ((s, dir) =>
      graft.ops.RetrievalOps.cosinePairs(Tables.table(s, dir, "documents"))),
    "hybrid_rrf_topk" -> ((s, dir) =>
      graft.ops.RetrievalOps.hybridRrfTopK(
        Tables.table(s, dir, "documents"), Tables.table(s, dir, "embeddings"))),
    // count-min sketch frequency estimates: the deterministic mergeable
    // frequency sketch (md5-60 bucket hashes → oracle-EXACT, like
    // events_qbins for the histogram family)
    "text_cms" -> ((s, dir) =>
      TextOps.cmsEstimates(Tables.table(s, dir, "documents"), CmsProbes)),
    // Gopher-style scan-stage quality gate (zero shuffle)
    "text_gopher" -> ((s, dir) =>
      TextOps.gopherFilter(Tables.table(s, dir, "documents"))),
    // Dedup
    "dedup_exact" -> ((s, dir) => Dedup.exact(Tables.table(s, dir, "documents"))),
    // incremental dedup: the doc_id%5==0 "arriving batch" anti-joined
    // by content digest against the rest of the corpus ("history")
    "dedup_incr" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
      import org.apache.spark.sql.functions.col
      Dedup.dedupAgainstExact(
        d.filter(col("doc_id") % 5 =!= 0), d.filter(col("doc_id") % 5 === 0))
    }),
    // the near-dup sibling: batch docs with no verified minhash
    // near-dup in history (cross-side LSH candidates only)
    "dedup_incr_near" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
      import org.apache.spark.sql.functions.col
      Dedup.dedupAgainstNearMd5(
        d.filter(col("doc_id") % 5 =!= 0), d.filter(col("doc_id") % 5 === 0))
    }),
    // production form: history LSH artifacts persisted once (bands,
    // shingles, dfs), each batch probes without re-hashing the corpus —
    // identical output and oracle to dedup_incr_near
    "dedup_incr_indexed" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
      import org.apache.spark.sql.functions.col
      val path = "target/dedup_index_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      graft.ops.DedupIndex.writeOnce(d.filter(col("doc_id") % 5 =!= 0), path)
      graft.ops.DedupIndex.probe(s, path, d.filter(col("doc_id") % 5 === 0))
    }),
    "dedup_fingerprint" -> ((s, dir) =>
      Dedup.exactByFingerprint(Tables.table(s, dir, "documents"))),
    // 128-bit digest key — the collision-safe exact-dedup key at corpus
    // scale (the 30-bit rolling fingerprint is the fast path only)
    "dedup_digest" -> ((s, dir) =>
      Dedup.exactByDigest(Tables.table(s, dir, "documents"))),
    // Substring-level dedup (Lee et al. 2022): corpus-duplicated token
    // spans + per-doc span-duplication profile
    "dedup_spans" -> ((s, dir) =>
      graft.ops.SpanDedup.dupSpans(Tables.table(s, dir, "documents"))),
    "dedup_span_stats" -> ((s, dir) =>
      graft.ops.SpanDedup.spanStats(Tables.table(s, dir, "documents"))),
    // content-defined chunking census (LBFS-style boundaries at token
    // granularity): chunks shared across >= 2 docs, insertion-robust
    "dedup_cdc" -> ((s, dir) =>
      Dedup.cdcChunkCensus(Tables.table(s, dir, "documents"))),
    // CCNet-style line dedup at sentence granularity
    "dedup_sentences" -> ((s, dir) =>
      Dedup.sentenceCensus(Tables.table(s, dir, "documents"))),
    // strict token-prefix pairs (crawl truncation artifacts); r15:
    // per-(prefix, length) participant cap — replica fan-out was
    // output-quadratic (SF10_SPOT 3.7→109.8 s for 10× data)
    "dedup_trunc" -> ((s, dir) =>
      Dedup.truncationPairs(Tables.table(s, dir, "documents"))),
    // the cap's observability half: group sizes + truncated flag
    "dedup_trunc_blocks" -> ((s, dir) =>
      Dedup.truncationGroupStats(Tables.table(s, dir, "documents"))),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.table(s, dir, "documents"))),
    // asymmetric containment |A∩B|/|A| — the quote/subset detector
    "dedup_containment" -> ((s, dir) =>
      Dedup.ngramContainmentPairs(Tables.table(s, dir, "documents"))),
    // banding-loss eval: LSH near-dups vs exact-Jaccard truth. r16:
    // auto-samples above 100k docs (mod escalates 4x per 16x corpus,
    // derived integer-exactly in both engines) — the full eval is
    // output-quadratic (2885 s / ~48 GB at sf10); at every gate SF and
    // sf1 the modulus is 1, i.e. the full eval, hashes unchanged
    "dedup_eval" -> ((s, dir) =>
      Dedup.minhashEvalAuto(Tables.table(s, dir, "documents"))),
    // the at-scale eval path: same P/R estimator on the deterministic
    // 1-in-4 doc sample — both quadratic pair relations shrink 16×
    "dedup_eval_sampled" -> ((s, dir) =>
      Dedup.minhashEvalSampled(Tables.table(s, dir, "documents"))),
    // ingestion-order duplication growth: per doc_id decile, how many
    // docs exactly duplicate ANY earlier doc (the crawl-saturation dial)
    "dedup_novelty" -> ((s, dir) =>
      Dedup.noveltyCurve(Tables.table(s, dir, "documents"))),
    // which sources copy which: near-dup pairs by unordered source pair
    "dedup_source_matrix" -> ((s, dir) =>
      Dedup.sourceMatrix(Tables.table(s, dir, "documents"))),
    // threshold operating curve: pairs at-or-above each 5% Jaccard step
    "dedup_threshold_curve" -> ((s, dir) =>
      Dedup.thresholdCurve(Tables.table(s, dir, "documents"))),
    // lossless prefix-filtering variant (SSJoin/PPJoin family): the
    // rarest-first prefix index replaces the DF cap entirely
    "dedup_prefix_jaccard" -> ((s, dir) =>
      Dedup.prefixJaccardPairs(Tables.table(s, dir, "documents"))),
    // md5-60 hash family — the oracle-gated registrations: every hash
    // is DuckDB-expressible, so the full signatures→banding→candidates
    // →verify chain is hash-checked end-to-end. The xxhash64 twins
    // (identical operator DAG, engine-native codegen hash — the faster
    // production choice) run as `benchOnly` dedup_minhash_xx /
    // dedup_simhash_xx, pinned equal-DAG by DedupSpec.
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashNearDupsMd5(Tables.table(s, dir, "documents"))),
    // b-bit minhash: 64×-compressed signatures, bias-corrected
    // estimator vs the full-width one on every LSH candidate pair
    "dedup_bbit" -> ((s, dir) =>
      Dedup.bbitMinhash(Tables.table(s, dir, "documents"))),
    // weighted (multiset) Jaccard over LSH candidates — separates
    // "same content" from "same content, spammed"
    "dedup_weighted" -> ((s, dir) =>
      Dedup.weightedJaccardPairs(Tables.table(s, dir, "documents"))),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashNearDupsMd5(Tables.table(s, dir, "documents"))),
    "dedup_groups" -> ((s, dir) =>
      Dedup.nearDupGroups(Tables.table(s, dir, "documents"))),
    "dedup_corpus" -> ((s, dir) =>
      Dedup.dedupedCorpus(Tables.table(s, dir, "documents"))),
    // quality-aware variant: each near-dup group keeps its longest
    // member (tie -> lowest doc_id) instead of the lowest id
    "dedup_best" -> ((s, dir) =>
      Dedup.dedupKeepBest(Tables.table(s, dir, "documents"))),
    // SemDeDup (embedding-space semantic dedup): fixed-iteration
    // quantizer build → within-cluster cosine pairs → anti-join;
    // tau=0.4 matches the synthetic embeddings' near-dup range (the
    // 0.95 paper default finds nothing on random-ish vectors)
    "dedup_semantic_pairs" -> ((s, dir) =>
      graft.ops.SemDedup.semanticNearDups(
        Tables.table(s, dir, "embeddings"), tau = 0.4)),
    "dedup_semantic" -> ((s, dir) =>
      graft.ops.SemDedup.semanticDedup(
        Tables.table(s, dir, "embeddings"), tau = 0.4)),
    // Deterministic hash-bucket splits + weighted source mixing
    "sample_split" -> ((s, dir) =>
      graft.ops.Sampling.splitAssign(Tables.table(s, dir, "documents"))),
    // near-dup pairs straddling the train/valid/test boundary — the
    // eval-contamination audit a doc-id-keyed split needs (r14). A
    // balanced 50/25/25 split: the audit's pessimistic case, and the
    // fixture's ~25 near-dup pairs then yield a populated report (the
    // default 98/1/1 split leaves ~0 straddles at gate SFs — an empty
    // relation gates nothing)
    "split_leakage" -> ((s, dir) =>
      graft.ops.Sampling.splitLeakage(Tables.table(s, dir, "documents"),
        trainBp = 5000, validBp = 2500, threshold = 0.5)),
    // snapshot-to-snapshot diff census (added/removed/changed/unchanged
    // by lang) — the dataset-versioning primitive (r14)
    "corpus_diff" -> ((s, dir) =>
      graft.ops.SnapshotDiff.diff(Tables.table(s, dir, "documents"))),
    "corpus_mix" -> ((s, dir) =>
      graft.ops.Sampling.weightedMix(
        Tables.table(s, dir, "documents"), mixWeights)),
    // temperature mixing (α=0.5): source weights ∝ √n_s computed fully
    // in-plan — counts agg + broadcast of |sources| rates onto the scan
    "mix_temp" -> ((s, dir) =>
      graft.ops.Sampling.temperatureMix(Tables.table(s, dir, "documents"))),
    // per-language keep rates (zero-shuffle) + exact per-stratum cap
    "sample_stratified" -> ((s, dir) =>
      graft.ops.Sampling.stratifiedSample(
        Tables.table(s, dir, "documents"), stratRates)),
    "sample_cap_stratum" -> ((s, dir) =>
      graft.ops.Sampling.capPerStratum(
        Tables.table(s, dir, "documents"), n = 40)),
    // Similarity search over `embeddings`
    "emb_norms" -> ((s, dir) => EmbeddingOps.norms(Tables.table(s, dir, "embeddings"))),
    // dominant principal component by power iteration (constant-size
    // sufficient-statistic aggregate + driver-side iteration), and the
    // zero-shuffle centered projection of every vector onto it
    "emb_pca_pc1" -> ((s, dir) =>
      EmbeddingOps.pcaPc1(Tables.table(s, dir, "embeddings"), dir)),
    "emb_pca_project" -> ((s, dir) =>
      EmbeddingOps.pcaProject(Tables.table(s, dir, "embeddings"), dir)),
    "emb_cosine_topk" -> ((s, dir) =>
      EmbeddingOps.cosineTopK(Tables.table(s, dir, "embeddings"))),
    // SQ8 scalar-quantized ANN: per-dim corpus [lo,hi] grid (driver-
    // sized stats), 1 byte/dim codes, asymmetric decoded-cosine top-k
    "emb_sq8_topk" -> ((s, dir) =>
      graft.ops.QuantOps.sq8TopK(Tables.table(s, dir, "embeddings"))),
    // binary sign-hash shortlist: 64 dims -> two packed words, Hamming
    // top-k via popcount(xor) — the 32x-compressed rep
    "emb_hamming_topk" -> ((s, dir) =>
      graft.ops.QuantOps.hammingTopK(Tables.table(s, dir, "embeddings"))),
    // Matryoshka two-stage: prefix-16-dim cosine shortlist, exact
    // full-dim re-rank of the 40-candidate shortlist
    "emb_matryoshka_topk" -> ((s, dir) =>
      graft.ops.QuantOps.matryoshkaTopK(Tables.table(s, dir, "embeddings"))),
    // MMR diversity re-rank: corpus-wide scoring stays distributed
    // (top-pool TakeOrdered); the greedy picks run over the CONSTANT
    // pool; k steps unrolled in the twin
    "emb_mmr_topk" -> ((s, dir) =>
      EmbeddingOps.mmrTopK(Tables.table(s, dir, "embeddings"))),
    // r16: the registered default is the auto-width MULTIPROBE form
    // (bits from the corpus count, query probes its bucket + all
    // one-bit flips per table) — the fixed b8/t4 default had recall
    // 0.0 at sf0.1; the emb_topk_recall gate pins the new accuracy
    "emb_lsh_topk" -> ((s, dir) =>
      EmbeddingOps.lshTopKAuto(Tables.table(s, dir, "embeddings"))),
    // Johnson-Lindenstrauss random-projection shortlist + exact rerank;
    // r16: p = clamp(4*ceil(log2 n), 16, 48) from one count (JL prices
    // width at O(log n)), overscan 50 — the proven recall-1.0 point
    "emb_rp_topk" -> ((s, dir) =>
      EmbeddingOps.rpTopKAuto(Tables.table(s, dir, "embeddings"))),
    "emb_near_dups" -> ((s, dir) =>
      EmbeddingOps.cosineNearDups(Tables.table(s, dir, "embeddings"))),
    // hard-negative mining: per anchor, top-k most-similar with a
    // DIFFERENT label (LSH-blocked candidates, label filter pre-rescore)
    "emb_hard_negatives" -> ((s, dir) =>
      EmbeddingOps.hardNegativesAuto(Tables.table(s, dir, "embeddings"))),
    // semantic member of the incremental family: batch vectors with no
    // history vector over the cosine threshold (cross-side LSH only)
    "emb_incr" -> ((s, dir) => {
      val e = Tables.table(s, dir, "embeddings")
      import org.apache.spark.sql.functions.col
      EmbeddingOps.dedupAgainstCosine(
        e.filter(col("vec_id") % 5 =!= 0), e.filter(col("vec_id") % 5 === 0))
    }),
    // every vector's top-k neighbors among its LSH-bucket candidates —
    // the k-NN graph semantic clustering / curriculum ordering consume.
    // r15: the registered default derives the LSH width from corpus
    // size (bits = clamp(ceil(log2(n/16)), 6, 16), pure-integer
    // staircase in both engines) so the candidate join stays LINEAR in
    // n — the fixed-6-bit setting the r14 audit flagged made candidates
    // quadratic (SF10_SPOT: 2.84e9 pairs at sf10 vs 1.4e8 at 12 bits)
    "emb_knn_graph" -> ((s, dir) =>
      EmbeddingOps.knnGraphAuto(Tables.table(s, dir, "embeddings"))),
    // the dedup-first composition: exact vector dedup (min-id per
    // distinct embedding) -> auto-width knn graph over the DISTINCT
    // corpus — replicas co-bucket under any hash, so this is the order
    // a real pipeline runs; at sf10 it recovers the true 2000-vector
    // graph from the x100-replicated fixture (r16, VERDICT r15 item 5)
    "emb_knn_graph_deduped" -> ((s, dir) =>
      EmbeddingOps.knnGraphDeduped(Tables.table(s, dir, "embeddings"))),
    // the same knn graph at a FIXED 10-bit setting — the curve point
    // that originally priced the scale path (sf1: 6.7 s vs ~53 s at 6
    // bits); kept fixed so the ladder stays comparable across SFs
    "emb_knn_graph_b10" -> ((s, dir) =>
      EmbeddingOps.knnGraph(Tables.table(s, dir, "embeddings"), numBits = 10)),
    // recall@k across the LSH bit ladder vs exact truth on a 1% anchor
    // sample — the accuracy dial for the numBits scale knob
    "emb_lsh_recall_bits" -> ((s, dir) =>
      EmbeddingOps.lshRecallCurve(Tables.table(s, dir, "embeddings"))),
    // (n_vectors, num_bits): pins the auto-width integer staircase
    // against the oracle's COUNT(*)-derived staircase at every SF
    "emb_auto_bits" -> ((s, dir) =>
      EmbeddingOps.autoBitsReport(Tables.table(s, dir, "embeddings"))),
    // recall@k of the AUTO-width graph vs exact truth — the accuracy
    // pin for the registered default as n moves the derived bits
    "emb_auto_recall" -> ((s, dir) =>
      EmbeddingOps.autoRecall(Tables.table(s, dir, "embeddings"))),
    // recall@10 of the four registered single-query ANN defaults vs
    // exact truth under each family's own metric — the r16 accuracy
    // gate for the recall-targeted defaults (hash-exact != useful)
    "emb_topk_recall" -> ((s, dir) =>
      EmbeddingOps.topkRecallReport(Tables.table(s, dir, "embeddings"))),
    // kNN-distance OOD score (k-th-NN cosine) — curation outlier gate
    "emb_ood_score" -> ((s, dir) =>
      EmbeddingOps.oodScoresAuto(Tables.table(s, dir, "embeddings"))),
    // Artetxe-Schwenk ratio-margin pair mining (hubness-corrected)
    "emb_margin_mine" -> ((s, dir) =>
      EmbeddingOps.marginMineAuto(Tables.table(s, dir, "embeddings"))),
    // per-label centroid drift between deterministic corpus halves
    "emb_drift" -> ((s, dir) =>
      EmbeddingOps.centroidDrift(Tables.table(s, dir, "embeddings"))),
    // diversity-preserving density prune: per-label centroid-distance
    // rank, alternating keeps — the observable 2x redundancy cut
    "emb_diversity_prune" -> ((s, dir) =>
      EmbeddingOps.diversityPrune(Tables.table(s, dir, "embeddings"))),
    // TwoNN intrinsic dimension — embedding-collapse alarm
    "emb_intrinsic_dim" -> ((s, dir) =>
      EmbeddingOps.intrinsicDimAuto(Tables.table(s, dir, "embeddings"))),
    // Events: windowed agg + sessionization
    "events_hourly_agg" -> ((s, dir) => EventOps.hourlyTypeAgg(Tables.events(s, dir))),
    // incremental view maintenance: base (6/7 of events) ⊕ delta (1/7)
    // merged WITHOUT rescanning — the oracle is the full recompute, so
    // the gate checks the monoid-merge identity itself
    "events_incr_agg" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.events(s, dir)
      EventOps.hourlyAggMerge(
        e.filter(col("event_id") % 7 =!= 0), e.filter(col("event_id") % 7 === 0))
    }),
    "events_sessionize" -> ((s, dir) => EventOps.sessionize(Tables.events(s, dir))),
    "events_percentiles" -> ((s, dir) => EventOps.typePercentiles(Tables.events(s, dir))),
    // rank-exact median + MAD (PERCENTILE_DISC selection on the cents
    // grid — integer-exact, no middle-pair float averaging)
    "events_mad" -> ((s, dir) => EventOps.typeMad(Tables.events(s, dir))),
    // growth accounting: first-seen day per user -> running cumulative
    // distinct users (one min-agg, no per-day expanding re-scan)
    "events_cum_users" -> ((s, dir) => EventOps.cumulativeUsers(Tables.events(s, dir))),
    // rolling-window HLL merge: daily register relations merged into a
    // trailing 3-day estimate — the sketch-MERGEABILITY demo (windows
    // are register-wise MAX; no user-level re-touch), exact alongside
    "events_hll_rolling" -> ((s, dir) => EventOps.hllUsersRolling(Tables.events(s, dir))),
    // whole-operator Catalyst extension (custom LogicalPlan + Strategy
    // + SparkPlan): per-key top-k via bounded heaps — partial map-side
    // reduction to k rows/key/partition, shuffle carries heads only,
    // final heap merge; no Window, no per-group full sort
    "topk_per_key" -> ((s, dir) =>
      org.apache.spark.sql.graft.TopKPerKey(
        Tables.events(s, dir).select("event_type", "event_id", "value"),
        keys = Seq("event_type"),
        order = Seq("value" -> false, "event_id" -> true), k = 3)),
    // robust outliers composed over the MAD relation (broadcast back
    // onto the scan; integer-grid threshold, no float compare)
    "events_outliers" -> ((s, dir) => EventOps.typeOutliers(Tables.events(s, dir))),
    // CUSUM drift alarms vs the type's own median — the sequential
    // max(0, S+d) fold as two window passes (prefix sum - running min)
    "events_cusum" -> ((s, dir) => EventOps.typeCusum(Tables.events(s, dir))),
    // fixed-width histogram (integer floor-div bins) — the profiling
    // twin of the equi-depth qbins
    "events_histogram" -> ((s, dir) => EventOps.typeHistogram(Tables.events(s, dir))),
    // funnel latency: first view -> first subsequent purchase per user
    "events_conversion_lag" -> ((s, dir) => EventOps.conversionLag(Tables.events(s, dir))),
    // deterministic sketch row (binned quantiles + md5-HLL users + n):
    // every estimate a pure function of the data → oracle-exact; the
    // t-digest/HLL engine-native variant is benchOnly
    // events_sketches_approx (accuracy pinned in EventAndMultimodalSpec)
    "events_sketches" -> ((s, dir) => EventOps.typeSketchesDet(Tables.events(s, dir))),
    // fixed-bin histogram quantiles: the deterministic (merge-order-
    // independent) sketch — same mergeable-partial-agg shape as t-digest
    // but oracle-EXACT, closing the "sketch estimates can't be
    // hash-checked" gap for the histogram family
    "events_qbins" -> ((s, dir) =>
      EventOps.binnedQuantiles(Tables.events(s, dir))),
    // deterministic HLL distinct-users (md5-60 registers, libm-free
    // rho via bin()) with the exact count alongside — the cardinality
    // member of the oracle-exact sketch family (qbins, cms)
    "events_hll_users" -> ((s, dir) =>
      EventOps.hllUsers(Tables.events(s, dir))),
    // KMV k-minimum-values distinct sketch — the order-statistics
    // sibling of the HLL twin, same md5-60 oracle-exact determinism
    "events_kmv_users" -> ((s, dir) =>
      EventOps.kmvUsers(Tables.events(s, dir))),
    // 24h window: the synthetic events are sparse per user, so the
    // default 60 min yields too few conversions to be a meaningful check
    "events_funnel" -> ((s, dir) =>
      EventOps.funnel(Tables.events(s, dir), withinMinutes = 1440)),
    "events_rollup" -> ((s, dir) => EventOps.dailyTypeRollup(Tables.events(s, dir))),
    // point-in-time enrichment: each purchase joined to the user's most
    // recent at-or-before view (union-window as-of join, 1 shuffle)
    "events_asof" -> ((s, dir) => EventOps.asofJoin(Tables.events(s, dir))),
    // interval-containment join with NO equi key (every high-value error
    // spawns a ±10 min incident window; count/sum events inside) — the
    // binned equi-join plan, never a BroadcastNestedLoopJoin
    "events_ivjoin" -> ((s, dir) => EventOps.incidentWindows(Tables.events(s, dir))),
    // typed JSON extraction from the semi-structured props column
    "events_json" -> ((s, dir) => EventOps.propsKStats(Tables.events(s, dir))),
    // star-schema join surface: fact x fact x dim x broadcast-dim
    "star_revenue" -> ((s, dir) =>
      graft.ops.Relational.starRevenue(
        Tables.table(s, dir, "lineitem"), Tables.table(s, dir, "orders"),
        Tables.table(s, dir, "customer"), Tables.table(s, dir, "nation"))),
    // TPC-H Q1 shape: pushed scan filter + single-pass multi-agg
    "pricing_summary" -> ((s, dir) =>
      graft.ops.Relational.pricingSummary(Tables.table(s, dir, "lineitem"))),
    // multi-dimensional aggregates: CUBE margins in one scan (Expand +
    // one shuffle) and the year→month ROLLUP subtotal chain
    "cube_pricing" -> ((s, dir) =>
      graft.ops.Relational.pricingCube(Tables.table(s, dir, "lineitem"))),
    "rollup_orders" -> ((s, dir) =>
      graft.ops.Relational.ordersRollup(Tables.table(s, dir, "orders"))),
    // TPC-H Q3 shape: two pushed date filters, broadcast segment side,
    // TakeOrdered top-10 — never a global sort
    "top_orders" -> ((s, dir) =>
      graft.ops.Relational.topUnshippedOrders(
        Tables.table(s, dir, "lineitem"), Tables.table(s, dir, "orders"),
        Tables.table(s, dir, "customer"))),
    // TPC-H Q18 shape: the HAVING-filtered agg IS the join's driving
    // side (semi-join + re-agg collapse into ONE lineitem scan),
    // deterministic TakeOrdered top-100
    "large_orders" -> ((s, dir) =>
      graft.ops.Relational.largeVolumeOrders(
        Tables.table(s, dir, "lineitem"), Tables.table(s, dir, "orders"),
        Tables.table(s, dir, "customer"))),
    // TPC-H Q17 shape: correlated scalar subquery decorrelated into a
    // broadcast per-part average joined back onto the pruned fact slice
    "small_qty_revenue" -> ((s, dir) =>
      graft.ops.Relational.smallQtyRevenue(
        Tables.table(s, dir, "lineitem"), Tables.table(s, dir, "part"))),
    // pivot with an EXPLICIT value list — one conditional-agg pass, no
    // distinct-collect pre-scan to discover columns
    "pivot_orders" -> ((s, dir) =>
      graft.ops.Relational.ordersPivot(Tables.table(s, dir, "orders"))),
    // SCD2 validity intervals from the per-user changelog (lead() in
    // the same window pass — no self-join)
    "events_scd2" -> ((s, dir) =>
      EventOps.scd2History(Tables.events(s, dir))),
    // point-in-time join: each click enriched with the purchase-dim
    // VERSION valid at its ts (union-window, one shuffle); the oracle
    // re-states it as an explicit interval-containment join
    "events_pit_join" -> ((s, dir) =>
      EventOps.pitScd2Join(Tables.events(s, dir))),
    // record linkage: blocked Levenshtein fuzzy join over part names —
    // integer-exact DP in both engines, candidates never all-pairs
    "dedup_editdist" -> ((s, dir) =>
      Dedup.editDistancePairs(Tables.table(s, dir, "part"))),
    // truncation observability for the editdist hard per-block cap:
    // per-block distinct-name counts + the cap-fired flag
    "dedup_editdist_blocks" -> ((s, dir) =>
      Dedup.editDistanceBlockStats(Tables.table(s, dir, "part"))),
    // fixed-superstep PageRank over the symmetrized supplier↔part
    // bipartite graph — the iterative-graph-analytics family (CC's
    // scoring sibling), integer-grid sums keep every superstep
    // hash-exact against 3 unrolled oracle CTEs
    "graph_pagerank" -> ((s, dir) =>
      graft.ops.GraphOps.supplierPartRank(Tables.table(s, dir, "lineitem"))),
    // personalized PageRank: teleport mass restricted to the supplier
    // seed set (even node ids) — seed-proximity ranking, same deg-
    // prefolded lazy loop and long grid sums as graph_pagerank
    "graph_ppr" -> ((s, dir) =>
      graft.ops.GraphOps.supplierPartPPR(Tables.table(s, dir, "lineitem"))),
    // per-node triangle counts over the support-filtered co-order part
    // graph (degree-oriented node-iterator — wedge fan-out capped √|E|).
    // r15: the support threshold scales with the corpus's pair
    // duplication factor (integer staircase, both engines derive it
    // from their own counts) — fixed support 2 stopped pruning at sf10
    // and the wedge join went |E|^1.5 (6.2→192.5 s for 10× data)
    "graph_triangles" -> ((s, dir) =>
      graft.ops.GraphOps.coOrderTrianglesAuto(Tables.table(s, dir, "lineitem"))),
    // multi-source BFS hop distances (Bellman-Ford unit-weight
    // relaxation) — integer-exact supersteps, frontier-sized state
    "graph_bfs" -> ((s, dir) =>
      graft.ops.GraphOps.supplierPartBfs(Tables.table(s, dir, "lineitem"))),
    // k-core peeling (dense-subgraph extractor): fixed peel supersteps,
    // integer-only, edge set only shrinks — unrolled-CTE oracle
    "graph_kcore" -> ((s, dir) =>
      graft.ops.GraphOps.supplierPartKCore(Tables.table(s, dir, "lineitem"))),
    // synchronous label propagation: neighbor-majority communities,
    // (cnt DESC, label ASC) argmax — integer-exact fixed supersteps
    "graph_labelprop" -> ((s, dir) =>
      graft.ops.GraphOps.supplierPartLabelProp(Tables.table(s, dir, "lineitem"))),
    // Newman modularity of the LP communities — exact integer-rational
    // Q = (m·Σintra − Σd_c²)/m², one IEEE division at the end
    "graph_modularity" -> ((s, dir) =>
      graft.ops.GraphOps.supplierPartModularity(
        Tables.table(s, dir, "lineitem"))),
    // HITS hubs/authorities: coupled eigenvector supersteps on the
    // 1e6 integer grid with per-step max normalization
    "graph_hits" -> ((s, dir) =>
      graft.ops.GraphOps.supplierPartHits(Tables.table(s, dir, "lineitem"))),
    // TPC-H Q21 shape: double-correlated EXISTS/NOT EXISTS decorrelated
    // to one semi + one anti join over the deduped (order,supplier) pairs
    "waiting_suppliers" -> ((s, dir) =>
      graft.ops.Relational.waitingSuppliers(
        Tables.table(s, dir, "lineitem"), Tables.table(s, dir, "orders"),
        Tables.table(s, dir, "supplier"))),
    // TPC-H Q22 shape: scalar-avg subquery (broadcast 1-row frame) +
    // anti join on o_custkey, decimal-routed balance sums
    // Pareto/ABC customer segmentation via the scale-safe prefix fold
    "orders_pareto" -> ((s, dir) =>
      graft.ops.Relational.paretoAbc(Tables.table(s, dir, "orders"))),
    // RFM segmentation: rank-quintile scores via chained prefix folds
    "orders_rfm" -> ((s, dir) =>
      graft.ops.Relational.rfmSegments(Tables.table(s, dir, "orders"))),
    // Gini coefficient of revenue concentration (exact rank formula)
    "orders_gini" -> ((s, dir) =>
      graft.ops.Relational.giniRevenue(Tables.table(s, dir, "orders"))),
    "debtor_segments" -> ((s, dir) =>
      graft.ops.Relational.debtorSegments(
        Tables.table(s, dir, "customer"), Tables.table(s, dir, "orders"))),
    // Deequ-style constraint suite: every single-table metric from ONE
    // scan+agg (stack-unpivoted), plus two FK anti-join counts
    "dq_orders" -> ((s, dir) =>
      graft.ops.DataQuality.ordersChecks(
        Tables.table(s, dir, "orders"), Tables.table(s, dir, "customer"),
        Tables.table(s, dir, "lineitem"))),
    // the same suite shape over the corpus table (pre-ingest DQ gate)
    "dq_documents" -> ((s, dir) =>
      graft.ops.DataQuality.documentsChecks(
        Tables.table(s, dir, "documents"))),
    // join-key skew audit: top-key share + HHI per key family
    "dq_skew" -> ((s, dir) =>
      graft.ops.DataQuality.keySkewReport(
        Tables.events(s, dir), Tables.table(s, dir, "lineitem"),
        Tables.table(s, dir, "orders"), Tables.table(s, dir, "documents"))),
    // blocked entity resolution: suffix+nation blocking join, edit-
    // distance scoring, best-match-per-row via TopKPerKey (k=1)
    "er_match" -> ((s, dir) =>
      graft.ops.EntityResolution.matchCustomers(
        Tables.table(s, dir, "customer"))),
    // association rules (2-itemset stage): top-k co-order pairs by
    // exact-integer lift, support-floor pruned, TakeOrdered
    "basket_lift" -> ((s, dir) =>
      graft.ops.GraphOps.basketLift(Tables.table(s, dir, "lineitem"))),
    // bloom-prefiltered exact semi join: big-side rows die at the scan
    // stage before the join exchange; result exact regardless of fpp
    "bloom_semi" -> ((s, dir) =>
      graft.ops.BloomJoin.bloomSemiJoin(
        Tables.table(s, dir, "lineitem"),
        Tables.table(s, dir, "orders")
          .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT"),
        "l_orderkey", "o_orderkey", expectedItems = 20000L)),
    // salted two-stage aggregation — identical result to the plain
    // groupBy (decimal sums → order-independent), hot keys spread over
    // saltFactor reducers
    "skew_salted_agg" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val ev = Tables.events(s, dir).withColumn("v",
        col("value").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
      graft.ops.Skew.saltedAgg(ev, "event_type", saltFactor = 8, sums = Seq("v"))
        .select(col("event_type"), col("cnt"),
          col("sum_v").cast("double").as("sum_value"))
    }),
    "events_retention" -> ((s, dir) => EventOps.weeklyRetention(Tables.events(s, dir))),
    // CDC compaction: changelog -> one current-state row per user
    "events_latest" -> ((s, dir) => EventOps.latestState(Tables.events(s, dir))),
    // trailing ROWS + 1-hour RANGE moving aggregates in one window pass
    "events_moving" -> ((s, dir) => EventOps.movingStats(Tables.events(s, dir))),
    // per-type OLS drift: one sufficient-statistics agg, exact integer
    // numerators (HUGEINT twin), float only at the final divisions
    "events_trend" -> ((s, dir) => EventOps.typeTrend(Tables.events(s, dir))),
    // hourly grid resample: gap-fill to a dense per-type spine + LOCF
    // forward fill — spine is time-bounded, not data-bounded
    "events_resample" -> ((s, dir) =>
      EventOps.resampleHourly(Tables.events(s, dir))),
    // CDC changeset between two trailing-window state snapshots:
    // inserted / deleted / changed keyed rows, unchanged filtered
    "events_snapshot_diff" -> ((s, dir) =>
      EventOps.snapshotDiff(Tables.events(s, dir))),
    // hashing-trick sparse feature vectors: fixed dim-sized space, ±1
    // sign hash, one (doc, idx) agg — no vocabulary pass at any scale
    "text_hashed_features" -> ((s, dir) =>
      TextOps.hashedFeatures(Tables.table(s, dir, "documents"))),
    // equal-frequency NTILE discretizer with a deterministic tiebreak:
    // per-type deciles in one window pass
    "events_deciles" -> ((s, dir) =>
      EventOps.valueDeciles(Tables.events(s, dir))),
    // deterministic SGNS negative sampling: k draws per top skipgram
    // pair from unigram^0.75 (sqrt∘sqrt — IEEE-exact, no libm pow),
    // inverse-CDF via integer-bucketed equi join, zero randomness
    "text_sgns_negatives" -> ((s, dir) =>
      TextOps.sgnsNegatives(Tables.table(s, dir, "documents"))),
    // first-order Markov transition matrix over per-user sequences:
    // P(next type | current type) — one user shuffle, |types|² agg
    "events_transitions" -> ((s, dir) =>
      EventOps.transitions(Tables.events(s, dir))),
    // hourly-count autocorrelation at lags 1 and 24 — the seasonality
    // detector; exact integer sufficient statistics, IEEE-only floats
    "events_autocorr" -> ((s, dir) =>
      EventOps.hourlyAutocorr(Tables.events(s, dir))),
    // full Pearson correlation matrix in ONE scan / ONE 1-row agg:
    // all k(k+3)/2 sufficient statistics accumulate together, floats
    // only at the final ratio (sqrt is IEEE-exact, not libm)
    // chi-square independence: order priority vs order year — the
    // distribution-shift test; exact-integer numerators, grid-snapped sum
    "orders_chisq" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, year}
      graft.ops.StatsOps.chiSquare(Tables.table(s, dir, "orders"),
        col("o_orderpriority"), year(col("o_orderdate")))
    }),
    "corr_matrix" -> ((s, dir) =>
      graft.ops.StatsOps.corrMatrix(
        Tables.table(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),
    // exact tie-corrected Mann-Whitney AUC: does doc length separate
    // English from non-English? (classifier-eval primitive; integer
    // scores force heavy tie handling through both engines)
    // Benford first-digit screen on order totals — log-free digit
    // extraction via the exact cents grid; portable-ln expectations
    "orders_benford" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.ops.StatsOps.benford(Tables.table(s, dir, "orders"),
        col("o_totalprice"))
    }),
    "quality_auc" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.ops.StatsOps.aucExact(Tables.table(s, dir, "documents"),
        col("n_chars"), col("lang") === "en")
    }),
    // split-conformal calibration threshold + held-out coverage
    "quality_conformal" -> ((s, dir) =>
      graft.ops.StatsOps.conformal(
        TextOps.nbScore(Tables.table(s, dir, "documents")))),
    // precision-recall curve of the NB scorer at every margin threshold
    "quality_pr_curve" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.ops.StatsOps.prCurve(
        TextOps.nbScore(Tables.table(s, dir, "documents")),
        col("margin"), col("is_en"))
    }),
    // naive-Bayes quality classifier trained on even doc_ids, scored
    // on the held-out odd split — portable-ln weights, grid-snapped sums
    "text_nb_score" -> ((s, dir) =>
      TextOps.nbScore(Tables.table(s, dir, "documents"))),
    // reliability bins over the NB margins: positive fraction per
    // fixed half-unit margin bin (threshold-placement diagnostic)
    "text_nb_calibration" -> ((s, dir) =>
      TextOps.nbCalibration(Tables.table(s, dir, "documents"))),
    // confusion counts + precision/recall/F1 on the held-out split
    "text_nb_confusion" -> ((s, dir) =>
      TextOps.nbConfusion(Tables.table(s, dir, "documents"))),
    // proper calibration metrics via the portable sigmoid/softplus:
    // 10-bin ECE, Brier score, log-loss — all on the 1e12 integer grid
    "text_nb_ece" -> ((s, dir) =>
      TextOps.nbEce(Tables.table(s, dir, "documents"))),
    // pure-BIGINT per-doc margin dump — pinpoints any cross-engine NB
    // divergence to the doc and exact grid delta (no doubles at all)
    "text_nb_margins" -> ((s, dir) =>
      TextOps.nbMargins(Tables.table(s, dir, "documents"))),
    // fresh-name twins of the three r11/r12 driver-divergent queries
    // (identical impls): bust any stale per-query dump keyed by name
    "text_nb_calib2" -> ((s, dir) =>
      TextOps.nbCalibration(Tables.table(s, dir, "documents"))),
    "text_nb_conf2" -> ((s, dir) =>
      TextOps.nbConfusion(Tables.table(s, dir, "documents"))),
    "text_nb_ece2" -> ((s, dir) =>
      TextOps.nbEce(Tables.table(s, dir, "documents"))),
    // per-doc top-3 tf-idf keyphrases through TopKPerKey (no Window,
    // no per-doc sort of the posting relation)
    "text_keyphrases" -> ((s, dir) =>
      graft.ops.RetrievalOps.keyphrases(Tables.table(s, dir, "documents"))),
    // kNN majority-vote label transfer over the LSH-blocked knn graph;
    // both the per-source top-k and the vote argmax run through the
    // custom TopKPerKey physical operator (no Window, no per-group sort)
    "emb_knn_classify" -> ((s, dir) =>
      graft.ops.EmbeddingOps.knnClassifyAuto(
        Tables.table(s, dir, "embeddings"))),
    // nearest-centroid (Rocchio) classification: grid-exact per-label
    // mean embeddings broadcast, zero-shuffle distance scoring
    "emb_centroid_classify" -> ((s, dir) =>
      graft.ops.EmbeddingOps.centroidClassify(
        Tables.table(s, dir, "embeddings"))),
    // 2-D Pareto skyline of the points relation — sort-free dominance
    // via per-distinct-x max + running max over x DESC
    "points_skyline" -> ((s, dir) =>
      graft.ops.Relational.skyline(Tables.points(s, dir))),
    // one-scan column profiler over documents: per-column rows / nulls
    // / exact distinct / lexicographic min+max through a canonical
    // string cast (exact countDistinct is the oracle-able stand-in
    // for the approx_count_distinct a 100 TB run would use)
    "profile_docs" -> ((s, dir) =>
      graft.ops.ProfileOps.profile(
        Tables.table(s, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars"))),
    // the computed datasheet: corpus totals, exact-dup rate, lang and
    // source composition shares, token-length stats — one tall
    // (metric, value) relation per release
    "corpus_datacard" -> ((s, dir) =>
      graft.ops.ProfileOps.datacard(Tables.table(s, dir, "documents"))),
    // Z-order (Morton) layout address for the 2-D points relation —
    // pure integer bit math, the data-layout half is Layout.zOrdered
    "points_zorder" -> ((s, dir) =>
      graft.ops.Layout.pointsZOrder(Tables.points(s, dir))),
    // Corpus shaping: context-window chunking, sequence packing,
    // PII scrub (planted-PII twin — the testdata has none by construction)
    "doc_chunks" -> ((s, dir) =>
      graft.ops.PretrainOps.chunkDocs(Tables.table(s, dir, "documents"))),
    // packing efficiency: bins, utilization, boundary-straddle rate
    "seq_pack_stats" -> ((s, dir) =>
      graft.ops.PretrainOps.packStats(Tables.table(s, dir, "documents"))),
    "seq_pack" -> ((s, dir) =>
      graft.ops.PretrainOps.packSequences(Tables.table(s, dir, "documents"))),
    "pii_scrub" -> ((s, dir) =>
      graft.ops.PretrainOps.scrubPlanted(Tables.table(s, dir, "documents"))),
    // k-anonymity equivalence-class census over (lang, source, length
    // bucket) — the residual quasi-identifier risk audit next to scrub
    "pii_kanon" -> ((s, dir) =>
      graft.ops.PretrainOps.kAnonymityCensus(Tables.table(s, dir, "documents"))),
    // the full shaping composition: scrub -> chunk -> pack in one plan
    "pipeline_sequences" -> ((s, dir) =>
      graft.ops.PretrainOps.makeSequences(Tables.table(s, dir, "documents"))),
    // Composed curation pipeline + window-function surface
    // curation yield funnel: docs + tokens surviving each gate
    "pipeline_funnel" -> ((s, dir) =>
      graft.ops.CuratePipeline.funnel(Tables.table(s, dir, "documents"))),
    // per-split contamination summary (any-overlap and heavy tiers)
    "pipeline_decontam_summary" -> ((s, dir) =>
      graft.ops.CuratePipeline.decontamSummary(
        Tables.table(s, dir, "documents"))),
    "pipeline_curate" -> ((s, dir) =>
      graft.ops.CuratePipeline.curate(Tables.table(s, dir, "documents"))),
    // the full pre-training composition: curate -> near-dup removal ->
    // deterministic split assignment
    "pipeline_pretrain" -> ((s, dir) =>
      graft.ops.CuratePipeline.pretrain(Tables.table(s, dir, "documents"))),
    // ...and its shaping tail: the train split scrubbed, chunked, and
    // packed into training sequences — raw corpus to model-ready in one plan
    "pipeline_pretrain_seqs" -> ((s, dir) =>
      graft.ops.CuratePipeline.pretrainSequences(Tables.table(s, dir, "documents"))),
    // eval-set contamination check: non-train docs sharing n-grams with train
    "pipeline_decontam" -> ((s, dir) =>
      graft.ops.CuratePipeline.decontaminate(Tables.table(s, dir, "documents"))),
    // learn-then-filter: bottom-decile LM-score cutoff computed from the
    // corpus's own distribution (fixed-bin quantile), applied in-plan
    "pipe_quality" -> ((s, dir) =>
      graft.ops.CuratePipeline.qualityFilter(Tables.table(s, dir, "documents"))),
    "text_top_tokens" -> ((s, dir) =>
      graft.ops.CuratePipeline.topTokensPerLang(Tables.table(s, dir, "documents"))),
    // topic clustering: hashed tf features -> 3 Lloyd supersteps ->
    // per-doc cluster id + centrality score (curation-by-cluster)
    "docs_cluster" -> ((s, dir) =>
      graft.ops.TopicCluster.cluster(Tables.table(s, dir, "documents"))),
    // chance-corrected agreement of unsupervised topics vs gold langs
    "docs_cluster_ari" -> ((s, dir) =>
      graft.ops.TopicCluster.clusterAri(Tables.table(s, dir, "documents"))),
    // information-theoretic agreement (read WITH the ARI)
    "docs_cluster_nmi" -> ((s, dir) =>
      graft.ops.TopicCluster.clusterNmi(Tables.table(s, dir, "documents"))),
    // c-TF-IDF keywords per topic cluster (BERTopic-style labels) via
    // the bounded-heap TopKPerKey operator
    "docs_cluster_terms" -> ((s, dir) =>
      graft.ops.TopicCluster.clusterTerms(Tables.table(s, dir, "documents"))),
    // N-dimensional k-means over embeddings (declarative oracle path)
    "kmeansnd_assign" -> ((s, dir) => {
      val vecs = graft.ops.IvfIndex.vectors(Tables.table(s, dir, "embeddings"))
      val cents = Tables.centsNDDF(s, kmeans.KMeansND.initFromLowestIds(vecs, K))
      kmeans.KMeansND.assign(vecs, cents)
    }),
    "kmeansnd_step" -> ((s, dir) => {
      val vecs = graft.ops.IvfIndex.vectors(Tables.table(s, dir, "embeddings"))
      val cents = Tables.centsNDDF(s, kmeans.KMeansND.initFromLowestIds(vecs, K))
      kmeans.KMeansND.recomputeFlat(vecs, kmeans.KMeansND.assign(vecs, cents))
    }),
    // IVF ANN: k-means coarse quantizer + probed exact rescore.
    // convergence=false → exactly 5 Lloyd steps, no data-dependent
    // early exit, so the whole search (build included) is oracle-checked
    // against a chained-CTE DuckDB twin (IvfIndex.ivfTopKSql).
    // recall@k curve of the IVF probe vs brute-force truth, one row
    // per nprobe — the tuning eval before trusting the index at scale
    "emb_ann_recall" -> ((s, dir) =>
      graft.ops.IvfIndex.annRecall(s, Tables.table(s, dir, "embeddings"))),
    "ivf_topk" -> ((s, dir) => {
      val embs = Tables.table(s, dir, "embeddings")
      val idx = graft.ops.IvfIndex.build(embs, nlist = 16, maxIter = 5,
        convergence = false)
      val q = graft.ops.IvfIndex.vectors(embs)
        .filter(org.apache.spark.sql.functions.col("id") === 0L)
        .collect()(0).getSeq[Double](1)
      graft.ops.IvfIndex.search(s, idx, q, k = 10, nprobe = 4)
    }),
    // The production IVF shape: the same fixed-iteration build persisted
    // as a list_id-partitioned parquet index, then probed through
    // readIndex — the probe is a partition-pruned scan of nprobe/nlist
    // of the data. The parquet round-trip is exact (doubles), so the
    // result — and therefore the oracle — is identical to ivf_topk's.
    // SQ8 persisted-index probe: codes written once (1 int/dim vs the
    // raw vector bytes), probe reads ONLY codes + the d-row grid —
    // completes the _indexed production-probe family (ivf/pq/ivfpq)
    "emb_sq8_topk_indexed" -> ((s, dir) => {
      val embs = Tables.table(s, dir, "embeddings")
      val path = "target/sq8_index_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      graft.ops.QuantOps.writeSq8Index(embs, path)
      val q = embs
        .filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
        .select(org.apache.spark.sql.functions.col("embedding")
          .cast("array<double>"))
        .collect()(0).getSeq[Double](0)
      graft.ops.QuantOps.searchSq8Index(s, path, q, queryId = 0L, k = 10)
    }),
    "ivf_topk_indexed" -> ((s, dir) => {
      val embs = Tables.table(s, dir, "embeddings")
      val built = graft.ops.IvfIndex.build(embs, nlist = 16, maxIter = 5,
        convergence = false)
      val path = "target/ivf_index_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      graft.ops.IvfIndex.writeIndex(built, path)
      val q = graft.ops.IvfIndex.vectors(embs)
        .filter(org.apache.spark.sql.functions.col("id") === 0L)
        .collect()(0).getSeq[Double](1)
      val idx = graft.ops.IvfIndex.readIndex(s, path, built.centroids)
      graft.ops.IvfIndex.search(s, idx, q, k = 10, nprobe = 4)
    }),
    // Product quantization ANN: per-subspace fixed-iteration codebooks,
    // asymmetric-distance top-k — train→encode→ADC fully oracle-checked
    // (same unrolling recipe as ivf_topk)
    // PQ fidelity report: per-subspace + total quantization MSE
    "pq_distortion" -> ((s, dir) =>
      graft.ops.PqIndex.pqDistortion(Tables.table(s, dir, "embeddings"))),
    // r16: the registered default is PQ + REFINE (FAISS
    // IndexRefineFlat): ADC shortlist of k*50, exact rescore of only
    // those raw vectors — pure ADC at m=4/nlist=16 had recall 0.0 at
    // sf0.1; the ADC-only probe path stays covered by pq_topk_indexed
    "pq_topk" -> ((s, dir) =>
      graft.ops.PqIndex.pqTopKRefined(Tables.table(s, dir, "embeddings"))),
    // the production PQ shape: codes + codebooks persisted once, the
    // probe reads ONLY the m-bytes-per-vector codes table; parquet
    // round-trip is exact, so pqTopKSql is its oracle too
    "pq_topk_indexed" -> ((s, dir) => {
      val embs = Tables.table(s, dir, "embeddings")
      val vecs = graft.ops.IvfIndex.vectors(embs)
      val cb = graft.ops.PqIndex.train(vecs, m = 4, nlist = 16, maxIter = 3)
      val path = "target/pq_index_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      graft.ops.PqIndex.writeIndex(vecs, cb, path)
      val q = vecs.filter(org.apache.spark.sql.functions.col("id") === 0L)
        .collect()(0).getSeq[Double](1)
      graft.ops.PqIndex.searchIndex(s, path, q, k = 10)
    }),
    // IVFADC — the composed production ANN (Jégou 2011 §IV): coarse
    // inverted lists prune to nprobe/nlistC, PQ codes trained on
    // RESIDUALS answer the asymmetric distance inside the probed
    // lists. Fixed-iteration builds → the whole pipeline is one
    // DuckDB-unrollable plan (PqIndex.ivfPqTopKSql).
    // r16: the registered default probes 4 lists and refines a k*20
    // ADC shortlist against the raw vectors (recall 0.2 -> 1.0 at
    // sf0.1); the unrefined ADC probe stays covered by
    // ivfpq_topk_indexed, and ivfpq_topk_refined keeps the historic
    // kf4/np2 point for cross-round comparability
    "ivfpq_topk" -> ((s, dir) =>
      graft.ops.PqIndex.ivfPqTopKRefined(Tables.table(s, dir, "embeddings"),
        nprobe = 4, kFactor = 20)),
    // the production shape: codes persisted partitioned by list_id, so
    // the probe is a partition-pruned scan of nprobe/nlistC of the
    // m-byte codes; parquet round-trip is exact → same oracle
    // IVFADC + refine (FAISS IndexRefineFlat pattern): ADC shortlist
    // k·4, exact rescore of only those raw vectors — recall@10 vs
    // exact L2 goes 0.2 → 1.0 on the AnnBench clustered fixture
    "ivfpq_topk_refined" -> ((s, dir) =>
      graft.ops.PqIndex.ivfPqTopKRefined(Tables.table(s, dir, "embeddings"))),
    "ivfpq_topk_indexed" -> ((s, dir) => {
      val embs = Tables.table(s, dir, "embeddings")
      val path = "target/ivfpq_index_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      graft.ops.PqIndex.writeIvfPqIndex(embs, nlistC = 8, maxIterC = 3,
        m = 4, nlist = 16, maxIter = 3, path)
      val q = graft.ops.IvfIndex.vectors(embs)
        .filter(org.apache.spark.sql.functions.col("id") === 0L)
        .head().getSeq[Double](1)
      graft.ops.PqIndex.searchIvfPqIndex(s, path, q, k = 10, nprobe = 2)
    }),
    // Multimodal binary-column plumbing (decode stubbed, plumbing real)
    "mm_summary" -> ((s, dir) =>
      Multimodal.mediaSummary(Multimodal.mediaFromDocuments(Tables.table(s, dir, "documents")))),
    // binary-payload exact dedup: only the 16-byte digest shuffles,
    // never the blob — the asset-dedup pass before any decode
    "mm_dedup" -> ((s, dir) =>
      Multimodal.mediaDedup(Multimodal.mediaFromDocuments(Tables.table(s, dir, "documents")))),
    // the float32 stub-decode math, flattened to one row per feature
    // component and fully oracle-checked (DuckDB FLOAT division is
    // bit-exact IEEE float32; see Multimodal.featuresFlatSql)
    "mm_features_full" -> ((s, dir) =>
      Multimodal.featuresFlat(
        Multimodal.mediaFromDocuments(Tables.table(s, dir, "documents")))),
    // box-downsample resize (stub codec, real bin math + plumbing)
    "mm_resize" -> ((s, dir) =>
      Multimodal.resizeFlat(
        Multimodal.mediaFromDocuments(Tables.table(s, dir, "documents")))),
    // REAL codec (javax.imageio PNG): render→encode→decode→channel
    // sums in one partition-batched pass; output is closed-form in
    // doc_id (PNG is lossless) so the REAL decode is hash-gated
    "mm_decode_real" -> ((s, dir) =>
      Multimodal.pngRoundtripSums(Tables.table(s, dir, "documents"))),
    // perceptual dHash of the real decoded PNG (9x8 grid, cross-
    // multiplied brightness compares) vs the closed-form pixel twin
    "mm_phash" -> ((s, dir) =>
      Multimodal.pngDHash(Tables.table(s, dir, "documents"))),
    // visually-near-duplicate image pairs (pigeonhole chunk join)
    "mm_phash_pairs" -> ((s, dir) =>
      Multimodal.phashNearDups(Tables.table(s, dir, "documents"))),
    // visual dedup GROUPS: min-label connected components over the
    // phash pair graph — the media face of dedup_groups (same CC
    // operator, so transitivity across hamming chains is handled)
    "mm_phash_groups" -> ((s, dir) =>
      Dedup.connectedComponents(
        Multimodal.phashNearDups(Tables.table(s, dir, "documents"))
          .select(org.apache.spark.sql.functions.col("da"),
            org.apache.spark.sql.functions.col("db")))),
    // frame bytes hex-encoded for the oracle compare (raw BLOBs crash
    // the harness's sort on the oracle side)
    "mm_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.mediaFromDocuments(Tables.table(s, dir, "documents")))
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("frame_idx"),
          org.apache.spark.sql.functions.hex(
            org.apache.spark.sql.functions.col("frame")).as("frame_hex"))),

    // ---- Structured Streaming, driven end-to-end --------------------
    // Each runs the REAL streaming engine (readStream parquet source →
    // stateful transform → Trigger.AvailableNow → sink) and returns the
    // final sink table, so the streaming execution path itself sits
    // under the same DuckDB oracle as the batch operators rather than
    // only under ScalaTest twins.
    "stream_hourly_agg" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.streaming.StreamOps.runAvailableNow(
        graft.streaming.StreamOps.windowedTypeAgg(
          graft.streaming.StreamOps.readEventStream(s, dir)),
        org.apache.spark.sql.streaming.OutputMode.Complete())
        .select(col("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
    }),
    "stream_sliding_agg" -> ((s, dir) =>
      graft.streaming.StreamOps.runAvailableNow(
        graft.streaming.StreamOps.slidingTypeAgg(
          graft.streaming.StreamOps.readEventStream(s, dir),
          windowLen = "1 hour", slide = "30 minutes"),
        org.apache.spark.sql.streaming.OutputMode.Complete())),
    // streaming top-k: the windowed type counts accumulate in the
    // stream's state store; the top-3-per-window rank happens at READ
    // time over the sink — the serving pattern for "trending now"
    // dashboards (rank the materialized state, never rank inside the
    // stream where retraction would be needed)
    "stream_topk" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, row_number}
      val agg = graft.streaming.StreamOps.runAvailableNow(
        graft.streaming.StreamOps.windowedTypeAgg(
          graft.streaming.StreamOps.readEventStream(s, dir)),
        org.apache.spark.sql.streaming.OutputMode.Complete())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("window_start")
        .orderBy(col("n_events").desc, col("event_type").asc)
      agg.select(col("window_start"), col("event_type"), col("n_events"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
    }),
    // built-in session_window aggregation run as a stream (Complete
    // mode — the engine's session-window state store does the gap
    // merging; the sink is the final merged session set)
    "stream_sessionize" -> ((s, dir) =>
      graft.streaming.StreamOps.runAvailableNow(
        graft.streaming.StreamOps.sessionWindowAgg(
          graft.streaming.StreamOps.readEventStream(s, dir)),
        org.apache.spark.sql.streaming.OutputMode.Complete())),
    // stateless stream-static enrichment: broadcast dim join, append
    // mode — every arriving event emits exactly once, so the sink IS
    // the batch join result
    "stream_enrich" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val dim = Tables.table(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_name"),
          col("c_nationkey"), col("c_acctbal"))
      graft.streaming.StreamOps.runAvailableNow(
        graft.streaming.StreamOps.enrichStream(
          graft.streaming.StreamOps.readEventStream(s, dir), dim, "user_id"),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }),
    // streaming exact dedup: the event stream delivered TWICE (two
    // unioned file-source reads — the at-least-once re-delivery case),
    // watermarked dropDuplicates keeps the first arrival of each
    // (event_id, ts); the sink is exactly the distinct events relation
    "stream_dedup" -> ((s, dir) => {
      val a = graft.streaming.StreamOps.readEventStream(s, dir)
      val b = graft.streaming.StreamOps.readEventStream(s, dir)
      graft.streaming.StreamOps.runAvailableNow(
        graft.streaming.StreamOps.dedupStream(a.unionAll(b)),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }),
    // streaming face of dedup_exact: the corpus delivered TWICE,
    // same-TEXT docs collapsed by dropDuplicatesWithinWatermark on the
    // md5 digest (state-evicting dedup — bounded by the watermark
    // horizon, not corpus size); deterministic (digest, text) sink
    "stream_exact_dedup" -> ((s, dir) => {
      val a = Tables.table(s, dir, "documents")
      val schema = a.schema
      def rd = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      graft.streaming.StreamOps.runAvailableNow(
        graft.streaming.StreamOps.exactDedupStream(rd.unionAll(rd)),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }),
    // STREAM-STREAM event-time range join (view→click attribution):
    // both sides watermarked, the join condition bounds the click ts
    // from both directions so stream state is window-bounded. The
    // AvailableNow single-batch replay makes the sink exactly the
    // batch range join the oracle computes.
    "stream_attribute" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.streaming.StreamOps.runAvailableNow(
        graft.streaming.StreamOps.attributeStream(
          graft.streaming.StreamOps.readEventStream(s, dir)
            .filter(col("event_type") === "view"),
          graft.streaming.StreamOps.readEventStream(s, dir)
            .filter(col("event_type") === "click")),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }),
    // flatMapGroupsWithState CDC compaction run as a stream; update-mode
    // sink rows are per-batch state emissions, so the final state is the
    // per-user (ts, event_id) argmax over the sink — one k-row agg
    "stream_latest" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, max, struct}
      import s.implicits._
      val src = graft.streaming.StreamOps.readEventStream(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .as[graft.streaming.StreamOps.EvKeyed]
      graft.streaming.StreamOps.runAvailableNow(
        graft.streaming.StreamOps.latestStateStream(src).toDF(),
        org.apache.spark.sql.streaming.OutputMode.Update())
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("m.ts").as("ts"),
          col("m.event_id").as("event_id"), col("m.value").as("value"))
    }),
    // transformWithState (the Spark 4 stateful API): per-user running
    // sequence numbers, replayed AvailableNow — equal to the batch
    // ROW_NUMBER twin. The API requires the RocksDB state store
    // provider; set on a CLONED session (shared SparkContext, private
    // SQLConf) so a streaming query started concurrently in the parent
    // session never sees the provider swap (r14 advice — the previous
    // set/restore on the shared conf was safe only because the gate
    // driver runs queries sequentially).
    "stream_seqnum" -> ((s, dir) => {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming." +
          "state.RocksDBStateStoreProvider")
      graft.streaming.StreamOps.runAvailableNow(
        graft.streaming.StreamOps.seqNumStream(
          graft.streaming.StreamOps.readEventStream(s2, dir)).toDF(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }),
    // transformWithState session labeling: per-event 1-based session
    // index under a 30-min inactivity gap — append-per-event output,
    // so the replay sink is batch-complete (unlike watermark-closed
    // session EMISSION); the 16-byte cursor state continues the index
    // across micro-batches. RocksDB provider scoped to a cloned
    // session, as above.
    "stream_sessions_tws" -> ((s, dir) => {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming." +
          "state.RocksDBStateStoreProvider")
      graft.streaming.StreamOps.runAvailableNow(
        graft.streaming.StreamOps.sessionTagStream(
          graft.streaming.StreamOps.readEventStream(s2, dir)).toDF(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every registered query has a twin (r12:
    * the engine-hash variants moved to [[benchOnly]], so no `no_oracle`
    * rows remain on the correctness board). */
  def oracleSql: Map[String, String] = Map(
    "scan_points" -> Tables.pointsSqlBody,
    "init_centroids" -> Tables.withPtsCents("SELECT cid, x, y FROM cents", K),
    "assign_nearest" -> Tables.withPtsCents(KMeansOps.assignSql(), K),
    "assign_join" -> Tables.withPtsCents(KMeansOps.assignSql(), K),
    "count_append" -> withAssigned("SELECT pid, cid, CAST(1 AS BIGINT) AS cnt FROM assigned"),
    "sum_count_agg" -> withAssigned(KMeansOps.sumCountSql("assigned")),
    "kmeans_step" -> Tables.withPtsCents(KMeansOps.stepSql("pts", "cents"), K),
    "kmeans_silhouette" ->
      Tables.withPtsCents(KMeansOps.silhouetteSql("pts", "cents"), K),
    "objective_sqdist" -> withAssigned("SELECT pid, sqdist FROM assigned"),
    "objective_sum" -> withAssigned(KMeansOps.objectiveSql("assigned")),
    "converge_pairs" -> withAssigned(
      s""", newc AS (${KMeansOps.recomputeSql("assigned")})
         |SELECT n.cid, n.x AS nx, n.y AS ny, c.x AS ox, c.y AS oy
         |FROM newc n JOIN cents c ON n.cid = c.cid""".stripMargin),
    "converge_filter" -> withAssigned(
      s""", newc AS (${KMeansOps.recomputeSql("assigned")})
         |SELECT n.cid, n.x AS nx, n.y AS ny, c.x AS ox, c.y AS oy
         |FROM newc n JOIN cents c ON n.cid = c.cid
         |WHERE SQRT((n.x-c.x)*(n.x-c.x) + (n.y-c.y)*(n.y-c.y)) > 1.0""".stripMargin),
    "kmeans_fit10_obj" -> fitObjectiveSql(10),
    // the CSV round trips are value-exact, so the originals are the oracles
    "csv_roundtrip" -> Tables.pointsSqlBody,
    "csv_rt_cents" ->
      Tables.withPtsCents(KMeansOps.stepSql("pts", "cents"), K),

    // ----- LLM-data-pipeline twins -----
    "text_tokens" -> TextOps.tokenCountsSql,
    "text_quality" -> TextOps.qualityScoreSql,
    "text_readability" -> TextOps.readabilitySql,
    "text_lang_mix" -> TextOps.langMixSql,
    "text_langid" -> TextOps.langIdSql,
    "text_langid_eval" -> TextOps.langIdEvalSql,
    "text_textrank" ->
      graft.ops.OracleCtes.materialize(TextOps.textRankSql()),
    "text_llr" -> graft.ops.OracleCtes.materialize(TextOps.llrTopKSql()),
    "text_burstiness" -> TextOps.burstinessSql(),
    "text_heaps" -> graft.ops.OracleCtes.materialize(TextOps.heapsFitSql()),
    "text_token_stats" -> TextOps.tokenStatsSql,
    "text_zipf" -> TextOps.zipfSlopeSql(),
    "text_fingerprint" -> TextOps.fingerprintsSql,
    "text_nfc" -> TextOps.nfcNormalizedSql,
    "source_wilson" -> TextOps.sourceQualityWilsonSql(),
    "events_psi" -> EventOps.psiDriftSql(),
    "corpus_budget" -> TextOps.budgetSelectSql,
    "source_bt" -> graft.ops.Preference.bradleyTerrySql,
    "events_kmv_overlap" -> EventOps.kmvOverlapSql(),
    "graph_clustering" -> graft.ops.OracleCtes.materialize(
      graft.ops.GraphOps.coOrderClusteringAutoSql()),
    "init_kmeanspp" -> KMeansOps.kmeansPlusPlusSql(),
    "text_heavy_hitters" -> graft.ops.HeavyHitters.heavyHittersSql(),
    "text_winnow" -> graft.ops.Winnow.censusSql(),
    "dedup_winnow" -> graft.ops.Winnow.pairsSql(),
    "dedup_winnow_excluded" -> graft.ops.Winnow.excludedSql(),
    "init_kmeansbb" -> graft.kmeans.KMeansParallel.candidatesSql(),
    "init_kmeansbb_final" -> graft.kmeans.KMeansParallel.finalCentersSql(),
    "graph_cc" -> graft.ops.GraphOps.coOrderComponentsSql(),
    "sample_bootstrap" -> graft.ops.Sampling.bootstrapWeightsSql(),
    "sample_coreset" -> withAssigned(
      s", tot AS (${KMeansOps.objectiveSql("assigned")}) " +
        graft.ops.Sampling.coresetSampleSql()),
    "events_dp_counts" -> EventOps.dpCountsSql(),
    "events_stationary" -> EventOps.stationaryDistributionSql(),
    "events_entropy_rate" -> EventOps.entropyRateSql(),
    "events_survival" -> graft.ops.OracleCtes.materialize(
      EventOps.survivalCurveSql),
    "events_attribution" -> EventOps.attributionCreditsSql,
    "events_forecast" -> EventOps.sesForecastSql(),
    "events_rank_suite" -> EventOps.rankSuiteSql,
    "graph_linkpred" -> graft.ops.OracleCtes.materialize(
      graft.ops.GraphOps.coOrderLinkPredictionSql()),
    "graph_assortativity" -> graft.ops.OracleCtes.materialize(
      graft.ops.GraphOps.coOrderAssortativitySql()),
    "events_ab_ttest" -> graft.ops.StatsOps.welchTTestSql(
      "events", "value", "event_type", "click", "view"),
    "pipe_ensemble" -> graft.ops.OracleCtes.materialize(
      TextOps.ensembleGateSql),
    "text_fertility" -> TextOps.tokenizerFertilitySql,
    "text_logreg" -> TextOps.logregScoreSql(),
    "text_repetition" -> TextOps.repetitionStatsSql,
    "text_gopher_rep" -> TextOps.gopherRepetitionSql,
    "rank_eval" -> graft.ops.RankEval.bm25EvalSql(),
    "text_tok_ids" -> TextOps.tokenizeIdsSql(),
    "text_lm_score" -> TextOps.lmScoreSql,
    "text_lm2_score" -> TextOps.lm2ScoreSql(),
    "text_kn_score" -> graft.ops.OracleCtes.materialize(TextOps.knScoreSql()),
    "text_ppl_buckets" ->
      graft.ops.OracleCtes.materialize(TextOps.pplBucketsSql()),
    "text_entropy" -> TextOps.tokenEntropySql,
    "text_znorm" -> TextOps.lengthZNormSql,
    "text_winsorize" -> TextOps.winsorizeSql(),
    "text_pmi" -> TextOps.pmiTopKSql(),
    "corpus_overlap" -> TextOps.sourceOverlapSql(),
    "text_bpe_pairs" -> TextOps.bpePairsSql(),
    "text_bpe_train" -> TextOps.bpeTrainSql(),
    "curriculum_order" ->
      TextOps.curriculumOrderSql(scoreLo = -3.7, scoreHi = -3.35),
    "text_skipgrams" -> TextOps.skipgramPairsSql(),
    "corpus_jsd" -> TextOps.corpusJsDivergenceSql,
    "dsir_weights" -> graft.ops.Dsir.importanceWeightsSql("src0"),
    "dsir_select" -> graft.ops.Dsir.selectSql("src0", 100),
    "dsir_ess" -> graft.ops.Dsir.essReportSql("src0"),
    "sample_ares" -> graft.ops.Sampling.aresSampleSql(256),
    "sample_ares_grouped" -> graft.ops.Sampling.aresSamplePerSourceSql(64),
    "sample_priority" -> graft.ops.Sampling.prioritySampleSql(100),
    "text_tfidf" -> graft.ops.RetrievalOps.tfidfSql,
    "text_cosine_pairs" -> graft.ops.RetrievalOps.cosinePairsSql(),
    "text_bm25_topk" -> graft.ops.RetrievalOps.bm25TopKSql(),
    "text_ql_topk" -> graft.ops.RetrievalOps.qlTopKSql(),
    "hybrid_rrf_topk" -> graft.ops.RetrievalOps.hybridRrfTopKSql(),
    "jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "orc_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "text_cms" -> TextOps.cmsEstimatesSql(CmsProbes),
    "text_gopher" -> TextOps.gopherFilterSql(),
    "dedup_exact" -> Dedup.exactSql,
    "dedup_incr" ->
      """SELECT d.doc_id, d.text FROM documents d
        |WHERE d.doc_id % 5 = 0 AND NOT EXISTS (
        |  SELECT 1 FROM documents h
        |  WHERE h.doc_id % 5 <> 0 AND h.text = d.text)""".stripMargin,
    "dedup_incr_near" -> graft.ops.OracleCtes.materialize(Dedup.dedupAgainstNearMd5Sql(
      id => s"$id % 5 <> 0", id => s"$id % 5 = 0")),
    "dedup_incr_indexed" -> graft.ops.OracleCtes.materialize(Dedup.dedupAgainstNearMd5Sql(
      id => s"$id % 5 <> 0", id => s"$id % 5 = 0")),
    "dedup_fingerprint" -> Dedup.exactByFingerprintSql,
    "dedup_digest" -> Dedup.exactByDigestSql,
    "dedup_spans" -> graft.ops.SpanDedup.dupSpansSql(),
    "dedup_cdc" -> Dedup.cdcChunkCensusSql(),
    "dedup_sentences" -> Dedup.sentenceCensusSql(),
    "dedup_trunc" -> Dedup.truncationPairsSql(),
    "dedup_trunc_blocks" -> Dedup.truncationGroupStatsSql(),
    "dedup_span_stats" -> graft.ops.SpanDedup.spanStatsSql(),
    "dedup_ngram_jaccard" -> graft.ops.OracleCtes.materialize(Dedup.ngramJaccardPairsSql()),
    "dedup_containment" -> graft.ops.OracleCtes.materialize(Dedup.ngramContainmentPairsSql()),
    "dedup_eval" -> graft.ops.OracleCtes.materialize(
      Dedup.minhashEvalAutoSql()),
    "dedup_eval_sampled" -> graft.ops.OracleCtes.materialize(
      Dedup.minhashEvalSampledSql()),
    "dedup_novelty" -> Dedup.noveltyCurveSql(),
    "dedup_source_matrix" -> graft.ops.OracleCtes.materialize(
      Dedup.sourceMatrixSql()),
    "dedup_threshold_curve" -> graft.ops.OracleCtes.materialize(
      Dedup.thresholdCurveSql()),
    "dedup_prefix_jaccard" -> graft.ops.OracleCtes.materialize(Dedup.prefixJaccardPairsSql()),
    "dedup_minhash" -> graft.ops.OracleCtes.materialize(Dedup.minhashNearDupsMd5Sql()),
    "dedup_bbit" -> graft.ops.OracleCtes.materialize(Dedup.bbitMinhashSql()),
    "dedup_weighted" ->
      graft.ops.OracleCtes.materialize(Dedup.weightedJaccardPairsSql()),
    "dedup_simhash" -> graft.ops.OracleCtes.materialize(Dedup.simhashNearDupsMd5Sql()),
    "dedup_semantic_pairs" -> graft.ops.OracleCtes.materialize(graft.ops.SemDedup.semanticNearDupsSql(tau = 0.4)),
    "dedup_semantic" -> graft.ops.OracleCtes.materialize(graft.ops.SemDedup.semanticDedupSql(tau = 0.4)),
    "sample_split" -> graft.ops.Sampling.splitAssignSql(),
    "split_leakage" -> graft.ops.Sampling.splitLeakageSql(
      trainBp = 5000, validBp = 2500, threshold = 0.5),
    "corpus_diff" -> graft.ops.SnapshotDiff.diffSql(),
    "corpus_mix" -> graft.ops.Sampling.weightedMixSql(mixWeights),
    "sample_stratified" -> graft.ops.Sampling.stratifiedSampleSql(stratRates),
    "sample_cap_stratum" -> graft.ops.Sampling.capPerStratumSql(n = 40),
    "dedup_groups" -> graft.ops.OracleCtes.materialize(Dedup.nearDupGroupsSql()),
    "dedup_corpus" -> graft.ops.OracleCtes.materialize(Dedup.dedupedCorpusSql()),
    "dedup_best" -> graft.ops.OracleCtes.materialize(Dedup.dedupKeepBestSql()),
    "mix_temp" -> graft.ops.Sampling.temperatureMixSql(),
    "emb_norms" -> EmbeddingOps.normsSql,
    "emb_pca_pc1" -> EmbeddingOps.pcaPc1Sql(),
    "emb_pca_project" -> EmbeddingOps.pcaProjectSql(),
    "emb_cosine_topk" -> EmbeddingOps.cosineTopKSql(),
    "emb_sq8_topk" -> graft.ops.QuantOps.sq8TopKSql(),
    "emb_hamming_topk" -> graft.ops.QuantOps.hammingTopKSql(),
    "emb_matryoshka_topk" -> graft.ops.QuantOps.matryoshkaTopKSql(),
    "emb_mmr_topk" -> EmbeddingOps.mmrTopKSql(),
    "emb_lsh_topk" -> graft.ops.OracleCtes.materialize(
      EmbeddingOps.lshTopKAutoSql()),
    "emb_rp_topk" -> EmbeddingOps.rpTopKAutoSql(),
    "emb_near_dups" -> graft.ops.OracleCtes.materialize(EmbeddingOps.cosineNearDupsSql()),
    "emb_incr" -> EmbeddingOps.dedupAgainstCosineSql(
      id => s"$id % 5 <> 0", id => s"$id % 5 = 0"),
    "emb_knn_graph" -> graft.ops.OracleCtes.materialize(
      EmbeddingOps.knnGraphAutoSql()),
    "emb_knn_graph_b10" -> graft.ops.OracleCtes.materialize(
      EmbeddingOps.knnGraphSql(numBits = 10)),
    "emb_lsh_recall_bits" -> graft.ops.OracleCtes.materialize(
      EmbeddingOps.lshRecallCurveSql()),
    "emb_auto_bits" -> EmbeddingOps.autoBitsReportSql,
    "emb_knn_graph_deduped" -> graft.ops.OracleCtes.materialize(
      EmbeddingOps.knnGraphDedupedSql()),
    "emb_auto_recall" -> graft.ops.OracleCtes.materialize(
      EmbeddingOps.autoRecallSql()),
    "emb_topk_recall" -> graft.ops.OracleCtes.materialize(
      EmbeddingOps.topkRecallSql()),
    "emb_hard_negatives" -> graft.ops.OracleCtes.materialize(
      EmbeddingOps.hardNegativesAutoSql()),
    "doc_chunks" -> graft.ops.PretrainOps.chunkDocsSql(),
    "seq_pack" -> graft.ops.PretrainOps.packSequencesSql(),
    "seq_pack_stats" ->
      graft.ops.OracleCtes.materialize(graft.ops.PretrainOps.packStatsSql()),
    "pii_scrub" -> graft.ops.PretrainOps.scrubPlantedSql(),
    "pii_kanon" -> graft.ops.PretrainOps.kAnonymityCensusSql(),
    "pipeline_sequences" -> graft.ops.PretrainOps.makeSequencesSql(),
    "pipeline_curate" -> graft.ops.CuratePipeline.curateSql(),
    "pipeline_funnel" ->
      graft.ops.OracleCtes.materialize(graft.ops.CuratePipeline.funnelSql()),
    "pipeline_decontam_summary" -> graft.ops.OracleCtes.materialize(
      graft.ops.CuratePipeline.decontamSummarySql()),
    "pipeline_pretrain" -> graft.ops.OracleCtes.materialize(graft.ops.CuratePipeline.pretrainSql()),
    "pipeline_pretrain_seqs" -> graft.ops.OracleCtes.materialize(graft.ops.CuratePipeline.pretrainSequencesSql()),
    "pipeline_decontam" -> graft.ops.CuratePipeline.decontaminateSql(),
    "pipe_quality" -> graft.ops.CuratePipeline.qualityFilterSql(),
    "text_top_tokens" -> graft.ops.CuratePipeline.topTokensPerLangSql(),
    "docs_cluster" -> graft.ops.TopicCluster.clusterSql(),
    "docs_cluster_ari" ->
      graft.ops.OracleCtes.materialize(graft.ops.TopicCluster.clusterAriSql()),
    "docs_cluster_nmi" ->
      graft.ops.OracleCtes.materialize(graft.ops.TopicCluster.clusterNmiSql()),
    "docs_cluster_terms" ->
      graft.ops.OracleCtes.materialize(graft.ops.TopicCluster.clusterTermsSql()),
    "kmeansnd_assign" -> Tables.withVecsCents(kmeans.KMeansND.assignSql()),
    "kmeansnd_step" -> Tables.withVecsCents(
      s""", assignednd AS (${kmeans.KMeansND.assignSql()})
         |${kmeans.KMeansND.recomputeFlatSql()}""".stripMargin),
    "events_hourly_agg" -> EventOps.hourlyTypeAggSql,
    "events_incr_agg" -> EventOps.hourlyTypeAggSql,
    "events_sessionize" -> EventOps.sessionizeSql(),
    "events_percentiles" -> EventOps.typePercentilesSql,
    "events_mad" -> EventOps.typeMadSql,
    "events_cum_users" -> EventOps.cumulativeUsersSql,
    "events_hll_rolling" -> EventOps.hllUsersRollingSql(),
    "topk_per_key" ->
      """SELECT event_type, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events) t WHERE rn <= 3""".stripMargin,
    "events_outliers" -> EventOps.typeOutliersSql(),
    "events_cusum" -> EventOps.typeCusumSql(),
    "events_histogram" -> EventOps.typeHistogramSql(),
    "events_conversion_lag" -> EventOps.conversionLagSql,
    "events_funnel" -> EventOps.funnelSql(withinMinutes = 1440),
    "events_rollup" -> EventOps.dailyTypeRollupSql,
    "events_asof" -> EventOps.asofJoinSql(),
    "events_ivjoin" -> EventOps.incidentWindowsSql(),
    "events_hll_users" -> EventOps.hllUsersSql,
    "events_kmv_users" -> EventOps.kmvUsersSql(),
    "events_json" -> EventOps.propsKStatsSql,
    "star_revenue" -> graft.ops.Relational.starRevenueSql(),
    "pricing_summary" -> graft.ops.Relational.pricingSummarySql(),
    "cube_pricing" -> graft.ops.Relational.pricingCubeSql(),
    "rollup_orders" -> graft.ops.Relational.ordersRollupSql(),
    "pivot_orders" -> graft.ops.Relational.ordersPivotSql(),
    "top_orders" -> graft.ops.Relational.topUnshippedOrdersSql(),
    "large_orders" -> graft.ops.Relational.largeVolumeOrdersSql(),
    "small_qty_revenue" -> graft.ops.Relational.smallQtyRevenueSql(),
    "waiting_suppliers" -> graft.ops.Relational.waitingSuppliersSql(),
    "orders_pareto" -> graft.ops.Relational.paretoAbcSql,
    "orders_rfm" -> graft.ops.Relational.rfmSegmentsSql,
    "orders_gini" -> graft.ops.Relational.giniRevenueSql,
    "debtor_segments" -> graft.ops.Relational.debtorSegmentsSql(),
    "dq_orders" -> graft.ops.DataQuality.ordersChecksSql(),
    "dq_skew" ->
      graft.ops.OracleCtes.materialize(graft.ops.DataQuality.keySkewReportSql),
    "dq_documents" -> graft.ops.DataQuality.documentsChecksSql(),
    "er_match" -> graft.ops.EntityResolution.matchCustomersSql(),
    "events_scd2" -> EventOps.scd2HistorySql,
    "events_pit_join" -> EventOps.pitScd2JoinSql(),
    "dedup_editdist" -> graft.ops.OracleCtes.materialize(Dedup.editDistancePairsSql()),
    "dedup_editdist_blocks" -> Dedup.editDistanceBlockStatsSql(),
    "graph_pagerank" -> graft.ops.OracleCtes.materialize(graft.ops.GraphOps.supplierPartRankSql()),
    "graph_ppr" -> graft.ops.OracleCtes.materialize(graft.ops.GraphOps.supplierPartPPRSql()),
    "graph_triangles" -> graft.ops.OracleCtes.materialize(
      graft.ops.GraphOps.coOrderTrianglesAutoSql()),
    "graph_bfs" -> graft.ops.OracleCtes.materialize(graft.ops.GraphOps.supplierPartBfsSql()),
    "graph_kcore" -> graft.ops.OracleCtes.materialize(graft.ops.GraphOps.supplierPartKCoreSql()),
    "graph_labelprop" -> graft.ops.OracleCtes.materialize(graft.ops.GraphOps.supplierPartLabelPropSql()),
    "graph_modularity" -> graft.ops.OracleCtes.materialize(graft.ops.GraphOps.supplierPartModularitySql()),
    "graph_hits" -> graft.ops.OracleCtes.materialize(graft.ops.GraphOps.supplierPartHitsSql()),
    "basket_lift" -> graft.ops.GraphOps.basketLiftSql(),
    "bloom_semi" ->
      """SELECT * FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "skew_salted_agg" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    "events_retention" -> EventOps.weeklyRetentionSql,
    "events_latest" -> EventOps.latestStateSql,
    "events_moving" -> EventOps.movingStatsSql,
    "events_trend" -> EventOps.typeTrendSql,
    "events_resample" -> EventOps.resampleHourlySql,
    "events_snapshot_diff" -> EventOps.snapshotDiffSql(),
    "text_hashed_features" -> TextOps.hashedFeaturesSql(),
    "events_deciles" -> EventOps.valueDecilesSql(),
    "text_sgns_negatives" -> TextOps.sgnsNegativesSql(),
    "events_transitions" -> EventOps.transitionsSql,
    "events_autocorr" -> EventOps.hourlyAutocorrSql(),
    "orders_chisq" -> graft.ops.StatsOps.chiSquareSql(
      "orders", "o_orderpriority", "CAST(year(o_orderdate) AS INT)"),
    "corr_matrix" -> graft.ops.StatsOps.corrMatrixSql(
      "lineitem", Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
    "quality_auc" -> graft.ops.StatsOps.aucExactSql(
      "documents", "n_chars", "lang = 'en'"),
    "quality_pr_curve" -> graft.ops.StatsOps.prCurveSql(
      s"(${TextOps.nbScoreSql}) nbrel", "margin", "is_en"),
    "quality_conformal" -> graft.ops.StatsOps.conformalSql(
      TextOps.nbScoreSql),
    "orders_benford" -> graft.ops.StatsOps.benfordSql(
      "orders", "o_totalprice"),
    "text_nb_score" -> TextOps.nbScoreSql,
    "text_nb_calibration" -> TextOps.nbCalibrationSql,
    "text_keyphrases" -> graft.ops.RetrievalOps.keyphrasesSql(),
    "text_nb_confusion" -> TextOps.nbConfusionSql,
    "text_nb_ece" -> TextOps.nbEceSql,
    "text_nb_margins" -> TextOps.nbMarginsSql,
    "text_nb_calib2" -> TextOps.nbCalibrationSql,
    "text_nb_conf2" -> TextOps.nbConfusionSql,
    "text_nb_ece2" -> TextOps.nbEceSql,
    "emb_knn_classify" -> graft.ops.OracleCtes.materialize(
      graft.ops.EmbeddingOps.knnClassifyAutoSql()),
    "emb_ood_score" -> graft.ops.OracleCtes.materialize(
      graft.ops.EmbeddingOps.oodScoresAutoSql()),
    "emb_margin_mine" -> graft.ops.OracleCtes.materialize(
      graft.ops.EmbeddingOps.marginMineAutoSql()),
    "emb_drift" -> graft.ops.EmbeddingOps.centroidDriftSql,
    "emb_diversity_prune" -> graft.ops.EmbeddingOps.diversityPruneSql(),
    "emb_intrinsic_dim" -> graft.ops.OracleCtes.materialize(
      graft.ops.EmbeddingOps.intrinsicDimAutoSql()),
    "emb_centroid_classify" -> graft.ops.EmbeddingOps.centroidClassifySql,
    "points_skyline" ->
      graft.ops.Relational.skylineSql(Tables.pointsSqlBody),
    "profile_docs" -> graft.ops.ProfileOps.profileSql(
      "documents", Seq("doc_id", "text", "lang", "source", "n_chars")),
    "corpus_datacard" -> graft.ops.ProfileOps.datacardSql,
    "points_zorder" ->
      Tables.withPtsCents(graft.ops.Layout.pointsZOrderSql(), K),
    // events_sketches: deterministic sketch (binned quantiles + md5-HLL
    // + n) — every estimate is a pure function of the data, oracle-exact;
    // the t-digest/HLL engine-native variant is benchOnly, accuracy
    // asserted in EventAndMultimodalSpec.
    "events_sketches" -> EventOps.typeSketchesDetSql(),
    "events_qbins" -> EventOps.binnedQuantilesSql(),
    "emb_ann_recall" ->
      graft.ops.OracleCtes.materialize(graft.ops.IvfIndex.annRecallSql()),
    // ivf_topk: fixed-iteration (convergence=false) build → the full
    // quantize+probe+rescore pipeline unrolls into DuckDB CTEs.
    "ivf_topk" -> graft.ops.IvfIndex.ivfTopKSql(
      nlist = 16, maxIter = 5, k = 10, nprobe = 4),
    // identical result by construction: the indexed variant probes a
    // parquet round-trip of the same fixed-iteration build
    "ivf_topk_indexed" -> graft.ops.IvfIndex.ivfTopKSql(
      nlist = 16, maxIter = 5, k = 10, nprobe = 4),
    "emb_sq8_topk_indexed" -> graft.ops.QuantOps.sq8TopKSql(),
    "pq_topk" -> graft.ops.PqIndex.pqTopKRefinedSql(),
    "pq_distortion" ->
      graft.ops.OracleCtes.materialize(graft.ops.PqIndex.pqDistortionSql()),
    "pq_topk_indexed" -> graft.ops.PqIndex.pqTopKSql(),
    "ivfpq_topk" -> graft.ops.PqIndex.ivfPqTopKRefinedSql(
      nprobe = 4, kFactor = 20),
    "ivfpq_topk_indexed" -> graft.ops.PqIndex.ivfPqTopKSql(),
    "ivfpq_topk_refined" -> graft.ops.PqIndex.ivfPqTopKRefinedSql(),
    "mm_summary" -> Multimodal.mediaSummarySql,
    "mm_dedup" -> Multimodal.mediaDedupSql,
    "mm_frames" -> Multimodal.sampleFramesSql(),
    "mm_features_full" -> Multimodal.featuresFlatSql,
    "mm_resize" -> Multimodal.resizeFlatSql(),
    "mm_decode_real" -> Multimodal.pngRoundtripSumsSql,
    "mm_phash" -> Multimodal.pngDHashSql,
    "mm_phash_pairs" -> Multimodal.phashNearDupsSql(),
    // transitive closure of the phash pair graph by recursive CTE —
    // the nearDupGroupsSql shape over the media pair relation
    "mm_phash_groups" ->
      s"""WITH RECURSIVE e0 AS (
         |  SELECT da AS a, db AS b
         |  FROM (${Multimodal.phashNearDupsSql()}) p),
         |edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         |SELECT a AS doc_id, LEAST(a, MIN(b)) AS group_id
         |FROM reach GROUP BY a""".stripMargin,
    // streaming queries: the oracle is the batch twin of the transform —
    // complete/update-mode final sink contents equal the batch result
    "stream_hourly_agg" ->
      """SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
        |    AS window_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
        |    AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // len=1h, slide=30min ⇒ every event lands in exactly the two
    // epoch-aligned 30-min starts (b, b-1): start ∈ (ts-1h, ts]
    "stream_sliding_agg" ->
      """WITH w AS (
        |  SELECT make_timestamp(
        |      ((epoch_us(ts) // 1800000000) - k) * 1800000000)
        |    AS window_start, event_type
        |  FROM events, (SELECT UNNEST([0, 1]) AS k))
        |SELECT window_start, event_type, COUNT(*) AS n_events
        |FROM w GROUP BY 1, 2""".stripMargin,
    "stream_topk" ->
      """WITH hourly AS (
        |  SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
        |      AS window_start,
        |    event_type, COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT window_start, event_type, n_events, rnk FROM (
        |  SELECT window_start, event_type, n_events,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY window_start
        |      ORDER BY n_events DESC, event_type ASC) AS BIGINT) AS rnk
        |  FROM hourly) r
        |WHERE rnk <= 3""".stripMargin,
    "stream_enrich" ->
      """SELECT e.user_id, e.ts, e.event_id, e.event_type, e.value,
        |  e.props, c.c_name, c.c_nationkey, c.c_acctbal
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey"""
        .stripMargin,
    "stream_dedup" -> "SELECT * FROM events",
    "stream_exact_dedup" ->
      "SELECT DISTINCT md5(text) AS digest, text FROM documents",
    // gap-and-islands twin of the engine's session_window merging:
    // same session iff next ts < prev ts + gap (strict), end = last+gap
    "stream_sessionize" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM s)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
        |    AS sum_value
        |FROM g GROUP BY user_id, sid""".stripMargin,
    "stream_latest" ->
      """SELECT user_id, ts, event_id, value FROM (
        |  SELECT user_id, ts, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,
    "stream_seqnum" ->
      """SELECT user_id, event_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS BIGINT) AS seq
        |FROM events""".stripMargin,
    "stream_sessions_tws" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS sid
        |FROM (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) s""".stripMargin,
    "stream_attribute" ->
      """SELECT c.user_id, i.event_id AS imp_id, i.ts AS imp_ts,
        |  c.event_id AS click_id, c.ts AS click_ts
        |FROM events c JOIN events i
        |  ON c.user_id = i.user_id
        | AND i.event_type = 'view' AND c.event_type = 'click'
        | AND c.ts >= i.ts
        | AND c.ts <= i.ts + INTERVAL 30 MINUTE""".stripMargin,
  )

  /** Bench-only variants: run and timed by [[graft.Bench]] but NOT part
    * of the verify/oracle contract — each is the engine-native
    * (xxhash64 / t-digest / HLL) twin of an oracle-gated query above,
    * exercising the identical operator DAG with a hash/sketch family
    * DuckDB can't express. Correctness for these is carried by the
    * gated twin (same DAG, md5-60/deterministic family) plus the
    * planted-duplicate / accuracy ScalaTest suites. */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash_xx" -> ((s, dir) =>
      Dedup.minhashNearDups(Tables.table(s, dir, "documents"))),
    "dedup_simhash_xx" -> ((s, dir) =>
      Dedup.simhashNearDups(Tables.table(s, dir, "documents"))),
    "events_sketches_approx" -> ((s, dir) =>
      EventOps.typeSketches(Tables.events(s, dir))))
}
