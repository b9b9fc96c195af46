package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / corpus-mixing operators for the
  * LLM-data-pipeline surface. Everything here is keyed on a
  * content-independent hash bucket of the document id — NOT on `rand()`
  * — because at corpus scale the properties that matter are exactly the
  * ones randomness destroys:
  *
  *  - reproducible: the same doc lands in the same split on every run,
  *    every cluster size, every partitioning (rand() is none of these);
  *  - stable under growth: adding documents never reassigns existing
  *    ones (critical for train/test contamination control);
  *  - oracle-checkable: the md5-60 bucket ([[Dedup.md5Hash60]]) is
  *    bit-identical in DuckDB, so split assignment, sampling, and
  *    mixing are all hash-verified against SQL twins.
  *
  * 100 TB posture: every operator is a pure per-row projection (the
  * bucket is computed from the id in-place — zero shuffle, scan-
  * parallel, whole-stage-codegen'd); the mix explode multiplies rows
  * but never shuffles them.
  */
object Sampling {

  /** Bucket granularity: basis points of basis points (1e4) — rates are
    * exact multiples of 0.01%. */
  val Buckets: Int = 10000

  /** Deterministic bucket in [0, Buckets) from a key column. */
  def bucket(key: Column, seed: Int = 42): Column =
    pmod(Dedup.md5Hash60(seed, key.cast("string")), lit(Buckets))

  def bucketSql(expr: String, seed: Int = 42): String =
    s"(${Dedup.md5Hash60Sql(seed, s"CAST($expr AS VARCHAR)")}) % $Buckets"

  // -------------------------------------------------------------------
  // Train/valid/test split assignment. Thresholds are integer bucket
  // counts (no float compares): train = [0, trainBp), valid =
  // [trainBp, trainBp+validBp), test = the rest.
  // -------------------------------------------------------------------
  /** `key` defaults to the document id; production corpora usually key
    * on a coarser unit (URL, domain, source document of a chunk) so
    * near-duplicates and derived chunks cannot straddle the train/test
    * boundary — any column (or expression) works, the bucket math is
    * unchanged. */
  def splitAssign(
      docs: DataFrame, trainBp: Int = 9800, validBp: Int = 100,
      seed: Int = 42, key: Column = col("doc_id")): DataFrame = {
    val b = bucket(key, seed)
    docs.select(
      col("doc_id"),
      b.as("bucket"),
      when(b < trainBp, "train")
        .when(b < trainBp + validBp, "valid")
        .otherwise("test").as("split"))
  }

  def splitAssignSql(
      trainBp: Int = 9800, validBp: Int = 100, seed: Int = 42): String =
    s"""SELECT doc_id, bucket,
       |  CASE WHEN bucket < $trainBp THEN 'train'
       |       WHEN bucket < ${trainBp + validBp} THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, ${bucketSql("doc_id", seed)} AS bucket
       |      FROM documents) b""".stripMargin

  // -------------------------------------------------------------------
  // Split-leakage audit: near-duplicate pairs that STRADDLE the
  // train/valid/test boundary. A doc-id-keyed split is only sound when
  // near-duplicates don't exist; when they do, a test doc with a train
  // near-twin is silent eval contamination (the measurement behind Lee
  // et al. 2022 §6.2's "deduplicate before you split"; splitAssign's
  // `key` knob — split by URL/source instead — is the fix this audit
  // motivates). Composes the DF-capped n-gram Jaccard pair relation
  // with the deterministic bucket split; output is one row per
  // straddling split combination with the pair count and the worst
  // (highest-Jaccard) leak. Scale shape: the pair relation is the
  // blocked, capped dedup join (never n²); the split columns are
  // zero-shuffle projections joined on the pair's two doc ids; the
  // final agg is ≤ |splits|² rows.
  // -------------------------------------------------------------------
  def splitLeakage(
      docs: DataFrame, trainBp: Int = 9800, validBp: Int = 100,
      seed: Int = 42, n: Int = 3, threshold: Double = 0.8,
      maxDf: Int = Dedup.DefaultMaxDf): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(docs, n, threshold, maxDf)
    val s = splitAssign(docs, trainBp, validBp, seed)
      .select(col("doc_id"), col("split"))
    pairs
      .join(s.select(col("doc_id").as("da"), col("split").as("split_a")),
        Seq("da"))
      .join(s.select(col("doc_id").as("db"), col("split").as("split_b")),
        Seq("db"))
      .filter(col("split_a") =!= col("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"), max("jaccard").as("max_jaccard"))
  }

  /** DuckDB twin. The pair SQL is pre-materialized BEFORE embedding
    * (the OracleCtes depth-0 rule), and max(jaccard) is a comparison —
    * no cross-engine arithmetic beyond the pair relation's own pinned
    * division. */
  def splitLeakageSql(
      trainBp: Int = 9800, validBp: Int = 100, seed: Int = 42,
      n: Int = 3, threshold: Double = 0.8,
      maxDf: Int = Dedup.DefaultMaxDf): String =
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT * FROM (
       |    ${OracleCtes.materialize(Dedup.ngramJaccardPairsSql(n, threshold, maxDf))}) q),
       |sp AS MATERIALIZED (${splitAssignSql(trainBp, validBp, seed)})
       |SELECT sa.split AS split_a, sb.split AS split_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs, MAX(p.jaccard) AS max_jaccard
       |FROM pairs p
       |JOIN sp sa ON p.da = sa.doc_id
       |JOIN sp sb ON p.db = sb.doc_id
       |WHERE sa.split <> sb.split
       |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // Weighted corpus mixing: per-source sampling weights, including
  // upsampling (weight > 1 repeats documents — the "epochs per source"
  // knob of LLM data recipes). A doc from a source with weight w is
  // emitted floor(w) times, plus once more iff its bucket falls under
  // the fractional part — deterministic, exact in expectation, and
  // stable per document. weight 0 drops the source; absent sources get
  // `defaultWeight`.
  // -------------------------------------------------------------------
  def weightedMix(
      docs: DataFrame, weights: Seq[(String, Double)],
      defaultWeight: Double = 1.0, seed: Int = 7): DataFrame = {
    def perSource(f: Double => Int): Column =
      weights.foldLeft(lit(f(defaultWeight))) { case (acc, (s, w)) =>
        when(col("source") === s, lit(f(w))).otherwise(acc)
      }
    val base = perSource(w => math.floor(w).toInt)
    val fracBp = perSource(w => math.round((w - math.floor(w)) * Buckets).toInt)
    val copies = base + when(bucket(col("doc_id"), seed) < fracBp, 1).otherwise(0)
    docs
      .withColumn("n_copies", copies)
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("n_copies"))).as("copy"))
  }

  // -------------------------------------------------------------------
  // Stratified sampling: a fixed per-stratum keep rate in basis points
  // (language balancing, source downweighting). Pure projection +
  // filter — zero shuffle, and the SAME doc survives at any higher
  // rate (nested samples by construction: bucket < bp is monotone).
  // -------------------------------------------------------------------
  def stratifiedSample(
      docs: DataFrame, rates: Seq[(String, Int)], defaultBp: Int = Buckets,
      seed: Int = 13, strat: Column = col("lang")): DataFrame = {
    val bp = rates.foldLeft(lit(defaultBp)) { case (acc, (s, r)) =>
      when(strat === s, lit(r)).otherwise(acc)
    }
    val b = bucket(col("doc_id"), seed)
    docs.filter(b < bp)
      .select(col("doc_id"), strat.as("stratum"), b.as("bucket"))
  }

  def stratifiedSampleSql(
      rates: Seq[(String, Int)], defaultBp: Int = Buckets,
      seed: Int = 13, stratExpr: String = "lang"): String = {
    val bp = rates.map { case (s, r) => s"WHEN $stratExpr = '$s' THEN $r" }
      .mkString("CASE ", " ", s" ELSE $defaultBp END")
    s"""SELECT doc_id, $stratExpr AS stratum,
       |  ${bucketSql("doc_id", seed)} AS bucket
       |FROM documents
       |WHERE ${bucketSql("doc_id", seed)} < ($bp)""".stripMargin
  }

  // -------------------------------------------------------------------
  // Per-stratum cap: keep exactly min(n, |stratum|) documents per
  // stratum, chosen by hash-bucket order (a deterministic uniform-ish
  // subsample, stable across partitionings). One shuffle on the
  // stratum key; the window never sees more than a stratum per task —
  // at scale, a skewed mega-stratum caps via rank, which AQE handles
  // like any hot window key (and the bucket pre-filter below bounds it:
  // rows with bucket >= ~(n/|stratum|-quantile) could be pre-pruned by
  // a coarse per-stratum count when n << |stratum|).
  // -------------------------------------------------------------------
  def capPerStratum(
      docs: DataFrame, n: Int, seed: Int = 13,
      strat: Column = col("lang")): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum"))
      .orderBy(col("bucket").asc, col("doc_id").asc)
    docs.select(col("doc_id"), strat.as("stratum"),
        bucket(col("doc_id"), seed).as("bucket"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
      .select("doc_id", "stratum", "rk")
  }

  def capPerStratumSql(
      n: Int, seed: Int = 13, stratExpr: String = "lang"): String =
    s"""SELECT doc_id, stratum, rk FROM (
       |  SELECT doc_id, $stratExpr AS stratum,
       |    ROW_NUMBER() OVER (PARTITION BY $stratExpr
       |      ORDER BY ${bucketSql("doc_id", seed)} ASC, doc_id ASC) AS rk
       |  FROM documents) t
       |WHERE rk <= $n""".stripMargin

  // -------------------------------------------------------------------
  // Temperature mixing: the data-recipe reweighting where source s gets
  // sampling weight ∝ n_s^α (α<1 flattens the source distribution so
  // big crawls stop drowning small high-quality sources). α is fixed at
  // 0.5 — SQRT is correctly-rounded IEEE in both engines, while POWER
  // with an arbitrary exponent is libm-dependent and would break the
  // hash gate. Everything is computed IN the plan (no driver trip):
  // per-source counts → Σ√n_s (decimal-exact, order-independent) →
  // per-doc expected copies c_s = N·√n_s / (Z·n_s), emitted via the
  // same floor + fractional-bucket scheme as weightedMix. Output size ≈
  // input size (T = N), deterministic per document.
  // 100 TB posture: one count agg (map-side combined) + a broadcast of
  // |sources| rates rows back onto the scan — no data shuffle at all.
  // -------------------------------------------------------------------
  def temperatureMix(docs: DataFrame, seed: Int = 7): DataFrame = {
    val stats = docs.groupBy("source").agg(count(lit(1)).cast("double").as("ns"))
    val tot = stats.agg(
      sum(sqrt(col("ns")).cast(org.apache.spark.sql.types.DecimalType(28, 12)))
        .cast("double").as("z"),
      sum(col("ns")).as("t"))
    val c = (col("t") * sqrt(col("ns"))) / (col("z") * col("ns"))
    val rates = stats.crossJoin(broadcast(tot)).select(
      col("source"),
      floor(c).as("base"),
      floor((c - floor(c)) * Buckets).as("frac_bp"))
    docs.join(broadcast(rates), "source")
      .withColumn("n_copies",
        col("base") + when(bucket(col("doc_id"), seed) < col("frac_bp"), 1L)
          .otherwise(0L))
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
  }

  def temperatureMixSql(seed: Int = 7): String = {
    val c = "(t * SQRT(ns)) / (z * ns)"
    s"""WITH stats AS (
       |  SELECT source, CAST(COUNT(*) AS DOUBLE) AS ns
       |  FROM documents GROUP BY source),
       |tot AS (
       |  SELECT CAST(CAST(SUM(CAST(SQRT(ns) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS z,
       |         SUM(ns) AS t
       |  FROM stats),
       |rates AS (
       |  SELECT source,
       |    CAST(FLOOR($c) AS BIGINT) AS base,
       |    CAST(FLOOR(($c - FLOOR($c)) * $Buckets) AS BIGINT) AS frac_bp
       |  FROM stats, tot)
       |SELECT doc_id, source, unnest(generate_series(1, n_copies)) AS copy
       |FROM (
       |  SELECT d.doc_id, d.source,
       |    r.base + (CASE WHEN ${bucketSql("doc_id", seed)} < r.frac_bp
       |              THEN 1 ELSE 0 END) AS n_copies
       |  FROM documents d JOIN rates r USING (source)) m
       |WHERE n_copies >= 1""".stripMargin
  }

  def weightedMixSql(
      weights: Seq[(String, Double)], defaultWeight: Double = 1.0,
      seed: Int = 7): String = {
    def perSource(f: Double => Int): String =
      weights.map { case (s, w) => s"WHEN source = '$s' THEN ${f(w)}" }
        .mkString("CASE ", " ", s" ELSE ${f(defaultWeight)} END")
    val base = perSource(w => math.floor(w).toInt)
    val fracBp = perSource(w => math.round((w - math.floor(w)) * Buckets).toInt)
    s"""SELECT doc_id, source, unnest(generate_series(1, n_copies)) AS copy
       |FROM (
       |  SELECT doc_id, source,
       |    ($base) + (CASE WHEN ${bucketSql("doc_id", seed)} < ($fracBp)
       |               THEN 1 ELSE 0 END) AS n_copies
       |  FROM documents) m
       |WHERE n_copies >= 1""".stripMargin
  }

  // -------------------------------------------------------------------
  // Priority sampling (Duffield, Lund & Thorup 2007): a weighted
  // without-replacement sample where inclusion probability is
  // ∝ min(1, w/τ) — the variance-optimal fixed-size weighted sample.
  // Each doc draws priority q = w/u with u uniform on (0,1]; the k
  // highest priorities win. u comes from the md5-60 hash of doc_id
  // (u = (h+1)/2^60 — never 0), so the sample inherits every property
  // of the split/mix family: reproducible, growth-stable (a new doc
  // can displace at most one incumbent), partition-invariant, and
  // oracle-exact (one IEEE division per row, identical both engines).
  // 100 TB posture: priority is a zero-shuffle scan projection and
  // selection is TakeOrderedAndProject — per-partition top-k heaps,
  // k rows to the driver-side merge, never a global sort.
  // -------------------------------------------------------------------
  private val Pow2_60 = 1152921504606846976.0 // 2^60

  def prioritySample(
      docs: DataFrame, k: Int, weight: Column = col("n_chars"),
      seed: Int = 11): DataFrame = {
    val u = (Dedup.md5Hash60(seed, col("doc_id").cast("string"))
      .cast("double") + lit(1.0)) / lit(Pow2_60)
    docs
      .select(col("doc_id"), weight.cast("long").as("w"),
        (weight.cast("double") / u).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
  }

  def prioritySampleSql(
      k: Int, weightExpr: String = "n_chars", seed: Int = 11): String =
    s"""SELECT doc_id, CAST($weightExpr AS BIGINT) AS w,
       |  CAST($weightExpr AS DOUBLE) /
       |    ((CAST(${Dedup.md5Hash60Sql(seed, "CAST(doc_id AS VARCHAR)")}
       |       AS DOUBLE) + 1.0) / 1152921504606846976.0) AS priority
       |FROM documents
       |ORDER BY priority DESC, doc_id LIMIT $k""".stripMargin

  // -------------------------------------------------------------------
  // A-ES weighted reservoir sampling (Efraimidis & Spirakis 2006): the
  // EXACT probability-proportional-to-size without-replacement sample —
  // each doc draws key u^(1/w), the k largest keys win. The sibling of
  // prioritySample above (different inclusion law: A-ES realizes
  // sequential PPS draws; priority sampling is the variance-optimal
  // estimator family). Ranked by the monotone transform
  // ln(u)/w = -plog(1/u)/w so the only transcendental is the portable
  // log: u = (h+1)/2^60 from the md5-60 hash, 1/u = 2^60/(h+1) >= 1
  // stays in plog's domain, and both engines evaluate the identical
  // IEEE tree. w floors at 1 (an empty doc must not divide by zero).
  // 100 TB posture: zero-shuffle key projection + TakeOrdered top-k —
  // the distributed form of the weighted reservoir (per-partition
  // k-heaps, k rows to the driver merge).
  // -------------------------------------------------------------------
  def aresSample(
      docs: DataFrame, k: Int, weight: Column = col("n_chars"),
      seed: Int = 13): DataFrame = {
    import graft.functions.PortableMath.plog
    val h = Dedup.md5Hash60(seed, col("doc_id").cast("string"))
    val invU = lit(Pow2_60) / (h.cast("double") + lit(1.0))
    val key = (lit(0.0) - plog(invU)) /
      greatest(weight.cast("double"), lit(1.0))
    docs
      .select(col("doc_id"), weight.cast("long").as("w"), key.as("key"))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
  }

  def aresSampleSql(
      k: Int, weightExpr: String = "n_chars", seed: Int = 13): String = {
    import graft.functions.PortableMath.plogSql
    s"""SELECT doc_id, w, (0.0 - (${plogSql("inv_u")})) / wd AS key FROM (
       |  SELECT doc_id, CAST($weightExpr AS BIGINT) AS w,
       |    GREATEST(CAST($weightExpr AS DOUBLE), 1.0) AS wd,
       |    1152921504606846976.0 /
       |      (CAST(${Dedup.md5Hash60Sql(seed, "CAST(doc_id AS VARCHAR)")}
       |         AS DOUBLE) + 1.0) AS inv_u
       |  FROM documents) t
       |ORDER BY key DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Per-stratum A-ES reservoir: an independent weighted PPS-WOR
    * sample of `k` docs per `source`, composed from the A-ES key
    * projection and the custom bounded-heap TopKPerKey operator —
    * the group-wise reservoir never windows or sorts a stratum in
    * full, and the shuffle carries ≤ k·partitions rows per stratum.
    * The balanced per-domain sampling shape (cap every crawl domain
    * to k weighted picks). */
  def aresSamplePerSource(
      docs: DataFrame, k: Int, weight: Column = col("n_chars"),
      seed: Int = 13): DataFrame = {
    import graft.functions.PortableMath.plog
    val h = Dedup.md5Hash60(seed, col("doc_id").cast("string"))
    val invU = lit(Pow2_60) / (h.cast("double") + lit(1.0))
    val key = (lit(0.0) - plog(invU)) /
      greatest(weight.cast("double"), lit(1.0))
    val keyed = docs.select(col("source"), col("doc_id"),
      weight.cast("long").as("w"), key.as("key"))
    org.apache.spark.sql.graft.TopKPerKey(
      keyed, Seq("source"), Seq("key" -> false, "doc_id" -> true), k)
  }

  def aresSamplePerSourceSql(
      k: Int, weightExpr: String = "n_chars", seed: Int = 13): String = {
    import graft.functions.PortableMath.plogSql
    s"""WITH keyed AS (
       |  SELECT source, doc_id, w, (0.0 - (${plogSql("inv_u")})) / wd AS key
       |  FROM (
       |    SELECT source, doc_id, CAST($weightExpr AS BIGINT) AS w,
       |      GREATEST(CAST($weightExpr AS DOUBLE), 1.0) AS wd,
       |      1152921504606846976.0 /
       |        (CAST(${Dedup.md5Hash60Sql(seed, "CAST(doc_id AS VARCHAR)")}
       |           AS DOUBLE) + 1.0) AS inv_u
       |    FROM documents) t)
       |SELECT source, doc_id, w, key FROM (
       |  SELECT source, doc_id, w, key,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY key DESC, doc_id ASC) AS rn
       |  FROM keyed) r WHERE rn <= $k""".stripMargin
  }

  // -------------------------------------------------------------------
  // Poisson(1) bootstrap replicate weights (the online-bootstrap trick,
  // Oza & Russell 2001): each doc draws w ~ Poisson(1) — its replicate
  // count in ONE bootstrap resample of the corpus — via the inverse CDF
  // on the keyed md5-60 uniform. E[w]=1, P(w=0)=e⁻¹ ≈ 0.368, so a
  // resample keeps ~63.2% of docs with multiplicity. The CDF cut
  // points e⁻¹·Σ 1/i! are driver-side constants inlined as identical
  // literals in both engines (w ≥ 8 is collapsed into the last bucket —
  // P ≈ 1e-6, deterministic either way). Zero-shuffle scan projection;
  // a full B-replicate bootstrap just varies the seed.
  // -------------------------------------------------------------------
  def bootstrapWeights(
      docs: DataFrame, seed: Int = 29): DataFrame = {
    val u = (Dedup.md5Hash60(seed, col("doc_id").cast("string"))
      .cast("double") + lit(1.0)) / lit(Pow2_60)
    val cdf = poissonCdf1
    val w = cdf.zipWithIndex.foldRight(lit(8)) { case ((c, k), els) =>
      when(u < lit(c), lit(k)).otherwise(els)
    }
    docs.select(col("doc_id"), w.as("w"))
      .filter(col("w") >= 1)
  }

  def bootstrapWeightsSql(seed: Int = 29): String = {
    val u = s"((CAST(${Dedup.md5Hash60Sql(seed, "CAST(doc_id AS VARCHAR)")} " +
      "AS DOUBLE) + 1.0) / 1152921504606846976.0)"
    val cases = poissonCdf1.zipWithIndex
      .map { case (c, k) => s"WHEN $u < $c THEN $k" }.mkString(" ")
    s"""SELECT doc_id, w FROM (
       |  SELECT doc_id, CASE $cases ELSE 8 END AS w FROM documents) t
       |WHERE w >= 1""".stripMargin
  }

  /** CDF of Poisson(1) at k = 0..7 — StrictMath so the driver-side
    * constants are identical on any JVM; Double.toString round-trips
    * them into both engines exactly. */
  private lazy val poissonCdf1: Seq[Double] = {
    val e1 = StrictMath.exp(-1.0)
    (0 to 7).map { k =>
      // cumulative: e^-1 * sum_{i<=k} 1/i!
      (0 to k).map { i =>
        var f = 1.0; (1 to i).foreach(f *= _); e1 / f
      }.sum
    }
  }

  // -------------------------------------------------------------------
  // k-means coreset by D²-sensitivity sampling (the lightweight-coreset
  // construction, Bachem/Lucic/Krause 2018 shape): importance of a
  // point = its squared distance to the current centroid set, m points
  // drawn PPS-without-replacement by the same A-ES exponential race as
  // aresSample (key = ln(u)/D², top-m win), each carrying the unbiased
  // estimator weight ΣD² / (m·D²_p) — so weighted SSE over the coreset
  // estimates full-corpus SSE. Points coinciding with a center (D²=0,
  // zero sensitivity) get key −inf via an explicit CASE and can never
  // be drawn (ANSI Spark raises on x/0, so the CASE is load-bearing).
  //
  // 100 TB posture: the assignment is the zero-shuffle broadcast-argmin
  // scan, ΣD² is one map-side-combined 1-row aggregate riding back as a
  // broadcast, and selection is TakeOrderedAndProject (per-partition
  // m-heaps) — no global sort, nothing corpus-sized near the driver.
  // Exactness: ΣD² via the DECIMAL round(·1e6) grid (the objective
  // recipe); key and weight are identical IEEE trees both engines.
  // -------------------------------------------------------------------
  def coresetSample(
      points: DataFrame, cents: Seq[graft.kmeans.Cent], m: Int = 256,
      seed: Int = 17): DataFrame = {
    import graft.functions.PortableMath.plog
    val assigned = graft.kmeans.KMeansOps.assign(points, cents)
    val tot = graft.kmeans.KMeansOps.objective(assigned)
    val h = Dedup.md5Hash60(seed, col("pid").cast("string"))
    val invU = lit(Pow2_60) / (h.cast("double") + lit(1.0))
    val key = when(col("sqdist") === 0.0, lit(Double.NegativeInfinity))
      .otherwise((lit(0.0) - plog(invU)) / col("sqdist"))
    assigned.crossJoin(broadcast(tot))
      .select(col("pid"), col("x"), col("y"), col("cid"), col("sqdist"),
        when(col("sqdist") === 0.0, lit(null))
          .otherwise(col("objective") / (lit(m.toDouble) * col("sqdist")))
          .as("weight"),
        key.as("key"))
      .orderBy(col("key").desc, col("pid").asc, col("x"), col("y"))
      .limit(m)
      .select("pid", "x", "y", "cid", "sqdist", "weight")
  }

  /** DuckDB twin TAIL (composes after the pts/cents/assigned scaffold —
    * register via SparkEntry's withAssigned). `m.0` is CAST to DOUBLE so
    * DuckDB multiplies in double exactly as Spark does. */
  def coresetSampleSql(m: Int = 256, seed: Int = 17): String = {
    import graft.functions.PortableMath.plogSql
    s"""SELECT pid, x, y, cid, sqdist, weight FROM (
       |  SELECT pid, x, y, cid, sqdist,
       |    CASE WHEN sqdist = 0.0 THEN NULL
       |      ELSE (SELECT objective FROM tot) /
       |        (CAST($m.0 AS DOUBLE) * sqdist) END AS weight,
       |    CASE WHEN sqdist = 0.0 THEN CAST('-infinity' AS DOUBLE)
       |      ELSE (0.0 - (${plogSql("inv_u")})) / sqdist END AS key
       |  FROM (
       |    SELECT pid, x, y, cid, sqdist,
       |      1152921504606846976.0 /
       |        (CAST(${Dedup.md5Hash60Sql(seed, "CAST(pid AS VARCHAR)")}
       |           AS DOUBLE) + 1.0) AS inv_u
       |    FROM assigned) t
       |  ORDER BY key DESC, pid ASC, x, y LIMIT $m) s""".stripMargin
  }
}
