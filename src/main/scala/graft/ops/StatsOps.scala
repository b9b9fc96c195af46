package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-column statistics in one table pass — the feature-screening
  * step (drop collinear features, rank drift candidates) that would be
  * quadratic table scans if done naively.
  *
  * `corrMatrix` computes the full Pearson correlation matrix over k
  * columns with ONE scan and ONE 1-row aggregate: all k(k+3)/2
  * sufficient statistics (per-column sums, pairwise product sums, n)
  * accumulate in the same partial-aggregate pass, and the k(k-1)/2
  * correlations are pure projections over that single row. At 100 TB
  * the cost is the scan — there is no shuffle of data rows at all,
  * only the k²-sized partials merging to one row.
  *
  * Determinism: inputs are 2-decimal data, so round(x*100) is an exact
  * integer; every sum runs in DECIMAL(38,0) (HUGEINT twin) and floats
  * appear only in the final ratio. sqrt is IEEE-754 correctly-rounded
  * (unlike ln/exp, it is NOT libm-dependent), so
  * num / (sqrt(denx) * sqrt(deny)) is bit-stable across engines.
  * Pearson r is scale-invariant, so the ×100 grid cancels
  * algebraically — no rescale needed. Magnitudes: with |x·100| ≤ 1e7,
  * per-row products ≤ 1e14, so Σ stays inside 38 digits to n ~ 1e24
  * rows and n·Σxy to n ~ 1e12 — a 100 TB lineitem is ~1e11 rows. */
object StatsOps {

  /** One (col_x, col_y, n, corr) row per unordered column pair. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val Dec = DecimalType(38, 0)
    // per-row grid values and products stay in LONG (≤1e14 ≪ 2^63 —
    // bounded by the value domain, not row count); only the running
    // sums need decimal width
    def g(c: String): Column = round(col(c) * 100).cast("long")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.length }
      yield (cols(i), cols(j))
    val aggs =
      count(lit(1)).as("n") +:
      (cols.map(c => sum(g(c).cast(Dec)).as(s"s_$c")) ++
        cols.map(c => sum((g(c) * g(c)).cast(Dec)).as(s"q_$c")) ++
        pairs.map { case (x, y) =>
          sum((g(x) * g(y)).cast(Dec)).as(s"p_${x}_$y")
        })
    val st = df.agg(aggs.head, aggs.tail: _*)
    def dbl(c: Column): Column = c.cast("string").cast("double")
    val rows = pairs.map { case (x, y) =>
      val nd = col("n").cast(Dec)
      val num = nd * col(s"p_${x}_$y") - col(s"s_$x") * col(s"s_$y")
      val denx = nd * col(s"q_$x") - col(s"s_$x") * col(s"s_$x")
      val deny = nd * col(s"q_$y") - col(s"s_$y") * col(s"s_$y")
      struct(
        lit(x).as("col_x"), lit(y).as("col_y"), col("n"),
        when(denx === lit(0).cast(Dec) || deny === lit(0).cast(Dec),
          lit(null).cast("double"))
          .otherwise(dbl(num) / (sqrt(dbl(denx)) * sqrt(dbl(deny))))
          .as("corr"))
    }
    st.select(explode(array(rows: _*)).as("kv")).select(col("kv.*"))
  }

  def corrMatrixSql(table: String, cols: Seq[String]): String = {
    def g(c: String) = s"CAST(ROUND($c * 100) AS BIGINT)"
    def hug(e: String) = s"SUM(CAST($e AS HUGEINT))"
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.length }
      yield (cols(i), cols(j))
    val stats =
      (s"COUNT(*) AS n" +:
        (cols.map(c => s"${hug(g(c))} AS s_$c") ++
          cols.map(c => s"${hug(s"${g(c)} * ${g(c)}")} AS q_$c") ++
          pairs.map { case (x, y) =>
            s"${hug(s"${g(x)} * ${g(y)}")} AS p_${x}_$y"
          })).mkString(",\n    ")
    def dbl(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"
    val selects = pairs.map { case (x, y) =>
      val num = s"(CAST(n AS HUGEINT) * p_${x}_$y - s_$x * s_$y)"
      val denx = s"(CAST(n AS HUGEINT) * q_$x - s_$x * s_$x)"
      val deny = s"(CAST(n AS HUGEINT) * q_$y - s_$y * s_$y)"
      s"""SELECT '$x' AS col_x, '$y' AS col_y, CAST(n AS BIGINT) AS n,
         |  CASE WHEN $denx = 0 OR $deny = 0 THEN NULL
         |    ELSE ${dbl(num)} / (SQRT(${dbl(denx)}) * SQRT(${dbl(deny)}))
         |  END AS corr
         |FROM st""".stripMargin
    }
    s"WITH st AS (\n  SELECT $stats\n  FROM $table)\n" +
      selects.mkString("\nUNION ALL\n")
  }

  /** Welch's unequal-variance t-test between two cohorts of a metric —
    * the A/B-experiment readout (is the mean `value` of cohort A
    * different from cohort B?), reported as the t statistic plus the
    * Welch–Satterthwaite degrees of freedom (the two numbers any
    * p-value table needs). One scan, one 1-row conditional aggregate:
    * both cohorts' sufficient statistics (n, Σx, Σx²) accumulate in the
    * same partial-agg pass — no per-cohort scans, no shuffle of data
    * rows.
    *
    * Determinism: 2-decimal metric → round(x·100) is an exact LONG;
    * sums run in DECIMAL(38,0) (HUGEINT twin); the variance numerator
    * n·Σx² − (Σx)² is exact integer algebra, and means/variances/t/df
    * are IDENTICAL IEEE expression trees both sides (division and sqrt
    * are correctly-rounded, so bit-stable cross-engine). Cohorts with
    * n < 2 yield NULL t/df via a guarding CASE (which also keeps ANSI
    * division-by-zero unreachable). */
  def welchTTest(
      df: DataFrame, metric: Column, cohort: Column,
      a: String, b: String): DataFrame = {
    val Dec = DecimalType(38, 0)
    val g = round(metric * 100).cast("long")
    def side(tag: String, v: String) = Seq(
      count(when(cohort === v, lit(1))).as(s"n$tag"),
      sum(when(cohort === v, g).otherwise(lit(0L)).cast(Dec)).as(s"s$tag"),
      sum(when(cohort === v, g * g).otherwise(lit(0L)).cast(Dec)).as(s"q$tag"))
    val aggs = side("1", a) ++ side("2", b)
    val st = df.agg(aggs.head, aggs.tail: _*)
    def dbl(c: Column): Column = c.cast("string").cast("double")
    def nD(tag: String) = col(s"n$tag").cast(Dec)
    def mean(tag: String): Column =
      dbl(col(s"s$tag")) / (lit(100.0) * col(s"n$tag"))
    // sample variance in METRIC units: (n·Σg² − (Σg)²) / (1e4·n·(n−1))
    def svar(tag: String): Column =
      dbl(nD(tag) * col(s"q$tag") - col(s"s$tag") * col(s"s$tag")) /
        (lit(1.0e4) * col(s"n$tag") * (col(s"n$tag") - 1))
    val vn1 = svar("1") / col("n1")
    val vn2 = svar("2") / col("n2")
    val se2 = vn1 + vn2
    val ok = col("n1") >= 2 && col("n2") >= 2
    st.select(
      lit(a).as("cohort_a"), lit(b).as("cohort_b"),
      col("n1"), col("n2"),
      when(col("n1") >= 1, mean("1")).otherwise(lit(null)).as("mean_a"),
      when(col("n2") >= 1, mean("2")).otherwise(lit(null)).as("mean_b"),
      when(ok, (mean("1") - mean("2")) / sqrt(se2))
        .otherwise(lit(null)).as("t_stat"),
      when(ok, (se2 * se2) /
          (vn1 * vn1 / (col("n1") - 1) + vn2 * vn2 / (col("n2") - 1)))
        .otherwise(lit(null)).as("df"))
  }

  def welchTTestSql(
      table: String, metricExpr: String, cohortExpr: String,
      a: String, b: String): String = {
    val g = s"CAST(ROUND(($metricExpr) * 100) AS BIGINT)"
    def side(tag: String, v: String) = Seq(
      s"COUNT(CASE WHEN ($cohortExpr) = '$v' THEN 1 END) AS n$tag",
      s"SUM(CAST(CASE WHEN ($cohortExpr) = '$v' THEN $g ELSE 0 END AS HUGEINT)) AS s$tag",
      s"SUM(CAST(CASE WHEN ($cohortExpr) = '$v' THEN $g * $g ELSE 0 END AS HUGEINT)) AS q$tag")
    val stats = (side("1", a) ++ side("2", b)).mkString(",\n    ")
    def dbl(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"
    // literals CAST to DOUBLE: DuckDB's bare 100.0 is DECIMAL and would
    // compute the denominator exactly where Spark rounds per step
    def mean(tag: String) =
      s"(${dbl(s"s$tag")} / (CAST(100.0 AS DOUBLE) * n$tag))"
    def svar(tag: String) =
      s"(${dbl(s"CAST(n$tag AS HUGEINT) * q$tag - s$tag * s$tag")} / " +
        s"(CAST(10000.0 AS DOUBLE) * n$tag * (n$tag - 1)))"
    val vn1 = s"(${svar("1")} / n1)"
    val vn2 = s"(${svar("2")} / n2)"
    val se2 = s"($vn1 + $vn2)"
    s"""WITH st AS (
       |  SELECT $stats
       |  FROM $table)
       |SELECT '$a' AS cohort_a, '$b' AS cohort_b,
       |  CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       |  CASE WHEN n1 >= 1 THEN ${mean("1")} END AS mean_a,
       |  CASE WHEN n2 >= 1 THEN ${mean("2")} END AS mean_b,
       |  CASE WHEN n1 >= 2 AND n2 >= 2
       |    THEN (${mean("1")} - ${mean("2")}) / SQRT($se2) END AS t_stat,
       |  CASE WHEN n1 >= 2 AND n2 >= 2
       |    THEN ($se2 * $se2) /
       |      ($vn1 * $vn1 / (n1 - 1) + $vn2 * $vn2 / (n2 - 1)) END AS df
       |FROM st""".stripMargin
  }

  /** Pearson chi-square independence test between two categorical
    * columns — the distribution-shift test (is order priority
    * independent of order year?). χ² = Σ_cells (O−E)²/E with
    * E = rowTot·colTot/n, computed as exact-integer numerators in
    * DECIMAL(38,0): per cell (O·n − rt·ct)²/(n·rt·ct) — one IEEE
    * division per cell, each term snapped to the 1e9 grid and summed
    * in decimal so cell order can't move a bit. ABSENT cells (O = 0,
    * E > 0) are materialized via the level cross join — dropping them
    * understates χ². One (a, b) count agg + two marginal aggs (all
    * tiny) + a levels cross join; nothing data-sized past the first
    * shuffle.
    *
    * Exactness bound: the squared numerator (O·n − rt·ct)² is ≤ n⁴, so
    * DECIMAL(38,0) holds it exactly only while n ≤ ~3.16e9 rows (DuckDB's
    * HUGEINT has the same ~1.7e38 ceiling but errors instead of
    * NULLing). Past that, Spark non-ANSI decimal overflow would yield
    * NULL terms that silently DROP from the sum — so the plan carries an
    * `assert_true(n ≤ 3e9)` guard that fails the query loudly instead.
    * Beyond the bound, compute terms in double (χ² is a test statistic;
    * at 3e9+ observations the p-value is saturated anyway). */
  def chiSquare(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val Dec = DecimalType(38, 0)
    val cells = df.select(aCol.as("a"), bCol.as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("a").agg(sum("o").as("rt"))
    val colTot = cells.groupBy("b").agg(sum("o").as("ct"))
    val nRow = cells.agg(sum("o").as("n"))
    def dbl(c: Column): Column = c.cast("string").cast("double")
    val dense = rowTot.crossJoin(colTot)
      .join(cells, Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("rt"), col("ct"),
        coalesce(col("o"), lit(0L)).as("o"))
      .crossJoin(broadcast(nRow))
    val num = (col("o").cast(Dec) * col("n").cast(Dec)
      - col("rt").cast(Dec) * col("ct").cast(Dec))
    val den = col("n").cast(Dec) * col("rt").cast(Dec) * col("ct").cast(Dec)
    val term = dbl(num * num) / dbl(den)
    // num² ≤ n⁴ only fits DECIMAL(38,0) while n ≤ ~3.16e9; overflow in
    // non-ANSI mode NULLs terms that then silently drop from the sum.
    // Fail loudly at the bound instead (assert_true → null when ok).
    val guard = coalesce(
      assert_true(col("n") <= lit(3000000000L),
        lit("chiSquare: n exceeds 3e9 — (O*n - rt*ct)^2 would overflow " +
          "DECIMAL(38,0); use a double-precision variant at this scale"))
        .cast("double"),
      lit(0.0))
    dense
      .select(round(term * lit(1e9) + guard).cast(Dec).as("tg"),
        col("a"), col("b"), col("n"))
      .agg(
        (sum(col("tg")).cast("string").cast("double") / lit(1e9)).as("chi2"),
        ((countDistinct(col("a")) - 1) * (countDistinct(col("b")) - 1))
          .as("dof"),
        first(col("n")).as("n"))
  }

  def chiSquareSql(table: String, aExpr: String, bExpr: String): String =
    s"""WITH cells AS (
       |  SELECT $aExpr AS a, $bExpr AS b, COUNT(*) AS o
       |  FROM $table GROUP BY 1, 2),
       |rt AS (SELECT a, SUM(o) AS rt FROM cells GROUP BY a),
       |ct AS (SELECT b, SUM(o) AS ct FROM cells GROUP BY b),
       |nn AS (SELECT SUM(o) AS n FROM cells),
       |dense AS (
       |  SELECT rt.a, ct.b, rt.rt, ct.ct, COALESCE(c.o, 0) AS o, nn.n
       |  FROM rt CROSS JOIN ct
       |  LEFT JOIN cells c ON c.a = rt.a AND c.b = ct.b
       |  CROSS JOIN nn),
       |terms AS (
       |  SELECT a, b, n,
       |    CAST(ROUND(
       |      CAST(CAST((CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
       |             * (CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
       |           AS VARCHAR) AS DOUBLE)
       |      / CAST(CAST(CAST(n AS HUGEINT) * rt * ct AS VARCHAR) AS DOUBLE)
       |      * 1e9) AS HUGEINT) AS tg
       |  FROM dense)
       |SELECT
       |  CAST(CAST(SUM(tg) AS VARCHAR) AS DOUBLE) / 1e9 AS chi2,
       |  (COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) AS dof,
       |  CAST(MIN(n) AS BIGINT) AS n
       |FROM terms""".stripMargin

  /** Exact AUC (area under the ROC curve) of a score column against a
    * binary label — the classifier-eval primitive a quality-filter
    * pipeline needs (is the quality score actually separating
    * good/bad docs?). Computed as the tie-corrected Mann-Whitney U,
    * never by materializing ranks over raw rows:
    *
    *   per DISTINCT score s:   np(s), nn(s)            (one agg)
    *   cumnn(s) = Σ nn over scores < s                 (window on the
    *                                                    distinct-score
    *                                                    relation)
    *   2·U = Σ_s np(s)·(2·cumnn(s) + nn(s))            (ties count ½)
    *   AUC = 2U / (2·Npos·Nneg)
    *
    * All integer arithmetic runs in DECIMAL(38,0) (2U ≤ n²/2, so exact
    * to n ≈ 2.6e19 rows); the only float op is the final division of
    * the two string-cast exact integers — one correctly-rounded IEEE
    * divide, bit-identical across engines. The emitted `u2` is cast
    * BIGINT behind an assert_true(2U < 2^63) guard (loud, not silent,
    * past ~4.3e9 balanced rows; the internal decimal math is already
    * 100 TB-exact — only the output cast narrows).
    *
    * Scale: one groupBy(score) with map-side partials, then a
    * strict-prefix sum over the DISTINCT-score relation through
    * [[Prefix.runningSum]] (range-partition the scores, fold within
    * each partition in parallel, broadcast per-partition totals as
    * offsets) — so even genuinely continuous scores, where distinct-s
    * ≈ every row, never funnel into a single-partition window. The
    * reassociated sums are exact integers, bit-identical to the
    * serial fold. */
  def aucExact(df: DataFrame, score: Column, label: Column): DataFrame = {
    val Dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val g = df.select(score.as("s"),
        when(label, 1L).otherwise(0L).as("y"))
      .groupBy("s").agg(sum("y").as("np"),
        (count(lit(1)) - sum("y")).as("nn"))
    // strict-prefix sum over the distinct-score relation via the
    // distributed two-pass fold — for continuous scores that relation
    // is data-sized, so no unpartitioned window here
    val terms = Prefix.runningSum(g, Seq(col("s")), col("nn"),
        "cumnn", inclusive = false)
      .withColumn("cumnn", coalesce(col("cumnn"), lit(0L)))
    val tot = terms.agg(
      sum(col("np")).as("n_pos"),
      sum(col("nn")).as("n_neg"),
      sum(col("np").cast(Dec) *
        (col("cumnn").cast(Dec) * 2 + col("nn").cast(Dec))).as("u2d"))
    val guard = coalesce(
      assert_true(col("u2d") < lit(Long.MaxValue).cast(Dec),
        lit("aucExact: 2U exceeds BIGINT — widen the output column " +
          "(internal decimal math is still exact)")).cast("long"),
      lit(0L))
    tot.select(
      col("n_pos"), col("n_neg"),
      (col("u2d").cast("long") + guard).as("u2"),
      (col("u2d").cast("string").cast("double") /
        (col("n_pos").cast(Dec) * col("n_neg").cast(Dec) * 2)
          .cast("string").cast("double")).as("auc"))
  }

  /** Precision–recall curve at EVERY distinct score threshold — the
    * classifier-eval companion to [[aucExact]] (ROC summarizes ranking;
    * the PR curve is what you read to PICK the deployment threshold on
    * an imbalanced gate). Predict-positive-at-score-≥-s gives, per
    * distinct s: TP = Σ positives above, FP = Σ negatives above,
    * precision TP/(TP+FP), recall TP/P, F1.
    *
    * Scale shape mirrors aucExact: one distinct-score aggregate, then
    * the distributed two-pass prefix fold — BOTH running counts ride in
    * ONE fold by packing (np·2³¹ + nn) into a single long (exact while
    * the corpus is < 2³¹ rows, enforced by an assert_true guard the
    * same way aucExact guards its U statistic; the internal fold is the
    * thing that must stay single so the range exchange runs once).
    * Ratios are IEEE divisions of exact integers. Zero-TP thresholds
    * (possible prefix: top-scored rows all negative) yield NULL F1. */
  def prCurve(df: DataFrame, score: Column, label: Column): DataFrame = {
    val M = 2147483648L // 2^31
    val g = df.select(score.as("s"),
        when(label, 1L).otherwise(0L).as("y"))
      .groupBy("s").agg(sum("y").as("np"),
        (count(lit(1)) - sum("y")).as("nn"))
    val cum = Prefix.runningSum(g, Seq(col("s").desc),
      col("np") * M + col("nn"), "cum", inclusive = true)
    val tot = g.agg(
      sum("np").as("n_pos"),
      coalesce(assert_true(sum(col("np") + col("nn")) < M,
          lit("prCurve: corpus exceeds 2^31 rows — widen the packing"))
        .cast("long"), lit(0L)).as("z"))
    val tp = expr("cum div 2147483648") + col("z")
    val fp = col("cum") % lit(M)
    val p = tp.cast("double") / (tp + fp)
    val r = tp.cast("double") / col("n_pos")
    cum.crossJoin(broadcast(tot))
      .select(col("s").as("threshold"), tp.as("tp"), fp.as("fp"),
        p.as("prec"), r.as("rec"),
        when(tp > 0, lit(2.0) * p * r / (p + r))
          .otherwise(lit(null)).as("f1"))
  }

  /** DuckDB twin over any relation expression with (score, label). */
  def prCurveSql(rel: String, scoreExpr: String, labelExpr: String): String =
    s"""WITH gpr AS (SELECT ($scoreExpr) AS s,
       |    SUM(CASE WHEN ($labelExpr) THEN 1 ELSE 0 END) AS np,
       |    COUNT(*) - SUM(CASE WHEN ($labelExpr) THEN 1 ELSE 0 END) AS nn
       |  FROM $rel GROUP BY 1),
       |cpr AS (SELECT s,
       |    CAST(SUM(np) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
       |    CAST(SUM(nn) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
       |  FROM gpr),
       |tpr AS (SELECT SUM(np) AS n_pos FROM gpr),
       |ipr AS (SELECT s, tp, fp,
       |    CAST(tp AS DOUBLE) / (tp + fp) AS prec,
       |    CAST(tp AS DOUBLE) / n_pos AS rec
       |  FROM cpr, tpr)
       |SELECT s AS threshold, tp, fp, prec, rec,
       |  CASE WHEN tp > 0
       |    THEN CAST(2.0 AS DOUBLE) * prec * rec / (prec + rec) END AS f1
       |FROM ipr""".stripMargin

  /** Split-conformal calibration (Vovk et al.; the distribution-free
    * coverage guarantee): on a CALIBRATION split, take the
    * ⌈(n+1)(1−α)⌉-th smallest nonconformity score q̂; predictions on
    * fresh data whose score ≤ q̂ then cover the truth with probability
    * ≥ 1−α, no matter what the model is. Here the score is the NB
    * margin signed against the true label (s = −margin for English
    * docs, +margin otherwise — "how wrong was the scorer"), calibration
    * = doc_id%4==1, evaluation = %4==3, and the output is one row:
    * (n_cal, n_eval, qhat, coverage).
    *
    * The rank selection runs through the distributed prefix fold (rank
    * = running count over the unique (s, doc_id) order), with the
    * target rank ⌈(n+1)·(1−α)⌉ computed in exact integer arithmetic
    * (((n+1)·k + d − 1) div d for α = 1 − k/d) — at extreme scale
    * swap the exact rank for the fixed-bin quantile (binnedQuantiles)
    * exactly as events_mad documents. */
  def conformal(
      scored: DataFrame, alphaNum: Int = 1, alphaDen: Int = 10): DataFrame = {
    val keepNum = alphaDen - alphaNum // (1-α) = keepNum/alphaDen
    val s = when(col("is_en"), lit(0.0) - col("margin"))
      .otherwise(col("margin"))
    val cal = scored.filter(col("doc_id") % 4 === 1)
      .select(col("doc_id"), s.as("s"))
    val ev = scored.filter(col("doc_id") % 4 === 3)
      .select(col("doc_id"), s.as("s"))
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    val ranked = Prefix.runningSum(cal,
      Seq(col("s").asc, col("doc_id").asc), lit(1L), "rk")
    val qhat = ranked.crossJoin(broadcast(nCal))
      .filter(col("rk") ===
        expr(s"((n_cal + 1) * $keepNum + ${alphaDen - 1}) div $alphaDen"))
      .select(col("s").as("qhat"), col("n_cal"))
    ev.crossJoin(broadcast(qhat))
      .agg(max(col("n_cal")).as("n_cal"),
        count(lit(1)).as("n_eval"),
        max(col("qhat")).as("qhat"),
        (sum(when(col("s") <= col("qhat"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("coverage"))
  }

  /** DuckDB twin over a relation with (doc_id, margin, is_en). */
  def conformalSql(
      rel: String, alphaNum: Int = 1, alphaDen: Int = 10): String = {
    val keepNum = alphaDen - alphaNum
    s"""WITH sc AS (SELECT doc_id,
       |    CASE WHEN is_en THEN 0.0 - margin ELSE margin END AS s
       |  FROM ($rel) r),
       |cal AS (SELECT doc_id, s FROM sc WHERE doc_id % 4 = 1),
       |ev AS (SELECT doc_id, s FROM sc WHERE doc_id % 4 = 3),
       |nc AS (SELECT COUNT(*) AS n_cal FROM cal),
       |rk AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s ASC, doc_id ASC)
       |    AS rk FROM cal),
       |qh AS (SELECT rk.s AS qhat, nc.n_cal FROM rk, nc
       |  WHERE rk.rk = ((n_cal + 1) * $keepNum + ${alphaDen - 1})
       |    // $alphaDen)
       |SELECT MAX(qh.n_cal) AS n_cal, COUNT(*) AS n_eval,
       |  MAX(qh.qhat) AS qhat,
       |  CAST(SUM(CASE WHEN ev.s <= qh.qhat THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*) AS coverage
       |FROM ev, qh""".stripMargin
  }

  /** Benford first-significant-digit test over a positive 2-decimal
    * money column — the fabricated-data / unit-mixup screen. The digit
    * is extracted WITHOUT logarithms: round(x·100) is an exact long
    * (cents grid), cast to string identically in both engines, first
    * char → digit — no libm in the digit path at all. Nonpositive
    * amounts leave the digit domain identically in both engines: the
    * leading '-'/'0' fails the digit cast (Spark non-ANSI cast → NULL,
    * oracle TRY_CAST → NULL) and the >= 1 filter drops it. Expected Benford
    * mass log10(1+1/d) = plog(1+1/d)/plog(10) uses the portable ln on
    * ≥1 arguments; observed fraction is one exact-integer division.
    * Output: one row per digit 1-9 (absent digits materialized with
    * n = 0) with observed n, frac, benford_p, and the signed gap.
    *
    * Scale: one 9-bucket count agg with map-side partials — the scan
    * is the cost; everything after is a 9-row projection. */
  def benford(df: DataFrame, amount: Column): DataFrame = {
    val digits = org.apache.spark.sql.functions.broadcast(
      df.sparkSession.range(1, 10).toDF("digit"))
    val obs = df.select(
        substring(round(amount * 100).cast("long").cast("string"), 1, 1)
          .cast("int").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = obs.agg(sum("n").as("t"))
    val ten = graft.functions.PortableMath.plog(lit(10.0))
    digits.join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("t").cast("double")).as("frac"),
        (graft.functions.PortableMath.plog(
          lit(1.0) + lit(1.0) / col("digit").cast("double")) / ten)
          .as("benford_p"))
      .withColumn("gap", col("frac") - col("benford_p"))
  }

  def benfordSql(table: String, amountExpr: String): String = {
    import graft.functions.PortableMath.plogSql
    s"""WITH obs AS (
       |  SELECT digit, COUNT(*) AS n FROM (
       |    SELECT TRY_CAST(SUBSTR(CAST(CAST(ROUND(($amountExpr) * 100)
       |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
       |    FROM $table) d
       |  WHERE digit >= 1 GROUP BY digit),
       |tot AS (SELECT SUM(n) AS t FROM obs),
       |digits AS (SELECT CAST(u.d AS BIGINT) AS digit
       |  FROM unnest(generate_series(1, 9)) u(d)),
       |j AS (SELECT dg.digit, COALESCE(o.n, 0) AS n,
       |    CAST(1.0 + 1.0 / CAST(dg.digit AS DOUBLE) AS DOUBLE) AS br
       |  FROM digits dg LEFT JOIN obs o ON dg.digit = o.digit)
       |SELECT digit, n,
       |  CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS frac,
       |  (${plogSql("br")}) / (${plogSql("10.0")}) AS benford_p,
       |  CAST(n AS DOUBLE) / CAST(t AS DOUBLE)
       |    - (${plogSql("br")}) / (${plogSql("10.0")}) AS gap
       |FROM j CROSS JOIN tot""".stripMargin
  }

  def aucExactSql(table: String, scoreExpr: String,
      labelExpr: String): String =
    s"""WITH s AS (
       |  SELECT $scoreExpr AS s,
       |    CASE WHEN $labelExpr THEN 1 ELSE 0 END AS y FROM $table),
       |g AS (SELECT s, SUM(y) AS np, COUNT(*) - SUM(y) AS nn
       |  FROM s GROUP BY s),
       |t AS (SELECT np, nn, COALESCE(SUM(nn) OVER (ORDER BY s
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumnn
       |  FROM g)
       |SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
       |  CAST(SUM(nn) AS BIGINT) AS n_neg,
       |  CAST(SUM(CAST(np AS HUGEINT) *
       |    (CAST(cumnn AS HUGEINT) * 2 + nn)) AS BIGINT) AS u2,
       |  CAST(CAST(SUM(CAST(np AS HUGEINT) *
       |      (CAST(cumnn AS HUGEINT) * 2 + nn)) AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(CAST(SUM(np) AS HUGEINT) * SUM(nn) * 2
       |        AS VARCHAR) AS DOUBLE) AS auc
       |FROM t""".stripMargin
}
