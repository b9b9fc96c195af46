package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every registered query plus the end-to-end
  * k-means fit on SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Queries are executed through the noop sink — full physical execution
  * (scan, shuffles, projections) with zero write cost; a bare count()
  * would let Catalyst prune the very work being measured. A failed query
  * reports -1 in "queries" and its error in "errors" instead of
  * masquerading as a fast run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execute(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def timed(body: => Unit): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      try { body; ((System.nanoTime() - t0) / 1e9, None) }
      catch { case e: Throwable =>
        (-1.0, Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
      }
    }

    // Warm the JVM/codegen paths so per-query numbers measure steady-
    // state operator cost, not first-call compilation: run every query
    // once at the smallest SF — plan structure is scale-invariant, so
    // the generated-code cache hits for the timed runs (first cold run
    // measured ~3x slower than the second on identical plans). Data
    // caches are cleared so only code stays warm.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      SparkEntry.queries.values.foreach { fn =>
        try execute(fn(spark, warmDir)) catch { case _: Throwable => }
        finally spark.catalog.clearCache()
      }
    }
    try execute(Tables.points(spark, sfDir).limit(1000)) catch { case _: Throwable => }

    // Best of three runs per query, ALL run times emitted (the r5 min-
    // only report hid the spread needed to adjudicate a 1.9 s -> 8.6 s
    // single-query anomaly): single-run timings on a shared host show up
    // to 10x scheduler/IO noise on individual queries (observed: the
    // same 1-shuffle k-group aggregate at 1.5 s and 15 s across
    // consecutive runs of the same binary). The minimum is the steady-
    // state operator cost and stays the headline "queries" value; the
    // per-run spread lands in "runs"; errors are taken from the first
    // failing run.
    def bestOf(n: Int)(body: => Unit): (Seq[Double], Double, Option[String]) = {
      val runs = (1 to n).map { _ =>
        val r = timed(body)
        // drop any caches a query created so later timings aren't
        // distorted by accumulated memory pressure
        spark.catalog.clearCache()
        r
      }
      val ok = runs.filter(_._2.isEmpty)
      if (ok.nonEmpty) (runs.map(_._1), ok.map(_._1).min, None)
      else (runs.map(_._1), -1.0, runs.head._2)
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (runs, best, err) = bestOf(3)(execute(fn(spark, sfDir)))
      (name, runs, best, err)
    }

    // end-to-end Lloyd fit, 10 iterations (the reference's flagship run;
    // BASELINE.md: Flink p=4 does 1M pts / 10 iters in ~12.2 s).
    // exact=false = plain IEEE double sums — the reference's own
    // arithmetic (KMeans.java:311-336), the honest apples-to-apples
    // baseline comparison and the production default at scale; the
    // decimal-exact path stays fully oracle-checked via the registered
    // kmeans_fit10_obj query. The two agree to ~1e-13 relative.
    val (fitRuns, fitSec, fitErr) = bestOf(2) {
      val res = kmeans.KMeansFit.fit(
        Tables.points(spark, sfDir),
        Tables.initCentroids(spark, sfDir, 8),
        kmeans.KMeansConfig(k = 8, maxIter = 10, convergence = false),
        exact = false)
      require(res.centroids.nonEmpty)
    }
    val all = results :+ (("kmeans_fit10", fitRuns, fitSec, fitErr))

    // The fit at the baseline's own headline scale (BASELINE.md: 10M
    // points / 10 iters / p=4 = 90.8 s): 10M deterministic synthetic
    // points materialized once as parquet scratch under target/, then
    // the identical fit path. Reported OUTSIDE "queries" so the
    // cross-round sf0.1 total stays comparable.
    val fit10m =
      if (sys.env.get("SPARK_GRAFT_SKIP_10M").contains("1")) None
      else Some(timed10m(spark))

    val load = try {
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").head
    } catch { case _: Throwable => "-1" }
    try {
      val w = new java.io.PrintWriter("BENCH_DETAIL.json")
      try w.println(detailJson(all, load, cpus, fit10m, sfDir)) finally w.close()
    } catch { case _: Throwable => () }
    println(summaryLine(all, load, fit10m, sfDir))
    spark.stop()
  }

  /** One query's bench record: (name, per-run seconds, best, error). */
  type QueryResult = (String, Seq[Double], Double, Option[String])

  private def jsonEsc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def errsJson(all: Seq[QueryResult]): String =
    all.collect { case (k, _, _, Some(e)) => s""""$k":"${jsonEsc(e)}"""" }
      .mkString("{", ",", "}")

  /** The ONE stdout line the harness parses. The harness keeps only the
    * LAST ~2000 chars of this process's output and extracts the JSON line
    * from that window — every prior round's line, carrying the full
    * per-run arrays at full precision, overflowed the window and landed
    * as parsed:null. So this stays compact (2-decimal best-of values
    * only; `BenchFormatSpec` guards the budget) and the per-run spreads
    * go to BENCH_DETAIL.json via [[detailJson]]. */
  private[graft] def summaryLine(
      all: Seq[QueryResult], load: String,
      fit10m: Option[(Seq[Double], Option[String])], sfDir: String): String = {
    val qs = all.map { case (k, _, v, _) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    val total = all.map(_._3).filter(_ >= 0).sum
    val fit10mJson = fit10m.map { case (rs, err) =>
      val v = if (rs.nonEmpty) rs.min else -1.0
      f""","fit10m":{"sec":$v%.2f,"rows":10000000,"iters":10,"baseline_flink_p4_sec":90.8""" +
        err.map(e => s""","error":"${jsonEsc(e.replace("\"", "'"))}"""").getOrElse("") + "}"
    }.getOrElse("")
    f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,""" +
      s""""errors":${errsJson(all)},"loadavg":$load$fit10mJson,""" +
      s""""detail":"BENCH_DETAIL.json","sf":"$sfDir"}"""
  }

  /** Full-precision companion written next to the repo's round artifacts:
    * every per-query run time (the spread that adjudicates host-noise
    * anomalies), errors, and environment. */
  private[graft] def detailJson(
      all: Seq[QueryResult], load: String, cpus: String,
      fit10m: Option[(Seq[Double], Option[String])], sfDir: String): String = {
    val runsJson = all.map { case (k, rs, _, _) =>
      s""""$k":${rs.mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val fullQs = all.map { case (k, _, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val f10 = fit10m.map { case (rs, _) =>
      s""","fit10m_runs":${rs.mkString("[", ",", "]")}"""
    }.getOrElse("")
    s"""{"queries":$fullQs,"runs":$runsJson,"errors":${errsJson(all)},""" +
      s""""loadavg":$load,"cpus":$cpus$f10,"sf":"$sfDir"}"""
  }

  /** Generate-once 10M-point parquet scratch + two timed fits over it.
    * x/y are hash-derived uniforms on [0, 100000) — deterministic, no
    * RNG state, and the same value range as the testdata points. */
  private def timed10m(spark: SparkSession): (Seq[Double], Option[String]) = {
    import org.apache.spark.sql.functions._
    val path = "target/bench_points_10m.parquet"
    try {
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        spark.range(0, 10000000L, 1, 32)
          .select(col("id").as("pid"),
            (pmod(xxhash64(col("id"), lit(1)), lit(10000000L)) / 100.0).as("x"),
            (pmod(xxhash64(col("id"), lit(2)), lit(10000000L)) / 100.0).as("y"))
          .write.mode("overwrite").parquet(path)
      }
      val pts = spark.read.parquet(path)
      val init = pts.orderBy("pid").limit(8).collect().zipWithIndex
        .map { case (r, i) => kmeans.Cent(i, r.getDouble(1), r.getDouble(2)) }.toSeq
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // exact=false: the reference's plain-double arithmetic (see the
        // kmeans_fit10 comment above)
        val res = kmeans.KMeansFit.fit(pts, init,
          kmeans.KMeansConfig(k = 8, maxIter = 10, convergence = false),
          exact = false)
        require(res.centroids.nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      (runs, None)
    } catch { case e: Throwable =>
      (Seq.empty, Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
    }
  }
}
