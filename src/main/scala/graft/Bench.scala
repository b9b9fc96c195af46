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

    // SPARK_GRAFT_ONLY=q1,q2 runs an isolated subset — the knob that
    // lets a regression be re-measured in a fresh session without the
    // other 60+ queries sharing the BlockManager. (Defined before the
    // warmup so an isolation run warms only what it times.)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    // The timed board = every oracle-gated query + the bench-only
    // engine-native variants (xxhash64 dedup, t-digest/HLL sketches) —
    // those are the production-fast paths whose correctness rides on
    // their gated same-DAG twins.
    val board = SparkEntry.queries ++ SparkEntry.benchOnly

    // Loadavg gate for the COLD start only: if the host is already busy
    // before the first timed pass, wait (bounded) for it to drain and
    // record the wait — between passes the 1-min load reflects this
    // JVM's own bursts, so mid-board adjudication is the control's job,
    // not the gate's. Sampled and waited BEFORE every warmup pass (r15
    // advice: the sf0.001 board warm, the fit warmup and the control's
    // codegen warm are all-CPU bursts, so gating after them measured
    // the JVM's own warm-up as "host busy" and could burn up to 300 s
    // of pointless sleep). SPARK_GRAFT_LOAD_GATE=-1 disables.
    val gateMax = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE", "3.0").toDouble
    var gateWaited = 0
    val gateLoad0 = loadNow()
    if (gateMax > 0 && only.isEmpty) {
      def load1(): Double =
        try loadNow().toDouble catch { case _: Throwable => -1.0 }
      while (load1() > gateMax && gateWaited < 300) {
        Thread.sleep(15000); gateWaited += 15
      }
    }
    val gateLoad1 = loadNow()


    // Warm the JVM/codegen paths so per-query numbers measure steady-
    // state operator cost, not first-call compilation: run every
    // selected query once at the smallest SF — plan structure is
    // scale-invariant, so the generated-code cache hits for the timed
    // runs (first cold run measured ~3x slower than the second on
    // identical plans). Data caches are cleared so only code stays warm.
    val warmDir = "/root/testdata/sf0.001"
    val warmSet = only.fold(board)(names =>
      board.view.filterKeys(names).toMap)
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      warmSet.values.foreach { fn =>
        try execute(fn(spark, warmDir)) catch { case _: Throwable => }
        finally spark.catalog.clearCache()
      }
    }
    try execute(Tables.points(spark, sfDir).limit(1000)) catch { case _: Throwable => }
    // Isolation runs (the fork re-measure path) get one untimed pass at
    // the TARGET SF too: their whole point is steady-state adjudication,
    // and a cold JVM pays per-iteration codegen/JIT exactly where the
    // long-lived main session doesn't (the r9 fork measured a 10-
    // iteration fit at 45s that the warm session ran in 6.5s — compile
    // cost masquerading as operator cost).
    if (only.nonEmpty) warmSet.values.foreach { fn =>
      try execute(fn(spark, sfDir)) catch { case _: Throwable => }
      finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }

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
        // Drop EVERYTHING a query persisted so later timings aren't
        // distorted by accumulated memory pressure. clearCache() only
        // releases catalog-cached relations — localCheckpoint() blocks
        // (dedup_groups persists one per CC round) stay in the
        // BlockManager and, as the query set grew, evicted each other in
        // a churn that showed up as the r7 1.6-2.4x dedup/embedding
        // regressions (BlockManager re-add warnings in the r7 tail).
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        r
      }
      val ok = runs.filter(_._2.isEmpty)
      if (ok.nonEmpty) (runs.map(_._1), statOf(ok.map(_._1)), None)
      else (runs.map(_._1), -1.0, runs.head._2)
    }

    // ivf_topk_indexed is timed separately below with its index built
    // OUTSIDE the timed body (the registered query rebuilds+rewrites the
    // index inside the query fn for the oracle gate's sake — benching
    // that would just re-measure ivf_topk plus a parquet write)
    val selected = (only.fold(board)(names =>
      board.view.filterKeys(names).toMap)) -
      "ivf_topk_indexed" - "pq_topk_indexed" - "ivfpq_topk_indexed" -
      "emb_sq8_topk_indexed"

    var loads = Map.empty[String, String]

    // Untimed TARGET-SF warmup for the fit-family entries before any
    // timed pass (r10: kmeans_fit10_obj measured 8.5 s cold vs 4.0 s
    // warm purely from suite position — the sf0.001 warmup pass does
    // not warm the 10-superstep path at target scale).
    selected.get("kmeans_fit10_obj").foreach { fn =>
      try execute(fn(spark, sfDir)) catch { case _: Throwable => }
      finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }

    // ---- r15: load-controlled boards (r14 verdict item 2) ----
    // A fixed in-JVM CONTROL job — data-independent, constant size, all
    // CPU — timed around every interleaved pass. The r14 frozen set
    // read +11% vs r13 with the drift diffuse across UNTOUCHED queries
    // and nothing in the artifact to separate host noise from real
    // regression; with the control alongside, "untouched queries drift
    // AND the control drifts" reads as contention, "queries drift while
    // the control holds" reads as a real regression.
    def controlOnce(): Double = {
      import org.apache.spark.sql.functions.{sum => fsum, xxhash64, col, pmod, lit}
      val t0 = System.nanoTime()
      // pmod bounds the summand so the 40M-row sum stays far under
      // 2^63 (ANSI overflow would otherwise throw)
      val r = spark.range(0L, 40000000L, 1L, 32)
        .select(fsum(pmod(xxhash64(col("id")), lit(1000000L))))
        .head().getLong(0)
      require(r != 0L)
      (System.nanoTime() - t0) / 1e9
    }
    try controlOnce() catch { case _: Throwable => } // codegen warm, untimed
    var controls = Vector.empty[Double]
    def control(phase: String): Unit = {
      controls :+= (try controlOnce() catch { case _: Throwable => -1.0 })
      loads += s"control_$phase" -> loadNow()
    }

    // Three INTERLEAVED full passes over the query set instead of three
    // consecutive runs per query: host-level stall windows here last
    // minutes (r8's official session measured assign_join at 66-87s in
    // all three back-to-back runs while the same commit did 2.4s in a
    // fresh session; SpanDedupBench reproduced 15s-vs-3s first-run
    // spreads on an idle host), so consecutive runs share fate with
    // whatever window they land in. Spreading a query's three runs
    // across the whole session decorrelates them — one clean run is
    // enough for the best-of to report steady-state cost.
    val ordered = selected.toSeq.sortBy(_._1)
    val runsAcc = scala.collection.mutable.Map.empty[String, Vector[(Double, Option[String])]]
    (1 to 3).foreach { pass =>
      control(s"pre$pass")
      ordered.foreach { case (name, fn) =>
        val prior = runsAcc.getOrElse(name, Vector.empty)
        // an errored query stays errored — don't burn two more passes on it
        if (!prior.exists(_._2.nonEmpty)) {
          val r = timed(execute(fn(spark, sfDir)))
          // Drop EVERYTHING a query persisted so later timings aren't
          // distorted by accumulated memory pressure (see bestOf note).
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          runsAcc(name) = prior :+ r
        }
        if (pass == 3) loads += name -> loadNow()
      }
    }
    control("post3")
    val results = ordered.map { case (name, _) =>
      val rs = runsAcc(name)
      val ok = rs.filter(_._2.isEmpty)
      if (ok.nonEmpty) (name, rs.map(_._1), statOf(ok.map(_._1)), None)
      else (name, rs.map(_._1), -1.0, rs.head._2)
    }

    // end-to-end Lloyd fit, 10 iterations (the reference's flagship run;
    // BASELINE.md: Flink p=4 does 1M pts / 10 iters in ~12.2 s).
    // exact=false = plain IEEE double sums — the reference's own
    // arithmetic (KMeans.java:311-336), the honest apples-to-apples
    // baseline comparison and the production default at scale; the
    // decimal-exact path stays fully oracle-checked via the registered
    // kmeans_fit10_obj query. The two agree to ~1e-13 relative.
    // Skipped under SPARK_GRAFT_ONLY unless named — isolation runs
    // should time exactly what they name.
    val runFit = only.forall(_.contains("kmeans_fit10"))
    def fitOnce(): Unit = {
      val res = kmeans.KMeansFit.fit(
        Tables.points(spark, sfDir),
        Tables.initCentroids(spark, sfDir, 8),
        kmeans.KMeansConfig(k = 8, maxIter = 10, convergence = false),
        exact = false)
      require(res.centroids.nonEmpty)
    }
    val (fitRuns, fitSec, fitErr) =
      if (!runFit) (Seq.empty[Double], -1.0, None)
      else {
        // one untimed warmup right before the timed entries (r10 item 7:
        // cold-JVM/suite-position noise moved the headline fit number)
        try fitOnce() catch { case _: Throwable => }
        bestOf(2)(fitOnce())
      }
    // The production ANN shape: the IVF index is built ONCE (untimed —
    // amortized across every query in real use, ~2 s of ivf_topk's
    // headline number is quantizer build) and persisted partitioned by
    // list_id; the timed body is the partition-pruned probe + rescore.
    // build-vs-probe split (r10 item 2): the untimed index builds below
    // are the SAME builds the build-inside-the-query entries (ivf_topk,
    // pq_topk, ivfpq_topk...) pay in their timed bodies — record their
    // seconds so BENCH_DETAIL explains those line items from JSON alone.
    val buildSecs = scala.collection.mutable.Map.empty[String, Double]
    val runIvfIndexed = only.forall(_.contains("ivf_topk_indexed"))
    val ivfIndexed: Option[QueryResult] = if (!runIvfIndexed) None else Some {
      try {
        val embs = Tables.table(spark, sfDir, "embeddings")
        val tb0 = System.nanoTime()
        val built = ops.IvfIndex.build(embs, nlist = 16, maxIter = 5,
          convergence = false)
        val path = "target/bench_ivf_index.parquet"
        ops.IvfIndex.writeIndex(built, path)
        buildSecs("ivf_topk") = (System.nanoTime() - tb0) / 1e9
        val q = ops.IvfIndex.vectors(embs)
          .filter(org.apache.spark.sql.functions.col("id") === 0L)
          .collect()(0).getSeq[Double](1)
        val idx = ops.IvfIndex.readIndex(spark, path, built.centroids)
        val (runs, best, err) =
          bestOf(3)(execute(ops.IvfIndex.search(spark, idx, q, k = 10, nprobe = 4)))
        ("ivf_topk_indexed", runs, best, err)
      } catch { case e: Throwable =>
        ("ivf_topk_indexed", Seq(-1.0), -1.0,
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
      }
    }
    ivfIndexed.foreach(_ => loads += "ivf_topk_indexed" -> loadNow())
    // Same amortization for PQ: codebooks + codes persisted once
    // (untimed); the timed body reads ONLY the codes table + rescores.
    val runPqIndexed = only.forall(_.contains("pq_topk_indexed"))
    val pqIndexed: Option[QueryResult] = if (!runPqIndexed) None else Some {
      try {
        val embs = Tables.table(spark, sfDir, "embeddings")
        val vecs = ops.IvfIndex.vectors(embs)
        val tb0 = System.nanoTime()
        val cb = ops.PqIndex.train(vecs, m = 4, nlist = 16, maxIter = 3)
        val path = "target/bench_pq_index.parquet"
        ops.PqIndex.writeIndex(vecs, cb, path)
        buildSecs("pq_topk") = (System.nanoTime() - tb0) / 1e9
        val q = vecs
          .filter(org.apache.spark.sql.functions.col("id") === 0L)
          .collect()(0).getSeq[Double](1)
        val (runs, best, err) =
          bestOf(3)(execute(ops.PqIndex.searchIndex(spark, path, q, k = 10)))
        ("pq_topk_indexed", runs, best, err)
      } catch { case e: Throwable =>
        ("pq_topk_indexed", Seq(-1.0), -1.0,
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
      }
    }
    pqIndexed.foreach(_ => loads += "pq_topk_indexed" -> loadNow())
    // SQ8: codes + grid persisted once (untimed); the timed body reads
    // only the 1-int/dim codes table + the d-row grid.
    val runSq8Indexed = only.forall(_.contains("emb_sq8_topk_indexed"))
    val sq8Indexed: Option[QueryResult] = if (!runSq8Indexed) None else Some {
      try {
        val embs = Tables.table(spark, sfDir, "embeddings")
        val path = "target/bench_sq8_index.parquet"
        val tb0 = System.nanoTime()
        ops.QuantOps.writeSq8Index(embs, path)
        buildSecs("emb_sq8_topk") = (System.nanoTime() - tb0) / 1e9
        val q = embs
          .filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
          .select(org.apache.spark.sql.functions.col("embedding")
            .cast("array<double>"))
          .head().getSeq[Double](0)
        val (runs, best, err) = bestOf(3)(
          execute(ops.QuantOps.searchSq8Index(spark, path, q, 0L, k = 10)))
        ("emb_sq8_topk_indexed", runs, best, err)
      } catch { case e: Throwable =>
        ("emb_sq8_topk_indexed", Seq(-1.0), -1.0,
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
      }
    }
    sq8Indexed.foreach(_ => loads += "emb_sq8_topk_indexed" -> loadNow())
    // And for the composed IVFADC: coarse lists + residual codebooks +
    // codes persisted once (untimed); the timed body is the partition-
    // pruned codes probe + ADC rescore — the production search path.
    val runIvfPqIndexed = only.forall(_.contains("ivfpq_topk_indexed"))
    val ivfPqIndexed: Option[QueryResult] = if (!runIvfPqIndexed) None else Some {
      try {
        val embs = Tables.table(spark, sfDir, "embeddings")
        val path = "target/bench_ivfpq_index.parquet"
        val tb0 = System.nanoTime()
        ops.PqIndex.writeIvfPqIndex(embs, nlistC = 8, maxIterC = 3,
          m = 4, nlist = 16, maxIter = 3, path)
        buildSecs("ivfpq_topk") = (System.nanoTime() - tb0) / 1e9
        buildSecs("ivfpq_topk_refined") = buildSecs("ivfpq_topk")
        val q = ops.IvfIndex.vectors(embs)
          .filter(org.apache.spark.sql.functions.col("id") === 0L)
          .head().getSeq[Double](1)
        val (runs, best, err) = bestOf(3)(
          execute(ops.PqIndex.searchIvfPqIndex(spark, path, q, k = 10, nprobe = 2)))
        ("ivfpq_topk_indexed", runs, best, err)
      } catch { case e: Throwable =>
        ("ivfpq_topk_indexed", Seq(-1.0), -1.0,
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
      }
    }
    ivfPqIndexed.foreach(_ => loads += "ivfpq_topk_indexed" -> loadNow())
    if (runFit) loads += "kmeans_fit10" -> loadNow()

    val all = results ++ ivfIndexed.toSeq ++ pqIndexed.toSeq ++
      sq8Indexed.toSeq ++ ivfPqIndexed.toSeq ++
      (if (runFit) Seq(("kmeans_fit10", fitRuns, fitSec, fitErr)) else Nil)

    // The fit at the baseline's own headline scale (BASELINE.md: 10M
    // points / 10 iters / p=4 = 90.8 s): 10M deterministic synthetic
    // points materialized once as parquet scratch under target/, then
    // the identical fit path. Reported OUTSIDE "queries" so the
    // cross-round sf0.1 total stays comparable.
    val fit10m =
      if (sys.env.get("SPARK_GRAFT_SKIP_10M").contains("1") || only.nonEmpty) None
      else Some(timed10m(spark))

    // Streaming surface (r10 item 4): MemoryStream throughput for the
    // stateful packer, the windowed agg, and the stream-stream
    // attribution join at the bench SF's full volume. Reported in a
    // separate "streaming" object so the cross-round batch total stays
    // comparable; skipped on subset runs.
    val streaming: Seq[tools.StreamBench.Res] =
      if (only.nonEmpty || sys.env.get("SPARK_GRAFT_SKIP_STREAM").contains("1")) Nil
      else try tools.StreamBench.run(spark, sfDir)
      catch { case _: Throwable => Nil }

    // Recall@10 of every approximate index vs its exact-metric ground
    // truth (r11 item 3) — quality alongside speed for the ANN family.
    val recall: Seq[tools.RecallBench.Res] =
      if (only.nonEmpty || sys.env.get("SPARK_GRAFT_SKIP_RECALL").contains("1")) Nil
      else try tools.RecallBench.run(spark, sfDir)
      catch { case _: Throwable => Nil }

    // Hot-key stress for the TopKPerKey consumers + quality_auc (r11
    // item 6): base-vs-20%-hot-key times; ratios ≫ 1 would mean the
    // partial-top-k / map-side-agg shapes don't actually bound skew.
    val skew: Seq[tools.SkewStress.Res] =
      if (only.nonEmpty || sys.env.get("SPARK_GRAFT_SKIP_SKEW").contains("1")) Nil
      else try tools.SkewStress.run(spark, sfDir)
      catch { case _: Throwable => Nil }

    val load = loadNow()
    // Self-defense against session-state anomalies (the r8 lesson:
    // assign_join measured 66-87 s across all three runs in the official
    // session vs 2.4 s for the same commit in a fresh one — host quiet,
    // code unchanged). Any query whose BEST time exceeds its anomaly
    // threshold is re-measured in a freshly forked JVM after the main
    // session stops, and the isolated numbers are appended to BOTH
    // artifacts — so the official bench carries its own adjudication
    // evidence instead of waiting a round for a manual rerun.
    val anomalies = all.collect {
      case (k, _, best, None) if best > anomalyThreshold(k) => (k, best)
    }.sortBy(-_._2).map(_._1).take(6)
    // Silence ALL logging before teardown: executor/BlockManager
    // shutdown occasionally WARN-logs a full ThreadPoolExecutor stack
    // that lands in the harness's captured tail just above the summary
    // line (BENCH_r11 tail). Timing is done; nothing after this point
    // should write to stdout/stderr except the summary line itself.
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    val remeasure: Either[String, Map[String, Double]] =
      if (only.nonEmpty || anomalies.isEmpty) Right(Map.empty)
      else remeasureIsolated(anomalies)
    val remeasureJson = remeasure match {
      case Right(m) if m.isEmpty => ""
      case Right(m) =>
        val qs = m.toSeq.sortBy(_._1)
          .map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
        s""","remeasure":$qs"""
      case Left(err) => s""","remeasure_error":"${jsonEsc(err.take(120))}""""
    }
    // control + gate evidence for BOTH artifacts: per-phase control
    // seconds (pre1..pre3, post3) and the cold-start gate record
    val controlJson =
      if (controls.isEmpty) ""
      else s""","control_sec":${controls.map(v => f"$v%.2f").mkString("[", ",", "]")}""" +
        s""","load_gate":{"max":$gateMax,"load_before":$gateLoad0,""" +
        s""""waited_sec":$gateWaited,"load_after_wait":$gateLoad1}"""
    val controlMed = medianOf(controls.filter(_ >= 0))
    try {
      val fresh = detailJson(all, load, cpus, fit10m, sfDir, loads,
        remeasureJson + controlJson, buildSecs.toMap, streaming, recall, skew)
      // A SPARK_GRAFT_ONLY subset run must never REPLACE the committed
      // full-suite snapshot (the r9 lesson: a 5-query sf0.01 re-run
      // overwrote the 132-query sf0.1 baseline). Same sf+cpus → merge
      // the per-query maps into the existing detail; different config →
      // write a side file and leave the baseline untouched.
      // A FULL-board run replaces the snapshot only at the SAME
      // sf+cpus; at a different config it diverts to the PARTIAL side
      // file too (r14: an sf0.001 format-validation full board
      // clobbered the committed sf0.1 baseline through this branch).
      val (path, content) =
        if (only.isEmpty) {
          val existing = new java.io.File("BENCH_DETAIL.json")
          val sameConfig = !existing.exists() || (try {
            import org.json4s._
            import org.json4s.jackson.JsonMethods
            val oldJ = JsonMethods.parse(new String(
              java.nio.file.Files.readAllBytes(existing.toPath), "UTF-8"))
            // type-normalized compare: "cpus" round-trips as a JSON
            // NUMBER (the r14 full sf0.1 board diverted to PARTIAL
            // because JInt(32) != JString("32") — the guard meant to
            // catch config drift rejected every same-config run)
            def str(v: JValue): String = v match {
              case JString(x) => x
              case JInt(x) => x.toString
              case JDouble(x) => x.toString
              case _ => ""
            }
            str(oldJ \ "sf") == sfDir && str(oldJ \ "cpus") == cpus
          } catch { case _: Throwable => true })
          if (sameConfig) ("BENCH_DETAIL.json", fresh)
          else ("BENCH_DETAIL_PARTIAL.json", fresh)
        } else mergeDetail(fresh)
      val w = new java.io.PrintWriter(path)
      try w.println(content)
      finally w.close()
    } catch { case _: Throwable => () }
    val summary = summaryLine(all, load, fit10m, sfDir,
      remeasure.getOrElse(Map.empty), remeasure.left.toOption, controlMed)
    // Emit the driver-contract line AFTER spark.stop(): executor/
    // BlockManager shutdown logging otherwise lands after the JSON in
    // the captured tail and has left the driver's "parsed" field null
    // in every round so far — the line must be the LAST thing on stdout.
    println(summary)
    System.out.flush()
  }

  /** Merge a subset run's detail JSON into the existing
    * BENCH_DETAIL.json: per-query maps (queries/runs/errors/load_after/
    * remeasure) are unioned with the new entries winning; scalar fields
    * keep the new run's values. If the existing snapshot was taken at a
    * different sf or cpu count, the subset result goes to
    * BENCH_DETAIL_PARTIAL.json instead so scale claims stay honest. */
  private def mergeDetail(fresh: String): (String, String) = try {
    val f = new java.io.File("BENCH_DETAIL.json")
    if (!f.exists()) return ("BENCH_DETAIL.json", fresh)
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val oldJ = JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    val newJ = JsonMethods.parse(fresh)
    if ((oldJ \ "sf") != (newJ \ "sf") || (oldJ \ "cpus") != (newJ \ "cpus"))
      return ("BENCH_DETAIL_PARTIAL.json", fresh)
    val perQuery =
      Set("queries", "medians", "runs", "errors", "load_after", "remeasure",
        "build_sec", "build_inside", "streaming", "recall", "skew_stress")
    val oldFields = oldJ match { case JObject(o) => o; case _ => Nil }
    val newFields = newJ match { case JObject(n) => n; case _ => Nil }
    val keys = (oldFields.map(_._1) ++ newFields.map(_._1)).distinct
    val merged = JObject(keys.flatMap { k =>
      val o = oldJ \ k; val n = newJ \ k
      val v = (o, n) match {
        case (JObject(of), JObject(nf)) if perQuery(k) =>
          JObject((of.toMap ++ nf.toMap).toList.sortBy(_._1))
        case (_, JNothing) => o
        case _ => n
      }
      if (v == JNothing) None else Some(k -> v)
    })
    ("BENCH_DETAIL.json", JsonMethods.compact(JsonMethods.render(merged)))
  } catch { case _: Throwable => ("BENCH_DETAIL_PARTIAL.json", fresh) }

  /** Per-query anomaly ceiling for the fresh-JVM re-measure: 3x the
    * known steady-state best (r7 + r8 fresh-session numbers cluster
    * under ~3.5 s per query; the heavy build-inside-the-query entries
    * get explicit allowances), floored at 6 s so ordinary noise never
    * triggers a fork. Flagging is cheap — a false positive costs one
    * isolated re-run that simply confirms the number. */
  private val ExpectedSec = Map(
    "pq_topk" -> 4.0, "kmeans_fit10" -> 3.5,
    // k-means|| sweep: 8-9 s steady at sf0.1 after the r14 incremental-
    // d2 rewrite (driver loop of 2R+2 jobs — scheduling-heavy, not an
    // anomaly until ~12 s)
    "init_kmeansbb" -> 4.0, "init_kmeansbb_final" -> 6.0,
    // full 10-iteration Lloyd loop — 3-6.5 s at sf0.1 is steady state,
    // not an anomaly (the r9 run flagged 6.5 s under the default 6 s
    // floor and burned a fork confirming nothing)
    "kmeans_fit10_obj" -> 3.0,
    // four ANN pipelines + two exact-truth scans in ONE gate query —
    // ~12 s at sf0.1 is its steady state, not an anomaly (the r16 run
    // burned a fork confirming 14 s ≈ 12.5 s)
    "emb_topk_recall" -> 5.0)
  private def anomalyThreshold(name: String): Double =
    sys.env.get("SPARK_GRAFT_ANOMALY_SEC").map(_.toDouble)
      .getOrElse(math.max(6.0, 3.0 * ExpectedSec.getOrElse(name, 2.0)))

  /** Fork `java -cp <this classpath> graft.Bench` with
    * SPARK_GRAFT_ONLY=<names> — a genuinely cold JVM, fresh BlockManager,
    * fresh codegen cache — and parse its summary line's "queries" map.
    * The child's ONLY-mode guard keeps it from recursing (isolation runs
    * never fork). */
  private def remeasureIsolated(
      names: Seq[String]): Either[String, Map[String, Double]] = try {
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("-Xmx") || a.startsWith("-Xms") ||
        a.startsWith("--enable-native-access"))
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"), "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_ONLY", names.mkString(","))
    pb.environment().put("SPARK_GRAFT_SKIP_10M", "1")
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val done = p.waitFor(900, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) { p.destroyForcibly(); Left("remeasure timeout") }
    else out.linesIterator.toSeq.reverse.find(_.startsWith("""{"metric"""")) match {
      case None => Left(s"no summary line (rc=${p.exitValue()})")
      case Some(line) =>
        // minimal extraction of the flat "queries":{...} object — values
        // are plain numbers, names are [A-Za-z0-9_], no nesting
        val m = """"([A-Za-z0-9_]+)":(-?[0-9.]+)""".r
        val qStart = line.indexOf(""""queries":{""")
        val qEnd = line.indexOf("}", qStart)
        if (qStart < 0 || qEnd < 0) Left("malformed summary line")
        else Right(m.findAllMatchIn(line.substring(qStart + 10, qEnd + 1))
          .map(g => g.group(1) -> g.group(2).toDouble)
          .filter(kv => names.contains(kv._1)).toMap)
    }
  } catch { case e: Throwable =>
    Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(80)}")
  }

  private def loadNow(): String = try {
    scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").head
  } catch { case _: Throwable => "-1" }

  /** One query's bench record: (name, per-run seconds, best, error). */
  type QueryResult = (String, Seq[Double], Double, Option[String])

  /** The FROZEN named set — exactly the 79 queries BENCH_r12 rendered
    * by name. Round-over-round total comparability died in r11→r12
    * (+36% "regression" that was really 48 new queries folding into
    * q_other), so the named set no longer drifts with coverage: these
    * names stay named, every other query folds into q_other, and
    * `named_total` is the like-for-like cross-round headline while
    * `folded_total` absorbs coverage growth (r12 verdict item 6). */
  private[graft] val NamedSet: Set[String] = Set(
    "assign_join", "basket_lift", "converge_filter", "corpus_overlap",
    "cube_pricing", "dedup_best", "dedup_containment", "dedup_corpus",
    "dedup_editdist", "dedup_eval", "dedup_groups", "dedup_incr_indexed",
    "dedup_incr_near", "dedup_minhash", "dedup_minhash_xx",
    "dedup_ngram_jaccard", "dedup_prefix_jaccard", "dedup_semantic",
    "dedup_semantic_pairs", "dedup_simhash", "dedup_simhash_xx",
    "dedup_span_stats", "dedup_spans", "dedup_threshold_curve",
    "docs_cluster", "dsir_select", "dsir_weights", "emb_hard_negatives",
    "emb_incr", "emb_knn_classify", "emb_knn_graph", "emb_lsh_topk",
    "emb_near_dups", "events_cusum", "events_survival",
    "graph_assortativity", "graph_bfs", "graph_cc", "graph_clustering",
    "graph_hits", "graph_kcore", "graph_labelprop", "graph_linkpred",
    "graph_modularity", "graph_pagerank", "graph_ppr", "graph_triangles",
    "init_kmeanspp", "ivf_topk", "ivfpq_topk", "ivfpq_topk_refined",
    "kmeans_fit10", "kmeans_fit10_obj", "kmeans_silhouette",
    "mm_phash_pairs", "objective_sum", "orders_rfm", "pipeline_decontam",
    "pipeline_pretrain", "pipeline_pretrain_seqs", "points_skyline",
    "pq_topk", "pricing_summary", "quality_conformal", "quality_pr_curve",
    "rank_eval", "sample_coreset", "stream_attribute", "stream_dedup",
    "stream_enrich", "stream_hourly_agg", "stream_latest",
    "stream_sessionize", "stream_sliding_agg", "text_bpe_train",
    "text_cms", "text_cosine_pairs", "text_lm2_score", "text_repetition",
    // + the production ANN probe rows (frozen as of r13): the
    // build-inside-the-body twins above (ivf_topk, pq_topk,
    // ivfpq_topk*) conflate codebook training with search, so the
    // probe latency the 100 TB design actually ships must be a named
    // row too, not a q_other resident (r12 verdict item 5)
    "ivf_topk_indexed", "pq_topk_indexed", "ivfpq_topk_indexed",
    "emb_sq8_topk_indexed")

  /** Named-set v2 (r13 verdict item 6): `named_total` stays the
    * frozen-v1 cross-round headline; `named_total_v2` additionally
    * covers the 23 operators that shipped in round 13, so round 15+
    * gets a like-for-like total for them too. Frozen as of r14 —
    * queries newer than r13 ride in the v2 complement only. */
  private[graft] val NamedSetV2: Set[String] = NamedSet ++ Set(
    "dedup_bbit", "dedup_weighted", "docs_cluster_ari", "docs_cluster_nmi",
    "dq_skew", "emb_ann_recall", "emb_drift", "emb_intrinsic_dim",
    "emb_margin_mine", "emb_ood_score", "mm_phash_groups",
    "pipeline_decontam_summary", "pipeline_funnel", "pq_distortion",
    "seq_pack_stats", "stream_topk", "text_burstiness", "text_heaps",
    "text_kn_score", "text_langid_eval", "text_llr", "text_ppl_buckets",
    "text_textrank")

  /** Named-set v3: v2 + the round-14 operator wave, so round 15+ gets
    * a like-for-like cross-round total for them too. Frozen as of the
    * end of r14. */
  private[graft] val NamedSetV3: Set[String] = NamedSetV2 ++ Set(
    "corpus_diff", "dedup_cdc", "dedup_sentences", "dedup_trunc",
    "emb_diversity_prune", "emb_knn_graph_b10", "emb_lsh_recall_bits",
    "pii_kanon", "split_leakage", "text_lang_mix", "text_readability")

  /** Named-set v4: v3 + the round-15 wave (auto-width LSH gates, the
    * trunc/winnow cap censuses). Frozen as of the end of r15. */
  private[graft] val NamedSetV4: Set[String] = NamedSetV3 ++ Set(
    "emb_auto_bits", "emb_auto_recall", "dedup_trunc_blocks",
    "dedup_winnow_excluded", "dedup_eval_sampled")

  /** Named-set v5: v4 + the round-16 wave (the ANN recall gate and the
    * dedup-first knn composition). Frozen as of the end of r16. */
  private[graft] val NamedSetV5: Set[String] = NamedSetV4 ++ Set(
    "emb_topk_recall", "emb_knn_graph_deduped")

  /** Quiet-host reference for the in-JVM control job: 0.16 s measured
    * on an idle host (BENCH_r15's pre-drift value; r16 local runs
    * reproduce 0.14-0.16). named_total_ctrlnorm scales the frozen-set
    * total by ControlRefSec / control_median, so cross-round totals
    * adjudicate host contention from the artifact alone instead of
    * needing prose (VERDICT r15 item 3). */
  private[graft] val ControlRefSec = 0.16

  /** The ONLY queries the full-board summary line names (r13 verdict
    * item 1 / "what's wrong" 1): the r13 line — the 82-name frozen set
    * at 1-decimal — rendered at 1928 chars, and the driver's 2000-char
    * tail window also holds sbt's ~76-char "[success]" line, so the
    * JSON's head fell outside the window and round 13 shipped
    * parsed:null. The structural fix: the summary line names a fixed
    * handful of slow cross-family representatives (plus any ERRORED
    * query); every other per-query number lives exclusively in
    * BENCH_DETAIL.json ("queries"/"medians"/"runs"), which has no line
    * budget. Cross-round totals stay in the line via named_total /
    * named_total_v2 / folded_total. */
  private[graft] val HeadlineSet: Set[String] = Set(
    "kmeans_fit10", "kmeans_fit10_obj", "init_kmeansbb", "dedup_minhash",
    "dedup_editdist", "ivfpq_topk", "emb_knn_graph", "graph_pagerank",
    "pipeline_pretrain", "stream_attribute")

  /** True median: even-length run lists average the two middle
    * elements. r13 advice: `s(s.size/2)` is the UPPER middle, which
    * biased the sub-5 s headline high whenever the interleave/
    * remeasure machinery produced an even run count. Convention
    * change lands in r14 for both the summary stat and the detail
    * "medians" map (noted in BENCH_DETAIL's notes object). */
  private[graft] def medianOf(ok: Seq[Double]): Double =
    if (ok.isEmpty) -1.0
    else {
      val s = ok.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

  /** Per-query headline statistic (r12 verdict item 6): sub-5 s
    * queries are scheduler-noise-dominated at local[32] (the r12
    * remeasure block showed ~1.7× run-to-run spread), so their
    * headline is the MEDIAN of the interleaved runs — one outlier in
    * either direction can't move it. ≥5 s queries keep the minimum:
    * their upside noise is whole stall windows (r8: 66–87 s for a
    * 2.4 s query) that the median would average IN, and the anomaly/
    * remeasure machinery already adjudicates them. */
  private[graft] def statOf(ok: Seq[Double]): Double =
    if (ok.isEmpty) -1.0
    else {
      val med = medianOf(ok)
      if (med < 5.0) med else ok.min
    }

  /** JSON string escape. Control characters matter as much as quotes:
    * an exception message carrying a newline would split the single
    * stdout summary line the harness tail-parses. */
  private def jsonEsc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def errsJson(all: Seq[QueryResult]): String =
    all.collect { case (k, _, _, Some(e)) => s""""$k":"${jsonEsc(e)}"""" }
      .mkString("{", ",", "}")

  /** The ONE stdout line the harness parses. The harness keeps only the
    * LAST 2000 chars of this process's output (BENCH_r10–r13 "tail" is
    * exactly 2000) and extracts the JSON line from that window — with
    * sbt's trailing "[success] Total time …" line (76 chars in r13)
    * INSIDE the same window. r13's 1928-char line + that 76-char
    * trailer = 2004 > 2000, so the JSON's first 4 chars fell out and
    * the driver recorded parsed:null. The r14 contract: the line
    * carries totals + the HeadlineSet + errors only; everything
    * per-query goes to BENCH_DETAIL.json via [[detailJson]].
    * 1400 = 2000 − ~90 (sbt trailer, with slack for longer month/time
    * renderings) − ~500 extra margin; the compact line renders ~600. */
  private[graft] val LineBudget = 1400

  private[graft] def summaryLine(
      all: Seq[QueryResult], load: String,
      fit10m: Option[(Seq[Double], Option[String])], sfDir: String,
      remeasure: Map[String, Double] = Map.empty,
      remeasureError: Option[String] = None,
      controlSec: Double = -1.0): String = {
    def fmt(v: Double): String =
      if (v >= 100) f"$v%.0f" else if (v >= 10) f"$v%.1f" else f"$v%.2f"
    // Which queries are NAMED in the line: small boards (isolation
    // forks — remeasureIsolated parses its own names back out of the
    // child's "queries" map) name everything; the full board names
    // ONLY the HeadlineSet plus every ERRORED query (a failure folded
    // into q_other would be invisible). Everything else folds into one
    // "q_other" aggregate + a "folded" count.
    val nameAll = all.size <= 24
    // Cross-round totals are computed over ALL queries regardless of
    // what the line names: value = named_total + folded_total along
    // the FROZEN v1 split (the r11->r12 +36% "regression" was q_other
    // growth, not code); named_total_v2 adds the r13 operator wave.
    val total = all.map(_._3).filter(_ >= 0).sum
    val namedTotal =
      all.filter(q => NamedSet(q._1)).map(_._3).filter(_ >= 0).sum
    val namedTotalV2 =
      all.filter(q => NamedSetV2(q._1)).map(_._3).filter(_ >= 0).sum
    val namedTotalV3 =
      all.filter(q => NamedSetV3(q._1)).map(_._3).filter(_ >= 0).sum
    val namedTotalV4 =
      all.filter(q => NamedSetV4(q._1)).map(_._3).filter(_ >= 0).sum
    val namedTotalV5 =
      all.filter(q => NamedSetV5(q._1)).map(_._3).filter(_ >= 0).sum
    val ctrlNorm =
      if (controlSec > 0) namedTotal * (ControlRefSec / controlSec) else -1.0
    // errLen/errCap: the only unbounded inputs left are error strings —
    // the ladder shrinks messages, then the named-error count, and the
    // remeasure object self-trims inside whatever room remains. The
    // compact base (~600 chars) cannot overflow on its own.
    def render(errLen: Int, errCap: Int): (String, Int) = {
      val errored = all.filter(_._4.nonEmpty)
      val shownErrs = errored.take(errCap)
      val shownErrNames = shownErrs.map(_._1).toSet
      val (named, folded) = all.partition(q =>
        nameAll || HeadlineSet(q._1) || shownErrNames(q._1))
      val qs = (named.sortBy(_._1)
        .map { case (k, _, v, _) => s""""$k":${fmt(v)}""" } ++
        (if (folded.nonEmpty)
          Seq(s""""q_other":${fmt(folded.map(_._3).filter(_ >= 0).sum)}""")
        else Nil)).mkString("{", ",", "}")
      val foldJson =
        if (folded.nonEmpty) s""","folded":${folded.size}""" else ""
      // errors only when present — the empty object is pure budget spend
      val errs =
        if (errored.isEmpty) ""
        else {
          val body = shownErrs.map { case (k, _, _, e) =>
            s""""$k":"${jsonEsc(e.getOrElse("").take(errLen))}""""
          }.mkString("{", ",", "}")
          val dropped =
            if (errored.size > errCap)
              s""","errors_dropped":${errored.size - errCap}"""
            else ""
          s""","errors":$body$dropped"""
        }
      val fit10mJson = fit10m.map { case (rs, err) =>
        val v = if (rs.nonEmpty) rs.min else -1.0
        val spr =
          if (rs.nonEmpty) f""","runs":[${rs.min}%.2f,${rs.max}%.2f]"""
          else ""
        f""","fit10m":{"sec":$v%.2f$spr,"baseline_sec":90.8""" +
          err.map(e => s""","error":"${jsonEsc(e.take(errLen).replace("\"", "'"))}"""")
            .getOrElse("") + "}"
      }.getOrElse("")
      val base = f"""{"metric":"total","value":$total%.2f,""" +
        f""""named_total":$namedTotal%.2f,""" +
        f""""named_total_v2":$namedTotalV2%.2f,""" +
        f""""named_total_v3":$namedTotalV3%.2f,""" +
        f""""named_total_v4":$namedTotalV4%.2f,""" +
        f""""named_total_v5":$namedTotalV5%.2f,""" +
        f""""named_total_ctrlnorm":$ctrlNorm%.2f,""" +
        f""""folded_total":${total - namedTotal}%.2f,""" +
        s""""stat":"med<5s","unit":"sec","detail":"BENCH_DETAIL.json",""" +
        s""""queries":$qs$foldJson$errs,"loadavg":$load""" +
        (if (controlSec >= 0) f""","control_sec":$controlSec%.2f""" else "") +
        fit10mJson
      val tail = s""","sf":"$sfDir"}"""
      val rmErr = remeasureError.map(e =>
        s""","remeasure_error":"${jsonEsc(e.take(80))}"""").getOrElse("")
      val (rm, keptN) =
        if (remeasure.isEmpty) (rmErr, 0)
        else {
          val entries = remeasure.toSeq.sortBy(-_._2)
            .map { case (k, v) => s""""$k":${fmt(v)}""" }
          val room = LineBudget - base.length - tail.length - 15 // ,"remeasure":{}
          val kept = entries.scanLeft(0)((acc, e) => acc + e.length + 1)
            .tail.zip(entries).takeWhile(_._1 <= room).map(_._2)
          if (kept.isEmpty) ("", 0)
          else (s""","remeasure":${kept.mkString("{", ",", "}")}""", kept.size)
        }
      (base + rm + tail, keptN)
    }
    // Prefer the first tier that fits with the FULL remeasure map, else
    // the fitting tier keeping the most remeasure entries. The tiers
    // only differ in how much error text they carry — everything else
    // is fixed-size (HeadlineSet is a 10-name constant).
    val tiers = Seq(render(200, 10), render(60, 6), render(40, 3),
      render(20, 1))
    val fits = tiers.filter(_._1.length <= LineBudget)
    fits.find(_._2 == remeasure.size).map(_._1)
      .orElse(fits.maxByOption(_._2).map(_._1))
      .getOrElse(tiers.last._1)
  }

  /** Full-precision companion written next to the repo's round artifacts:
    * every per-query run time (the spread that adjudicates host-noise
    * anomalies), errors, and environment. */
  private[graft] def detailJson(
      all: Seq[QueryResult], load: String, cpus: String,
      fit10m: Option[(Seq[Double], Option[String])], sfDir: String,
      loads: Map[String, String] = Map.empty,
      remeasureJson: String = "",
      buildSec: Map[String, Double] = Map.empty,
      streaming: Seq[tools.StreamBench.Res] = Nil,
      recall: Seq[tools.RecallBench.Res] = Nil,
      skew: Seq[tools.SkewStress.Res] = Nil): String = {
    val runsJson = all.map { case (k, rs, _, _) =>
      s""""$k":${rs.mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val fullQs = all.map { case (k, _, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    // 1-min loadavg sampled right after each query's runs — the
    // adjudication data r7 lacked (only a session-level 8.35 existed)
    val loadsJson = all.flatMap { case (k, _, _, _) =>
      loads.get(k).map(l => s""""$k":$l""")
    }.mkString("{", ",", "}")
    // per-control-phase loadavg samples (control_pre1..post3) — keyed
    // by phase, not query name, so the query-keyed map above skipped
    // them and the stated adjudication evidence was silently dropped
    // (r15 advice)
    val controlLoadsJson = loads.toSeq
      .filter(_._1.startsWith("control_")).sortBy(_._1)
      .map { case (k, l) => s""""$k":$l""" }.mkString("{", ",", "}")
    val f10 = fit10m.map { case (rs, _) =>
      s""","fit10m_runs":${rs.mkString("[", ",", "]")}"""
    }.getOrElse("")
    // build-vs-probe labels: a reader comparing ANN numbers must know
    // which entries amortize their index build and which pay it in the
    // timed body (r8 lesson: "pq_topk 5.3s" is really codebook TRAINING
    // plus search; the production search path is the _indexed probe)
    val notes = """"notes":{""" +
      """"pq_topk":"codebook train + encode + ADC search — build inside the timed body",""" +
      """"pq_topk_indexed":"codes-only probe; index persisted untimed (production path)",""" +
      """"ivf_topk":"coarse-quantizer build + probe inside the timed body",""" +
      """"ivf_topk_indexed":"partition-pruned probe; index persisted untimed (production path)",""" +
      """"ivfpq_topk":"IVFADC: coarse + residual-PQ build + probe inside the timed body",""" +
      """"ivfpq_topk_indexed":"partition-pruned codes probe + ADC; index persisted untimed (production path)",""" +
      """"dedup_incr_indexed":"index write memoized per JVM (production: once per ingest) — the first pass pays ingest + probe, later passes probe only, so best-of-N is the production probe path (dedup_incr_near is the same computation unstaged)",""" +
      """"medians":"true median as of r14: even-length run lists average the two middle elements (r13 and earlier reported the upper middle, biasing even-count medians high by up to half the middle gap)",""" +
      """"recall":"per-index recall@10 vs the exact top-10 under each index's own metric; the sf embeddings fixture is near-uniform 64-dim noise (ANN's degenerate case — see AnnBench.vectors). r16: the registered lsh/rp/pq/ivfpq defaults are recall-targeted and data-dependent (multiprobe auto-width LSH, JL-scaled RP, refine-rescored PQ/IVFADC — pinned per SF by the emb_topk_recall oracle gate); @-suffixed rows keep the old fixed defaults and parameter sweeps for comparison"}"""
    // machine-readable build-vs-probe split (r10 item 2): which entries
    // pay an index/codebook build inside the timed body, and what the
    // equivalent build costs when run untimed for the _indexed twins
    // (emb_sq8_topk's "build" is a d-row stats agg — listed, not timed)
    val buildInside = """"build_inside":["emb_sq8_topk","ivf_topk",""" +
      """"ivfpq_topk","ivfpq_topk_refined","pq_topk"]"""
    val buildJson =
      if (buildSec.isEmpty) ""
      else s""","build_sec":${buildSec.toSeq.sortBy(_._1)
        .map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")}"""
    val streamJson =
      if (streaming.isEmpty) ""
      else s""","streaming":${streaming.map { r =>
        f""""${r.name}":{"sec":${r.sec}%.2f,"rows":${r.rows}""" +
          r.err.map(e => s""","error":"${jsonEsc(e)}"""").getOrElse("") + "}"
      }.mkString("{", ",", "}")}"""
    val recallJson =
      if (recall.isEmpty) ""
      else s""","recall":${recall.map { r =>
        f""""${r.name}":{"metric":"${r.metric}","recall":${r.recall}%.2f,"sec":${r.sec}%.2f""" +
          r.err.map(e => s""","error":"${jsonEsc(e)}"""").getOrElse("") + "}"
      }.mkString("{", ",", "}")}"""
    val skewJson =
      if (skew.isEmpty) ""
      else s""","skew_stress":${skew.map { r =>
        f""""${r.name}":{"base_sec":${r.baseSec}%.2f,"skew_sec":${r.skewSec}%.2f""" +
          r.err.map(e => s""","error":"${jsonEsc(e)}"""").getOrElse("") + "}"
      }.mkString("{", ",", "}")}"""
    // The 100M-point fit is measured offline (runMain graft.tools
    // .FitScale — too heavy for every bench round); embed its last
    // at-HEAD artifact if present. Single-object sanity check so a
    // corrupt file can't break the detail JSON.
    val fit100mJson = try {
      val p = java.nio.file.Paths.get("target/fit100m.json")
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.readString(p).trim
        if (s.startsWith("{") && s.endsWith("}") && !s.contains("\n"))
          s""","fit100m":$s"""
        else ""
      } else ""
    } catch { case _: Throwable => "" }
    // full per-query medians (the summary's sub-5 s stat source, here
    // for every query so the judge can read median vs min spread)
    val mediansJson = all.map { case (k, rs, _, _) =>
      val med = medianOf(rs.filter(_ >= 0))
      f""""$k":$med%.3f"""
    }.mkString("{", ",", "}")
    s"""{"queries":$fullQs,"medians":$mediansJson,""" +
      s""""runs":$runsJson,"errors":${errsJson(all)},""" +
      s""""load_after":$loadsJson,"control_loads":$controlLoadsJson,""" +
      s""""loadavg":$load,"cpus":$cpus$f10""" +
      s"""$remeasureJson,$notes,$buildInside$buildJson$streamJson$recallJson$skewJson$fit100mJson,"sf":"$sfDir"}"""
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
