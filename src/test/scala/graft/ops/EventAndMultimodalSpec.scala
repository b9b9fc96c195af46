package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventAndMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.0, "{}"),
    (2L, ts("2024-01-01 10:10:00"), 100L, "click", 2.0, "{}"),
    (3L, ts("2024-01-01 11:00:00"), 100L, "view", 3.0, "{}"),  // 50 min gap → new session
    (4L, ts("2024-01-01 10:05:00"), 200L, "click", 4.0, "{}")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("type trend: planted linear series recovers exact slope, r2 = 1") {
    val lin = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "m", 1.00, "{}"),
      (2L, ts("2024-01-01 10:00:01"), 1L, "m", 3.00, "{}"),
      (3L, ts("2024-01-01 10:00:02"), 1L, "m", 5.00, "{}"),
      (4L, ts("2024-01-01 10:00:00"), 1L, "flat", 7.00, "{}"),
      (5L, ts("2024-01-01 10:00:09"), 1L, "flat", 7.00, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val t = EventOps.typeTrend(lin).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    val (n, slope, intercept, r2) = t("m")
    assert(n == 3L && slope == 2.0 && r2.contains(1.0))
    // intercept: y at epoch 0 — recompute from the means
    val xMean = lin.filter($"event_type" === "m")
      .select(expr("avg(unix_micros(ts) div 1000000)")).head.getDouble(0)
    assert(math.abs(intercept - (3.0 - 2.0 * xMean)) < 1e-6)
    // constant y: slope exactly 0, r2 degenerate → NULL (not an error)
    val (_, fSlope, _, fR2) = t("flat")
    assert(fSlope == 0.0 && fR2.isEmpty)
  }

  test("moving stats: trailing ROWS and 1-hour RANGE frames") {
    val m = EventOps.movingStats(events).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5), r.getDouble(6)))
      .toMap
    // user 100 ordered: e1 (10:00, 1.0), e2 (10:10, 2.0), e3 (11:00, 3.0)
    assert(m(1L) == ((1L, 1.0, 1.0, 1L, 1.0)))
    assert(m(2L) == ((2L, 3.0, 1.5, 2L, 3.0)))
    // ROWS frame still holds all 3; the 1-hour RANGE frame includes
    // e1 (exactly 3600s back — inclusive bound) and e2
    assert(m(3L) == ((3L, 6.0, 2.0, 3L, 6.0)))
    assert(m(4L) == ((1L, 4.0, 4.0, 1L, 4.0)))
  }

  test("sessionize splits on gaps greater than the threshold") {
    val sess = EventOps.sessionize(events, gapMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sess((100L, 1L)) == 2L) // 10:00 + 10:10
    assert(sess((100L, 2L)) == 1L) // 11:00
    assert(sess((200L, 1L)) == 1L)
  }

  test("hourly autocorr: alternating series gives r = -1 at lag 1 and r = +1 at lag 2") {
    // hourly counts 1,5,1,5,1,5 → lag-1 pairs anti-correlate exactly,
    // lag-2 pairs correlate exactly; both are rational results the
    // exact-integer algebra must hit dead on
    val rows = (0 until 6).flatMap { h =>
      val n = if (h % 2 == 0) 1 else 5
      (0 until n).map(i => (h.toLong * 100 + i,
        ts(f"2024-01-01 ${10 + h}%02d:00:00"), 1L, "click", 1.0, "{}"))
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.hourlyAutocorr(ev, lags = Seq(1, 2)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // sqrt(dx)·sqrt(dy) rounds once vs the exact |num|, so ±1 lands
    // within 1 ulp, not exactly (deterministically so — the oracle
    // twin computes the identical tree)
    assert(got(1L)._1 == 5L && math.abs(got(1L)._2 + 1.0) < 1e-12,
      s"lag1 ${got(1L)}")
    assert(got(2L)._1 == 4L && math.abs(got(2L)._2 - 1.0) < 1e-12,
      s"lag2 ${got(2L)}")
  }

  test("hourly autocorr: constant series is degenerate → NULL r") {
    val ev = (0 until 4).map(h => (h.toLong,
        ts(f"2024-01-01 ${10 + h}%02d:00:00"), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.hourlyAutocorr(ev, lags = Seq(1)).collect()
    assert(got.length == 1 && got(0).isNullAt(2), got.mkString(","))
  }

  test("hourly agg groups by hour and type with exact sums") {
    val m = EventOps.hourlyTypeAgg(events).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(m(("2024-01-01 10:00:00.0", "click")) == ((3L, 7.0)))
    assert(m(("2024-01-01 11:00:00.0", "view")) == ((1L, 3.0)))
  }

  test("exact percentiles interpolate; sketches land near them") {
    val vals = Seq.tabulate(100)(i => (i.toLong, ts("2024-01-01 10:00:00"),
      1L, "click", (i + 1).toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val exact = EventOps.typePercentiles(vals).collect()(0)
    // values 1..100: p50 = 50.5 (interpolated), p95 = 95.05
    assert(exact.getDouble(1) == 50.5)
    assert(math.abs(exact.getDouble(2) - 95.05) < 1e-9)
    val sk = EventOps.typeSketches(vals).collect()(0)
    // flattened sketch surface: (event_type, p50_approx, p95_approx, approx_users, n)
    assert(math.abs(sk.getDouble(1) - 50.5) < 2.0 &&
      math.abs(sk.getDouble(2) - 95.05) < 2.0)
    assert(math.abs(sk.getLong(3) - 1L) <= 1L) // HLL of a single user

    // fixed-bin histogram: estimate = upper edge of the bin holding the
    // quantile -> within one bin width of the true quantile, and (unlike
    // t-digest) a deterministic pure function of the data
    val hb = EventOps.binnedQuantiles(vals).collect()(0)
    assert(math.abs(hb.getDouble(1) - 50.5) <= 1.0, s"p50_est ${hb.getDouble(1)}")
    assert(math.abs(hb.getDouble(2) - 95.05) <= 1.0, s"p95_est ${hb.getDouble(2)}")
    assert(hb.getLong(3) == 100L)
    val hb2 = EventOps.binnedQuantiles(vals).collect()(0)
    assert(hb == hb2) // determinism: same input -> bit-identical output
  }

  test("weekly retention assigns users to first-week cohorts") {
    val evs = Seq(
      // user 1 active in week of Jan 1 (Mon) and week of Jan 8
      (1L, ts("2024-01-02 10:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-01-03 10:00:00"), 1L, "view", 0.0, "{}"), // same week, distinct'd
      (3L, ts("2024-01-09 10:00:00"), 1L, "click", 0.0, "{}"),
      // user 2 first appears in week of Jan 8
      (4L, ts("2024-01-10 10:00:00"), 2L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.weeklyRetention(evs).collect()
      .map(r => (r.getTimestamp(0).toString.take(10),
        r.getTimestamp(1).toString.take(10)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", "2024-01-01") -> 1L,  // cohort week-0 activity
      ("2024-01-01", "2024-01-08") -> 1L,  // user 1 retained in week 1
      ("2024-01-08", "2024-01-08") -> 1L)) // user 2's own cohort
  }

  test("rollup emits leaf, subtotal, and grand-total rows with grouping flags") {
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-02 10:00:00"), 1L, "click", 2.0, "{}"),
      (3L, ts("2024-01-01 10:00:00"), 2L, "view", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventOps.dailyTypeRollup(evs).collect()
      .map(r => (Option(r.getString(0)), Option(r.getTimestamp(1)).map(_.toString),
        r.getInt(4), r.getInt(5)) -> (r.getLong(2), r.getDouble(3))).toMap
    // leaf: click on Jan 1
    assert(rows((Some("click"), Some("2024-01-01 00:00:00.0"), 0, 0)) == ((1L, 1.0)))
    // subtotal per type (day rolled up → NULL day, g_day = 1)
    assert(rows((Some("click"), None, 0, 1)) == ((2L, 3.0)))
    assert(rows((Some("view"), None, 0, 1)) == ((1L, 4.0)))
    // grand total
    assert(rows((None, None, 1, 1)) == ((3L, 7.0)))
  }

  test("funnel attributes the first B after the user's FIRST A within the window") {
    val evs = Seq(
      // user 1: first view 10:00, click 10:30 → converts, delta 30 min
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 10:30:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 10:40:00"), 1L, "click", 0.0, "{}"), // later click ignored
      // user 2: first view 09:00; only click is at 10:30 — outside 60 min
      (4L, ts("2024-01-01 09:00:00"), 2L, "view", 0.0, "{}"),
      (5L, ts("2024-01-01 10:30:00"), 2L, "click", 0.0, "{}"),
      // user 3: click BEFORE any view — no conversion (strictly after)
      (6L, ts("2024-01-01 08:00:00"), 3L, "click", 0.0, "{}"),
      (7L, ts("2024-01-01 09:00:00"), 3L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.funnel(evs, "view", "click", withinMinutes = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 30L * 60L * 1000000L))
  }

  test("events reader converts nanosecond timestamps exactly") {
    val df = graft.Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType.typeName == "timestamp")
    assert(df.count() > 0)
    val bounds = df.agg(min("ts"), max("ts")).collect()(0)
    assert(bounds.getTimestamp(0).before(bounds.getTimestamp(1)))
  }

  // ----- multimodal plumbing -----

  private def docs = Seq((0L, "hello world"), (1L, "abc"), (2L, "longer document text here"))
    .toDF("doc_id", "text")

  test("media relation has binary payload + typed metadata struct") {
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val meta = media.schema("meta").dataType
    assert(meta.typeName == "struct")
    val kinds = media.select("meta.kind").as[String].collect().toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
  }

  test("stub feature extraction is deterministic, batched, and 8-dimensional") {
    val media = Multimodal.mediaFromDocuments(docs).repartition(3)
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(a.toSeq.map(_.features.toSeq) == b.toSeq.map(_.features.toSeq))
    assert(a.forall(_.features.length == 8))
    // histogram fractions sum to ~1
    a.foreach(f => assert(math.abs(f.features.sum - 1.0f) < 1e-5))
    assert(a.map(x => (x.doc_id, x.n_bytes)).toSeq ==
      Seq((0L, 11L), (1L, 3L), (2L, 25L)))
  }

  test("frame sampling slices payloads with the configured stride") {
    val media = Multimodal.mediaFromDocuments(docs)
    val frames = Multimodal.sampleFrames(media, frameBytes = 4, stride = 2).collect()
    // doc 2: 25 bytes → ceil? frames of 4 bytes: idx 0..5 (6 full-ish), stride 2 → idx 0,2,4
    val doc2 = frames.filter(_.getLong(0) == 2L).map(_.getAs[Number](1).longValue).sorted
    assert(doc2.toSeq == Seq(0L, 2L, 4L))
    frames.foreach(r => assert(r.getAs[Array[Byte]]("frame").length <= 4))
  }

  test("metadata catalog never reads the payload column (column pruning)") {
    val media = Multimodal.mediaFromDocuments(docs)
    val plan = Multimodal.mediaCatalog(media).queryExecution.optimizedPlan
    // payload must be pruned out of the optimized plan's output chain
    assert(!plan.toString.contains("payload"))
  }

  test("props JSON extraction parses k, nulls malformed rows out of min/max") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, """{"k": 7}"""),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click", 1.0, """{"k": 3}"""),
      (3L, ts("2024-01-01 10:02:00"), 1L, "click", 1.0, "not json")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.propsKStats(ev).collect()(0)
    assert(r.getString(0) == "click" && r.getLong(1) == 3L)
    assert(r.getLong(2) == 10L && r.getLong(3) == 3L && r.getLong(4) == 7L)
  }

  test("resize stub box-averages bytes into target bins; short payloads zero-fill") {
    val r = Multimodal.resizeStub(Array[Byte](0, 100, 200.toByte, 255.toByte), 2)
    assert(r.toSeq == Seq(50.0f, 227.5f))
    val short = Multimodal.resizeStub(Array[Byte](10), 4)
    assert(short.toSeq == Seq(10.0f, 0f, 0f, 0f))
    assert(Multimodal.resizeStub(Array.empty[Byte], 3).toSeq == Seq(0f, 0f, 0f))
    // relation path: every doc gets exactly `target` dense rows
    val media = Multimodal.mediaFromDocuments(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val out = Multimodal.resizeFlat(media, target = 4)
    val perDoc = out.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("real PNG codec: golden image round-trips pixel-exact; batched path matches direct decode") {
    // golden 3x2 image for doc_id=42: decode must reproduce every pixel
    val png = Multimodal.encodePng(42L, 3, 2)
    // real PNG bytes: 8-byte signature
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    for (y <- 0 until 2; x <- 0 until 3)
      assert((img.getRGB(x, y) & 0xffffff) == Multimodal.pixel(42L, x, y),
        s"pixel ($x,$y)")
    // channel sums equal the closed form
    val (w, h, rs, gs, bs) = Multimodal.decodeChannelSums(png)
    val exp = for (y <- 0 until 2; x <- 0 until 3) yield Multimodal.pixel(42L, x, y)
    assert((w, h) == (3, 2))
    assert(rs == exp.map(p => (p >> 16) & 0xff).sum.toLong)
    assert(gs == exp.map(p => (p >> 8) & 0xff).sum.toLong)
    assert(bs == exp.map(p => p & 0xff).sum.toLong)
    // batched relation path: every fixture doc's sums equal the closed
    // form computed directly (single-image path) — batching changes
    // nothing about the decode
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Multimodal.pngRoundtripSums(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.select("doc_id").limit(25).collect().map(_.getLong(0)).foreach { id =>
      val (dw, dh) = ((id % 16 + 8).toInt, (id % 12 + 6).toInt)
      val ps = for (y <- 0 until dh; x <- 0 until dw) yield Multimodal.pixel(id, x, y)
      val r = out(id)
      assert((r.getInt(1), r.getInt(2)) == (dw, dh))
      assert(r.getLong(3) == ps.map(p => (p >> 16) & 0xff).sum.toLong)
      assert(r.getLong(4) == ps.map(p => (p >> 8) & 0xff).sum.toLong)
      assert(r.getLong(5) == ps.map(p => p & 0xff).sum.toLong)
    }
  }

  test("as-of join matches the latest at-or-before view, null when none") {
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 10.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "view", 20.0, "{}"),
      // equal-ts duplicate views: greatest event_id must win
      (3L, ts("2024-01-01 10:00:00"), 1L, "view", 30.0, "{}"),
      (4L, ts("2024-01-01 10:00:00"), 1L, "purchase", 5.0, "{}"), // exact tie → matches
      (5L, ts("2024-01-01 11:00:00"), 1L, "purchase", 6.0, "{}"),
      (6L, ts("2024-01-01 08:00:00"), 2L, "purchase", 7.0, "{}")  // no prior view
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.asofJoin(ev).collect()
      .map(r => r.getLong(0) -> Option(r.get(5)).map(_.asInstanceOf[Double])).toMap
    assert(got(4L) == Some(30.0)) // tie-ts view visible, arg-max dedup picked id 3
    assert(got(5L) == Some(30.0)) // latest view before 11:00 is the 10:00 one
    assert(got(6L) == None)       // user 2 never viewed
  }

  test("as-of join: a winning view row with NULL value yields NULL, not an older row's value") {
    // prior_view_ts and prior_view_value must come from the SAME winning
    // B row — a last(ignoreNulls) per column would skip the NULL value
    // and pair the 10:00 ts with the 09:00 row's 40.0
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", Some(40.0), "{}"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "view", None, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 1L, "purchase", Some(5.0), "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.asofJoin(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[java.sql.Timestamp]("prior_view_ts") == ts("2024-01-01 10:00:00"))
    assert(r(0).isNullAt(r(0).fieldIndex("prior_view_value")))
  }

  test("deterministic HLL tracks cardinality across both branches") {
    def evs(types: Seq[(String, Int)]) = types.flatMap { case (t, n) =>
      (1 to n).map(i => (i.toLong, ts("2024-01-01 10:00:00"),
        (t.hashCode.abs % 100) * 1000000L + i, t, 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // small range (n << m=256): linear counting, relative error tight;
    // large range (n >> m): raw estimate within ~3 standard errors
    // (sigma = 1.04/sqrt(256) = 6.5%)
    val df = EventOps.hllUsers(evs(Seq("small" -> 40, "large" -> 8000)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val (estS, exactS) = df("small")
    val (estL, exactL) = df("large")
    assert(exactS == 40L && exactL == 8000L)
    assert(math.abs(estS - 40.0) / 40.0 < 0.15, s"small est $estS")
    assert(math.abs(estL - 8000.0) / 8000.0 < 0.20, s"large est $estL")
    // pure function of the data: reruns bit-identical
    val df2 = EventOps.hllUsers(evs(Seq("small" -> 40, "large" -> 8000)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(java.lang.Double.doubleToLongBits(df2("large")) ==
      java.lang.Double.doubleToLongBits(estL))
  }

  test("KMV sketch: exact below k, unbiased-estimator accuracy above, deterministic") {
    def evs(types: Seq[(String, Int)]) = types.flatMap { case (t, n) =>
      (1 to n).map(i => (i.toLong, ts("2024-01-01 10:00:00"),
        (t.hashCode.abs % 100) * 1000000L + i, t, 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val df = EventOps.kmvUsers(evs(Seq("tiny" -> 30, "big" -> 8000)), k = 64)
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getDouble(2))).toMap
    // below k: no k-th hash, exact fallback
    assert(df("tiny") == ((None, 30.0)))
    // above k: (k-1)/u_(k) estimator, sigma ~ 1/sqrt(k-2) = 12.7% — 3σ gate
    val (kth, est) = df("big")
    assert(kth.nonEmpty && kth.get > 0L)
    assert(math.abs(est - 8000.0) / 8000.0 < 0.38, s"kmv est $est")
    // duplicate user_ids cannot move the estimate (distinct first)
    val dup = evs(Seq("big" -> 8000))
    val est2 = EventOps.kmvUsers(dup.union(dup), k = 64)
      .collect()(0).getDouble(2)
    assert(java.lang.Double.doubleToLongBits(est2) ==
      java.lang.Double.doubleToLongBits(est))
  }

  test("PIT SCD2 join picks the version valid AT the probe ts, never a later one") {
    val ev = Seq(
      // user 1 dim versions: v10 at 10:00, v20 at 11:00
      (1L, ts("2024-01-01 10:00:00"), 1L, "purchase", Some(10.0), "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "purchase", Some(20.0), "{}"),
      // probes: before any version / at v10's start / mid-v10 / after v20
      (3L, ts("2024-01-01 09:00:00"), 1L, "click", Some(0.0), "{}"),
      (4L, ts("2024-01-01 10:00:00"), 1L, "click", Some(0.0), "{}"),
      (5L, ts("2024-01-01 10:30:00"), 1L, "click", Some(0.0), "{}"),
      (6L, ts("2024-01-01 12:00:00"), 1L, "click", Some(0.0), "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.pitScd2Join(ev).collect()
      .map(x => x.getLong(0) -> (Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Double]),
        Option(x.get(7)).map(_.asInstanceOf[Boolean]))).toMap
    assert(r(3L) == ((None, None, None)))            // no version yet
    assert(r(4L) == ((Some(1L), Some(10.0), Some(false)))) // inclusive start
    assert(r(5L) == ((Some(1L), Some(10.0), Some(false)))) // mid-interval
    assert(r(6L) == ((Some(2L), Some(20.0), Some(true))))  // open current
  }

  test("binned interval join equals the naive range join, bounds inclusive") {
    // events at bin edges and interiors (bin = 10 min)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:09:59"), 1L, "click", 2.0, "{}"),
      (3L, ts("2024-01-01 10:10:00"), 1L, "click", 4.0, "{}"),
      (4L, ts("2024-01-01 10:25:00"), 1L, "click", 8.0, "{}"),
      (5L, ts("2024-01-01 11:00:00"), 1L, "click", 16.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val iv = Seq(
      // exactly [10:00, 10:10] — both bounds inclusive, spans 2 bins
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      // [10:09:59, 10:25] — spans 3 bins, overlaps the first interval
      (200L, ts("2024-01-01 10:09:59"), ts("2024-01-01 10:25:00")),
      // empty interval (start > end) — dropped, not an error
      (300L, ts("2024-01-01 12:00:00"), ts("2024-01-01 11:00:00")),
      // contains no event — inner semantics, no output row
      (400L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:30:00"))
    ).toDF("interval_id", "t_start", "t_end")
    val got = EventOps.intervalJoinBinned(ev, iv, binMinutes = 10)
    val m = got.collect().map(r =>
      r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(m == Map(100L -> ((3L, 7.0)), 200L -> ((3L, 14.0))))
    // the naive quadratic twin agrees
    val naive = iv.filter(col("t_start") <= col("t_end")).as("i")
      .crossJoin(ev.as("e"))
      .filter(col("e.ts") >= col("i.t_start") && col("e.ts") <= col("i.t_end"))
      .groupBy("interval_id").agg(count(lit(1)), sum("value"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m == naive)
    // the scale contract: an EQUI join on the bin key — never a
    // nested-loop or cartesian physical join
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("SCD2 intervals chain per user: valid_to = next valid_from, one current row") {
    val hist = EventOps.scd2History(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(3),
        Option(r.getTimestamp(4)), r.getBoolean(5)))
    val u100 = hist.filter(_._1 == 100L).sortBy(_._3.getTime)
    assert(u100.map(_._2).toSeq == Seq(1L, 2L, 3L))
    // each interval closes exactly where the next opens
    assert(u100(0)._4.contains(u100(1)._3))
    assert(u100(1)._4.contains(u100(2)._3))
    // exactly one open (current) interval per user, and it's the last
    assert(u100.map(_._5).toSeq == Seq(false, false, true))
    val u200 = hist.filter(_._1 == 200L)
    assert(u200.length == 1 && u200.head._5 && u200.head._4.isEmpty)
  }

  test("resample: dense hourly spine, gap rows n=0, LOCF carries last avg") {
    val sparse = Seq(
      (1L, ts("2024-01-01 10:15:00"), 1L, "m", 2.00, "{}"),
      (2L, ts("2024-01-01 10:45:00"), 1L, "m", 4.00, "{}"),
      // hour 11 empty → gap; hour 12 observed again
      (3L, ts("2024-01-01 12:30:00"), 1L, "m", 9.00, "{}"),
      (4L, ts("2024-01-01 10:00:00"), 1L, "other", 1.00, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.resampleHourly(sparse).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        (r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5))).toMap
    // type m spans hours 10..12 → exactly 3 rows; other → 1 row
    assert(r.size == 4)
    assert(r(("m", "2024-01-01 10:00:00.0")) ==
      ((2L, Some(3.0), Some(3.0), false)))
    // the gap hour: zero events, null avg, LOCF carries hour-10's 3.0
    assert(r(("m", "2024-01-01 11:00:00.0")) ==
      ((0L, None, Some(3.0), true)))
    assert(r(("m", "2024-01-01 12:00:00.0")) ==
      ((1L, Some(9.0), Some(9.0), false)))
    assert(r(("other", "2024-01-01 10:00:00.0")) ==
      ((1L, Some(1.0), Some(1.0), false)))
  }

  test("snapshot diff emits inserted/deleted/changed and filters unchanged") {
    // windows: old = [01-02, 01-16), new = [01-10, 01-24)
    val evs = Seq(
      (1L, ts("2024-01-05 00:00:00"), 1L, "m", 1.0, "{}"), // old only → deleted
      (2L, ts("2024-01-20 00:00:00"), 2L, "m", 2.0, "{}"), // new only → inserted
      (3L, ts("2024-01-05 00:00:00"), 3L, "m", 3.0, "{}"),
      (4L, ts("2024-01-20 00:00:00"), 3L, "m", 3.5, "{}"), // latest moved → changed
      (5L, ts("2024-01-12 00:00:00"), 4L, "m", 4.0, "{}")  // same in both → filtered
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = EventOps.snapshotDiff(evs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "deleted", 2L -> "inserted", 3L -> "changed"))
    val row3 = EventOps.snapshotDiff(evs).filter(col("user_id") === 3L).head
    assert(row3.getDouble(3) == 3.0 && row3.getDouble(5) == 3.5)
  }

  test("deciles: equal-frequency buckets per type, event_id breaks value ties") {
    val evs = (1 to 10).map(i =>
      (i.toLong, ts(f"2024-01-01 10:00:${i}%02d"), 1L, "m",
        if (i <= 5) 1.0 else 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = EventOps.valueDeciles(evs, buckets = 5).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    // total order is (value, event_id): ids 1..5 (value 1.0) then 6..10 —
    // five buckets of exactly two rows each
    assert(d == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 3,
      6L -> 3, 7L -> 4, 8L -> 4, 9L -> 5, 10L -> 5))
  }

  test("transitions: per-user bigram counts, rows normalize per from_type") {
    // user 100: click→click→view ; user 200 contributes no bigram
    val t = EventOps.transitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(t == Map(
      ("click", "click") -> ((1L, 0.5)),
      ("click", "view") -> ((1L, 0.5))))
  }

  test("MAD: rank-selected median and deviation median on the cents grid") {
    // type m: values 1,2,3,4,100 -> lower median 3 (rank (5+1)//2 = 3);
    // deviations 2,1,0,1,97 -> sorted 0,1,1,2,97 -> median 1.
    // the 100 outlier moves the MEAN but not median/MAD
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "m", 1.00, "{}"),
      (2L, ts("2024-01-01 10:00:01"), 1L, "m", 2.00, "{}"),
      (3L, ts("2024-01-01 10:00:02"), 1L, "m", 3.00, "{}"),
      (4L, ts("2024-01-01 10:00:03"), 1L, "m", 4.00, "{}"),
      (5L, ts("2024-01-01 10:00:04"), 1L, "m", 100.00, "{}"),
      // even group: values 1,2,3,4 -> lower median 2; devs 1,0,1,2 ->
      // sorted 0,1,1,2 -> lower median 1
      (6L, ts("2024-01-01 10:00:00"), 1L, "e", 1.00, "{}"),
      (7L, ts("2024-01-01 10:00:01"), 1L, "e", 2.00, "{}"),
      (8L, ts("2024-01-01 10:00:02"), 1L, "e", 3.00, "{}"),
      (9L, ts("2024-01-01 10:00:03"), 1L, "e", 4.00, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.typeMad(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got("m") == ((5L, 3.0, 1.0)), s"got ${got("m")}")
    assert(got("e") == ((4L, 2.0, 1.0)), s"got ${got("e")}")
  }

  test("cumulative users: first-seen day counting equals running distinct") {
    // user 100 first on day 1 (also appears day 2); user 200 day 1;
    // user 300 day 2; user 400 day 3
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.0, "{}"),
      (2L, ts("2024-01-02 10:00:00"), 100L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 200L, "view", 1.0, "{}"),
      (4L, ts("2024-01-02 09:00:00"), 300L, "view", 1.0, "{}"),
      (5L, ts("2024-01-03 09:00:00"), 400L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.cumulativeUsers(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(got == Seq(("2024-01-01", 2L, 2L), ("2024-01-02", 1L, 3L),
      ("2024-01-03", 1L, 4L)), s"got $got")
  }

  test("outliers: only values beyond 3 MADs of their type median surface") {
    // type m: 1..4 and 100 -> median 3, MAD 1 -> gate |v-3| > 3:
    // only 100 (97 MADs out)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "m", 1.00, "{}"),
      (2L, ts("2024-01-01 10:00:01"), 1L, "m", 2.00, "{}"),
      (3L, ts("2024-01-01 10:00:02"), 1L, "m", 3.00, "{}"),
      (4L, ts("2024-01-01 10:00:03"), 1L, "m", 4.00, "{}"),
      (5L, ts("2024-01-01 10:00:04"), 1L, "m", 100.00, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.typeOutliers(ev).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((5L, 100.0, 97.0)), s"got ${got.toSeq}")
  }

  test("histogram: floor-div bins with exact counts") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "m", 0.50, "{}"),   // bin 0
      (2L, ts("2024-01-01 10:00:01"), 1L, "m", 9.99, "{}"),   // bin 0
      (3L, ts("2024-01-01 10:00:02"), 1L, "m", 10.00, "{}"),  // bin 1
      (4L, ts("2024-01-01 10:00:03"), 1L, "m", 25.00, "{}")   // bin 2
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.typeHistogram(ev).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0.0, 2L), (1L, 10.0, 1L), (2L, 20.0, 1L)),
      s"got ${got.toSeq}")
  }

  test("conversion lag: first purchase AFTER first view, per user") {
    val ev = Seq(
      // user 1: view at t0, purchases before (ignored) and after (+30s)
      (1L, ts("2024-01-01 10:00:00"), 1L, "purchase", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "view", 1.0, "{}"),
      (3L, ts("2024-01-01 10:01:30"), 1L, "purchase", 1.0, "{}"),
      (4L, ts("2024-01-01 10:05:00"), 1L, "purchase", 1.0, "{}"),
      // user 2: views but never purchases -> absent
      (5L, ts("2024-01-01 10:00:00"), 2L, "view", 1.0, "{}"),
      // user 3: purchases but never views -> absent
      (6L, ts("2024-01-01 10:00:00"), 3L, "purchase", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.conversionLag(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 30L)), s"got $got")
  }

  test("rolling HLL: merged daily registers track exact trailing distincts") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val got = EventOps.hllUsersRolling(ev).collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    assert(got.nonEmpty)
    // m=256 registers -> relative error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    got.foreach { case (est, exact) =>
      assert(math.abs(est - exact) / exact < 0.20,
        s"est $est vs exact $exact")
    }
    // determinism (pure function of the data)
    val again = EventOps.hllUsersRolling(ev).collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    assert(again.sameElements(got))
  }

  test("CUSUM: no alarms on a median-flat series, fires after a sustained step") {
    // 5 values at 10 (median 10, deviations 0 -> S=0), then a step to
    // 60: deviations +50 accumulate S = 50,100,150 -> threshold 100
    // fires at the 2nd and 3rd post-step events
    val ev = (1 to 5).map(i =>
      (i.toLong, ts(f"2024-01-01 10:00:0${i - 1}"), 1L, "m", 10.00, "{}")) ++
      Seq(
        (6L, ts("2024-01-01 10:01:00"), 1L, "m", 60.00, "{}"),
        (7L, ts("2024-01-01 10:01:01"), 1L, "m", 60.00, "{}"),
        (8L, ts("2024-01-01 10:01:02"), 1L, "m", 60.00, "{}"))
    val df = ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.typeCusum(df, threshold = 100.0).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == Seq((7L, 100.0), (8L, 150.0)), s"got ${got.toSeq}")
    // closed form == sequential fold on the same series
    val vals = ev.map(_._5)
    val med = 10.0
    var st = 0.0
    val seq = vals.map { v => st = math.max(0.0, st + (v - med)); st }
    assert(seq.zipWithIndex.filter(_._1 >= 100.0).map(_._2 + 1).toSeq
      == got.map(_._1.toInt).toSeq)
  }

  test("media dedup: identical payloads collapse to the lowest doc_id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same bytes"), (2L, "same bytes"), (5L, "same bytes"),
      (3L, "unique")
    ).toDF("doc_id", "text")
    val got = Multimodal.mediaDedup(Multimodal.mediaFromDocuments(docs))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == Map(1L -> 3L, 3L -> 1L), s"got $got")
  }

  test("PSI: shifted second half scores high drift, identical halves near zero") {
    def mk(rows: Seq[(Long, java.sql.Timestamp, Double)]) =
      rows.map { case (i, t, v) => (i, t, 1L, "m", v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // first hour: values around 1..10; second hour: shifted to 91..100
    val drift = mk((0 until 50).map(i =>
      (i.toLong, ts(f"2024-01-01 10:${i % 50}%02d:00"), 1.0 + (i % 10))) ++
      (0 until 50).map(i =>
        (50L + i, ts(f"2024-01-01 12:${i % 50}%02d:00"), 91.0 + (i % 10))))
    val d = EventOps.psiDrift(drift).collect()(0)
    assert(d.getLong(1) == 50 && d.getLong(2) == 50)
    assert(d.getDouble(0) > 1.0, s"psi=${d.getDouble(0)}") // gross shift
    // same value distribution in both halves → PSI ≈ 0
    val same = mk((0 until 50).map(i =>
      (i.toLong, ts(f"2024-01-01 10:${i % 50}%02d:00"), 1.0 + (i % 10))) ++
      (0 until 50).map(i =>
        (50L + i, ts(f"2024-01-01 12:${i % 50}%02d:00"), 1.0 + (i % 10))))
    val s0 = EventOps.psiDrift(same).collect()(0)
    assert(math.abs(s0.getDouble(0)) < 1e-9, s"psi=${s0.getDouble(0)}")
  }

  test("KMV overlap: planted half-overlap estimated from sketches, exact alongside") {
    // A = users 0..199, B = users 100..299 → overlap 100, union 300
    val rows =
      (0 until 200).map(u => (u.toLong, ts("2024-01-01 10:00:00"), u.toLong, "A", 1.0, "{}")) ++
      (0 until 200).map(u => (1000L + u, ts("2024-01-01 10:00:00"), 100L + u, "B", 1.0, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.kmvOverlap(ev).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getString(0) == "A" && row.getString(1) == "B")
    assert(row.getLong(4) == 100, s"exact=${row.getLong(4)}")
    val estU = row.getDouble(2); val estO = row.getDouble(3)
    // k=64 KMV: stderr ≈ 1/√62 ≈ 13%; allow 3σ
    assert(math.abs(estU - 300.0) / 300.0 < 0.4, s"est_union=$estU")
    assert(math.abs(estO - 100.0) / 100.0 < 0.6, s"est_overlap=$estO")
  }

  test("dp counts: keyed Laplace noise is reproducible and count-independent") {
    import spark.implicits._
    val a = Seq(("x", 1L), ("x", 2L), ("y", 3L)).toDF("event_type", "event_id")
    val b = Seq(("x", 9L), ("y", 8L), ("y", 7L), ("y", 6L)).toDF("event_type", "event_id")
    def noise(df: org.apache.spark.sql.DataFrame) =
      EventOps.dpCounts(df).collect()
        .map(r => r.getString(0) ->
          (r.getAs[Double]("noisy_n") - r.getAs[Long]("n"))).toMap
    val na = noise(a); val nb = noise(b)
    // noise is a pure function of (seed, key): same per key across inputs
    assert(na("x") == nb("x") && na("y") == nb("y"))
    // a different epsilon scales the same draw by 1/eps exactly
    val half = EventOps.dpCounts(a, epsilon = 2.0).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("noisy_n") - r.getAs[Long]("n"))).toMap
    assert(math.abs(half("x") - na("x") * 0.5) < 1e-12)
  }

  test("dHash: real-codec hash equals the codec-free closed-form hash") {
    import spark.implicits._
    val ids = Seq(5L, 12L, 123L, 321L)
    val got = Multimodal.pngDHash(ids.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // reference: same grid algebra straight off the pixel function
    def ref(id: Long): (Long, Long) = {
      val w = (id % 16 + 8).toInt; val h = (id % 12 + 6).toInt
      val sg = Array.ofDim[Long](8, 9); val n = Array.ofDim[Long](8, 9)
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.pixel(id, x, y)
        sg(y * 8 / h)(x * 9 / w) +=
          ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        n(y * 8 / h)(x * 9 / w) += 1
      }
      var lo = 0L; var hi = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (sg(r)(c) * n(r)(c + 1) > sg(r)(c + 1) * n(r)(c)) {
          val k = r * 8 + c
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
      (hi, lo)
    }
    ids.foreach(id => assert(got(id) == ref(id), s"doc $id"))
    // hashes discriminate: not all equal across different images
    assert(got.values.toSet.size > 1)
  }

  test("phash pairs: identical images at distance 0, pigeonhole is lossless") {
    import spark.implicits._
    // doc ids congruent mod lcm(16,12,256-ish pattern) share dims AND
    // pixels only when the pixel formula coincides; ids 5 and 5 would be
    // trivial - instead verify against a brute-force all-pairs check
    val ids = (1L to 60L).toDF("doc_id")
    val got = Multimodal.phashNearDups(ids, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ph = Multimodal.pngDHash(ids).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val brute = (for {
      a <- 1L to 60L; b <- (a + 1) to 60L
      d = java.lang.Long.bitCount(ph(a)._1 ^ ph(b)._1) +
        java.lang.Long.bitCount(ph(a)._2 ^ ph(b)._2)
      if d <= 3
    } yield (a, b, d)).toSet
    assert(got == brute)   // candidate generation misses nothing
  }

  test("stationary distribution: two-state chain converges to the known fixpoint") {
    import spark.implicits._
    // transitions: a->a 1x, a->b 3x, b->a 3x  =>  P(a->b)=3/4,
    // P(b->a)=1  =>  stationary pi = (4/7, 3/7)
    val evs = Seq(
      // user 1: a a b a b a b a  (a->a once, a->b 3x, b->a 3x)
      (1L, "a", 1L), (1L, "a", 2L), (1L, "b", 3L), (1L, "a", 4L),
      (1L, "b", 5L), (1L, "a", 6L), (1L, "b", 7L), (1L, "a", 8L)
    ).map { case (u, t, i) =>
      (u, t, i, java.sql.Timestamp.valueOf(s"2020-01-01 00:00:0$i"))
    }.toDF("user_id", "event_type", "event_id", "ts")
    val pi = EventOps.stationaryDistribution(evs, iters = 40).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pi("a") - 4.0 / 7) < 1e-6 && math.abs(pi("b") - 3.0 / 7) < 1e-6)
    assert(math.abs(pi.values.sum - 1.0) < 1e-9)
  }

  test("survival: hand Kaplan-Meier with censoring; d=n tail hits zero") {
    import spark.implicits._
    def ev(u: Long, t: String, sec: Int) =
      (u, t, u * 100 + sec, java.sql.Timestamp.valueOf(
        f"2020-01-01 00:00:$sec%02d"))
    // users 1,2 convert at +1s and +2s; user 3 views only (censored at
    // the corpus end = +30s); user 4 never views (not in the cohort)
    val evs = Seq(
      ev(1, "view", 0), ev(1, "purchase", 1),
      ev(2, "view", 0), ev(2, "purchase", 2),
      ev(3, "view", 0),
      ev(4, "purchase", 30)
    ).toDF("user_id", "event_type", "event_id", "ts")
    val r = EventOps.survivalCurve(evs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getAs[Double]("surv"))).toMap
    // t=1: n=3 d=1 -> S=2/3 ; t=2: n=2 d=1 -> S=1/3 ; censor adds no row
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L)._1 == 3L && r(1L)._2 == 1L)
    assert(math.abs(r(1L)._3 - 2.0 / 3) < 1e-12)
    assert(r(2L)._1 == 2L && math.abs(r(2L)._3 - 1.0 / 3) < 1e-12)
    // drop the censored user: at t=2 everyone remaining converts -> S=0
    val r2 = EventOps.survivalCurve(evs.filter(col("user_id") =!= 3L))
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("surv")).toMap
    assert(r2(2L) == 0.0 && math.abs(r2(1L) - 0.5) < 1e-12)
  }

  test("attribution: first/last/linear hand credits; post-purchase ignored") {
    import spark.implicits._
    def ev(u: Long, t: String, sec: Int, id: Long) =
      (u, t, id, java.sql.Timestamp.valueOf(f"2020-01-01 00:00:$sec%02d"))
    val evs = Seq(
      // user 1: view click view purchase -> first=view last=view
      // linear: view 2/3, click 1/3
      ev(1, "view", 1, 11), ev(1, "click", 2, 12), ev(1, "view", 3, 13),
      ev(1, "purchase", 4, 14),
      ev(1, "click", 5, 15),                       // after purchase: ignored
      // user 2: click purchase -> all credit to click
      ev(2, "click", 1, 21), ev(2, "purchase", 2, 22),
      // user 3: views but never buys: not attributed
      ev(3, "view", 1, 31)
    ).toDF("user_id", "event_type", "event_id", "ts")
      .select("user_id", "event_type", "event_id", "ts")
    val r = EventOps.attributionCredits(evs).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getAs[Double]("linear"))).toMap
    assert(r("view") == ((1L, 1L, r("view")._3)))
    assert(math.abs(r("view")._3 - 2.0 / 3) < 1e-9)
    assert(r("click")._1 == 1L && r("click")._2 == 1L)
    assert(math.abs(r("click")._3 - (1.0 / 3 + 1.0)) < 1e-9)
  }

  test("ses forecast: geometric weights over trailing buckets, hand value") {
    import spark.implicits._
    def ev(t: String, hour: Int, id: Long) =
      (1L, t, id, java.sql.Timestamp.valueOf(f"2020-01-01 $hour%02d:30:00"))
    // type a: counts 2 then 3 in the last two hours -> forecast
    // 0.3*3 + 0.3*0.7*2 = 1.32 ; type b only in the last hour: 0.3*4
    val evs = Seq(
      ev("a", 10, 1), ev("a", 10, 2),
      ev("a", 11, 3), ev("a", 11, 4), ev("a", 11, 5),
      ev("b", 11, 6), ev("b", 11, 7), ev("b", 11, 8), ev("b", 11, 9)
    ).toDF("user_id", "event_type", "event_id", "ts")
    val f = EventOps.sesForecast(evs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(f("a") - (0.3 * 3 + 0.3 * 0.7 * 2)) < 1e-9)
    assert(math.abs(f("b") - 0.3 * 4) < 1e-9)
    // a bucket older than the horizon contributes nothing
    val old = Seq((1L, "a", 99L, java.sql.Timestamp.valueOf("2019-12-01 00:00:00")))
      .toDF("user_id", "event_type", "event_id", "ts")
    val f2 = EventOps.sesForecast(evs.union(old)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(f2 == f)
  }

  test("rank suite: ties share ranks with SQL-standard gaps and ratios") {
    import spark.implicits._
    val evs = Seq((1L, "a", 10.0), (2L, "a", 10.0), (3L, "a", 20.0),
      (4L, "a", 30.0)).toDF("event_id", "event_type", "value")
    val r = EventOps.rankSuite(evs).collect()
      .map(x => x.getLong(0) -> (x.getInt(3), x.getInt(4),
        x.getAs[Double]("prnk"), x.getAs[Double]("cdist"))).toMap
    // tie at 10.0: rank 1,1 then GAP to 3; dense_rank 1,1,2,3
    assert(r(1L) == ((1, 1, 0.0, 0.5)) && r(2L) == ((1, 1, 0.0, 0.5)))
    assert(r(3L) == ((3, 2, 2.0 / 3, 0.75)))
    assert(r(4L) == ((4, 3, 1.0, 1.0)))
  }

  test("entropy rate: deterministic chain is 0, fair alternation is ln 2") {
    import spark.implicits._
    def mk(seq: String) = seq.zipWithIndex.map { case (c, i) =>
      (1L, c.toString, i.toLong,
        java.sql.Timestamp.valueOf(f"2020-01-01 00:00:${i}%02d"))
    }.toDF("user_id", "event_type", "event_id", "ts")
    // strict alternation: every transition is certain -> H = 0
    val det = EventOps.entropyRate(mk("abababab"), iters = 30).collect()(0)
    assert(det.getAs[Double]("entropy_nats") == 0.0)
    // from each state both successors equally likely -> H = ln 2
    val fair = EventOps.entropyRate(mk("aabbabba" * 8), iters = 60).collect()(0)
    assert(math.abs(fair.getAs[Double]("entropy_nats") - math.log(2)) < 0.05)
  }
}
