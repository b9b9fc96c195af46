package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Drives the streaming operators with MemoryStream micro-batches and
  * asserts on the materialized memory-sink tables. */
class StreamOpsSpec extends SparkSpec {
  import StreamOps._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed agg over a stream produces per-hour per-type counts after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = windowedTypeAgg(events, "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    in.addData(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:45:00"), "click", 2.0),
      (ts("2024-01-01 11:10:00"), "view", 5.0),
      // watermark driver: far-future event closes the earlier windows
      (ts("2024-01-02 00:00:00"), "view", 0.0))
    q.processAllAvailable()
    // append output materializes in the batch AFTER the watermark advances
    in.addData((ts("2024-01-03 00:00:00"), "view", 0.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win_agg").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(2)) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    assert(rows(("2024-01-01 10:00:00.0", "click")) == ((2L, 3.0)))
    assert(rows(("2024-01-01 11:00:00.0", "view")) == ((1L, 5.0)))
  }

  test("stateful sessionization closes sessions on gap and on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = sessionizeStream(in.toDS(), gapMinutes = 30, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // user 1: two events 10 min apart (one session), then 50-min gap (new session)
    in.addData(
      Ev(1L, ts("2024-01-01 10:00:00"), 1.0),
      Ev(1L, ts("2024-01-01 10:10:00"), 2.0),
      Ev(1L, ts("2024-01-01 11:00:00"), 4.0))
    q.processAllAvailable()
    // advance the watermark far enough to time out the open session;
    // the timeout fires in the batch after the watermark update
    in.addData(Ev(99L, ts("2024-01-02 00:00:00"), 0.0))
    q.processAllAvailable()
    in.addData(Ev(99L, ts("2024-01-03 00:00:00"), 0.0))
    q.processAllAvailable(); q.stop()
    val sess = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3), r.getDouble(4)))
    val u1 = sess.filter(_._1 == 1L).sortBy(_._2)
    assert(u1.length == 2)
    assert(u1(0) == ((1L, "2024-01-01 10:00:00.0", 2L, 3.0)))
    assert(u1(1) == ((1L, "2024-01-01 11:00:00.0", 1L, 4.0)))
  }

  test("built-in session_window merges within gap and splits across it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val events = in.toDF().toDF("user_id", "ts", "value")
    val q = StreamOps.sessionWindowAgg(events, gap = "30 minutes")
      .writeStream.format("memory").queryName("sw_sessions")
      .outputMode("append").start()
    in.addData(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0), // merges: gap 10 min < 30
      (1L, ts("2024-01-01 11:00:00"), 4.0)) // splits: gap 50 min
    q.processAllAvailable()
    in.addData((9L, ts("2024-01-02 00:00:00"), 0.0)) // advance watermark
    q.processAllAvailable()
    in.addData((9L, ts("2024-01-03 00:00:00"), 0.0))
    q.processAllAvailable(); q.stop()
    val sess = spark.table("sw_sessions").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(sess.length == 2)
    // session end = last event + gap
    assert(sess(0) == (("2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 2L, 3.0)))
    assert(sess(1) == (("2024-01-01 11:00:00.0", "2024-01-01 11:30:00.0", 1L, 4.0)))
  }

  test("stream-static enrichment joins dimension rows without stream state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", "engagement"), ("view", "impression"))
      .toDF("event_type", "category")
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.enrichStream(events, dim, "event_type")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    in.addData(
      (ts("2024-01-01 10:00:00"), "click", 1.0),
      (ts("2024-01-01 10:01:00"), "scroll", 2.0)) // no dim row → null
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enriched").collect()
      .map(r => r.getString(0) -> Option(r.getString(3))).toMap
    assert(rows("click").contains("engagement"))
    assert(rows("scroll").isEmpty) // left join keeps unmatched stream rows
  }

  test("stream-static interval tagging matches containing windows, bounds inclusive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      (200L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:30:00"))
    ).toDF("interval_id", "t_start", "t_end")
    val in = MemoryStream[(Long, Timestamp)]
    val events = in.toDF().toDF("event_id", "ts")
    val q = StreamOps.intervalTagStream(events, intervals)
      .writeStream.format("memory").queryName("tagged")
      .outputMode("append").start()
    in.addData(
      (1L, ts("2024-01-01 10:00:00")),  // start bound → interval 100 only
      (2L, ts("2024-01-01 10:07:00")),  // inside both → 2 rows
      (3L, ts("2024-01-01 10:10:00")),  // end bound 100, inside 200
      (4L, ts("2024-01-01 11:00:00")))  // outside all → dropped
    q.processAllAvailable(); q.stop()
    val tags = spark.table("tagged").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("interval_id")))
      .sorted.toSeq
    assert(tags == Seq((1L, 100L), (2L, 100L), (2L, 200L),
      (3L, 100L), (3L, 200L)))
  }

  test("streaming dedup drops re-delivered events within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val events = in.toDF().toDF("event_id", "ts", "value")
    val q = StreamOps.dedupStream(events, Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    in.addData(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-01 10:01:00"), 2.0),
      (1L, ts("2024-01-01 10:00:00"), 1.0)) // exact re-delivery
    q.processAllAvailable()
    in.addData((1L, ts("2024-01-01 10:00:00"), 1.0)) // re-delivery, later batch
    q.processAllAvailable(); q.stop()
    val ids = spark.table("deduped").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("streaming exact dedup collapses same-text docs across batches within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamOps.exactDedupStream(docs)
      .writeStream.format("memory").queryName("exact_deduped")
      .outputMode("append").start()
    in.addData((1L, "aaa"), (2L, "bbb"))
    q.processAllAvailable()
    // cross-batch state: doc 3 repeats batch-1's text under a NEW
    // doc_id and must be dropped by the digest state carried over
    in.addData((3L, "aaa"), (4L, "ccc"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("exact_deduped").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._2)
    assert(got.map(_._2).toSeq == Seq("aaa", "bbb", "ccc"))
    // the digest column is the md5 the batch twin computes
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    got.foreach { case (d, t) => assert(d == hex(t)) }
  }

  test("hash-bucket split assignment runs unchanged on a stream and agrees with batch") {
    // Sampling.splitAssign is a stateless projection, so the SAME
    // operator works under readStream — and because the bucket is a
    // content hash, the streaming assignment must agree row-for-row
    // with the batch assignment of the same ids (rand()-based splits
    // cannot make that promise)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = graft.ops.Sampling.splitAssign(docs)
      .writeStream.format("memory").queryName("stream_split")
      .outputMode("append").start()
    in.addData((1L, "a"), (2L, "b"), (3L, "c"))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("stream_split").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val batch = graft.ops.Sampling
      .splitAssign(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(streamed == batch)
    assert(streamed.size == 3)
  }

  test("the same windowed-agg code runs on a bounded batch frame") {
    import spark.implicits._
    val batch = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:45:00"), "click", 2.0)
    ).toDF("ts", "event_type", "value")
    val got = windowedTypeAgg(batch).collect()
    assert(got.length == 1 && got(0).getLong(3) == 2L)
  }

  test("streaming packer carries per-shard offsets across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    val q = packStream(in.toDS(), capacity = 5)
      .writeStream.format("memory").queryName("packed_stream")
      .outputMode("append").start()
    in.addData(Doc(1L, "sa", 3), Doc(2L, "sa", 4), Doc(3L, "sb", 2))
    q.processAllAvailable()
    in.addData(Doc(4L, "sa", 2)) // must continue sa's running total (7)
    q.processAllAvailable(); q.stop()
    val got = spark.table("packed_stream").collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      1L -> ((0L, 0L)), 2L -> ((0L, 3L)), 3L -> ((0L, 0L)),
      4L -> ((1L, 2L)))) // cum 7 at capacity 5 -> bin 1, offset 2
    // identical layout to the batch packer over the same arrival order
    val batch = graft.ops.PretrainOps.packBy(
      Seq((1L, "sa", 3L), (2L, "sa", 4L), (3L, "sb", 2L), (4L, "sa", 2L))
        .toDF("doc_id", "source", "n_tokens"),
      "n_tokens", "source", Seq("doc_id"), capacity = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(batch == got)
  }

  test("bounded packer matches the sorted packer's cross-batch state contract") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    val q = packStreamBounded(in.toDS(), capacity = 5)
      .writeStream.format("memory").queryName("packed_bounded")
      .outputMode("append").start()
    in.addData(Doc(1L, "sa", 3), Doc(2L, "sa", 4), Doc(3L, "sb", 2))
    q.processAllAvailable()
    // cross-batch: the lazy in-iterator state.update must have committed
    // cum=7 for sa when the first batch's output iterator was drained —
    // this pins the CompletionIterator contract the packer relies on
    in.addData(Doc(4L, "sa", 2), Doc(5L, "sb", 1))
    q.processAllAvailable(); q.stop()
    val got = spark.table("packed_bounded").collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      1L -> ((0L, 0L)), 2L -> ((0L, 3L)), 3L -> ((0L, 0L)),
      4L -> ((1L, 2L)), // sa cum 7 at capacity 5 -> bin 1, offset 2
      5L -> ((0L, 2L)))) // sb cum 2 -> bin 0, offset 2
  }

  test("streaming latest-state emits each user's current row across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EvKeyed]
    val q = latestStateStream(in.toDS())
      .writeStream.format("memory").queryName("latest_state")
      .outputMode("update").start()
    in.addData(
      EvKeyed(1L, ts("2024-01-01 10:00:00"), 1L, 1.0),
      EvKeyed(1L, ts("2024-01-01 11:00:00"), 2L, 2.0), // newer wins in-batch
      EvKeyed(2L, ts("2024-01-01 10:30:00"), 3L, 3.0))
    q.processAllAvailable()
    // batch 2: a STALE event for user 1 must NOT displace state; a tie
    // on ts for user 2 resolves by event_id
    in.addData(
      EvKeyed(1L, ts("2024-01-01 09:00:00"), 4L, 9.0),
      EvKeyed(2L, ts("2024-01-01 10:30:00"), 5L, 5.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("latest_state").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // last emission per user is the current state
    val last = rows.zipWithIndex.groupBy(_._1._1)
      .map { case (u, xs) => u -> xs.maxBy(_._2)._1 }
    assert(last(1L) == ((1L, 2L, 2.0)), "stale event must not displace")
    assert(last(2L) == ((2L, 5L, 5.0)), "ts tie resolves by event_id")
    // agrees with the batch operator over the full replay
    val batch = graft.ops.EventOps.latestState(
      Seq((1L, ts("2024-01-01 10:00:00"), 1L, 1.0),
        (1L, ts("2024-01-01 11:00:00"), 2L, 2.0),
        (2L, ts("2024-01-01 10:30:00"), 3L, 3.0),
        (1L, ts("2024-01-01 09:00:00"), 4L, 9.0),
        (2L, ts("2024-01-01 10:30:00"), 5L, 5.0))
        .toDF("user_id", "ts", "event_id", "value")
        .withColumn("event_type", org.apache.spark.sql.functions.lit("t")))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(batch == last.map { case (u, (_, _, v)) => u -> v })
  }

  test("streaming moving stats match the batch ROWS frame on in-order replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EvKeyed]
    val q = movingStatsStream(in.toDS())
      .writeStream.format("memory").queryName("moving_stream")
      .outputMode("append").start()
    // two micro-batches, events arriving in (ts, event_id) order per user
    in.addData(
      EvKeyed(1L, ts("2024-01-01 10:00:00"), 1L, 1.00),
      EvKeyed(1L, ts("2024-01-01 10:01:00"), 2L, 2.00))
    q.processAllAvailable()
    in.addData( // frame must continue across the batch boundary
      EvKeyed(1L, ts("2024-01-01 10:02:00"), 3L, 4.00),
      EvKeyed(1L, ts("2024-01-01 10:03:00"), 4L, 8.00),
      EvKeyed(1L, ts("2024-01-01 10:04:00"), 5L, 16.00), // evicts e1
      EvKeyed(2L, ts("2024-01-01 10:00:00"), 6L, 3.33))
    q.processAllAvailable(); q.stop()
    val got = spark.table("moving_stream").collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got(2L) == ((2L, 3.0, 1.5)))
    assert(got(4L) == ((4L, 15.0, 3.75)))
    assert(got(5L) == ((4L, 30.0, 7.5)), "4-event frame drops e1")
    // bit-exact vs the batch operator on the same (in-order) relation
    val batch = graft.ops.EventOps.movingStats(
      Seq(
        (1L, ts("2024-01-01 10:00:00"), 1L, "t", 1.00, "{}"),
        (2L, ts("2024-01-01 10:01:00"), 1L, "t", 2.00, "{}"),
        (3L, ts("2024-01-01 10:02:00"), 1L, "t", 4.00, "{}"),
        (4L, ts("2024-01-01 10:03:00"), 1L, "t", 8.00, "{}"),
        (5L, ts("2024-01-01 10:04:00"), 1L, "t", 16.00, "{}"),
        (6L, ts("2024-01-01 10:00:00"), 2L, "t", 3.33, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    batch.foreach { case (id, (n, s, a)) =>
      val (gn, gs, ga) = got(id)
      assert(gn == n)
      assert(java.lang.Double.doubleToLongBits(gs) ==
        java.lang.Double.doubleToLongBits(s), s"mv_sum event $id")
      assert(java.lang.Double.doubleToLongBits(ga) ==
        java.lang.Double.doubleToLongBits(a), s"mv_avg event $id")
    }
  }

  test("stream-stream attribution joins clicks to in-window impressions only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp, Long)]
    val clks = MemoryStream[(Long, Timestamp, Long)]
    val q = attributeStream(
      imps.toDF().toDF("user_id", "ts", "event_id"),
      clks.toDF().toDF("user_id", "ts", "event_id"),
      windowMinutes = 30)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    imps.addData(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 10:20:00"), 101L),  // also within 30 min of the click
      (2L, ts("2024-01-01 10:00:00"), 102L))  // other user — never joins
    clks.addData(
      (1L, ts("2024-01-01 10:25:00"), 200L),  // joins imp 100 and 101
      (1L, ts("2024-01-01 11:30:00"), 201L),  // > 30 min after both imps
      (2L, ts("2024-01-01 09:59:00"), 202L))  // click BEFORE the impression
    q.processAllAvailable()
    // advance both watermarks so the inner-join state flushes
    imps.addData((8L, ts("2024-01-02 00:00:00"), 900L))
    clks.addData((9L, ts("2024-01-02 00:00:00"), 901L))
    q.processAllAvailable(); q.stop()
    val got = spark.table("attrib").collect()
      .map(r => (r.getLong(3), r.getLong(1))).sorted.toSeq
    assert(got == Seq((200L, 100L), (200L, 101L)))
  }

  test("stream-stream join state is watermark-bounded, cross-batch matches still land") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp, Long)]
    val clks = MemoryStream[(Long, Timestamp, Long)]
    val q = attributeStream(
      imps.toDF().toDF("user_id", "ts", "event_id"),
      clks.toDF().toDF("user_id", "ts", "event_id"),
      windowMinutes = 30, watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("attrib_xbatch")
      .outputMode("append").start()
    // impression arrives in batch 1, matching click in batch 2:
    // the buffered impression must still join
    imps.addData((1L, ts("2024-01-01 10:00:00"), 100L))
    q.processAllAvailable()
    clks.addData((1L, ts("2024-01-01 10:10:00"), 200L))
    q.processAllAvailable()
    imps.addData((8L, ts("2024-01-02 00:00:00"), 900L))
    clks.addData((9L, ts("2024-01-02 00:00:00"), 901L))
    q.processAllAvailable(); q.stop()
    val got = spark.table("attrib_xbatch").collect()
      .map(r => (r.getLong(3), r.getLong(1))).toSeq
    assert(got == Seq((200L, 100L)))
  }

  test("file-source event stream reads the real parquet with the nanos conversion") {
    val stream = readEventStream(spark, "/root/testdata/sf0.001")
    assert(stream.isStreaming)
    val q = windowedTypeAgg(stream)
      .writeStream.format("memory").queryName("file_stream_agg")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // append mode emits only watermark-closed windows; the aggregation
    // itself must have consumed the file without error
    assert(spark.table("file_stream_agg").schema.fieldNames.contains("n_events"))
  }

  test("transformWithState seq numbers continue across micro-batches per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Timestamp, Long)]
      val events = in.toDF().toDF("user_id", "ts", "event_id")
      val q = seqNumStream(events).toDF()
        .writeStream.format("memory").queryName("seqnum")
        .outputMode("append").start()
      // batch 1: user 1 gets two events (out of ts order in the batch),
      // user 2 one
      in.addData((1L, ts("2024-01-01 10:30:00"), 11L),
        (1L, ts("2024-01-01 10:00:00"), 10L),
        (2L, ts("2024-01-01 10:00:00"), 20L))
      q.processAllAvailable()
      // batch 2: user 1's counter must CONTINUE from ValueState (seq 3),
      // not restart
      in.addData((1L, ts("2024-01-01 11:00:00"), 12L))
      q.processAllAvailable(); q.stop()
      val got = spark.table("seqnum").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == Map(
        (1L, 10L) -> 1L, (1L, 11L) -> 2L, (1L, 12L) -> 3L,
        (2L, 20L) -> 1L))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState session labels: gap starts a new session, index survives batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Timestamp, Long)]
      val events = in.toDF().toDF("user_id", "ts", "event_id")
      val q = sessionTagStream(events, gapMinutes = 30).toDF()
        .writeStream.format("memory").queryName("sess_tws")
        .outputMode("append").start()
      // batch 1: two events 10 min apart (one session), then a 30-min
      // gap EXACTLY at the threshold — new session (oracle uses >=)
      in.addData((1L, ts("2024-01-01 10:00:00"), 1L),
        (1L, ts("2024-01-01 10:10:00"), 2L),
        (1L, ts("2024-01-01 10:40:00"), 3L))
      q.processAllAvailable()
      // batch 2: 5 min after the last event — session 2 CONTINUES from
      // the cursor state; then a big gap — session 3
      in.addData((1L, ts("2024-01-01 10:45:00"), 4L),
        (1L, ts("2024-01-01 23:00:00"), 5L))
      q.processAllAvailable(); q.stop()
      val got = spark.table("sess_tws").collect()
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
