package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType
import java.sql.Timestamp

/** Structured-Streaming faces of the event analytics in
  * [[graft.ops.EventOps]]. The reference is batch-only (SURVEY.md §1.4 —
  * its flink-streaming dependency is unused template residue); these
  * operators are the streaming half of the §2.2 extension surface:
  * readStream → transform → writeStream with watermarks, windowed
  * aggregation, and custom session state via flatMapGroupsWithState.
  *
  * Every transform takes a DataFrame so the SAME code runs on a bounded
  * batch frame or a `spark.readStream` frame — the Structured Streaming
  * contract. 100 TB posture: state is keyed and bounded — windowed aggs
  * evict on watermark, session state times out on event-time gap; no
  * unbounded driver or executor accumulation.
  */
object StreamOps {

  private val Dec = DecimalType(28, 6)

  /** Tumbling event-time windows per event_type with late-data handling:
    * events later than `watermarkDelay` behind max event time are
    * dropped and the window state is evicted. Append-mode compatible. */
  def windowedTypeAgg(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding-window variant (windowLen every slide). */
  def slidingTypeAgg(
      events: DataFrame,
      windowLen: String = "1 hour",
      slide: String = "15 minutes",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Declarative session windows via the built-in `session_window`
    * (dynamic-gap merging handled by the engine's session-window state
    * store) — the twin of the custom flatMapGroupsWithState sessionizer
    * below; prefer this one unless the session logic needs custom state
    * (e.g. emitting partial sessions or per-event side outputs). */
  def sessionWindowAgg(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Stream-static enrichment: join the event stream against a static
    * dimension relation (broadcast — no stream state, no shuffle of the
    * stream side beyond the stateless map). The standard shape for
    * attaching slowly-changing metadata at ingest. */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-static interval tagging — the streaming twin of
    * EventOps.intervalJoinBinned: each arriving event joins every
    * static interval containing its ts (inclusive bounds) through the
    * same bin-key EQUI join (events bin in the scan, intervals explode
    * into overlapped bins, exact BETWEEN as a post-join filter). The
    * join is stateless (no watermark, no stream state) and
    * append-mode; a nested-loop range join against a stream would not
    * even plan, which is the point of the binning. */
  def intervalTagStream(
      events: DataFrame, intervals: DataFrame,
      binMinutes: Int = 10): DataFrame = {
    val binUs = binMinutes.toLong * 60L * 1000000L
    def binOf(c: Column) = graft.ops.EventOps.floorDiv(unix_micros(c), binUs)
    val iv = intervals
      .filter(col("t_start") <= col("t_end"))
      .withColumn("__bin", explode(sequence(
        binOf(col("t_start")), binOf(col("t_end")))))
    events.withColumn("__bin", binOf(col("ts")))
      .join(broadcast(iv), Seq("__bin"))
      .filter(col("ts") >= col("t_start") && col("ts") <= col("t_end"))
      .drop("__bin")
  }

  /** STREAM-STREAM event-time range join — impression→click
    * attribution: each click joins the impressions of the SAME user
    * whose ts precedes it by at most `windowMinutes`. Both sides carry
    * watermarks and the join condition bounds click.ts relative to
    * imp.ts from BOTH sides, so Structured Streaming can size the join
    * state and evict rows once the watermark passes — the state-bounded
    * form of the classic "did the ad lead to the click" join.
    *
    * 100 TB posture: state is (watermark window)-bounded per side and
    * keyed by user_id — the shuffle key — so state and matching both
    * scale with the per-key event rate, never the stream length.
    * Inner join in append mode; late rows on either side are dropped
    * by their own watermark, exactly like the batch as-of twin. */
  def attributeStream(
      impressions: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 30, watermarkDelay: String = "10 minutes"): DataFrame = {
    val imp = impressions
      .select(col("user_id"), col("ts").as("imp_ts"),
        col("event_id").as("imp_id"))
      .withWatermark("imp_ts", watermarkDelay)
    val clk = clicks
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermarkDelay)
    clk.join(imp,
      clk("user_id") === imp("user_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(clk("user_id"), col("imp_id"), col("imp_ts"),
        col("click_id"), col("click_ts"))
  }

  // -------------------------------------------------------------------
  // Stateful sessionization: custom per-user state via
  // flatMapGroupsWithState + event-time timeout. A session closes when
  // (a) a new event arrives more than `gap` after the session end, or
  // (b) the watermark passes session end + gap (timeout fires).
  // -------------------------------------------------------------------

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  def sessionizeStream(
      events: Dataset[Ev],
      gapMinutes: Int = 30,
      watermarkDelay: String = "2 hours"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def emit(uid: Long, s: SessionState): Session =
      Session(uid, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (evs.isEmpty && state.hasTimedOut) {
            // watermark passed session end + gap: close the open session
            val out = state.getOption.map(emit(uid, _)).toList
            state.remove()
            out.iterator
          } else {
            var closed = List.empty[Session]
            var cur = state.getOption
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= emit(uid, s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  case class EvKeyed(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  case class Latest(user_id: Long, ts: Timestamp, event_id: Long, value: Double)

  /** Streaming twin of EventOps.latestState (CDC changelog → current
    * state): per user, the event with the greatest (ts, event_id) seen
    * so far wins; each micro-batch emits the user's updated current row
    * (update-mode semantics). State is ONE row per user — bounded by
    * key cardinality, no watermark needed, exactly the batch query's
    * window top-1 computed incrementally. */
  def latestStateStream(events: Dataset[EvKeyed]): Dataset[Latest] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Latest, Latest](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[EvKeyed], state: GroupState[Latest]) =>
          var cur = state.getOption.orNull
          evs.foreach { e =>
            // Timestamp.compareTo carries the sub-millisecond nanos —
            // getTime would truncate to millis and mis-order ties
            val c = if (cur == null) 1 else e.ts.compareTo(cur.ts)
            if (c > 0 || (c == 0 && e.event_id > cur.event_id))
              cur = Latest(uid, e.ts, e.event_id, e.value)
          }
          if (cur == null) Iterator.empty
          else { state.update(cur); Iterator.single(cur) }
      }
  }

  case class Moving(
      user_id: Long, event_id: Long, mv_n: Long, mv_sum: Double,
      mv_avg: Double)

  /** Streaming twin of the batch trailing-ROWS frame in
    * `EventOps.movingStats`: per user, aggregates over the last 4
    * events (3 preceding + current) in arrival order. State is a ≤3-
    * element value buffer per user — O(frame) per key, bounded by key
    * cardinality like latestStateStream, no watermark needed. Sums ride
    * exact cent-integers (value is 2-decimal data), so a replay
    * produces bit-identical mv_sum/mv_avg to the batch frame whenever
    * arrival order matches the batch (ts, event_id) sort —
    * StreamOpsSpec pins that equivalence. */
  def movingStatsStream(events: Dataset[EvKeyed]): Dataset[Moving] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Long], Moving](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[EvKeyed], state: GroupState[List[Long]]) =>
          var buf = state.getOption.getOrElse(Nil) // newest-first cents
          val out = evs.map { e =>
            val cents = math.round(e.value * 100)
            buf = (cents :: buf).take(4)
            val sumC = buf.sum
            Moving(uid, e.event_id, buf.length.toLong, sumC / 100.0,
              sumC / 100.0 / buf.length)
          }.toList // drain before the state write below commits
          state.update(buf)
          out.iterator
      }
  }

  /** Streaming exact dedup: drop re-deliveries of the same key within
    * the watermark horizon (state is evicted once the watermark passes —
    * bounded memory; duplicates arriving later than `watermarkDelay`
    * are NOT caught, the standard streaming-dedup contract). */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String] = Seq("event_id"),
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates(keyCols :+ "ts")

  /** Streaming face of [[graft.ops.Dedup.exact]]: collapse same-TEXT
    * documents (not just redeliveries) as they stream in, via
    * `dropDuplicatesWithinWatermark` on the 128-bit content digest —
    * the state-evicting variant: a key's dedup state is dropped once
    * the watermark passes its first arrival + delay, so state is
    * bounded by the watermark horizon's distinct-key count, never the
    * corpus (the plain `dropDuplicates` above keeps ALL keys forever
    * when the event time is part of the key). Duplicates inside the
    * horizon are dropped exactly; later ones are the documented
    * streaming-dedup escape hatch (batch [[graft.ops.Dedup.exact]]
    * sweeps residuals).
    *
    * Which physical row survives a dup group is arrival-order
    * nondeterministic, so the output is projected to (digest, text) —
    * constant across every row of a group — BEFORE the sink; the
    * batch twin is `SELECT DISTINCT md5(text), text`. `ts` is
    * synthesized inside one hour (doc_id mod 3600 s) so every dup
    * pair sits within the 2-hour horizon: the gate run exercises the
    * real within-watermark path with completeness guaranteed. */
  def exactDedupStream(
      docs: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame =
    docs
      .select(
        // +1 day: the pre-batch watermark is the epoch itself, and a
        // row AT the watermark is already "late" — doc_id 0 at t=0
        // was silently dropped until the offset
        timestamp_seconds(col("doc_id") % 3600L + 86400L).as("ts"),
        md5(col("text").cast("binary")).as("digest"),
        col("text"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("digest"))
      .select("digest", "text")

  // -------------------------------------------------------------------
  // transformWithState (Spark 4.x arbitrary stateful API): per-user
  // running event sequence numbers. The NEW stateful primitive —
  // typed ValueState handles with per-state TTL, timers, and the
  // RocksDB-backed store it requires — replacing the monolithic
  // GroupState blob of flatMapGroupsWithState. The processor keeps ONE
  // long per user (the count so far) and stamps each arriving event
  // with its per-user arrival index; within a batch, rows are ordered
  // by (ts, event_id) so the replay is deterministic and equal to the
  // batch ROW_NUMBER twin. State is 8 bytes per user — bounded by the
  // key space, evictable via TTLConfig where keys churn.
  // -------------------------------------------------------------------

  case class EvId(user_id: Long, ts: Timestamp, event_id: Long)
  case class SeqOut(user_id: Long, event_id: Long, seq: Long)

  private class SeqNumProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EvId, SeqOut] {
    @transient private var cnt:
        org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EvId],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SeqOut] = {
      // batch-internal order is not defined by the engine; pin it to
      // event time (ties by id) so the replay is reproducible.
      // MEMORY BOUND: this buffers ONE KEY's rows of ONE MICRO-BATCH in
      // the task heap — O(events/user/batch), fine under steady
      // micro-batching; a single-batch AvailableNow replay of a heavily
      // skewed user holds that user's full history here (r14 advice).
      // At that shape, trigger with maxOffsetsPerTrigger-style batch
      // bounds or pre-sort within partitions so the processor streams.
      val sorted = rows.toIndexedSeq
        .sortBy(r => (r.ts.getTime, r.ts.getNanos, r.event_id))
      var c = if (cnt.exists()) cnt.get() else 0L
      val out = sorted.map { r => c += 1; SeqOut(key, r.event_id, c) }
      cnt.update(c)
      out.iterator
    }
  }

  /** Per-user running sequence number via transformWithState. The
    * caller must run this under the RocksDB state store provider (the
    * API requires it); the registration scopes that conf to a cloned
    * session so concurrent streams keep the default provider. */
  def seqNumStream(events: DataFrame): Dataset[SeqOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id")).as[EvId]
      .groupByKey(_.user_id)
      .transformWithState(new SeqNumProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** Full-precision event-time in microseconds (Timestamp.getTime
    * truncates to millis; a session boundary exactly at the gap would
    * be misjudged against the oracle's microsecond interval compare). */
  private def epochMicros(t: Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos.toLong / 1000L

  case class SessTag(user_id: Long, event_id: Long, sid: Long)
  // NOT private: the ValueState encoder's generated code constructs it
  // from outside this object (a private ctor makes janino fail and the
  // encoder silently fall back to the interpreted path)
  case class SessCursor(lastMicros: Long, sid: Long)

  private class SessionTagProcessor(gapMicros: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EvId, SessTag] {
    @transient private var cur:
        org.apache.spark.sql.streaming.ValueState[SessCursor] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      cur = getHandle.getValueState[SessCursor]("cursor",
        org.apache.spark.sql.Encoders.product[SessCursor],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EvId],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SessTag] = {
      // same per-(key, micro-batch) buffering bound as SeqNumProcessor
      val sorted = rows.toIndexedSeq
        .sortBy(r => (epochMicros(r.ts), r.event_id))
      var c = if (cur.exists()) cur.get() else SessCursor(Long.MinValue, 0L)
      val out = sorted.map { r =>
        val t = epochMicros(r.ts)
        // new session iff first-ever event or gap ≥ the threshold —
        // the oracle's `LAG IS NULL OR ts - LAG(ts) >= INTERVAL ...`
        val sid =
          if (c.lastMicros == Long.MinValue || t - c.lastMicros >= gapMicros)
            c.sid + 1
          else c.sid
        c = SessCursor(t, sid)
        SessTag(key, r.event_id, sid)
      }
      cur.update(c)
      out.iterator
    }
  }

  /** Per-event session labels via transformWithState: each event gets
    * its user's 1-based session index under a `gapMinutes` inactivity
    * rule. Output is append-per-event (no watermark wait), so the
    * AvailableNow replay sink is batch-complete and equals the classic
    * LAG/running-SUM window twin; across micro-batches the 16-byte
    * cursor state keeps indices continuing, which is the streaming
    * contract the batch window can't express. */
  def sessionTagStream(events: DataFrame,
      gapMinutes: Int = 30): Dataset[SessTag] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id")).as[EvId]
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionTagProcessor(gapMinutes.toLong * 60L * 1000000L),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  // -------------------------------------------------------------------
  // Streaming sequence packer: the stateful twin of
  // PretrainOps.packBy. Per-shard cumulative token totals live in
  // GroupState, so documents arriving across micro-batches keep
  // receiving contiguous (bin_id, offset_in_bin) slots exactly as the
  // batch window would assign them (within a batch, docs are processed
  // in doc_id order; across batches, arrival order IS the pack order —
  // the streaming contract). State is one long per shard: bounded by
  // shard count, no watermark needed.
  // -------------------------------------------------------------------

  case class Doc(doc_id: Long, source: String, n_tokens: Long)
  case class Packed(
      doc_id: Long, source: String, n_tokens: Long,
      bin_id: Long, offset_in_bin: Long)

  def packStream(docs: Dataset[Doc], capacity: Int = 512): Dataset[Packed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, Packed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: String, ds: Iterator[Doc], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          // The sortBy materializes ONE shard's slice of ONE micro-batch
          // (not the stream): per-invocation memory is bounded by
          // (batch rows) / (shards hit), and doc rows here are 3 scalars
          // — no text payload. A deployment whose hottest shard can
          // exceed executor memory within a single micro-batch must
          // either bound the trigger (maxFilesPerTrigger /
          // maxOffsetsPerTrigger) or drop the in-batch doc_id sort and
          // accept pure arrival order (delete the sortBy — the
          // cross-batch contract is arrival order already).
          val out = ds.toSeq.sortBy(_.doc_id).map { d =>
            val p = Packed(d.doc_id, shard, d.n_tokens,
              cum / capacity, cum % capacity)
            cum += d.n_tokens
            p
          }
          state.update(cum)
          out.iterator
      }
  }

  /** Bounded-memory packer — the production default. Identical
    * cross-batch contract to [[packStream]] (arrival order IS the pack
    * order) but O(1) per-group memory: documents pack in pure arrival
    * order through a one-pass iterator — no per-batch doc_id sort, no
    * materialized micro-batch slice — so a hot shard can never exceed
    * executor memory no matter how large the trigger. The shard's
    * cumulative total is written to GroupState when the input iterator
    * exhausts; that is safe because Structured Streaming commits a
    * group's state only AFTER fully consuming the group's output
    * iterator (FlatMapGroupsWithStateExec wraps it in a
    * CompletionIterator — StreamOpsSpec pins this contract with a
    * cross-batch scenario). Use [[packStream]] only when in-batch
    * doc_id determinism is worth a batch-slice sort. */
  def packStreamBounded(docs: Dataset[Doc], capacity: Int = 512): Dataset[Packed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, Packed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: String, ds: Iterator[Doc], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          new Iterator[Packed] {
            def hasNext: Boolean = {
              val h = ds.hasNext
              if (!h) state.update(cum) // idempotent; runs before commit
              h
            }
            def next(): Packed = {
              val d = ds.next()
              val p = Packed(d.doc_id, shard, d.n_tokens,
                cum / capacity, cum % capacity)
              cum += d.n_tokens
              p
            }
          }
      }
  }

  /** File-source stream over an events parquet directory — the
    * readStream entry (`spark.readStream.schema(...).parquet(dir)`),
    * normalized to the same shape `Tables.events` produces. */
  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Drive a streaming frame to completion over its (bounded) source with
    * `Trigger.AvailableNow` into a memory sink and return the sink table.
    * This is the verify/bench face of the streaming surface: the SAME
    * transform graph a production job would `writeStream` to a durable
    * sink runs here against the parquet fixture directory, so the final
    * sink contents are oracle-comparable to the batch SQL twin. The
    * memory sink holds the emitted rows: bounded by RESULT cardinality,
    * which for aggregate/update queries is small, but for append-mode
    * row-per-input transforms (stream_enrich) is the INPUT size — so
    * this driver-memory sink is for the bounded verify/bench fixtures
    * only, never a large-scale replay (a 100 TB deployment swaps the
    * sink for parquet/Kafka and the trigger for a processing-time one,
    * nothing else changes). */
  def runAvailableNow(
      df: DataFrame,
      mode: OutputMode): DataFrame = {
    val spark = df.sparkSession
    val name = s"graft_stream_sink_${sinkSeq.incrementAndGet()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    spark.table(name)
  }

  def readEventStream(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // FileStreamSource wants a directory; select the events file by glob
    graft.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }
}
