package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

class PretrainOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "text", "source")

  /** Distinct shuffle count with AQE off for planning —
    * AdaptiveSparkPlanExec is a leaf that hides its inner plan from
    * collect (same dodge as graft.tools.PlanAudit). */
  private def exchanges(mkDf: => DataFrame): Int = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try mkDf.queryExecution.executedPlan
      .collect { case e: Exchange => e.id }.distinct.size
    finally spark.conf.set(key, prev)
  }

  // ---------------- chunking ----------------

  test("chunkDocs: stride windows with overlap, short tail kept") {
    // 10 tokens, size 4, overlap 1 -> starts 0,3,6,9
    val d = docs((1L, (1 to 10).map(i => s"t$i").mkString(" "), "s"))
    val out = PretrainOps.chunkDocs(d, size = 4, overlap = 1)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_.getInt(2)).toSeq == Seq(4, 4, 4, 1))
    assert(out.head.getString(3) == "t1 t2 t3 t4")
    assert(out(1).getString(3) == "t4 t5 t6 t7")
    assert(out.last.getString(3) == "t10")
  }

  test("chunkDocs: doc shorter than one window is a single chunk") {
    val d = docs((1L, "a b c", "s"))
    val out = PretrainOps.chunkDocs(d, size = 64, overlap = 16).collect()
    assert(out.length == 1 && out.head.getInt(2) == 3)
    assert(out.head.getString(3) == "a b c")
  }

  test("chunkDocs: whitespace runs are normalized before chunking") {
    val d = docs((1L, "  a   b c  ", "s"))
    val out = PretrainOps.chunkDocs(d, size = 2, overlap = 0)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getString(3)).toSeq == Seq("a b", "c"))
  }

  test("chunkDocs: zero-shuffle projection plan") {
    val d = docs((1L, "a b c", "s"))
    assert(exchanges(PretrainOps.chunkDocs(d)) == 0)
  }

  // ---------------- packing ----------------

  test("packSequences: bins fill in doc order, straddlers carry offset") {
    // tokens: 3, 4, 2 with capacity 5 -> cum_before 0, 3, 7
    val d = docs(
      (1L, "a b c", "s"),
      (2L, "d e f g", "s"),
      (3L, "h i", "s"))
    val out = PretrainOps.packSequences(d, capacity = 5)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0L, 0L), (0L, 3L), (1L, 2L)))
  }

  test("packStats: bins, utilization, and straddle rate match hand algebra") {
    // tokens 3, 4, 2 at capacity 5: total 9 → 2 bins, util 9/10;
    // only doc 2 (offset 3 + 4 > 5) straddles a bin boundary
    val d = docs(
      (1L, "a b c", "s"),
      (2L, "d e f g", "s"),
      (3L, "h i", "s"))
    val r = PretrainOps.packStats(d, capacity = 5).collect()(0)
    assert(r.getString(0) == "s")
    assert(r.getLong(1) == 3L && r.getLong(2) == 9L && r.getLong(3) == 2L)
    assert(r.getDouble(4) == 0.9)
    assert(r.getLong(5) == 1L && r.getDouble(6) == 1.0 / 3.0)
  }

  test("packSequences: shards pack independently") {
    val d = docs((1L, "a b", "s1"), (2L, "c d", "s2"), (3L, "e f", "s1"))
    val out = PretrainOps.packSequences(d, capacity = 3)
      .orderBy("doc_id").collect()
    // s1: cum 0,2 ; s2: cum 0 -> doc 2 starts its own shard at bin 0
    assert(out.map(r => (r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0L, 0L), (0L, 0L), (0L, 2L)))
  }

  test("packSequences: exactly one shuffle (per-shard window, no global sort)") {
    val d = docs((1L, "a b", "s1"), (2L, "c d", "s2"))
    val df = PretrainOps.packSequences(d)
    assert(exchanges(df) == 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "packing must never funnel through one partition:\n" + plan)
  }

  // ---------------- PII scrub ----------------

  test("scrubPii: redacts emails, urls, phones and counts each") {
    val d = docs(
      (1L, "mail a.user+x@sub.ex.org now via https://ex.org/a?b=1 or 555-123-4567", "s"),
      (2L, "nothing sensitive here", "s"))
    val out = PretrainOps.scrubPii(d).orderBy("doc_id").collect()
    assert(out.head.getString(1) == "mail <EMAIL> now via <URL> or <PHONE>")
    assert((out.head.getInt(2), out.head.getInt(3), out.head.getInt(4)) == ((1, 1, 1)))
    assert(out(1).getString(1) == "nothing sensitive here")
    assert((out(1).getInt(2), out(1).getInt(3), out(1).getInt(4)) == ((0, 0, 0)))
  }

  test("scrubPii: idempotent — scrubbing clean output changes nothing") {
    val d = docs((1L, "u@ex.org and https://a.b and 111-222-3333", "s"))
    val once = PretrainOps.scrubPii(d).select(col("doc_id"), col("clean_text").as("text"))
      .withColumn("source", lit("s"))
    val twice = PretrainOps.scrubPii(once).collect()
    assert(twice.head.getString(1) == "<EMAIL> and <URL> and <PHONE>")
    assert(twice.head.getInt(2) == 0 && twice.head.getInt(3) == 0)
  }

  test("scrubPii: zero-shuffle projection plan") {
    val d = docs((1L, "a", "s"))
    assert(exchanges(PretrainOps.scrubPii(d)) == 0)
  }

  // ---------------- composition ----------------

  test("makeSequences: scrub feeds chunker, chunks fill shard bins in order") {
    // doc 1 (src a): 5 tokens + a planted URL token -> scrubbed to 6 toks
    // -> chunks of 3: [3, 3]; doc 2 (src a): 4 tokens -> chunks [3, 1]
    val d = docs(
      (1L, "a b c d e https://x.y/z", "sa"),
      (2L, "p q r s", "sa"),
      (3L, "m n", "sb"))
    val out = PretrainOps.makeSequences(d, size = 3, capacity = 4)
      .orderBy("doc_id", "chunk_id").collect()
    val byKey = out.map(r =>
      (r.getLong(0), r.getInt(2)) ->
        (r.getString(4), r.getLong(5), r.getLong(6))).toMap
    assert(byKey((1L, 0)) == (("a b c", 0L, 0L)))
    assert(byKey((1L, 1)) == (("d e <URL>", 0L, 3L)))
    // shard sa cum: 3,6,9,12 -> bins 0,0,1,2 at capacity 4
    assert(byKey((2L, 0))._2 == 1L && byKey((2L, 1))._2 == 2L)
    // shard sb packs from zero independently
    assert(byKey((3L, 0)) == (("m n", 0L, 0L)))
  }

  test("makeSequences: scan + exactly one shuffle for the whole pipeline") {
    val d = docs((1L, "a b c", "s"))
    assert(exchanges(PretrainOps.makeSequences(d)) == 1)
  }

  // ---------------- streaming ----------------

  test("scrub + chunk are stateless: identical code runs on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val docsStream = in.toDF().toDF("doc_id", "text", "source")
    val cleaned = docsStream.select(
      col("doc_id"), col("source"),
      PretrainOps.scrubText(col("text")).as("text"))
    val q = PretrainOps.chunkDocs(cleaned, size = 2, overlap = 0, keep = Seq("source"))
      .writeStream.format("memory").queryName("chunks_stream")
      .outputMode("append").start()
    in.addData((1L, "a b c mail u@ex.org", "s"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("chunks_stream").orderBy("chunk_id").collect()
    assert(rows.map(_.getString(4)).toSeq == Seq("a b", "c mail", "<EMAIL>"))
  }

  test("property: chunks reconstruct the corpus; pack offsets are consistent") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "zz")
    val docGen = Gen.listOfN(24, Gen.zip(
      Gen.choose(1, 17).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" "))),
      Gen.oneOf("sa", "sb")))
    (1 to 4).foreach { seed =>
      val rows = docGen(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case ((t, src), i) => (i.toLong, t, src) }
      val d = docs(rows: _*)
      val size = 1 + seed // exercise several chunk sizes
      val cap = 7
      val seqs = PretrainOps.makeSequences(d, size = size, capacity = cap)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
          r.getInt(3), r.getString(4), r.getLong(5), r.getLong(6)))
      // 1. reassembling chunks in order reproduces every doc's token stream
      val rebuilt = seqs.groupBy(_._1).map { case (id, cs) =>
        id -> cs.sortBy(_._3).map(_._5).mkString(" ")
      }
      rows.foreach { case (id, t, _) =>
        assert(rebuilt(id) == t, s"doc $id not reconstructed")
      }
      // 2. within a shard, each chunk starts where the previous ended
      seqs.groupBy(_._2).foreach { case (_, cs) =>
        val ordered = cs.sortBy(c => (c._1, c._3))
        ordered.zip(ordered.tail).foreach { case (a, b) =>
          val nextOff = (a._6 * cap + a._7 + a._4) // absolute position after a
          assert(b._6 * cap + b._7 == nextOff,
            s"gap between chunks $a -> $b")
        }
        assert(ordered.head._6 == 0L && ordered.head._7 == 0L)
      }
    }
  }

  test("scrubPlanted: every planted marker is removed on the real table") {
    val d = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val out = PretrainOps.scrubPlanted(d)
    assert(out.filter(col("n_emails") < 1 || col("n_urls") < 1 || col("n_phones") < 1)
      .count() == 0)
    assert(out.filter(col("clean_text").rlike("@|https?://|[0-9]{3}-[0-9]{3}-[0-9]{4}"))
      .count() == 0)
  }
}
