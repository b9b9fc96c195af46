package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
  }

  // a 4-token boilerplate planted inside two otherwise-different docs
  private val boiler = "this code is licensed"

  test("windows slide with 1-based positions; short docs produce none") {
    val d = docs(0L -> "a b c d e", 1L -> "x y")
    val win = SpanDedup.windows(d, w = 4).collect()
    assert(win.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((0L, 1L), (0L, 2L)))
    assert(win.forall(_.getString(2).length == 32))
  }

  test("dupSpans finds the planted cross-doc boilerplate and nothing else") {
    val d = docs(
      0L -> s"intro words here $boiler trailing part one",
      1L -> s"$boiler completely different tail of text",
      2L -> "no shared content in this document at all")
    val spans = SpanDedup.dupSpans(d, w = 4).collect()
    assert(spans.length == 1)
    val s = spans.head
    assert(s.getLong(1) == 2L && s.getLong(2) == 2L) // n_occ, n_docs
    assert(s.getLong(3) == 0L)                       // first_doc
    // witness position: doc 0 has the span starting at token 4
    assert(s.getLong(4) == 1L)                       // min_pos (doc 1 starts with it)
  }

  test("dupSpans counts within-doc repeats toward n_occ but not n_docs") {
    val d = docs(0L -> s"$boiler filler filler $boiler", 1L -> "unrelated")
    val spans = SpanDedup.dupSpans(d, w = 4).collect()
    assert(spans.length == 1)
    assert(spans.head.getLong(1) == 2L && spans.head.getLong(2) == 1L)
  }

  test("spanStats reports per-doc dup fraction, 0 for short/clean docs") {
    val d = docs(
      0L -> s"intro words here $boiler trailing part one",   // 8 tokens
      1L -> s"$boiler completely different tail of text",    // 9 tokens? -> count
      2L -> "tiny doc")                                      // < w tokens
    val out = SpanDedup.spanStats(d, w = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 0: 10 tokens -> 7 windows, exactly 1 (the boilerplate) duplicated
    assert(out(0L) == ((7L, 1L, 1.0 / 7L)))
    val (w1, d1, f1) = out(1L)
    assert(d1 == 1L && f1 == 1.0 / w1)
    assert(out(2L) == ((0L, 0L, 0.0)))
  }

  test("span shuffle carries the fixed-width key, not the window text") {
    // plan-shape guard: the aggregate's child projects (doc_id, pos,
    // key) only — no `text`/`tk` column survives past the scan stage
    val d = docs((0L to 30L).map(i => i -> s"token soup number $i with some shared tail words"): _*)
    val plan = SpanDedup.dupSpans(d, w = 4).queryExecution.executedPlan.toString
    val aggIdx = plan.indexOf("HashAggregate")
    assert(aggIdx >= 0)
    assert(!plan.substring(aggIdx).contains("text#"),
      "window text must not flow into the aggregate")
  }

  test("registered query/oracle pairs exist") {
    for (n <- Seq("dedup_spans", "dedup_span_stats")) {
      assert(graft.SparkEntry.queries.contains(n), n)
      assert(graft.SparkEntry.oracleSql.contains(n), n)
    }
  }
}
