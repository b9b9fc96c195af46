package graft.ops

import graft.SparkSpec

class ProfileOpsSpec extends SparkSpec {
  import spark.implicits._

  test("profile: per-column rows / nulls / distinct / lexicographic extremes") {
    val df = Seq(
      (1L, Option("apple"), 10),
      (2L, Option("banana"), 10),
      (3L, None, 20),
      (4L, Option("apple"), 30)
    ).toDF("id", "word", "n")
    val p = ProfileOps.profile(df, Seq("id", "word", "n")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5)))).toMap
    assert(p("id") == ((4L, 0L, 4L, Some("1"), Some("4"))))
    // null excluded from distinct and extremes; 'apple' counted once
    assert(p("word") == ((4L, 1L, 2L, Some("apple"), Some("banana"))))
    // lexicographic by design: "10" < "20" < "30" as strings here
    assert(p("n") == ((4L, 0L, 3L, Some("10"), Some("30"))))
  }

  test("profile stays one scan: no join, single pass over the input") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "word")
    val plan = ProfileOps.profile(df, Seq("id", "word"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("datacard: planted totals, dup rate, shares and exact percentiles") {
    import spark.implicits._
    // 4 docs: one exact dup pair, langs 3:1, tokens 2/2/3/5
    val docs = Seq(
      (0L, "a b", "en", "s0", 3L),
      (1L, "a b", "en", "s0", 3L),
      (2L, "x y z", "en", "s1", 5L),
      (3L, "p q r s t", "de", "s1", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val card = ProfileOps.datacard(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("n_docs") == 4.0)
    assert(card("n_tokens") == 12.0)
    assert(card("n_chars") == 20.0)
    assert(card("exact_dup_frac") == 0.25) // doc 1 duplicates doc 0
    assert(card("lang_share:en") == 0.75 && card("lang_share:de") == 0.25)
    assert(card("source_share:s0") == 0.5 && card("source_share:s1") == 0.5)
    // exact interpolated percentiles over counts (2, 2, 3, 5) with the
    // (n−1)·p rank both engines use: (4−1)·0.9 = 2.7 → idx 2, frac 0.7
    // → p90 = 3 + 0.7·(5−3) = 4.4 (single pinned value — r14 advice:
    // an OR'd 4.8 alternative could mask a wrong interpolation)
    assert(card("tokens_p50") == 2.5)
    assert(math.abs(card("tokens_p90") - (3.0 + (0.9 * 3 - 2) * 2.0)) < 1e-12,
      s"p90 = ${card("tokens_p90")}")
    assert(card("tokens_mean") == 3.0 && card("chars_mean") == 5.0)
  }
}
