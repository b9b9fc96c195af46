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
}
