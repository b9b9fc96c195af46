package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def big = Seq.tabulate(1000)(i =>
    (i.toLong, s"row$i")).toDF("k", "payload")
  private def small = Seq(3L, 500L, 999L, 2000L).toDF("sk")

  test("bloom semi join equals the plain semi join") {
    val got = BloomJoin.bloomSemiJoin(big, small, "k", "sk",
      expectedItems = 10L).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(3L, 500L, 999L))
  }

  test("result stays exact even at absurd fpp (false positives rejoined away)") {
    // fpp 0.5 → a tiny, collision-heavy filter passes many non-matches;
    // the exact semi join after it must still strip every false positive
    val got = BloomJoin.bloomSemiJoin(big, small, "k", "sk",
      expectedItems = 4L, fpp = 0.5).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(3L, 500L, 999L))
  }

  test("no false negatives: every true match survives the prefilter") {
    // all 1000 keys present on both sides → bloom must pass all of them
    val all = Seq.tabulate(1000)(i => i.toLong).toDF("sk")
    val got = BloomJoin.bloomSemiJoin(big, all, "k", "sk",
      expectedItems = 1000L, fpp = 0.01)
    assert(got.count() == 1000L)
  }
}
