package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance resampling: target-like documents must outscore
  * raw-pool-like ones, scores must be partition-invariant, and
  * selection must be a deterministic top-k. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target domain (src0) speaks one vocabulary, the raw pool another;
  // doc 10 is a raw doc written in the target vocabulary.
  private def docs = Seq(
    (0L, "alpha beta gamma alpha beta", "src0"),
    (1L, "beta gamma alpha gamma", "src0"),
    (10L, "alpha beta gamma beta", "srcR"),
    (11L, "delta epsilon zeta delta", "srcR"),
    (12L, "epsilon zeta eta zeta", "srcR")
  ).toDF("doc_id", "text", "source")

  test("target-vocabulary raw docs outscore raw-vocabulary ones") {
    val w = Dsir.importanceWeights(docs, "src0").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet == Set(10L, 11L, 12L)) // target docs never scored
    assert(w(10L) > w(11L) && w(10L) > w(12L))
    assert(w(10L) > 0.0)  // target-like: p >> q
    assert(w(11L) < 0.0)  // raw-only vocabulary: q >> p
  }

  test("weights are partition-invariant") {
    val a = Dsir.importanceWeights(docs, "src0").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Dsir.importanceWeights(docs.repartition(7), "src0").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("select is the deterministic top-k with doc_id tie-break") {
    val top2 = Dsir.select(docs, "src0", 2).collect().map(_.getLong(0))
    assert(top2.head == 10L)
    assert(top2.length == 2)
    // ties (if any) and ordering are reproducible run-to-run
    val again = Dsir.select(docs, "src0", 2).collect().map(_.getLong(0))
    assert(top2.sameElements(again))
  }

  test("ESS is exactly n on equal weights and collapses under one dominant doc") {
    // identical raw docs ⇒ identical logw ⇒ every grid weight is the
    // same integer ⇒ ESS = (n·g)²/(n·g²) = n EXACTLY
    val uniform = Seq(
      (0L, "alpha beta gamma", "src0"),
      (10L, "delta epsilon", "srcR"),
      (11L, "delta epsilon", "srcR"),
      (12L, "delta epsilon", "srcR")
    ).toDF("doc_id", "text", "source")
    val u = Dsir.essReport(uniform, "src0").collect()(0)
    assert(u.getLong(0) == 3L)
    assert(u.getDouble(1) == 3.0)
    assert(u.getDouble(2) == 1.0)
    // one raw doc written in the target vocabulary dominates the pool:
    // ESS falls toward 1 and it owns (nearly) all the normalized mass
    val spiked = Seq(
      (0L, "alpha beta gamma alpha beta gamma alpha beta", "src0"),
      (10L, "alpha beta gamma alpha beta gamma alpha beta", "srcR"),
      (11L, "delta epsilon zeta delta epsilon zeta delta zeta", "srcR"),
      (12L, "epsilon zeta eta epsilon zeta eta epsilon eta", "srcR")
    ).toDF("doc_id", "text", "source")
    val s = Dsir.essReport(spiked, "src0").collect()(0)
    assert(s.getLong(0) == 3L)
    assert(s.getDouble(1) >= 1.0 && s.getDouble(1) < 1.1,
      s"ess = ${s.getDouble(1)}")
    assert(s.getDouble(3) > 0.9, s"top_share = ${s.getDouble(3)}")
    // invariants: 1 ≤ ESS ≤ n, shares in (0, 1]
    Seq(u, s).foreach { r =>
      assert(r.getDouble(1) >= 1.0 - 1e-12)
      assert(r.getDouble(1) <= r.getLong(0).toDouble + 1e-12)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }
}
