package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compressed-vector ANN: SQ8 grid round-trip accuracy, sign-hash
  * Hamming ordering, Matryoshka shortlist recall vs brute force. */
class QuantOpsSpec extends SparkSpec {

  private def embs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("declared dim must match the data (no silent zero-grid, no AIOOBE)") {
    // r10 ADVICE: a longer embedding used to throw AIOOBE building the
    // grid arrays; a shorter one silently left lo/hi at 0.0
    val tooSmall = intercept[IllegalArgumentException](
      QuantOps.sq8Codes(embs, dim = 32))
    assert(tooSmall.getMessage.contains("expected 32"))
    val tooBig = intercept[IllegalArgumentException](
      QuantOps.sq8Codes(embs, dim = 128))
    assert(tooBig.getMessage.contains("expected 128"))
  }

  test("constant dimension (hi == lo) encodes to 0 and decodes to lo") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1.5f, 2.0f)), (1L, Array(1.5f, 4.0f)),
      (2L, Array(1.5f, 3.0f))
    ).toDF("vec_id", "embedding")
    val codes = QuantOps.sq8Codes(df, dim = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // dim 0 is constant: scale = 0 -> every code 0 (decode = lo = 1.5)
    assert(codes.values.forall(_.head == 0))
    // dim 1 spans [2,4]: endpoints hit 0 and 255
    assert(codes(0L)(1) == 0 && codes(1L)(1) == 255)
    // and the asymmetric top-k still runs (query decodes against lo)
    val top = QuantOps.sq8TopK(df, queryId = 0L, k = 2, dim = 2).collect()
    assert(top.length == 2)
  }

  test("persisted sq8 index probe is bit-identical to the in-body search") {
    val path = "/tmp/graft-test-sq8-index"
    QuantOps.writeSq8Index(embs, path)
    val q = embs.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .collect()(0).getSeq[Double](0)
    val probed = QuantOps.searchSq8Index(spark, path, q, 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val inBody = QuantOps.sq8TopK(embs, queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(probed.toSeq == inBody.toSeq)
    // the probe plan reads codes only: no raw `embedding` column scan
    val plan = QuantOps.searchSq8Index(spark, path, q, 0L, k = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("embedding"))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("sq8 codes are bytes and decode within half a grid cell") {
    val dim = 64
    val codes = QuantOps.sq8Codes(embs, dim).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == dim)
      assert(cs.forall(c => c >= 0 && c <= 255))
    }
    // decoded top-k ~ exact top-k: with 256 levels per dim the grid
    // error is tiny, so the exact nearest neighbor must stay in the
    // SQ8 top 3
    val exact = EmbeddingOps.cosineTopK(embs, 0L, 1).collect()(0).getLong(0)
    val sq = QuantOps.sq8TopK(embs, 0L, 3).collect().map(_.getLong(0))
    assert(sq.contains(exact), s"exact NN $exact not in SQ8 top3 ${sq.toSeq}")
  }

  test("hamming distance is 0 for an identical signature and ranks flips") {
    import spark.implicits._
    val base = Array.fill(64)(1f)
    val flip8 = base.clone(); (0 until 8).foreach(i => flip8(i) = -1f)
    val flip32 = base.clone(); (0 until 32).foreach(i => flip32(i) = -1f)
    val df = Seq((0L, base, 0), (1L, base.clone(), 0),
      (2L, flip8, 0), (3L, flip32, 0)).toDF("vec_id", "embedding", "label")
    val got = QuantOps.hammingTopK(df, 0L, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((1L, 0), (2L, 8), (3L, 32)))
  }

  test("matryoshka full-dim re-rank recovers the exact top-k") {
    val exact = EmbeddingOps.cosineTopK(embs, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // shortlist = whole corpus -> the re-rank must reproduce the
    // brute-force top-10 EXACTLY (ids, order, bit-equal cosines)
    val full = QuantOps.matryoshkaTopK(embs, 0L, 10, shortlist = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact)
    // recall grows monotonically with shortlist depth (the quality
    // knob); on this RANDOM fixture the 16-dim prefix carries no
    // trained signal, so small shortlists are allowed to miss — the
    // contract is monotonicity, not a fixed recall
    val recalls = Seq(20, 60, 1000).map { s =>
      val got = QuantOps.matryoshkaTopK(embs, 0L, 10, shortlist = s)
        .collect().map(_.getLong(0)).toSet
      exact.map(_._1).toSet.intersect(got).size
    }
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    assert(recalls.last == 10)
    // every matryoshka cosine is an EXACT full-dim cosine (bit-equal to
    // the brute-force score for the same vec_id)
    val exactMap = EmbeddingOps.cosineTopK(embs, 0L, 200).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    QuantOps.matryoshkaTopK(embs, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .foreach { case (id, c) => assert(exactMap(id) == c) }
  }

  test("sq8/hamming plans are scan-projections with TakeOrdered, no global sort") {
    val plan = QuantOps.hammingTopK(embs, 0L, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
    assert(!plan.contains("Sort ["), "unexpected global sort:\n" + plan.take(400))
  }
}
