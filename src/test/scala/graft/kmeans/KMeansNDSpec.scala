package graft.kmeans

import graft.SparkSpec
import graft.kmeans.KMeansND.CentND

class KMeansNDSpec extends SparkSpec {
  import spark.implicits._

  private def pts = Seq(
    (1L, Seq(0.0, 0.0, 0.0)),
    (2L, Seq(0.0, 1.0, 0.0)),
    (3L, Seq(10.0, 0.0, 0.0)),
    (4L, Seq(10.0, 1.0, 0.0))
  ).toDF("id", "vec")

  private def centsDF(c: Seq[CentND]) = graft.Tables.centsNDDF(spark, c)

  test("declarative assign and mapPartitions kernel agree exactly") {
    val cents = Seq(CentND(0, Seq(0.0, 0.5, 0.0)), CentND(1, Seq(9.0, 0.0, 0.0)))
    val a = KMeansND.assign(pts, centsDF(cents))
      .as[(Long, Int, Double)].collect().toSet
    val b = KMeansND.assignKernel(pts, cents)
      .as[(Long, Int, Double)].collect().toSet
    assert(a == b)
    assert(a.map(t => t._1 -> t._2).toMap == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1))
  }

  test("kernel tie-break keeps the lowest cid") {
    val cents = Seq(CentND(0, Seq(0.0, 0.0, 0.0)), CentND(1, Seq(2.0, 0.0, 0.0)))
    val got = KMeansND.assignKernel(
      Seq((9L, Seq(1.0, 0.0, 0.0))).toDF("id", "vec"), cents)
      .as[(Long, Int, Double)].collect()
    assert(got(0)._2 == 0 && got(0)._3 == 1.0)
  }

  test("recompute produces element-wise means and drops empty clusters") {
    val cents = Seq(CentND(0, Seq(0.0, 0.5, 0.0)), CentND(1, Seq(9.0, 0.0, 0.0)),
      CentND(2, Seq(1e6, 1e6, 1e6)))
    val assigned = KMeansND.assignKernel(pts, cents)
    val m = KMeansND.recompute(pts, assigned).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(m.keySet == Set(0, 1))
    assert(m(0) == Seq(0.0, 0.5, 0.0))
    assert(m(1) == Seq(10.0, 0.5, 0.0))
  }

  test("fit converges to the two cluster means") {
    val (cents, iters) = KMeansND.fit(
      pts, Seq(CentND(0, Seq(-1.0, 0.0, 0.0)), CentND(1, Seq(11.0, 0.0, 0.0))),
      maxIter = 20, tol = 0.0)
    assert(iters < 20)
    assert(cents.map(_.vec) == Seq(Seq(0.0, 0.5, 0.0), Seq(10.0, 0.5, 0.0)))
  }

  test("2-D engine is the special case: ND fit matches KMeansFit on the same data") {
    val pts2 = Seq((1L, 1.0, 2.0), (2L, 3.0, 4.0), (3L, 100.0, 100.0), (4L, 102.0, 98.0))
    val nd = pts2.map { case (i, x, y) => (i, Seq(x, y)) }.toDF("id", "vec")
    val flat = pts2.toDF("pid", "x", "y")
    val init2 = Seq(Cent(0, 0.0, 0.0), Cent(1, 100.0, 100.0))
    val initN = init2.map(c => CentND(c.cid, Seq(c.x, c.y)))
    val r2 = KMeansFit.fit(flat, init2, KMeansConfig(k = 2, maxIter = 10, tol = 0.0))
    val (rn, _) = KMeansND.fit(nd, initN, maxIter = 10, tol = 0.0)
    assert(r2.centroids.map(c => Seq(c.x, c.y)) == rn.map(_.vec))
  }

  test("fit's one-shuffle driver-side recompute matches the declarative " +
      "recompute and still drops empty clusters (r16 internals change)") {
    val cents0 = Seq(CentND(0, Seq(0.0, 0.5, 0.0)),
      CentND(1, Seq(9.0, 0.0, 0.0)), CentND(2, Seq(1e6, 1e6, 1e6)))
    val expected = KMeansND.recompute(pts, KMeansND.assignKernel(pts, cents0))
      .collect().map(r => CentND(r.getInt(0), r.getSeq[Double](1)))
      .toSeq.sortBy(_.cid)
    for (p <- Seq(1, 8)) {
      val (got, _) = KMeansND.fit(pts.repartition(p), cents0, maxIter = 1,
        tol = 0.0, convergence = false)
      assert(got == expected, s"partitions=$p")
      assert(got.map(_.cid) == Seq(0, 1), s"empty cluster kept at p=$p")
    }
  }

  test("fit centroids are partitioning-invariant on the real 64-dim fixture " +
      "(r16 size-aware rebalance)") {
    val vecs = graft.ops.IvfIndex.vectors(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val init = KMeansND.initFromLowestIds(vecs, 4)
    val (a, _) = KMeansND.fit(vecs.repartition(1), init, maxIter = 3,
      tol = 0.0, convergence = false)
    val (b, _) = KMeansND.fit(vecs.repartition(13), init, maxIter = 3,
      tol = 0.0, convergence = false)
    assert(a == b)
  }

  test("fit with an exact numRows equals the numRows=-1 fit (size-aware " +
      "target branch, r16 advice) and an empty init returns cleanly at " +
      "maxIter=0") {
    val vecs = graft.ops.IvfIndex.vectors(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val init = KMeansND.initFromLowestIds(vecs, 4)
    val n = vecs.count()
    val (a, _) = KMeansND.fit(vecs, init, maxIter = 3,
      tol = 0.0, convergence = false)
    // exercises the exact-count target computation (rowBytes math,
    // clamping) directly rather than through PqIndex/IvfIndex
    val (b, _) = KMeansND.fit(vecs, init, maxIter = 3,
      tol = 0.0, convergence = false, numRows = n)
    assert(a == b)
    // empty init + numRows set must not throw from the target
    // computation (init.head guard); maxIter=0 returns the init as-is
    val (e, it) = KMeansND.fit(vecs, Seq.empty, maxIter = 0,
      tol = 0.0, convergence = false, numRows = n)
    assert(e.isEmpty && it == 0)
  }

  test("fit on the real 64-dim embeddings reduces the objective") {
    val vecs = graft.ops.IvfIndex.vectors(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val init = KMeansND.initFromLowestIds(vecs, 4)
    val before = KMeansND.sse(vecs, init)
    val (cents, _) = KMeansND.fit(vecs, init, maxIter = 5, tol = 1e-9)
    val after = KMeansND.sse(vecs, cents)
    assert(after < before)
    assert(cents.nonEmpty && cents.head.vec.length == 64)
  }
}
