package graft.kmeans

import graft.SparkSpec

/** O11/O12 — convergence join + strict >epsilon theta filter
  * (KMeans.java:175-181), and the driver-loop early exit built on it. */
class ConvergenceSpec extends SparkSpec {
  import spark.implicits._

  private def df(c: Seq[Cent]) = graft.Tables.centroidsDF(spark, c)

  test("displacement exactly equal to epsilon does NOT count as moved (strict >)") {
    val oldC = Seq(Cent(0, 0.0, 0.0))
    val newC = Seq(Cent(0, 3.0, 4.0)) // displacement exactly 5.0
    val pairs = KMeansOps.convergePairs(df(newC), df(oldC))
    assert(KMeansOps.convergeFilter(pairs, 5.0).count() == 0)
    assert(KMeansOps.convergeFilter(pairs, 4.999999).count() == 1)
  }

  test("fit with convergence stops once no centroid moves more than tol") {
    // two tight clusters; after 2 steps the centroids are fixed points
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.0, 1.0), (3L, 10.0, 0.0), (4L, 10.0, 1.0)
    ).toDF("pid", "x", "y")
    val init = Seq(Cent(0, -1.0, 0.0), Cent(1, 11.0, 0.0))
    val res = KMeansFit.fit(pts, init, KMeansConfig(k = 2, maxIter = 50, tol = 0.0))
    assert(res.iterations < 50)
    assert(res.centroids.toSet == Set(Cent(0, 0.0, 0.5), Cent(1, 10.0, 0.5)))
  }

  test("fit without convergence runs exactly maxIter supersteps") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 1.0, 0.0)).toDF("pid", "x", "y")
    val init = Seq(Cent(0, 0.0, 0.0), Cent(1, 1.0, 0.0))
    val res = KMeansFit.fit(pts, init, KMeansConfig(k = 2, maxIter = 7, convergence = false))
    assert(res.iterations == 7)
  }

  test("a vanished (empty-cluster) centroid does not block convergence") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.5, 0.0)).toDF("pid", "x", "y")
    val init = Seq(Cent(0, 0.0, 0.0), Cent(1, 1e6, 1e6)) // cid 1 captures nothing
    val res = KMeansFit.fit(pts, init, KMeansConfig(k = 2, maxIter = 50, tol = 1e-12))
    assert(res.centroids.map(_.cid) == Seq(0))
    assert(res.iterations < 50)
  }
}
