package graft.kmeans

import graft.SparkSpec
import scala.util.Random

/** O3/O4 — seeded uniform init (KMeans.java:88-95) and the closest-pair
  * re-spacing heuristic (KMeans.java:98-118). */
class InitSpec extends SparkSpec {

  test("randomInit is deterministic for a fixed seed and respects [minC, maxC]") {
    val cfg = KMeansConfig(k = 6, minC = -15, maxC = 15, seed = 7L)
    val a = KMeansFit.randomInit(cfg)
    val b = KMeansFit.randomInit(cfg)
    assert(a == b)
    assert(a.map(_.cid) == (0 until 6))
    assert(a.forall(c => c.x >= -15 && c.x <= 15 && c.y >= -15 && c.y <= 15))
    val c = KMeansFit.randomInit(cfg.copy(seed = 8L))
    assert(a != c)
  }

  test("respace re-randomizes one member of the globally closest pair") {
    val tight = Seq(Cent(0, 0.0, 0.0), Cent(1, 0.001, 0.0), Cent(2, 50.0, 50.0))
    val cfg = KMeansConfig(k = 3, minC = -15, maxC = 15, recompNearest = 1, seed = 1L)
    val out = KMeansFit.respace(tight, cfg, new Random(1L))
    // cid 2 (far away) untouched; exactly one of the close pair moved
    assert(out.find(_.cid == 2).get == Cent(2, 50.0, 50.0))
    val movedCount = out.zip(tight).count { case (n, o) => n != o }
    assert(movedCount == 1)
    // ids are preserved by re-spacing
    assert(out.map(_.cid) == tight.map(_.cid))
  }

  test("respace with zero passes is the identity") {
    val cents = Seq(Cent(0, 1.0, 2.0), Cent(1, 3.0, 4.0))
    val cfg = KMeansConfig(k = 2, recompNearest = 0)
    assert(KMeansFit.randomInit(cfg.copy(seed = 3L)).size == 2)
    assert(KMeansFit.respace(cents, cfg, new Random(3L)) == cents)
  }

  test("kmeansPlusPlus picks k distinct real points, deterministically") {
    val pts = graft.Tables.points(spark, "/root/testdata/sf0.001")
    val a = KMeansOps.kmeansPlusPlus(pts, k = 5, seed = 11).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val b = KMeansOps.kmeansPlusPlus(pts, k = 5, seed = 11).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq)                      // pure function of data
    assert(a.map(_._2).distinct.length == 5)        // k distinct source pids
    // every chosen center is an actual point (pid/x/y agree with the table)
    val byPid = pts.collect().map(r =>
      r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    a.foreach { case (_, pid, x, y) => assert(byPid(pid) == ((x, y))) }
    // a different seed picks a different first center
    val c = KMeansOps.kmeansPlusPlus(pts, k = 5, seed = 12).collect()
      .map(_.getLong(1)).toSet
    assert(c != a.map(_._2).toSet)
  }

  test("silhouette: perfect separation scores 1, centroid-points score 1") {
    import spark.implicits._
    // two tight clusters around far-apart centroids
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0),
      (4L, 100.0, 100.0), (5L, 101.0, 100.0)
    ).toDF("pid", "x", "y")
    val cents = Seq(Cent(0, 0.0, 0.0), Cent(1, 100.0, 100.0))
    val r = KMeansOps.silhouette(pts, cents).collect()
      .map(x => x.getInt(0) -> (x.getLong(1), x.getAs[Double]("mean_sil")))
      .toMap
    assert(r(0)._1 == 3L && r(1)._1 == 2L)
    // all points are >= 99x closer to their own centroid: s ~ 1
    assert(r(0)._2 > 0.99 && r(1)._2 > 0.99)
    // a point equidistant to both centroids scores exactly 0
    val mid = Seq((9L, 50.0, 50.0)).toDF("pid", "x", "y")
    val m = KMeansOps.silhouette(pts.union(mid), cents).collect()
      .map(x => x.getInt(0) -> x.getAs[Double]("mean_sil")).toMap
    // cluster 0 absorbed the tie (first-wins) and its mean dropped
    assert(m(0) < r(0)._2)
  }
}
