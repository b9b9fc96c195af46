package graft.kmeans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-means|| (Bahmani 2012) — determinism, boundedness, and the
  * weighted-recluster contract. The cross-engine hash match is the
  * driver's oracle gate (`init_kmeansbb`, `init_kmeansbb_final`). */
class KMeansParallelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("md5Hash60Jvm is bit-identical to the Column form") {
    import spark.implicits._
    val ids = Seq("0", "17", "123456789012345", "f|3")
    val viaCol = ids.toDF("s")
      .select(graft.ops.Dedup.md5Hash60(71, col("s")))
      .collect().map(_.getLong(0))
    val viaJvm = ids.map(KMeansParallel.md5Hash60Jvm(71, _))
    assert(viaCol.toSeq == viaJvm)
  }

  test("candidates: deterministic, enumeration-ordered, weights sum to n") {
    val pts = graft.Tables.points(spark, sf)
    val a = KMeansParallel.candidates(pts).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))).sortBy(_._1)
    val b = KMeansParallel.candidates(pts).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "pure function of the data")
    // cidx is a contiguous enumeration in (rnd, pid, x, y) order
    assert(a.map(_._1).toSeq == a.indices.toSeq)
    assert(a.map(t => (t._2, t._3, t._4, t._5)).toSeq ==
      a.map(t => (t._2, t._3, t._4, t._5)).sortBy(t => (t._1, t._2, t._3, t._4)).toSeq)
    // exactly one round-0 (uniform) pick; every round stays under cap
    assert(a.count(_._2 == 0) == 1)
    val perRound = a.groupBy(_._2).view.mapValues(_.length)
    (1 to KMeansParallel.Rounds).foreach { r =>
      assert(perRound.getOrElse(r, 0) <= KMeansParallel.Cap)
    }
    // weights partition the point set
    assert(a.map(_._6).sum == pts.count())
    // every candidate is a real point
    val byKey = pts.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    a.foreach { t => assert(byKey.contains((t._3, t._4, t._5))) }
  }

  test("candidates are partitioning-invariant") {
    val pts = graft.Tables.points(spark, sf)
    val a = KMeansParallel.sweep(pts)
    val b = KMeansParallel.sweep(pts.repartition(7))
    assert(a == b)
  }

  test("hard cap binds deterministically under adversarial uniformity") {
    import spark.implicits._
    // 60 near-equidistant points: after the first pick, l*d2 ~ l*cost/n
    // with l(16) << n(60) would normally select ~l — push acceptance up
    // by making every d2 equal so the Bernoulli clamp binds for many
    // draws; with cap=4 the per-round acceptance must be EXACTLY the 4
    // lowest-pid acceptors, run-to-run identical.
    val pts = (0 until 60).map(i => (i.toLong, math.cos(i * 0.1) * 1e3,
      math.sin(i * 0.1) * 1e3)).toDF("pid", "x", "y")
    val a = KMeansParallel.sweep(pts, l = 64, rounds = 2, seed = 5, cap = 4)
    val b = KMeansParallel.sweep(pts, l = 64, rounds = 2, seed = 5, cap = 4)
    assert(a == b)
    val perRound = a.groupBy(_.rnd).view.mapValues(_.length).toMap
    assert(perRound(1) == 4 && perRound(2) == 4, s"cap must bind: $perRound")
    // within each round the kept acceptors are pid-ordered (truncation
    // is ORDER BY pid,x,y LIMIT cap in both engines)
    Seq(1, 2).foreach { r =>
      val pids = a.filter(_.rnd == r).map(_.pid)
      assert(pids == pids.sorted)
    }
  }

  test("finalCenters: k distinct positively-weighted candidates, deterministic") {
    val pts = graft.Tables.points(spark, sf)
    val cand = KMeansParallel.candidates(pts).collect()
      .map(r => r.getInt(0) -> r.getLong(5)).toMap
    val a = KMeansParallel.finalCenters(pts).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val b = KMeansParallel.finalCenters(pts).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._1).toSeq == (0 until KMeansParallel.K))
    assert(a.map(_._2).distinct.length == KMeansParallel.K, "k distinct seeds")
    a.foreach { case (_, cidx, _, _) =>
      assert(cand(cidx) > 0L, s"cidx=$cidx must carry positive weight")
    }
  }

  test("registered query/oracle pairs exist") {
    Seq("init_kmeansbb", "init_kmeansbb_final").foreach { q =>
      assert(graft.SparkEntry.queries.contains(q))
      assert(graft.SparkEntry.oracleSql.contains(q))
    }
  }

  test("degenerate corpus: engine raises, SQL twin goes loudly empty") {
    import spark.implicits._
    // a 1-point corpus: every candidate after the first pick has d²=0
    // (duplicate coordinates) and/or weight 0 — fewer than k pickable
    val one = Seq((0L, 1.0, 2.0)).toDF("pid", "x", "y")
    val e = intercept[IllegalArgumentException] {
      KMeansParallel.finalCenters(one)
    }
    assert(e.getMessage.contains("k-means||"))
    // the SQL twin mirrors the guard (r13 advice): -inf keys are never
    // picked and a <k pick count empties the whole result, so the
    // oracle compare fails on rows_match instead of silently diverging
    val sql = KMeansParallel.finalCentersSql()
    assert(sql.contains("WHERE key > CAST('-infinity' AS DOUBLE)"))
    assert(sql.contains(s"(SELECT COUNT(*) FROM allg) = ${KMeansParallel.K}"))
  }
}
