package graft.ops

import graft.SparkSpec
import graft.kmeans.KMeansND
import org.apache.spark.sql.functions._

/** Topic-cluster composition: dense hashed-tf assembly, Lloyd loop
  * wiring, and declarative-vs-kernel path agreement. */
class TopicClusterSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("dense vectors zero-fill exactly the non-hashed indices") {
    val dim = 32
    val dense = TopicCluster.denseFeatures(docs, dim = dim)
    val sparse = TextOps.hashedFeatures(docs, dim = dim)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2).toDouble).toMap)
      .toMap
    val rows = dense.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vec = r.getSeq[Double](1)
      assert(vec.length == dim)
      val want = sparse.getOrElse(r.getLong(0), Map.empty[Long, Double])
      vec.zipWithIndex.foreach { case (v, i) =>
        assert(v == want.getOrElse(i.toLong, 0.0),
          s"doc ${r.getLong(0)} dim $i")
      }
    }
  }

  test("every doc gets exactly one cluster in [0, k)") {
    val k = 4
    val out = TopicCluster.cluster(docs, dim = 32, k = k, iters = 2)
    val n = docs.count()
    assert(out.count() == n)
    assert(out.select("id").distinct().count() == n)
    val cids = out.select("cid").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cids.subsetOf((0 until k).toSet))
  }

  test("iters=1 equals a plain seed-assignment; sqdist is the true distance") {
    val vecs = TopicCluster.denseFeatures(docs, dim = 32)
    val seeds = KMeansND.initFromLowestIds(vecs, 4)
    val direct = KMeansND.assignKernel(vecs, seeds)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sorted
    val viaCluster = TopicCluster.cluster(docs, dim = 32, k = 4, iters = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sorted
    assert(direct.length == viaCluster.length)
    direct.zip(viaCluster).foreach { case ((ia, ca, da), (ib, cb, db)) =>
      assert(ia == ib && ca == cb)
      assert(math.abs(da - db) < 1e-12)
    }
  }

  test("3-iteration objective does not exceed the 1-iteration objective") {
    def obj(iters: Int): Double =
      TopicCluster.cluster(docs, dim = 32, k = 4, iters = iters)
        .agg(sum("sqdist")).collect()(0).getDouble(0)
    assert(obj(3) <= obj(1) + 1e-9)
  }

  test("ARI: 1 on identical partitions, 0 vs the single-cluster partition, " +
      "hand value on a known table") {
    import spark.implicits._
    def part(ps: (Long, Int)*) = ps.toSeq.toDF("doc_id", "cid")
    def labs(ps: (Long, String)*) = ps.toSeq.toDF("doc_id", "lang")
    val gold = labs(1L -> "en", 2L -> "en", 3L -> "en",
      4L -> "de", 5L -> "de", 6L -> "de")
    def ariVal(a: org.apache.spark.sql.DataFrame) =
      TopicCluster.ariOf(a, gold).collect()(0)
    // identical partition → ARI exactly 1
    val same = ariVal(part(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 1))
    assert(same.getLong(0) == 6L && same.getDouble(3) == 1.0)
    // everything in one cluster → chance level, ARI exactly 0
    val one = ariVal(part((1L to 6L).map(_ -> 0): _*))
    assert(one.getLong(1) == 1L && one.getDouble(3) == 0.0)
    // hand-computed mixed case: clusters {1,2,4},{3,5,6} vs gold
    // cells: (0,en)=2,(0,de)=1,(1,en)=1,(1,de)=2 → Sij = 2+0+0+2 = 4
    // Sa = Sb = 2·(3·2) = 12, Sn = 30
    // ARI = 2(30·4 − 144)/(30·24 − 288) = 2(−24)/432 = −1/9
    val mixed = ariVal(part(1L -> 0, 2L -> 0, 4L -> 0, 3L -> 1, 5L -> 1, 6L -> 1))
    assert(math.abs(mixed.getDouble(3) - (-1.0 / 9.0)) < 1e-15)
  }

  test("NMI: exactly 1 on identical partitions, exactly 0 vs one cluster") {
    import spark.implicits._
    val gold = Seq(1L -> "en", 2L -> "en", 3L -> "en",
      4L -> "de", 5L -> "de", 6L -> "de").toDF("doc_id", "lang")
    def nmiVal(ps: (Long, Int)*) =
      TopicCluster.nmiOf(ps.toSeq.toDF("doc_id", "cid"), gold)
        .collect()(0).getDouble(1)
    // identical partition: I = H on the SAME grid terms → exactly 1
    assert(nmiVal(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 1) == 1.0)
    // single cluster: every MI cell term is n_ij·ln(n·n_ij/(n·b_j)) = 0
    assert(nmiVal((1L to 6L).map(_ -> 0): _*) == 0.0)
    // agreement orders sanely: a partly-wrong partition lands strictly
    // between the two extremes
    val partial = nmiVal(1L -> 0, 2L -> 0, 4L -> 0, 3L -> 1, 5L -> 1, 6L -> 1)
    assert(partial > 0.0 - 1e-12 && partial < 1.0)
  }

  test("c-TF-IDF terms: scores match a driver-side recomputation, ranks are dense") {
    import graft.functions.PortableMath.plogDouble
    val out = TopicCluster.clusterTerms(docs, dim = 32, k = 4, iters = 2,
      topK = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    // ranks are 1..≤topK and dense per cluster; scores non-increasing
    // along the rank (ties broken by term, so strictly ordered overall)
    out.groupBy(_._1).foreach { case (cid, rows) =>
      val byRank = rows.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq, s"cid $cid")
      byRank.sliding(2).foreach {
        case Array((_, _, ta, _, sa), (_, _, tb, _, sb)) =>
          assert(sa > sb || (sa == sb && ta < tb), s"cid $cid order")
        case _ =>
      }
    }
    // independent recomputation of every reported score from the raw
    // assignment + token counts: tf·plog(1 + (total/ncls)/ft), the
    // identical correctly-rounded op sequence → exact equality
    val asg = TopicCluster.cluster(docs, dim = 32, k = 4, iters = 2)
      .select("id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val toks = docs.select("doc_id", "text").collect().flatMap { r =>
      r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        .map(t => (asg(r.getLong(0)), t))
    }
    val tf = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ft = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val total = toks.length.toDouble
    val ncls = tf.keys.map(_._1).toSet.size.toLong
    out.foreach { case (cid, _, term, n, score) =>
      assert(n == tf((cid, term)), s"tf of ($cid, $term)")
      val want = n.toDouble * plogDouble(1.0 + total / ncls / ft(term))
      assert(score == want, s"score of ($cid, $term)")
    }
  }
}
