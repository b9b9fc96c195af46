package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting/mixing: reproducible, stable under
  * corpus growth, exact integer bucket math. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("split assignment is a deterministic partition of the corpus") {
    val a = Sampling.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)                                   // reproducible
    assert(a.size == docs.count())                   // total
    assert(a.values.toSet.subsetOf(Set("train", "valid", "test")))
    assert(a.values.count(_ == "train") > a.size / 2) // 98% target
  }

  test("split assignment is stable under corpus growth") {
    // adding documents must never reassign existing ones: assignment
    // over a half-corpus equals the full-corpus assignment restricted
    // to it (this is the anti-contamination property rand() lacks)
    val half = docs.filter(col("doc_id") % 2 === 0)
    val fromHalf = Sampling.splitAssign(half).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val fromFull = Sampling.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    fromHalf.foreach { case (id, s) => assert(fromFull(id) == s) }
  }

  test("splitting on a coarser key puts every group member in one split") {
    // key = source: all docs of a source must land in the same split
    // (the anti-leakage property for chunked/near-dup corpora)
    val bySource = Sampling.splitAssign(docs, key = col("source"))
      .join(docs.select("doc_id", "source"), "doc_id")
      .select("source", "split").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(bySource.map(_._1).distinct.length == bySource.length)
  }

  test("different seeds give different partitions") {
    val a = Sampling.splitAssign(docs, seed = 1).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.splitAssign(docs, seed = 2).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a != b)
  }

  test("weighted mix: drop, downsample, pass-through, and upsample with fractions") {
    val weights = Seq("src0" -> 2.5, "src1" -> 0.4, "src2" -> 0.0, "src3" -> 1.0)
    val mixed = Sampling.weightedMix(docs, weights)
    val perDoc = mixed.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("copy").as("maxc"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getInt(3)))
      .toMap
    // copy index is dense 1..n
    perDoc.values.foreach { case (n, maxc) => assert(n == maxc) }
    assert(!perDoc.keys.exists(_._2 == "src2"))            // dropped
    val bySource = perDoc.groupBy(_._1._2).view
      .mapValues(_.values.map(_._1).toSeq).toMap
    bySource("src0").foreach(n => assert(n == 2L || n == 3L)) // 2.5x
    assert(bySource("src0").exists(_ == 2L) || bySource("src0").exists(_ == 3L))
    bySource("src3").foreach(n => assert(n == 1L))            // exactly 1
    bySource.get("src1").foreach(_.foreach(n => assert(n == 1L))) // kept docs once
    // unlisted sources default to weight 1.0
    bySource.filterKeys(s => !weights.exists(_._1 == s))
      .foreach { case (_, ns) => ns.foreach(n => assert(n == 1L)) }
    // src1 at 0.4: strictly fewer docs survive than exist
    val src1Total = docs.filter(col("source") === "src1").count()
    assert(bySource.get("src1").map(_.size.toLong).getOrElse(0L) < src1Total)
  }

  test("temperature mix flattens the source distribution toward sqrt weights") {
    val mixed = Sampling.temperatureMix(docs)
    val in = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected per-source output: N * sqrt(n_s) / sum(sqrt(n_t)) —
    // realized counts land within 1 of n_s * rate's integer split
    val n = in.values.sum.toDouble
    val z = in.values.map(v => math.sqrt(v.toDouble)).sum
    in.foreach { case (s, ns) =>
      val expect = n * math.sqrt(ns.toDouble) / z
      assert(math.abs(out(s) - expect) <= ns * 0.01 + 2,
        s"$s: got ${out(s)}, expected ~$expect")
    }
    // α=0.5 flattening: a source bigger than another in the input must
    // not be SMALLER after mixing, and the big/small ratio must shrink
    val (big, small) = (in.maxBy(_._2), in.minBy(_._2))
    assert(out(big._1) >= out(small._1) ||
      math.abs(out(big._1) - out(small._1)).toDouble <= 2)
    val ratioIn = big._2.toDouble / small._2
    val ratioOut = out(big._1).toDouble / math.max(out(small._1), 1)
    assert(ratioOut <= ratioIn, s"flattening must shrink $ratioIn -> $ratioOut")
    // total size is preserved up to per-source integer rounding
    assert(math.abs(out.values.sum - in.values.sum) <= in.size.toLong * 2)
    // deterministic
    assert(Sampling.temperatureMix(docs).collect().toSet ==
      mixed.collect().toSet)
  }

  test("weighted mix is deterministic") {
    val weights = Seq("src0" -> 1.5)
    val a = Sampling.weightedMix(docs, weights).collect().toSet
    val b = Sampling.weightedMix(docs, weights).collect().toSet
    assert(a == b)
  }

  test("stratified sample keeps rate-proportional nested subsets") {
    val all = docs.count()
    val full = Sampling.stratifiedSample(docs, Seq.empty) // default 100%
    assert(full.count() == all)
    val half = Sampling.stratifiedSample(docs, Seq("en" -> 5000),
      defaultBp = 5000)
    val halfIds = half.collect().map(_.getLong(0)).toSet
    // roughly half survive (hash-uniform; generous bounds on 50 docs)
    assert(halfIds.size > all / 5 && halfIds.size < all * 4 / 5)
    // nested: every survivor at 50% also survives at 80%
    val eighty = Sampling.stratifiedSample(docs, Seq("en" -> 8000),
      defaultBp = 8000).collect().map(_.getLong(0)).toSet
    assert(halfIds.subsetOf(eighty))
    // zero-rate stratum vanishes
    val langs = Sampling.stratifiedSample(docs, Seq("en" -> 0))
      .collect().map(_.getString(1)).toSet
    assert(!langs.contains("en"))
  }

  test("per-stratum cap keeps exactly min(n, stratum size), deterministically") {
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 5
    val capped = Sampling.capPerStratum(docs, n).collect()
    val byStr = capped.groupBy(_.getString(1))
    for ((lang, total) <- sizes)
      assert(byStr(lang).length == math.min(n.toLong, total))
    // ranks are dense 1..k and stable across partitionings
    byStr.values.foreach { rows =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val repart = Sampling.capPerStratum(docs.repartition(7), n)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(repart == capped.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet)
  }

  test("priority sample is the exact top-k of w/u, partition-invariant") {
    val k = 10
    val all = Sampling.prioritySample(docs, Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // priorities are a pure function of (doc_id, weight): verify top-k
    // selection against a full driver-side sort of the same priorities
    val expect = all.sortBy(t => (-t._3, t._1)).take(k).map(_._1).toSeq
    val got = Sampling.prioritySample(docs, k).collect().map(_.getLong(0)).toSeq
    assert(got == expect)
    val repart = Sampling.prioritySample(docs.repartition(7), k)
      .collect().map(_.getLong(0)).toSeq
    assert(repart == expect)
  }

  test("priority sample is growth-stable: shared docs keep their priority") {
    val half = docs.filter(col("doc_id") % 2 === 0)
    val pHalf = Sampling.prioritySample(half, Int.MaxValue).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val pFull = Sampling.prioritySample(docs, Int.MaxValue).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    pHalf.foreach { case (id, p) =>
      assert(java.lang.Double.doubleToLongBits(p) ==
        java.lang.Double.doubleToLongBits(pFull(id))) }
  }

  test("A-ES sample: weights drive inclusion, ties and floors are deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // one doc with 1000x the weight of 99 peers: its key ln(u)/w is
    // ~1000x closer to 0, so it survives any reasonable u draw
    val d = (1L to 100L).map(i =>
      (i, if (i == 42L) 100000L else 100L)).toDF("doc_id", "n_chars")
    val got = Sampling.aresSample(d, k = 10).collect()
    assert(got.map(_.getLong(0)).contains(42L))
    // keys are negative (u in (0,1] -> ln u <= 0) and sorted desc
    val keys = got.map(_.getDouble(2))
    assert(keys.forall(_ <= 0.0))
    assert(keys.sameElements(keys.sortBy(-_)))
    // zero-weight doc floors at w=1 instead of dividing by zero
    val z = Seq((1L, 0L), (2L, 5L)).toDF("doc_id", "n_chars")
    val zk = Sampling.aresSample(z, k = 2).collect()
    assert(zk.length == 2 && zk.forall(r => !r.getDouble(2).isNaN))
    // determinism: same seed -> same sample
    val again = Sampling.aresSample(d, k = 10).collect().map(_.getLong(0))
    assert(again.sameElements(got.map(_.getLong(0))))
  }

  test("grouped A-ES: independent k-reservoir per source via the heap operator") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 100L)).toDF("doc_id", "source", "n_chars")
    val got = Sampling.aresSamplePerSource(d, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.count(_._1 == "a") == 10 && got.count(_._1 == "b") == 10)
    // equal weights -> the per-source sample is the hash-top-10: must
    // match the single-source aresSample restricted to that source
    val aOnly = Sampling.aresSample(
      d.filter(col("source") === "a"), k = 10).collect().map(_.getLong(0)).toSet
    assert(got.filter(_._1 == "a").map(_._2).toSet == aOnly)
  }

  test("coreset: m rows, no zero-sensitivity picks, exact SSE identity") {
    val pts = graft.Tables.points(spark, "/root/testdata/sf0.001")
    val cents = graft.Tables.initCentroids(spark, "/root/testdata/sf0.001", 8)
    val cs = Sampling.coresetSample(pts, cents, m = 64, seed = 17)
    val rows = cs.collect()
    assert(rows.length == 64)
    // zero-distance points (the centers themselves) are never drawn
    assert(rows.forall(_.getAs[Double]("sqdist") > 0.0))
    // w_p * D2_p == SSE/m per pick, so weighted coreset cost == full SSE
    val sse = graft.kmeans.KMeansOps.objective(
      graft.kmeans.KMeansOps.assign(pts, cents))
      .collect()(0).getAs[Double]("objective")
    val est = rows.map(r => r.getAs[Double]("weight") * r.getAs[Double]("sqdist")).sum
    assert(math.abs(est - sse) / sse < 1e-9)
    // pure function of the data: a rerun is row-identical
    assert(Sampling.coresetSample(pts, cents, m = 64, seed = 17)
      .collect().toSeq == rows.toSeq)
  }

  test("split leakage: straddling near-dup pairs only, consistent with the parts") {
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val (trainBp, validBp, thr) = (5000, 2500, 0.5)
    val leak = Sampling.splitLeakage(docs, trainBp, validBp,
        threshold = thr).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // recompute from the parts: every pair joined to its two splits
    val s = Sampling.splitAssign(docs, trainBp, validBp).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = thr).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = pairs.map { case (a, b) => (s(a), s(b)) }
      .filter { case (x, y) => x != y }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(leak == expect)
    // no same-split rows ever appear
    assert(leak.keys.forall { case (a, b) => a != b })
    // registered query/oracle pair exists
    assert(graft.SparkEntry.queries.contains("split_leakage"))
    assert(graft.SparkEntry.oracleSql.contains("split_leakage"))
  }

  test("bootstrap weights: Poisson(1) shape, deterministic, seed-sensitive") {
    import spark.implicits._
    val docs = (1L to 4000L).toDF("doc_id")
    val w = Sampling.bootstrapWeights(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // keep-rate ~ 1 - 1/e and E[sum w] = n (loose 3-sigma-ish bands)
    assert(math.abs(w.size / 4000.0 - 0.632) < 0.03, s"keep ${w.size}")
    assert(math.abs(w.values.sum / 4000.0 - 1.0) < 0.05)
    assert(w.values.forall(v => v >= 1 && v <= 8))
    // reproducible; a different seed reshuffles membership
    val w2 = Sampling.bootstrapWeights(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(w == w2)
    val w3 = Sampling.bootstrapWeights(docs, seed = 30).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(w3 != w)
  }
}
