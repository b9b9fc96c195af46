package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Similarity search: exact norms/cosine against hand values, ANN (LSH)
  * recall of planted duplicates vs the brute-force baseline. */
class EmbeddingSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  // vec 0 = query; vec 1 = identical direction (scaled); vec 2 = near;
  // vec 3 = orthogonal; vec 4 = opposite
  private def embs: DataFrame = Seq(
    (0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
    (1L, Array(2f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
    (2L, Array(1f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
    (3L, Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f), 1),
    (4L, Array(-1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("l2 norms are exact") {
    val m = EmbeddingOps.norms(embs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(0L) == 1.0 && m(1L) == 2.0 && m(4L) == 1.0)
    assert(math.abs(m(2L) - math.sqrt(1.0 + 0.1f.toDouble * 0.1f.toDouble)) < 1e-15)
  }

  test("brute-force cosine top-k ranks by similarity with vec_id tie-break") {
    val got = EmbeddingOps.cosineTopK(embs, queryId = 0L, k = 3)
      .select("vec_id", "cosine").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got(0)._2 == 1.0) // same direction
    assert(math.abs(got(1)._2 - 1.0 / math.sqrt(1.0 + 0.1f.toDouble * 0.1f.toDouble)) < 1e-15)
    assert(got(2)._2 == 0.0) // orthogonal
  }

  test("on-disk LSH index partition-prunes probes and matches the in-memory path") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx").toString
    try {
      EmbeddingOps.writeLshIndex(embs, dir)
      val fromDisk = EmbeddingOps.lshTopKIndexed(dir, embs, queryId = 0L, k = 5)
      val inMem = EmbeddingOps.lshTopK(embs, queryId = 0L, k = 5)
        .select("vec_id", "cosine").as[(Long, Double)].collect().toSeq
      // the probe reaches the index scan as a partition filter
      val plan = fromDisk.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: ["), plan)
      val got = fromDisk.select("vec_id", "cosine").as[(Long, Double)].collect().toSeq
      assert(got == inMem)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("cosine top-k compiles to TakeOrderedAndProject, never a global Window") {
    // scale guard: a partitionBy-less Window funnels every scored row
    // into ONE partition; orderBy(...).limit(k) must stay the per-
    // partition top-k physical operator
    val plan = EmbeddingOps.cosineTopK(embs, queryId = 0L, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("LSH top-k finds the identical-direction vector (same bucket in every table)") {
    val got = EmbeddingOps.lshTopK(embs, queryId = 0L, k = 2, dim = dim)
      .select("vec_id").as[Long].collect().toSet
    assert(got.contains(1L)) // colinear → identical sign pattern, guaranteed collision
  }

  test("cosine near-dup join surfaces the colinear pair at threshold ~1") {
    val pairs = EmbeddingOps.cosineNearDups(embs, threshold = 0.99, dim = dim)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L }) // opposite never
  }

  test("LSH ANN recall vs brute force on the real embeddings table") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = EmbeddingOps.cosineTopK(real, queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = EmbeddingOps.lshTopK(real, queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    // approximate: any overlap with the true top-10 counts as sane recall
    // (tables/bits are tuned for the 0.4-0.5 cosine regime of this data)
    assert(approx.nonEmpty)
    assert(approx.subsetOf(
      real.select("vec_id").as[Long].collect().toSet)) // ids from the table
    assert((exact intersect approx).nonEmpty)
  }

  test("hyperplanes are deterministic per seed") {
    val a = EmbeddingOps.hyperplanes(4, 2, 2, seed = 9L)
    val b = EmbeddingOps.hyperplanes(4, 2, 2, seed = 9L)
    assert(a.flatten.flatten.map(x => x) == b.flatten.flatten.map(x => x))
  }

  test("incremental cosine dedup drops batch vectors near history, keeps batch-internal pairs") {
    val history = Seq(
      (1L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val batch = Seq(
      (10L, Array(2f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f)), // ~colinear w/ hist 1 → dropped
      (11L, Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)),    // fresh direction → kept
      (12L, Array(0f, 0f, 2f, 0.01f, 0f, 0f, 0f, 0f))  // near batch 11 only → KEPT
    ).toDF("vec_id", "embedding")
    val kept = EmbeddingOps.dedupAgainstCosine(
      history, batch, threshold = 0.9, dim = 8)
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(11L, 12L))
  }

  test("MMR trades redundant near-duplicates for diverse picks") {
    // cluster A: 3 near-identical vectors very close to the query;
    // vector 10: moderately relevant but orthogonal to cluster A
    val docs = Seq(
      (0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(0.98f, 0.02f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (3L, Array(0.97f, 0.03f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (10L, Array(0.5f, 0f, 0.87f, 0f, 0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    // pure relevance at k=3 keeps the redundant cluster: 1, 2, 3
    val rel = EmbeddingOps.cosineTopK(docs, queryId = 0L, k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(rel == Seq(1L, 2L, 3L))
    // MMR's second pick must jump to the diverse vector 10
    val mmr = EmbeddingOps.mmrTopK(docs, queryId = 0L, pool = 4, k = 3,
      lambda = 0.5).collect()
    assert(mmr.map(_.getInt(0)).toSeq == Seq(1, 2, 3)) // ranks
    assert(mmr.head.getLong(1) == 1L)                  // best rel first
    assert(mmr(1).getLong(1) == 10L, mmr.map(_.getLong(1)).mkString(","))
  }

  test("hard negatives exclude same-label vectors and keep the similar wrong-label one") {
    // anchor 0 (label 0); 1-2 same label & near; 3 different label &
    // near-ish; 4 different label & opposite
    val docs = Seq(
      (0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (1L, Array(0.99f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (2L, Array(0.98f, 0.02f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (3L, Array(0.95f, 0.3f, 0f, 0f, 0f, 0f, 0f, 0f), 1),
      (4L, Array(-1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = EmbeddingOps.hardNegatives(docs, k = 2, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // no pair may share its anchor's label
    val labelOf = Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1)
    got.foreach { case (a, n, nl) =>
      assert(labelOf(a) != nl && labelOf(n) == nl, s"($a,$n,$nl)")
    }
    // anchor 0's top hard negative is the similar-but-wrong vector 3
    val a0 = got.filter(_._1 == 0L)
    assert(a0.nonEmpty && a0.head._2 == 3L, a0.mkString(","))
  }

  test("MMR rank-1 equals the relevance argmax and scores are λ-scaled") {
    val mmr = EmbeddingOps.mmrTopK(embs, queryId = 0L, pool = 4, k = 2,
      lambda = 0.7).collect()
    assert(mmr.head.getLong(1) == 1L)
    assert(mmr.head.getDouble(2) == 0.7 * 1.0)
  }

  test("knn classify: majority vote transfers cluster labels; vote tie → smaller label") {
    // two tight clusters on orthogonal axes; vector 2 carries a wrong
    // label, which makes the votes for vectors 0 and 1 split 1-1 —
    // the tie must break to the SMALLER label
    val docs = Seq(
      (0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (1L, Array(0.99f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (2L, Array(0.98f, 0.02f, 0f, 0f, 0f, 0f, 0f, 0f), 7),
      (10L, Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f), 1),
      (11L, Array(0f, 0.01f, 0.99f, 0f, 0f, 0f, 0f, 0f), 1),
      (12L, Array(0f, 0.02f, 0.98f, 0f, 0f, 0f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = EmbeddingOps.knnClassify(docs, k = 2, dim = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(3), r.getBoolean(4))).toMap
    // the clean cluster-1 vectors vote each other in unanimously
    assert(got(10L) == ((1, 1, true)) && got(11L) == ((1, 1, true))
      && got(12L) == ((1, 1, true)))
    // vector 0's 2-NN are 1 (label 0) and 2 (label 7): 1-1 vote tie →
    // smaller label 0 wins; same for vector 1
    assert(got(0L)._1 == 0 && got(1L)._1 == 0)
    // the mislabeled vector's neighbors (0 and 1) vote 0 unanimously:
    // predicted 0, flagged incorrect against its own stored label 7
    assert(got(2L) == ((0, 7, false)))
  }

  test("ood score: isolated vector scores high ood_dist; tight cluster scores near 0") {
    // three near-identical vectors + one isolated one that still
    // co-buckets occasionally; the cluster's k-th-NN cosine ≈ 1 while
    // any realized neighbor of the outlier is nearly orthogonal
    val docs = Seq(
      (0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (1L, Array(0.99f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (2L, Array(0.98f, 0.02f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (9L, Array(0f, 0f, 0f, 0f, 0f, 0f, 0.1f, 1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = EmbeddingOps.oodScores(docs, k = 2, dim = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // cluster members: 2 realized neighbors, kth cosine ≈ 1 → low dist
    Seq(0L, 1L, 2L).foreach { id =>
      assert(got(id)._1 == 2L && got(id)._3 < 0.01, s"$id: ${got(id)}")
    }
    // the isolated vector either never co-buckets (absent → extreme
    // OOD by absence) or scores a near-orthogonal kth neighbor
    got.get(9L).foreach { case (_, _, dist) => assert(dist > 0.8) }
    // score identity: ood_dist = 1 - kth_cos, and min-cosine really is
    // the k-th ranked neighbor's cosine
    got.values.foreach { case (_, c, d) => assert(d == 1.0 - c) }
  }

  test("margin mine: stand-out pair beats its neighborhood; weak pair is not mined") {
    // 0 and 1 are each other's stand-out match; 5 is a moderate
    // neighbor of both, which drags their neighborhood averages down
    // and gives the (0,1) edge its margin. A pair with ONLY each other
    // as neighbors would score margin exactly 1 (it can't exceed a
    // neighborhood made of itself) — the ratio criterion by design.
    val docs = Seq(
      (0L, Array(1f, 0.2f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (1L, Array(1f, 0.21f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (5L, Array(1f, -0.5f, 0f, 0f, 0f, 0f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val mined = EmbeddingOps.marginMine(docs, k = 2, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // the stand-out pair is mined with margin > 1
    assert(mined.contains((0L, 1L)), mined.keys.mkString(","))
    assert(mined((0L, 1L))._2 > 1.0)
    // the moderate edges to the hanger-on are NOT mined
    assert(!mined.contains((0L, 5L)) && !mined.contains((1L, 5L)))
    // every mined pair satisfies the strict threshold
    mined.values.foreach { case (_, m) => assert(m > 1.0) }
  }

  test("intrinsic dim: near-1D ring of vectors estimates low; " +
      "duplicates are excluded from the estimate") {
    // vectors along a 1-parameter family (rotations in a 2D plane of
    // the 8D space) with IRREGULAR golden-ratio spacing — TwoNN
    // assumes Poisson-like neighbor gaps; on a perfectly regular
    // lattice r1 = r2 on both sides (μ = 1) and the estimator
    // legitimately diverges, so the fixture must not be a grid
    val phi = 0.6180339887498949
    var t = 0.0
    val ring = (0 until 24).map { i =>
      t += 0.05 + 0.2 * ((i * phi) % 1.0)
      val v = Array.fill(8)(0f)
      v(0) = math.cos(t).toFloat; v(1) = math.sin(t).toFloat
      (i.toLong, v, 0)
    }.toDF("vec_id", "embedding", "label")
    // numBits=2 → wide buckets → candidates ≈ exact neighbors; the
    // curve is 1-dimensional and the estimate lands far below the
    // ambient 8 (n = 24 keeps it noisy — bounds, not equality)
    val r = EmbeddingOps.intrinsicDim(ring, dim = 8, numBits = 2).collect()(0)
    assert(r.getLong(0) > 10)
    val d = r.getDouble(1)
    assert(d > 0.2 && d < 3.0, s"got $d")
    // adding exact duplicates must not poison the estimate (r1 = 0
    // pairs are dropped, not divided by)
    val withDup = ring.unionByName(
      Seq((100L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0))
        .toDF("vec_id", "embedding", "label"))
    val r2 = EmbeddingOps.intrinsicDim(withDup, dim = 8, numBits = 2)
      .collect()(0)
    assert(!r2.isNullAt(1) && r2.getDouble(1) > 0.0)
  }

  test("centroid drift: stationary label scores cosine 1; shifted label diverges") {
    // label 0: both halves centered on x̂ → identical half-centroids.
    // label 1: even half on ŷ, odd half on ẑ → orthogonal centroids.
    val docs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0), (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(1f, 0f, 0f, 0f), 0), (3L, Array(1f, 0f, 0f, 0f), 0),
      (10L, Array(0f, 1f, 0f, 0f), 1), (12L, Array(0f, 1f, 0f, 0f), 1),
      (11L, Array(0f, 0f, 1f, 0f), 1), (13L, Array(0f, 0f, 1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = EmbeddingOps.centroidDrift(docs).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(0) == ((2L, 2L, 1.0, 0.0)))
    val (na, nb, cos1, d21) = got(1)
    assert(na == 2L && nb == 2L)
    assert(cos1 == 0.0 && d21 == 2.0)
  }

  test("centroid classify: grid-exact means, argmin label transfer, outlier corrected") {
    // label 0 clusters at x≈1, label 1 at y≈1; vector 20 claims label 1
    // but sits in the label-0 cluster → predicted 0, correct = false
    val docs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (10L, Array(0f, 0f, 1f, 0f), 1),
      (11L, Array(0f, 0f, 0.9f, 0.1f), 1),
      (20L, Array(0.95f, 0.05f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = EmbeddingOps.centroidClassify(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(3), r.getBoolean(4)))
      .toMap
    assert(got(0L) == ((0, 0, true)) && got(1L) == ((0, 0, true)))
    assert(got(10L)._1 == 1 && got(11L)._1 == 1)
    assert(got(20L) == ((0, 1, false)), s"outlier ${got(20L)}")
  }

  test("centroid classify scores with a broadcast, never a shuffled join") {
    val docs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (10L, Array(0f, 0f, 1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val plan = EmbeddingOps.centroidClassify(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("knn classify plan uses TopKPerKey, not Window") {
    val docs = Seq(
      (0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (1L, Array(0.99f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val plan = EmbeddingOps.knnClassify(docs, k = 1, dim = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
  }

  // 64-dim anisotropic cloud: variance concentrated on axis 7 (values
  // ±3 alternating), small deterministic wiggle on axis 3. PC1 must
  // align with e_7; the mean-centered projections must sum to ~0.
  private def pcaFixture: DataFrame = {
    val rows = (0 until 40).map { i =>
      val v = Array.fill(64)(0f)
      v(7) = if (i % 2 == 0) 3f + i * 0.01f else -3f - i * 0.01f
      v(3) = 0.1f * ((i % 5) - 2)
      (i.toLong, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("power-iteration PC1 aligns with the dominant-variance axis") {
    val r = EmbeddingOps.pcaFit(pcaFixture, cacheKey = "spec-aniso")
    val nrm = math.sqrt(r.pc.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-12, s"PC not unit: $nrm")
    assert(math.abs(r.pc(7)) > 0.999, s"PC1 off-axis: ${r.pc.toSeq}")
    // eigenvalue ≈ variance along axis 7 (≈ 9+), far above the wiggle
    assert(r.lambda > 8.0, s"lambda=${r.lambda}")
  }

  test("PCA projection is centered and the scan plan is shuffle-free") {
    val df = EmbeddingOps.pcaProject(pcaFixture, cacheKey = "spec-aniso")
    val scores = df.collect().map(_.getDouble(1))
    assert(scores.length == 40)
    // Σ(x−μ)·v = 0 up to the 1e-12 moment grid + fp accumulation
    assert(math.abs(scores.sum) < 1e-6, s"sum=${scores.sum}")
    // the per-vector scoring pass itself is a pure projection
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("rp ANN: deterministic, self-excluded, and exact at p = d") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = EmbeddingOps.rpTopK(embs, 0L, 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.length == 5 && !a.exists(_._1 == 0L))
    val b = EmbeddingOps.rpTopK(embs, 0L, 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq)
    // with p = d and a generous overscan the JL shortlist cannot miss:
    // full-rank projection preserves the ranking candidates exactly
    val exact = EmbeddingOps.cosineTopK(embs, 0L, 5).collect()
      .map(_.getLong(0)).toSet
    val full = EmbeddingOps.rpTopK(embs, 0L, 5, p = 64, overscan = 40)
      .collect().map(_.getLong(0)).toSet
    assert((exact intersect full).size >= 4)
  }

  test("autoBits: pure-integer staircase, exact at power-of-two edges") {
    import EmbeddingOps.autoBits
    // bits = clamp(ceil(log2(n / 16)), 6, 16); boundary is STRICT >
    assert(autoBits(0L) == 6)
    assert(autoBits(1024L) == 6)   // 16·2^6 exactly → still 6
    assert(autoBits(1025L) == 7)
    assert(autoBits(2048L) == 7)
    assert(autoBits(2049L) == 8)
    assert(autoBits(20000L) == 11) // the sf1 fixture → the b10-class setting
    assert(autoBits(200000L) == 14)
    assert(autoBits(Long.MaxValue / 2) == 16) // capped at AutoMaxBits
    // staircase == clamp(ceil(log2(n/target)), min, max) at every step
    for (n <- Seq(1L, 100L, 1024L, 4096L, 65536L, 1000000L, 100000000L)) {
      val exact = math.ceil(math.log(n.toDouble / 16.0) / math.log(2.0)).toInt
      assert(autoBits(n) == math.min(16, math.max(6, exact)), s"n=$n")
    }
  }

  test("auto-width buckets are the prefix slice of the AutoMaxBits planes") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bits = EmbeddingOps.autoBits(embs.count())
    // every bucket id uses only the low `bits` bits
    val buckets = EmbeddingOps.lshBucketsAuto(embs).collect()
    assert(buckets.nonEmpty)
    assert(buckets.forall { r =>
      val b = r.getLong(2); b >= 0 && b < (1L << bits)
    })
    // the graph at the auto width: ≤ k deterministic rows per vector
    val g = EmbeddingOps.knnGraphAuto(embs, k = 3).collect()
    val byVec = g.groupBy(_.getLong(0))
    assert(byVec.values.forall(_.length <= 3))
    assert(g.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 3))
    val g2 = EmbeddingOps.knnGraphAuto(embs, k = 3).collect()
    assert(g.map(_.toString).sorted.toSeq == g2.map(_.toString).sorted.toSeq)
  }

  test("autoRecall reports the derived width and a recall in [0,1]") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = EmbeddingOps.autoRecall(embs).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == EmbeddingOps.autoBits(embs.count()).toLong)
    val recall = r(0).getDouble(3)
    assert(recall >= 0.0 && recall <= 1.0)
  }

  test("knnGraphDeduped: replicas collapse to min-id, replica-free corpus is identity") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // replicate every vector under shifted ids: the deduped graph over
    // the inflated corpus must equal the auto graph over the original
    val inflated = real.unionAll(real
      .withColumn("vec_id", $"vec_id" + 1000000L))
    val deduped = EmbeddingOps.knnGraphDeduped(inflated).collect()
      .map(_.toString).sorted.toSeq
    val base = EmbeddingOps.knnGraphAuto(real).collect()
      .map(_.toString).sorted.toSeq
    assert(deduped == base)
    // and with no replicas the composition is exactly knnGraphAuto
    val ident = EmbeddingOps.knnGraphDeduped(real).collect()
      .map(_.toString).sorted.toSeq
    assert(ident == base)
  }

  test("ceilLog2 / rpAutoP: pure-integer staircases, exact at power edges") {
    import EmbeddingOps.{ceilLog2, rpAutoP}
    assert(ceilLog2(1L) == 1 && ceilLog2(2L) == 1)
    assert(ceilLog2(3L) == 2 && ceilLog2(4L) == 2 && ceilLog2(5L) == 3)
    for (n <- Seq(7L, 500L, 512L, 2000L, 20000L, 1000000L, 1L << 40)) {
      val exact = math.max(1, math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt)
      assert(ceilLog2(n) == exact, s"n=$n got ${ceilLog2(n)} want $exact")
    }
    assert(rpAutoP(500L) == 36)    // gate fixtures
    assert(rpAutoP(2000L) == 44)   // sf0.1
    assert(rpAutoP(20000L) == 48)  // sf1 → capped at RpMaxP
    assert(rpAutoP(1L) == 16)      // floored
  }

  test("rpTopKAuto equals rpTopK at the derived width (plane prefix property)") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val p = EmbeddingOps.rpAutoP(embs.count())
    val auto = EmbeddingOps.rpTopKAuto(embs, 0L, 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val manual = EmbeddingOps.rpTopK(embs, 0L, 5, p = p,
      overscan = EmbeddingOps.RpOverscan).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(auto == manual)
  }

  test("multiprobe auto LSH top-k: self-excluded, deterministic, and exact on the gate fixture") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = EmbeddingOps.lshTopKAuto(embs, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.length == 10 && !got.exists(_._1 == 0L))
    val again = EmbeddingOps.lshTopKAuto(embs, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == again)
    // at n=500 the probe set covers enough of the corpus that the
    // result IS the exact top-10 (the emb_topk_recall gate pins this
    // per SF; a recall drop here means the probe machinery broke)
    val exact = EmbeddingOps.cosineTopK(embs, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact)
  }

  test("topkRecallReport: one row per registered family, recall 1.0 on the gate fixture") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = EmbeddingOps.topkRecallReport(embs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("ivfpq_refined", "lsh_auto", "pq_refined", "rp_auto"))
    // the r16 operating points were chosen to retrieve the full true
    // top-10 at every measured SF (TuneAnn: sf0.001/0.01/0.1/1/10)
    assert(rows.forall { case (_, k, hit, rec) =>
      k == 10L && hit == 10L && rec == 1.0 })
  }
}
