package graft.ops

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def realEmbs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("index build partitions every vector into exactly one list") {
    val embs = realEmbs
    val idx = IvfIndex.build(embs, nlist = 8, maxIter = 3)
    val n = embs.count()
    assert(idx.lists.count() == n)
    assert(idx.lists.select("id").distinct().count() == n)
    val listIds = idx.lists.select("list_id").as[Int].collect().toSet
    assert(listIds.subsetOf(idx.centroids.map(_.cid).toSet))
  }

  test("search returns k results ranked by cosine and includes good neighbors") {
    val embs = realEmbs
    val idx = IvfIndex.build(embs, nlist = 8, maxIter = 3)
    val q = IvfIndex.vectors(embs).filter($"id" === 0L).collect()(0).getSeq[Double](1)
    val got = IvfIndex.search(spark, idx, q, k = 10, nprobe = 3)
      .select("id", "cosine").as[(Long, Double)].collect()
    assert(got.length == 10)
    // ranked descending
    assert(got.map(_._2).toSeq == got.map(_._2).sortBy(-_).toSeq)
    // the query vector itself lives in a probed list → cosine 1.0 first
    assert(got(0)._1 == 0L && math.abs(got(0)._2 - 1.0) < 1e-12)
    // recall vs brute force over the same table
    val exact = EmbeddingOps.cosineTopK(embs, queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = got.map(_._1).toSet - 0L
    assert((exact intersect approx).nonEmpty)
  }

  test("on-disk index partition-prunes probes and returns the in-memory results") {
    val embs = realEmbs
    val idx = IvfIndex.build(embs, nlist = 8, maxIter = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    try {
      IvfIndex.writeIndex(idx, dir)
      val disk = IvfIndex.readIndex(spark, dir, idx.centroids)
      val q = IvfIndex.vectors(embs).filter($"id" === 0L).collect()(0).getSeq[Double](1)
      val fromDisk = IvfIndex.search(spark, disk, q, k = 10, nprobe = 3)
      // the probe must reach the scan as a PARTITION filter (directory
      // pruning — reads nprobe/nlist of the data), not a row filter
      val plan = fromDisk.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") && plan.contains("list_id"), plan)
      val inMem = IvfIndex.search(spark, idx, q, k = 10, nprobe = 3)
        .select("id", "cosine").as[(Long, Double)].collect().toSeq
      val got = fromDisk.select("id", "cosine").as[(Long, Double)].collect().toSeq
      assert(got == inMem)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ann recall: monotone in nprobe; full probe width reaches recall 1") {
    val embs = realEmbs
    val rows = IvfIndex.annRecall(spark, embs, nlist = 4, maxIter = 2,
        k = 5, nprobes = Seq(1, 2, 4))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet == Set(1L, 2L, 4L))
    // widening the probe can only help
    assert(rows(1L)._1 <= rows(2L)._1 && rows(2L)._1 <= rows(4L)._1)
    // probing ALL 4 lists IS brute force → perfect recall
    assert(rows(4L) == ((5L, 1.0)))
    rows.values.foreach { case (h, r) => assert(r == h / 5.0) }
  }

  test("probing every list equals brute force exactly") {
    val embs = realEmbs
    val idx = IvfIndex.build(embs, nlist = 4, maxIter = 2)
    val q = IvfIndex.vectors(embs).filter($"id" === 7L).collect()(0).getSeq[Double](1)
    val full = IvfIndex.search(spark, idx, q, k = 5, nprobe = 4)
      .select("id").as[Long].collect().toList.filter(_ != 7L)
    val exact = EmbeddingOps.cosineTopK(embs, queryId = 7L, k = 4)
      .select("vec_id").as[Long].collect().toList
    assert(full.take(4) == exact)
  }
}
