package graft.ops

import graft.SparkSpec
import graft.functions.VecFunctions
import org.apache.spark.sql.functions._

/** SemDeDup semantics: within-cluster cosine near-dup pairs, keeper =
  * lowest id, and the single-cluster case degenerates to exact
  * brute-force pairs. */
class SemDedupSpec extends SparkSpec {

  private def embs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("keepers and losers partition the id space; losers have a lower-id near-dup") {
    val tau = 0.4
    val ids = IvfIndex.vectors(embs).select("id")
      .collect().map(_.getLong(0)).toSet
    val pairs = SemDedup.semanticNearDups(embs, tau = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val kept = SemDedup.semanticDedup(embs, tau = tau)
      .collect().map(_.getLong(0)).toSet
    val losers = pairs.map(_._2).toSet
    assert(kept.union(losers) == ids)
    assert(kept.intersect(losers).isEmpty)
    pairs.foreach { case (da, db, cos) =>
      assert(da < db)
      assert(cos >= tau)
    }
  }

  test("an impossible tau keeps everything") {
    val all = IvfIndex.vectors(embs).count()
    assert(SemDedup.semanticDedup(embs, tau = 1.01).count() == all)
    assert(SemDedup.semanticNearDups(embs, tau = 1.01).count() == 0)
  }

  test("single-cluster SemDeDup equals brute-force cosine pairs") {
    val tau = 0.4
    // nlist=1: every vector lands in the one cluster, so the blocked
    // pair join must degenerate to exact all-pairs
    val blocked = SemDedup.semanticNearDups(embs, nlist = 1, tau = tau)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val v = IvfIndex.vectors(embs)
    val a = v.select(col("id").as("da"), col("vec").as("va"))
    val b = v.select(col("id").as("db"), col("vec").as("vb"))
    val brute = a.crossJoin(b).filter(col("da") < col("db"))
      .withColumn("cosine",
        VecFunctions.vecDot(col("va"), col("vb")) /
          (sqrt(VecFunctions.vecDot(col("va"), col("va"))) *
            sqrt(VecFunctions.vecDot(col("vb"), col("vb")))))
      .filter(col("cosine") >= tau)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute)
    assert(brute.nonEmpty)
  }

  test("clustering only ever removes pairs relative to brute force (blocking soundness)") {
    val tau = 0.4
    val blocked = SemDedup.semanticNearDups(embs, nlist = 4, tau = tau)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = SemDedup.semanticNearDups(embs, nlist = 1, tau = tau)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(single))
  }
}
