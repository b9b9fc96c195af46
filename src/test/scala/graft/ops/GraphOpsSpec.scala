package graft.ops

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("two-node cycle keeps the uniform fixed point exactly") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, iters = 5).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // 0.5 is the fixed point: contrib = 0.5/1, snap-to-grid is exact,
    // 0.15*0.5 + 0.85*0.5 = 0.5 in IEEE
    assert(r(1L) == 0.5 && r(2L) == 0.5)
  }

  test("symmetrized chain: the middle node outranks the ends, ends tie") {
    // a - b - c, both directions
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val r = GraphOps.pageRank(edges, iters = 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(2L) > r(1L))
    assert(r(1L) == r(3L), s"symmetry: ${r(1L)} vs ${r(3L)}")
    // rank mass conserved up to grid truncation
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("duplicate edges collapse; reruns are bit-identical") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val a = GraphOps.pageRank(edges, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val noDup = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val b = GraphOps.pageRank(noDup, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(a == b)
    val rerun = GraphOps.pageRank(edges, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(a.forall { case (k, v) =>
      java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(rerun(k)) })
  }
}
