package graft.ops

import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("every dirty row resolves to its own source row on clean suffix blocks") {
    val customer = (0 until 40).map(i =>
      (i.toLong, f"Customer#$i%09d", i % 3, 0.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val got = EntityResolution.matchCustomers(customer)
    assert(got.count() == 40)
    assert(got.filter($"correct" === 1).count() == 40)
    // true match distance = edits the vowel strip made to "customer#"
    assert(got.select("dist").distinct().as[Long].collect().toSet == Set(3L))
  }

  test("resolution is deterministic under ties (lowest candidate key wins)") {
    // two identical names in one block: both b rows match both a rows
    // at equal distance; the (dist, c_custkey) total order must pick
    // the lowest custkey for both
    val customer = Seq(
      (7L, "Customer#000000001", 1, 0.0),
      (9L, "Customer#000000001", 1, 0.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val got = EntityResolution.matchCustomers(customer)
      .orderBy("b_id").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(7L, 7L))
  }

  test("blocking keeps cross-nation same-suffix rows apart") {
    val customer = Seq(
      (1L, "Customer#000000005", 1, 0.0),
      (2L, "Customer#000000005", 2, 0.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val got = EntityResolution.matchCustomers(customer).collect()
    assert(got.forall(r => r.getLong(0) == r.getLong(1)))
  }
}
