package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: same-bucketed tables join with zero
  * shuffle Exchange — the pay-shuffle-once-at-write-time strategy. */
class BucketingSpec extends SparkSpec {

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("join of two same-bucketed tables plans with zero shuffles") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    rmrf(new java.io.File("/tmp/graft-warehouse/orders_b"))
    rmrf(new java.io.File("/tmp/graft-warehouse/lineitem_b"))

    val orders = Tables.table(spark, dir, "orders")
    val lineitem = Tables.table(spark, dir, "lineitem")
    Tables.writeBucketed(orders, "orders_b", Seq("o_orderkey"), 4)
    Tables.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", Seq("o_orderkey"), 4)

    // force a non-broadcast join so bucketing (not broadcast) is what
    // eliminates the shuffle
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), "o_orderkey")
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")

      val expected = lineitem
        .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    }
  }
}
