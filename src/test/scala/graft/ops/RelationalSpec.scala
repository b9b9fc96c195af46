package graft.ops

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  private def tables = {
    val dir = "/root/testdata/sf0.001"
    (spark.read.parquet(s"$dir/lineitem.parquet"),
      spark.read.parquet(s"$dir/orders.parquet"),
      spark.read.parquet(s"$dir/customer.parquet"),
      spark.read.parquet(s"$dir/nation.parquet"))
  }

  test("star revenue aggregates per nation with positive revenue") {
    val (l, o, c, n) = tables
    val rows = Relational.starRevenue(l, o, c, n).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) > 0, s"non-positive revenue for ${r.getString(0)}")
      assert(r.getLong(2) > 0)
    }
  }

  test("pricing summary: sums and averages agree with a direct recomputation") {
    import org.apache.spark.sql.functions.col
    val (l, _, _, _) = tables
    val out = Relational.pricingSummary(l).collect()
    assert(out.nonEmpty)
    val filtered = l.filter(
      col("l_shipdate") <= org.apache.spark.sql.functions
        .lit("1998-09-01").cast("timestamp"))
    val total = filtered.count()
    assert(out.map(_.getLong(9)).sum == total)
    out.foreach { r =>
      // avg_qty must equal sum_qty / count exactly (same division)
      assert(r.getDouble(6) == r.getDouble(2) / r.getLong(9))
    }
  }

  test("cube emits detail + both margins + grand total, all consistent") {
    import org.apache.spark.sql.functions.col
    val (l, _, _, _) = tables
    val rows = Relational.pricingCube(l).collect()
    val byGid = rows.groupBy(_.getLong(2))
    // gid 0 = detail, 1 = returnflag margin, 2 = linestatus margin,
    // 3 = grand total (grouping_id bit order: first col = MSB)
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    assert(byGid(3L).length == 1)
    val total = byGid(3L).head.getLong(5)
    assert(byGid(0L).map(_.getLong(5)).sum == total)
    assert(byGid(1L).map(_.getLong(5)).sum == total)
    assert(byGid(2L).map(_.getLong(5)).sum == total)
    // margin rows null out exactly the aggregated-away column
    byGid(1L).foreach(r => assert(!r.isNullAt(0) && r.isNullAt(1)))
    byGid(2L).foreach(r => assert(r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("rollup produces the year→month subtotal chain") {
    val (_, o, _, _) = tables
    val rows = Relational.ordersRollup(o).collect()
    val byGid = rows.groupBy(_.getLong(2))
    // rollup: detail (0), year subtotal (1), grand total (3) — never
    // a month-without-year set (2)
    assert(byGid.keySet == Set(0L, 1L, 3L))
    val total = byGid(3L).head.getLong(4)
    assert(byGid(0L).map(_.getLong(4)).sum == total)
    assert(byGid(1L).map(_.getLong(4)).sum == total)
  }

  test("pivot columns partition the year totals exactly") {
    import org.apache.spark.sql.functions.{col, year}
    val (_, o, _, _) = tables
    val rows = Relational.ordersPivot(o).collect()
    val yearTotals = o.groupBy(year(col("o_orderdate")).as("y")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty && rows.length == yearTotals.size)
    rows.foreach { r =>
      val pivotSum = (1 to 5).map(i => if (r.isNullAt(i)) 0L else r.getLong(i)).sum
      assert(pivotSum == yearTotals(r.getInt(0)), s"year ${r.getInt(0)}")
    }
  }

  test("cube plans one scan through Expand, not one scan per grouping set") {
    val (l, _, _, _) = tables
    val plan = Relational.pricingCube(l).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan.take(500))
    assert("FileScan|Scan parquet".r.findAllIn(plan).length <= 1)
  }

  test("large-volume orders: every survivor beats the threshold, order is total") {
    import org.apache.spark.sql.functions.{col, sum}
    val (l, o, c, _) = tables
    val rows = Relational.largeVolumeOrders(l, o, c, threshold = 250).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(5) > 250.0, r.toString))
    // survivor count matches a direct recomputation of the HAVING set
    val expect = l.groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("q")).filter(col("q") > 250).count()
    assert(rows.length == math.min(expect, 100L))
    // (totalprice DESC, orderdate, orderkey) is a total order — no ties left
    val keys = rows.map(r => (-r.getDouble(4),
      r.getAs[java.time.LocalDateTime](3).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
      r.getLong(2)))
    assert(keys.sameElements(keys.sorted))
  }

  test("small-qty revenue gates each lineitem on ITS part's average, not a global one") {
    import spark.implicits._
    // part 1: qtys 10,10,10,10,1 → avg 8.2, gate 1.64 → only the qty-1
    // row (price 70) passes. part 2: qtys 5,5 → gate 1 → none pass.
    // part 3 has a tiny qty but the wrong brand — brand filter excludes.
    val part = Seq(
      (1L, "p1", "Brand#4", "t", 1L, 1.0),
      (2L, "p2", "Brand#4", "t", 1L, 1.0),
      (3L, "p3", "Brand#9", "t", 1L, 1.0)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val li = (Seq.fill(4)((1L, 10.0, 100.0)) ++ Seq((1L, 1.0, 70.0)) ++
      Seq((2L, 5.0, 50.0), (2L, 5.0, 50.0), (3L, 0.1, 999.0)))
      .zipWithIndex.map { case ((pk, q, px), i) =>
        (i.toLong, pk, 1L, 1, q, px, 0.0, 0.0, "N", "O",
          java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val r = Relational.smallQtyRevenue(li, part).collect()(0)
    assert(r.getLong(1) == 1L)
    assert(math.abs(r.getDouble(0) - 70.0 / 7.0) < 1e-12)
  }

  test("waiting suppliers: sole-late on shared orders only") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // order 1 (F): suppliers 1 (late) and 2 (on time) -> supplier 1 guilty
    // order 2 (F): suppliers 1 and 2 BOTH late -> nobody (anti kills both)
    // order 3 (F): supplier 3 late but ALONE -> no other supplier, not guilty
    // order 4 (O): supplier 1 late but status != F -> excluded
    val li = Seq(
      (1L, 1L, ts("1995-06-01")), (1L, 2L, ts("1995-01-10")),
      (2L, 1L, ts("1995-06-01")), (2L, 2L, ts("1995-06-02")),
      (3L, 3L, ts("1995-06-01")),
      (4L, 1L, ts("1995-06-01"))
    ).map { case (o, sp, sd) =>
      (o, 1L, sp, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", sd)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val orders = Seq(
      (1L, "F"), (2L, "F"), (3L, "F"), (4L, "O")
    ).map { case (o, st) => (o, 1L, st, 1.0, ts("1995-01-01"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val supplier = Seq((1L, "S1", 1L, 0.0), (2L, "S2", 1L, 0.0),
      (3L, "S3", 1L, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val got = Relational.waitingSuppliers(li, orders, supplier)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("S1", 1L)), s"got $got")
  }

  test("debtor segments: above-average balance AND dormant since cutoff") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // avg positive balance = (100+300)/2 = 200. cust 1 (300, dormant)
    // qualifies; cust 2 (300, RECENT order) fails the anti join; cust 3
    // (100) fails the avg gate; cust 4 (-50, dormant) fails positivity
    val customer = Seq(
      (1L, "c1", 1L, 300.0, "SEG_A"), (2L, "c2", 1L, 300.0, "SEG_A"),
      (3L, "c3", 1L, 100.0, "SEG_B"), (4L, "c4", 1L, -50.0, "SEG_B")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, ts("1999-01-01")), // cust 1: old order only
      (11L, 2L, ts("2001-01-01")), // cust 2: recent
      (12L, 3L, ts("1999-01-01"))
    ).map { case (o, c, d) => (o, c, "F", 1.0, d, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    // avg over positives = (300+300+100)/3 = 233.33 -> custs 1,2 pass
    // the gate; only cust 1 is dormant
    val got = Relational.debtorSegments(customer, orders)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("SEG_A", 1L, 300.0)), s"got $got")
  }

  test("plan broadcasts the nation dim and pushes the date filter to the scan") {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val (l, o, c, n) = tables
      val plan = Relational.starRevenue(l, o, c, n)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), "nation dim must broadcast:\n" + plan)
      assert(
        "PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(plan).isDefined,
        "orderdate range must reach the parquet scan:\n" + plan)
    } finally spark.conf.set(key, prev)
  }

  test("skyline keeps exactly the non-dominated vertices, incl. equal-x/equal-y edges") {
    import spark.implicits._
    // per-x max: 1→5, 2→6, 3→3, 4→3. Walking x desc: (4,3) keeps
    // (frontier start), (3,3) is dominated by the equal-y point at
    // higher x, (2,6) keeps, (1,5) is under (2,6).
    val pts = Seq((1.0, 5.0), (2.0, 4.0), (2.0, 6.0), (3.0, 3.0),
      (4.0, 1.0), (4.0, 3.0)).toDF("x", "y")
    val got = Relational.skyline(pts).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(got == Set((4.0, 3.0), (2.0, 6.0)))
  }

  test("skyline plan: no data self-join; offsets broadcast; window bounded") {
    import spark.implicits._
    val pts = Seq((1.0, 2.0), (3.0, 4.0)).toDF("x", "y")
    val plan = Relational.skyline(pts).queryExecution.executedPlan.toString
    // no quadratic dominance test: the only join is the BROADCAST of
    // the per-range-partition offset maxima (|partitions| rows) back
    // onto the per-x aggregate — never a shuffled data-vs-data join
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Cartesian"),
      plan)
    // the surviving unpartitioned window folds the bounded per-
    // partition totals relation, not the data (Prefix.runningMax)
    assert(plan.contains("Window"), plan)
  }

  test("pareto ABC: inclusive 80/95 boundaries, ties broken by custkey") {
    import spark.implicits._
    // one order per customer: revenues 80, 15, 5 -> cums 80, 95, 100
    val orders = Seq((1L, 80.0), (2L, 15.0), (3L, 5.0))
      .toDF("o_custkey", "o_totalprice")
    val r = Relational.paretoAbc(orders).collect()
      .map(x => x.getAs[Long]("o_custkey") -> x.getAs[String]("abc_class"))
      .toMap
    // exactly-80% lands in A, exactly-95% in B (inclusive cuts)
    assert(r == Map(1L -> "A", 2L -> "B", 3L -> "C"))
    // revenue ties fall back to custkey order deterministically
    val tied = Seq((5L, 10.0), (4L, 10.0)).toDF("o_custkey", "o_totalprice")
    val t = Relational.paretoAbc(tied).collect()
      .map(x => (x.getAs[Long]("o_custkey"), x.getAs[Long]("cum_cents")))
      .toMap
    assert(t == Map(4L -> 1000L, 5L -> 2000L))
  }

  test("rfm: quintile scores by exact rank, best customer is 555") {
    import spark.implicits._
    // 5 customers, strictly increasing on all three axes: customer i
    // has i orders, later dates, bigger spend -> scores = rank
    val orders = (1 to 5).flatMap { c =>
      (1 to c).map(j => (c.toLong, s"1995-0$c-0${j % 9 + 1} 00:00:00", c * 100.0))
    }.toDF("o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate",
        org.apache.spark.sql.functions.col("d").cast("timestamp")).drop("d")
    val r = Relational.rfmSegments(orders).collect()
      .map(x => x.getAs[Long]("o_custkey") -> x.getAs[Int]("rfm")).toMap
    assert(r == Map(1L -> 111, 2L -> 222, 3L -> 333, 4L -> 444, 5L -> 555))
  }

  test("gini: equality at 0, extreme concentration near 1, hand value") {
    import spark.implicits._
    def g(rev: Seq[Double]): Double =
      Relational.giniRevenue(rev.zipWithIndex
          .map { case (r, i) => (i.toLong, r) }
          .toDF("o_custkey", "o_totalprice"))
        .collect()(0).getAs[Double]("gini")
    assert(math.abs(g(Seq(5.0, 5.0, 5.0, 5.0))) < 1e-12)
    // one customer holds everything: G = (n-1)/n = 0.75 for n = 4
    assert(math.abs(g(Seq(0.0, 0.0, 0.0, 100.0)) - 0.75) < 1e-12)
    // hand case (1,2,3,4): G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    assert(math.abs(g(Seq(1.0, 2.0, 3.0, 4.0)) - 0.25) < 1e-12)
  }
}
