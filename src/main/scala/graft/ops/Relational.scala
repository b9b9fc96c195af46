package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational star-schema analytics over the TPC-H-ish tables — the
  * join-planning surface (fact ⋈ fact ⋈ dim ⋈ tiny-dim) a warehouse
  * query runs. The date range filters at the orders scan (pushed to
  * parquet), the nation dimension is explicitly broadcast (25 rows at
  * any scale), and the orderkey/custkey joins shuffle on their keys
  * with AQE free to re-plan — the canonical TPC-H Q5-style shape.
  * Revenue sums route through DECIMAL (order-independent) with the
  * VARCHAR round-trip twin per the KMeansOps parity note.
  */
object Relational {

  private val Dec = DecimalType(28, 6)

  def starRevenue(
      lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame,
      year: Int = 1995): DataFrame = {
    val o = orders.filter(
      col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
    lineitem
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(Dec))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** TPC-H Q1-shape pricing summary: one scan, a pushed shipdate
    * filter, and a 4-sum/3-avg/1-count aggregate over a tiny group key
    * — the classic single-pass partial/final reduction. Every SUM is
    * decimal-routed; each AVG is the decimal sum divided by the count
    * as one IEEE double division, replayed identically in the twin. */
  def pricingSummary(lineitem: DataFrame, cutoff: String = "1998-09-01"): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(Dec)).cast("double").as("sum_base_price"),
        sum(disc.cast(Dec)).cast("double").as("sum_disc_price"),
        sum((disc * (lit(1.0) + col("l_tax"))).cast(Dec)).cast("double")
          .as("sum_charge"),
        (sum(col("l_quantity").cast(Dec)).cast("double") / count(lit(1)))
          .as("avg_qty"),
        (sum(col("l_extendedprice").cast(Dec)).cast("double") / count(lit(1)))
          .as("avg_price"),
        (sum(col("l_discount").cast(Dec)).cast("double") / count(lit(1)))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  def pricingSummarySql(cutoff: String = "1998-09-01"): String = {
    def decSum(e: String) =
      s"CAST(CAST(SUM(CAST($e AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)"
    s"""SELECT l_returnflag, l_linestatus,
       |  ${decSum("l_quantity")} AS sum_qty,
       |  ${decSum("l_extendedprice")} AS sum_base_price,
       |  ${decSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${decSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${decSum("l_quantity")} / COUNT(*) AS avg_qty,
       |  ${decSum("l_extendedprice")} / COUNT(*) AS avg_price,
       |  ${decSum("l_discount")} / COUNT(*) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '$cutoff 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin
  }

  /** Multi-dimensional aggregate — CUBE over the Q1 group key: one
    * scan produces every grouping-set combination (detail, each
    * single-axis margin, grand total) with `grouping_id` tagging the
    * level. Spark expands the sets BEFORE the shuffle (Expand), so the
    * whole cube still costs one pass + one aggregation shuffle — the
    * warehouse way to compute a pivot-table's margins without
    * re-scanning per level. */
  def pricingCube(lineitem: DataFrame, cutoff: String = "1998-09-01"): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(Dec))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("n_rows"))

  def pricingCubeSql(cutoff: String = "1998-09-01"): String = {
    def decSum(e: String) =
      s"CAST(CAST(SUM(CAST($e AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)"
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       |  ${decSum("l_quantity")} AS sum_qty,
       |  ${decSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  COUNT(*) AS n_rows
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '$cutoff 00:00:00'
       |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin
  }

  /** ROLLUP down the natural time hierarchy (year → month → grand
    * total): the subtotal chain a reporting rollup query produces.
    * Same one-scan Expand + single shuffle shape as [[pricingCube]]. */
  def ordersRollup(orders: DataFrame): DataFrame =
    orders
      .rollup(year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"))
      .agg(
        grouping_id().as("gid"),
        sum(col("o_totalprice").cast(Dec)).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))

  def ordersRollupSql(): String =
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |  CAST(month(o_orderdate) AS INTEGER) AS o_month,
       |  CAST(GROUPING(year(o_orderdate), month(o_orderdate)) AS BIGINT) AS gid,
       |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS VARCHAR)
       |    AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_orders
       |FROM orders
       |GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))""".stripMargin

  /** TPC-H Q3 shape — top unshipped orders by revenue: two pushed date
    * filters (one per fact scan), a broadcast customer-segment
    * semi-side, the orderkey shuffle join, and a TakeOrdered top-10 —
    * never a global sort. */
  def topUnshippedOrders(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      segment: String = "BUILDING", date: String = "1995-03-15",
      k: Int = 10): DataFrame = {
    val c = customer.filter(col("c_mktsegment") === segment)
      .select("c_custkey")
    val o = orders.filter(col("o_orderdate") < lit(date).cast("timestamp"))
    val l = lineitem.filter(col("l_shipdate") > lit(date).cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(Dec)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(k)
  }

  def topUnshippedOrdersSql(
      segment: String = "BUILDING", date: String = "1995-03-15",
      k: Int = 10): String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
       |    AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = '$segment'
       |  AND o_orderdate < TIMESTAMP '$date 00:00:00'
       |  AND l_shipdate > TIMESTAMP '$date 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey ASC LIMIT $k""".stripMargin

  private val Priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Pivot: order counts per year × order-priority, priorities turned
    * into columns. The EXPLICIT value list is the scale contract —
    * Spark otherwise runs a distinct-collect pre-pass to discover
    * pivot columns (a full extra scan, and a driver-sized surprise on
    * a high-cardinality key); with values supplied the whole pivot is
    * ONE conditional-aggregation pass, same plan as the SQL twin's
    * CASE columns. */
  def ordersPivot(orders: DataFrame): DataFrame =
    orders
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .pivot("o_orderpriority", Priorities)
      .agg(count(lit(1)))

  def ordersPivotSql(): String = {
    val cols = Priorities.map(p =>
      s"""COUNT(CASE WHEN o_orderpriority = '$p' THEN 1 END) AS "$p"""")
      .mkString(",\n  ")
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |  $cols
       |FROM orders
       |GROUP BY year(o_orderdate)""".stripMargin
  }

  /** TPC-H Q18 shape (large-volume orders): a HAVING-filtered
    * aggregate used as the driving side of the join. The classic SQL
    * spells this as `o_orderkey IN (SELECT … HAVING SUM(qty) > t)` and
    * then re-aggregates lineitem a second time; here the having-agg IS
    * the quantity result, so lineitem is scanned ONCE — the semi-join
    * and the re-aggregation collapse into the same keyed agg. The
    * survivor set (~1% of orders) then inner-joins orders and customer
    * on their keys, and the top-k is TakeOrderedAndProject with a
    * fully deterministic (totalprice DESC, orderdate, orderkey) order —
    * never a global sort. Quantity sums route through DECIMAL
    * (order-independent) with the VARCHAR round-trip twin. */
  def largeVolumeOrders(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      threshold: Int = 250, k: Int = 100): DataFrame = {
    val big = lineitem
      .groupBy(col("l_orderkey").as("bigkey"))
      .agg(sum(col("l_quantity").cast(Dec)).as("qdec"))
      .filter(col("qdec") > lit(threshold))
    orders.join(big, col("o_orderkey") === col("bigkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(
        col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("qdec").cast("string").cast("double").as("sum_qty"))
      .orderBy(
        col("o_totalprice").desc, col("o_orderdate").asc,
        col("o_orderkey").asc)
      .limit(k)
  }

  def largeVolumeOrdersSql(threshold: Int = 250, k: Int = 100): String =
    s"""WITH big AS (
       |  SELECT l_orderkey AS bigkey,
       |    SUM(CAST(l_quantity AS DECIMAL(28,6))) AS qdec
       |  FROM lineitem
       |  GROUP BY 1
       |  HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > $threshold)
       |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  CAST(CAST(qdec AS VARCHAR) AS DOUBLE) AS sum_qty
       |FROM big
       |JOIN orders ON o_orderkey = bigkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
       |LIMIT $k""".stripMargin

  /** TPC-H Q17 shape (small-quantity-order revenue): the classic
    * CORRELATED scalar subquery — "lineitems bought in quantities
    * under 20% of that part's average" — decorrelated into a per-part
    * aggregate joined back to the fact rows. The part filter is a
    * broadcast semi-join pruning the fact scan FIRST, so the per-part
    * average runs over the ~1/brand-count slice, not all of lineitem;
    * the avg relation is part-keyed (tiny — one row per filtered
    * part) and broadcasts back onto the same slice. Two passes over
    * the filtered slice, zero over the rest; at 100 TB the win is the
    * decorrelation — the naive correlated form re-scans lineitem per
    * part. Averages are the decimal sum over the count as one IEEE
    * division; the final revenue sum is decimal-routed. */
  def smallQtyRevenue(
      lineitem: DataFrame, part: DataFrame,
      brand: String = "Brand#4"): DataFrame = {
    val pp = part.filter(col("p_brand") === brand).select("p_partkey")
    val li = lineitem
      .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val av = li.groupBy("l_partkey")
      .agg((sum(col("l_quantity").cast(Dec)).cast("double") / count(lit(1)))
        .as("avg_qty"))
    li.join(broadcast(av), Seq("l_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        (sum(col("l_extendedprice").cast(Dec)).cast("double") / lit(7.0))
          .as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  def smallQtyRevenueSql(brand: String = "Brand#4"): String =
    s"""WITH pp AS (SELECT p_partkey FROM part WHERE p_brand = '$brand'),
       |li AS (
       |  SELECT l_partkey, l_quantity, l_extendedprice
       |  FROM lineitem JOIN pp ON l_partkey = p_partkey),
       |av AS (
       |  SELECT l_partkey,
       |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR)
       |      AS DOUBLE) / COUNT(*) AS avg_qty
       |  FROM li GROUP BY 1)
       |SELECT
       |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR)
       |    AS DOUBLE) / 7.0 AS avg_yearly,
       |  COUNT(*) AS n_small
       |FROM li JOIN av USING (l_partkey)
       |WHERE l_quantity < 0.2 * avg_qty""".stripMargin

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    * DOUBLE-correlated EXISTS / NOT EXISTS — for finished orders, a
    * supplier is "waiting-guilty" when its lineitem shipped late
    * (shipdate > orderdate + lateDays; the synthetic schema has no
    * receipt/commit dates), SOME other supplier shares the order, and
    * NO other supplier on the order was also late. Decorrelated to one
    * semi join + one anti join over the deduped (order, supplier) pair
    * relation — all three legs shuffle on l_orderkey (the same key),
    * so AQE plans them over one exchange family; the naive form
    * re-scans lineitem twice per outer row. Counting (order, supplier)
    * pairs needs no distinct-agg: the pair relation is already unique. */
  def waitingSuppliers(
      lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
      lateDays: Int = 60, k: Int = 100): DataFrame = {
    val o = orders.filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val pairs = lineitem
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS")).as("late"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("late")).as("late"))
    val late = pairs.filter(col("late")).select("l_orderkey", "l_suppkey")
    val others = pairs.select(
      col("l_orderkey").as("o_orderkey2"), col("l_suppkey").as("o_suppkey2"),
      col("late").as("o_late2"))
    val guilty = late
      .join(others,
        col("l_orderkey") === col("o_orderkey2")
          && col("l_suppkey") =!= col("o_suppkey2"),
        "left_semi")
      .join(others.filter(col("o_late2")),
        col("l_orderkey") === col("o_orderkey2")
          && col("l_suppkey") =!= col("o_suppkey2"),
        "left_anti")
    guilty
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc).limit(k)
  }

  def waitingSuppliersSql(lateDays: Int = 60, k: Int = 100): String =
    s"""WITH o AS (SELECT o_orderkey, o_orderdate FROM orders
       |  WHERE o_orderstatus = 'F'),
       |pairs AS (
       |  SELECT l_orderkey, l_suppkey,
       |    MAX(l_shipdate > o_orderdate + INTERVAL $lateDays DAY) AS late
       |  FROM lineitem JOIN o ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |late AS (SELECT l_orderkey, l_suppkey FROM pairs WHERE late),
       |guilty AS (
       |  SELECT l.l_orderkey, l.l_suppkey FROM late l
       |  WHERE EXISTS (SELECT 1 FROM pairs p
       |          WHERE p.l_orderkey = l.l_orderkey
       |            AND p.l_suppkey <> l.l_suppkey)
       |    AND NOT EXISTS (SELECT 1 FROM pairs p
       |          WHERE p.l_orderkey = l.l_orderkey
       |            AND p.l_suppkey <> l.l_suppkey AND p.late))
       |SELECT s_name, numwait FROM (
       |  SELECT s.s_name, COUNT(*) AS numwait,
       |    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, s.s_name ASC) AS rn
       |  FROM guilty g JOIN supplier s ON g.l_suppkey = s.s_suppkey
       |  GROUP BY s.s_name) t WHERE rn <= $k""".stripMargin

  /** TPC-H Q22 shape (dormant sales opportunity): customers with
    * above-average positive balance and NO ORDERS SINCE `cutoff` — a
    * scalar aggregate subquery (one decimal-routed global avg,
    * broadcast as a 1-row frame) plus an anti join on o_custkey,
    * grouped by market segment (the synthetic schema has no phone
    * country codes, and every customer has SOME order, so the classic
    * no-orders-ever predicate is vacuous here — recency keeps the
    * anti join selective and meaningful). The anti join's build side
    * is date-filtered BEFORE the join, so the pushed o_orderdate
    * predicate prunes the orders scan; the avg is computed on the
    * positive slice only, exactly as Q22's cntrycode-filtered avg. */
  /** Pareto / ABC analysis over customer revenue: rank customers by
    * total order value, classify by cumulative revenue share — A up to
    * 80 %, B up to 95 %, C the tail (the classic inventory/account
    * segmentation). The running total is [[Prefix.runningSum]] (range
    * repartition + per-partition fold + broadcast offsets), NOT an
    * unpartitioned window — the classification never funnels the
    * customer relation through one partition.
    *
    * Exactness: revenue accumulates as integer CENTS (round(·100) of
    * the 2-decimal totalprice is exact), the running sum is integral
    * (reassociation-safe), and the 80/95 cuts compare cum·100 ≤ tot·80
    * in DECIMAL(38,0)/HUGEINT — no float enters the classification. */
  def paretoAbc(orders: DataFrame): DataFrame = {
    val Dec38 = DecimalType(38, 0)
    val rev = orders.groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val tot = rev.agg(sum(col("cents").cast(Dec38)).as("tot"))
    val cum = Prefix.runningSum(rev,
      Seq(col("cents").desc, col("o_custkey").asc), col("cents"), "cum")
    cum.crossJoin(broadcast(tot))
      .select(col("o_custkey"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        col("cum").as("cum_cents"),
        when(col("cum").cast(Dec38) * 100 <= col("tot") * 80, "A")
          .when(col("cum").cast(Dec38) * 100 <= col("tot") * 95, "B")
          .otherwise("C").as("abc_class"))
  }

  def paretoAbcSql: String =
    s"""WITH rev AS (SELECT o_custkey,
       |    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
       |  FROM orders GROUP BY 1),
       |tot AS (SELECT SUM(CAST(cents AS HUGEINT)) AS tot FROM rev),
       |cum AS (SELECT o_custkey, cents,
       |    CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey)
       |      AS BIGINT) AS cum
       |  FROM rev)
       |SELECT o_custkey,
       |  CAST(cents AS DOUBLE) / CAST(100.0 AS DOUBLE) AS revenue,
       |  cum AS cum_cents,
       |  CASE WHEN CAST(cum AS HUGEINT) * 100 <= tot * 80 THEN 'A'
       |       WHEN CAST(cum AS HUGEINT) * 100 <= tot * 95 THEN 'B'
       |       ELSE 'C' END AS abc_class
       |FROM cum, tot""".stripMargin

  /** Gini coefficient of customer revenue concentration — the summary
    * number behind the Pareto/ABC curve (0 = perfectly equal, →1 = one
    * customer is the whole book). Computed by the exact rank formula
    * G = (2·Σ rank·x) / (n·Σx) − (n+1)/n over cents-integer revenues
    * ranked ascending (ties broken by custkey — the formula is
    * tie-order-invariant because equal x contribute symmetric rank
    * sums, and the fixed tiebreak keeps both engines identical anyway).
    * Every Σ is exact DECIMAL/HUGEINT; rank comes from the
    * range-partitioned prefix fold; the final G is one IEEE expression
    * of exact integers. */
  def giniRevenue(orders: DataFrame): DataFrame = {
    val Dec38 = DecimalType(38, 0)
    val rev = orders.groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val ranked = Prefix.runningSum(rev,
      Seq(col("cents").asc, col("o_custkey").asc), lit(1L), "rk")
    def dbl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("string").cast("double")
    val st = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("cents").cast(Dec38)).as("sx"),
      sum(col("rk").cast(Dec38) * col("cents").cast(Dec38)).as("srx"))
    st.select(col("n").as("n_customers"),
      (dbl(col("sx")) / lit(100.0)).as("total_revenue"),
      (dbl(lit(2).cast(Dec38) * col("srx")) /
        dbl(col("n").cast(Dec38) * col("sx")) -
        (col("n") + 1).cast("double") / col("n")).as("gini"))
  }

  def giniRevenueSql: String =
    s"""WITH rev AS (SELECT o_custkey,
       |    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
       |  FROM orders GROUP BY 1),
       |rk AS (SELECT cents,
       |    ROW_NUMBER() OVER (ORDER BY cents ASC, o_custkey ASC) AS rk
       |  FROM rev),
       |st AS (SELECT COUNT(*) AS n,
       |    SUM(CAST(cents AS HUGEINT)) AS sx,
       |    SUM(CAST(rk AS HUGEINT) * CAST(cents AS HUGEINT)) AS srx
       |  FROM rk)
       |SELECT CAST(n AS BIGINT) AS n_customers,
       |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) / 100.0 AS total_revenue,
       |  CAST(CAST(2 * srx AS VARCHAR) AS DOUBLE) /
       |    CAST(CAST(CAST(n AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) -
       |    CAST(n + 1 AS DOUBLE) / n AS gini
       |FROM st""".stripMargin

  /** RFM customer segmentation: per-customer Recency (last order
    * date), Frequency (order count), Monetary (total cents), each
    * scored 1–5 by exact rank quintile — the standard CRM segmentation
    * (5-5-5 = best customers). Ranks come from THREE chained
    * [[Prefix.runningSum]] folds of the constant 1 over the
    * customer-sized aggregate (one range exchange per metric order,
    * never a SinglePartition ROW_NUMBER); the quintile is the pure
    * integer map ((rank−1)·5) div n + 1, identical in both engines —
    * no NTILE remainder semantics to cross-check. Monetary stays on
    * the exact cents grid until the final display division. */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val base = orders.groupBy(col("o_custkey")).agg(
      max(col("o_orderdate")).as("last_dt"),
      count(lit(1)).as("freq"),
      sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val n = base.agg(count(lit(1)).as("n"))
    val ranked = Prefix.runningSum(
      Prefix.runningSum(
        Prefix.runningSum(base,
          Seq(col("last_dt").asc, col("o_custkey").asc), lit(1L), "rk_r"),
        Seq(col("freq").asc, col("o_custkey").asc), lit(1L), "rk_f"),
      Seq(col("cents").asc, col("o_custkey").asc), lit(1L), "rk_m")
    def score(rk: String): org.apache.spark.sql.Column =
      (expr(s"(($rk - 1) * 5) div n") + 1).cast("int")
    ranked.crossJoin(broadcast(n))
      .select(col("o_custkey"), col("freq"),
        (col("cents").cast("double") / lit(100.0)).as("monetary"),
        score("rk_r").as("r_score"), score("rk_f").as("f_score"),
        score("rk_m").as("m_score"),
        (score("rk_r") * 100 + score("rk_f") * 10 + score("rk_m"))
          .as("rfm"))
  }

  def rfmSegmentsSql: String =
    s"""WITH base AS (SELECT o_custkey, MAX(o_orderdate) AS last_dt,
       |    COUNT(*) AS freq,
       |    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
       |  FROM orders GROUP BY 1),
       |nn AS (SELECT COUNT(*) AS n FROM base),
       |rk AS (SELECT o_custkey, freq, cents,
       |    ROW_NUMBER() OVER (ORDER BY last_dt ASC, o_custkey ASC) AS rk_r,
       |    ROW_NUMBER() OVER (ORDER BY freq ASC, o_custkey ASC) AS rk_f,
       |    ROW_NUMBER() OVER (ORDER BY cents ASC, o_custkey ASC) AS rk_m
       |  FROM base)
       |SELECT o_custkey, freq,
       |  CAST(cents AS DOUBLE) / CAST(100.0 AS DOUBLE) AS monetary,
       |  CAST(((rk_r - 1) * 5) // n + 1 AS INT) AS r_score,
       |  CAST(((rk_f - 1) * 5) // n + 1 AS INT) AS f_score,
       |  CAST(((rk_m - 1) * 5) // n + 1 AS INT) AS m_score,
       |  CAST((((rk_r - 1) * 5) // n + 1) * 100 +
       |       (((rk_f - 1) * 5) // n + 1) * 10 +
       |       (((rk_m - 1) * 5) // n + 1) AS INT) AS rfm
       |FROM rk, nn""".stripMargin

  def debtorSegments(
      customer: DataFrame, orders: DataFrame,
      cutoff: String = "2000-07-01"): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast(Dec)).cast("double") / count(lit(1)))
        .as("avg_bal"))
    customer
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(orders.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(Dec)).cast("double").as("totacctbal"))
  }

  def debtorSegmentsSql(cutoff: String = "2000-07-01"): String =
    s"""WITH ab AS (
       |  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS VARCHAR)
       |    AS DOUBLE) / COUNT(*) AS avg_bal
       |  FROM customer WHERE c_acctbal > 0.0)
       |SELECT c_mktsegment, COUNT(*) AS numcust,
       |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS VARCHAR)
       |    AS DOUBLE) AS totacctbal
       |FROM customer, ab
       |WHERE c_acctbal > ab.avg_bal
       |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey
       |                  AND o.o_orderdate >= TIMESTAMP '$cutoff 00:00:00')
       |GROUP BY c_mktsegment""".stripMargin

  def starRevenueSql(year: Int = 1995): String =
    s"""SELECT n.n_name AS nation,
       |  CAST(CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
       |    AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_lineitems
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |WHERE o.o_orderdate >= TIMESTAMP '$year-01-01 00:00:00'
       |  AND o.o_orderdate < TIMESTAMP '${year + 1}-01-01 00:00:00'
       |GROUP BY n.n_name""".stripMargin

  /** 2-D skyline (Pareto frontier, maximizing both axes) of the points
    * relation — the multi-criteria shortlist operator ("no other point
    * is at least as good on both axes and better on one"). Sort-free
    * formulation: a point (x, y) is dominated iff some point with
    * strictly greater x reaches y' ≥ y OR an equal-x point has greater
    * y — so group to the per-distinct-x max y, take the running max
    * over x DESC excluding the current x, and keep vertices whose y
    * strictly beats it. No self-join, no quadratic dominance test.
    *
    * Scale: the per-x max is one map-side-combinable agg; the running
    * max over the DISTINCT-x relation goes through [[Prefix.runningMax]]
    * (range-partition x, per-partition fold, broadcast per-partition
    * maxima as offsets), so even a fully continuous axis — distinct-x
    * ≈ every row — never funnels into a single-partition window. */
  def skyline(points: DataFrame): DataFrame = {
    val g = points.groupBy("x").agg(max("y").as("y"))
    // strict-prefix max over x DESC through the distributed two-pass
    // fold — distinct x is data-sized for continuous axes, so no
    // unpartitioned window here
    Prefix.runningMax(g, Seq(col("x").desc), col("y"),
        "pre", inclusive = false)
      .filter(col("pre").isNull || col("y") > col("pre"))
      .select(col("x"), col("y"))
  }

  def skylineSql(pointsBody: String): String =
    s"""WITH pts AS ($pointsBody),
       |g AS (SELECT x, MAX(y) AS y FROM pts GROUP BY x),
       |r AS (SELECT x, y, MAX(y) OVER (ORDER BY x DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pre
       |  FROM g)
       |SELECT x, y FROM r WHERE pre IS NULL OR y > pre""".stripMargin
}
