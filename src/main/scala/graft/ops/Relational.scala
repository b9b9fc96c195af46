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
}
