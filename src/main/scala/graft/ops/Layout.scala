package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: space-filling-curve (Z-order/Morton) codes
  * for multi-dimensional clustering of the storage layout. Sorting or
  * range-partitioning a table by its Morton code co-locates rows that
  * are close in BOTH dimensions, so 2-D predicates (x ranges AND y
  * ranges) prune file-level min/max statistics instead of scanning —
  * the standard lakehouse layout trick for multi-column filters, and at
  * 100 TB the difference between touching ~√s of the files and all of
  * them for a box query.
  *
  * The code itself is pure integer bit math over `+ - << >> &` —
  * bit-identical in any engine, so the whole operator sits under the
  * hash-exact oracle gate (points_zorder). The physical layout step is
  * `writeZOrdered` (repartitionByRange on the code + in-partition
  * sort); ZOrderSpec pins the locality property (adjacent codes are
  * spatially adjacent cells).
  */
object Layout {

  /** Bits per dimension; 16 → 32-bit Morton codes in a BIGINT. */
  val Bits = 16

  /** Quantize a double in [0, domain) to a Bits-bit grid cell —
    * saturating at the edges so out-of-domain values land in the
    * boundary cells rather than wrapping. */
  def quantize(c: Column, domain: Double): Column =
    least(greatest(floor(c / domain * (1 << Bits)), lit(0L)),
      lit((1L << Bits) - 1))

  def quantizeSql(expr: String, domain: Double): String =
    s"LEAST(GREATEST(CAST(FLOOR($expr / $domain * ${1 << Bits}) AS BIGINT), 0), ${(1L << Bits) - 1})"

  /** Interleave the bits of two quantized cells: x bits land in odd
    * positions, y bits in even — the classic Morton/Z curve. A fixed
    * Bits-term sum of shift/mask ops, entirely inside codegen. */
  def morton(qx: Column, qy: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  def mortonSql(qx: String, qy: String): String =
    (0 until Bits).map { i =>
      s"((($qx >> $i) & 1) << ${2 * i + 1}) + ((($qy >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  /** The shared points relation with its Z-order address:
    * (pid, qx, qy, zorder). Domain matches the testdata coordinate
    * range; zero shuffle — the code is a projection. */
  def pointsZOrder(points: DataFrame, domain: Double = 110000.0): DataFrame = {
    val qx = quantize(col("x"), domain)
    val qy = quantize(col("y"), domain)
    points.select(col("pid"), qx.as("qx"), qy.as("qy"),
      morton(qx, qy).as("zorder"))
  }

  def pointsZOrderSql(domain: Double = 110000.0): String = {
    val qx = quantizeSql("x", domain)
    val qy = quantizeSql("y", domain)
    s"""SELECT pid, $qx AS qx, $qy AS qy,
       |  ${mortonSql(s"($qx)", s"($qy)")} AS zorder
       |FROM pts""".stripMargin
  }

  /** Physically cluster a relation by Z-order: range-partition on the
    * code (one shuffle — each output file owns a contiguous curve
    * segment) and sort within partitions so file/row-group min-max
    * stats on x and y are tight. `numFiles` sizes the output; callers
    * write the result with their own sink. */
  def zOrdered(points: DataFrame, numFiles: Int,
      domain: Double = 110000.0): DataFrame =
    pointsZOrder(points, domain)
      .repartitionByRange(numFiles, col("zorder"))
      .sortWithinPartitions("zorder")
}
