package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix (running) aggregates over a totally-ordered
  * relation — the scale-safe replacement for an unpartitioned
  * `Window.orderBy(...)`, which Spark plans as a SINGLE partition
  * holding every row (the `WindowExec: No Partition Defined` warning).
  * That is fine when the windowed relation is constant-bounded (a
  * top-k, a calendar of days, a fixed histogram) and a serial
  * bottleneck when it is data-sized (a vocabulary, a distinct-score
  * relation, a distinct-x axis).
  *
  * Classic two-pass parallel scan, kept inside the DataFrame API:
  *
  *   1. range-repartition by the order key and stamp each row with its
  *      physical partition id — partition ids are monotone in key
  *      order by construction of range partitioning;
  *   2. run the running aggregate WITHIN each partition
  *      (`Window.partitionBy(pid)` — every partition folds in
  *      parallel), and eagerly `localCheckpoint` the slim stamped
  *      relation so the offset pass below reads the SAME physical
  *      partitioning it was stamped under (no re-sample of range
  *      boundaries, no AQE re-coalesce between two reads);
  *   3. fold one total per partition (a |partitions|-row relation),
  *      prefix it with a window over pid — bounded by the shuffle
  *      partition count, never the data — and broadcast-join the
  *      per-partition offsets back.
  *
  * The combine step is a pure reassociation, so results are identical
  * to the single-partition window for associative folds over exact
  * types: integral/decimal sums and min/max of any orderable type.
  * Floating-point SUMS are NOT supported (reassociating a double sum
  * changes bits with the partition layout) and rejected loudly.
  *
  * Like the single-window form, a deterministic result needs the order
  * key to be a total order (unique per row) — both forms leave the
  * intra-tie fold order to the engine.
  */
object Prefix {

  /** Running sum of `value` over `order`, emitted as column `out`.
    * `inclusive = false` gives the strict-prefix sum (NULL on the
    * globally first row, matching `rowsBetween(unboundedPreceding,
    * -1)`). `value` must be integral or decimal — exact under
    * reassociation. */
  def runningSum(df: DataFrame, order: Seq[Column], value: Column,
      out: String, inclusive: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types._
    val dt = df.select(value.as("__v")).schema.head.dataType
    val exact = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }
    require(exact,
      s"Prefix.runningSum needs an exact (integral/decimal) value " +
        s"type, got $dt — a reassociated float sum would depend on " +
        "the partition layout")
    running(df, order, value, out, inclusive, isSum = true)
  }

  /** Running max of `value` over `order`, emitted as column `out`.
    * Safe for any orderable type (max is associative as-is). */
  def runningMax(df: DataFrame, order: Seq[Column], value: Column,
      out: String, inclusive: Boolean = true): DataFrame =
    running(df, order, value, out, inclusive, isSum = false)

  private def running(df: DataFrame, order: Seq[Column], value: Column,
      out: String, inclusive: Boolean, isSum: Boolean): DataFrame = {
    val pid = "__prefix_pid"
    val loc = "__prefix_loc"
    val off = "__prefix_off"
    def fold(c: Column): Column = if (isSum) sum(c) else max(c)
    val lo = Window.unboundedPreceding
    val hi = if (inclusive) Window.currentRow else -1L
    val frame =
      Window.partitionBy(col(pid)).orderBy(order: _*).rowsBetween(lo, hi)
    // Eager checkpoint: one materialization of the (key, value, pid,
    // local) relation — both the offset fold and the final combine
    // read the exact partition layout the pids were stamped under.
    val stamped = df
      .withColumn("__prefix_v", value)
      .repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
      .withColumn(loc, fold(col("__prefix_v")).over(frame))
      .localCheckpoint(true)
    // strict-prefix fold over partition totals: NULL for the first
    // partition, so first-row semantics match the single-window form
    val offW = Window.orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = stamped.groupBy(col(pid))
      .agg(fold(col("__prefix_v")).as("__prefix_tot"))
      .withColumn(off, fold(col("__prefix_tot")).over(offW))
      .select(col(pid), col(off))
    val combined =
      if (isSum)
        when(col(loc).isNull && col(off).isNull, lit(null))
          .otherwise(coalesce(col(loc), lit(0)) + coalesce(col(off), lit(0)))
      else greatest(col(loc), col(off))
    stamped.join(broadcast(offsets), Seq(pid))
      .withColumn(out, combined)
      .drop(pid, loc, off, "__prefix_v")
  }
}
