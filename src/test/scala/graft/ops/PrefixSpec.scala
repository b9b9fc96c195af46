package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Pins the distributed two-pass prefix fold to the single-partition
  * window it replaces: identical values for sum/max × inclusive/strict
  * × asc/desc, invariance to the input partition layout, and the plan
  * property the helper exists for — no data-sized unpartitioned
  * WindowExec (the only empty-partitionSpec window left is the one
  * over the |partitions|-row offsets relation). */
class PrefixSpec extends SparkSpec {

  import spark.implicits._

  /** 0..n-1 scrambled by the bijection id*37 mod n (gcd(37,n)=1 for the
    * sizes used) — unique order key as both forms require; value =
    * id*7 % 13 (longs, repeats). */
  private def fixture(n: Int, parts: Int): DataFrame =
    spark.range(0, n, 1, parts)
      .select(pmod(col("id") * 37, lit(n.toLong)).as("k"),
        (col("id") * 7 % 13).as("v"))

  private def serial(df: DataFrame, agg: String, inclusive: Boolean,
      desc: Boolean): DataFrame = {
    val ord = if (desc) col("k").desc else col("k").asc
    val hi = if (inclusive) Window.currentRow else -1L
    val w = Window.orderBy(ord).rowsBetween(Window.unboundedPreceding, hi)
    val f = if (agg == "sum") sum(col("v")) else max(col("v"))
    df.withColumn("out", f.over(w))
  }

  private def dist(df: DataFrame, agg: String, inclusive: Boolean,
      desc: Boolean): DataFrame = {
    val ord = if (desc) col("k").desc else col("k").asc
    if (agg == "sum")
      Prefix.runningSum(df, Seq(ord), col("v"), "out", inclusive)
    else
      Prefix.runningMax(df, Seq(ord), col("v"), "out", inclusive)
  }

  private def rows(df: DataFrame): Seq[(Long, Option[Long])] =
    df.select(col("k"), col("out")).as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq

  for (agg <- Seq("sum", "max"); inclusive <- Seq(true, false);
       desc <- Seq(false, true))
    test(s"$agg inclusive=$inclusive desc=$desc matches the serial window") {
      val df = fixture(500, 7)
      assert(rows(dist(df, agg, inclusive, desc))
        === rows(serial(df, agg, inclusive, desc)))
    }

  test("result is invariant to the input partition layout") {
    val a = rows(dist(fixture(500, 1), "sum", true, false))
    val b = rows(dist(fixture(500, 13), "sum", true, false))
    assert(a === b && a.nonEmpty)
  }

  test("strict prefix is NULL on the globally first row only") {
    val out = rows(dist(fixture(300, 5), "sum", false, false))
    assert(out.head._2.isEmpty)
    assert(out.tail.forall(_._2.nonEmpty))
  }

  test("null values fold like the serial window (skipped, not zeroed)") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(2L)), (4L, None))
      .toDF("k", "v")
    assert(rows(dist(df, "sum", true, false))
      === rows(serial(df, "sum", true, false)))
    assert(rows(dist(df, "max", false, false))
      === rows(serial(df, "max", false, false)))
  }

  test("float sums are rejected loudly") {
    val df = Seq((1L, 1.5)).toDF("k", "v")
    val e = intercept[IllegalArgumentException](
      Prefix.runningSum(df, Seq(col("k")), col("v"), "out"))
    assert(e.getMessage.contains("exact"))
    // max of doubles is associative and allowed
    Prefix.runningMax(df, Seq(col("k")), col("v"), "out").collect()
  }

  test("no data-sized unpartitioned WindowExec in the final plan") {
    // the per-row fold runs partitioned-by-pid inside the eagerly
    // checkpointed subtree; the only unpartitioned window downstream
    // is over the per-partition totals relation — |shuffle partitions|
    // rows, bounded by config, not by data
    val plan = dist(fixture(500, 7), "sum", true, false)
      .queryExecution.executedPlan
    val global = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(global.size <= 1)
  }
}
