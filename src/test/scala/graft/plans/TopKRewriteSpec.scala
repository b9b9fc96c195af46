package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graft.{TopKPerKey, TopKPerKeyExec, WindowToTopKRule}

/** The optimizer-rule box of the extension path: with
  * WindowToTopKRule installed, an existing Window+rn<=k query plans
  * through the bounded-heap operator with identical rows; without it
  * (or when the rank survives the projection) the Window stays. */
class TopKRewriteSpec extends SparkSpec {

  private def events = spark.read
    .parquet("/root/testdata/sf0.001/events.parquet")
    .select("event_type", "event_id", "value")

  private def windowTop3 = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id").asc)
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
  }

  private def withRule[A](f: => A): A = {
    TopKPerKey.installRewrite(spark)
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == WindowToTopKRule)
  }

  test("rewrites Window+rn<=k into the heap operator with identical rows") {
    val want = windowTop3.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    withRule {
      val df = windowTop3
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect {
        case t: org.apache.spark.sql.graft.TopKPerKeyLogical => t
      }.nonEmpty, "rule did not fire:\n" + plan)
      val got = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want)
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("Window"), "Window survived:\n" + phys)
    }
  }

  test("does not fire when the rank column is still referenced") {
    withRule {
      val w = Window.partitionBy("event_type")
        .orderBy(col("value").desc, col("event_id").asc)
      val df = events.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3) // rn kept in output
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect {
        case t: org.apache.spark.sql.graft.TopKPerKeyLogical => t
      }.isEmpty, "rule must not drop a referenced rank:\n" + plan)
      assert(df.columns.contains("rn"))
    }
  }

  test("without the rule the Window plan is unchanged") {
    val phys = windowTop3.queryExecution.executedPlan.toString
    assert(phys.contains("Window"), phys)
  }
}
