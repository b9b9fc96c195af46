package graft.ops

import graft.SparkSpec

class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("corr matrix: planted perfect/anti/zero correlations, constant → NULL") {
    // y = 2x (r = 1), z = -x (r = -1), w constant (degenerate → NULL)
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0),
      (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0),
      (4.0, 8.0, -4.0, 5.0)
    ).toDF("x", "y", "z", "w")
    val m = StatsOps.corrMatrix(df, Seq("x", "y", "z", "w")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(m.size == 6)
    assert(m(("x", "y")) == ((4L, Some(1.0))))
    assert(m(("x", "z")) == ((4L, Some(-1.0))))
    assert(m(("y", "z")) == ((4L, Some(-1.0))))
    // every pair against the constant column is degenerate
    assert(m(("x", "w"))._2.isEmpty && m(("y", "w"))._2.isEmpty
      && m(("z", "w"))._2.isEmpty)
  }

  test("corr matrix is one scan: a single aggregate, no join, no shuffle of rows") {
    val df = Seq((1.0, 2.0), (3.0, 4.0)).toDF("x", "y")
    val plan = StatsOps.corrMatrix(df, Seq("x", "y"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // exactly one aggregate pair (partial + final) over the input
    assert("HashAggregate".r.findAllIn(plan).size <= 2, plan)
  }
}
