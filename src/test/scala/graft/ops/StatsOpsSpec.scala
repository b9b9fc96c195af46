package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("chi-square: 0 under exact independence, n under perfect association") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // independent 2x2: every cell 25 -> chi2 = 0, dof = 1
    val ind = (for { a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 25 }
      yield (a, b)).toDF("a", "b")
    val r1 = StatsOps.chiSquare(ind, col("a"), col("b")).collect()(0)
    assert(r1.getDouble(0) == 0.0 && r1.getLong(1) == 1L && r1.getLong(2) == 100L)
    // perfectly associated diagonal 2x2 -> chi2 = n
    val dep = (Seq.fill(30)(("x", "u")) ++ Seq.fill(30)(("y", "v")))
      .toDF("a", "b")
    val r2 = StatsOps.chiSquare(dep, col("a"), col("b")).collect()(0)
    assert(math.abs(r2.getDouble(0) - 60.0) < 1e-6, s"chi2 ${r2.getDouble(0)}")
    // absent cells (O=0, E>0) must contribute — dropping them would
    // give chi2 = 2n instead... actually verify against hand value:
    // diagonal table E=15 per cell; off-diagonal O=0 terms contribute
    // (0-15)^2/15 = 15 each; diagonal (30-15)^2/15 = 15 each -> 60 = n
    assert(r2.getLong(1) == 1L)
  }

  test("exact AUC: separation 1.0, inversion 0.0, all-tied 0.5, hand-computed ties") {
    import org.apache.spark.sql.functions.col
    def auc(rows: Seq[(Int, Boolean)]): (Long, Long, Long, Double) = {
      val r = StatsOps.aucExact(rows.toDF("s", "y"), col("s"), col("y"))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    // perfect separation: every pos above every neg
    assert(auc(Seq((5, true), (4, true), (2, false), (1, false)))
      == ((2L, 2L, 8L, 1.0)))
    // perfect inversion
    assert(auc(Seq((1, true), (2, true), (4, false), (5, false)))
      == ((2L, 2L, 0L, 0.0)))
    // one score for everything: all pairs tie at 1/2
    assert(auc(Seq((3, true), (3, true), (3, false), (3, false)))
      == ((2L, 2L, 4L, 0.5)))
    // hand case: pos at {3, 2}, neg at {2, 1} — pairs: 3>2 win, 3>1
    // win, 2=2 half, 2>1 win → U = 3.5, AUC = 3.5/4
    assert(auc(Seq((3, true), (2, true), (2, false), (1, false)))
      == ((2L, 2L, 7L, 0.875)))
  }

  test("benford: digits from the cents grid, absent digits at n=0, masses sum to 1") {
    import org.apache.spark.sql.functions.col
    // first significant digits: 1.23→1, 0.05→5, 950.0→9, 12000.5→1
    val df = Seq(1.23, 0.05, 950.0, 12000.5).toDF("x")
    val got = StatsOps.benford(df, col("x")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(got.keySet == (1L to 9L).toSet)
    assert(got(1L)._1 == 2L && got(5L)._1 == 1L && got(9L)._1 == 1L)
    assert(got(2L)._1 == 0L)
    // Benford masses are a probability distribution
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-12)
    // and decrease monotonically in the digit
    val ps = (1L to 9L).map(d => got(d)._2)
    assert(ps.zip(ps.tail).forall { case (a, b) => a > b })
  }

  test("exact AUC windows the distinct-score relation, not raw rows") {
    import org.apache.spark.sql.functions.col
    val df = (1 to 100).map(i => (i % 7, i % 3 == 0)).toDF("s", "y")
    val plan = StatsOps.aucExact(df, col("s"), col("y"))
      .queryExecution.optimizedPlan.toString
    // the window's child must already be the groupBy(score) aggregate
    // (7 rows here), never the raw input
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("Aggregate", winIdx)
    assert(winIdx >= 0 && aggIdx > winIdx, plan)
  }

  test("welch t-test matches hand algebra; degenerate cohorts yield NULL") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0))
      .toDF("c", "v")
    val r = StatsOps.welchTTest(df, col("v"), col("c"), "a", "b").collect()(0)
    assert(r.getAs[Long]("n1") == 3 && r.getAs[Long]("n2") == 2)
    assert(r.getAs[Double]("mean_a") == 2.0 && r.getAs[Double]("mean_b") == 3.0)
    // varA=1, varB=2 -> se2=1/3+1 -> t=-1/sqrt(4/3); df=(4/3)^2/((1/3)^2/2+1)
    assert(math.abs(r.getAs[Double]("t_stat") - (-1.0 / math.sqrt(4.0 / 3.0))) < 1e-12)
    assert(math.abs(r.getAs[Double]("df") - (16.0 / 9.0) / (1.0 / 18.0 + 1.0)) < 1e-12)
    // a singleton cohort cannot have a variance -> NULL t/df, means intact
    val s1 = StatsOps.welchTTest(df.filter(col("v") =!= 4.0), col("v"), col("c"), "a", "b")
      .collect()(0)
    assert(s1.isNullAt(s1.fieldIndex("t_stat")) && s1.isNullAt(s1.fieldIndex("df")))
    assert(s1.getAs[Double]("mean_b") == 2.0)
  }

  test("pr curve: hand-computed thresholds, zero-TP prefix yields NULL F1") {
    import spark.implicits._
    // scores desc: 0.9(neg) 0.8(pos) 0.5(pos) 0.1(neg); P = 2
    val df = Seq((0.9, false), (0.8, true), (0.5, true), (0.1, false))
      .toDF("s", "y")
    val rows = StatsOps.prCurve(df, col("s"), col("y")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("prec"), r.getAs[Double]("rec")))
      .sortBy(-_._1)
    assert(rows.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq((0.9, 0L, 1L), (0.8, 1L, 1L), (0.5, 2L, 1L), (0.1, 2L, 2L)))
    assert(rows(2)._4 == 2.0 / 3.0 && rows(2)._5 == 1.0)
    // the all-negative prefix has tp=0 -> NULL f1, precision 0
    val first = StatsOps.prCurve(df, col("s"), col("y"))
      .filter(col("threshold") === 0.9).collect()(0)
    assert(first.isNullAt(first.fieldIndex("f1")))
    assert(first.getAs[Double]("prec") == 0.0)
  }

  test("conformal: rank-9-of-9 threshold and exact held-out coverage") {
    import spark.implicits._
    // 9 calibration docs (doc_id%4==1) with s = margin = 1..9 (is_en
    // false -> s = +margin); rank ceil(10*0.9) = 9 -> qhat = 9.0
    val cal = (0 until 9).map(i => (4L * i + 1, (i + 1).toDouble, false))
    // 4 eval docs with s = 3, 9, 9.5, 20 -> 3 and 9 are covered: 2/4
    val ev = Seq((3L, 3.0, false), (7L, 9.0, false),
      (11L, 9.5, false), (15L, 20.0, false))
    val scored = (cal ++ ev).toDF("doc_id", "margin", "is_en")
    val r = StatsOps.conformal(scored).collect()(0)
    assert(r.getAs[Long]("n_cal") == 9 && r.getAs[Long]("n_eval") == 4)
    assert(r.getAs[Double]("qhat") == 9.0)
    assert(r.getAs[Double]("coverage") == 0.5)
    // is_en flips the score sign: margin 9 with is_en=true scores -9
    val flipped = StatsOps.conformal(
      scored.withColumn("is_en",
        org.apache.spark.sql.functions.lit(true))).collect()(0)
    assert(flipped.getAs[Double]("qhat") == -1.0)
  }
}
