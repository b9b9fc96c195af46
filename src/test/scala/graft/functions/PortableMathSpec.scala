package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Portable-ln accuracy + determinism. Cross-engine bit-parity itself is
  * carried by the oracle gate (text_tfidf / text_bm25_topk hash-match
  * DuckDB through the driver); here we pin the JVM-side contract:
  * accuracy vs StrictMath.log and bitwise stability across plans. */
class PortableMathSpec extends SparkSpec {

  test("plog matches StrictMath.log to 1e-12 relative over the idf domain") {
    import spark.implicits._
    // idf ratios for N up to 5001 plus round powers up to the 1e12
    // documented domain edge
    val xs = ((1 to 5001).map(df => 5002.0 / df) ++
      Seq(1.0, 1.5, 2.0, 10.0, 1e3, 1e6, 1e9, 1e12)).distinct
    val rows = xs.toDF("x")
      .select(col("x"), PortableMath.plog(col("x")).as("p"))
      .collect()
    rows.foreach { r =>
      val x = r.getDouble(0); val p = r.getDouble(1)
      val ref = StrictMath.log(x)
      // near x=1 the RELATIVE error is unboundedly amplified (ln → 0
      // while the six sqrt roundings keep ~1e-14-scale ABSOLUTE error),
      // so the contract is combined: tight absolute near 1, tight
      // relative elsewhere
      val abs = math.abs(p - ref)
      val err = if (ref == 0.0) abs else abs / math.abs(ref)
      assert(abs < 5e-14 || err < 1e-12,
        s"plog($x)=$p vs ln=$ref rel-err $err")
    }
    // exact at 1: the series is identically 0
    val at1 = Seq(1.0).toDF("x").select(PortableMath.plog(col("x")))
      .collect()(0).getDouble(0)
    assert(at1 == 0.0)
  }

  test("plog is bitwise stable across partitionings (pure projection)") {
    import spark.implicits._
    val xs = (1 to 997).map(df => 998.0 / df)
    def bits(parts: Int): Seq[Long] =
      xs.toDF("x").repartition(parts)
        .select(col("x"), PortableMath.plog(col("x")).as("p"))
        .collect().sortBy(_.getDouble(0))
        .map(r => java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toSeq
    assert(bits(1) == bits(7))
  }

  test("scalar PLog expression is bit-identical to the Column tree") {
    import spark.implicits._
    // the codegen'd scalar call must reproduce the documented tree's
    // bits exactly — same sqrt chain, same Horner order (this is what
    // keeps every oracle that hash-matched the tree still green)
    val xs = ((1 to 5001).map(df => 5002.0 / df) ++
      Seq(1.0, 1.0000001, 1.5, 7.0, 1e3, 1e6, 1e9, 1e12)).distinct
    val rows = xs.toDF("x")
      .select(PortableMath.plog(col("x")).as("a"),
        PortableMath.plogColumnTree(col("x")).as("b"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
    // and the scalar (interpreted/eval) path agrees with the DF result
    // bit-for-bit on a spot grid:
    val grid = Seq(1.0, 1.0000001, 1.5, 7.0, 998.0 / 3, 1e6, 1e12)
    val viaDf = grid.toDF("x")
      .select(col("x"), PortableMath.plog(col("x")).as("p")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    grid.foreach { x =>
      assert(java.lang.Double.doubleToRawLongBits(PortableMath.plogDouble(x)) ==
        java.lang.Double.doubleToRawLongBits(viaDf(x)))
    }
  }

  test("plogSql emits the same coefficient doubles the Column tree uses") {
    // the SQL twin must carry every odd-reciprocal coefficient as a
    // shortest-round-trip literal; spot the three that are inexact
    val sql = PortableMath.plogSql("x")
    for (k <- 1 to 8) {
      val c = 1.0 / (2 * k + 1)
      assert(sql.contains(java.lang.Double.toString(c)), s"missing coeff 1/${2 * k + 1}")
    }
    assert(sql.contains("SQRT(SQRT(SQRT(SQRT(SQRT(SQRT(x))))))"))
  }
}
