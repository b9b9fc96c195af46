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

  test("pexp matches StrictMath.exp to 1e-15 relative on [-700, 0]") {
    // dense near 0 (sigmoid's hot region) plus the deep tail
    val xs = (0 to 7000).map(i => -i / 10.0) ++
      (1 to 999).map(i => -i / 1000.0)
    xs.foreach { x =>
      val p = PortableMath.pexpDouble(x)
      val ref = StrictMath.exp(x)
      val err = math.abs(p - ref) / ref
      assert(err < 1e-15, s"pexp($x)=$p vs exp=$ref rel-err $err")
    }
    assert(PortableMath.pexpDouble(0.0) == 1.0)
  }

  test("scalar PExp column evaluates bit-identically to pexpDouble") {
    import spark.implicits._
    val xs = (0 to 997).map(i => -i * 0.7)
    val viaDf = xs.toDF("x")
      .select(col("x"), PortableMath.pexp(col("x")).as("p")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    xs.foreach { x =>
      assert(java.lang.Double.doubleToRawLongBits(PortableMath.pexpDouble(x)) ==
        java.lang.Double.doubleToRawLongBits(viaDf(x)))
    }
  }

  test("psigmoid is a stable, symmetric probability; psoftplus has plog in [1,2]") {
    import spark.implicits._
    val ms = Seq(-600.0, -40.0, -2.5, -1e-9, 0.0, 1e-9, 2.5, 40.0, 600.0)
    val rows = ms.toDF("m").select(col("m"),
      PortableMath.psigmoid(col("m")).as("p"),
      PortableMath.psoftplus(col("m")).as("sp")).collect()
      .map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    ms.foreach { m =>
      val (p, sp) = rows(m)
      assert(p >= 0.0 && p <= 1.0)
      val refP = 1.0 / (1.0 + StrictMath.exp(-m))
      assert(math.abs(p - refP) <= 1e-15 * math.max(refP, 1e-300), s"sigmoid($m)")
      // softplus = -ln(sigmoid(-m)); compare against the stable ref.
      // the 1 + e^-|z| sum collapses addends below ulp(1)/2, so the
      // contract is combined: ~1e-16 absolute floor OR tight relative
      val refSp =
        math.max(m, 0.0) + StrictMath.log1p(StrictMath.exp(-math.abs(m)))
      val abs = math.abs(sp - refSp)
      assert(abs <= 1.2e-16 || abs <= 1e-12 * refSp,
        s"softplus($m) $sp vs $refSp")
    }
    // exact midpoint
    assert(rows(0.0)._1 == 0.5)
  }
}
