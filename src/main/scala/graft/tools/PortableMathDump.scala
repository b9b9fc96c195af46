package graft.tools

/** JVM half of the PortableMath cross-engine parity sweep (r12 verdict
  * item 2 — pin the oracle environment). Writes a CSV of
  * (x, raw-bits of plog(x), raw-bits of pexp(-x)) over a dense sweep of
  * the domains the oracle twins actually exercise, plus the exact SQL
  * expression strings the twins inline, so
  * `tools/portable_math_parity.py` can evaluate the SQL in whatever
  * DuckDB version is installed and compare BITS — a 0-mismatch
  * artifact proves the portable-math contract holds under that exact
  * DuckDB, independent of any query. No Spark session needed: the
  * Column path is pinned bit-equal to the scalar path in
  * PortableMathSpec; this sweeps the scalar.
  *
  * Usage: runMain graft.tools.PortableMathDump <outDir>
  */
object PortableMathDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/pmparity")
    new java.io.File(outDir).mkdirs()
    import graft.functions.PortableMath
    val w = new java.io.PrintWriter(s"$outDir/jvm_values.csv")
    w.println("x,plog_bits,pexp_neg_bits")
    // plog domain: [1, 1e12] (idf ratios, NB weight ratios, softplus's
    // [1,2] core); pexp domain: [-700, 0] via -x. Deterministic dense
    // grid: geometric over the plog range + linear over the exp range,
    // seeded-LCG jitter so grid points aren't all "round" doubles.
    var lcg = 0x5DEECE66DL
    def jitter(): Double = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      ((lcg >>> 11).toDouble / (1L << 53).toDouble)
    }
    val xs = Iterator.iterate(1.0)(_ * 1.003).takeWhile(_ <= 1.0e12)
      .map(x => x * (1.0 + jitter() * 2.0e-3)).filter(_ >= 1.0)
    var n = 0
    xs.foreach { x =>
      val lp = java.lang.Double.doubleToRawLongBits(PortableMath.plogDouble(x))
      val xe = -(x % 700.0)
      val ep = java.lang.Double.doubleToRawLongBits(PortableMath.pexpDouble(xe))
      w.println(s"$x,$lp,$ep")
      n += 1
    }
    w.close()
    val sqlW = new java.io.PrintWriter(s"$outDir/sql_exprs.json")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    sqlW.println(
      s"""{"plog":"${esc(PortableMath.plogSql("x"))}",""" +
        s""""pexp_neg":"${esc(PortableMath.pexpSql("0.0 - (x % 700.0)"))}"}""")
    sqlW.close()
    println(s"PMDUMP $n rows -> $outDir")
  }
}
