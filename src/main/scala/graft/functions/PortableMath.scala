package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic elementary math — cross-engine bit-reproducible
  * `ln` for score formulas that must hash-match an external oracle.
  *
  * IEEE 754 requires `+ - * /` and `sqrt` to be correctly rounded, so a
  * fixed expression tree over them yields identical bits on every
  * compliant engine. libm transcendentals carry no such guarantee:
  * Spark's `log()` is `java.lang.StrictMath.log` (fdlibm) while DuckDB
  * calls the platform libm — measured on this host they disagree by
  * 1 ulp on 844 of 11 100 inputs across the BM25/tf-idf idf domain
  * (`graft.tools.LnCheck`). Any raw-`ln` ranking score would therefore
  * fail a hash-exact cross-engine compare on ~8% of distinct df values.
  *
  * `plog(x)`, for x ≥ 1, uses only correctly-rounded ops:
  *
  *   y = x^(1/64)  — six chained `sqrt`s (range reduction)
  *   t = (y-1)/(y+1),  u = t·t
  *   ln(y) = 2·atanh(t) ≈ 2·t·(1 + u/3 + u²/5 + … + u⁸/17)  (Horner)
  *   plog(x) = 128·(t·horner(u))
  *
  * For x ≤ 1e12, y ≤ 1.55 and t ≤ 0.216, so the truncated series term
  * u⁹/19 < 5e-14; accuracy vs true ln: relative error ≲ 1e-12 away
  * from 1, absolute error < 5e-14 as x → 1 (where ln → 0 and relative
  * error is unboundedly amplified by the ~1e-14-scale sqrt/multiply
  * rounding floor); asserted against `StrictMath.log` in
  * PortableMathSpec. The Spark `Column` tree and
  * the DuckDB SQL string are generated from the same coefficient list
  * with the same association order, so both engines evaluate the
  * identical arithmetic DAG — equal inputs produce equal bits.
  *
  * Cost: 6 sqrt + ~20 mul/add per value — trivially codegen'd; callers
  * apply it to aggregated relations (one row per distinct df), never
  * per raw token.
  */
object PortableMath {

  /** Odd-reciprocal atanh coefficients 1, 1/3, …, 1/17 as exact JVM
    * doubles; the SQL side re-emits these bits via shortest-round-trip
    * decimal strings. */
  private val coeffs: Seq[Double] = (0 to 8).map(k => 1.0 / (2 * k + 1))

  /** Shortest decimal string that round-trips to the same double —
    * DuckDB's literal parser is round-to-nearest, so the parsed value
    * is bit-identical to the JVM constant. */
  private def dlit(d: Double): String = {
    val s = java.lang.Double.toString(d)
    // DuckDB reads 1.0E-4 fine, but keep plain form stable
    s
  }

  /** Portable ln over a double column; domain x ≥ 1 (callers feed idf
    * ratios ≥ 1). NaN/negative inputs are the caller's bug.
    *
    * Implemented as the single scalar [[plogDouble]] behind a custom
    * codegen expression, NOT as an inline Column tree: the Column DSL
    * duplicates shared subterms structurally (y appears twice in t,
    * t twice in u, u eight times in the Horner chain → ~34 copies of
    * the argument subtree per call), which blew multi-term scorers
    * (QL/BM25 over 10 probe terms ⇒ ~14k-line generated methods) past
    * janino's compiler and forced interpreted fallback. The scalar
    * call evaluates the IDENTICAL correctly-rounded op sequence —
    * same bits — in constant-size generated code
    * ([[graft.functions.PortableMathSpec]] pins tree ≡ scalar). */
  def plog(x: Column): Column =
    org.apache.spark.sql.graft.VecBridge.column(
      org.apache.spark.sql.graft.PLog(
        org.apache.spark.sql.graft.VecBridge.expression(x)))

  /** The Column-tree form of the same arithmetic — kept for the
    * bit-equivalence pin in PortableMathSpec. */
  private[graft] def plogColumnTree(x: Column): Column = {
    val y = sqrt(sqrt(sqrt(sqrt(sqrt(sqrt(x))))))
    val t = (y - lit(1.0)) / (y + lit(1.0))
    val u = t * t
    // Horner, innermost-first: h = c8; h = c_k + u*h
    val h = coeffs.reverse.tail.foldLeft(lit(coeffs.last): Column)(
      (acc, c) => lit(c) + u * acc)
    lit(128.0) * (t * h)
  }

  /** Scalar twin of the tree: six correctly-rounded sqrts, the atanh
    * transform, and the same innermost-first Horner over the same
    * constants in the same association order. Java double semantics
    * forbid FMA contraction, so JIT cannot perturb the bits. */
  def plogDouble(x: Double): Double = {
    val y = Math.sqrt(Math.sqrt(Math.sqrt(Math.sqrt(Math.sqrt(Math.sqrt(x))))))
    val t = (y - 1.0) / (y + 1.0)
    val u = t * t
    var h = coeffs.last
    var k = coeffs.length - 2
    while (k >= 0) { h = coeffs(k) + u * h; k -= 1 }
    128.0 * (t * h)
  }

  /** DuckDB twin of [[plog]] — the same tree, same association order,
    * same double constants. `expr` must be a DOUBLE-typed SQL expression
    * (the caller casts); it is referenced multiple times, so pass a
    * column reference, not an expensive subexpression. */
  def plogSql(expr: String): String = {
    val y = s"SQRT(SQRT(SQRT(SQRT(SQRT(SQRT($expr))))))"
    // bind y and t once via a nested sub-select? plogSql is used inside
    // scalar projections — duplicate the tree textually instead: DuckDB
    // CSE handles the repetition, and bit-equality only needs identical
    // structure per occurrence.
    val t = s"(($y) - 1.0) / (($y) + 1.0)"
    val u = s"(($t) * ($t))"
    val h = coeffs.reverse.tail.foldLeft(dlit(coeffs.last))(
      (acc, c) => s"(${dlit(c)} + $u * ($acc))")
    s"(128.0 * (($t) * ($h)))"
  }
}
