package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{StringFingerprint, TextStats, VecDot, VecSqDist}

/** SQL-surface registration of the native vector expressions, two ways:
  *
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (injected at session build);
  *  - programmatic: `GraftExtensions.register(spark)` on a live session.
  *
  * After either, `SELECT vec_dot(a, b)` / `vec_sqdist(a, b)` work in
  * `spark.sql(...)` and `expr(...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // whole-operator extension: per-key top-k bounded-heap operator
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKPerKeyStrategy)
  }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot expects 2 arguments")
        VecDot(args(0), args(1))
      }),
    ("vec_sqdist",
      new ExpressionInfo(classOf[VecSqDist].getName, "vec_sqdist"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_sqdist expects 2 arguments")
        VecSqDist(args(0), args(1))
      }),
    ("doc_fingerprint",
      new ExpressionInfo(classOf[StringFingerprint].getName, "doc_fingerprint"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "doc_fingerprint expects 1 argument")
        StringFingerprint(args(0))
      }),
    ("text_stats",
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      (args: Seq[Expression]) => {
        // text_stats(text, stop1, stop2, ...) — stopwords must be
        // string literals (folded at registration, not per row)
        require(args.nonEmpty, "text_stats expects at least 1 argument")
        val stops = args.tail.map { e =>
          require(e.foldable, "text_stats stopwords must be literals")
          String.valueOf(e.eval())
        }
        TextStats(args.head, stops)
      }))

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
