package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (the brief's path (c): custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`): per-key top-k
  * WITHOUT a window — the query every Window+`rn <= k` formulation
  * over-pays for.
  *
  * The window plan sorts EVERY key group in full (O(n log n) per key,
  * all n rows through the sort and the rank projection) and only then
  * drops rows. This operator keeps a bounded k-row heap per key:
  *
  *   partial TopKPerKeyExec   (any partitioning — each input partition
  *                             reduces to ≤ k rows per key map-side,
  *                             the heap analog of a partial aggregate)
  *   → Exchange(keys)         (inserted by EnsureRequirements from the
  *                             final stage's required distribution;
  *                             carries ≤ k·partitions rows per key,
  *                             never the raw data)
  *   → final TopKPerKeyExec   (merges the partial heaps per key)
  *
  * O(n log k) comparisons, shuffle bytes bounded by k·partitions·keys
  * — at 100 TB the shuffle reduction IS the operator. Rows are emitted
  * in `order` within each key (deterministic given a TOTAL order —
  * callers must include a tiebreak column, exactly as with a window).
  *
  * Memory bound: each task holds k rows PER DISTINCT KEY seen in its
  * partition (the heaps), i.e. O(k · keys/partition) rows — the same
  * envelope as a hash aggregate over the key, and strictly less state
  * than the window formulation's per-group sort buffers. A key space
  * too large for that envelope should pre-partition by key (the final
  * stage's ClusteredDistribution already bounds it to keys/partition
  * after the exchange).
  */
case class TopKPerKeyLogical(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  require(k > 0, "k must be positive")
  // rankAttr (the 1-based within-key rank, LongType) is a constructor
  // parameter — NOT generated in `output` — so optimizer copies keep a
  // stable exprId and parent references never dangle.
  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyLogical =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan, partial: Boolean,
    rankAttr: Option[Attribute] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortExprs = order
    val limit = k
    val childOutput = child.output
    val emitRank = rankAttr.isDefined
    val outAttrs = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // identity projection: inputs are not guaranteed UnsafeRow after
      // every upstream operator, and stored rows must own their bytes
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ordering = GenerateOrdering.generate(sortExprs, childOutput)
      // heap root = WORST retained row (reverse ordering), so admission
      // is one compare against the root
      val heapCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          ordering.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(toUnsafe(row).copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(toUnsafe(row).copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[UnsafeRow]()
      // When the final stage carries a rank attribute, the heap drain IS
      // the rank computation: rows leave best-first, so position+1 within
      // the key is exactly row_number() — no Window, no Sort.
      val rankProj =
        if (emitRank) UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
        else null
      val joined =
        if (emitRank) new org.apache.spark.sql.catalyst.expressions.JoinedRow
        else null
      val rankRow =
        if (emitRank)
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        else null
      val it = heaps.values().iterator()
      while (it.hasNext) {
        val heap = it.next()
        val rows = new Array[UnsafeRow](heap.size)
        var i = rows.length - 1
        while (!heap.isEmpty) { rows(i) = heap.poll(); i -= 1 }
        if (!emitRank) out ++= rows // best-first within the key
        else {
          var r = 0
          while (r < rows.length) {
            rankRow.setLong(0, r + 1L)
            out += rankProj(joined(rows(r), rankRow)).copy()
            r += 1
          }
        }
      }
      out.iterator
    }
  }
}

/** Optimizer rule (the extension path's `Rule[LogicalPlan]` box):
  * rewrites the canonical rank-limit window shape
  *
  *   Project(p, Filter(rn <= k, Window(rn := row_number() OVER
  *     (PARTITION BY keys ORDER BY ord), keys, ord, child)))
  *
  * into `Project(p, TopKPerKeyLogical(keys, ord, k, child))` — the
  * bounded-heap operator replaces the full per-group sort + rank
  * entirely (Spark's own WindowGroupLimit only pre-filters; the Window
  * and its Sort still run). Deliberately conservative: exactly one
  * window expression, a bare row_number, a `rn <= lit` / `rn < lit`
  * filter, and a parent Project that drops rn (so nothing downstream
  * reads the rank). Opt-in via [[TopKPerKey.installRewrite]] or the
  * GraftExtensions config path. */
object WindowToTopKRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window}

  private def limitOf(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _))
      if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, _))
      if a.exprId == rn => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Filter(cond, w @ Window(
          Seq(a @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(partitionSpec, orderSpec, _)), _)),
          _, _, child, _)))
        if partitionSpec.nonEmpty &&
          limitOf(cond, a.exprId).exists(_ > 0) &&
          !projList.exists(_.references.exists(_.exprId == a.exprId)) =>
      // Spark's InferWindowGroupLimit may already have inserted its
      // pre-filter (with the Sort its physical form needs) below the
      // Window; the heap operator subsumes it, so unwrap.
      val realChild = child match {
        case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit =>
          wgl.child
        case other => other
      }
      Project(projList,
        TopKPerKeyLogical(partitionSpec, orderSpec,
          limitOf(cond, a.exprId).get, realChild))
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyLogical(keys, order, k, child, rankAttr) =>
      // rank is emitted only by the FINAL stage — partial heaps feed the
      // key exchange with plain child rows (a partial rank would be
      // meaningless across partitions and would widen the shuffle).
      val partial = TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, partial, partial = false, rankAttr) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Ensure the planner strategy is installed on this session
    * (idempotent; also injectable via GraftExtensions config). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy

  /** Opt-in: also rewrite existing Window+rn<=k plans through
    * [[WindowToTopKRule]] on this session (idempotent). */
  def installRewrite(spark: SparkSession): Unit = {
    install(spark)
    if (!spark.experimental.extraOptimizations.contains(WindowToTopKRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ WindowToTopKRule
  }

  /** Top `k` rows per distinct value of `keys` (column names),
    * best-first under `order` — each entry is (column name,
    * ascending?); the combined order must be TOTAL (include a
    * tiebreak) for deterministic results, exactly as with a window
    * rank. Names rather than Columns: the node's expressions must be
    * genuine catalyst UnresolvedAttributes for the analyzer to resolve
    * them inside a custom logical node (the sql-api Column wrapper is
    * neither resolvable there nor task-serializable). */
  def apply(df: DataFrame, keys: Seq[String],
      order: Seq[(String, Boolean)], k: Int,
      rankCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending}
    val spark = df.sparkSession
    install(spark)
    val orderExprs = order.map { case (name, asc) =>
      SortOrder(UnresolvedAttribute.quoted(name),
        if (asc) Ascending else Descending)
    }
    val rankAttr = rankCol.map(n =>
      AttributeReference(n, org.apache.spark.sql.types.LongType,
        nullable = false)())
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      TopKPerKeyLogical(keys.map(n => UnresolvedAttribute.quoted(n)),
        orderExprs, k,
        df.queryExecution.logical, rankAttr))
  }
}
