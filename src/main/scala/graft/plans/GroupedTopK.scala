package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Grouped top-k as a first-class plan node (the full custom-operator
  * tier: LogicalPlan + Strategy + SparkPlan, injected via
  * [[GraftExtensions]]).
  *
  * Spark's native shape for "k best rows per group" is
  * window(row_number) + filter, which SORTS every partition —
  * O(n log n) per partition and a full sort buffer even though only
  * k·groups rows survive. This operator keeps a bounded heap per group:
  * O(n log k) compares, O(groups·k) memory, same single keyed exchange
  * (`requiredChildDistribution` = clustered on the group columns, so
  * EnsureRequirements plans exactly the shuffle the window would need).
  * At warehouse scale the difference is the sort spill: heaps never
  * spill because their size is bounded by construction.
  *
  * `ordering` must be a TOTAL order (add id tiebreaks) for
  * deterministic results — same contract as every ranked operator here.
  */
case class GroupedTopK(groupCols: Seq[Expression], ordering: Seq[SortOrder],
                       k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  require(groupCols.nonEmpty,
    "grouped top-k needs group columns; use orderBy().limit() (TakeOrderedAndProject) for the global case")
  require(ordering.nonEmpty, "grouped top-k needs an ordering")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): GroupedTopK =
    copy(child = c)
}

/** Planner strategy: partial (map-side) pass + final pass behind the
  * keyed exchange — the two-phase shape hash aggregation uses, valid
  * here because top-k is distributive (the global k best of a group are
  * contained in the union of each partition's k best). The partial pass
  * cuts what the exchange carries from n rows to
  * partitions × groups-per-partition × k.
  */
object GroupedTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, child) =>
      GroupedTopKExec(g, o, k,
        GroupedTopKExec(g, o, k, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap per-group top-k. Rows stream once; each group
  * holds at most k+1 buffered rows (a reversed-order binary heap whose
  * root is the current worst survivor). Output rows are emitted in
  * `ordering` order within each group.
  *
  * Memory: O(distinct groups in partition × k) — the same residency
  * class as a hash aggregate over the group keys, minus sort buffers.
  * (HashAggregate can spill its map; this node does not — for extreme
  * group cardinality × k budgets, fall back to the window shape.)
  */
case class GroupedTopKExec(groupCols: Seq[Expression], ordering: Seq[SortOrder],
                           k: Int, child: SparkPlan,
                           partial: Boolean = false) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  // The partial pass runs on whatever partitioning the child has (pure
  // map-side pre-cut); only the final pass demands co-located groups,
  // so EnsureRequirements plans exactly one exchange between the two.
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
     else ClusteredDistribution(groupCols)) :: Nil
  override protected def withNewChildInternal(c: SparkPlan): GroupedTopKExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupExprs = groupCols
    val sortOrder = ordering
    val childOutput = child.output
    // Group keys compare as raw UnsafeRow bytes, so -0.0 vs 0.0 (and NaN
    // bit patterns) must be normalized exactly as the built-in Aggregate
    // path does — NormalizeFloatingNumbers runs only for built-in nodes,
    // not custom plans.
    val normalizedKeys = groupExprs.map(
      org.apache.spark.sql.GraftSqlShim.normalizeFloats)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(normalizedKeys, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = -ord.compare(a, b)
      }
      val heaps = new java.util.LinkedHashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) { // beats current worst
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.iterator.asScala.flatMap { heap =>
        val rows = new Array[InternalRow](heap.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // heap pops worst-first
        rows.iterator
      }
    }, preservesPartitioning = true)
  }
}
