package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BlockingOperatorWithCodegen, CodegenSupport, SparkPlan, UnaryExecNode}

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
                           partial: Boolean = false)
    extends UnaryExecNode with BlockingOperatorWithCodegen {
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

  // Group keys compare as raw UnsafeRow bytes, so -0.0 vs 0.0 (and NaN
  // bit patterns) must be normalized exactly as the built-in Aggregate
  // path does — NormalizeFloatingNumbers runs only for built-in nodes,
  // not custom plans.
  private def normalizedKeys = groupCols.map(
    org.apache.spark.sql.GraftSqlShim.normalizeFloats)

  /** Per-partition heap state, created from generated code and from
    * [[doExecute]] — one instance per partition, so the non-thread-safe
    * projection/ordering instances are never shared.
    */
  def createBuffer(): GroupedTopKBuffer =
    new GroupedTopKBuffer(
      UnsafeProjection.create(normalizedKeys, child.output),
      RowOrdering.create(ordering, child.output), k)

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ iter =>
      val buf = createBuffer()
      iter.foreach(buf.insert)
      import scala.jdk.CollectionConverters._
      buf.drain().asScala
    }, preservesPartitioning = true)

  // --- whole-stage codegen (SortExec's blocking-operator shape) ---------
  //
  // The scan→filter→project pipeline below this node fuses INTO it:
  // doConsume appends each produced row to the bounded heaps, and
  // doProduce — after the child loop is exhausted — streams the
  // survivors to the parent. Two wins over the interpreted path: the
  // child pipeline keeps its fused single-pass shape (no iterator
  // boundary at this node's input), and per-row virtual calls collapse
  // to one insert() on a final class.
  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  private var bufferTerm: String = _

  override protected def doProduce(ctx: CodegenContext): String = {
    val needBuild = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "topkNeedBuild",
      v => s"$v = true;")
    val thisPlan = ctx.addReferenceObj("plan", this)
    bufferTerm = ctx.addMutableState(classOf[GroupedTopKBuffer].getName, "topkBuffer",
      v => s"$v = $thisPlan.createBuffer();", forceInline = true)
    val iterTerm = ctx.addMutableState("java.util.Iterator<org.apache.spark.sql.catalyst.InternalRow>",
      "topkOutput", forceInline = true)
    val addToBuffer = ctx.freshName("addToTopK")
    val addToBufferFunc = ctx.addNewFunction(addToBuffer,
      s"""
         |private void $addToBuffer() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin.trim)
    val outputRow = ctx.freshName("topkRow")
    s"""
       |if ($needBuild) {
       |  $addToBufferFunc();
       |  $iterTerm = $bufferTerm.drain();
       |  $needBuild = false;
       |}
       |while ($limitNotReachedCond $iterTerm.hasNext()) {
       |  UnsafeRow $outputRow = (UnsafeRow) $iterTerm.next();
       |  ${consume(ctx, null, outputRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String =
    s"""
       |${row.code}
       |$bufferTerm.insert((InternalRow) ${row.value});
     """.stripMargin
}

/** Bounded per-group heaps shared by the interpreted and generated paths.
  * Each group holds at most k+1 buffered rows (a reversed-order binary
  * heap whose root is the current worst survivor); [[drain]] emits each
  * group's rows in `ordering` order. Memory is O(groups × k) by
  * construction — never spills, never sorts the full input.
  */
final class GroupedTopKBuffer(keyProj: UnsafeProjection,
                              ord: Ordering[InternalRow], k: Int) {
  private val worstFirst = new java.util.Comparator[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = -ord.compare(a, b)
  }
  private val heaps =
    new java.util.LinkedHashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()

  def insert(row: InternalRow): Unit = {
    val key = keyProj(row)
    var heap = heaps.get(key)
    if (heap == null) {
      heap = new java.util.PriorityQueue[InternalRow](k + 1, worstFirst)
      heaps.put(key.copy(), heap)
    }
    if (heap.size < k) heap.add(row.copy())
    else if (ord.compare(row, heap.peek()) < 0) { // beats current worst
      heap.poll()
      heap.add(row.copy())
    }
  }

  def drain(): java.util.Iterator[InternalRow] = {
    val out = new java.util.ArrayList[InternalRow]()
    val it = heaps.values.iterator()
    while (it.hasNext) {
      val heap = it.next()
      val rows = new Array[InternalRow](heap.size)
      var i = rows.length - 1
      while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // heap pops worst-first
      var j = 0
      while (j < rows.length) { out.add(rows(j)); j += 1 }
    }
    out.iterator()
  }
}
