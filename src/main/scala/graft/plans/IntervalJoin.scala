package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Point-in-interval join as a first-class plan node: inner join of a
  * point side (`point` ∈ [lo, hi]) against an interval side, equi-keyed
  * on `leftKeys`/`rightKeys`.
  *
  * Spark's native plan for this shape is an equi-join on the keys with
  * the BETWEEN as a post-join filter — inside each key group that is a
  * CROSS PRODUCT (SMJ emits every same-key pair, then filters), O(n·m)
  * per key. This node replaces the per-key product with a sort-merge
  * interval SWEEP: both sides arrive clustered on the keys (the same
  * single exchange each the equi-join would plan) and sorted by
  * (keys, point) / (keys, lo); a min-heap on `hi` holds only the
  * intervals that can still match as the point cursor advances. Per key
  * group the cost is O(n + m + |matches|) plus the heap's log factor —
  * output-sensitive, not quadratic, and the memory high-water is the
  * max SIMULTANEOUSLY-OPEN intervals per key, not the key group size.
  *
  * NULL semantics match the SQL predicate: a NULL point, lo, or hi
  * compares UNKNOWN → the row joins nothing and is skipped.
  */
case class IntervalJoin(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        point: Expression, lo: Expression, hi: Expression,
                        left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "interval join needs matching (non-empty) equi-key lists")
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): IntervalJoin =
    copy(left = l, right = r)
}

object IntervalJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(lk, rk, p, lo, hi, l, r) =>
      IntervalJoinExec(lk, rk, p, lo, hi, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                            point: Expression, lo: Expression, hi: Expression,
                            left: SparkPlan, right: SparkPlan) extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the same pair of clustered distributions SortMergeJoin would demand:
  // EnsureRequirements co-partitions both sides on the key hash
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys.map(org.apache.spark.sql.GraftSqlShim.normalizeFloats)) ::
      ClusteredDistribution(rightKeys.map(org.apache.spark.sql.GraftSqlShim.normalizeFloats)) :: Nil

  // sorts are planted by EnsureRequirements too — the sweep just streams
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(point, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(lo, Ascending))

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): IntervalJoinExec =
    copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val pExpr = point
    val loExpr = lo
    val hiExpr = hi
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter0, rIter0) =>
      val lKeyProj = UnsafeProjection.create(lKeys.map(org.apache.spark.sql.GraftSqlShim.normalizeFloats), leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys.map(org.apache.spark.sql.GraftSqlShim.normalizeFloats), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val pEval = BindReferences.bindReference(pExpr, leftOut)
      val loEval = BindReferences.bindReference(loExpr, rightOut)
      val hiEval = BindReferences.bindReference(hiExpr, rightOut)
      // point/lo/hi share one comparable type by construction (the API
      // casts); natural ascending ordering over single-value rows
      val vOrd = RowOrdering.createNaturalAscendingOrdering(Seq(pExpr.dataType))
      val vRowA = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val vRowB = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      def cmpV(a: Any, b: Any): Int = { vRowA.update(0, a); vRowB.update(0, b); vOrd.compare(vRowA, vRowB) }

      val lIter = lIter0.buffered
      val rIter = rIter0.buffered
      val resultProj = UnsafeProjection.create(allOut.map(a => a: Expression), allOut)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // (interval hi, right row) min-heap on hi — open intervals only
        private val active = new java.util.PriorityQueue[(Any, InternalRow)](
          11, new java.util.Comparator[(Any, InternalRow)] {
            override def compare(a: (Any, InternalRow), b: (Any, InternalRow)): Int = cmpV(a._1, b._1)
          })
        private var activeSnapshot: Iterator[InternalRow] = Iterator.empty
        private var curLeft: InternalRow = _
        // right rows of the CURRENT key group not yet opened, sorted by lo
        private var pendingRights: Array[InternalRow] = Array.empty
        private var pendingLos: Array[Any] = Array.empty
        private var pendingIdx = 0
        private var curKey: InternalRow = _

        private def loadRightGroup(key: InternalRow): Unit = {
          val buf = scala.collection.mutable.ArrayBuffer[InternalRow]()
          val losBuf = scala.collection.mutable.ArrayBuffer[Any]()
          while (rIter.hasNext && keyOrd.compare(rKeyProj(rIter.head), key) == 0) {
            val r = rIter.next().copy()
            val loV = loEval.eval(r)
            val hiV = hiEval.eval(r)
            if (loV != null && hiV != null) { buf += r; losBuf += loV }
          }
          pendingRights = buf.toArray
          pendingLos = losBuf.toArray
          pendingIdx = 0
          active.clear()
        }

        /** Advance until a left row with a non-empty active set is found. */
        private def findNext(): Boolean = {
          while (!activeSnapshot.hasNext) {
            if (!lIter.hasNext) return false
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            if (curKey == null || keyOrd.compare(lKey, curKey) != 0) {
              // new left key group: drop right rows for smaller keys,
              // then load the matching right group (if any)
              curKey = lKey.copy()
              while (rIter.hasNext && keyOrd.compare(rKeyProj(rIter.head), curKey) < 0) rIter.next()
              loadRightGroup(curKey)
            }
            val pV = pEval.eval(lRow)
            if (pV != null && (pendingRights.nonEmpty || !active.isEmpty)) {
              // open intervals whose lo <= point
              while (pendingIdx < pendingRights.length && cmpV(pendingLos(pendingIdx), pV) <= 0) {
                val r = pendingRights(pendingIdx)
                active.add((hiEval.eval(r), r))
                pendingIdx += 1
              }
              // close intervals whose hi < point
              while (!active.isEmpty && cmpV(active.peek()._1, pV) < 0) active.poll()
              if (!active.isEmpty) {
                curLeft = lRow.copy()
                val snap = new Array[InternalRow](active.size)
                val it = active.iterator()
                var i = 0
                while (it.hasNext) { snap(i) = it.next()._2; i += 1 }
                activeSnapshot = snap.iterator
              }
            }
          }
          true
        }

        override def hasNext: Boolean = (activeSnapshot.hasNext) || findNext()
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          resultProj(joined(curLeft, activeSnapshot.next()))
        }
      }
    }
  }
}
