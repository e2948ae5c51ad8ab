package graft.operators

import graft.plans.IntervalJoin
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Point-in-interval join through the custom plan node
  * ([[graft.plans.IntervalJoin]]): `left.point ∈ [right.lo, right.hi]`
  * with an equi-key prefix, executed as a per-key sort-merge sweep
  * instead of the per-key cross product Spark plans for this shape.
  *
  * Column names must be disjoint enough to make the output unambiguous
  * (rename before joining, as with any join). Left and right must be
  * STRUCTURALLY DISTINCT plans (for a raw self-join, alias one side
  * through a projection) — the node does not run the analyzer's
  * self-join attribute dedup.
  */
object RangeJoin {

  def pointInInterval(left: DataFrame, right: DataFrame,
                      keys: Seq[(String, String)],
                      point: String, lo: String, hi: String): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    require(attr(lp, point).dataType == attr(rp, lo).dataType &&
      attr(lp, point).dataType == attr(rp, hi).dataType,
      s"point/lo/hi must share one type (cast before joining)")
    val node = IntervalJoin(
      keys.map(k => attr(lp, k._1)), keys.map(k => attr(rp, k._2)),
      attr(lp, point), attr(rp, lo), attr(rp, hi), lp, rp)
    GraftSqlShim.ofRows(left.sparkSession, node)
  }
}
