package graft.operators

import graft.plans.GroupedTopK
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}

/** Grouped top-k through the custom plan node ([[graft.plans.GroupedTopK]]):
  * the k best rows per key WITHOUT sorting whole partitions — bounded
  * heaps behind one keyed exchange. Use where the window(row_number)
  * shape would sort (and potentially spill) n rows to keep k·groups.
  */
object TopK {

  /** Keep the `k` best rows per `keys` group under `order`
    * ((column, ascending) pairs, evaluated in sequence). `order` must be
    * total — include an id tiebreak — for deterministic output.
    */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
             k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(n: String) = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name).mkString(", ")}"))
    val g = keys.map(attr)
    val o = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftSqlShim.ofRows(df.sparkSession, GroupedTopK(g, o, k, plan))
  }
}
