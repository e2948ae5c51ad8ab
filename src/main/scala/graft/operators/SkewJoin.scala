package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for keyed joins (SURVEY.md §5).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; this
  * operator is the explicit fallback for the cases AQE can't see (e.g.
  * a hot key known in advance, or a broadcast-ineligible dimension):
  * the big side gets a deterministic per-row salt appended to the key,
  * the small side is replicated across all salts, and the join runs on
  * the widened key — one hot key becomes `salts` evenly-sized keys.
  */
object SkewJoin {

  /** Inner-join `big ⋈ small` on `key`, spreading each big-side key over
    * `salts` shuffle partitions. Row-deterministic salt (hash of the
    * whole big row) keeps results reproducible run to run.
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts)).cast("int"))
    val smallExploded = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(smallExploded,
      bigSalted(key) === smallExploded(key) && bigSalted("__salt") === smallExploded("__salt"))
      .drop("__salt").drop(smallExploded(key))
  }
}
