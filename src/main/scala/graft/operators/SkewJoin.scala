package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for keyed joins (SURVEY.md §5).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; this
  * operator is the explicit fallback for the cases AQE can't see (e.g.
  * a hot key known in advance, or a broadcast-ineligible dimension):
  * the big side gets a per-row salt appended to the key, the small side
  * is replicated across all salts, and the join runs on the widened
  * key — one hot key becomes `salts` evenly-sized keys. The salt
  * assignment varies run to run; the result SET never does.
  */
object SkewJoin {

  /** Inner-join `big ⋈ small` on `key`, spreading each big-side key over
    * `salts` shuffle partitions. The salt is a per-row counter (not a
    * row-content hash: byte-identical duplicate rows of a hot key would
    * all hash to ONE salt and the straggler would survive salting).
    * The result SET is identical to the plain join either way.
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val bigSalted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val smallExploded = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(smallExploded,
      bigSalted(key) === smallExploded(key) && bigSalted("__salt") === smallExploded("__salt"))
      .drop("__salt").drop(smallExploded(key))
  }
}
