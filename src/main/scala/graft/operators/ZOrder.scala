package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for the sink layer: interleaving the bits
  * of several filter columns gives one sort key whose ranges are compact
  * in EVERY interleaved dimension — so file/row-group min-max stats can
  * skip data for predicates on any of them, not just the first sort
  * column. This is the standard lakehouse layout trick, built here from
  * plain bit-arithmetic expressions (codegen'd, no UDF).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of each column (non-negative
    * integral inputs; callers with arbitrary domains should rank or
    * bucket first). Bit b of column i lands at position b·n + i.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits * cols.length <= 63, "z-value must fit a long")
    val n = cols.length
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(1L), b * n + i)
    terms.reduce((a, x) => a.bitwiseOR(x))
  }

  /** Range-partition and sort by the z-value, then write: each output
    * file covers a compact z-range ⇒ compact ranges in every clustered
    * dimension ⇒ min-max skipping works for all of them.
    */
  def writeClustered(df: DataFrame, path: String, format: String,
                     zCols: Seq[String], bits: Int = 16,
                     numFiles: Int = 0): DataFrame = {
    val withZ = df.withColumn("__z", zValue(zCols.map(col), bits))
    val parts = if (numFiles > 0) withZ.repartitionByRange(numFiles, col("__z"))
                else withZ.repartitionByRange(col("__z"))
    parts.sortWithinPartitions(col("__z")).drop("__z")
      .write.mode("overwrite").format(format).save(path)
    df.sparkSession.read.format(format).load(path)
  }
}
