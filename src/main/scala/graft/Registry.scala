package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One registered operator: the Spark plan plus (when SQL-expressible) the
  * DuckDB oracle the driver replays for the correctness gate.
  */
final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

/** Shared numeric-determinism helpers.
  *
  * The correctness gate hash-compares our parquet output against DuckDB
  * output, so floating aggregates must be *bit*-reproducible across two
  * engines and any partitioning. Strategy: scalar double arithmetic is
  * IEEE-deterministic (same bits both sides), but SUM order is not — so
  * every sum first casts its (deterministic) double operand to a decimal,
  * sums exactly (order-free), and only then casts back to double.
  */
object Det {
  val D = DecimalType(28, 6)
  /** Order-insensitive, engine-exact sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")
  /** SQL twin of [[dsum]]. */
  def dsumSql(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"
  /** Deterministic mean: exact decimal sum / count, rounded. */
  def davg(c: Column): Column = round(sum(c.cast(D)).cast("double") / count(lit(1)), 4)
  def davgSql(e: String): String =
    s"ROUND(CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4)"
}
