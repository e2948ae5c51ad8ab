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
  /** Order-insensitive, engine-exact sum of a double expression.
    *
    * CAVEAT (measured, round 6): the double→decimal cast itself is only
    * engine-identical for "tame" doubles — raw data values with few
    * significant decimals. For COMPUTED doubles with long decimal tails,
    * Spark rounds HALF_UP on the shortest decimal string
    * (BigDecimal.valueOf) while DuckDB rounds the exact binary value, and
    * shortest-representation exact-halves (…x5) diverge — the same
    * hazard class as `round()` (see [[qz]]). When summing computed
    * products, quantize to integer micro-units with floor arithmetic
    * first (pure double ops, identical bits everywhere) and sum longs —
    * see s17_ewma for the pattern.
    */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")
  /** SQL twin of [[dsum]]. */
  def dsumSql(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"
  /** Engine-stable quantization to `scale` decimals. Spark's `round`
    * detours through BigDecimal.valueOf(double) — the *decimal string* —
    * while DuckDB rounds the raw binary, so exact-half shortest
    * representations (…x5) disagree. floor(x·10^s + 0.5)/10^s is pure
    * IEEE double arithmetic: identical bits on every engine.
    */
  def qz(c: Column, scale: Int = 4): Column = {
    val m = math.pow(10, scale)
    floor(c * m + 0.5) / m
  }
  def qzSql(e: String, scale: Int = 4): String = {
    val m = s"1e$scale"
    s"FLOOR(($e) * $m + 0.5) / $m"
  }
  /** Deterministic mean: exact decimal sum / count, quantized. */
  def davg(c: Column): Column = qz(sum(c.cast(D)).cast("double") / count(lit(1)))
  def davgSql(e: String): String =
    qzSql(s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)")
}
