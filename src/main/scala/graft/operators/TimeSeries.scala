package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators (SURVEY.md §2.D): as-of join, sessionization,
  * resampling. All are single-shuffle designs: one sort/hash exchange
  * keyed on the series key, then window/agg — the shape that survives a
  * 100× scale-up (no per-row joins, no quadratic pair spaces).
  */
object TimeSeries {

  /** As-of join: for each left row, the most recent right row with
    * `right.ts <= left.ts` and equal keys.
    *
    * Spark-first design: instead of an inequality join (quadratic per
    * key) this unions both sides, sorts once per key, and carries the
    * latest right payload forward with `last(_, ignoreNulls)` over an
    * unbounded-preceding window — one exchange + one sort, O(n log n)
    * per key, AQE-skew-splittable. Right rows sort before left rows at
    * equal timestamps so `<=` semantics hold.
    *
    * Right payload columns come back as `asof_<name>` (null when no
    * right row precedes).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val payload = struct(rightPayload.map(col): _*)
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(right.select(payload).schema.head.dataType).as("__pay")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
        payload.as("__pay")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // First payload column as final sort key: ties on (ts, side) between
    // two right rows would otherwise carry a partitioning-dependent
    // winner. Make `rightPayload.head` an orderable, per-(key,ts)-unique
    // column (an id) for full determinism; sorting the whole payload
    // struct would break for unorderable payload types like maps.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__pay").getField(rightPayload.head))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__carried", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightPayload.map(p => col(s"__carried.$p").as(s"asof_$p"))).toIndexedSeq: _*)
  }

  /** Linear-interpolation resample: for each grid row, the value
    * interpolated between the nearest observation at-or-before and
    * at-or-after the grid instant, per key (null outside the observed
    * range; the observation itself when a grid point lands exactly on
    * one).
    *
    * Same single-exchange shape as [[asOfJoin]]: union both sides, one
    * keyed exchange, then two in-partition window sorts (forward +
    * backward carry) — no join, no quadratic per-key work, and the
    * interpolation arithmetic is pure IEEE double (engine-exact), only
    * quantized at the end.
    *
    * `idCol` must be a per-(key,ts)-unique observation id: it totalizes
    * the window order so duplicate-timestamp observations carry a
    * deterministic winner (same role as in [[asOfJoin]]).
    */
  def interpolate(grid: DataFrame, obs: DataFrame, keys: Seq[String],
                  gridTs: String, obsTs: String, valCol: String,
                  idCol: String, scale: Int = 6): DataFrame = {
    val gridCols = grid.columns
    val g = grid.select(
      keys.map(col) ++ Seq(col(gridTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast("long").as("__eid"), lit(null).cast("double").as("__v")) ++
        gridCols.filterNot(keys.contains).map(col): _*)
    val o = obs.select(
      keys.map(col) ++ Seq(col(obsTs).as("__ts"), lit(0).as("__side"),
        col(idCol).cast("long").as("__eid"), col(valCol).cast("double").as("__v")) ++
        gridCols.filterNot(keys.contains).map(c => lit(null).cast(grid.schema(c).dataType).as(c)): _*)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Backward pass: descending ts; side stays ascending so an
    // observation at the grid instant sorts before the grid row in BOTH
    // passes (then pt = nt and the exact value is returned).
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side"), col("__eid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsT = when(col("__side") === 0, unix_micros(col("__ts").cast("timestamp")))
    val obsV = when(col("__side") === 0, col("__v"))
    val gt = unix_micros(col("__ts").cast("timestamp"))
    val interp = when(col("__pt").isNull || col("__nt").isNull, lit(null).cast("double"))
      .when(col("__nt") === col("__pt"), col("__pv"))
      .otherwise(graft.Det.qz(
        col("__pv") + (col("__nv") - col("__pv")) *
          ((gt - col("__pt")).cast("double") / (col("__nt") - col("__pt")).cast("double")),
        scale))
    g.unionByName(o)
      .withColumn("__pt", last(obsT, ignoreNulls = true).over(wf))
      .withColumn("__pv", last(obsV, ignoreNulls = true).over(wf))
      .withColumn("__nt", last(obsT, ignoreNulls = true).over(wb))
      .withColumn("__nv", last(obsV, ignoreNulls = true).over(wb))
      .filter(col("__side") === 1)
      .select((gridCols.map(col) :+ interp.as("interp_value")).toIndexedSeq: _*)
  }

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event on the same key exceeds `gapSeconds`. Gap math is
    * integer microseconds — no float compares. Adds `session_idx`
    * (0-based per key).
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long,
                 tieCol: Option[String] = None): DataFrame = {
    // optional tiebreak keeps lag()/cumsum deterministic when two events
    // share (key, ts)
    val ord = col(tsCol) +: tieCol.map(col).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val prev = lag(unix_micros(col(tsCol).cast("timestamp")), 1).over(w)
    val isNew = when(prev.isNull, 1L)
      .when(unix_micros(col(tsCol).cast("timestamp")) - prev > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__new")
  }

  /** Fixed-width time bucketing (floor to the bucket start). Integer
    * `div` on epoch micros — engine-exact, and for widths dividing 24 h
    * identical to `date_trunc`.
    */
  def timeBucket(ts: Column, widthSeconds: Long): Column = {
    val us = widthSeconds * 1000000L
    // floor(double) is exact here: epoch micros < 2^53 and the quotient's
    // distance to an integer is ≥ 1/us, far above one ulp.
    timestamp_micros(floor(unix_micros(ts.cast("timestamp")) / us).cast("long") * us)
  }
}
