package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixture construction.
  *
  * Corpus mixtures ("20% of en web, 50% of everything else") must be
  * REPRODUCIBLE — re-running the pipeline, on any cluster layout, must
  * select the same rows, or downstream dedup/eval splits silently drift.
  * `rand()` cannot do that; a content-hash gate can: a row is kept iff a
  * hex prefix of md5(id) falls under its stratum's threshold. Map-only,
  * no shuffle, portable to any engine that has md5 (the oracle replays it
  * verbatim in DuckDB).
  */
object Sampling {

  /** Threshold as a 2-hex-digit string: rate ≈ n/256. */
  def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    f"${math.min(255, math.round(rate * 256).toInt)}%02x"
  }

  /** The keep-gate: md5 of the DECIMAL STRING of the id (identical
    * canonical form on every engine), first two hex digits compared
    * lexicographically against the stratum threshold.
    */
  def hashGate(idCol: Column, threshold: Column): Column =
    substring(md5(idCol.cast("string")), 1, 2) < threshold

  /** Per-stratum Bernoulli sample: `rates` maps stratum value → keep
    * rate; `defaultRate` covers unlisted strata. Adds a boolean
    * `sampled` column (filter on it to materialize the sample — kept as
    * a column so callers can also audit realized rates).
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           rates: Map[String, Double],
                           defaultRate: Double): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldRight(
      lit(hexThreshold(defaultRate))) { case ((k, r), rest) =>
      when(col(strataCol) === k, lit(hexThreshold(r))).otherwise(rest)
    }
    df.withColumn("sampled", hashGate(col(idCol), threshold))
  }
}
