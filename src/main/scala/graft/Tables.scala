package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-pinned readers for the driver-generated test tables.
  *
  * Every operator in the library takes `(SparkSession, sfDir)` and loads
  * through here so scans stay uniform (parquet, pushdown-friendly — no
  * inferSchema surprises, no caching side effects).
  *
  * `events.parquet` carries a nanosecond-precision INT64 timestamp, which
  * Spark's parquet reader rejects. Sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions]]); the
  * loader then truncates nanos → microseconds, which is exactly what a
  * microsecond-native engine (e.g. DuckDB) does on read, so both sides of
  * the correctness gate see identical instants.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      // integer `div` (not `/`): double division would lose precision on
      // ~1.7e18 nano values (> 2^53).
      df.selectExpr("event_id", "timestamp_micros(ts div 1000) AS ts",
        "user_id", "event_type", "value", "props")
    else df
  }
}

/** One place for SparkSession construction so Verify / Bench / tests all
  * run with the same semantics-affecting configs.
  */
object Sessions {
  def builderDefaults(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")

  def local(cores: Int, shufflePartitions: Int): SparkSession = {
    val spark = builderDefaults(SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
