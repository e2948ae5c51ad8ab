package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-pinned readers for the driver-generated test tables.
  *
  * Every operator in the library takes `(SparkSession, sfDir)` and loads
  * through here so scans stay uniform (parquet, pushdown-friendly — no
  * inferSchema surprises, no caching side effects).
  *
  * `events.parquet` has shipped with two physical types for `ts` across
  * driver revisions: a nanosecond-precision INT64 (readable only with
  * `spark.sql.legacy.parquet.nanosAsLong=true`, see [[Sessions]]) and a
  * plain microsecond `timestamp[us]` (no UTC flag, so Spark reads it as
  * TIMESTAMP_NTZ). The loader normalizes BOTH to a session-zone (UTC)
  * microsecond timestamp: nanos are integer-truncated to micros — exactly
  * what a microsecond-native engine (e.g. DuckDB) does on read — and NTZ
  * wall-clock values are re-tagged as UTC instants, so both sides of the
  * correctness gate see identical instants whichever file vintage is on
  * disk.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      val ts = df.schema("ts").dataType match {
        // nano INT64 vintage: integer `div` (not `/`) — double division
        // would lose precision on ~1.7e18 nano values (> 2^53).
        case org.apache.spark.sql.types.LongType =>
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
        // timestamp[us] vintage (TIMESTAMP or TIMESTAMP_NTZ): with the
        // session zone pinned to UTC the NTZ→TZ cast re-tags the wall
        // clock as the same UTC instant the old path produced.
        case _ =>
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType)
      }
      import org.apache.spark.sql.functions.col
      df.select(col("event_id"), ts.as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    } else df
  }

  /** Guarantee at least the ambient parallelism before heavy per-row work.
    *
    * At warehouse scale a scan arrives as thousands of splits and this is
    * a NO-OP — no shuffle is added, and map-side partial aggregation
    * downstream keeps shuffle bytes minimal. On small inputs (a
    * single-row-group file ⇒ a single scan task) it hash-repartitions on
    * `by` so CPU-heavy projections (shingling, hashing, vector math) use
    * every core instead of one; keying on the downstream aggregation
    * column also lets EnsureRequirements elide the next exchange.
    */
  def spread(df: DataFrame, by: org.apache.spark.sql.Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // queryExecution.toRdd reuses the Dataset's cached QueryExecution;
    // df.rdd would build and plan a SECOND QueryExecution (analysis +
    // optimization + file listing) per call site just to read a count.
    if (df.queryExecution.toRdd.getNumPartitions >= target) df
    else df.repartition(by)
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
