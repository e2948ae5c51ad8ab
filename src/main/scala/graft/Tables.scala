package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-pinned readers for the driver-generated test tables.
  *
  * Every operator in the library takes `(SparkSession, sfDir)` and loads
  * through here so scans stay uniform (parquet, pushdown-friendly — no
  * inferSchema surprises, no caching side effects).
  *
  * `events.parquet` has shipped with two physical types for `ts` across
  * driver revisions: a nanosecond-precision INT64 (readable only with
  * `spark.sql.legacy.parquet.nanosAsLong=true`, see [[Sessions]]) and a
  * plain microsecond `timestamp[us]` (no UTC flag). The loader normalizes
  * BOTH to a session-zone (UTC) microsecond timestamp: nanos are
  * integer-truncated to micros — exactly what a microsecond-native engine
  * (e.g. DuckDB) does on read — and the no-UTC-flag vintage is read
  * directly as a UTC instant, so both sides of the correctness gate see
  * identical instants whichever file vintage is on disk.
  *
  * Pushdown note: [[Sessions.builderDefaults]] sets
  * `spark.sql.parquet.inferTimestampNTZ.enabled=false`, so the
  * no-UTC-flag vintage surfaces as TIMESTAMP (LTZ in the UTC session
  * zone) straight off the scan and `ts` range predicates reach
  * PushedFilters / row-group min-max skipping. A cast-above-the-scan
  * (the round-8 shape) kept the values right but turned every time-range
  * filter on a 100 TB events table into a full scan — at scale the time
  * predicate IS the predicate, so the loader refuses to degrade silently:
  * if a caller bypasses [[Sessions]] and the scan still emits NTZ, the
  * cast fallback demands a UTC session zone (anything else re-tags every
  * instant into the wrong zone) and any third physical type throws.
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
        case LongType =>
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
        // timestamp[us] vintage under builderDefaults (inferTimestampNTZ
        // off, session zone UTC): already the instant we want, untouched —
        // ts predicates stay eligible for parquet pushdown.
        case TimestampType =>
          org.apache.spark.sql.functions.col("ts")
        // Same vintage read by a session that bypassed Sessions and left
        // NTZ inference on: the NTZ→LTZ cast re-tags the wall clock as an
        // instant in the SESSION zone, which is only the UTC instant the
        // other vintages produce if that zone is UTC — fail loudly rather
        // than silently shifting every timestamp.
        case TimestampNTZType =>
          val zone = spark.conf.get("spark.sql.session.timeZone")
          require(zone == "UTC" || zone == "Etc/UTC",
            s"events.ts is TIMESTAMP_NTZ and session timeZone is '$zone': " +
              "the NTZ->TIMESTAMP re-tag is only correct under UTC " +
              "(build the session via graft.Sessions)")
          org.apache.spark.sql.functions.col("ts").cast(TimestampType)
        // A third physical vintage must be a loader change, not a silent
        // cast to nulls/garbage in a schema-pinned reader.
        case other => throw new IllegalStateException(
          s"events.ts has unsupported physical type $other; " +
            "expected INT64 nanos, TIMESTAMP, or TIMESTAMP_NTZ")
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

  /** Within-query staged materialization (guide §2.4/§8: compute a
    * decision tier ONCE, fan consumers out from the materialized copy):
    * writes `df` to a per-application temp dir and reads it back, so a
    * subtree Catalyst would otherwise re-plan once per consumer executes
    * exactly once per query run.
    *
    * NOT a cross-run cache: the write runs UNCONDITIONALLY on every call
    * (mode=overwrite, no freshness check), inside the caller's own
    * invocation — the bench times it, and two bench sweeps pay it twice.
    * The dir is keyed on the Spark applicationId so concurrent processes
    * (Bench vs Verify) never read each other's staging, and repeated
    * calls within one application reuse the same path rather than
    * accreting files.
    */
  def stageOnce(df: DataFrame, tag: String): DataFrame = {
    val s = df.sparkSession
    val user = Integer.toHexString(
      System.getProperty("user.name", "anon").hashCode)
    val path = new java.io.File(
      new java.io.File(System.getProperty("java.io.tmpdir"), s"graft-$user"),
      s"stage-$tag-${s.sparkContext.applicationId}").toString
    df.write.mode("overwrite").parquet(path)
    s.read.parquet(path)
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
    // timestamp[us] columns without the isAdjustedToUTC flag read as
    // TIMESTAMP (UTC session zone) instead of TIMESTAMP_NTZ, so the
    // Tables.load events branch is a no-op and ts range predicates push
    // into the parquet scan (row-group min-max skipping) — see Tables.
    //
    // SESSION-WIDE EFFECT, by design: this knob applies to EVERY parquet
    // read in the session, not just events — any future table whose
    // column is genuinely wall-clock TIMESTAMP_NTZ will surface as a UTC
    // instant instead. That is the correct reading for this library's
    // contract (the session zone is pinned UTC two lines up, so the
    // re-tag is value-preserving, and the DuckDB oracle sees the same
    // instants), but a table that must round-trip as NTZ would need
    // either a per-read `.option("inferTimestampNTZ", "true")` or an
    // explicit NTZ schema on its reader — don't discover this silently.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
    .config("spark.sql.adaptive.enabled", "true")
    // storage-partitioned joins (SPARK-37375): let the planner USE a
    // V2 scan's reported KeyGroupedPartitioning — co-partitioned graft
    // tables then join with zero exchanges. Enabling the machinery is
    // free for every other scan (nothing else reports key-grouped);
    // whether a graft scan REPORTS its layout is a separate per-read
    // opt-in (`preserveDataGrouping`, see GraftScanBuilder) because
    // grouping caps scan parallelism at the partition-value count —
    // right for a co-partitioned join, wrong for a plain full scan.
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    // tolerate partition-value sets that don't align exactly (one side
    // missing a value): Spark pushes empty partitions instead of
    // falling back to a shuffle
    .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
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
