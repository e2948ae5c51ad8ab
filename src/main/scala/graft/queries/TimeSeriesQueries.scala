package graft.queries

import graft.{Q, Tables}
import graft.Det
import graft.Det.{dsum, dsumSql}
import graft.operators.TimeSeries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Block D — time-series operators over `events` (SURVEY.md §2.D). */
object TimeSeriesQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---- s1_resample: 1h buckets × event_type ----------------------------
  private val s1 = Q(
    (s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(
        date_format(TimeSeries.timeBucket(col("ts"), 3600), "yyyy-MM-dd HH:mm").as("bucket"),
        col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("bucket", "event_type")
    },
    Some(s"""
      SELECT strftime(make_timestamp((epoch_us(ts) // 3600000000) * 3600000000),
                      '%Y-%m-%d %H:%M') AS bucket,
             event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
      FROM events
      GROUP BY 1, 2 ORDER BY bucket, event_type"""))

  // ---- s2_sessionize: 30-min-gap sessions per user ---------------------
  private val s2 = Q(
    (s, dir) => {
      val sess = TimeSeries.sessionize(t(s, dir, "events"), "user_id", "ts", 1800L, tieCol = Some("event_id"))
      sess.groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"),
          sum(col("n_events")).as("n_events_total"))
        .orderBy("user_id")
    },
    Some("""
      WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
                    WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
                    ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
        FROM g),
      per AS (
        SELECT user_id, session_idx, COUNT(*) AS n_events
        FROM sess GROUP BY user_id, session_idx)
      SELECT user_id, COUNT(*) AS n_sessions,
             MAX(n_events) AS max_session_events,
             CAST(SUM(n_events) AS BIGINT) AS n_events_total
      FROM per GROUP BY user_id ORDER BY user_id"""))

  // ---- s3_asof_join: latest purchase before each error, per user -------
  private val s3 = Q(
    (s, dir) => {
      val e = t(s, dir, "events")
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      TimeSeries.asOfJoin(errors, purchases, Seq("user_id"), "ts", "ts", Seq("purchase_id"))
        .select(col("event_id"), col("user_id"), col("asof_purchase_id"))
        .orderBy("event_id")
    },
    Some("""
      WITH u AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = 'purchase' THEN event_id END AS pid,
               CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side
        FROM events WHERE event_type IN ('error', 'purchase'))
      SELECT event_id, user_id, last_pid AS asof_purchase_id
      FROM (
        SELECT event_id, user_id, event_type,
               last_value(pid IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, side, pid
                 ROWS UNBOUNDED PRECEDING) AS last_pid
        FROM u) z
      WHERE event_type = 'error'
      ORDER BY event_id"""))

  // ---- s4_range_join: banded non-equi join against a value scale -------
  private val bands = Seq(("low", 0.0, 50.0), ("mid", 50.0, 200.0),
    ("high", 200.0, 1000.0), ("extreme", 1000.0, 1e9))
  private val s4 = Q(
    (s, dir) => {
      val e = t(s, dir, "events")
      val bandDf = broadcast(s.createDataFrame(bands).toDF("band", "lo", "hi"))
      e.join(bandDf, col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("band")
    },
    Some(s"""
      SELECT band, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
      FROM events
      JOIN (VALUES ${bands.map { case (b, lo, hi) => s"('$b', CAST($lo AS DOUBLE), CAST($hi AS DOUBLE))" }.mkString(", ")})
        v(band, lo, hi)
        ON value >= lo AND value < hi
      GROUP BY band ORDER BY band"""))

  // ---- s5_gap_fill: regular grid + as-of carry-forward ------------------
  // Per-user 6 h grid between hour-truncated first and last event, filled
  // with the latest preceding observation — grid generation is
  // sequence+explode (map-side after one tiny agg), the fill reuses the
  // join-free as-of operator (union + one keyed sort).
  private val s5 = Q(
    (s, dir) => {
      val ev = t(s, dir, "events").filter(col("user_id") < 40)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val grid = ev.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("t0"), max(col("ts")).as("t1"))
        .select(col("user_id"),
          explode(sequence(col("t0"), col("t1"), expr("INTERVAL 6 HOURS"))).as("gts"))
      TimeSeries.asOfJoin(grid, ev, Seq("user_id"), "gts", "ts", Seq("event_id", "value"))
        .select(col("user_id"), col("gts"),
          col("asof_event_id"), col("asof_value"))
        .orderBy("user_id", "gts")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, ts, event_id, value FROM events WHERE user_id < 40),
      b AS (
        SELECT user_id, date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1
        FROM ev GROUP BY user_id),
      g AS (
        SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 6 HOUR)) AS gts
        FROM b),
      u AS (
        SELECT user_id, gts AS ts, 1 AS side, gts,
               NULL::BIGINT AS eid, NULL::DOUBLE AS v
        FROM g
        UNION ALL
        SELECT user_id, ts, 0, NULL, event_id, value FROM ev)
      SELECT user_id, gts,
             asof_event_id, asof_value
      FROM (
        SELECT user_id, gts, side,
               last_value(eid IGNORE NULLS) OVER w AS asof_event_id,
               last_value(v IGNORE NULLS) OVER w AS asof_value
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, eid
                     ROWS UNBOUNDED PRECEDING)) z
      WHERE side = 1
      ORDER BY user_id, gts"""))

  // ---- s6_interp_resample: linear interpolation onto a regular grid -----
  // The s5 grid, but each grid instant gets the value LINEARLY
  // interpolated between its nearest observations on both sides (the
  // standard profile/series regridding step). Join-free: one keyed
  // exchange, forward + backward carry windows.
  private val s6 = Q(
    (s, dir) => {
      val ev = t(s, dir, "events").filter(col("user_id") < 40)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val grid = ev.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("t0"), max(col("ts")).as("t1"))
        .select(col("user_id"),
          explode(sequence(col("t0"), col("t1"), expr("INTERVAL 6 HOURS"))).as("gts"))
      TimeSeries.interpolate(grid, ev, Seq("user_id"), "gts", "ts", "value", "event_id")
        .orderBy("user_id", "gts")
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, ts, event_id AS eid, value FROM events WHERE user_id < 40),
      b AS (
        SELECT user_id, date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1
        FROM ev GROUP BY user_id),
      g AS (
        SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 6 HOUR)) AS gts
        FROM b),
      u AS (
        SELECT user_id, gts AS ts, 1 AS side, gts,
               NULL::BIGINT AS eid, NULL::DOUBLE AS v
        FROM g
        UNION ALL
        SELECT user_id, ts, 0, NULL, eid, value FROM ev),
      c AS (
        SELECT user_id, gts, side,
               last_value(CASE WHEN side = 0 THEN epoch_us(ts) END IGNORE NULLS) OVER wf AS pt,
               last_value(CASE WHEN side = 0 THEN v END IGNORE NULLS) OVER wf AS pv,
               last_value(CASE WHEN side = 0 THEN epoch_us(ts) END IGNORE NULLS) OVER wb AS nt,
               last_value(CASE WHEN side = 0 THEN v END IGNORE NULLS) OVER wb AS nv
        FROM u
        WINDOW wf AS (PARTITION BY user_id ORDER BY ts, side, eid
                      ROWS UNBOUNDED PRECEDING),
               wb AS (PARTITION BY user_id ORDER BY ts DESC, side, eid DESC
                      ROWS UNBOUNDED PRECEDING))
      SELECT user_id, gts,
             CASE WHEN pt IS NULL OR nt IS NULL THEN NULL
                  WHEN nt = pt THEN pv
                  ELSE ${Det.qzSql("pv + (nv - pv) * (CAST(epoch_us(gts) - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))", 6)}
             END AS interp_value
      FROM c WHERE side = 1
      ORDER BY user_id, gts"""))

  // ---- s7_interval_join: custom sweep-join plan node ---------------------
  // Clicks joined to same-user error-burst windows (per-day min..max
  // error ts) through graft.plans.IntervalJoin: one keyed exchange per
  // side, then an output-sensitive per-key sweep — NOT the per-key cross
  // product Spark plans for equi-key + BETWEEN. Oracle is the plain
  // declarative join; Round3Spec additionally pins plan shape and parity.
  private val s7 = Q(
    (s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val bursts = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id").as("uid"), date_trunc("day", col("ts")).as("day"))
        .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
        .drop("day")
      graft.operators.RangeJoin.pointInInterval(
        clicks, bursts, Seq(("user_id", "uid")), "ts", "lo", "hi")
        .select(col("user_id"), col("event_id"), col("lo"), col("hi"))
        .orderBy("user_id", "event_id", "lo")
    },
    Some("""
      WITH clicks AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      bursts AS (
        SELECT user_id AS uid, MIN(ts) AS lo, MAX(ts) AS hi
        FROM events WHERE event_type = 'error'
        GROUP BY user_id, date_trunc('day', ts))
      SELECT user_id, event_id, lo, hi
      FROM clicks JOIN bursts
        ON user_id = uid AND ts >= lo AND ts <= hi
      ORDER BY user_id, event_id, lo"""))

  // ---- s8_outliers: per-series z-score anomaly flagging ------------------
  // Statistical outlier detection per sensor (user_id): mean/variance
  // from exact decimal component sums over ONE keyed window (order-free,
  // so bit-identical across engines and partitionings), then |z| > 2.5
  // flags. The two-pass-looking math is a single exchange: count, Σx and
  // Σx² all ride the same whole-partition window frame. sqrt and divide
  // are IEEE-correctly-rounded, so z is reproducible bit-for-bit.
  private val s8 = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
      val withStats = t(s, dir, "events")
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s1", sum(col("value").cast(Det.D)).over(w).cast("double"))
        .withColumn("s2", sum((col("value") * col("value")).cast(Det.D)).over(w).cast("double"))
        .filter(col("n") >= 10)
        .withColumn("mean", col("s1") / col("n"))
        .withColumn("variance",
          greatest((col("s2") - col("n") * col("mean") * col("mean")) / (col("n") - 1), lit(0.0)))
        // variance == 0 would make z NaN/Inf, whose comparison semantics
        // differ across engines — excluded on both sides
        .filter(col("variance") > 0.0)
        .withColumn("z", (col("value") - col("mean")) / sqrt(col("variance")))
      withStats.filter(abs(col("z")) > 2.5)
        .select(col("event_id"), col("user_id"), col("value"),
          Det.qz(col("z")).as("z_score"))
        .orderBy("user_id", "event_id")
    },
    Some(s"""
      WITH st AS (
        SELECT event_id, user_id, value,
               COUNT(*) OVER (PARTITION BY user_id) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (PARTITION BY user_id) AS DOUBLE) AS s1,
               CAST(SUM(CAST(value * value AS DECIMAL(28,6))) OVER (PARTITION BY user_id) AS DOUBLE) AS s2
        FROM events),
      v AS (
        SELECT *, GREATEST((s2 - n * (s1/n) * (s1/n)) / (n - 1), 0.0) AS vr
        FROM st WHERE n >= 10),
      z AS (
        SELECT event_id, user_id, value, (value - s1 / n) / SQRT(vr) AS z
        FROM v WHERE vr > 0.0)
      SELECT event_id, user_id, value, ${Det.qzSql("z")} AS z_score
      FROM z WHERE ABS(z) > 2.5
      ORDER BY user_id, event_id"""))

  // ---- s9_ohlc: per-bucket open/high/low/close downsampling -------------
  // The financial-downsample shape (also how you thin a 100 TB sensor
  // stream for dashboards): hourly buckets per event_type, first/last
  // value under the (ts, event_id) total order via min_by/max_by over an
  // lpad-encoded key (engine-independent tiebreak), extremes and exact
  // decimal volume in the SAME single keyed aggregation — one exchange,
  // map-side combinable, no window, no sort.
  private val s9 = Q(
    (s, dir) => {
      val ordKey = concat(
        lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
        lpad(col("event_id").cast("string"), 10, "0"))
      t(s, dir, "events")
        .groupBy(
          date_format(TimeSeries.timeBucket(col("ts"), 3600), "yyyy-MM-dd HH:mm").as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          min_by(col("value"), ordKey).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), ordKey).as("close"),
          dsum(col("value")).as("volume"))
        .orderBy("bucket", "event_type")
    },
    Some(s"""
      WITH e AS (
        SELECT strftime(make_timestamp((epoch_us(ts) // 3600000000) * 3600000000),
                        '%Y-%m-%d %H:%M') AS bucket,
               event_type, value,
               concat(lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0'),
                      lpad(CAST(event_id AS VARCHAR), 10, '0')) AS k
        FROM events)
      SELECT bucket, event_type, COUNT(*) AS n,
             arg_min(value, k) AS open, MAX(value) AS high, MIN(value) AS low,
             arg_max(value, k) AS close, ${dsumSql("value")} AS volume
      FROM e GROUP BY 1, 2 ORDER BY bucket, event_type"""))

  // ---- s10_seasonal: hour-of-day seasonality profile ---------------------
  // The load-shape profile behind capacity planning and anomaly
  // baselines: per (event_type, hour-of-day) volume and exact-decimal
  // mean value, plus each hour's share of its type's total. ONE keyed
  // aggregation exchange (24×types output rows); the share join is
  // broadcast-sized. Bucketing is map-side date arithmetic, so the
  // operator is scan-bound at any scale.
  private val s10 = Q(
    (s, dir) => {
      val byHour = t(s, dir, "events")
        .groupBy(col("event_type"), hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n"), Det.davg(col("value")).as("avg_value"))
      val totals = byHour.groupBy(col("event_type").as("et"))
        .agg(sum(col("n")).as("total"))
      byHour.join(broadcast(totals), col("event_type") === col("et"))
        .select(col("event_type"), col("hod"), col("n"), col("avg_value"),
          Det.qz(col("n").cast("double") / col("total").cast("double"), 6).as("share"))
        .orderBy("event_type", "hod")
    },
    Some(s"""
      WITH h AS (
        SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod, COUNT(*) AS n,
               ${Det.davgSql("value")} AS avg_value
        FROM events GROUP BY 1, 2),
      t AS (SELECT event_type, SUM(n) AS total FROM h GROUP BY 1)
      SELECT h.event_type, hod, n, avg_value,
             ${Det.qzSql("CAST(n AS DOUBLE) / CAST(total AS DOUBLE)", 6)} AS share
      FROM h JOIN t ON h.event_type = t.event_type
      ORDER BY h.event_type, hod"""))

  // ---- s11_moving_avg: centered moving average ---------------------------
  // The symmetric smoother (ROWS 3 PRECEDING..3 FOLLOWING) the trailing
  // q24 frame doesn't cover: per-user centered mean and frame row count
  // under the (ts, event_id) total order. Sum runs in exact decimal so
  // frame contents — not float order — determine the bits. One keyed
  // exchange, partition-local sort.
  private val s11 = Q(
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, 3)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          count(lit(1)).over(w).as("frame_n"),
          Det.qz(sum(col("value").cast(Det.D)).over(w).cast("double") /
            count(lit(1)).over(w)).as("smoothed"))
        .orderBy("event_id")
    },
    Some(s"""
      SELECT event_id, user_id, value,
             COUNT(*) OVER w AS frame_n,
             ${Det.qzSql("CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) / (COUNT(*) OVER w)")} AS smoothed
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      ORDER BY event_id"""))

  // ---- s12_cusum: changepoint detection via closed-form CUSUM ------------
  // The upward-shift detector S_i = max(0, S_{i-1} + x_i − k) looks like
  // an unexpressible recurrence, but it has the prefix closed form
  // S_i = P_i − min(0, min_{j≤i} P_j) with P the running sum of (x − k) —
  // two window passes over ONE keyed exchange. All prefix arithmetic
  // stays in exact decimal (sum, running min, subtraction), so the alarm
  // line is engine-exact without any float-order caveat.
  private val s12k = 8.0
  private val s12h = 40.0
  private val s12 = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("p", sum((col("value") - s12k).cast(Det.D)).over(w))
        .withColumn("runmin", min(col("p")).over(w))
        .withColumn("cusum",
          (col("p") - least(lit(0).cast(Det.D), col("runmin"))).cast("double"))
        .select(col("event_id"), col("user_id"), col("value"),
          Det.qz(col("cusum")).as("cusum"),
          (Det.qz(col("cusum")) > s12h).as("alarm"))
        .orderBy("event_id")
    },
    Some(s"""
      WITH p AS (
        SELECT event_id, ts, user_id, value,
               SUM(CAST(value - $s12k AS DECIMAL(28,6))) OVER w AS p
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)),
      c AS (
        SELECT event_id, user_id, value,
               CAST(p - LEAST(CAST(0 AS DECIMAL(28,6)),
                 MIN(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING)) AS DOUBLE) AS cusum
        FROM p)
      SELECT event_id, user_id, value,
             ${Det.qzSql("cusum")} AS cusum,
             (${Det.qzSql("cusum")} > $s12h) AS alarm
      FROM c ORDER BY event_id"""))

  // ---- s13_attribution: first-touch conversion attribution ---------------
  // The marketing-attribution shape: each purchase attributes to the
  // user's most recent preceding view within a 7-day lookback. The
  // "most recent preceding view" is a running max of view timestamps
  // under the (ts, event_id) total order — ONE keyed exchange, no
  // self-join, the same single-pass trick as the funnel.
  private val s13 = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val us = unix_micros(col("ts"))
      val lookbackUs = 7L * 86400L * 1000000L
      t(s, dir, "events")
        .withColumn("last_view_us", max(when(col("event_type") === "view", us)).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"),
          (col("last_view_us").isNotNull &&
            us - col("last_view_us") <= lookbackUs).as("attributed"),
          when(col("last_view_us").isNotNull &&
            us - col("last_view_us") <= lookbackUs,
            ((us - col("last_view_us")) / 1000000L).cast("long")).as("latency_s"))
        .orderBy("event_id")
    },
    Some("""
      WITH v AS (
        SELECT event_id, user_id, value, event_type, epoch_us(ts) AS us,
               MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS last_view_us
        FROM events)
      SELECT event_id, user_id, value,
             (last_view_us IS NOT NULL AND us - last_view_us <= 604800000000) AS attributed,
             CASE WHEN last_view_us IS NOT NULL AND us - last_view_us <= 604800000000
                  THEN (us - last_view_us) // 1000000 END AS latency_s
      FROM v WHERE event_type = 'purchase'
      ORDER BY event_id"""))

  // ---- s14_throttle: rate limiting / event coalescing --------------------
  // The keep-first-per-key-per-window shape (alert throttling, webhook
  // coalescing): at most one event per (user, type, minute), the
  // earliest winning under the (ts, event_id) total order, with drop
  // accounting per type. One keyed exchange; the rank partitions on a
  // superset of the rollup key.
  private val s14 = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val minute = (unix_micros(col("ts")) / 60000000L).cast("long")
      val w = Window.partitionBy(col("user_id"), col("event_type"), col("minute"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("minute", minute)
        .withColumn("rn", row_number().over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_throttled"))
        .orderBy("event_type")
    },
    Some("""
      WITH r AS (
        SELECT event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type, epoch_us(ts) // 60000000
                                  ORDER BY ts, event_id) AS rn
        FROM events)
      SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_throttled
      FROM r GROUP BY event_type ORDER BY event_type"""))

  // ---- s15_lttb_downsample: visually-representative downsampling ---------
  // Largest-Triangle-Three-Buckets with fixed anchors (neighbor-bucket
  // centroids instead of the sequentially-chosen point), which makes
  // the selection embarrassingly parallel: per (type, hour-bucket) the
  // kept point maximizes the triangle area spanned with the previous
  // and next buckets' centroids. Centroids are one keyed agg; the
  // bucket table is bounded (hours×types) so the row join broadcasts;
  // the per-bucket argmax runs through the bounded-heap GroupedTopK.
  // Area is quantized before the argmax so the winner is engine-exact.
  private val s15 = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bucket = (unix_micros(col("ts")) / 3600000000L).cast("long")
      // the time axis stays in INTEGER microseconds end-to-end: long
      // sums are exact on both engines, whereas fractional-second
      // doubles cast to decimal can round ties differently per engine
      val base = t(s, dir, "events")
        .select(col("event_type"), col("event_id"), col("value"),
          bucket.as("b"), unix_micros(col("ts")).as("x"))
      val cents = base.groupBy(col("event_type").as("ct"), col("b").as("cb"))
        .agg((sum(col("x")) / count(lit(1))).as("cx"),
          (Det.dsum(col("value")) / count(lit(1))).as("cy"))
      val wb = Window.partitionBy(col("ct")).orderBy(col("cb"))
      val anchors = cents
        .withColumn("px", lag(col("cx"), 1).over(wb))
        .withColumn("py", lag(col("cy"), 1).over(wb))
        .withColumn("nx", lead(col("cx"), 1).over(wb))
        .withColumn("ny", lead(col("cy"), 1).over(wb))
        .filter(col("px").isNotNull && col("nx").isNotNull)
      val joined = base.join(broadcast(anchors),
        col("event_type") === col("ct") && col("b") === col("cb"))
      val area = abs((col("px") - col("nx")) * (col("value") - col("py")) -
        (col("px") - col("x")) * (col("ny") - col("py")))
      val scored = joined.select(col("event_type"), col("b"), col("event_id"),
        col("value"), Det.qz(area / 1e6, 2).as("area"))
      graft.operators.TopK.perKey(scored,
          Seq("event_type", "b"), Seq(("area", false), ("event_id", true)), 1)
        .orderBy("event_type", "b")
    },
    Some(s"""
      WITH base AS (
        SELECT event_type, event_id, value,
               epoch_us(ts) // 3600000000 AS b,
               epoch_us(ts) AS x
        FROM events),
      cents AS (
        SELECT event_type AS ct, b AS cb,
               CAST(SUM(x) AS BIGINT) / COUNT(*) AS cx,
               ${Det.dsumSql("value")} / COUNT(*) AS cy
        FROM base GROUP BY 1, 2),
      anchors AS (
        SELECT *, lag(cx) OVER w AS px, lag(cy) OVER w AS py,
               lead(cx) OVER w AS nx, lead(cy) OVER w AS ny
        FROM cents WINDOW w AS (PARTITION BY ct ORDER BY cb)),
      scored AS (
        SELECT event_type, b, event_id, value,
               ${Det.qzSql("abs((px - nx) * (value - py) - (px - x) * (ny - py)) / 1e6", 2)} AS area
        FROM base JOIN anchors ON event_type = ct AND b = cb
        WHERE px IS NOT NULL AND nx IS NOT NULL)
      SELECT event_type, b, event_id, value, area
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, b
                                         ORDER BY area DESC, event_id) AS rn
            FROM scored) z
      WHERE rn = 1
      ORDER BY event_type, b"""))

  // ---- s16_mad_outliers: robust (median/MAD) anomaly detection -----------
  // The robust complement to s8's z-score: median and median-absolute-
  // deviation are insensitive to the very outliers being hunted, so the
  // 3σ-equivalent cut (3·1.4826·MAD) stays put under contamination.
  // Two exact-percentile aggregations per type (bounded group count →
  // broadcast joins back); the flag itself compares quantized
  // deviations, keeping the cut engine-exact.
  private val s16 = Q(
    (s, dir) => {
      val e = t(s, dir, "events")
      val med = e.groupBy(col("event_type").as("mt"))
        .agg(Det.qz(expr("percentile(value, 0.5)")).as("med"))
      val withDev = e.join(broadcast(med), col("event_type") === col("mt"))
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = withDev.groupBy(col("event_type").as("at"))
        .agg(Det.qz(expr("percentile(dev, 0.5)")).as("mad"))
      withDev.join(broadcast(mad), col("event_type") === col("at"))
        .withColumn("flag", Det.qz(col("dev")) > Det.qz(lit(3.0 * 1.4826) * col("mad")))
        .groupBy(col("event_type"), col("med"), col("mad"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("flag"), 1L).otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    },
    Some(s"""
      WITH med AS (
        SELECT event_type AS mt, ${Det.qzSql("quantile_cont(value, 0.5)")} AS med
        FROM events GROUP BY 1),
      dev AS (
        SELECT event_type, value, med, abs(value - med) AS dev
        FROM events JOIN med ON event_type = mt),
      mad AS (
        SELECT event_type AS at, ${Det.qzSql("quantile_cont(dev, 0.5)")} AS mad
        FROM dev GROUP BY 1)
      SELECT event_type, med, mad, COUNT(*) AS n,
             CAST(SUM(CASE WHEN ${Det.qzSql("dev")} > ${Det.qzSql("3.0 * 1.4826 * mad")}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM dev JOIN mad ON event_type = at
      GROUP BY event_type, med, mad ORDER BY event_type"""))

  // ---- s17_ewma: truncated exponential smoothing -----------------------
  // EWMA with α=0.3 truncated at 16 taps: y_t = Σ_{j<16} α(1−α)^j·x_{t−j}
  // per user stream. The decay weights are computed ONCE in Scala and
  // interpolated into BOTH engines as literals — no pow() at query time,
  // so there is no libm divergence to manage. The trailing window rides
  // as an ordered ROWS-frame collect_list (deterministic order), the
  // tap-weighted sum is an exact decimal fold (order-free). One keyed
  // exchange at any scale.
  private val s17 = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val alpha = 0.3
      val ws: Array[Double] = {
        var w = alpha
        Array.tabulate(16) { _ => val c = w; w *= (1 - alpha); c }
      }
      val wsLit = array(ws.toIndexedSeq.map(lit(_)): _*)
      val win = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-15, 0)
      val trail = col("trail")
      // each tap-weighted product quantizes to integer MICRO-UNITS with
      // floor-based rounding (pure double arithmetic — identical bits on
      // both engines; a double→decimal cast instead diverges: Spark
      // rounds HALF_UP on the shortest decimal string, DuckDB truncates
      // the scaled binary), then the micro-units sum exactly as longs
      val prods = transform(sequence(lit(0), size(trail) - 1),
        i => floor(element_at(trail, size(trail) - i) * element_at(wsLit, i + 1)
          * 1e6 + 0.5).cast("long"))
      t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("trail", collect_list(col("value")).over(win))
        .select(col("event_id"), col("user_id"),
          Det.qz(aggregate(prods, lit(0L), (a, b) => a + b).cast("double") / 1e6).as("ewma"))
        .orderBy("event_id")
    },
    Some {
      val alpha = 0.3
      val ws: Array[Double] = {
        var w = alpha
        Array.tabulate(16) { _ => val c = w; w *= (1 - alpha); c }
      }
      // e-notation so DuckDB types the taps DOUBLE, not DECIMAL (same
      // boundary hazard as s18's matrices — see sqlLit there)
      val wLit = ws.map(w => String.format(java.util.Locale.ROOT, "%.17e", Double.box(w)))
        .mkString("[", ", ", "]")
      s"""
      WITH tw AS (
        SELECT event_id, user_id,
               list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS trail
        FROM events WHERE value IS NOT NULL)
      SELECT event_id, user_id,
             ${Det.qzSql(
               s"CAST(list_sum(list_transform(range(len(trail)), " +
               s"i -> CAST(FLOOR(trail[len(trail) - i] * ($wLit)[i + 1] * 1e6 + 0.5) AS BIGINT))) " +
               s"AS DOUBLE) / 1e6")} AS ewma
      FROM tw ORDER BY event_id"""
    })

  // ---- s18_holt: double-exponential (Holt) smoothing -------------------
  // Level + trend smoothing truncated at 12 taps, the trend-aware
  // complement to s17's EWMA. The Holt recursion (l_t = αx_t +
  // (1−α)(l_{t−1}+b_{t−1}); b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}, init
  // l₁ = x₁, b₁ = 0) has state LINEAR in the inputs, so it unrolls to a
  // per-trail-length tap-weight vector. Both weight matrices (level and
  // trend, one row per window fill 1..12) are computed ONCE in Scala by
  // running the recursion on unit vectors, and interpolated into BOTH
  // engines as nested literals — query time is a bounded weighted sum,
  // no recursion, no pow(), no libm. Same exact micro-unit fold as s17
  // (pure-double products floored to longs, order-free exact sum). One
  // keyed exchange at any scale.
  // Shared machinery for the unrolled-recursion smoothers (s18/s19): a
  // per-trail-length tap-weight matrix rides into BOTH engines as a
  // nested literal and the weighted sum is an exact micro-unit fold.
  private object TapFold {
    def sparkLit(m: Seq[Array[Double]]): org.apache.spark.sql.Column =
      array(m.map(row => array(row.map(lit(_)).toSeq: _*)): _*)
    // scientific notation: DuckDB types plain decimal literals as
    // DECIMAL(18,17) and does decimal arithmetic (different rounding —
    // one tap landing on a .5 micro-unit boundary flips the floor);
    // e-notation parses as DOUBLE, so both engines run the same IEEE
    // multiply. %.17e round-trips every double exactly.
    def sqlLit(m: Seq[Array[Double]]): String =
      m.map(_.map(w => String.format(java.util.Locale.ROOT, "%.17e", Double.box(w)))
        .mkString("[", ", ", "]")).mkString("[", ", ", "]")

    def fold(mat: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val trail = col("trail")
      val row = element_at(mat, size(trail))
      val prods = transform(sequence(lit(1), size(trail)),
        j => floor(element_at(trail, j) * element_at(row, j) * 1e6 + 0.5).cast("long"))
      Det.qz(aggregate(prods, lit(0L), (a, b) => a + b).cast("double") / 1e6)
    }
    def foldSql(matLit: String): String = Det.qzSql(
      s"CAST(list_sum(list_transform(range(1, len(trail) + 1), " +
      s"j -> CAST(FLOOR(trail[j] * ($matLit)[len(trail)][j] * 1e6 + 0.5) AS BIGINT))) " +
      s"AS DOUBLE) / 1e6")
  }

  private val s18: Q = {
    val W = 12; val alpha = 0.5; val beta = 0.3
    // unrolled Holt recursion: weight j of level/trend after n steps
    def weightsAt(n: Int): (Array[Double], Array[Double]) = {
      var lw = Array.tabulate(n)(j => if (j == 0) 1.0 else 0.0)
      var bw = Array.fill(n)(0.0)
      for (t <- 1 until n) {
        val nl = Array.tabulate(n)(j =>
          (1 - alpha) * (lw(j) + bw(j)) + (if (j == t) alpha else 0.0))
        val nb = Array.tabulate(n)(j => beta * (nl(j) - lw(j)) + (1 - beta) * bw(j))
        lw = nl; bw = nb
      }
      (lw, bw)
    }
    val mats = (1 to W).map(weightsAt)
    val lMat = mats.map(_._1); val bMat = mats.map(_._2)
    import TapFold.{sparkLit, sqlLit, fold, foldSql}

    Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val win = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(-(W - 1), 0)
        t(s, dir, "events").filter(col("value").isNotNull)
          .withColumn("trail", collect_list(col("value")).over(win))
          .select(col("event_id"), col("user_id"),
            fold(sparkLit(lMat)).as("holt_level"),
            fold(sparkLit(bMat)).as("holt_trend"))
          .orderBy("event_id")
      },
      Some(s"""
        WITH tw AS (
          SELECT event_id, user_id,
                 list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN ${W - 1} PRECEDING AND CURRENT ROW) AS trail
          FROM events WHERE value IS NOT NULL)
        SELECT event_id, user_id,
               ${foldSql(sqlLit(lMat))} AS holt_level,
               ${foldSql(sqlLit(bMat))} AS holt_trend
        FROM tw ORDER BY event_id"""))
  }

  // ---- s19_kalman: constant-velocity Kalman filter ---------------------
  // The state-space tier above Holt's fixed gains: a 1-D
  // constant-velocity Kalman filter (state = position+velocity, unit
  // timestep) whose gain schedule comes from the Riccati recursion —
  // which is INPUT-INDEPENDENT for fixed dt, so the gains K_t are
  // precomputed in Scala, and the filtered estimate (linear in the
  // observations, init x̂₁ = z₁, v̂₁ = 0) unrolls to the same
  // per-trail-length tap-weight matrices as s18. Truncated at 12 taps
  // (the filter restarts per trailing window — the oracle-able batch
  // form; unbounded streaming state is mapGroupsWithState territory,
  // see EventStream). Engine-exact micro-unit fold; one keyed exchange.
  private val s19: Q = {
    val W = 12
    val q = 0.1   // process-noise spectral density (σa²)
    val r = 4.0   // measurement-noise variance
    // Riccati gain schedule: P after the x̂₁ = z₁ init is [[r,0],[0,10]]
    val gains: Array[(Double, Double)] = {
      var p00 = r; var p01 = 0.0; var p10 = 0.0; var p11 = 10.0
      Array.tabulate(W) { _ =>
        // predict: P⁻ = F P Fᵀ + Q, F = [[1,1],[0,1]], Q = q·[[1/4,1/2],[1/2,1]]
        val a00 = p00 + p01 + p10 + p11 + q / 4
        val a01 = p01 + p11 + q / 2
        val a10 = p10 + p11 + q / 2
        val a11 = p11 + q
        val s = a00 + r
        val kp = a00 / s; val kv = a10 / s
        p00 = (1 - kp) * a00; p01 = (1 - kp) * a01
        p10 = a10 - kv * a00; p11 = a11 - kv * a01
        (kp, kv)
      }
    }
    // unroll: weight matrices for position/velocity vs each observation
    def weightsAt(n: Int): (Array[Double], Array[Double]) = {
      var sp = Array.tabulate(n)(j => if (j == 0) 1.0 else 0.0)
      var sv = Array.fill(n)(0.0)
      for (t <- 1 until n) {
        val (kp, kv) = gains(t - 1)
        val pr = Array.tabulate(n)(j => sp(j) + sv(j))  // predicted position
        val inn = Array.tabulate(n)(j => (if (j == t) 1.0 else 0.0) - pr(j))
        sp = Array.tabulate(n)(j => pr(j) + kp * inn(j))
        sv = Array.tabulate(n)(j => sv(j) + kv * inn(j))
      }
      (sp, sv)
    }
    val mats = (1 to W).map(weightsAt)
    val pMat = mats.map(_._1); val vMat = mats.map(_._2)
    import TapFold.{sparkLit, sqlLit, fold, foldSql}

    Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val win = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(-(W - 1), 0)
        t(s, dir, "events").filter(col("value").isNotNull)
          .withColumn("trail", collect_list(col("value")).over(win))
          .select(col("event_id"), col("user_id"),
            fold(sparkLit(pMat)).as("kalman_pos"),
            fold(sparkLit(vMat)).as("kalman_vel"))
          .orderBy("event_id")
      },
      Some(s"""
        WITH tw AS (
          SELECT event_id, user_id,
                 list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN ${W - 1} PRECEDING AND CURRENT ROW) AS trail
          FROM events WHERE value IS NOT NULL)
        SELECT event_id, user_id,
               ${foldSql(sqlLit(pMat))} AS kalman_pos,
               ${foldSql(sqlLit(vMat))} AS kalman_vel
        FROM tw ORDER BY event_id"""))
  }

  // ---- s20_acf: autocorrelation function per event_type ----------------
  // The seasonality diagnostic run before choosing smoothing/window
  // widths (s10/s11/s17): Pearson autocorrelation of the hourly-bucket
  // sums at lags 1–3, per event_type. Engine-exactness is the whole
  // design: bucket sums are decimal-exact (dsum), then floor-quantized
  // to integer ten-thousandths so every product/square in the Pearson
  // sums is EXACT integer decimal arithmetic — the computed-double
  // decimal-cast hazard (Det caveat) never arises. The final r is pure
  // IEEE over identical doubles, then floor-quantized. Lags ride one
  // window over the per-type exchange; the stack to (lag, pair) rows is
  // row-local. Three keyed exchanges total (bucket agg → per-type window
  // → type+lag agg), each on keys that only narrow — no join at any
  // scale.
  private val s20 = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val hourly = t(s, dir, "events")
        .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("bkt"))
        .agg(Det.dsum(col("value")).as("x"))
      val ser = hourly.select(col("event_type"), col("bkt"),
        floor(col("x") * 1e4 + 0.5).cast("long").as("xq"))
      val w = Window.partitionBy("event_type").orderBy("bkt")
      val st = ser
        .withColumn("l1", lag(col("xq"), 1).over(w))
        .withColumn("l2", lag(col("xq"), 2).over(w))
        .withColumn("l3", lag(col("xq"), 3).over(w))
        .selectExpr("event_type", "xq",
          "stack(3, 1, l1, 2, l2, 3, l3) AS (lg, yq)")
        .filter(col("yq").isNotNull)
      val dx = col("xq").cast(DecimalType(18, 0))
      val dy = col("yq").cast(DecimalType(18, 0))
      val agged = st.groupBy(col("event_type"), col("lg"))
        .agg(count(lit(1)).as("n"),
          sum(dx).as("sx"), sum(dy).as("sy"),
          sum(dx * dy).as("sxy"), sum(dx * dx).as("sxx"), sum(dy * dy).as("syy"))
      val nD = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      val vx = nD * d("sxx") - d("sx") * d("sx")
      val vy = nD * d("syy") - d("sy") * d("sy")
      val r = (nD * d("sxy") - d("sx") * d("sy")) / (sqrt(vx) * sqrt(vy))
      agged.select(col("event_type"), col("lg"), col("n"),
        when(vx > 0 && vy > 0, Det.qz(r)).otherwise(lit(null)).as("acf"))
        .orderBy("event_type", "lg")
    },
    Some(s"""
      WITH hourly AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS bkt,
               ${Det.dsumSql("value")} AS x
        FROM events GROUP BY 1, 2),
      ser AS (
        SELECT event_type, bkt, CAST(FLOOR(x * 1e4 + 0.5) AS BIGINT) AS xq
        FROM hourly),
      lagged AS (
        SELECT event_type, xq,
               lag(xq, 1) OVER w AS l1, lag(xq, 2) OVER w AS l2,
               lag(xq, 3) OVER w AS l3
        FROM ser WINDOW w AS (PARTITION BY event_type ORDER BY bkt)),
      st AS (
        SELECT event_type, 1 AS lg, xq, l1 AS yq FROM lagged WHERE l1 IS NOT NULL
        UNION ALL
        SELECT event_type, 2, xq, l2 FROM lagged WHERE l2 IS NOT NULL
        UNION ALL
        SELECT event_type, 3, xq, l3 FROM lagged WHERE l3 IS NOT NULL),
      agg AS (
        SELECT event_type, lg, COUNT(*) AS n,
               SUM(CAST(xq AS DECIMAL(18,0))) AS sx,
               SUM(CAST(yq AS DECIMAL(18,0))) AS sy,
               SUM(CAST(xq AS DECIMAL(18,0)) * yq) AS sxy,
               SUM(CAST(xq AS DECIMAL(18,0)) * xq) AS sxx,
               SUM(CAST(yq AS DECIMAL(18,0)) * yq) AS syy
        FROM st GROUP BY 1, 2)
      SELECT event_type, CAST(lg AS INTEGER) AS lg, n,
             CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                   AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
             THEN ${Det.qzSql(
               "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
               "(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
               "sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))")}
             ELSE NULL END AS acf
      FROM agg ORDER BY event_type, lg"""))

  // ---- s21_time_slice: pushed ts-range scan + daily rollup -------------
  // THE shape that dominates a 100 TB events table: a time-range
  // predicate that must reach the parquet scan (PushedFilters +
  // row-group min-max skipping — a one-week slice of a month reads
  // ~quarter of the row groups, and at warehouse scale a partition-
  // pruned fraction of the files), then a narrow daily/type rollup on
  // what survives. The range literals are strings cast in the UTC
  // session zone, so both engines compare the same wall-clock micros;
  // the loader guard (PlanAuditSpec "events: ts range predicate")
  // pins that this filter actually pushes instead of dying above a
  // cast. The distinct-user count plans Spark's standard two-phase
  // distinct aggregate — a first exchange keyed (day, type, user) then
  // the (day, type) re-agg — so the rollup is two keyed exchanges whose
  // second carries only group rows, all downstream of the pruned scan.
  private val s21 = Q(
    (s, dir) => {
      val e = t(s, dir, "events")
        .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
      e.groupBy(
        date_format(TimeSeries.timeBucket(col("ts"), 86400), "yyyy-MM-dd").as("day"),
        col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("day", "event_type")
    },
    Some(s"""
      SELECT strftime(make_timestamp((epoch_us(ts) // 86400000000) * 86400000000),
                      '%Y-%m-%d') AS day,
             event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value,
             COUNT(DISTINCT user_id) AS n_users
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY 1, 2 ORDER BY day, event_type"""))

  // ---- s22_seasonal_decompose: classical additive decomposition --------
  // The step after s20's diagnosis: split the hourly series into
  // trend + seasonal (classical decomposition, the moving-average form
  // STL descends from). Trend is the standard 2×24 centered MA for an
  // even period (two offset 24-wide ROWS frames averaged); the seasonal
  // index per hour-of-day is the mean detrended value, re-centered to
  // sum to zero per type. Missing grid hours are zero-filled first —
  // the sum of no events IS zero, so the grid join (per-type extent agg
  // → sequence+explode → one keyed left join) makes the ROWS frames
  // genuine 24-hour spans instead of gap-compressed ones. Engine
  // exactness mirrors s20: bucket sums decimal-exact then quantized to
  // integer ten-thousandths, both MA frames kept as INTEGER sums (the
  // detrended value 48·x − sA − sB is exact integer arithmetic), means
  // via decimal sums, floats only at the final quantized divisions.
  // Exchanges: the hourly agg is the only one that sees event rows;
  // everything after runs on types×hours rows (grid join keyed, one
  // per-type window pass carrying both frames, hod agg, and the
  // 24-row-per-type recenter window).
  private val s22 = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val hourly = t(s, dir, "events")
        .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("bkt"))
        .agg(Det.dsum(col("value")).as("x"))
        .select(col("event_type").as("ht"), col("bkt").as("hb"),
          floor(col("x") * 1e4 + 0.5).cast("long").as("xq"))
      val ext = hourly.groupBy(col("ht").as("et"))
        .agg(min(col("hb")).as("b0"), max(col("hb")).as("b1"))
      val grid = ext.select(col("et"), explode(sequence(col("b0"), col("b1"))).as("gb"))
      val ser = grid.join(hourly, col("et") === col("ht") && col("gb") === col("hb"), "left")
        .select(col("et").as("event_type"), col("gb").as("bkt"),
          coalesce(col("xq"), lit(0L)).as("xq"))
      val w = Window.partitionBy("event_type").orderBy("bkt")
      val wA = w.rowsBetween(-12, 11)
      val wB = w.rowsBetween(-11, 12)
      val det = ser
        .withColumn("sA", sum(col("xq")).over(wA))
        .withColumn("cA", count(lit(1)).over(wA))
        .withColumn("sB", sum(col("xq")).over(wB))
        .withColumn("cB", count(lit(1)).over(wB))
        .filter(col("cA") === 24 && col("cB") === 24)
        .select(col("event_type"), (col("bkt") % 24).cast("int").as("hod"),
          (col("xq") * 48 - col("sA") - col("sB")).as("d48"))
      val hm = det.groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n"),
          sum(col("d48").cast(DecimalType(28, 0))).as("sd"))
        .select(col("event_type"), col("hod"), col("n"),
          Det.qz(((col("sd").cast("double") / col("n")) / lit(48.0)) / lit(1e4), 6).as("mq"))
      val wT = Window.partitionBy("event_type")
      hm.select(col("event_type"), col("hod"), col("n"),
        Det.qz(col("mq") -
          sum(col("mq").cast(DecimalType(18, 6))).over(wT).cast("double") /
            count(lit(1)).over(wT), 6).as("seasonal"))
        .orderBy("event_type", "hod")
    },
    Some(s"""
      WITH hourly AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS bkt,
               ${dsumSql("value")} AS x
        FROM events GROUP BY 1, 2),
      hq AS (
        SELECT event_type, bkt, CAST(FLOOR(x * 1e4 + 0.5) AS BIGINT) AS xq
        FROM hourly),
      ext AS (SELECT event_type, MIN(bkt) AS b0, MAX(bkt) AS b1 FROM hq GROUP BY 1),
      grid AS (SELECT event_type, unnest(range(b0, b1 + 1)) AS bkt FROM ext),
      ser AS (
        SELECT g.event_type, g.bkt, COALESCE(h.xq, 0) AS xq
        FROM grid g LEFT JOIN hq h ON g.event_type = h.event_type AND g.bkt = h.bkt),
      ma AS (
        SELECT event_type, bkt, xq,
               SUM(xq) OVER wa AS sA, COUNT(*) OVER wa AS cA,
               SUM(xq) OVER wb AS sB, COUNT(*) OVER wb AS cB
        FROM ser
        WINDOW wa AS (PARTITION BY event_type ORDER BY bkt
                      ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING),
               wb AS (PARTITION BY event_type ORDER BY bkt
                      ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)),
      det AS (
        SELECT event_type, CAST(bkt % 24 AS INTEGER) AS hod,
               xq * 48 - sA - sB AS d48
        FROM ma WHERE cA = 24 AND cB = 24),
      hm AS (
        SELECT event_type, hod, COUNT(*) AS n,
               ${Det.qzSql("((CAST(SUM(CAST(d48 AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*)) / 48.0) / 1e4", 6)} AS mq
        FROM det GROUP BY 1, 2)
      SELECT event_type, hod, n,
             ${Det.qzSql("mq - CAST(SUM(CAST(mq AS DECIMAL(18,6))) OVER (PARTITION BY event_type) AS DOUBLE) / COUNT(*) OVER (PARTITION BY event_type)", 6)} AS seasonal
      FROM hm ORDER BY event_type, hod"""))

  val entries: Seq[(String, Q)] = Seq(
    "s1_resample" -> s1,
    "s20_acf" -> s20,
    "s17_ewma" -> s17,
    "s18_holt" -> s18,
    "s19_kalman" -> s19,
    "s2_sessionize" -> s2,
    "s3_asof_join" -> s3,
    "s4_range_join" -> s4,
    "s5_gap_fill" -> s5,
    "s6_interp_resample" -> s6,
    "s7_interval_join" -> s7,
    "s8_outliers" -> s8,
    "s9_ohlc" -> s9,
    "s10_seasonal" -> s10,
    "s11_moving_avg" -> s11,
    "s12_cusum" -> s12,
    "s13_attribution" -> s13,
    "s14_throttle" -> s14,
    "s15_lttb_downsample" -> s15,
    "s16_mad_outliers" -> s16,
    "s21_time_slice" -> s21,
    "s22_seasonal_decompose" -> s22)
}
