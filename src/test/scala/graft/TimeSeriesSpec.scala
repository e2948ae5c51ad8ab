package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Semantics pins for the time-series operators on hand-built fixtures. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the most recent right row at or before left ts") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 11:00:00")),
      (3L, 10L, ts("2024-01-01 09:00:00")),  // before any right row
      (4L, 20L, ts("2024-01-01 10:30:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 101L),
      (10L, ts("2024-01-01 10:00:00"), 102L),  // equal ts → visible (<=)
      (10L, ts("2024-01-01 10:59:00"), 103L),
      (20L, ts("2024-01-01 10:30:00"), 201L))
      .toDF("user_id", "ts", "purchase_id")
    val out = TimeSeries.asOfJoin(left, right, Seq("user_id"), "ts", "ts", Seq("purchase_id"))
      .orderBy("event_id")
      .select("event_id", "asof_purchase_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(out.toSeq == Seq(
      (1L, Some(102L)), (2L, Some(103L)), (3L, None), (4L, Some(201L))))
  }

  test("asOfJoin ties at equal right timestamps resolve deterministically") {
    val left = Seq((1L, 10L, ts("2024-01-01 11:00:00"))).toDF("event_id", "user_id", "ts")
    // two purchases at the identical timestamp: the carried value must be
    // the max payload-head (last in the (ts, side, payload-head) order),
    // independent of input or partition order
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 555L),
      (10L, ts("2024-01-01 10:00:00"), 111L))
      .toDF("user_id", "ts", "purchase_id")
    (1 to 3).foreach { _ =>
      val out = TimeSeries.asOfJoin(left, right.repartition(4), Seq("user_id"),
        "ts", "ts", Seq("purchase_id"))
        .select("asof_purchase_id").collect()(0).getLong(0)
      assert(out == 555L)
    }
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00")),  // gap exactly 1800s → same session
      (1L, ts("2024-01-01 11:00:01")),  // 1801s → new session
      (2L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    val out = TimeSeries.sessionize(df, "user_id", "ts", 1800L)
      .select("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 0L), (1L, 1L), (2L, 0L)))
  }

  test("timeBucket floors to bucket start") {
    val df = Seq(ts("2024-01-01 10:31:22")).toDF("ts")
    val out = df.select(TimeSeries.timeBucket(col("ts"), 3600).as("b"))
      .as[Timestamp].head()
    assert(out == ts("2024-01-01 10:00:00"))
  }

  test("s19: unrolled Kalman weights equal the direct filter on real data") {
    // replay the plain constant-velocity Kalman recursion (predict +
    // gain update with the same Riccati schedule) per user over the
    // 12-tap trail and compare every row
    val W = 12; val q = 0.1; val r = 4.0
    val gains: Array[(Double, Double)] = {
      var p00 = r; var p01 = 0.0; var p10 = 0.0; var p11 = 10.0
      Array.tabulate(W) { _ =>
        val a00 = p00 + p01 + p10 + p11 + q / 4
        val a01 = p01 + p11 + q / 2
        val a10 = p10 + p11 + q / 2
        val a11 = p11 + q
        val s2 = a00 + r
        val kp = a00 / s2; val kv = a10 / s2
        p00 = (1 - kp) * a00; p01 = (1 - kp) * a01
        p10 = a10 - kv * a00; p11 = a11 - kv * a01
        (kp, kv)
      }
    }
    val got = SparkEntry.queries("s19_kalman")(spark, sfDir)
      .collect().map(x => (x.getLong(0), (x.getDouble(2), x.getDouble(3)))).toMap
    val rows = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("value").isNotNull)
      .select("user_id", "ts", "event_id", "value")
      .collect()
      .map(x => (x.getLong(0), x.get(1).toString, x.getLong(2), x.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3))
    def qz(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    var checked = 0
    rows.groupBy(_._1).foreach { case (_, evs) =>
      val vals = evs.map(_._4)
      for (i <- evs.indices) {
        val trail = vals.slice(math.max(0, i - (W - 1)), i + 1)
        var pos = trail(0); var vel = 0.0
        for (t2 <- 1 until trail.length) {
          val (kp, kv) = gains(t2 - 1)
          val pred = pos + vel
          val inn = trail(t2) - pred
          pos = pred + kp * inn
          vel = vel + kv * inn
        }
        val (gp, gv) = got(evs(i)._3)
        assert(math.abs(gp - qz(pos)) < 1.1e-4,
          s"pos mismatch at event ${evs(i)._3}: got $gp want ~$pos")
        assert(math.abs(gv - qz(vel)) < 1.1e-4,
          s"vel mismatch at event ${evs(i)._3}: got $gv want ~$vel")
        checked += 1
      }
    }
    assert(checked > 100)
  }

  test("s18: unrolled Holt weights equal the direct recursion on real data") {
    // the registry query computes level/trend through the precomputed
    // weight matrices; replay the plain Holt recursion per user over the
    // same 12-tap trail with the same micro-unit quantization and compare
    // every row
    val W = 12; val alpha = 0.5; val beta = 0.3
    val got = SparkEntry.queries("s18_holt")(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getDouble(2), r.getDouble(3)))).toMap

    val rows = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("value").isNotNull)
      .select("user_id", "ts", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3))
    def qz(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    var checked = 0
    rows.groupBy(_._1).foreach { case (_, evs) =>
      val vals = evs.map(_._4)
      for (i <- evs.indices) {
        val trail = vals.slice(math.max(0, i - (W - 1)), i + 1)
        var l = trail(0); var b = 0.0
        for (t2 <- 1 until trail.length) {
          val prev = l
          l = alpha * trail(t2) + (1 - alpha) * (l + b)
          b = beta * (l - prev) + (1 - beta) * b
        }
        // the engine rounds per-tap products to micro-units (≤0.5e-6 per
        // tap), which can push the pre-quantization value across one
        // 1e-4 boundary of the final Det.qz — tolerate exactly one
        // quantum plus the tap rounding, not recursion drift
        val (gl, gt) = got(evs(i)._3)
        assert(math.abs(gl - qz(l)) < 1.1e-4,
          s"level mismatch at event ${evs(i)._3}: got $gl want ~$l")
        assert(math.abs(gt - qz(b)) < 1.1e-4,
          s"trend mismatch at event ${evs(i)._3}: got $gt want ~$b")
        checked += 1
      }
    }
    assert(checked > 100)
  }
}
