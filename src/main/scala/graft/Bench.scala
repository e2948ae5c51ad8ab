package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query at SPARK_GRAFT_SF_DIR and
  * prints the driver's one-line JSON. `count()` forces full execution of
  * the plan (scan → shuffle → agg) without driver-side result transfer.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builderDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One warm-up pass over a tiny query so JVM/codegen startup cost is not
    // billed to the first benchmarked query.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Optional args: run only the named queries (dev-loop use).
    val selected =
      if (args.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else args.toSeq.map { n =>
        // A typo'd name must fail loudly, not benchmark zero queries.
        n -> SparkEntry.queries.getOrElse(n, sys.error(
          s"unknown query '$n'; registered: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double): String = f"$v%.3f"
    def jline(rs: Seq[(String, Double)], extra: String = ""): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec"$extra,"queries":$qs,"sf":"$sfDir"}"""
    }
    // Full per-query line first (humans reading the raw log), then a
    // compact line with only the slowest 40 — the driver's log capture
    // keeps the LAST ~2000 chars of output, so the line it parses must
    // fit entirely inside that window; the full line (~2.6 KB at 110+
    // queries) does not.
    println(jline(results))
    println(jline(results.sortBy(-_._2).take(40),
      extra = s""","n_queries":${results.size}"""))
    spark.stop()
  }
}
