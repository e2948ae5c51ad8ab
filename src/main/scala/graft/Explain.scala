package graft
import org.apache.spark.sql.SparkSession

/** Plan inspector. `runMain graft.Explain q1 q2 ...` prints formatted
  * plans; `runMain graft.Explain --snapshot PLANS.md q1 q2 ...` writes
  * them to a markdown file instead — the committed plan-shape artifact
  * reviewers diff across rounds (exchange counts, join strategies,
  * pushed filters for the most expensive rows).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, 8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val (out, names) = args.toSeq match {
      case Seq("--snapshot") =>
        sys.error("--snapshot needs a file operand: Explain --snapshot PLANS.md q1 ...")
      case "--snapshot" +: file +: rest => (Some(file), rest)
      case rest => (None, rest)
    }
    def planOf(name: String): String =
      // a typo'd name fails loudly with the registry, like Bench
      SparkEntry.queries.getOrElse(name, sys.error(
        s"unknown query '$name'; registered: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
    out match {
      case None =>
        names.foreach { n => println(s"======== $n ========"); println(planOf(n)) }
      case Some(file) =>
        val body = names.map { n =>
          val p = planOf(n)
          // the tree plus per-node summaries; elide nothing — the value
          // of the artifact is diffing exchange/join/pushdown lines
          s"## $n\n\n```\n$p```\n"
        }.mkString
        val header =
          s"""# Plan-shape snapshots (`graft.Explain --snapshot`)
             |
             |Formatted physical plans for the listed registry queries at
             |`$dir`. Regenerate with:
             |`sbt "runMain graft.Explain --snapshot PLANS.md ${names.mkString(" ")}"`.
             |Diff across rounds to catch plan regressions (new exchanges,
             |lost broadcasts, dropped PushedFilters) that timings alone
             |can hide behind machine noise.
             |
             |""".stripMargin
        java.nio.file.Files.write(java.nio.file.Paths.get(file),
          (header + body).getBytes("UTF-8"))
        println(s"wrote ${names.size} plans to $file")
    }
    spark.stop()
  }
}
