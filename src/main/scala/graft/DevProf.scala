package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Throwaway dev profiler (not part of the library). */
object DevProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32, 32)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairs = Dedup.ngramJaccardPairs(
      Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 80),
      "doc_id", "text", "lang", maxShingleDf = 40, minJaccardInv = 100)
    time("pairs.count") { pairs.count() }
    // replicate connectedComponents with per-phase timing
    val p = spark.sparkContext.defaultParallelism
    val edges = time("edges.ckpt") {
      pairs.select(col("id1").as("src"), col("id2").as("dst"))
        .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
        .distinct()
        .repartition(p, col("dst"))
        .localCheckpoint(true)
    }
    var labels = time("labels.ckpt") {
      edges.select(col("src").as("id")).distinct()
        .withColumn("lbl", col("id"))
        .repartition(p, col("id"))
        .localCheckpoint(true)
    }
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
      val hop = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"), labels("lbl").as("old_lbl"),
          least(labels("lbl"), coalesce(col("nlbl"), labels("lbl"))).as("lbl"))
      val next = time(s"round$iter.ckpt") {
        hop.as("x").join(
          hop.select(col("id").as("jid"), col("lbl").as("jlbl")).as("y"),
          col("x.lbl") === col("y.jid"), "left")
          .select(col("x.id").as("id"), col("x.old_lbl").as("old_lbl"),
            least(col("x.lbl"), coalesce(col("y.jlbl"), col("x.lbl"))).as("lbl"))
          .localCheckpoint(true)
      }
      changed = time(s"round$iter.count") {
        next.filter(col("lbl") =!= col("old_lbl")).count()
      }
      labels = next.select(col("id"), col("lbl"))
      iter += 1
    }
    println(s"PROF rounds $iter")
    spark.stop()
  }
}
