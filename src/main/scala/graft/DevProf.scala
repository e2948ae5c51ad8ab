package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Throwaway dev profiler (not part of the library). */
object DevProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    time("docs.count") { docs.count() }
    val fpsMd5 = Dedup.winnowingFingerprints(docs, "doc_id", "text", 8, 4, portableHash = true)
    val fpsXx = Dedup.winnowingFingerprints(docs, "doc_id", "text", 8, 4, portableHash = false)
    time("fps.xxhash.count") { fpsXx.count() }
    time("fps.xxhash.count2") { fpsXx.count() }
    time("fps.md5.count") { fpsMd5.count() }
    time("fps.md5.count2") { fpsMd5.count() }
    time("pairs.md5.count") { Dedup.winnowingPairs(fpsMd5, 100, 3).count() }
    spark.stop()
  }
}
