package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.Text

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
    // Stage 1: shingle explode + portable hash (no agg)
    val hashed = Tables.spread(docs, col("doc_id"))
      .select(col("doc_id").as("id"),
        explode(Text.shingles(Text.tokens(col("text")), 3)).as("sh"))
      .select(col("id"), pmod(Text.md5Long(col("sh")), lit(Text.minhashPrime)).as("h"))
    time("1.shingle+md5") { hashed.count() }
    time("1.shingle+md5 (2nd)") { hashed.count() }
    // Stage 1b: same but xxhash64 path
    val hashedXx = Tables.spread(docs, col("doc_id"))
      .select(col("doc_id").as("id"),
        explode(Text.shingleHashes(Text.tokens(col("text")), 3)).as("sh"))
      .select(col("id"), pmod(col("sh"), lit(Text.minhashPrime)).as("h"))
    time("1b.shingle+xxhash") { hashedXx.count() }
    // Stage 2: signature agg
    val sig = hashed.groupBy(col("id")).agg(expr("graft_minhash_sig(h, 32)").as("sig"))
    time("2.sig-agg") { sig.count() }
    // Stage 3: full candidates
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text", portableHash = true)
    time("3.candidates") { cands.count() }
    time("3.candidates (2nd)") { cands.count() }
    // Stage 4: full d13 query
    val q = SparkEntry.queries("d13_minhash_dedup")
    time("4.d13-full") { q(spark, sfDir).collect() }
    time("4.d13-full (2nd)") { q(spark, sfDir).collect() }
    spark.stop()
  }
}
