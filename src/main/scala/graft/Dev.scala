package graft

import graft.functions.Text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the library surface). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    val k = 32; val bands = 8; val rows = k / bands
    // warm-up read
    time("read")(docs.count())
    val hashed = docs
      .select(col("doc_id").as("id"),
        explode(Text.shingles(Text.tokens(col("text")), 3)).as("sh"))
      .select(col("id"), pmod(xxhash64(col("sh")), lit(Text.minhashPrime)).as("h"))
    time("explode+hash")(hashed.count())
    val sig = hashed.groupBy(col("id")).agg(expr(s"graft_minhash_sig(h, $k)").as("sig"))
    time("sig_agg")(sig.count())
    val banded = sig.select(col("id"), col("sig"),
      explode(Text.minhashBandKeys(col("sig"), bands, rows)).as("band_key"))
    time("banded")(banded.count())
    val joined = banded.as("a").join(banded.as("b"),
      col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
    time("band_join")(joined.count())
    val scored = joined
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y), b => b))
          .cast("double") / k).as("est_jaccard"))
      .dropDuplicates("id1", "id2")
    time("scored_dedup")(scored.count())
    time("full_again")(scored.count())
    spark.stop()
  }
}
