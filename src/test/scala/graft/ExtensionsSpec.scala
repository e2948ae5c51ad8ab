package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** The custom-expression tier: DotProductF eval/codegen semantics, the
  * injected SQL function, and the HOF→native optimizer rewrite.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot SQL function is injected and computes the dot product") {
    val v = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double].head()
    assert(v == 11.0)
  }

  test("null semantics match the HOF fold: length mismatch and null element") {
    val rows = spark.sql("""
      SELECT graft_dot(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS a,
             graft_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS b
    """).collect()(0)
    assert(rows.isNullAt(0) && rows.isNullAt(1))
  }

  test("optimizer rewrites the declarative HOF shape to DotProductF") {
    // parquet-backed input so constant folding can't collapse the plan
    // before the rewrite is visible
    val df = Tables.load(spark, sfDir, "embeddings")
      .select(Text.dotFast(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), s"rewrite did not fire:\n$optimized")
    val local = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(Text.dotFast(col("a"), col("b")).as("d"))
    assert(local.as[Double].head() == 11.0)
  }

  test("MinHashSigAgg equals the row-local signature expression") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("id", "text")
    val rowLocal = docs.select(col("id"),
      Text.minhashSignature(Text.shingles(Text.tokens(col("text")), 3), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hashed = docs
      .select(col("id"), explode(Text.shingles(Text.tokens(col("text")), 3)).as("sh"))
      .select(col("id"), pmod(xxhash64(col("sh")), lit(Text.minhashPrime)).as("h"))
      .repartition(4) // force partial buffers + merge
    val agged = hashed.groupBy("id").agg(expr("graft_minhash_sig(h, 16)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(agged == rowLocal)
  }

  test("fast cosine agrees with exact cosine on real embeddings") {
    val emb = Tables.load(spark, sfDir, "embeddings").limit(50)
    val pairs = emb.as("x").crossJoin(emb.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(
        Text.cosine(col("x.embedding"), col("y.embedding")).as("exact"),
        Text.cosineFast(col("x.embedding"), col("y.embedding")).as("fast"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1e-6 + 1e-12,
        s"exact=${r.getDouble(0)} fast=${r.getDouble(1)}")
    }
  }
}
