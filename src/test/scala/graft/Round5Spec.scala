package graft

import graft.functions.Sketches
import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._

/** Round-5 additions: Count-Min Sketch guarantees and SQ8 ANN recall. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 512

  test("cms never undercounts and respects the eps*N bound") {
    // zipf-ish stream: value v appears (2000 / v) times, v in [1, 50]
    val rows = (1 to 50).flatMap(v => Seq.fill(2000 / v)(v.toLong))
    val df = rows.toDF("v")
    val n = rows.size.toLong
    val sk = df.select(Sketches.hash63(col("v")).as("h"))
      .agg(Sketches.cms(col("h"), D, W).as("sk"))
    val checked = sk.crossJoin((1 to 50).map(_.toLong).toDF("probe"))
      .select(col("probe"),
        Sketches.cmsEstimate(col("sk"), Sketches.hash63(col("probe")), D, W).as("est"),
        Sketches.cmsTotal(col("sk"), W).as("total"))
      .collect()
    checked.foreach { r =>
      val (probe, est, total) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val exact = 2000L / probe
      assert(total == n, s"cms total $total != stream size $n")
      assert(est >= exact, s"cms undercounted $probe: est $est < exact $exact")
      // ε = e/W; δ = e^-4 < 2% per point — allow 2× headroom, and the
      // bound is deterministic here (fixed hashes, fixed stream)
      assert(est <= exact + 2 * math.E * n / W,
        s"cms overcount $probe: est $est, exact $exact, n $n")
    }
  }

  test("cms is partition-invariant and unions by elementwise add") {
    val df = (1L to 5000L).toDF("id")
    def sketch(parts: Int) =
      df.repartition(parts).select(Sketches.hash63(col("id")).as("h"))
        .agg(Sketches.cms(col("h"), D, W).as("sk"))
        .collect().head.getSeq[Long](0)
    assert(sketch(1) == sketch(13), "cms must be partition-invariant")

    // union(A, B) over disjoint halves == sketch of the whole
    val a = (1L to 2500L).toDF("id").select(Sketches.hash63(col("id")).as("h"))
      .agg(Sketches.cms(col("h"), D, W).as("ska"))
    val b = (2501L to 5000L).toDF("id").select(Sketches.hash63(col("id")).as("h"))
      .agg(Sketches.cms(col("h"), D, W).as("skb"))
    val merged = a.crossJoin(b)
      .select(Sketches.cmsUnion(col("ska"), col("skb")).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(merged == sketch(1), "cms union must equal the whole-stream sketch")
  }

  test("sqTopK recall tracks the brute-force baseline") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val cands = emb.filter(col("vec_id") >= 5)
    val brute = SimilaritySearch.bruteForceTopK(queries, cands, "vec_id", "embedding", 10)
      .select(col("qid").cast("long").as("qid"), col("cid"))
    val sq = SimilaritySearch.sqTopK(queries, cands, "vec_id", "embedding",
      dims = 64, k = 10, shortlist = 50)
      .select(col("qid").as("aqid"), col("cid").as("acid"))
    val recall = brute.join(sq,
        col("qid") === col("aqid") && col("cid") === col("acid"), "left")
      .agg((count(col("acid")).cast("double") / count(lit(1))).as("r"))
      .collect().head.getDouble(0)
    // SQ8 quantization error is tiny; with a 5x shortlist the re-ranked
    // top-10 should be near-exact
    assert(recall >= 0.9, s"sq recall $recall below floor")
  }

  test("sq codes stay in [0,255] and reconstruction error is small") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val (mins, deltas) = SimilaritySearch.sqTrain(emb, "vec_id", "embedding", 64)
    val coded = SimilaritySearch.sqEncodeWith(emb, "vec_id", "embedding", 64, mins, deltas)
    val row = coded.select(
      min(array_min(col("codes"))).as("lo"),
      max(array_max(col("codes"))).as("hi"),
      count(lit(1)).as("n")).collect().head
    assert(row.getInt(0) >= 0 && row.getInt(1) <= 255,
      s"codes out of range: [${row.getInt(0)}, ${row.getInt(1)}]")
    assert(row.getLong(2) == emb.count())
  }
}
