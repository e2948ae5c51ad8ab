package graft

import graft.functions.Sketches
import org.apache.spark.sql.functions._

/** Round-3 additions: KMV/theta sketch correctness and error bounds. */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  private val K = 256

  test("theta sketch is exact below k and partition-invariant") {
    val df = (1L to 100L).toDF("id")
    val sk = df.select(Sketches.hash63(col("id")).as("h"))
      .agg(Sketches.thetaSketch(col("h"), K).as("sk"))
    val est = sk.select(Sketches.distinctEstimate(col("sk"), K).as("e"))
      .collect().head.getDouble(0)
    assert(est == 100.0, s"exact-below-k estimate: $est")

    // the k smallest distinct hashes of a set do not depend on layout
    val a = sk.collect().head.getSeq[Long](0)
    val b = df.repartition(7).select(Sketches.hash63(col("id")).as("h"))
      .agg(Sketches.thetaSketch(col("h"), K).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(a == b, "sketch must be partition-invariant")
  }

  test("theta sketch distinct estimate within KMV error bound") {
    val n = 20000L
    val est = (1L to n).toDF("id")
      .select(Sketches.hash63(col("id")).as("h"))
      .agg(Sketches.thetaSketch(col("h"), K).as("sk"))
      .select(Sketches.distinctEstimate(col("sk"), K).as("e"))
      .collect().head.getDouble(0)
    // RSE ≈ 1/sqrt(k-2) ≈ 6.3%; allow 5 sigma
    assert(math.abs(est - n) / n < 0.32, s"estimate $est for n=$n")
  }

  test("theta sketch union and intersection estimates track planted overlap") {
    // A = [1, 12000], B = [8001, 20000] → |A∪B| = 20000, |A∩B| = 4000
    val a = (1L to 12000L).toDF("id")
      .select(Sketches.hash63(col("id")).as("h"))
      .agg(Sketches.thetaSketch(col("h"), K).as("ska"))
    val b = (8001L to 20000L).toDF("id")
      .select(Sketches.hash63(col("id")).as("h"))
      .agg(Sketches.thetaSketch(col("h"), K).as("skb"))
    val row = a.crossJoin(b).select(
      Sketches.unionEstimate(col("ska"), col("skb"), K).as("u"),
      Sketches.intersectEstimate(col("ska"), col("skb"), K).as("i"),
      Sketches.jaccardEstimate(col("ska"), col("skb"), K).as("j"))
      .collect().head
    val (u, i, j) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(math.abs(u - 20000) / 20000 < 0.32, s"union estimate $u")
    // intersection RSE is amplified by 1/jaccard (~5×); generous bound
    assert(math.abs(i - 4000) / 4000 < 0.75, s"intersect estimate $i")
    assert(j > 0.05 && j < 0.5, s"jaccard estimate $j (true 0.2)")
  }

  test("ivfPqTopK recall tracks the brute-force baseline") {
    import graft.operators.SimilaritySearch
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val brute = SimilaritySearch.bruteForceTopK(q, c, "vec_id", "embedding", 10)
      .select(col("qid"), col("cid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = SimilaritySearch.ivfPqTopK(q, c, "vec_id", "embedding", 64, 10,
      nCentroids = 10, nProbe = 4, ivfIters = 3, shortlist = 50)
      .select(col("qid"), col("cid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivfpq).size.toDouble / brute.size
    // nProbe=3/10 bounds recall like plain IVF; PQ only reorders WITHIN
    // probed lists and the 5× shortlist + exact re-rank recovers ADC
    // quantization error
    assert(recall >= 0.5, s"IVF-PQ recall $recall below floor")
  }

  test("k4_theta_setops runs and estimates match exact pairwise overlap") {
    val out = SparkEntry.queries("k4_theta_setops")(spark, sfDir).collect()
    assert(out.nonEmpty)
    // exact pairwise overlap recomputed directly; every estimate within
    // the k=256 KMV bound (5 sigma) of its exact value
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    out.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val (sa, sb) = (ev(ta), ev(tb))
      assert(r.getLong(2) == sa.size && r.getLong(3) == sb.size)
      val exactU = (sa ++ sb).size.toDouble
      val exactI = (sa & sb).size.toDouble
      val estU = r.getDouble(5)
      val estI = r.getDouble(6)
      assert(math.abs(estU - exactU) / exactU < 0.32, s"$ta/$tb union $estU vs $exactU")
      if (exactI > 100)
        assert(math.abs(estI - exactI) / exactI < 0.9, s"$ta/$tb intersect $estI vs $exactI")
    }
  }
}
