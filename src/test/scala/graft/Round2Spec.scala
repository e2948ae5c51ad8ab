package graft

import graft.functions.{Seawater, Text}
import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._

/** Round-2 additions: URL canonicalization, oxygen solubility / freezing
  * point check values, IVF ANN recall against the brute-force baseline.
  */
class Round2Spec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(Text.canonicalUrl(col("u")).as("c"))
      .collect().head.getString(0)

  test("canonicalUrl lowers scheme+host, strips default port and fragment") {
    assert(canon("HTTP://Example.COM:80/a#frag") == "http://example.com/a")
    assert(canon("HTTPS://X.org:443/a") == "https://x.org/a")
    // non-default ports survive
    assert(canon("http://x.org:8080/a") == "http://x.org:8080/a")
    // :443 is NOT default for http
    assert(canon("http://x.org:443/a") == "http://x.org:443/a")
  }

  test("canonicalUrl strips tracking params, sorts the rest, trims slashes") {
    assert(canon("http://x.org/a/?b=2&utm_source=f&a=1") == "http://x.org/a?a=1&b=2")
    assert(canon("http://x.org/?utm_campaign=c&gclid=g&fbclid=f") == "http://x.org")
    assert(canon("http://x.org/a///") == "http://x.org/a")
    assert(canon("http://x.org") == "http://x.org")
  }

  test("conservative temperature matches the reference polynomial") {
    // 28.812329772185855 = the reference's gsw_ct_from_pt(34.7118, 28.7856)
    // (gsw_oceanographic_toolbox.c:1401-1440) evaluated verbatim — the
    // GSW check-table value 28.8099 is for in-situ t, not pt.
    val ct = Seq((34.7118, 28.7856)).toDF("sa", "pt")
      .select(Seawater.conservativeTemp(col("sa"), col("pt")).as("ct"))
      .collect().head.getDouble(0)
    assert(math.abs(ct - 28.812329772185855) < 1e-9, s"ct=$ct")
  }

  test("oxygen solubility and freezing point match published check values") {
    val row = Seq((35.0, 10.0)).toDF("s", "t")
      .select(Seawater.o2Solubility(col("s"), col("t")).as("o2"),
        Seawater.freezingPoint(col("s"), lit(0.0)).as("tf"),
        Seawater.freezingPoint(col("s"), lit(500.0)).as("tfp"))
      .collect().head
    assert(math.abs(row.getDouble(0) - 274.61) < 0.05, s"o2sol=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - (-1.9223)) < 0.0005, s"tf=${row.getDouble(1)}")
    // pressure term: −7.53e−4 °C/dbar
    assert(math.abs(row.getDouble(2) - row.getDouble(1) + 0.3765) < 1e-9)
  }

  test("grouped top-k custom operator matches the window shape exactly") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val custom = graft.operators.TopK.perKey(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 7)
      .collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val windowed = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(custom == windowed)
    // the custom path must NOT sort partitions — that is its point
    val plan = graft.operators.TopK.perKey(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), plan.take(800))
    assert(!plan.contains("Sort "), s"unexpected sort: ${plan.take(800)}")
  }

  test("PQ codes compress with reconstruction error below signal energy") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val enc = SimilaritySearch.pqEncode(emb, "vec_id", "embedding", 64)
    val avgErr = enc.agg(avg(col("err"))).collect().head.getDouble(0)
    val avgVv = emb.select(avg(
      graft.functions.Text.dotFast(col("embedding"), col("embedding"))))
      .collect().head.getDouble(0)
    // 16-entry codebooks per 8-dim subspace must beat the zero-code
    // reconstruction (err == ||v||²) by a clear margin
    assert(avgErr < avgVv * 0.8, s"avgErr=$avgErr vs energy=$avgVv")
    val shapes = enc.select(size(col("codes"))).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(shapes == Seq(8), s"code shapes: $shapes")
  }

  test("PQ ADC search recalls the exact top-k from code space") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val brute = SimilaritySearch.bruteForceTopK(q, c, "vec_id", "embedding", 10)
      .select(col("qid"), col("cid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = SimilaritySearch.pqAdcTopK(q, c, "vec_id", "embedding", 64, 10)
      .select(col("qid"), col("cid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(adc).size.toDouble / brute.size
    // pure code-space scan is coarse by design (8×16 books) — the floor
    // only guards against total degradation
    assert(recall >= 0.2, s"pure ADC recall $recall below floor")
    // ADC shortlist + exact re-rank is the production shape: recall jumps
    val reranked = SimilaritySearch.pqAdcRerankTopK(q, c, "vec_id", "embedding", 64, 10)
      .select(col("qid"), col("cid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rrRecall = brute.intersect(reranked).size.toDouble / brute.size
    assert(rrRecall >= 0.6, s"reranked recall $rrRecall below floor")
    assert(rrRecall >= recall, "re-rank must not lose recall")
  }

  test("IVF ANN recall vs brute force on the test embeddings") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val brute = SimilaritySearch.bruteForceTopK(q, c, "vec_id", "embedding", 10)
      .select(col("qid"), col("cid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilaritySearch.ivfTopK(q, c, "vec_id", "embedding", 10,
      nCentroids = 10, nProbe = 3, iters = 3)
      .select(col("qid"), col("cid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall below floor (nProbe=3 of 10 lists)")
  }
}
