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

  test("misra-gries covers all true heavy hitters with bounded undercount") {
    // item i appears (4000 / i) times for i in [1, 100]: N ≈ 20778.
    // With k=32 every item with freq > N/33 (≈630) MUST appear → items
    // 1..6 guaranteed; counters undercount by ≤ N/33.
    val rows = (1 to 100).flatMap(i => Seq.fill(4000 / i)(f"item$i%03d"))
    val n = rows.size.toLong
    val hh = rows.toDF("item").repartition(11)
      .agg(Sketches.heavyHitters(col("item"), 32).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = n / 33
    for (i <- 1 to 100) {
      val item = f"item$i%03d"
      val exact = 4000L / i
      if (exact > bound)
        assert(hh.contains(item), s"guaranteed heavy hitter $item (freq $exact) missing")
      hh.get(item).foreach { c =>
        assert(c <= exact, s"$item overcounted: $c > $exact")
        assert(c >= exact - bound, s"$item undercounted past N/(k+1): $c < $exact - $bound")
      }
    }
  }

  test("misra-gries merge is order-insensitive across partition layouts") {
    val rows = (1 to 60).flatMap(i => Seq.fill(i * 3)(s"w$i"))
    def run(parts: Int) = rows.toDF("item").repartition(parts)
      .agg(Sketches.heavyHitters(col("item"), 16).as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e.item"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // exact equality across layouts is NOT an MG guarantee (merge order
    // shifts counters), but the top item survives any layout and every
    // run respects the undercount bound
    for (p <- Seq(1, 7, 23)) {
      val got = run(p)
      assert(got.nonEmpty && got.map(_._1).contains("w60"),
        s"dominant item missing at $p partitions: $got")
      val n = rows.size.toLong
      got.foreach { case (item, c) =>
        val exact = item.drop(1).toLong * 3
        assert(c <= exact && c >= exact - n / 17, s"bound violated for $item at $p parts")
      }
    }
  }

  test("weighted sampling is layout-invariant and weight-biased") {
    import graft.operators.Sampling
    // 400 items, weight = item id → heavier items must dominate the sample
    val df = (1L to 400L).map(i => (i, i.toDouble, "g")).toDF("id", "w", "grp")
    def ids(parts: Int) = Sampling.weightedSample(
        df.repartition(parts), "id", "w", "grp", 50)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val a = ids(1)
    assert(a.length == 50 && a == ids(13),
      "ES sample must not depend on partition layout")
    // E[mean id of a weight∝id sample] ≈ 267 vs uniform 200; the
    // deterministic hash realization lands near it
    val meanSel = a.sum.toDouble / a.length
    assert(meanSel > 220.0, s"weighted sample not biased toward heavy items: $meanSel")

    // zero/negative weights are never selected
    val z = (1L to 100L).map(i => (i, if (i <= 90) 0.0 else 1.0, "g"))
      .toDF("id", "w", "grp")
    val zi = Sampling.weightedSample(z, "id", "w", "grp", 20)
      .select("id").collect().map(_.getLong(0))
    assert(zi.forall(_ > 90) && zi.length == 10,
      s"zero-weight rows leaked into the sample: ${zi.toSeq}")
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
