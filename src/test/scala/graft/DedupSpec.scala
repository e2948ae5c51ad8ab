package graft

import graft.operators.{Dedup, Multimodal, SimilaritySearch}
import org.apache.spark.sql.functions._

/** Behavior specs for the dedup family / ANN / multimodal plumbing on
  * planted fixtures (the synthetic `documents` table has no true
  * near-dups, so candidates are constructed here).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
  private def fixture = Seq(
    (0L, base),
    (1L, base),                                     // exact dup of 0
    (2L, base.replace("lazy", "sleepy")),           // near dup of 0
    (3L, "completely different content about spark shuffles and joins entirely"),
    (4L, base.replace("quick", "slow").replace("far", "near"))) // near dup
    .toDF("doc_id", "text")

  test("exact dedup groups identical content") {
    val g = Dedup.exact(fixture, "doc_id", "text").collect()
    val dupGroup = g.filter(_.getAs[Long]("n_copies") == 2L)
    assert(dupGroup.length == 1 && dupGroup.head.getAs[Long]("keep_id") == 0L)
    assert(g.length == 4) // 5 docs, one pair merged
  }

  test("ngram jaccard finds planted near-dups and skips unrelated") {
    val pairs = Dedup.ngramJaccardPairs(
      fixture.withColumn("lang", lit("en")), "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("containment finds a short doc embedded in a long one that jaccard misses") {
    // doc 20 is a strict prefix of doc 21 (one fifth of it): containment
    // of the short side is 1.0 while jaccard is far below any dedup cut
    val unit = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    val docs = Seq(
      (20L, unit),
      (21L, unit + "one two three four five six seven eight nine ten " * 8),
      (22L, "unrelated words entirely about other things and more stuff"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = Dedup.containmentPairs(docs, "doc_id", "text", "lang",
      minContainmentPct = 90)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getAs[Double]("c1"), r.getAs[Double]("c2")))).toMap
    assert(got.contains((20L, 21L)), s"containment pair missed: ${got.keySet}")
    val (c1, c2) = got((20L, 21L))
    assert(c1 == 1.0, s"short-side containment should be exact: $c1")
    assert(c2 < 0.5, s"long side must not read as contained: $c2")
    // jaccard on the same pair stays below the d2 default keep threshold
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", minJaccardInv = 1)
      .collect()
    assert(j.forall(r => r.getAs[Long]("inter_cnt").toDouble /
      r.getAs[Long]("union_cnt") < 0.5))
    assert(!got.keySet.exists { case (a, b) => a == 22L || b == 22L })
  }

  test("dbscan assigns core/border/noise with deterministic min-label clusters") {
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f); parts.foreach { case (i, v) => a(i) = v }; a
    }
    // 1,2,3: tight cluster along dim 0 (pairwise cos ≈ 1 → all cores).
    // 4: similar ONLY to 3 (cos(3,4) ≈ 0.83, cos(1/2,4) ≈ 0.55 < ε) →
    //    one neighbor → border, attached to cluster 1.
    // 5: orthogonal → noise.
    val pts = Seq(
      (1L, vec(0 -> 1.0f)),
      (2L, vec(0 -> 1.0f, 1 -> 0.05f)),
      (3L, vec(0 -> 1.0f, 2 -> 0.6f)),
      (4L, vec(0 -> 0.4f, 2 -> 0.6f)),
      (5L, vec(5 -> 1.0f))).toDF("vec_id", "embedding")
    val got = Dedup.dbscan(pts, "vec_id", "embedding", minCosine = 0.7, minPts = 2)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(got(1L)._2 == "core" && got(1L)._3.contains(1L))
    assert(got(2L)._2 == "core" && got(2L)._3.contains(1L))
    assert(got(3L)._2 == "core" && got(3L)._3.contains(1L))
    assert(got(4L)._2 == "border" && got(4L)._3.contains(1L), s"got ${got(4L)}")
    assert(got(5L)._2 == "noise" && got(5L)._3.isEmpty)
    assert(got(5L)._1 == 0L)
  }

  test("connected components label near-dup clusters by min member id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (10L, 3L)).toDF("id1", "id2")
    val cc = Dedup.connectedComponents(pairs, "id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // {1,2,3,10} chained through 2-3 and 10-3; {7,8} separate
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("minhash LSH candidates cover high-jaccard pairs") {
    // 16 bands × 2 rows targets J ≳ 0.25 — the planted near-dups sit at
    // J ≈ 0.6-0.7 after shingle dedup, so they must surface.
    val cands = Dedup.minhashCandidates(fixture, "doc_id", "text", k = 32, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L)), "exact dup must collide in every band")
    assert(cands.contains((0L, 2L)), "one-word-out near dup should collide")
    assert(!cands.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash est_jaccard is 1.0 for identical docs") {
    val est = Dedup.minhashCandidates(fixture, "doc_id", "text")
      .filter(col("id1") === 0 && col("id2") === 1)
      .select("est_jaccard").as[Double].head()
    assert(est == 1.0)
  }

  test("simhash candidates find near dups within hamming bound") {
    val cands = Dedup.simhashCandidates(fixture, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L)))
    assert(!cands.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("ANN LSH finds planted near neighbors (top-1 recall)") {
    // queries are small perturbations of known candidates: cos ≈ 0.999,
    // so every LSH table keeps them together with high probability.
    def lcg(seed: Long): Double = {
      val x = (seed * 6364136223846793005L + 1442695040888963407L) >>> 11
      (x % 2000003L).toDouble / 1000001.5 - 1.0
    }
    val cands = (0 until 40).map { i =>
      (100L + i, (0 until 16).map(d => lcg(i * 31 + d).toFloat).toArray)
    }
    val queries = (0 until 10).map { i =>
      (i.toLong, cands(i * 3)._2.zipWithIndex.map { case (v, d) =>
        v + 0.01f * lcg(997 + i * 17 + d).toFloat })
    }
    val cDf = cands.toDF("vec_id", "embedding")
    val qDf = queries.toDF("vec_id", "embedding")
    val top1 = SimilaritySearch.lshTopK(qDf, cDf, "vec_id", "embedding",
      dims = 16, bits = 4, k = 1, tables = 4)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = (0 until 10).count(i => top1.get(i.toLong).contains(100L + i * 3))
    assert(hits >= 8, s"planted-neighbor top-1 recall too low: $hits/10")
  }

  test("ANN LSH candidates are a subset of brute-force scoring universe") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val approx = SimilaritySearch.lshTopK(q, c, "vec_id", "embedding", 64, 4, 10, tables = 2)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(approx.nonEmpty)
    assert(approx.forall { case (qid, cid) => qid < 5 && cid >= 5 })
  }

  test("IVF ANN finds planted near neighbors (top-1 recall)") {
    def lcg(seed: Long): Double = {
      val x = (seed * 6364136223846793005L + 1442695040888963407L) >>> 11
      (x % 2000003L).toDouble / 1000001.5 - 1.0
    }
    val cands = (0 until 40).map { i =>
      (100L + i, (0 until 16).map(d => lcg(i * 31 + d).toFloat).toArray)
    }
    val queries = (0 until 10).map { i =>
      (i.toLong, cands(i * 3)._2.zipWithIndex.map { case (v, d) =>
        v + 0.01f * lcg(997 + i * 17 + d).toFloat })
    }
    val cDf = cands.toDF("vec_id", "embedding")
    val qDf = queries.toDF("vec_id", "embedding")
    val top1 = SimilaritySearch.ivfTopK(qDf, cDf, "vec_id", "embedding",
      k = 1, nCentroids = 4, nProbe = 2)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = (0 until 10).count(i => top1.get(i.toLong).contains(100L + i * 3))
    assert(hits >= 8, s"IVF planted-neighbor top-1 recall too low: $hits/10")
  }

  // splitmix-style mix: the single-multiply LCG used for the ANN recall
  // fixtures leaves nearby seeds correlated enough that unrelated vectors
  // hit cos > 0.95 — near-dup thresholds need properly decorrelated noise
  private def smix(seed: Long): Double = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    ((z >>> 12) & 0xfffffL).toDouble / 524287.5 - 1.0
  }
  private def cosineFixture = {
    val vecs = (0 until 20).map { i =>
      (i.toLong, (0 until 16).map(d => smix(i * 131 + d).toFloat).toArray)
    }
    // 100 = copy of 0 (cos 1.0), 101 = small perturbation of 1 (cos ≈ .999)
    val planted = Seq(
      (100L, vecs(0)._2.clone()),
      (101L, vecs(1)._2.zipWithIndex.map { case (v, d) => v + 0.01f * smix(500 + d).toFloat }))
    (vecs ++ planted).toDF("vec_id", "embedding")
  }

  test("embedding cosine near-dup: exact path finds planted dups only") {
    val pairs = Dedup.embeddingCosinePairs(cosineFixture, "vec_id", "embedding", minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 100L), (1L, 101L)), s"got $pairs")
  }

  test("embedding cosine near-dup: LSH-blocked path recovers planted dups") {
    val emb = cosineFixture
    val blocked = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding",
      minCosine = 0.95, blockBits = 4, tables = 4, dims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-identical vectors collide in every table; unrelated pairs are
    // filtered by the cosine threshold even when buckets collide
    assert(blocked == Set((0L, 100L), (1L, 101L)), s"got $blocked")
    // and the blocked result is a subset of the exact path by construction
    val exact = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exact))
  }

  test("approx percentile sketch lands within its accuracy bound") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val row = li.agg(
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap"),
      expr("percentile(l_extendedprice, 0.5)").as("ex")).collect()(0)
    val (ap, ex) = (row.getDouble(0), row.getDouble(1))
    // accuracy=1000 ⇒ rank error ≤ n/1000; translate to a loose value
    // tolerance via the observed spread
    assert(math.abs(ap - ex) / ex < 0.05, s"approx $ap vs exact $ex")
  }

  test("bloom-prefiltered incremental dedup returns exactly the new docs") {
    val existing = Seq((0L, "doc alpha"), (1L, "doc beta"), (2L, "doc gamma"))
      .toDF("doc_id", "text")
    val incoming = Seq((10L, "doc beta"), (11L, "doc delta"), (12L, "doc epsilon"),
      (13L, "doc alpha")).toDF("doc_id", "text")
    val out = Dedup.newDocuments(existing, incoming, "doc_id", "text",
      expectedItems = 100L, fpp = 0.03)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(11L, 12L))
  }

  test("approx sketches: deterministic under repartitioning, near exact") {
    val docs = Tables.load(spark, sfDir, "lineitem")
    def approx(parts: Int): Long = docs.repartition(parts)
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("a"))
      .collect()(0).getLong(0)
    val exact = docs.select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val a8 = approx(8); val a3 = approx(3)
    assert(a8 == a3, "HLL merge must be partitioning-insensitive")
    assert(math.abs(a8 - exact).toDouble / exact < 0.1)
  }

  test("multimodal decode stub: schema, sniffing, deterministic features") {
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')
    val docs = Seq(
      (10L, pngMagic ++ Array.fill[Byte](100)(7)),
      (11L, Array[Byte](0xff.toByte, 0xd8.toByte) ++ Array.fill[Byte](50)(3)),
      (12L, "plain text bytes".getBytes("UTF-8")))
      .toDF("media_id", "bin")
    val out = Multimodal.decodeStub(docs, "media_id", "bin")
    assert(out.schema.fieldNames.toSeq ==
      Seq("media_id", "format", "byte_len", "feature"))
    val rows = out.orderBy("media_id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("png", "jpeg", "unknown"))
    assert(rows(0).getInt(2) == 104)
    val feat = rows(0).getSeq[Double](3)
    assert(feat.length == 8 && math.abs(feat.sum - 1.0) < 1e-9)
  }

  test("byteSample slices at stride") {
    val df = Seq((1L, ("ABCDEFGHIJ" * 10).getBytes("UTF-8"))).toDF("id", "bin")
    val out = df.select(Multimodal.byteSample(col("bin"), stride = 20, n = 3, width = 2).as("s"))
      .collect()(0).getSeq[Array[Byte]](0)
    assert(out.map(new String(_)).toSeq == Seq("AB", "AB", "AB"))
  }
}
