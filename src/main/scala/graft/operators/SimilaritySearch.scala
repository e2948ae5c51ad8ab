package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.C).
  *
  * Baseline: brute-force cosine — broadcast the (small) query set, score
  * map-side, keep top-k per query with a bounded per-partition heap
  * (window over rounded score). Scale path: random-hyperplane LSH
  * bucketing so each query only scores its bucket — candidate count drops
  * by ~2^bits while recall stays tunable.
  */
object SimilaritySearch {

  /** Brute-force cosine top-k. `queries` must be broadcast-small (it is
    * sent to every executor); `candidates` streams map-side — no shuffle
    * until the final per-query top-k, which is keyed on query id.
    * Ordering is on the *rounded* cosine + candidate id so results are
    * engine- and partitioning-stable.
    *
    * Two-phase scoring: phase 1 scores every pair with the codegen'd
    * double-fold dot (native DotProductF after the HOF rewrite) and keeps
    * only each query's top-k fast band — shuffling (qid, cid, score)
    * triples, never vectors. Phase 2 joins the ~k survivors back to their
    * vectors and rescores with the decimal-exact cosine (interpreted
    * BigDecimal folds, ~10× costlier per pair). The fast band carries a
    * 2e-6 margin below the k-th fast score — orders of magnitude wider
    * than the ≤ ~1e-12 double-vs-decimal summation gap — so the band
    * provably contains the exact top-k and the result is bit-identical
    * to exact-scoring everything.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      sqrt(Text.dotFast(col(vecCol), col(vecCol))).as("qnf"))
    val c = graft.Tables.spread(candidates, col(idCol))
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"),
        sqrt(Text.dotFast(col(vecCol), col(vecCol))).as("cnf"))
    // Phase 1: map-side fast scores (fast norms too — the band margin
    // covers their ulp-level gap from the exact norms); one keyed
    // shuffle of scalar triples.
    val fast = broadcast(q).crossJoin(c)
      .select(col("qid"), col("cid"),
        (Text.dotFast(col("qvec"), col("cvec")) / (col("qnf") * col("cnf"))).as("fcos"))
    val wf = Window.partitionBy("qid").orderBy(col("fcos").desc, col("cid"))
    val wAll = Window.partitionBy("qid")
    val banded = fast
      .withColumn("frnk", row_number().over(wf))
      .withColumn("kth", max(when(col("frnk") === k, col("fcos"))).over(wAll))
      .filter(col("kth").isNull || col("fcos") >= col("kth") - 2e-6)
      .select("qid", "cid")
    // Phase 2: fetch vectors for the ~k survivors; ALL decimal-exact
    // arithmetic (dot and norms) happens here, on ~k rows per query.
    val surv = banded
      .join(broadcast(q), "qid")
      .join(c, "cid")
    val rescored = surv.select(col("qid"), col("cid"),
      graft.Det.qz(Text.dotExact(col("qvec"), col("cvec")).cast("double") /
        (sqrt(Text.norm2Exact(col("qvec")).cast("double")) *
          sqrt(Text.norm2Exact(col("cvec")).cast("double"))), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    rescored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Deterministic ±1 hyperplane component for (plane, dim) — same
    * splitmix-style mix as the MinHash parameters, no RNG state.
    */
  private def planeSign(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 1299709L + dim.toLong * 15485863L + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0 else -1.0
  }

  /** Random-hyperplane LSH bucket id: `bits` sign bits of dot(v, plane_j).
    * Map-only projection; equal buckets ⇒ likely-close vectors.
    */
  def lshBucket(vec: org.apache.spark.sql.Column, dims: Int, bits: Int,
                planeOffset: Int = 0): org.apache.spark.sql.Column =
    (0 until bits).map { j =>
      val dot = (0 until dims).map { d =>
        element_at(vec, d + 1).cast("double") * lit(planeSign(planeOffset + j, d))
      }.reduce(_ + _)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** IVF (inverted-file) ANN top-k — the trained-partition scale path the
    * LSH variant complements: KMeans centroids learned from the candidate
    * set, candidates inverted into their nearest-centroid list, queries
    * probing the `nProbe` nearest lists. Scoring joins on the centroid
    * id (keyed shuffle); centroid assignment for queries is a broadcast
    * join against the tiny centroid table ranked by the native
    * dot-product distance — fully declarative, no driver-side math.
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCentroids: Int = 8, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = candidates.sparkSession
    import spark.implicits._

    val train = candidates.select(array_to_vector(col(vecCol)).as("features"))
    val model = new KMeans().setK(nCentroids).setSeed(42L).setMaxIter(10)
      .fit(train)
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }.toSeq.toDF("centroid_id", "centroid")

    // squared L2 to centroid via dot products: |v-c|² = v·v − 2 v·c + c·c
    def dist2(v: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      Text.dotFast(v, v) - lit(2.0) * Text.dotFast(v, c) + Text.dotFast(c, c)

    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame = {
      val scored = df.select(col(idCol).as(id), col(vecCol).as(vec))
        .crossJoin(broadcast(centroids))
        .withColumn("cdist", dist2(col(vec), col("centroid")))
      val w = Window.partitionBy(id).orderBy(col("cdist"), col("centroid_id"))
      scored.withColumn("crnk", row_number().over(w))
        .filter(col("crnk") <= keep)
        .drop("centroid", "cdist", "crnk")
    }

    val cAssigned = assign(candidates, "cid", "cvec", keep = 1)
    val qAssigned = assign(queries, "qid", "qvec", keep = nProbe)
    val scored = qAssigned.join(cAssigned, "centroid_id")
      .select(col("qid"), col("cid"), col("qvec"), col("cvec"))
      .dropDuplicates("qid", "cid")
      .select(col("qid"), col("cid"), Text.cosineFast(col("qvec"), col("cvec")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** LSH-bucketed ANN top-k: queries and candidates are bucketed with the
    * same planes; scoring joins on bucket equality (keyed shuffle, no
    * cross join). `tables` is the OR-amplification knob: independent
    * plane sets, a pair is a candidate if it collides in ANY table —
    * recall rises as 1-(1-p^bits)^tables while per-bucket cost stays
    * bounded. Recall < 1 by construction — the spec pins it against
    * [[bruteForceTopK]].
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame,
              idCol: String, vecCol: String, dims: Int, bits: Int, k: Int,
              tables: Int = 1): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        explode(array((0 until tables).map(t =>
          concat_ws(":", lit(t),
            lshBucket(col(vecCol), dims, bits, planeOffset = t * bits))): _*)).as("bucket"))
    val q = bucketed(queries, "qid", "qvec")
    val c = bucketed(candidates, "cid", "cvec")
    val scored = q.join(c, "bucket")
      .select(col("qid"), col("cid"), col("qvec"), col("cvec"))
      .dropDuplicates("qid", "cid")
      // fast path: cosineFast compiles to the native DotProductF via the
      // injected optimizer rule (non-oracle scoring, so the decimal-exact
      // form isn't required here)
      .select(col("qid"), col("cid"), Text.cosineFast(col("qvec"), col("cvec")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
