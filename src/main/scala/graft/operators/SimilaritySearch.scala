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

  /** Column wrapper for a raw Catalyst expression. */
  private def exprCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftSqlShim.column(e)
  private def exprOf(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftSqlShim.expression(c)

  /** (subspace, code, centroid) triples → dense [subspace][code][dim]
    * array for the native quantizer expressions.
    */
  private def booksToArray(books: Seq[(Int, Int, Array[Double])]): Array[Array[Array[Double]]] = {
    val byS = books.groupBy(_._1)
    (0 to books.map(_._1).max).map(s => byS(s).sortBy(_._2).map(_._3).toArray).toArray
  }

  /** Nearest-centroid id via the native [[graft.plans.NearestCentroidExpr]]
    * kernel: the centroid table rides as a plain JVM array on the
    * expression object (O(1) plan-tree size — a literal encoding instead
    * re-walks thousands of nodes per optimizer pass) and the argmin is a
    * primitive codegen loop. Distance is the comparable c·c − 2·v·c with
    * strict `<` keeping the earlier id on ties — deterministic, and
    * bit-identical to the HOF fold it replaced.
    */
  private def nearestExpr(v: org.apache.spark.sql.Column,
                          cents: Array[Array[Double]]): org.apache.spark.sql.Column =
    exprCol(graft.plans.NearestCentroidExpr(exprOf(v), cents))

  /** Deterministic hash-ordered training sample: one distributed
    * TakeOrdered pass (O(corpus) scan, O(sample) result) whose size is
    * CONSTANT in the corpus — the FAISS convention: quantizers train on
    * a bounded sample, never the full corpus. At 100 TB this is the only
    * index-build step that touches the driver, and it moves
    * `max × dims` floats (≈2 MB at the defaults) — the same footprint
    * class as a broadcast bloom filter.
    */
  private def trainingSample(vectors: DataFrame, idCol: String, vecCol: String,
                             max: Int): Array[Array[Double]] =
    vectors.orderBy(xxhash64(col(idCol)), col(idCol)).limit(max)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** In-memory Lloyd's rounds over the training sample. Same semantics
    * as the distributed assignment expression ([[nearestExpr]]): argmin
    * of c·c − 2·v·c with strict `<` (earlier id wins ties), empty
    * clusters keep their previous centroid.
    */
  private def lloyd(sample: Array[Array[Double]], seeds: Array[Array[Double]],
                    iters: Int): Array[Array[Double]] = {
    var cents = seeds
    for (_ <- 0 until iters) {
      val dims = cents.head.length
      val sums = Array.fill(cents.length)(new Array[Double](dims))
      val ns = new Array[Long](cents.length)
      val cc = cents.map(c => c.map(x => x * x).sum)
      sample.foreach { v =>
        var best = -1
        var bd = Double.MaxValue
        var i = 0
        while (i < cents.length) {
          var dot = 0.0
          var d = 0
          val c = cents(i)
          while (d < dims) { dot += v(d) * c(d); d += 1 }
          val dist = cc(i) - 2.0 * dot
          if (dist < bd) { bd = dist; best = i }
          i += 1
        }
        ns(best) += 1
        var d = 0
        while (d < dims) { sums(best)(d) += v(d); d += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, i) =>
        if (ns(i) == 0) old else sums(i).map(_ / ns(i))
      }
    }
    cents
  }

  /** Coarse-quantizer training (shared by [[ivfTopK]] and [[ivfPqTopK]]):
    * deterministic hash-ordered sample (bounded at `trainSample`), then
    * `iters` in-memory Lloyd's rounds on the driver. Training cost is
    * constant in the corpus size; the corpus itself is touched exactly
    * once (the sampling TakeOrdered). Assignment/inversion of the full
    * corpus stays distributed and map-side ([[nearestExpr]]).
    */
  def trainCoarseCentroids(candidates: DataFrame, idCol: String, vecCol: String,
                           nCentroids: Int, iters: Int,
                           trainSample: Int = 4096): Array[Array[Double]] = {
    val sample = trainingSample(candidates, idCol, vecCol, trainSample)
    coarseFromSample(sample, nCentroids, iters)
  }

  private def coarseFromSample(sample: Array[Array[Double]], nCentroids: Int,
                               iters: Int): Array[Array[Double]] =
    lloyd(sample, sample.take(nCentroids), iters)

  def ivfTopK(queries: DataFrame, candidates: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCentroids: Int = 8, nProbe: Int = 2,
              iters: Int = 3): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val c0 = graft.Tables.spread(candidates, col(idCol))
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    val cents = trainCoarseCentroids(candidates, idCol, vecCol, nCentroids, iters)

    val centroids = cents.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat)) }.toSeq.toDF("centroid_id", "centroid")

    // candidates: map-side inversion, no join, no window
    val cAssigned = c0.withColumn("centroid_id", nearestExpr(col("cvec"), cents))
    // queries: nProbe nearest lists via ranked broadcast join (tiny side)
    def qdist(v: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      Text.dotFast(c, c) - lit(2.0) * Text.dotFast(v, c)
    val wq = Window.partitionBy("qid").orderBy(col("cdist"), col("centroid_id"))
    val qAssigned = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", qdist(col("qvec"), col("centroid")))
      .withColumn("crnk", row_number().over(wq))
      .filter(col("crnk") <= nProbe)
      .drop("centroid", "cdist", "crnk")

    val scored = qAssigned.join(cAssigned, "centroid_id")
      .select(col("qid"), col("cid"), Text.cosineFast(col("qvec"), col("cvec")).as("cos"))
    rankTopK(scored, k)
  }

  /** PQ encode as ONE native struct expression ([[graft.plans.PqEncodeExpr]]):
    * per-subspace argmin codes + total squared reconstruction error in a
    * single primitive codegen loop — the map-only encode kernel shared
    * by [[pqEncodeWith]] and [[ivfPqTopK]]'s index build. No explode, no
    * shuffle, no codebook literals in the plan.
    */
  private def pqEncodeCol(v: org.apache.spark.sql.Column,
                          books: Seq[(Int, Int, Array[Double])]): org.apache.spark.sql.Column =
    exprCol(graft.plans.PqEncodeExpr(exprOf(v), booksToArray(books)))

  /** Product quantization: split `dims` into `subspaces` blocks, train a
    * `codebookSize`-entry codebook per block (all blocks in one
    * declarative Lloyd pipeline), and encode every vector as `subspaces`
    * small code ids — 64-dim float32 (256 B) becomes 8 bytes at the
    * default settings, the compression that makes billion-vector ANN
    * storable. Returns (codes array<int>, err: total squared
    * reconstruction error) per id. Codebooks are index metadata
    * (subspaces·codebookSize·subDim doubles to the driver — same
    * footprint class as a broadcast bloom filter).
    */
  /** Train per-subspace PQ codebooks: one hash-ordered training sample
    * (bounded, see [[trainingSample]]), then independent in-memory
    * Lloyd's per subspace over the sample's slices. Seeds are the first
    * `codebookSize` sample vectors sliced per subspace — deterministic.
    * Returns (subspace, code, centroid) triples.
    */
  def pqTrain(vectors: DataFrame, idCol: String, vecCol: String, dims: Int,
              subspaces: Int = 8, codebookSize: Int = 16,
              iters: Int = 2, trainSample: Int = 4096): Seq[(Int, Int, Array[Double])] =
    pqTrainFromSample(trainingSample(vectors, idCol, vecCol, trainSample),
      dims, subspaces, codebookSize, iters)

  private def pqTrainFromSample(sample: Array[Array[Double]], dims: Int,
                                subspaces: Int, codebookSize: Int,
                                iters: Int): Seq[(Int, Int, Array[Double])] = {
    require(dims % subspaces == 0, s"$dims dims must split evenly into $subspaces subspaces")
    val subDim = dims / subspaces
    (0 until subspaces).flatMap { s =>
      val sub = sample.map(_.slice(s * subDim, (s + 1) * subDim))
      lloyd(sub, sub.take(codebookSize), iters).zipWithIndex
        .map { case (c, j) => (s, j, c) }
    }
  }

  /** Encode vectors against trained codebooks — MAP-ONLY: each subspace
    * code is a bounded argmin fold over its codebook literal, the code
    * array and the reconstruction error assemble in the same projection.
    * No explode, no regroup, no shuffle — at 100 TB encoding is a pure
    * scan, which is what makes PQ index builds embarrassingly parallel.
    * Returns (id, codes array<int>, err).
    */
  def pqEncodeWith(vectors: DataFrame, idCol: String, vecCol: String, dims: Int,
                   books: Seq[(Int, Int, Array[Double])]): DataFrame =
    graft.Tables.spread(vectors, col(idCol))
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), pqEncodeCol(col("v"), books).as("pq"))
      .select(col("id"), col("pq.codes").as("codes"), col("pq.err").as("err"))

  /** Train + encode in one call. */
  def pqEncode(vectors: DataFrame, idCol: String, vecCol: String, dims: Int,
               subspaces: Int = 8, codebookSize: Int = 16,
               iters: Int = 2): DataFrame =
    pqEncodeWith(vectors, idCol, vecCol, dims,
      pqTrain(vectors, idCol, vecCol, dims, subspaces, codebookSize, iters))

  /** Per-query ADC lookup table as ONE constant-size in-plan expression:
    * the trained codebooks ride along as a nested literal
    * (subspace → code → centroid vector) and lut(s)(j) = ||q_s − c_sj||²
    * is a bounded `transform`/`aggregate` fold over it — the same
    * compile-once shape as [[nearestExpr]]. Because the LUT is a column,
    * the query side stays a DataFrame in the plan (broadcast, never
    * collected): query batches of any size spill to executors, not the
    * driver.
    */
  private def adcLut(qv: org.apache.spark.sql.Column,
                     books: Seq[(Int, Int, Array[Double])],
                     subspaces: Int, subDim: Int): org.apache.spark.sql.Column =
    exprCol(graft.plans.AdcLutExpr(exprOf(qv), booksToArray(books)))

  /** `nProbe` nearest inverted-list ids as an in-plan column
    * ([[graft.plans.ProbeListExpr]]): distances against the JVM centroid
    * array, (dist, id)-lexicographic order so ties break on the earlier
    * id — identical to the array_sort-on-structs contract.
    */
  private def probeList(qv: org.apache.spark.sql.Column,
                        cents: Array[Array[Double]],
                        nProbe: Int): org.apache.spark.sql.Column =
    exprCol(graft.plans.ProbeListExpr(exprOf(qv), cents, nProbe))

  /** PQ ADC (asymmetric distance) top-k: candidates are searched in CODE
    * space — the query computes one small lookup table per subspace
    * (||q_s − centroid||², in-plan against the trained-book literal, the
    * same metadata footprint as the books themselves) and each
    * candidate's distance is `m` table lookups over its byte codes
    * instead of a `dims`-wide float scan. This is how billion-vector
    * corpora are searched: the vectors themselves never leave storage.
    * Approximate by construction (quantization error) — spec-pinned
    * recall vs the exact path.
    */
  def pqAdcTopK(queries: DataFrame, candidates: DataFrame,
                idCol: String, vecCol: String, dims: Int, k: Int,
                subspaces: Int = 8, codebookSize: Int = 16,
                iters: Int = 2): DataFrame = {
    val books = pqTrain(candidates, idCol, vecCol, dims, subspaces, codebookSize, iters)
    val coded = pqEncodeWith(candidates, idCol, vecCol, dims, books)
      .select(col("id").as("cid"), col("codes"))
    val subDim = dims / subspaces
    // per-query LUT: lut(s)(j) = ||q_s − c_sj||², computed IN-PLAN as a
    // bounded HOF over the codebook literal on the (broadcast) query
    // side — the queries DataFrame flows into the plan, nothing is
    // collected to the driver, so a large query batch degrades to a
    // bigger broadcast instead of a driver OOM. The lambda cast also
    // accepts float OR double vector columns.
    val qdf = broadcast(queries
      .select(col(idCol).cast("long").as("qid"), col(vecCol).as("qv"))
      .select(col("qid"), adcLut(col("qv"), books, subspaces, subDim).as("lut")))
    val scored = coded.crossJoin(qdf)
      .select(col("qid"), col("cid"),
        aggregate(
          transform(sequence(lit(0), lit(subspaces - 1)),
            s => element_at(element_at(col("lut"), s + 1),
              element_at(col("codes"), s + 1) + 1)),
          lit(0.0), (a, b) => a + b).as("adc_dist"))
    val top = TopK.perKey(scored, Seq("qid"), Seq(("adc_dist", true), ("cid", true)), k)
    val w = Window.partitionBy("qid").orderBy(col("adc_dist"), col("cid"))
    top.withColumn("rnk", row_number().over(w))
  }

  /** ADC + exact re-rank — the production PQ search shape: the cheap
    * code-space scan cuts to a `shortlist` per query, and only those
    * rows join back to their full vectors for exact scoring. Recall
    * approaches exact as shortlist/k grows while the full-vector scan
    * cost stays `shortlist·queries`, not `corpus·queries`.
    */
  def pqAdcRerankTopK(queries: DataFrame, candidates: DataFrame,
                      idCol: String, vecCol: String, dims: Int, k: Int,
                      shortlist: Int = 50, subspaces: Int = 8,
                      codebookSize: Int = 16, iters: Int = 2): DataFrame = {
    val cand = pqAdcTopK(queries, candidates, idCol, vecCol, dims, shortlist,
      subspaces, codebookSize, iters)
      .select(col("qid"), col("cid"))
    val cv = candidates.select(col(idCol).as("cid2"), col(vecCol).as("cvec"))
    val qv = broadcast(queries.select(col(idCol).as("qid2"), col(vecCol).as("qvec")))
    val rescored = cand.join(cv, col("cid") === col("cid2")).join(qv, col("qid") === col("qid2"))
      .select(col("qid"), col("cid"), Text.cosineFast(col("qvec"), col("cvec")).as("cos"))
    rankTopK(rescored, k)
  }

  /** IVF + PQ ADC + exact re-rank — the production billion-vector layout
    * (FAISS IVFPQ-style) composed from the coarse quantizer and the PQ
    * codebooks: candidates live in inverted lists as 8-byte codes, a
    * query broadcasts its per-subspace distance LUT and its `nProbe`
    * list ids, ADC scores ONLY the probed lists' codes (m table lookups
    * per candidate, no float math), the shortlist re-ranks against full
    * vectors. At scale nothing about the candidate side ever shuffles:
    * list assignment and encoding are map-side at index-build time, the
    * probe join is a broadcast of (qid, lut, probes) computed in-plan
    * ([[adcLut]]/[[probeList]] — queries are never collected), and the
    * shortlist cut runs through the bounded-heap GroupedTopK node.
    */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame,
                idCol: String, vecCol: String, dims: Int, k: Int,
                nCentroids: Int = 8, nProbe: Int = 2, ivfIters: Int = 2,
                subspaces: Int = 8, codebookSize: Int = 16, pqIters: Int = 2,
                shortlist: Int = 50): DataFrame = {
    // ONE sampling pass feeds both quantizers — the coarse centroids and
    // the PQ codebooks train on the same bounded sample, so the corpus
    // is touched once for all index-build metadata.
    val sample = trainingSample(candidates, idCol, vecCol, 4096)
    val cents = coarseFromSample(sample, nCentroids, ivfIters)
    val books = pqTrainFromSample(sample, dims, subspaces, codebookSize, pqIters)
    val subDim = dims / subspaces

    // index build: codes + inverted-list id per candidate in ONE
    // projection over one scan — both the PQ encode and the coarse
    // assignment are bounded map-side folds, so building the index
    // never shuffles the corpus.
    val index = graft.Tables.spread(candidates, col(idCol))
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .select(col("cid"),
        pqEncodeCol(col("cv"), books).getField("codes").as("codes"),
        nearestExpr(col("cv"), cents).as("centroid_id"))

    // query prep IN-PLAN on the broadcast side: the ADC LUT is a bounded
    // HOF over the codebook literal ([[adcLut]]) and the probe list an
    // array_sort over the centroid literal ([[probeList]]) — the queries
    // DataFrame flows into the plan, nothing collects to the driver.
    val qdf = broadcast(queries
      .select(col(idCol).cast("long").as("qid"), col(vecCol).as("qv"))
      .select(col("qid"), adcLut(col("qv"), books, subspaces, subDim).as("lut"),
        probeList(col("qv"), cents, nProbe).as("probes")))

    val scored = index.join(qdf, array_contains(col("probes"), col("centroid_id")))
      .select(col("qid"), col("cid"),
        aggregate(
          transform(sequence(lit(0), lit(subspaces - 1)),
            s => element_at(element_at(col("lut"), s + 1),
              element_at(col("codes"), s + 1) + 1)),
          lit(0.0), (a, b) => a + b).as("adc_dist"))
    val short = TopK.perKey(scored, Seq("qid"),
      Seq(("adc_dist", true), ("cid", true)), shortlist)

    val cv = candidates.select(col(idCol).as("cid2"), col(vecCol).as("cvec"))
    val qvec = broadcast(queries.select(col(idCol).cast("long").as("qid2"), col(vecCol).as("qvec")))
    val rescored = short.join(cv, col("cid") === col("cid2"))
      .join(qvec, col("qid") === col("qid2"))
      .select(col("qid"), col("cid"), Text.cosineFast(col("qvec"), col("cvec")).as("cos"))
    rankTopK(rescored, k)
  }

  /** Per-query top-k + rank: the bulk cut runs through the custom
    * bounded-heap plan node (no partition sort of the full candidate
    * set); the rank column is a window over only the k·queries
    * survivors.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val top = TopK.perKey(scored, Seq("qid"), Seq(("cos", false), ("cid", true)), k)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    top.withColumn("rnk", row_number().over(w))
  }

  /** Per-dimension scalar-quantization parameters (min, delta) trained
    * on the bounded hash-ordered sample — the FAISS SQ8 convention:
    * ranges come from a sample, codes clamp to [0, 255], so training
    * cost is constant in the corpus size. Zero-range dims get delta=1
    * (every code 0, reconstructs to the constant).
    */
  def sqTrain(candidates: DataFrame, idCol: String, vecCol: String, dims: Int,
              trainSample: Int = 4096): (Array[Double], Array[Double]) = {
    val sample = trainingSample(candidates, idCol, vecCol, trainSample)
    val mins = Array.fill(dims)(Double.MaxValue)
    val maxs = Array.fill(dims)(Double.MinValue)
    sample.foreach { v =>
      var d = 0
      while (d < dims) {
        if (v(d) < mins(d)) mins(d) = v(d)
        if (v(d) > maxs(d)) maxs(d) = v(d)
        d += 1
      }
    }
    val deltas = Array.tabulate(dims) { d =>
      val r = (maxs(d) - mins(d)) / 255.0
      if (r > 0.0) r else 1.0
    }
    (mins, deltas)
  }

  /** Encode vectors to int8-range codes — MAP-ONLY, like [[pqEncodeWith]]:
    * one bounded HOF over (vector, literal min/delta arrays) per row, no
    * shuffle. Returns (id, codes array<int>, rnorm: ‖reconstruction‖) —
    * 4× compression on the stored column (int8-range values; a packed
    * binary writer takes it to exactly 1 byte/dim) with the
    * reconstruction norm precomputed so cosine search never revisits the
    * float vector.
    */
  def sqEncodeWith(vectors: DataFrame, idCol: String, vecCol: String, dims: Int,
                   mins: Array[Double], deltas: Array[Double]): DataFrame = {
    val minLit = array(mins.toIndexedSeq.map(lit(_)): _*)
    val deltaLit = array(deltas.toIndexedSeq.map(lit(_)): _*)
    val codes = transform(sequence(lit(0), lit(dims - 1)), j =>
      greatest(lit(0L), least(lit(255L),
        floor((element_at(col("v"), j + 1).cast("double") - element_at(minLit, j + 1)) /
          element_at(deltaLit, j + 1) + 0.5d).cast("long"))).cast("int"))
    val rsq = aggregate(
      transform(sequence(lit(0), lit(dims - 1)), j => {
        val r = element_at(minLit, j + 1) +
          element_at(col("codes"), j + 1).cast("double") * element_at(deltaLit, j + 1)
        r * r
      }),
      lit(0.0), (a, b) => a + b)
    graft.Tables.spread(vectors, col(idCol))
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), codes.as("codes"))
      .select(col("id"), col("codes"), sqrt(rsq).as("rnorm"))
  }

  /** SQ8 ADC search + exact re-rank: candidates are scanned as int codes
    * (asymmetric — the query stays float), scoring
    * cos ≈ q·x̂ / (‖q‖·‖x̂‖) where x̂_j = min_j + code_j·δ_j unrolls to
    * `offset_q + Σ_j (q_j·δ_j)·code_j` — per-query offset and weights are
    * in-plan columns broadcast with the query row, so the
    * candidate-side scan is `dims` long-multiply-adds per pair over the
    * compressed codes. Shortlist cut via the bounded-heap GroupedTopK,
    * exact cosine re-rank on the shortlist only — the same
    * compressed-scan / exact-tail split as [[pqAdcRerankTopK]], at 4×
    * (vs PQ's 32×) compression but far lower quantization error.
    */
  def sqTopK(queries: DataFrame, candidates: DataFrame,
             idCol: String, vecCol: String, dims: Int, k: Int,
             shortlist: Int = 50): DataFrame = {
    val (mins, deltas) = sqTrain(candidates, idCol, vecCol, dims)
    val coded = sqEncodeWith(candidates, idCol, vecCol, dims, mins, deltas)
      .select(col("id").as("cid"), col("codes"), col("rnorm"))
    // per-query ADC metadata IN-PLAN on the broadcast query side:
    // offset = Σ q_j·min_j, weights w_j = q_j·δ_j, qnorm = ‖q‖ — bounded
    // HOFs over literal min/delta arrays. The lambda casts accept float
    // OR double vector columns, and queries never collect to the driver.
    val minLit = array(mins.toIndexedSeq.map(lit(_)): _*)
    val deltaLit = array(deltas.toIndexedSeq.map(lit(_)): _*)
    val qdf = broadcast(queries
      .select(col(idCol).cast("long").as("qid"), col(vecCol).as("qv"))
      .select(col("qid"),
        aggregate(zip_with(col("qv"), minLit, (q, m) => q.cast("double") * m),
          lit(0.0), (a, b) => a + b).as("off"),
        sqrt(aggregate(transform(col("qv"), q => q.cast("double") * q.cast("double")),
          lit(0.0), (a, b) => a + b)).as("qnorm"),
        zip_with(col("qv"), deltaLit, (q, d) => q.cast("double") * d).as("w")))
    // candidate-scan scoring is the native codegen'd SqAdcDotExpr — a
    // primitive loop over the compressed int codes per pair; the
    // interpreted-HOF form this replaces was the whole-bench hotspot
    val adcDot = exprCol(graft.plans.SqAdcDotExpr(exprOf(col("w")), exprOf(col("codes"))))
    val scored = coded.crossJoin(qdf)
      .select(col("qid"), col("cid"),
        ((col("off") + adcDot) / (col("qnorm") * col("rnorm"))).as("sq_cos"))
    val short = TopK.perKey(scored, Seq("qid"), Seq(("sq_cos", false), ("cid", true)), shortlist)
    val cv = candidates.select(col(idCol).as("cid2"), col(vecCol).as("cvec"))
    val qvec = broadcast(queries.select(col(idCol).cast("long").as("qid2"), col(vecCol).as("qvec")))
    val rescored = short.join(cv, col("cid") === col("cid2"))
      .join(qvec, col("qid") === col("qid2"))
      .select(col("qid"), col("cid"), Text.cosineFast(col("qvec"), col("cvec")).as("cos"))
    rankTopK(rescored, k)
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
    // Score BEFORE the (qid, cid) dedup exchange (r18, guide §2.3
    // shuffle fewer bytes): cosineFast is deterministic, so duplicate
    // collisions (same pair in several tables) carry identical cos and
    // dropDuplicates keeps the same value whichever row survives — but
    // the exchange now moves 3 scalars per pair instead of two full
    // vectors. (The fast path compiles to the native DotProductF via
    // the injected optimizer rule; non-oracle scoring, so the
    // decimal-exact form isn't required here.)
    val scored = q.join(c, "bucket")
      .select(col("qid"), col("cid"), Text.cosineFast(col("qvec"), col("cvec")).as("cos"))
      .dropDuplicates("qid", "cid")
    rankTopK(scored, k)
  }

  /** Multi-probe LSH top-k (Lv et al.'s probing idea, declaratively):
    * instead of more hash tables, each QUERY also probes the buckets
    * whose hyperplane sign is most likely wrong — flip order is the
    * ascending |margin| of the query's plane dots, so probe 2 flips the
    * plane the query sat closest to, probe 3 the next-closest, etc.
    * Candidates stay single-bucketed: the probe fan-out multiplies only
    * the (small) query side of the bucket join, which is why this beats
    * adding tables at corpus scale — the big side is hashed ONCE.
    * Margin sort is an array-of-structs sort (deterministic (abs, j)
    * lexicographic tie-break), all map-side.
    */
  def multiProbeLshTopK(queries: DataFrame, candidates: DataFrame,
                        idCol: String, vecCol: String, dims: Int, bits: Int,
                        k: Int, nProbe: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= bits + 1,
      s"nProbe must be in [1, bits+1]; got $nProbe for $bits planes")
    val c = graft.Tables.spread(candidates, col(idCol))
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"),
        lshBucket(col(vecCol), dims, bits).as("bucket"))
    val dots = array((0 until bits).map { j =>
      (0 until dims).map { d =>
        element_at(col(vecCol), d + 1).cast("double") * lit(planeSign(j, d))
      }.reduce(_ + _)
    }: _*)
    // plane indices ordered by how marginal the query's sign was
    val flipOrder = transform(
      array_sort(zip_with(dots, sequence(lit(0), lit(bits - 1)),
        (d, j) => struct(abs(d).as("a"), j.as("j")))),
      s => s.getField("j"))
    val q0 = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      lshBucket(col(vecCol), dims, bits).as("hb"), flipOrder.as("fo"))
    val probes = array((0 until nProbe).map { i =>
      if (i == 0) col("hb")
      else {
        // 1 << fo[i] as a coalesced when-chain (shiftleft needs a
        // literal count)
        val mask = coalesce(((0 until bits).map(j =>
          when(element_at(col("fo"), i) === j, lit(1L << j))) :+ lit(0L)): _*)
        col("hb").bitwiseXOR(mask)
      }
    }: _*)
    val q = q0.withColumn("bucket", explode(probes)).drop("hb", "fo")
    // Score BEFORE the (qid, cid) dedup exchange (r18, guide §2.3): a
    // pair colliding in several probes scores identically each time
    // (cosineFast is deterministic), so dropDuplicates keeps the same
    // cos whichever row survives — and the exchange carries 3 scalars
    // per pair instead of two 64-float vectors.
    val scored = q.join(c, "bucket")
      .select(col("qid"), col("cid"), Text.cosineFast(col("qvec"), col("cvec")).as("cos"))
      .dropDuplicates("qid", "cid")
    rankTopK(scored, k)
  }

  /** Recall@k evaluator — the measurement half of every ANN tier: how
    * much of the exact top-k did the approximate index return? Both
    * inputs are (qid, cid[, rnk]) result sets (e.g. [[bruteForceTopK]]
    * ground truth vs [[ivfTopK]]/[[lshTopK]]/[[sqTopK]] candidates);
    * rows ranked beyond k are ignored on both sides, so a shortlist
    * larger than k can be evaluated at any cutoff.
    *
    * Scale shape: result sets are queries×k rows — tiny relative to the
    * corpus whatever the corpus size — so the hit-join is one keyed
    * exchange of id pairs (never vectors), and per-query recall is one
    * aggregation on the same key. Works unchanged when `exact` carries
    * millions of queries; nothing here touches the driver.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    def cut(df: DataFrame, q: String, c: String) = {
      val base = df.select(col("qid").as(q), col("cid").as(c),
        (if (df.columns.contains("rnk")) col("rnk")
         else row_number().over(Window.partitionBy("qid").orderBy("cid"))).as("r"))
      base.filter(col("r") <= k).drop("r")
    }
    val e = cut(exact, "qid", "cid")
    val a = cut(approx, "aqid", "acid")
    e.join(a, col("qid") === col("aqid") && col("cid") === col("acid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_exact"), count(col("acid")).as("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_exact"), 4))
  }
}
