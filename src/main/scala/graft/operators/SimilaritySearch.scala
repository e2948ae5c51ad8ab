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

  /** Nearest-centroid id as ONE constant-size expression: the centroid
    * table rides along as a literal array of (id, c·c, vec) structs and
    * the argmin is a single higher-order `aggregate` fold over it
    * (comparable distance c·c − 2·v·c; the v·v term is constant across
    * centroids). Constant expression size is the point — unrolling
    * k×dims literal arithmetic instead re-Janino-compiles a
    * multi-thousand-node tree for every fresh centroid set (measured
    * ~15 s per Lloyd round); this form compiles once and evaluates the
    * tight fold per row. Strict `<` keeps the earlier id on ties —
    * deterministic.
    */
  private def nearestExpr(v: org.apache.spark.sql.Column,
                          cents: Array[Array[Double]]): org.apache.spark.sql.Column = {
    val centsLit = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("i"), lit(c.map(x => x * x).sum).as("cc"),
        array(c.map(lit(_)): _*).as("v"))
    }: _*)
    // accumulator is [best_dist, best_id] as array<double> — struct field
    // names do not survive inside lambda bodies, arrays need none
    element_at(aggregate(centsLit,
      array(lit(Double.MaxValue), lit(-1.0)),
      (acc, ce) => {
        val dot = aggregate(zip_with(v, ce.getField("v"), (x, y) => x.cast("double") * y),
          lit(0.0), (a, b) => a + b)
        val d = ce.getField("cc") - lit(2.0) * dot
        when(d < element_at(acc, 1),
          array(d, ce.getField("i").cast("double"))).otherwise(acc)
      }), 2).cast("int")
  }

  /** IVF (inverted-file) ANN top-k — the trained-partition scale path the
    * LSH variant complements. The coarse quantizer is trained with a
    * declarative Lloyd's loop: deterministic hash-sampled seeds, then
    * `iters` rounds of codegen'd argmin assignment + per-dimension mean
    * aggregation; only k×dims partial sums ever reach the driver (index
    * metadata, the same footprint as a broadcast bloom filter — the
    * vectors themselves stay distributed). Candidates invert into their
    * nearest list map-side with zero joins; queries probe the `nProbe`
    * nearest lists; scoring joins on the centroid id (keyed shuffle).
    */
  /** Declarative Lloyd's coarse-quantizer training (shared by [[ivfTopK]]
    * and [[ivfPqTopK]]): deterministic hash-sampled seeds, `iters` rounds
    * of codegen'd argmin assignment + per-dimension mean aggregation.
    * Only nCentroids×dims partial sums reach the driver per round.
    */
  def trainCoarseCentroids(candidates: DataFrame, idCol: String, vecCol: String,
                           nCentroids: Int, iters: Int): Array[Array[Double]] = {
    val c0 = graft.Tables.spread(candidates, col(idCol))
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    var cents: Array[Array[Double]] = c0
      .orderBy(xxhash64(col("cid"))).limit(nCentroids)
      .select(col("cvec")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for (it <- 0 until iters) {
      val t0 = System.nanoTime()
      val cid = nearestExpr(col("cvec"), cents)
      // The repartition between assignment and explode is a MATERIALIZATION
      // BARRIER, not a data-movement choice: without it the optimizer
      // collapses `ci` into the post-explode projection and re-evaluates
      // the argmin fold once per exploded element — dims× the work
      // (measured 7 s/round vs 0.3 s on the bench corpus). Keying it on
      // `ci` also pre-clusters for the (ci, p) aggregation, so the shuffle
      // replaces — not adds to — the aggregation exchange.
      val sums = c0.select(cid.as("ci"), col("cvec"))
        .repartition(col("ci"))
        .select(col("ci"), posexplode(col("cvec")).as(Seq("p", "x")))
        .groupBy(col("ci"), col("p"))
        .agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("n"))
        .collect()
      if (sys.env.contains("SPARK_GRAFT_DEV")) println(f"IVF iter $it ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val byC = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, i) =>
        byC.get(i) match {
          case Some(rows) => rows.sortBy(_.getInt(1)).map(r => r.getDouble(2) / r.getLong(3)).toArray
          case None => old // empty list: keep the seed
        }
      }
    }
    cents
  }

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

  /** Nearest centroid WITHIN a subspace: same constant-size fold as
    * [[nearestExpr]], but the literal codebook carries a subspace tag and
    * entries from other subspaces are skipped — one expression serves
    * every subspace row, so all subspaces train/encode in ONE pipeline
    * instead of `m` sequential job chains. Returns [best_dist_rel,
    * best_id] (relative distance: c·c − 2·v·c; add v·v for the true
    * squared distance).
    */
  private def nearestSubExpr(v: org.apache.spark.sql.Column,
                             sCol: org.apache.spark.sql.Column,
                             cents: Seq[(Int, Int, Array[Double])]): org.apache.spark.sql.Column = {
    val centsLit = array(cents.map { case (s, j, c) =>
      struct(lit(s).as("s"), lit(j).as("j"), lit(c.map(x => x * x).sum).as("cc"),
        array(c.map(lit(_)): _*).as("v"))
    }: _*)
    aggregate(centsLit,
      array(lit(Double.MaxValue), lit(-1.0)),
      (acc, ce) => {
        val dot = aggregate(zip_with(v, ce.getField("v"), (x, y) => x.cast("double") * y),
          lit(0.0), (a, b) => a + b)
        val d = ce.getField("cc") - lit(2.0) * dot
        when(ce.getField("s") === sCol && d < element_at(acc, 1),
          array(d, ce.getField("j").cast("double"))).otherwise(acc)
      })
  }

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
  /** (id, subspace, subvector) rows — the shared shape for PQ training
    * and encoding.
    */
  private def pqSubRows(vectors: DataFrame, idCol: String, vecCol: String,
                        subspaces: Int, subDim: Int): DataFrame =
    graft.Tables.spread(vectors, col(idCol))
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), posexplode(
        array((0 until subspaces).map(s =>
          slice(col("v"), s * subDim + 1, subDim)): _*)).as(Seq("s", "sv")))

  /** Train per-subspace PQ codebooks — all subspaces in ONE Lloyd
    * pipeline. Returns (subspace, code, centroid) triples.
    */
  def pqTrain(vectors: DataFrame, idCol: String, vecCol: String, dims: Int,
              subspaces: Int = 8, codebookSize: Int = 16,
              iters: Int = 2): Seq[(Int, Int, Array[Double])] = {
    require(dims % subspaces == 0, s"$dims dims must split evenly into $subspaces subspaces")
    val subDim = dims / subspaces
    val subRows = pqSubRows(vectors, idCol, vecCol, subspaces, subDim)

    // deterministic seeds: one hash-ordered sample of whole vectors,
    // sliced per subspace driver-side — a single tiny job
    val seedVecs = vectors.orderBy(xxhash64(col(idCol)), col(idCol)).limit(codebookSize)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    var books: Seq[(Int, Int, Array[Double])] =
      for (s <- 0 until subspaces; j <- seedVecs.indices)
        yield (s, j, seedVecs(j).slice(s * subDim, (s + 1) * subDim))

    for (_ <- 0 until iters) {
      val assigned = subRows
        .select(col("s"), col("sv"),
          element_at(nearestSubExpr(col("sv"), col("s"), books), 2).cast("int").as("j"))
        .repartition(col("s"), col("j")) // materialization barrier (see ivfTopK)
      val sums = assigned
        .select(col("s"), col("j"), posexplode(col("sv")).as(Seq("p", "x")))
        .groupBy(col("s"), col("j"), col("p"))
        .agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val byKey = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
      books = books.map { case (s, j, old) =>
        byKey.get((s, j)) match {
          case Some(rows) =>
            (s, j, rows.sortBy(_.getInt(2)).map(r => r.getDouble(3) / r.getLong(4)).toArray)
          case None => (s, j, old)
        }
      }
    }
    books
  }

  /** Encode vectors against trained codebooks: per (id, s) best code +
    * its true squared distance, then one keyed regroup into the code
    * array (s is unique per id ⇒ sort_array over (s, code) structs is
    * total ⇒ deterministic). Returns (id, codes array<int>, err).
    */
  def pqEncodeWith(vectors: DataFrame, idCol: String, vecCol: String, dims: Int,
                   books: Seq[(Int, Int, Array[Double])]): DataFrame = {
    val subspaces = books.map(_._1).max + 1
    val subDim = dims / subspaces
    val subRows = pqSubRows(vectors, idCol, vecCol, subspaces, subDim)
    subRows.select(col("id"), col("s"),
      nearestSubExpr(col("sv"), col("s"), books).as("best"),
      Text.dotFast(col("sv"), col("sv")).as("vv"))
      .select(col("id"), col("s"),
        element_at(col("best"), 2).cast("int").as("code"),
        (col("vv") + element_at(col("best"), 1)).as("derr"))
      .groupBy(col("id"))
      .agg(
        transform(array_sort(collect_list(struct(col("s"), col("code")))),
          x => x.getField("code")).as("codes"),
        sum(col("derr").cast(graft.Det.D)).cast("double").as("err"))
  }

  /** Train + encode in one call. */
  def pqEncode(vectors: DataFrame, idCol: String, vecCol: String, dims: Int,
               subspaces: Int = 8, codebookSize: Int = 16,
               iters: Int = 2): DataFrame =
    pqEncodeWith(vectors, idCol, vecCol, dims,
      pqTrain(vectors, idCol, vecCol, dims, subspaces, codebookSize, iters))

  /** PQ ADC (asymmetric distance) top-k: candidates are searched in CODE
    * space — the query computes one small lookup table per subspace
    * (||q_s − centroid||², driver-side against the trained books, the
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
    val spark = candidates.sparkSession
    import spark.implicits._
    val books = pqTrain(candidates, idCol, vecCol, dims, subspaces, codebookSize, iters)
    val coded = pqEncodeWith(candidates, idCol, vecCol, dims, books)
      .select(col("id").as("cid"), col("codes"))
    val subDim = dims / subspaces
    val byS = books.groupBy(_._1)
    // per-query LUT: lut(s)(j) = ||q_s − c_sj||², shipped as a column of
    // the broadcast query table — no per-query literals, one plan
    // id is cast to long in-plan so the collect below is type-stable for
    // any integral id column (int ids would otherwise ClassCastException
    // at r.getLong).
    val qluts = queries.select(col(idCol).cast("long").as("qid"),
      col(vecCol).as("qv")).collect()
      .map { r =>
        val qv = r.getSeq[Float](1).map(_.toDouble).toArray
        val lut = (0 until subspaces).map { s =>
          val qs = qv.slice(s * subDim, (s + 1) * subDim)
          byS(s).sortBy(_._2).map { case (_, _, c) =>
            qs.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          }.toSeq
        }
        (r.getLong(0), lut)
      }.toSeq
    val qdf = broadcast(qluts.toDF("qid", "lut"))
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
    * probe join is a broadcast of (qid, lut, probes), and the shortlist
    * cut runs through the bounded-heap GroupedTopK node. Queries are
    * collected to build LUTs — the small side by contract (a query
    * BATCH, not a corpus).
    */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame,
                idCol: String, vecCol: String, dims: Int, k: Int,
                nCentroids: Int = 8, nProbe: Int = 2, ivfIters: Int = 2,
                subspaces: Int = 8, codebookSize: Int = 16, pqIters: Int = 2,
                shortlist: Int = 50): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cents = trainCoarseCentroids(candidates, idCol, vecCol, nCentroids, ivfIters)
    val books = pqTrain(candidates, idCol, vecCol, dims, subspaces, codebookSize, pqIters)
    val subDim = dims / subspaces

    // index build: codes + inverted-list id per candidate (one keyed join
    // at build time; both inputs derive map-side from the same scan)
    val coded = pqEncodeWith(candidates, idCol, vecCol, dims, books)
      .select(col("id").as("cid"), col("codes"))
    val assigned = candidates.select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .select(col("cid"), nearestExpr(col("cv"), cents).as("centroid_id"))
    val index = coded.join(assigned, "cid")

    // query prep (driver-side, tiny): ADC LUT + nProbe nearest lists
    val byS = books.groupBy(_._1)
    val qrows = queries.select(col(idCol).cast("long").as("qid"), col(vecCol).as("qv"))
      .collect().map { r =>
        val qv = r.getSeq[Float](1).map(_.toDouble).toArray
        val lut = (0 until subspaces).map { s =>
          val qs = qv.slice(s * subDim, (s + 1) * subDim)
          byS(s).sortBy(_._2).map { case (_, _, c) =>
            qs.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          }.toSeq
        }
        val probes = cents.zipWithIndex.map { case (c, i) =>
          (c.map(x => x * x).sum - 2.0 * qv.zip(c).map { case (a, b) => a * b }.sum, i)
        }.sortBy(identity).take(nProbe).map(_._2).toSeq
        (r.getLong(0), lut, probes)
      }.toSeq
    val qdf = broadcast(qrows.toDF("qid", "lut", "probes"))

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
    rankTopK(scored, k)
  }
}
