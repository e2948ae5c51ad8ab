package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Estimators over the KMV/theta sketch representation produced by
  * [[graft.plans.ThetaSketchAgg]] (`graft_theta_sketch(hash, k)`): a
  * sorted ascending array of the k smallest distinct 63-bit hashes.
  *
  * Everything here is a plain column function over that array — sketch
  * set algebra (union / intersection / jaccard) runs inside codegen on
  * rows that each hold two tiny arrays, never touching raw data again.
  * That split (heavy one-pass agg builds the sketch; cheap expressions
  * combine them) is the scale contract: sketches for 100 TB of docs per
  * source/day land in a few KB per group and answer overlap questions
  * later, in any engine that can sort a long array.
  */
object Sketches {

  /** 2^63 as a double — hashes are uniform in [0, 2^63). */
  private val HashSpace = 9.223372036854775808e18

  /** The canonical input hash: uniform non-negative 63-bit. */
  def hash63(c: Column): Column = shiftrightunsigned(xxhash64(c), 1)

  /** The sketch aggregate (requires graft extensions to be installed). */
  def thetaSketch(hashed: Column, k: Int): Column =
    call_function("graft_theta_sketch", hashed, lit(k))

  /** Theta in raw hash scale: the kth smallest retained hash, or 2^63
    * when the sketch is still exact (fewer than k distinct values seen).
    */
  def thetaOf(sk: Column, k: Int): Column =
    when(size(sk) < k, lit(HashSpace))
      .otherwise(element_at(sk, k).cast("double"))

  /** Distinct-count estimate: exact below k, else (k-1)/θ_norm. */
  def distinctEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) * HashSpace / element_at(sk, k).cast("double"))

  /** Union of two sketches is itself a valid sketch: k smallest of the
    * deduped union — same merge the aggregate performs.
    */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  def unionEstimate(a: Column, b: Column, k: Int): Column =
    distinctEstimate(unionSketch(a, b, k), k)

  /** Intersection estimate: both retained sets filtered below the joint
    * theta; |survivors| / θ_norm. Exactly |A∩B| while both sides are
    * exact (θ = 2^63).
    */
  def intersectEstimate(a: Column, b: Column, k: Int): Column = {
    val thetaC = least(thetaOf(a, k), thetaOf(b, k))
    val survivors = size(filter(array_intersect(a, b), x => x.cast("double") < thetaC))
    survivors.cast("double") * HashSpace / thetaC
  }

  /** Jaccard similarity estimate |A∩B| / |A∪B| (0 when the union
    * estimate is 0 — two empty sketches).
    */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    val u = unionEstimate(a, b, k)
    when(u === 0.0, lit(0.0)).otherwise(intersectEstimate(a, b, k) / u)
  }

  // ---- Count-Min Sketch (graft_cms) -------------------------------------

  /** The CMS aggregate (requires graft extensions): row-major
    * depth×width counter matrix as array<long>.
    */
  def cms(hashed: Column, depth: Int, width: Int): Column =
    call_function("graft_cms", hashed, lit(depth), lit(width))

  /** Point-query frequency estimate: min over the `depth` addressed
    * cells. `hashed` must be the same 63-bit hash fed to the aggregate.
    * Pure codegen'd long arithmetic — the same affine row hashes the
    * aggregate used ([[graft.plans.CountMinSketchAgg.rowIndex]]).
    */
  def cmsEstimate(sk: Column, hashed: Column, depth: Int, width: Int): Column = {
    import graft.plans.CountMinSketchAgg.{A, B, P}
    val hp = pmod(hashed, lit(P))
    val cells = (0 until depth).map { i =>
      val idx = pmod(pmod(hp * lit(A(i)) + lit(B(i)), lit(P)), lit(width.toLong))
      element_at(sk, (lit(i.toLong * width) + idx + 1L).cast("int"))
    }
    least(cells: _*)
  }

  /** CMS union — the sketch is linear, so merging is elementwise add. */
  def cmsUnion(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)

  /** Total updates N recorded in the sketch (any row sums to N): the
    * scale term of the ε·N error bound.
    */
  def cmsTotal(sk: Column, width: Int): Column =
    aggregate(slice(sk, 1, width), lit(0L), (acc, x) => acc + x)

  /** Misra-Gries heavy-hitters aggregate (requires graft extensions):
    * array<struct<item,cnt>> sorted by (-cnt, item). Every item with
    * frequency > N/(k+1) is guaranteed present; counters undercount by
    * at most N/(k+1).
    */
  def heavyHitters(item: Column, k: Int): Column =
    call_function("graft_heavy_hitters", item, lit(k))

  /** Bottom-k uniform-sample quantile sketch (requires graft
    * extensions): struct(hs: array<long>, vs: array<double>) ordered by
    * hash. `hashed` must be a uniform hash of the row's UNIQUE id
    * ([[hash63]] of the id column — NOT of the value, or duplicate
    * values collapse). Rank error is O(1/√k); the sketch value is
    * layout-independent (same k smallest hashes win under any
    * partitioning) and re-aggregating retained pairs IS the union —
    * see [[graft.plans.QuantileSampleAgg]].
    */
  def quantileSketch(hashed: Column, value: Column, k: Int): Column =
    call_function("graft_quantile_sketch", hashed, value, lit(k))

  /** Nearest-rank quantile estimate from the sketch's value sample:
    * the ⌈q·n⌉-th smallest retained value (deterministic — integer rank
    * over a sorted bounded array, no interpolation).
    */
  def sketchQuantile(sk: Column, q: Double): Column = {
    val vs = array_sort(sk.getField("vs"))
    val rank = least(size(vs), greatest(lit(1),
      ceil(lit(q) * size(vs)).cast("int")))
    // An empty sketch (group whose inputs were all NULL) would clamp
    // rank to 0 and element_at(vs, 0) is a runtime error in Spark, not
    // a null — guard to null like every built-in agg over no rows.
    when(size(vs) === 0, lit(null)).otherwise(element_at(vs, rank))
  }
}
