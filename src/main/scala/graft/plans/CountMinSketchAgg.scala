package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Count-Min Sketch frequency aggregate as a custom
  * TypedImperativeAggregate (SURVEY.md §2.E) — the heavy-hitter /
  * frequency-estimation companion to the KMV distinct sketch.
  *
  * Input: a NON-NEGATIVE 63-bit uniform hash per row (callers compose
  * `Sketches.hash63(col)`). The buffer is a `depth × width` counter
  * matrix; row i increments cell `h_i(x)` where the d row hashes derive
  * from the one input hash via independent affine maps modulo the
  * Mersenne prime 2^31−1 ([[CountMinSketchAgg.rowIndex]]). Partials
  * combine map-side (merge = elementwise add — CMS is a linear sketch),
  * which is the 100 TB contract: per-partition sketches are
  * `depth·width·8` bytes regardless of input size, mergeable in any
  * order, and persistable — "how often did token X appear per source"
  * over a corpus snapshot is answerable later without re-scanning.
  *
  * Output: the flattened counter matrix as array<long> (row-major),
  * NOT an opaque binary — so the point-query estimator
  * ([[graft.functions.Sketches.cmsEstimate]]: min over rows of the
  * addressed cells) and sketch union (elementwise `zip_with` add) are
  * plain codegen'd column functions over the array, engine-portable
  * exactly like the theta sketch.
  *
  * Estimate guarantees (standard CMS): est ≥ true always;
  * est ≤ true + εN with probability 1−δ for ε = e/width, δ = e^−depth.
  */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= CountMinSketchAgg.MaxDepth,
    s"cms depth must be in [1, ${CountMinSketchAgg.MaxDepth}], got $depth")
  require(width >= 2, s"cms width must be >= 2, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        buf(i * width + CountMinSketchAgg.rowIndex(h, i, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CountMinSketchAgg {
  val MaxDepth = 8

  /** Mersenne prime 2^31−1: `(h mod P) * a + b` stays under 2^62, so the
    * same arithmetic runs overflow-free as BOTH JVM longs here and ANSI
    * SQL longs in the estimator expression.
    */
  val P = 2147483647L

  /** Pairwise-independent-style affine coefficients per sketch row,
    * fixed (splitmix-derived) so the aggregate and the column-side
    * estimator address identical cells.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  val A: Array[Long] = Array.tabulate(MaxDepth)(i => (mix(2L * i) & Long.MaxValue) % (P - 1) + 1)
  val B: Array[Long] = Array.tabulate(MaxDepth)(i => (mix(2L * i + 1) & Long.MaxValue) % P)

  /** Cell column for sketch row `i`: ((h mod P)·A_i + B_i mod P) mod width. */
  def rowIndex(h: Long, i: Int, width: Int): Int =
    ((((h % P) * A(i) + B(i)) % P) % width).toInt
}
