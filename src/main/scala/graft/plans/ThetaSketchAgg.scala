package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** KMV ("bottom-k" / theta) distinct sketch as a custom
  * TypedImperativeAggregate (SURVEY.md §2.E).
  *
  * Input: a NON-NEGATIVE 63-bit uniform hash per row (callers compose
  * `shiftrightunsigned(xxhash64(col), 1)`). The buffer keeps the k
  * smallest DISTINCT hash values seen; partials combine map-side before
  * the shuffle (merge = keep the k smallest of the union), which is what
  * makes this the 100 TB set-operation shape: per-partition sketches are
  * tiny (8k bytes), mergeable in any order, and persistable — estimating
  * |A∪B| / |A∩B| across corpus snapshots never re-scans raw data.
  *
  * Output: the sorted ascending long array (size ≤ k). Estimators over
  * that representation (distinct / union / intersection / jaccard) are
  * plain column functions in [[graft.functions.Sketches]] — the sketch
  * VALUE is engine-portable, unlike an opaque binary blob.
  *
  * Unlike HLL, KMV retains actual hash samples, so set INTERSECTION is
  * estimable (filter both retained sets below the joint theta): the
  * overlap primitive behind corpus-contamination and cross-snapshot
  * dedup-rate estimates.
  */
case class ThetaSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"theta sketch needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_theta_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      // TreeSet.add is a no-op on duplicates; only shrink when it grew.
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
