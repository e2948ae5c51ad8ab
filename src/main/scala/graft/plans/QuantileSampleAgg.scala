package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Mergeable quantile sketch as a bottom-k uniform sample — the fourth
  * corner of the sketch family (SURVEY.md §2.E): HLL/theta answer "how
  * many distinct", CMS "how often", Misra-Gries "which items dominate";
  * this answers "what does the distribution look like" in a form that
  * UNIONS across groups/partitions/snapshots, which a finalized
  * `percentile_approx` result cannot.
  *
  * The sample rule is the KMV trick applied to rows instead of values:
  * every row carries a uniform 63-bit hash of its UNIQUE id (callers
  * compose `Sketches.hash63(idCol)` — hashing the id, not the value,
  * keeps duplicate values independently samplable), and the sketch
  * retains the (hash, value) pairs with the k smallest hashes. That set
  * is a uniform random sample of the rows, so order statistics over the
  * retained values estimate quantiles with rank error O(1/√k) — and
  * because "k smallest hashes of the union" is associative, merge is
  * exact and layout-independent: the same rows win no matter how the
  * data is partitioned, ordered, or grouped. Re-aggregating retained
  * pairs IS the union (the k3/k4 re-agg idiom), so per-day sketches
  * roll up to per-month to global without touching raw data — the only
  * quantile architecture that works across 100 TB of partitioned
  * history.
  *
  * Output: struct(hs: array<long>, vs: array<double>) ordered by hash —
  * engine-portable arrays, estimators are plain column functions
  * ([[graft.functions.Sketches.sketchQuantile]]). A ~n²/2^64 hash
  * collision between distinct rows drops one of them; the tie breaks on
  * the smaller VALUE so the outcome is a function of the colliding set,
  * not of encounter order — bit-identical under any partitioning.
  */
case class QuantileSampleAgg(
    hashChild: Expression,
    valueChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]] {

  require(k >= 2, s"quantile sample sketch needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(hashChild, valueChild)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("hs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("vs", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_quantile_sketch"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  private def add(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                  h: Long, v: Double): Unit = {
    if (buf.containsKey(h)) {
      // ~n²/2^64 hash collision between DISTINCT rows: keep the smaller
      // value, so the winner depends only on the colliding SET, never on
      // encounter order — layout independence stays unconditional.
      if (v < buf.get(h)) { buf.put(h, v); () }
    }
    else if (buf.size < k) { buf.put(h, v); () }
    else if (h < buf.lastKey) { buf.put(h, v); buf.pollLastEntry(); () }
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null)
      add(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: java.util.TreeMap[java.lang.Long, java.lang.Double],
                     b2: java.util.TreeMap[java.lang.Long, java.lang.Double]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(b1, e.getKey, e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
    val n = buf.size
    val hs = new Array[Long](n)
    val vs = new Array[Double](n)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      hs(i) = e.getKey; vs(i) = e.getValue; i += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(hs), new GenericArrayData(vs)))
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeMap[java.lang.Long, java.lang.Double]()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(hashChild = newChildren(0), valueChild = newChildren(1))
}
