package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** One-pass 64-bit SimHash aggregate (round-17; same tier as
  * [[MinHashSigAgg]]): input is one token hash per row; the buffer is the
  * 64 running ±1 bit sums, updated in a single primitive loop and merged
  * elementwise; eval assembles the simhash long (bit b set iff sum_b > 0
  * — bit 63 is Long.MinValue as a plain bit under OR).
  *
  * Replaces the 64 separate `sum(when(shiftright(h, b) & 1 = 1, 1, -1))`
  * aggregate expressions + 64-way bit-assembly projection the r16 form
  * evaluated per input row — identical result (the ±1 sums and the >0
  * threshold are computed on the same integers), with the same map-side
  * partial-aggregation behavior (buffers combine before the shuffle).
  */
case class SimHashSigAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_sig"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buffer(b) += (((h >>> b) & 1L) * 2L) - 1L
        b += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (buffer(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 64)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
